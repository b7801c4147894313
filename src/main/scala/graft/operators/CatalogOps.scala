package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-query operator family (SURVEY §2 F1–F4, A1–A3, J2, M1): the
  * reference's GeoMesa-catalog reads re-expressed as declarative Spark plans.
  *
  * Reference lifecycle EP1/EP2 (SURVEY §3): cqlsh stdout → split lines →
  * indentation filter → trim → set-dedup collapses in Spark to
  * `select.distinct` — the parse/post-process stages disappear into
  * Catalyst, and predicate pushdown + column pruning reach the parquet scan
  * for free. All operators here are narrow or single-shuffle (distinct /
  * groupBy), with filters pushed to the scan — at 100 TB the catalog scan
  * prunes to the `sft`/`value` columns and the `sft = x` predicate hits the
  * parquet row-group stats.
  */
object CatalogOps {

  /** F1: project the sft column (`SELECT sft FROM ks.catalog` —
    * /root/reference/geomesa.py:36-38).
    */
  def projectSfts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.catalog(spark, sfDir).select(col("sft"))

  /** F1+A2+A3 = `list_sfts` (/root/reference/geomesa.py:35-44): distinct SFT
    * names. The reference's client-side `set()` dedup is a hash aggregate.
    */
  def listSfts(spark: SparkSession, sfDir: String): DataFrame =
    projectSfts(spark, sfDir).distinct()

  /** A3: SFT count, the log line at /root/reference/geomesa.py:44. */
  def countSfts(spark: SparkSession, sfDir: String): DataFrame =
    listSfts(spark, sfDir).agg(count("*").as("n_sfts"))

  /** F2+F3+T1+T2 = `identify_schema_tables` (the flagship slice;
    * /root/reference/geomesa_cassandra.py:48-52): filter catalog to one SFT,
    * project `value`, trim + lowercase, keep rows prefixed by the catalog
    * name. Equality filter is pushed into the scan by Catalyst.
    */
  def findSchemaTables(spark: SparkSession, sfDir: String, sft: String,
                       catalogName: String = "catalog"): DataFrame =
    Tables.catalog(spark, sfDir)
      .where(col("sft") === sft)
      .select(lower(trim(col("value"))).as("table_name"))
      .where(col("table_name").startsWith(catalogName))

  /** F4+T1+A2: the cqlsh output-framing filter of `list_sfts`
    * (/root/reference/geomesa.py:39-43) — data rows are indented 4 spaces;
    * headers/footers are not. Reproduced over a framed-line fixture derived
    * from the catalog, then trimmed + dedup'd exactly like the reference.
    */
  def cqlshFrameFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val dataRows = Tables.catalog(spark, sfDir)
      .select(concat(lit("    "), col("sft")).as("line"))
    val frame = stringsDF(spark, "line", Seq(" sft", "-----------", "", "(5 rows)"))
    dataRows.unionAll(frame)
      .where(col("line").startsWith("    "))
      .select(trim(col("line")).as("sft"))
      .distinct()
  }

  /** F7/F8: table-existence predicates over DESCRIBE outcomes — exists iff
    * stderr lacks `not found` (/root/reference/geomesa_cassandra.py:58) and
    * stdout carries `CREATE TABLE` with empty stderr
    * (/root/reference/node.py:174-180).
    */
  def tableExistence(spark: SparkSession, sfDir: String): DataFrame =
    Tables.describeResults(spark, sfDir).select(
      col("sft"), col("table_name"),
      (!col("stderr").contains("not found")).as("exists_f7"),
      (col("stdout").contains("CREATE TABLE") && (col("stderr") === "")).as("exists_f8"))

  /** J2 (anti side): schema tables whose DESCRIBE failed — the missing-table
    * list the pre-flight check raises with
    * (/root/reference/geomesa_cassandra.py:33-38). Broadcast-friendly: the
    * existing-table set is a dimension next to a 100 TB fact side.
    */
  def missingTables(spark: SparkSession, sfDir: String): DataFrame = {
    val existing = tableExistence(spark, sfDir)
      .where(col("exists_f8")).select(col("table_name"))
    Tables.schemaTables(spark, sfDir)
      .join(broadcast(existing), Seq("table_name"), "left_anti")
      .select(col("sft"), col("table_name"))
  }

  /** J2 (semi side): schema tables confirmed present. */
  def presentTables(spark: SparkSession, sfDir: String): DataFrame = {
    val existing = tableExistence(spark, sfDir)
      .where(col("exists_f8")).select(col("table_name"))
    Tables.schemaTables(spark, sfDir)
      .join(broadcast(existing), Seq("table_name"), "left_semi")
      .select(col("sft"), col("table_name"))
  }

  /** A1: bool_and over existence per SFT — `all(tables_exist(...))`
    * (/root/reference/geomesa_cassandra.py:35, geomesa.py:62-67).
    */
  def schemaComplete(spark: SparkSession, sfDir: String): DataFrame =
    tableExistence(spark, sfDir)
      .groupBy(col("sft"))
      .agg(bool_and(col("exists_f8")).as("complete"),
        count("*").as("n_tables"))

  /** M1 read-side: the catalog after `DELETE FROM ks.catalog WHERE sft=x`
    * (/root/reference/geomesa.py:56-59) — modeled as an anti-join rewrite
    * (immutable-storage delete; Delta-style DELETE at scale).
    */
  def catalogAfterDelete(spark: SparkSession, sfDir: String, sft: String): DataFrame = {
    val deletions = stringsDF(spark, "sft", Seq(sft))
    Tables.catalog(spark, sfDir)
      .join(broadcast(deletions), Seq("sft"), "left_anti")
  }

  private def stringsDF(spark: SparkSession, name: String, xs: Seq[String]): DataFrame =
    spark.createDataset(xs)(org.apache.spark.sql.Encoders.STRING).toDF(name)
}
