package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-module [[QueryPack]]s; keys are
  * `"<survey-op-id>_<name>"`.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    operators.CatalogPack,
    operators.ParsePack,
    operators.LifecyclePack,
    operators.RelationalPack,
    operators.TextDedupPack,
    operators.SimMediaPack,
    operators.GeoPack,
    streaming.StreamingPack,
  )

  /** Flagship query (SURVEY §7 step 1): `identify_schema_tables` — the read
    * side of the reference's schema-removal entry point
    * (/root/reference/geomesa_cassandra.py:48-52). Driver smoke-checks
    * rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.CatalogOps.findSchemaTables(spark, "/root/testdata/sf0.001", "purchase")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
