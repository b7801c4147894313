package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X-S file-format breadth (SURVEY §2 X-S): csv / orc / json-lines readers
  * exercised as write-then-read roundtrips against the parquet fixture
  * tables, so the driver's DuckDB oracle (which reads the original parquet)
  * verifies the full encode→decode path of each format, not just that a scan
  * returns rows.
  *
  * The reference stores nothing in these formats (its inputs are command
  * stdout and a JSON registry), so this family is a pure Spark extension:
  * `spark.read.{csv,orc,json}` with an explicit schema — schema-on-read,
  * never inference, because at 100 TB an inference pass is a second full
  * scan and a schema drift hazard.
  *
  * Column choices are deliberate per format's fidelity:
  *  - csv: int/string columns only (nation) — text roundtrip is exact;
  *  - orc: the full supplier row incl. double — binary format, bit-exact;
  *  - json: ints/strings/date (orders) — dates serialize as ISO strings and
  *    read back via the explicit schema.
  */
object Formats {

  /** Staging dir for roundtrip files: keyed by sf dir so concurrent runs at
    * different SFs never collide. Local tmp here; any shared filesystem URI
    * at scale.
    */
  private def stage(sfDir: String, fmt: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_formats/" +
      s"${Integer.toHexString(sfDir.hashCode)}/$fmt"

  /** csv with header; coalesce(1) only because fixture tables are KB-sized —
    * a real export keeps the partitioned parallel write.
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.nation(spark, sfDir)
    val path = stage(sfDir, "csv_nation")
    src.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    spark.read.schema(src.schema).option("header", "true").csv(path)
  }

  /** orc preserves every Spark type bit-exactly, including double. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.supplier(spark, sfDir)
    val path = stage(sfDir, "orc_supplier")
    src.coalesce(1).write.mode("overwrite").orc(path)
    spark.read.schema(src.schema).orc(path)
  }

  /** json-lines roundtrip over a date-bearing slice of orders. */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("o_orderdate"))
    val path = stage(sfDir, "json_orders")
    src.coalesce(1).write.mode("overwrite").json(path)
    spark.read.schema(src.schema).json(path)
  }
}
