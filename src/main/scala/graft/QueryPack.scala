package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module's contribution to the driver contract: named queries plus
  * their DuckDB oracle twins. [[SparkEntry]] aggregates all packs. Keys
  * follow SURVEY §7: `"<survey-op-id>_<name>"`.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL per query key; omit a key for non-SQL-expressible ops
    * (driver then records a weaker rows-only check).
    */
  def oracles: Map[String, String]
}
