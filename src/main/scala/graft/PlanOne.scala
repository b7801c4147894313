package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for ONE registered query (by its
  * [[SparkEntry.queries]] name) to a file — the per-change plan evidence
  * the optimization rounds commit under `plans/r<N>/<query>_{before,after}.txt`.
  * Run: `sbt "runMain graft.PlanOne <query> <outFile> [sfDir]"`.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanOne <query> <outFile> [sfDir]")
    val name = args(0)
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-planone")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val df = q(spark, sfDir)
    val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (txt + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
