package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: expose what `count()` really measures for a pure-projection
  * query. Since r11 Bench force-materializes the media-decode family
  * (`Bench.ForceMaterialize` uses `toRdd.count()`), so its rows time the
  * codec; this tool remains the side-by-side demonstration of the pruned
  * count-plan vs the forced plan (the r7–r10 blind spot it documented).
  * This main prints the count-plan's ReadSchema plus count-vs-forced
  * timings (`sum(n_samples)` cannot be pruned, so it runs the decoder on
  * every payload). Measured: flac at sf0.01 count 0.55 s vs forced 0.44 s
  * (noise-level — decode is cheap), at the 100x corpus count 0.52 s vs
  * forced 10.7 s (~21 us/payload, an embarrassingly parallel narrow map).
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.CountCheck"`.
  */
object CountCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val df = operators.MediaOps.flacDecode(spark, sf)
    // what does COUNT read from the staged scan?
    val countPlan = df.groupBy().count().queryExecution.executedPlan.toString
    val line = countPlan.linesIterator.find(_.contains("ReadSchema")).getOrElse("?")
    println("COUNT-SCAN " + line.trim.take(150))
    val t0 = System.nanoTime(); df.count()
    println(f"COUNT-SECS ${(System.nanoTime() - t0) / 1e9}%.3f")
    val t1 = System.nanoTime()
    df.agg(org.apache.spark.sql.functions.sum("n_samples")).collect()
    println(f"FORCED-SECS ${(System.nanoTime() - t1) / 1e9}%.3f")
  }
}
