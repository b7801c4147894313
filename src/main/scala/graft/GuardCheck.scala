package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: print the per-family hot-bucket-guard stats and the full
  * Monitors warnings for a corpus. Usage:
  * `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.GuardCheck"` — the quick
  * way to confirm a banding change keeps every guard disengaged at the 10x
  * scale point without a full bench run.
  */
object GuardCheck {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    operators.DedupOps.guardStats(spark, sf).collect().foreach { r =>
      println(s"GUARD ${r.getAs[String]("family")}: max_bucket=" +
        s"${r.getAs[Long]("max_bucket")} dropped=${r.getAs[Long]("n_rows_dropped")}")
    }
    Monitors.warnings(spark, sf).foreach(w => println(s"WARN $w"))
    if (args.contains("--simhash-detail")) {
      import org.apache.spark.sql.functions._
      val bands = operators.DedupOps.simhashBandTable(spark, sf)
      println("HOTBUCKETS (top 8 by distinct-signature count):")
      bands.groupBy(col("band_no"), col("band_val"))
        .agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(8)
        .collect().foreach(r => println(
          s"  band=${r.get(0)} val=${r.get(1)} n=${r.get(2)}"))
      val sigs = operators.DedupOps.simhash(spark, sf)
      println("SIGS distinct=" + sigs.select("simhash").distinct().count() +
        " docs=" + sigs.count())
    }
    println("GUARDCHECK DONE")
    spark.stop()
  }
}
