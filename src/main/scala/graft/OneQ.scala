package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: run ONE SparkEntry query by name against sf0.01 and print a
  * sample + row count. Usage: sbt "runMain graft.OneQ <query_name>". Keeps
  * the debug loop at ~15 s instead of a full Verify sweep. */
object OneQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Tables.materializeDerived(spark, sf)
    val df = SparkEntry.queries(args(0))(spark, sf)
    if (args.contains("--explain")) df.explain("formatted")
    df.show(5)
    val t0 = System.nanoTime()
    println("ROWS=" + df.count())
    println(f"SECS=${(System.nanoTime() - t0) / 1e9}%.2f")
  }
}
