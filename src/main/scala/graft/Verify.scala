package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure isolation (VERDICT r6 #2): fixture derivation is per-table
  * try/log inside [[Tables.materializeDerived]], each query dump is
  * try/log here, and each dump runs under a per-query timeout with Spark
  * job-group cancellation — so neither one broken lineage nor one hung
  * query can zero the round's correctness record.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional trailing names restrict the dump (fast dev loop via
    // tools/check.py <sf> <out> <names...>); the driver passes none.
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SEC", "240").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    Tables.materializeDerived(spark, sfDir) // fixture tables built once up front
    var pool = Executors.newSingleThreadExecutor()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.nonEmpty && !only.contains(name)) ()
      else {
        val task = pool.submit(new Runnable {
          def run(): Unit = {
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            finally spark.sparkContext.clearJobGroup()
          }
        })
        try task.get(timeoutSec, TimeUnit.SECONDS)
        catch {
          case _: TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            task.cancel(true): Unit
            // The interrupted worker may not unwind promptly; abandon the
            // pool so later queries never queue behind a stuck one.
            pool.shutdownNow(): Unit
            pool = Executors.newSingleThreadExecutor()
            System.err.println(s"[verify] $name TIMED OUT after ${timeoutSec}s")
          case e: Throwable =>
            val cause = Option(e.getCause).getOrElse(e)
            System.err.println(s"[verify] $name failed: ${cause.getMessage}")
        }
      }
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Tables.clearDerived(spark)
    spark.stop()
  }
}
