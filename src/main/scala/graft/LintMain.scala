package graft

import org.apache.spark.sql.SparkSession

/** Dev audit for [[DeterminismLint]]: builds every registered query at the
  * given sf dir (analysis only — nothing executes except what query
  * CONSTRUCTORS themselves stage) and prints one line per lint hit, plus
  * whitelist entries that no longer match anything (stale proofs to drop).
  * Exit 1 on any non-whitelisted hit, so it can gate CI directly.
  */
object LintMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    val hitNames = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val viol = DeterminismLint.check(name, fn(spark, sfDir))
        if (viol.nonEmpty) {
          bad += 1
          hitNames += name
          println(s"LINT $name: ${viol.mkString(" | ")}")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"LINT-ERR $name: ${e.getMessage}")
      }
    }
    DeterminismLint.Bounded.keys.toSeq.sorted.foreach { w =>
      if (!SparkEntry.queries.contains(w)) println(s"LINT-STALE $w")
    }
    println(s"LINT-TOTAL flagged=$bad whitelisted=${DeterminismLint.Bounded.size}")
    Tables.clearDerived(spark)
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
