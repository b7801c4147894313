package graft

/** Dev tool: emit the [[graft.functions.DetLog]] SQL twins plus driver-side
  * reference bit patterns so `tools/detlog_check.py` can assert the DuckDB
  * backend is BIT-IDENTICAL to the Scala/Column chains — the reproducible
  * form of the three-backend contract (DetLogSpec pins Column==Scala
  * in-JVM; this pins SQL==Scala cross-engine without waiting for a full
  * oracle replay). No Spark session needed: the chains are pure.
  *
  * Output (stdout): one `LN_SQL`/`LOG2_SQL` line each with the generated
  * expression over a column named `k`, then `REF <k> <lnBits> <log2Bits>`
  * lines for a deterministic argument sweep (small ints, powers of two ±1,
  * primes, and values straddling 2^52/2^53 where the BIGINT→DOUBLE cast
  * starts rounding).
  */
object DetLogDump {
  def main(args: Array[String]): Unit = {
    import graft.functions.DetLog
    println("LN_SQL " + DetLog.lnSql("k"))
    println("LOG2_SQL " + DetLog.log2Sql("k"))
    val ks: Seq[Long] =
      (1L to 4096L) ++
        (0 to 62).map(i => 1L << i) ++ (1 to 62).map(i => (1L << i) + 1) ++
        (1 to 62).map(i => (1L << i) - 1) ++
        Seq(999999937L, 67280421310721L, (1L << 52) + 12345L,
          (1L << 53) + 1, (1L << 60) + 987654321L, Long.MaxValue)
    ks.distinct.sorted.foreach { k =>
      val ln = java.lang.Double.doubleToRawLongBits(DetLog.lnScala(k))
      val l2 = java.lang.Double.doubleToRawLongBits(DetLog.log2Scala(k))
      println(s"REF $k $ln $l2")
    }
  }
}
