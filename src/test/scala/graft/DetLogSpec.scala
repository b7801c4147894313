package graft

import org.apache.spark.sql.functions._
import graft.functions.DetLog

/** The deterministic-log contract: the Spark Column chain and the
  * driver-side Scala chain must be BIT-identical (the SQL twin is asserted
  * end-to-end by every oracle replay of the anchored log-family queries).
  * Also pins accuracy against libm so a series regression (dropped term,
  * reassociation) is caught as a tolerance failure, not just a hash drift.
  */
class DetLogSpec extends SparkSpec {
  import spark.implicits._

  private val ks: Seq[Long] =
    (1L to 5000L) ++
      Seq(8191L, 8192L, 8193L, 65535L, 65536L, 1000000L, 999999937L,
        (1L << 40) - 1, 1L << 40, (1L << 52) + 12345L, (1L << 53) + 1,
        (1L << 62) + 987654321L, Long.MaxValue)

  test("Column chain == Scala chain, bit-for-bit, for ln and log2") {
    val rows = ks.toDF("k")
      .select(col("k"), DetLog.ln(col("k")).as("ln"), DetLog.log2(col("k")).as("l2"))
      .collect()
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(DetLog.lnScala(k)), s"ln($k)")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(DetLog.log2Scala(k)), s"log2($k)")
    }
  }

  test("accuracy vs libm: |detln - ln| <= 2e-11 absolute on the test range") {
    ks.filter(_ < (1L << 52)).foreach { k =>
      assert(math.abs(DetLog.lnScala(k) - math.log(k.toDouble)) <= 2e-11, s"ln($k)")
      assert(math.abs(DetLog.log2Scala(k) -
        math.log(k.toDouble) / math.log(2.0)) <= 4e-11, s"log2($k)")
    }
    assert(DetLog.lnScala(1L) == 0.0 && DetLog.log2Scala(1L) == 0.0)
    assert(DetLog.log2Scala(4096L) == 12.0)
  }
}
