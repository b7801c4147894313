package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Count–Min sketch UDAF (SURVEY §2 UDF/UDAF surface; Cormode &
  * Muthukrishnan 2005) — the third mergeable-summary family next to
  * Misra–Gries ([[FrequencyAgg]]) and MinHash ([[MinHashAgg]]): a
  * depth×width block of long counters where row j increments cell
  * `h_j(key) mod width`. The sketch is LINEAR — merge is element-wise
  * addition — so Spark's partial aggregation carries a fixed-size block
  * per task regardless of key cardinality, and point estimates
  * `est(k) = min_j cell(j, h_j(k))` NEVER undercount: est(k) ≥ true(k)
  * always, est(k) ≤ true(k) + overcount where E[overcount] ≈ N/width.
  *
  * The row hashes are the library's portable salted-md5 family
  * (`h_j(key) = h24("j:" + key)`, [[MinHashAgg.h24]] — the JVM twin of
  * [[graft.Tables.h24]]), which buys something unusual for a sketch: the
  * DuckDB oracle can REBUILD every cell with a GROUP BY and replay the
  * exact estimates, so the CMS query is value-hash-checkable, not just
  * property-tested.
  *
  * Scale role: at 100 TB an exact per-key count shuffles every distinct
  * key; the sketch's shuffle is depth×width longs (KBs) per task, merged
  * up the combine tree, and the finished block is model-sized — small
  * enough to collect and embed as a broadcast literal for point lookups
  * ([[graft.operators.RelationalOps.cmsSupplierCounts]]).
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < depth) {
      buf(j * width + CountMinAgg.slot(j, key, width)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinAgg {
  /** Row-j slot of a key: the portable salted-h24 hash mod width. */
  private[graft] def slot(j: Int, key: Long, width: Int): Int =
    (MinHashAgg.h24(s"$j:$key") % width).toInt
}
