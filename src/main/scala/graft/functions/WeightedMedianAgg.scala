package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted-median aggregate (r15, VERDICT r14 #8 — the
  * [[FrequencyAgg]] mutable-buffer discipline applied to the last
  * never-kerneled expensive query): folds `(valueCents, weightCents)`
  * pairs into one cents→weight hash map per group and emits the LOWER
  * weighted median — the smallest value whose cumulative weight w
  * satisfies `2·w ≥ total` — plus the total weight, both in exact
  * integer cents.
  *
  * Why a kernel beats the three-level bucket plan it replaces
  * ([[graft.operators.RelationalOps.weightedMedianPrice]]'s r7 shape):
  * that plan's `cells` aggregate appeared in THREE branches (the bucket
  * histogram, the median-bucket pick, and the in-bucket refinement) and
  * Catalyst does not reuse the exchange across them — the fact table was
  * scanned and cell-aggregated three times (PLANS.md r14: scans (1),
  * (7), (26)). Here the fact table is scanned ONCE; each task's
  * contribution is its partial map (bounded by the VALUE DOMAIN, not row
  * count — the same bound the cells groupBy had), merged up the
  * partial-aggregation tree; the final per-group sort touches one
  * domain-bounded array. Exactness is integer-cents arithmetic
  * end-to-end, the same `2·cum ≥ total` lower-median rule as the
  * replaced form — bit-identical output, property-pinned in
  * `RelationalOpsSpec`.
  *
  * The buffer is a mutable `java.util.HashMap` mutated in place (one
  * probe + store per row, no per-update allocation); kryo serializes it
  * only across the partial/final shuffle boundary. `merge` folds the
  * SMALLER map into the larger, so a merge tree over k partials stays
  * O(total entries · log k)-ish instead of rebuilding the big side.
  */
class WeightedMedianAgg
    extends Aggregator[(Long, Long),
      java.util.HashMap[java.lang.Long, java.lang.Long], (Long, Long)] {

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def zero: Buf = new Buf(1 << 10)

  override def reduce(buf: Buf, in: (Long, Long)): Buf = {
    val cur = buf.get(in._1)
    buf.put(in._1, if (cur == null) in._2 else cur + in._2)
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = big.get(e.getKey)
      big.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    big
  }

  /** (lowerMedianCents, totalWeightCents); (0, 0) for an empty group
    * (unreachable through groupBy — groups exist only with rows). */
  override def finish(buf: Buf): (Long, Long) = {
    if (buf.isEmpty) return (0L, 0L)
    val keys = new Array[Long](buf.size)
    var i = 0
    val kit = buf.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    var total = 0L
    val vit = buf.values().iterator()
    while (vit.hasNext) total += vit.next()
    var cum = 0L
    i = 0
    while (i < keys.length) {
      cum += buf.get(keys(i))
      if (2L * cum >= total) return (keys(i), total)
      i += 1
    }
    (keys(keys.length - 1), total) // unreachable: cum ends at total
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]

  override def outputEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
