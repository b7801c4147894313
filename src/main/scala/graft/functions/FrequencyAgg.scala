package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra–Gries heavy-hitter sketch UDAF (SURVEY §2 UDF/UDAF surface):
  * folds a key stream into at most `capacity` weighted counters whose error
  * is bounded by n/(capacity+1), so every key with true frequency above
  * n/(capacity+1) is guaranteed to survive in the merged sketch (the
  * classic Misra–Gries bound; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12: sum counters, then subtract the (capacity+1)-th
  * largest count and drop non-positive entries — the bound is preserved
  * under arbitrary merge trees, which is exactly what a map-side-combined
  * Spark aggregation is).
  *
  * Scale role: at 100 TB a full `groupBy(key).count()` shuffles every
  * distinct key; this sketch reduces each task's contribution to ≤
  * `capacity` counters merged up the partial-aggregation tree — the shuffle
  * carries kilobytes regardless of key cardinality. The sketch output is a
  * *candidate superset*, not exact counts; [[graft.operators.RelationalOps
  * .heavyHitterSuppliers]] follows it with an exact confirm pass restricted
  * to the candidates (broadcast join), which is how the end-to-end query
  * stays oracle-exact. The guarantee (candidates ⊇ true heavy hitters) is
  * property-tested in `RelationalOpsSpec`.
  *
  * The buffer is a MUTABLE `java.util.HashMap` mutated in place: the
  * per-row hot path is one hash probe and one store, no per-update
  * persistent-map allocation or buffer re-serialization (the
  * typed-Aggregator path keeps the buffer as a live object between rows
  * and serializes — kryo, which handles java.util maps natively — only
  * across the partial/final shuffle boundary). Eviction edits entries
  * THROUGH the entry-set iterator (setValue/remove), so the decrement-all
  * step is allocation-free; it still touches every counter, but that is
  * inherent to Misra–Gries and amortized O(1) per row.
  *
  * The reference has no aggregation surface at all (its only reduce is
  * Python `all(...)` — /root/reference/geomesa_cassandra.py:35); this row is
  * part of the engine's extension surface.
  */
class FrequencyAgg(capacity: Int)
    extends Aggregator[Long, java.util.HashMap[java.lang.Long, java.lang.Long], Seq[Long]] {

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def zero: Buf = new Buf(capacity * 2)

  override def reduce(buf: Buf, key: Long): Buf = {
    val cur = buf.get(key)
    if (cur != null) buf.put(key, cur + 1L)
    else if (buf.size < capacity) buf.put(key, 1L)
    else {
      // decrement-all step: every counter pays one; zeros vacate slots —
      // edited in place through the entry-set iterator
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1L) e.setValue(e.getValue - 1L) else it.remove()
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val bit = b.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, keep strictly positive
      val counts = new Array[Long](a.size)
      var i = 0
      val cit = a.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(a.size - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > sub) e.setValue(e.getValue - sub) else it.remove()
      }
    }
    a
  }

  /** Sorted candidate keys — the superset the exact confirm pass probes. */
  override def finish(buf: Buf): Seq[Long] = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out.toSeq
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
