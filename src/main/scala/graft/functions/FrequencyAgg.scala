package graft.functions

import org.apache.spark.sql.Encoder
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
  * The reference has no aggregation surface at all (its only reduce is
  * Python `all(...)` — /root/reference/geomesa_cassandra.py:35); this row is
  * part of the engine's extension surface.
  */
class FrequencyAgg(capacity: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], key: Long): Map[Long, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < capacity => buf.updated(key, 1L)
      case None =>
        // decrement-all step: every counter pays one; zeros vacate slots
        buf.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count, keep strictly positive
      val counts = combined.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(combined.size - capacity - 1)
      combined.collect { case (k, c) if c > sub => k -> (c - sub) }
    }
  }

  /** Sorted candidate keys — the superset the exact confirm pass probes. */
  override def finish(buf: Map[Long, Long]): Seq[Long] = buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
