package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature UDAF (SURVEY §2 UDF/UDAF surface): folds a
  * document's shingle stream into its `numHashes`-wide signature in one
  * pass — `reduce` takes each shingle to its per-hash values and keeps the
  * elementwise min; `merge` is elementwise min of partial signatures, so the
  * aggregate is map-side combinable and its state is `numHashes` longs
  * regardless of document size (the property that matters at 100 TB: the
  * shuffle carries 64-byte sketches, never shingle sets).
  *
  * The hash family is the same salted-md5 `h24` the column-expression
  * pipeline uses (hash j of shingle s = h24("j:" + s), [[graft.Tables.h24]]),
  * so this UDAF, [[graft.operators.DedupOps.minhashSignatures]], and the
  * DuckDB oracle all produce bit-identical signatures — the equivalence is
  * oracle-tested, not assumed.
  *
  * Versus the column-expression form: same result, different shape — the
  * expression form needs the shingles pre-exploded (N rows per doc) while
  * this folds an unexploded `array<string>` column's explode inline; prefer
  * the expression form when the exploded table is shared (our dedup chain
  * stages it once for signatures + Jaccard), this form when signatures are
  * the only consumer.
  */
class MinHashAgg(numHashes: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var j = 0
    while (j < numHashes) {
      val hex = md.digest(s"${j + 1}:$shingle".getBytes("UTF-8"))
      // h24 = first 6 hex digits of md5 as a long — [[Tables.h24]]'s JVM twin
      val h = ((hex(0) & 0xffL) << 16) | ((hex(1) & 0xffL) << 8) | (hex(2) & 0xffL)
      if (h < buf(j)) buf(j) = h
      md.reset()
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Sanity twin of the expression-side hash for unit tests. */
  private[graft] def h24(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((hex(0) & 0xffL) << 16) | ((hex(1) & 0xffL) << 8) | (hex(2) & 0xffL)
  }

  /** Twin of [[graft.Tables.h24Slice]]: 24 bits at byte offset 3·slice. */
  private[graft] def h24Slice(s: String, slice: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val o = 3 * slice
    ((hex(o) & 0xffL) << 16) | ((hex(o + 1) & 0xffL) << 8) | (hex(o + 2) & 0xffL)
  }
}
