package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Bloom-filter UDAF (SURVEY §2 UDF/UDAF surface; Bloom 1970) — the
  * fourth mergeable-summary family next to Count–Min ([[CountMinAgg]]),
  * Misra–Gries ([[FrequencyAgg]]) and MinHash ([[MinHashAgg]]): a fixed
  * `numBits` bit array where each key sets `numHashes` positions
  * `h_j(key) mod numBits`. Merge is bitwise OR — fully associative and
  * commutative — so Spark's partial aggregation carries a fixed-size word
  * array per task regardless of key cardinality. Membership tests NEVER
  * false-negative: every inserted key probes all-ones; a non-member
  * false-positives with p ≈ (1 − e^(−kn/m))^k.
  *
  * The bit positions use the library's portable salted-md5 family
  * (`h_j(key) = h24("j:" + key)`, [[MinHashAgg.h24]], the JVM twin of
  * [[graft.Tables.h24]]) — same salt scheme as [[CountMinAgg]] — so the
  * DuckDB oracle can REBUILD the exact bit set with a GROUP BY and replay
  * every membership verdict, false positives included: the filter is
  * value-hash-checkable, not just property-tested.
  *
  * Scale role: the build side of bloom semi-join pruning — at 100 TB the
  * filter of a selective dimension collects to KBs, embeds as a broadcast
  * literal, and discards most fact rows at the scan before any join
  * shuffle (the manual twin of Spark's own runtime `bloom_filter_agg`
  * rewrite, exercised by `xp_runtime_filter_revenue` — this one buys exact
  * cross-engine replayability).
  */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      val pos = BloomAgg.pos(j, key, numBits)
      buf(pos >> 6) |= 1L << (pos & 63)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BloomAgg {
  /** Hash-j bit position of a key: the portable salted-h24 mod numBits. */
  private[graft] def pos(j: Int, key: Long, numBits: Int): Int =
    (MinHashAgg.h24(s"$j:$key") % numBits).toInt

  /** String-keyed twin — a Long key's decimal form probes the SAME bits,
    * so a filter built over `cast(col as string)` answers Long probes. */
  private[graft] def pos(j: Int, key: String, numBits: Int): Int =
    (MinHashAgg.h24(s"$j:$key") % numBits).toInt

  /** All `numHashes` bit positions of a key from ONE MD5 digest (ADVICE
    * r11): the salted family above re-digests `"$j:$key"` per probe — 8×
    * the hashing the write-time bloom pass needs on every staged row. One
    * 128-bit digest already carries enough independence: h1 = bytes 0–7,
    * h2 = bytes 8–15 forced odd, position j = (h1 + j·h2) mod m — the
    * Kirsch–Mitzenmacher double-hashing construction, whose false-positive
    * rate matches k independent hashes. Build ([[BloomStrAgg]]) and probe
    * ([[graft.sources.TxStats.BloomStat]]) BOTH derive through here, so
    * they cannot disagree; the oracle-replayable Long-keyed [[BloomAgg]]
    * stays on the salted family its DuckDB twin rebuilds.
    */
  private[graft] def posAll(key: String, numBits: Int, numHashes: Int): Array[Int] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 8) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    h2 |= 1L
    val out = new Array[Int](numHashes)
    var j = 0
    var h = h1
    while (j < numHashes) {
      out(j) = java.lang.Math.floorMod(h, numBits.toLong).toInt
      h += h2
      j += 1
    }
    out
  }
}

/** String-keyed [[BloomAgg]] twin (null keys skipped) — the build side of
  * [[graft.sources.TxStats.BloomStat]]: one pass over a freshly staged
  * file's values (grouped by `input_file_name()`) folds each column into a
  * fixed `numBits` filter that rides the commit log and answers point
  * probes at plan time. Positions come from [[BloomAgg.posAll]]'s
  * single-digest double hashing (one MD5 per key, not one per probe) —
  * this filter is probed only by the JVM prover, never rebuilt by the
  * DuckDB oracle, so it is free to take the cheaper derivation.
  */
class BloomStrAgg(numBits: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    if (key != null) {
      // one digest per key, all k positions derived from it (ADVICE r11)
      val ps = BloomAgg.posAll(key, numBits, numHashes)
      var j = 0
      while (j < numHashes) {
        val pos = ps(j)
        buf(pos >> 6) |= 1L << (pos & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
