package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column family (north-star extension, BASELINE.json): treat
  * media as opaque `binary` payloads with typed metadata, and run
  * decode / feature-extract / frame-sample as batch functions over
  * partitions.
  *
  * The container has no image/audio codecs, so the decode step is a STUB —
  * [[MediaOps.decodeStub]] derives deterministic fake features from the
  * payload checksum. Everything around it is real Spark plumbing: the binary
  * column, the metadata schema, the typed `mapPartitions` batch shape (the
  * Scala analog of `mapInPandas` — one iterator per partition, vectorizable
  * batch-by-batch), and the frame-sampling explode.
  */
object MediaOps {

  /** Media row after payload packing. */
  case class MediaRow(doc_id: Long, n_bytes: Long, format: String, checksum: String)

  /** Extracted pseudo-features (the stubbed "decoder" output). */
  case class MediaFeatures(doc_id: Long, f0: Double, f1: Double, f2: Double, f3: Double)

  /** Pack `documents.text` as an opaque binary payload + typed metadata —
    * the schema a real image/audio column would carry.
    */
  def payloads(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      length(col("text")).cast("long").as("n_bytes"),
      lit("text/plain").as("format"),
      md5(col("text")).as("checksum"))

  /** Metadata-only projection (oracle-comparable: no raw binary). */
  def metadata(spark: SparkSession, sfDir: String): DataFrame =
    payloads(spark, sfDir).select("doc_id", "n_bytes", "format", "checksum")

  /** Registered decode query: the same pseudo-features as [[decodeStub]],
    * computed with codegen'd built-ins (md5/conv chain) — no typed
    * serialization in the plan. The `mapPartitions` decoder *shape* (the
    * swap-in point for a real native codec) stays demonstrated and
    * equivalence-tested by [[decodeStub]] in SimMediaSpec.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    def feat(b: Int) =
      (conv(substring(md5(concat(col("checksum"), lit(s":$b"))), 1, 6), 16, 10)
        .cast("long").cast("double") / 16777216.0).as(s"f$b")
    payloads(spark, sfDir).select(col("doc_id"), feat(0), feat(1), feat(2), feat(3))
  }

  /** STUB decoder: deterministic pseudo-features from the checksum — stands
    * in for a real `decode → resize → embed` batch UDF. The mapPartitions
    * shape is the real thing: one iterator per partition, no driver
    * round-trips, safe to swap for a JNI/native decoder at scale.
    */
  def decodeStub(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    metadata(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        def feat(b: Int): Double = {
          digest.reset()
          val hex = digest.digest(s"${r.checksum}:$b".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.substring(0, 6), 16).toDouble / 16777216.0
        }
        MediaFeatures(r.doc_id, feat(0), feat(1), feat(2), feat(3))
      }
    }
  }

  /** Real P6 PPM image payloads, rendered deterministically from the corpus:
    * width 8, height 1+(h24(text) mod 8), maxval 255, raster = the first
    * 24·height bytes of md5(text) repeated — hex characters, so every pixel
    * byte is plain ASCII and the DuckDB oracle can rebuild the identical
    * bytes by column arithmetic. The HEADER is genuine Netpbm (`P6\n8 H\n
    * 255\n` + raw raster), so the decoder below exercises a real binary
    * format parse, not a checksum stand-in.
    */
  def ppmPayloads(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (Tables.h24(col("text")) % 8 + 1).as("hgt"),
        md5(col("text")).as("hx"))
      .select(col("doc_id"),
        concat(lit("P6\n8 "), col("hgt").cast("string"), lit("\n255\n"),
          expr("substring(repeat(hx, 6), 1, 24 * hgt)")).cast("binary")
          .as("payload"))

  /** REAL decode (VERDICT r7 #5 — replaces the stub as the registered
    * decode path): parse the binary PPM header + raster with the native
    * codegen'd [[graft.functions.PpmStats]] expression and emit header
    * fields plus exact per-channel sum/min/max. The whole pipeline — payload
    * render, parse, stats — fuses into one WholeStageCodegen stage over the
    * documents scan; at 100 TB this is a narrow map with zero shuffle.
    * [[decodeStub]] remains as the documented mapPartitions swap-in shape
    * for codecs that need native libraries.
    */
  def ppmDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = graft.functions.MediaExpressions.ppmStats(spark, col("payload"))
    ppmPayloads(spark, sfDir)
      .select(col("doc_id"), stats.as("s"))
      .select(col("doc_id") +:
        graft.functions.PpmDecode.schema.fieldNames.toSeq
          .map(f => col(s"s.$f").as(f)): _*)
  }

  /** Little-endian hex rendering of an integer column (`nBytes` wide) — the
    * data-dependent fields of a RIFF header. Codegen'd built-ins only.
    */
  private def le32sql(e: String): String =
    (0 until 4).map(i => s"lpad(hex(($e div ${1L << (8 * i)}) % 256), 2, '0')")
      .mkString("concat(", ", ", ")")

  private def leHex(v: Long, nBytes: Int): String =
    (0 until nBytes).map(i => f"${(v >> (8 * i)) & 0xff}%02x").mkString

  /** WAV render constants: 8 kHz mono 8-bit unsigned PCM. */
  val WavRate = 8000L

  /** Real RIFF/WAVE audio payloads, rendered deterministically from the
    * corpus: a genuine PCM header (RIFF size, `fmt ` chunk with
    * format/channels/rate/bits, `data` chunk with LE length — built with
    * `unhex` over codegen'd hex arithmetic) followed by
    * `16·(1 + h24(text) mod 16)` unsigned 8-bit samples whose bytes are the
    * ASCII codes of md5(text) hex chars repeated — so the DuckDB oracle can
    * rebuild the identical samples by column arithmetic while the header
    * bytes are real binary little-endian fields, not ASCII stand-ins.
    */
  def wavPayloads(spark: SparkSession, sfDir: String): DataFrame = {
    val fmtBody = leHex(1, 2) + leHex(1, 2) + leHex(WavRate, 4) +
      leHex(WavRate, 4) + leHex(1, 2) + leHex(8, 2)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (Tables.h24(col("text")) % 16 + 1).multiply(16).as("n"),
        md5(col("text")).as("hx"))
      .select(col("doc_id"),
        concat(
          lit("RIFF").cast("binary"),
          unhex(expr(le32sql("(36 + n)"))),
          lit("WAVEfmt ").cast("binary"),
          unhex(lit(leHex(16, 4) + fmtBody)),
          lit("data").cast("binary"),
          unhex(expr(le32sql("n"))),
          expr("substring(repeat(hx, 8), 1, n)").cast("binary")).as("payload"))
  }

  /** REAL audio decode: parse the RIFF container with the native codegen'd
    * [[graft.functions.WavStats]] expression (chunk walk, `fmt `/`data`
    * extraction, exact integer sample stats). Same fused narrow-map shape as
    * [[ppmDecode]] — render, parse, stats in one WholeStageCodegen stage
    * over the documents scan; zero shuffle at any scale.
    */
  def wavDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = graft.functions.MediaExpressions.wavStats(spark, col("payload"))
    wavPayloads(spark, sfDir)
      .select(col("doc_id"), stats.as("s"))
      .select(col("doc_id") +:
        graft.functions.WavDecode.schema.fieldNames.toSeq
          .map(f => col(s"s.$f").as(f)): _*)
  }

  /** Frame sampling: fixed 32-byte frames of the payload with per-frame
    * checksums — the video frame-extraction shape (explode over a computed
    * frame index, narrow, codegen'd).
    */
  def frames(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      // guard: sequence(1, 0) would yield [1, 0] (descending) for an empty
      // text, emitting bogus frames where the oracle's range(1, 1) emits none
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) > 0,
          sequence(lit(1), expr("(length(text) + 31) div 32")))
          .otherwise(array().cast("array<int>"))).as("frame_no"))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        expr("substring(text, (frame_no - 1) * 32 + 1, 32)").as("frame"),
        md5(expr("substring(text, (frame_no - 1) * 32 + 1, 32)")).as("frame_md5"))
}
