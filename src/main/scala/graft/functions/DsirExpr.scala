package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass DSIR scoring kernel (r13, VERDICT r12 #7 — the
  * [[LangIdKernel]] precedent applied to `tx_dsir_weights`' scoring pass).
  *
  * The composed form scored a document as
  * `explode(bigrams) → sum(element_at(<256-long literal>, h24(bigram) % 256))`
  * — per bigram: a `concat_ws` string allocation, an exploded row
  * (~10⁴ per document), an md5 over the rebuilt string, and an
  * `element_at` probe into a 256-entry literal. This kernel folds all of
  * it into ONE linear pass over the text bytes with ZERO string building:
  * because tokens are `split(text, ' ')` fields, the bigram
  * `concat_ws(" ", w(i), w(i+1))` is byte-identical to the CONTIGUOUS
  * text slice from token i's start to token i+1's end (the separator
  * between adjacent tokens is exactly one space, including around empty
  * tokens) — so each bigram hashes as an md5 over a slice of the original
  * buffer, no explode, no concat, no literal probe, and the scan stays in
  * whole-stage codegen.
  *
  * Hash semantics are oracle-pinned: `h24` = first 24 bits of the md5
  * digest (the JVM twin of `conv(substring(md5(c),1,6),16,10)`,
  * [[MinHashAgg.h24]]), bucket = h24 % weights.length — bit-identical to
  * the composed form and to the DuckDB replay, so the fusion is
  * hash-checkable, not just faster.
  */
object DsirKernel {

  /** Σ over the text's adjacent-token bigrams of
    * `weights(h24(bigram) % weights.length)` — one pass, slices hashed in
    * place via the single-block [[FastMd5]]. A text with fewer than two
    * tokens scores 0 (and the caller drops it: the composed explode
    * emitted no row for it). */
  def score(text: UTF8String, weights: Array[Long]): Long = {
    val b = text.getBytes
    val n = b.length
    val m = weights.length
    var sum = 0L
    var prevStart = -1 // start of the PREVIOUS token, -1 before the first
    var start = 0      // start of the current token
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (prevStart >= 0)
          sum += weights((FastMd5.h24(b, prevStart, i - prevStart) % m).toInt)
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    sum
  }

  /** The text's bigram-bucket HISTOGRAM: counts(h24(bigram) % buckets)
    * over the same slice walk as [[score]] — the pass-1 kernel. One
    * 256-long array per document replaces ~10⁴ exploded bigram rows
    * feeding the stats aggregation; `posexplode` of the histogram then
    * carries at most `buckets` rows per document into the 256-group sum. */
  def hist(text: UTF8String, buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = text.getBytes
    val n = b.length
    val counts = new Array[Long](buckets)
    var prevStart = -1
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (prevStart >= 0)
          counts((FastMd5.h24(b, prevStart, i - prevStart) % buckets).toInt) += 1L
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }
}

/** text → quantized DSIR log-ratio sum under the pass-1 `weights` grid
  * (see [[DsirKernel.score]]). The grid is a runtime value (computed from
  * the corpus stats pass), carried as a constructor reference and bound
  * into generated code via `addReferenceObj` — not a child expression, so
  * the 256 longs are never re-evaluated per row.
  */
case class DsirScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dsir_score expects a string column")

  override def nullSafeEval(input: Any): Any =
    DsirKernel.score(input.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("dsirWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirKernel.score($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → bigram-bucket histogram (array<long> of length `buckets`), the
  * DSIR stats-pass kernel (see [[DsirKernel.hist]]). */
case class DsirHist(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dsir_hist expects a string column")

  override def nullSafeEval(input: Any): Any =
    DsirKernel.hist(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirKernel.hist($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
