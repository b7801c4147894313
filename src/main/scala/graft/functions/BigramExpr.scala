package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BIGRAM ARRAY kernel (r13) — the collocation-table twin of
  * [[DsirKernel]]: the composed form
  * `transform(sequence(1, size(w)−1), i → concat_ws(" ", w(i), w(i+1)))`
  * over `w = split(text, ' ')` (plus `array_distinct` for the distinct
  * variant) allocates a token array, a string per bigram, and a per-row
  * hash pass over the rebuilt strings. Because tokens are single-space
  * split fields, each bigram is byte-identical to the CONTIGUOUS text
  * slice from token i's start to token i+1's end — so this kernel walks
  * the bytes once, copies each slice straight into the output UTF8String,
  * and (for the distinct variant) dedups slices in one first-occurrence-
  * order set probe. Output strings are byte-identical to the composed
  * form's, so every downstream group/count — and with it the DuckDB
  * oracle — is unchanged; only the construction cost moves.
  */
object BigramKernel {

  def bigrams(text: UTF8String, distinct: Boolean): ArrayData = {
    val b = text.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String]()
    // distinct mode: first-occurrence order, exactly array_distinct's
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var prevStart = -1
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (prevStart >= 0) {
          val s = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, prevStart, i))
          if (seen == null || seen.add(s)) out.add(s): Unit
        }
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** text → its adjacent-token bigram array; `distinct = true` keeps each
  * bigram's first occurrence only (see [[BigramKernel]]). */
case class TextBigrams(child: Expression, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("text_bigrams expects a string column")

  override def nullSafeEval(input: Any): Any =
    BigramKernel.bigrams(input.asInstanceOf[UTF8String], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramKernel.bigrams($c, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
