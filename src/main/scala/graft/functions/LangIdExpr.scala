package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID kernel (r12) — the codegen'd fusion of the
  * [[TextFunctions.profileHits]] × [[TextFunctions.LangProfiles]] family.
  *
  * Why it exists: the composed form — four
  * `size(filter(split(text, " "), w => w.isInCollection(profile)))`
  * higher-order expressions folded into a CASE — is semantically right but
  * physically wrong on a corpus scan, twice over. Higher-order functions
  * have no codegen path, so the Filter/Project carrying them falls out of
  * whole-stage codegen entirely; and predicate pushdown INLINES the CASE
  * into every consumer (a `where(bucket < rate(predicted_lang))` clones
  * the whole four-profile tree ~10× into the pushed Filter — the measured
  * plan for tx_stratified_sample carried 81 copies of `split(`, each a
  * fresh tokenize-and-scan of the document). A fused native expression
  * makes every occurrence ONE linear pass over the text bytes, restores
  * whole-stage codegen to the scan, and leaves at most a couple of
  * occurrences per plan for the optimizer to inline harmlessly.
  *
  * Semantics are EXACTLY the composed form's, which is what the DuckDB
  * oracles replay: tokens are the `split(text, ' ')` fields (every single
  * space is a separator; empty fields count as tokens but match no
  * profile word), a token increments each profile containing it
  * (profiles share words — 'la' is es AND fr), counts are independent per
  * profile, and [[PredictedLang]] picks the FIRST profile (LangProfiles
  * order) achieving the maximum hit count, 'und' when the maximum is 0.
  *
  * [[LangHits]] packs the four counts into one long (16-bit lanes,
  * saturating at 0xffff — a lane saturates only past 65 535 stopword hits
  * in one document, far beyond the corpus's document sizes); lane i is
  * `(packed >> 16·i) & 0xffff`, little-lane = LangProfiles head.
  */
object LangIdKernel {

  /** Profile words as UTF-8 byte arrays, in LangProfiles order. */
  private val Profiles: Array[Array[Array[Byte]]] =
    TextFunctions.LangProfiles
      .map(_._2.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)
      .toArray

  /** Profile names + the und fallback, as UTF8String constants. */
  private val Names: Array[UTF8String] =
    (TextFunctions.LangProfiles.map(_._1) :+ "und")
      .map(UTF8String.fromString).toArray

  private def tokenMatches(b: Array[Byte], start: Int, len: Int,
                           w: Array[Byte]): Boolean = {
    if (w.length != len) return false
    var i = 0
    while (i < len) {
      if (b(start + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** One pass over the text: the packed per-profile hit counts. */
  def packedHits(text: UTF8String): Long = {
    val b = text.getBytes
    val n = b.length
    val counts = new Array[Int](Profiles.length)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var p = 0
          while (p < Profiles.length) {
            val words = Profiles(p)
            var w = 0
            var hit = false
            while (!hit && w < words.length) {
              hit = tokenMatches(b, start, len, words(w))
              w += 1
            }
            if (hit && counts(p) < 0xffff) counts(p) += 1
            p += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var packed = 0L
    var p = 0
    while (p < counts.length) {
      packed |= counts(p).toLong << (16 * p)
      p += 1
    }
    packed
  }

  /** First profile achieving the max count (LangProfiles order), und on 0. */
  def predict(text: UTF8String): UTF8String = {
    val packed = packedHits(text)
    var best = 0
    var bestIdx = -1
    var p = 0
    while (p < Profiles.length) {
      val c = ((packed >> (16 * p)) & 0xffff).toInt
      if (c > best) { best = c; bestIdx = p }
      p += 1
    }
    if (bestIdx < 0) Names(Names.length - 1) else Names(bestIdx)
  }
}

/** Session registration + Column builders for the langid family. */
object LangIdExpressions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.expr

  def ensureRegistered(spark: SparkSession): Unit = {
    FnReg.once(spark, "lang_hits", exprs => LangHits(exprs.head))
    FnReg.once(spark, "predicted_lang_of", exprs => PredictedLang(exprs.head))
  }

  /** Packed per-profile hit counts of a string column (16-bit lanes). */
  def langHits(spark: SparkSession, c: String = "text"): Column = {
    ensureRegistered(spark)
    expr(s"lang_hits($c)")
  }

  /** Predicted language of a string column; 'und' also on NULL text —
    * the composed when-chain's behavior (its null conditions fall through
    * to the und literal), preserved so the fusion is plan-for-plan
    * result-identical. */
  def predictedLang(spark: SparkSession, c: String = "text"): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.coalesce(
      expr(s"predicted_lang_of($c)"),
      org.apache.spark.sql.functions.lit("und"))
  }
}

/** text → packed per-profile stopword hit counts (see [[LangIdKernel]]). */
case class LangHits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("lang_hits expects a string column")

  override def nullSafeEval(input: Any): Any =
    LangIdKernel.packedHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernel.packedHits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → predicted language code (see [[LangIdKernel.predict]]). */
case class PredictedLang(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("predicted_lang expects a string column")

  override def nullSafeEval(input: Any): Any =
    LangIdKernel.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernel.predict($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
