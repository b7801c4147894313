package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the set-similarity verify hot path:
  * `SortedIntersectN(a, b)` = |a ∩ b| for two SORTED, duplicate-free
  * `array<string>` columns, computed as a two-pointer merge count inside
  * WholeStageCodegen — no per-row hash set, no materialized intersection
  * array, no boxing. Exactly `size(array_intersect(a, b))` on inputs that
  * are sorted and distinct (which every caller guarantees: the arrays come
  * from `sort_array(collect_list(...))` over a distinct token/gram scan),
  * but `array_intersect` builds an OpenHashSet AND an output ArrayData per
  * row, which is pure allocation overhead when only the COUNT is needed —
  * and the verify step of every candidate-pair dedup join
  * ([[graft.operators.DedupOps.prefixJaccard]], the rare-gram overlaps)
  * evaluates it millions of times per run.
  *
  * Sort order contract: both inputs sorted by Spark's own string ordering
  * (`sort_array` uses binary UTF8String order, the same order
  * `UTF8String.compareTo` implements), so the merge never misses an equal
  * pair. Null ELEMENTS are not expected (collect_list never emits them);
  * a null ARRAY on either side yields null like any binary expression.
  */
case class SortedIntersectN(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def isStrArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArray(left) && isStrArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_n expects array<string> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetExpressions {

  /** Register sorted_intersect_n for the session (idempotent — the
    * [[VectorExpressions.ensureRegistered]] discipline).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    FnReg.once(spark, "sorted_intersect_n",
      exprs => SortedIntersectN(exprs.head, exprs(1)))

  /** |a ∩ b| as a long, for sorted duplicate-free string arrays. */
  def sortedIntersectN(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("sorted_intersect_n", a, b)
  }
}
