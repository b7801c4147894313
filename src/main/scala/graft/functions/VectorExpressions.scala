package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, expr}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot paths (SURVEY §2 UDF
  * surface: "a Catalyst `Expression` with codegen ... beats a Scala UDF").
  * `VecDot` computes Σ (double)aᵢ·(double)bᵢ over two numeric array columns
  * — each side independently `array<float>` or `array<double>` — inside
  * WholeStageCodegen: no boxing, no higher-order-function interpreter,
  * sequential accumulation in index order, so results are bit-identical to
  * the interpreted `aggregate(zip_with(...))` fold it replaces and to the
  * DuckDB oracle's double-cast `list_dot_product`. (float→double widening is
  * exact, and both paths add the products left-to-right.)
  *
  * This is the arithmetic kernel of every similarity/dedup operator:
  * brute-force + IVF cosine (float·float), k-means training (double·double
  * — the r2 verdict's hottest interpreted path), and SRP bucketing
  * (float·double against hyperplane literals).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  private def getter(side: Expression, arr: String, i: String): String =
    if (elemType(side).contains(FloatType)) s"((double) $arr.getFloat($i))"
    else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {

  /** Register vec_dot for the session. Unconditional:
    * createOrReplaceTempFunction is idempotent, and a keyed
    * registered-set would grow unboundedly across sessions (ADVICE r1).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")

  /** Σ aᵢ·bᵢ over two numeric array columns (codegen'd native expression). */
  def vecDot(spark: SparkSession, a: String, b: String): Column = {
    ensureRegistered(spark)
    expr(s"vec_dot($a, $b)")
  }

  /** Column-API form of [[vecDot]] for composed expressions (the k-means /
    * SRP hot loops, where the operands are not bare column names).
    */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("vec_dot", a, b)
  }
}
