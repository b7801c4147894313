package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Z-order (Morton) curve encoders — the space-filling keys behind the
  * GeoMesa Z2/Z3 index tables whose *names* the reference manipulates
  * (`catalog_<sft>_z3` etc., /root/reference/geomesa_cassandra.py:48-52)
  * but whose curves it never computes. Here they are first-class codegen'd
  * Catalyst expressions: at 100 TB the z-key is the partition/sort key that
  * turns a 2-D/3-D range query into a compact parquet row-group range scan.
  *
  * [[ZEncode2]]: interleave two 16-bit coords → 32-bit Morton key.
  * [[ZEncode3]]: interleave three 10-bit coords → 30-bit key (x,y,time).
  * Inputs are pre-scaled non-negative ints; both have interpreted + codegen
  * paths producing identical values, mirrored in oracle SQL by shift/mask
  * arithmetic.
  */
case class ZEncode2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => ZCurveExpressions.isIntegral(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("z2 expects integral coords")

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (toLong(a), toLong(b))
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (z, i) = (ctx.freshName("z"), ctx.freshName("i"))
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (((long) $a >> $i) & 1L) << (2 * $i);
         |  $z |= (((long) $b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ZEncode3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(e => ZCurveExpressions.isIntegral(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("z3 expects integral coords")

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val (x, y, t) = (toLong(a), toLong(b), toLong(c))
    var z = 0L
    var i = 0
    while (i < 10) {
      z |= ((x >> i) & 1L) << (3 * i)
      z |= ((y >> i) & 1L) << (3 * i + 1)
      z |= ((t >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val (z, i) = (ctx.freshName("z"), ctx.freshName("i"))
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 10; $i++) {
         |  $z |= (((long) $a >> $i) & 1L) << (3 * $i);
         |  $z |= (((long) $b >> $i) & 1L) << (3 * $i + 1);
         |  $z |= (((long) $c >> $i) & 1L) << (3 * $i + 2);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object ZCurveExpressions {
  private[graft] def isIntegral(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  /** Register z2/z3 for the session (register-when-absent via [[FnReg]] —
    * per-session lookup state, nothing grows across sessions, ADVICE r1).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    FnReg.once(spark, "z2_encode", exprs => ZEncode2(exprs.head, exprs(1)))
    FnReg.once(spark, "z3_encode",
      exprs => ZEncode3(exprs.head, exprs(1), exprs(2)))
  }

  def z2(spark: SparkSession, x: String, y: String): Column = {
    ensureRegistered(spark)
    expr(s"z2_encode($x, $y)")
  }

  def z3(spark: SparkSession, x: String, y: String, t: String): Column = {
    ensureRegistered(spark)
    expr(s"z3_encode($x, $y, $t)")
  }
}
