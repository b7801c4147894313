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

/** Native codegen'd nearest-centroid argmin — the k-means / PQ assignment
  * kernel as ONE fused expression: per row, the self-dot once, then for
  * every codebook entry `d2 = round6(ee + cc − 2·e·cd)` with the running
  * `(d2, k)` minimum kept in registers — no per-entry struct allocation, no
  * array materialization, no interpreter.
  *
  * Exists because both generic routes measured poorly on the 10× audit: a
  * higher-order-function fold over a codebook literal evaluates lambda
  * bodies on the INTERPRETED path (the assignment pass was the similarity
  * family's biggest staging item), and unrolling `array_min(array(struct...))`
  * over k entries bloats generated code (one boxed struct per entry per
  * row) and got slower at k = 80. This is SURVEY §2's escalation order in
  * action: compose built-ins first, drop to a native `Expression` when the
  * measurements say so.
  *
  * Arity-4 registered function: `nearest_centroid(e, ks, cents, ccs)` where
  * the last three are FOLDABLE array literals (codes/centroids/self-dots,
  * extracted once per plan and baked into the generated code as reference
  * objects). Arithmetic is bit-identical to the declarative form it
  * replaces: dots accumulate left-to-right like [[VecDot]], `round6` is the
  * exact `java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP)` sequence
  * Spark's own `round(col, 6)` generates, ties keep the SMALLEST k (entries
  * are pre-sorted by k; strict `<` keeps the first) — the `min(struct(d2,
  * k))` semantics every oracle replays.
  */
case class NearestCentroid(children: Seq[Expression]) extends Expression {
  private def e = children.head

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = e.nullable
  override def foldable: Boolean = false

  private def elemIsFloat: Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val eOk = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (!eOk)
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects array<float|double> input, got ${e.dataType.simpleString}")
    else if (!children.drop(1).forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "nearest_centroid codebook arguments must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  // codebook extracted once per plan from the foldable children
  @transient private lazy val ks: Array[Long] =
    children(1).eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cents: Array[Array[Double]] =
    children(2).eval().asInstanceOf[ArrayData].toObjectArray(ArrayType(DoubleType))
      .map(_.asInstanceOf[ArrayData].toDoubleArray())
  @transient private lazy val ccs: Array[Double] =
    children(3).eval().asInstanceOf[ArrayData].toDoubleArray()

  /** The exact double-rounding sequence Spark's `round(x, 6)` performs. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ev = e.eval(input)
    if (ev == null) return null
    val arr = ev.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = arr.numElements()
    var ee = 0.0
    var i = 0
    while (i < n) {
      val v = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      ee += v * v
      i += 1
    }
    var bestD = Double.MaxValue
    var bestK = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cd = cents(c)
      val m = math.min(n, cd.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        val v = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += v * cd(i)
        i += 1
      }
      val d2 = round6(ee + ccs(c) - 2 * dot)
      if (d2 < bestD) { bestD = d2; bestK = ks(c) }
      c += 1
    }
    bestK
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val ccsRef = ctx.addReferenceObj("selfdots", ccs, "double[]")
    val ksRef = ctx.addReferenceObj("codes", ks, "long[]")
    val eCode = e.genCode(ctx)
    val arr = eCode.value
    val get = if (elemIsFloat) s"((double) $arr.getFloat(%s))" else s"$arr.getDouble(%s)"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val ee = ctx.freshName("ee")
    val dot = ctx.freshName("dot")
    val d2 = ctx.freshName("d2")
    val bestD = ctx.freshName("bestD")
    val bestK = ctx.freshName("bestK")
    val cd = ctx.freshName("cd")
    val m = ctx.freshName("m")
    val body =
      s"""
         |int $n = $arr.numElements();
         |double $ee = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $ee += ${get.format(i)} * ${get.format(i)}; }
         |double $bestD = Double.MAX_VALUE;
         |long $bestK = Long.MAX_VALUE;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cd = $centsRef[$c];
         |  int $m = java.lang.Math.min($n, $cd.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) { $dot += ${get.format(i)} * $cd[$i]; }
         |  double $d2 = java.math.BigDecimal.valueOf($ee + $ccsRef[$c] - 2 * $dot)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($d2 < $bestD) { $bestD = $d2; $bestK = $ksRef[$c]; }
         |}
         |${ev.value} = $bestK;
       """.stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (nullable) {
      ev.copy(code =
        code"""
           |${eCode.code}
           |boolean ${ev.isNull} = ${eCode.isNull};
           |long ${ev.value} = 0L;
           |if (!${ev.isNull}) {
           |$body
           |}
         """.stripMargin)
    } else {
      ev.copy(code =
        code"""
           |${eCode.code}
           |long ${ev.value} = 0L;
           |$body
         """.stripMargin,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object VectorExpressions {

  /** Register vec_dot for the session. Unconditional:
    * createOrReplaceTempFunction is idempotent, and a keyed
    * registered-set would grow unboundedly across sessions (ADVICE r1).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    FnReg.once(spark, "vec_dot", exprs => VecDot(exprs.head, exprs(1)))
    FnReg.once(spark, "nearest_centroid", exprs => NearestCentroid(exprs))
  }

  /** Fused argmin over a collected codebook ([[NearestCentroid]]): returns
    * the winning entry's k for each row of `e`. `entries` must be sorted by
    * k ascending (the tie-break contract).
    */
  def nearestCentroid(spark: SparkSession, e: Column,
      entries: Seq[(Long, Seq[Double], Double)]): Column = {
    ensureRegistered(spark)
    import org.apache.spark.sql.functions.typedLit
    call_function("nearest_centroid", e,
      typedLit(entries.map(_._1)),
      typedLit(entries.map(_._2)),
      typedLit(entries.map(_._3)))
  }

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
