package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic integer logarithms: ln/log2 of a positive integer spelled
  * as an EXPLICIT IEEE-754 chain — range reduction by the argument's bit
  * length (`length(bin(k)) - 1`, exact in both engines), then a 10-term
  * odd-power atanh ladder — generated from ONE term structure into three
  * twins: a Spark `Column` graph, a DuckDB SQL string, and a driver-side
  * Scala evaluator.
  *
  * Why this exists (VERDICT r10 #6, #3): the log-family lint-whitelist
  * entries (`tx_token_entropy`, `tx_zipf_fit`, `xt_psi_drift`,
  * `tx_dsir_weights`) were stuck on a real impasse — quantizing a libm
  * log to a decimal grid is only cross-engine-stable up to the engines'
  * libm disagreement (JVM fdlibm vs DuckDB libm differ in the last ulp),
  * so the anchor itself could flip across engines. This chain removes
  * libm from the kernel: every backend runs the SAME sequence of
  * correctly-rounded IEEE +,−,×,÷ on the same operands, so the three
  * values are bit-identical BY CONSTRUCTION, and a downstream
  * `round(x·scale)` quantization sees identical operands in Spark, DuckDB,
  * and driver-side Scala — the precondition the seasonality-strength
  * anchoring established (`TimeSeriesOps.StrengthScale`). Quantized
  * log terms then aggregate as EXACT integers (order-free), retiring the
  * whitelist prose bounds.
  *
  * The two non-chain primitives are exact in both engines:
  *  - bit length: Spark `bin(long)` and DuckDB `bin(bigint)` both emit the
  *    minimal binary string (verified: '101' for 5), so `length − 1` is
  *    the exact floor(log2 k) as an integer;
  *  - `pow(2.0, e)`: 2^e is representable for e ≤ 63 and both Java
  *    `Math.pow` (exact-integer-result guarantee in its spec) and libm
  *    `pow` return it exactly.
  *
  * Accuracy: t = (m−1)/(m+1) ≤ 1/3 for m ∈ [1,2], so truncation after
  * t¹⁹/19 is ≤ 2·(1/3)²¹/21 ≈ 9·10⁻¹² absolute — a deterministic
  * redefinition of the kernel (mirrored in every oracle), invisible at
  * the 6-dp emission grids and below the 10⁻⁹ quantization grids the
  * callers use. Arguments above 2^53 lose bits in the BIGINT→DOUBLE cast,
  * but both engines round that cast identically, so determinism holds at
  * any magnitude.
  *
  * All backends are generated through [[Arith]] so the association order
  * CANNOT diverge; `DetLogSpec` asserts Column-vs-Scala bit equality and
  * every oracle replay asserts the SQL twin end-to-end.
  */
object DetLog {

  /** Nearest double to ln 2, as the literal text every backend parses. */
  private val Ln2 = "0.6931471805599453"

  /** Odd-power series terms (t, t³/3, …, t¹⁹/19). */
  private val Terms = 10

  private trait Arith[T] {
    def lit(text: String): T
    def add(a: T, b: T): T
    def sub(a: T, b: T): T
    def mul(a: T, b: T): T
    def div(a: T, b: T): T
  }

  /** The shared term structure: (ln k, log2 k) from kd = double(k),
    * e = double(floor(log2 k)), p2 = double(2^e).
    */
  private def chain[T](kd: T, e: T, p2: T, a: Arith[T]): (T, T) = {
    import a._
    val m = div(kd, p2)
    val t = div(sub(m, lit("1.0")), add(m, lit("1.0")))
    val u = mul(t, t)
    // ladder: p(i) = p(i-1)·u, left-associated — identical tree everywhere
    val powers = Iterator.iterate(t)(p => mul(p, u)).take(Terms).toSeq
    val s = powers.zipWithIndex.map { case (p, i) =>
      if (i == 0) p else div(p, lit(s"${2 * i + 1}.0"))
    }.reduceLeft(add)
    val ln = add(mul(e, lit(Ln2)), mul(lit("2.0"), s))
    val log2 = add(e, div(mul(lit("2.0"), s), lit(Ln2)))
    (ln, log2)
  }

  private object ColArith extends Arith[Column] {
    def lit(text: String): Column = org.apache.spark.sql.functions.lit(text.toDouble)
    def add(a: Column, b: Column): Column = a + b
    def sub(a: Column, b: Column): Column = a - b
    def mul(a: Column, b: Column): Column = a * b
    def div(a: Column, b: Column): Column = a / b
  }

  private object SqlArith extends Arith[String] {
    def lit(text: String): String = s"($text::DOUBLE)"
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def div(a: String, b: String): String = s"($a / $b)"
  }

  private object DblArith extends Arith[Double] {
    def lit(text: String): Double = text.toDouble
    def add(a: Double, b: Double): Double = a + b
    def sub(a: Double, b: Double): Double = a - b
    def mul(a: Double, b: Double): Double = a * b
    def div(a: Double, b: Double): Double = a / b
  }

  private def colChain(k: Column): (Column, Column) = {
    val e = (length(bin(k)) - 1).cast("double")
    chain(k.cast("double"), e, pow(org.apache.spark.sql.functions.lit(2.0), e), ColArith)
  }

  private def sqlChain(kExpr: String): (String, String) = {
    val e = s"((length(bin($kExpr)) - 1)::DOUBLE)"
    chain(s"(($kExpr)::DOUBLE)", e, s"pow((2.0::DOUBLE), $e)", SqlArith)
  }

  private def dblChain(k: Long): (Double, Double) = {
    require(k >= 1, s"DetLog needs a positive integer, got $k")
    val e = (63 - java.lang.Long.numberOfLeadingZeros(k)).toDouble
    // Math.pow(2, e) is exact for integral e ≤ 63 (Java spec) — the same
    // value Spark's pow and DuckDB's pow produce
    chain(k.toDouble, e, math.pow(2.0, e), DblArith)
  }

  /** Deterministic ln over a positive-integer-valued LONG column. */
  def ln(k: Column): Column = colChain(k)._1

  /** Deterministic log2 over a positive-integer-valued LONG column. */
  def log2(k: Column): Column = colChain(k)._2

  /** DuckDB twin of [[ln]]; `kExpr` must be a BIGINT-typed expression ≥ 1. */
  def lnSql(kExpr: String): String = sqlChain(kExpr)._1

  /** DuckDB twin of [[log2]]. */
  def log2Sql(kExpr: String): String = sqlChain(kExpr)._2

  /** Driver-side twin of [[ln]] — bit-identical to the Column/SQL chains. */
  def lnScala(k: Long): Double = dblChain(k)._1

  /** Driver-side twin of [[log2]]. */
  def log2Scala(k: Long): Double = dblChain(k)._2
}
