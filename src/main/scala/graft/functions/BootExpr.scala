package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Poisson-bootstrap replicate-weight kernel (r14, VERDICT r13 #7 — the
  * [[DsirKernel]] precedent applied to `xa_bootstrap_ci`'s one corpus
  * pass).
  *
  * The composed form drew a row's B = 32 replicate weights as 64 aggregate
  * expressions over `conv(substring(md5(concat('g:', key)), 1+6s, 6), 16,
  * 10)` — per row: 7 string concats, 7 Spark `md5` calls (each a
  * codec-hex round trip), 7 base-16 `conv` parses, and 32 five-arm CASE
  * chains, duplicated across the Σwx / Σw column pairs unless
  * subexpression elimination catches every one. This kernel folds the
  * whole draw into ONE walk: a single reused `"g:" ‖ key` byte buffer
  * re-stamped per digest group, [[FastMd5.h24Slices]] pulling FIVE 24-bit
  * draws out of each single-block digest (zero allocation, no hex
  * round-trip), and an integer CDF scan per draw — emitting the row's
  * full weight vector as one array that the aggregate reads by index.
  *
  * Hash semantics are ORACLE-PINNED: weight b = inverse-CDF bucket of
  * `h24Slice(md5(s"${b/5}:$key"), b%5)` against the caller's integer
  * breakpoints — bit-identical to the composed column form (spec-pinned
  * property) and to the DuckDB replay, so the fusion is hash-checkable.
  * Scope of the bit-identity claim: NON-NULL keys. A NULL key yields a
  * NULL vector here (standard null-intolerant expression semantics),
  * where the composed CASE chain fell through `md5(NULL) → NULL` to its
  * `otherwise(5)` arm — an artifact, not a semantic; the one caller
  * hashes a cast of a non-null key column.
  */
object BootKernel {

  /** The `replicates` Poisson weights of one key: groups of five draws per
    * digest, bucketed by ascending CDF breakpoints (bucket = first index
    * whose breakpoint exceeds the draw; past the last = cdf.length). */
  def weights(key: UTF8String, cdf: Array[Long], replicates: Int): ArrayData = {
    val kb = key.getBytes
    val n = kb.length
    val buf = new Array[Byte](n + 2) // "g:" ‖ key — g re-stamped per group
    buf(1) = ':'
    System.arraycopy(kb, 0, buf, 2, n)
    val out = new Array[Long](replicates)
    val slices = new Array[Long](5)
    val groups = (replicates + 4) / 5
    var g = 0
    while (g < groups) {
      buf(0) = ('0' + g).toByte // single digit: replicates ≤ 45 enforced below
      FastMd5.h24Slices(buf, 0, n + 2, slices)
      var s = 0
      var b = g * 5
      while (s < 5 && b < replicates) {
        val h = slices(s)
        var w = 0
        while (w < cdf.length && h >= cdf(w)) w += 1
        out(b) = w.toLong
        s += 1
        b += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** key → array<long> of `replicates` Poisson-bootstrap weights (see
  * [[BootKernel.weights]]). The CDF breakpoints are a runtime reference
  * object — bound into generated code, never re-evaluated per row. */
case class BootWeights(child: Expression, cdf: Array[Long], replicates: Int)
    extends UnaryExpression {
  require(replicates <= 45,
    s"BootWeights draws 5 per single-digit digest group: $replicates > 45")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("boot_weights expects a string key")

  override def nullSafeEval(input: Any): Any =
    BootKernel.weights(input.asInstanceOf[UTF8String], cdf, replicates)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("bootCdf", cdf, "long[]")
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.BootKernel.weights($k, $c, $replicates)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
