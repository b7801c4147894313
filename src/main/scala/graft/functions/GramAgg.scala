package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Gram-matrix UDAF (SURVEY §2 UDF/UDAF surface): folds the embedding
  * stream into the upper-triangle outer-product accumulator in one pass —
  * `reduce` quantizes a vector once and adds its d·(d+1)/2 cell
  * contributions in place; `merge` is elementwise long addition, so the
  * aggregate is map-side combinable and its state is a fixed ~16 KB cell
  * block (d = 64) regardless of corpus size.
  *
  * Arithmetic is the same [[graft.operators.SimilarityOps.GramScale]]
  * fixed-point quantization the column-expression form
  * ([[graft.operators.SimilarityOps.gramMatrix]]) and the DuckDB oracle use
  * — `floor(x · scale)` on the exactly-widened float, products and sums of
  * exact integers, and integer addition is commutative, so the result is
  * bit-identical under ANY partitioning; the equivalence is oracle-tested,
  * not assumed.
  *
  * Versus the column-expression form: same cells, different shape — the
  * declarative plan expands every vector into d·(d+1)/2 rows (×2080 at
  * d = 64) and streams them through hash aggregation, while this folds the
  * unexploded `array<float>` column directly: one array update per vector
  * per task, and the exchange carries one cell block per task. Long
  * accumulators: |q| < 2¹³ ⇒ |products| < 2²⁶, so overflow needs > 2³⁷
  * max-magnitude rows in one accumulator — orders beyond any shipped or
  * audited SF; a corpus near that bound escalates to the decimal
  * expression form.
  */
class GramAgg(dim: Int, scale: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  private val nCells = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](nCells)

  override def reduce(buf: Array[Long], emb: Seq[Float]): Array[Long] = {
    val d = math.min(dim, emb.length)
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      // floor(cast(x as double) * scale) — [[Tables]]-style exact twin of
      // the SQL quantizer (float→double widening is exact)
      q(i) = math.floor(emb(i).toDouble * scale).toLong
      i += 1
    }
    i = 0
    while (i < d) {
      var j = i
      var k = i * dim - i * (i - 1) / 2 // flattened (i, i) cell
      while (j < d) {
        buf(k) += q(i) * q(j)
        j += 1
        k += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < nCells) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
