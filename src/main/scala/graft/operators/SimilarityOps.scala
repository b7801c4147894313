package graft.operators

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search family (north-star extension, BASELINE.json):
  * approximate-nearest-neighbor over the `embeddings.embedding`
  * `array<float>` column.
  *
  *  - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *    set against every vector — one narrow pass over the corpus, cosine via
  *    the codegen'd [[graft.functions.FloatVecDot]] expression, top-k per
  *    query via a bounded window. At 100 TB the vector side stays
  *    partitioned; only queries move.
  *  - [[ivfTopK]] is the scale path: IVF-style partition pruning — assign
  *    each query to its `nprobe` nearest partition centroids and scan only
  *    those partitions. Recall is approximate by construction; the pruning
  *    factor equals the partition count / nprobe.
  *
  * Cosines are rounded to 6 dp before ranking (cross-engine float-sum
  * stability) with vec_id tie-breaks, so results are fully deterministic.
  */
object SimilarityOps {

  val TopK = 5
  val NProbe = 2

  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)

  /** Query subset: every 100th vector. */
  private def queryVecs(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))

  private def cosine(spark: SparkSession, a: String, b: String): Column = {
    val dot = VectorExpressions.vecDot(spark, a, b)
    val na = sqrt(VectorExpressions.vecDot(spark, a, a))
    val nb = sqrt(VectorExpressions.vecDot(spark, b, b))
    round(dot / (na * nb), 6)
  }

  /** Exact brute-force cosine top-k per query (self excluded). */
  def bruteForceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = vecs(spark, sfDir)
      .crossJoin(broadcast(queryVecs(spark, sfDir)))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(spark, "q", "embedding").as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
  }

  /** Per-label centroids (the "trained" IVF partition list): component-wise
    * mean over doubles, rounded to 5 dp so both engines derive identical
    * centroids. Tiny result (labels × dims) — memoized + cached once per
    * (session, sfDir), so the full-corpus posexplode it takes to train runs
    * exactly once no matter how many probe queries reuse it (r1 recomputed
    * this subtree inside every IVF plan — the bench's worst query).
    */
  def centroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.derived(spark, sfDir, "ivf_centroids") {
      vecs(spark, sfDir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i"))
        .agg(round(avg(col("x").cast("double")), 5).as("c"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          s => s.getField("c").cast("float")).as("centroid"))
    }

  /** IVF-style ANN: probe the NProbe nearest centroids' partitions only.
    *
    * Plan shape at scale: `centroids` is cached (trained once), the probe
    * assignment is a tiny crossJoin against the cached centroid list, and
    * the corpus⋈probes join is a **broadcast** hash join — the corpus side
    * never shuffles, so the low cardinality of `label` cannot skew an
    * exchange (there is none); each corpus partition streams once and emits
    * rows only for the probes that target its labels. At a real 100-TB
    * deployment the corpus would additionally be written partitioned by
    * list id, turning the same probe set into partition pruning at the scan.
    */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val cent = centroids(spark, sfDir)
    val q = queryVecs(spark, sfDir)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("q"), col("label"),
        cosine(spark, "q", "centroid").as("c_cos"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .where(col("probe_rank") <= NProbe)
      .select(col("query_id"), col("q"), col("label"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    vecs(spark, sfDir)
      .join(broadcast(probes), Seq("label"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(spark, "q", "embedding").as("cosine"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= TopK)
  }
}
