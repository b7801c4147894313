package graft.operators

import graft.{Oracle, QueryPack}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[SimilarityOps]] + [[MediaOps]]
  * (north-star extensions: similarity search + multimodal columns).
  */
object SimMediaPack extends QueryPack {
  import Oracle.h24

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_bruteforce_topk" -> ((s, d) => SimilarityOps.bruteForceTopK(s, d)),
    "sim_ivf_centroids" -> ((s, d) => SimilarityOps.centroids(s, d)
      .selectExpr("label", "round(aggregate(centroid, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)), 4) AS centroid_sum")),
    "sim_ivf_topk" -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    "sim_kmeans_centroids" -> ((s, d) => SimilarityOps.kmeansSummary(s, d)),
    "sim_ivf_stats" -> ((s, d) => SimilarityOps.ivfStats(s, d)),
    "sim_kmeans_topk" -> ((s, d) => SimilarityOps.kmeansTopK(s, d)),
    // identical result set to sim_kmeans_topk, computed from the
    // k-partitioned stored layout with plan-time partition pruning
    "sim_kmeans_pruned_topk" -> ((s, d) => SimilarityOps.kmeansPrunedTopK(s, d)),
    "sim_quantized_topk" -> ((s, d) => SimilarityOps.quantizedTopK(s, d)),
    "sim_pq_codes" -> ((s, d) => SimilarityOps.pqCodesFlat(s, d)),
    "sim_pq_topk" -> ((s, d) => SimilarityOps.pqTopK(s, d)),
    "sim_recall_report" -> ((s, d) => SimilarityOps.recallReport(s, d)),
    "sim_matryoshka_recall" -> ((s, d) => SimilarityOps.matryoshkaRecall(s, d)),
    "sim_hard_negatives" -> ((s, d) => SimilarityOps.hardNegatives(s, d)),
    "sim_gram_matrix" -> ((s, d) => SimilarityOps.gramMatrix(s, d)),
    "sim_embedding_audit" -> ((s, d) => SimilarityOps.embeddingAudit(s, d)),
    "sim_gram_udaf" -> ((s, d) => SimilarityOps.gramMatrixUdaf(s, d)),
    "sim_hybrid_rrf" -> ((s, d) => SimilarityOps.hybridRrf(s, d)),
    "dd_semdedup" -> ((s, d) => SimilarityOps.semanticDedup(s, d)),
    "sim_pca_power" -> ((s, d) => SimilarityOps.pcaPowerProjection(s, d)),
    "md_metadata" -> ((s, d) => MediaOps.metadata(s, d)),
    "md_decode_features" -> ((s, d) => MediaOps.decodeFeatures(s, d)),
    "md_ppm_decode" -> ((s, d) => MediaOps.ppmDecode(s, d)),
    "md_wav_decode" -> ((s, d) => MediaOps.wavDecode(s, d)),
    "md_png_decode" -> ((s, d) => MediaOps.pngDecode(s, d)),
    "md_qoi_decode" -> ((s, d) => MediaOps.qoiDecode(s, d)),
    "md_flac_decode" -> ((s, d) => MediaOps.flacDecode(s, d)),
    "md_gzip_decode" -> ((s, d) => MediaOps.gzipDecode(s, d)),
    "md_gzip_concat" -> ((s, d) => MediaOps.gzipConcatDecode(s, d)),
    "md_frames" -> ((s, d) => MediaOps.frames(s, d)),
    "sim_nprobe_curve" -> ((s, d) => SimilarityOps.nprobeCurve(s, d)),
    "md_ahash" -> ((s, d) => MediaOps.ahashTable(s, d)),
    "md_ahash_neardups" -> ((s, d) => MediaOps.ahashNearDups(s, d)),
  )

  /** aHash rebuilt from the PPM generation rule — shared by `md_ahash`
    * and the near-dup pair join.
    */
  private lazy val ahashSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, md5(text) AS hx, 1 + (${h24("text")} % 8) AS hgt
       |  FROM documents
       |), px AS (
       |  -- fixed 64 samples, pixel index tiled cyclically (size-invariant
       |  -- aHash — the 8x8-downsample contract)
       |  SELECT doc_id, unnest(range(0, 64)) AS p, 8 * hgt AS npx, hx
       |  FROM base
       |), lum AS (
       |  SELECT doc_id, p,
       |    ascii(substr(repeat(hx, 6), CAST(3 * (p % npx) + 1 AS INT), 1)) +
       |    ascii(substr(repeat(hx, 6), CAST(3 * (p % npx) + 2 AS INT), 1)) +
       |    ascii(substr(repeat(hx, 6), CAST(3 * (p % npx) + 3 AS INT), 1)) AS l
       |  FROM px
       |), tot AS (
       |  SELECT doc_id, CAST(sum(l) AS BIGINT) AS tot, count(*) AS cnt
       |  FROM lum GROUP BY doc_id
       |)
       |, raw AS (
       |  -- bit 63 would overflow a signed BIGINT shift, so the bits
       |  -- accumulate in HUGEINT and fold to two's-complement after
       |  SELECT l.doc_id,
       |    coalesce(sum(CASE WHEN l.l * t.cnt > t.tot
       |      THEN CAST(1 AS HUGEINT) << CAST(l.p AS INT)
       |      ELSE CAST(0 AS HUGEINT) END), 0) AS s
       |  FROM lum l JOIN tot t ON t.doc_id = l.doc_id
       |  GROUP BY l.doc_id
       |)
       |SELECT doc_id,
       |  CAST(CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT)
       |    THEN s - CAST(18446744073709551616 AS HUGEINT) ELSE s END
       |    AS BIGINT) AS ahash
       |FROM raw""".stripMargin

  private val vecCtes = Seq(
    s"""qv AS (SELECT vec_id AS query_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
      |       FROM embeddings
      |       WHERE vec_id % 100 = 0 AND vec_id < ${SimilarityOps.QueryPanelCap})""".stripMargin,
    """vv AS (SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |       FROM embeddings)""".stripMargin)

  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** Twin of [[SimilarityOps]]' `anchoredMean5`: the decimal-anchored
    * centroid mean-update — exact integer sum of `floor(x·10⁷)`, one
    * per-cell division, 5-dp emission. DuckDB's `sum(BIGINT)` rides
    * HUGEINT, so the sum is exact at any cluster size, matching the Spark
    * kernel's decimal(28,0) accumulator.
    */
  private def anchoredMeanSql(x: String): String =
    s"round(sum(CAST(floor($x * ${SimilarityOps.CentroidQuant}) AS BIGINT)) / " +
      s"(count(*) * ${SimilarityOps.CentroidQuant}.0), 5)"

  /** Fixed-point per-component quantization CTE shared by the gram-matrix
    * and PCA oracles — twin of [[SimilarityOps.gramMatrix]]'s `q(...)`.
    */
  private val gramQCte: String =
    s"""q AS (
       |  SELECT vec_id, s - 1 AS idx,
       |    CAST(floor(CAST(embedding[s] AS DOUBLE) * ${SimilarityOps.GramScale})
       |         AS BIGINT) AS qv
       |  FROM (SELECT vec_id, embedding,
       |          unnest(generate_series(1, len(embedding))) AS s
       |        FROM embeddings))""".stripMargin

  private val centroidCtes = Seq(
    s"""cent0 AS (
      |  SELECT label, list(CAST(c AS FLOAT) ORDER BY i) AS centroid FROM (
      |    SELECT label, i, ${anchoredMeanSql("x")} AS c FROM (
      |      SELECT label,
      |        unnest(list_transform(embedding, y -> CAST(y AS DOUBLE))) AS x,
      |        generate_subscripts(embedding, 1) AS i
      |      FROM embeddings)
      |    GROUP BY label, i)
      |  GROUP BY label
      |)""".stripMargin,
    "cent AS (SELECT label, list_transform(centroid, x -> CAST(x AS DOUBLE)) AS ce FROM cent0)")

  /** Lloyd-iteration CTE pair: assign every vector of `vv` to its nearest
    * centroid from `prevCte` (cd = double list), then emit the mean-update
    * centroid as `m$i` (float list, 5 dp — [[SimilarityOps.meanCentroids]])
    * and its double-cast twin `m${i}d`. Distance expansion + rounding mirror
    * [[SimilarityOps.assignTo]] exactly.
    */
  private def lloydCtes(i: Int, prevCte: String): Seq[String] = Seq(
    s"""a$i AS (
       |  SELECT vec_id, e, k FROM (
       |    SELECT vec_id, e, k,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
       |    FROM (
       |      SELECT v.vec_id, v.e, c.k,
       |        round(list_dot_product(v.e, v.e) + list_dot_product(c.cd, c.cd)
       |              - 2 * list_dot_product(v.e, c.cd), 6) AS d2
       |      FROM vv v CROSS JOIN $prevCte c))
       |  WHERE rn = 1
       |)""".stripMargin,
    s"""m$i AS (
       |  SELECT k, list(CAST(cx AS FLOAT) ORDER BY i) AS centroid FROM (
       |    SELECT k, i, ${anchoredMeanSql("x")} AS cx FROM (
       |      SELECT k, unnest(e) AS x, generate_subscripts(e, 1) AS i FROM a$i)
       |    GROUP BY k, i)
       |  GROUP BY k
       |)""".stripMargin,
    s"""m${i}d AS (SELECT k, list_transform(centroid, x -> CAST(x AS DOUBLE)) AS cd
       |       FROM m$i)""".stripMargin)

  /** Full k-means derivation: seeded init `c0d`, [[SimilarityOps.KmeansIters]]
    * unrolled Lloyd iterations, and the final inverted-list assignment
    * `kassign` against the trained centroids (twin of
    * [[SimilarityOps.kmeansAssignments]]).
    */
  private val kmeansCtes: Seq[String] = {
    val n = SimilarityOps.KmeansIters
    val init = Seq(
      s"""c0d AS (
         |  SELECT vec_id % (SELECT greatest(${SimilarityOps.KmeansK},
         |      CAST(ceil(count(*) / ${SimilarityOps.KmeansTargetClusterSize}.0) AS BIGINT))
         |    FROM vv) AS k,
         |         arg_min(e, md5(CAST(vec_id AS VARCHAR))) AS cd
         |  FROM vv GROUP BY 1
         |)""".stripMargin)
    val iters = (1 to n).flatMap(i => lloydCtes(i, if (i == 1) "c0d" else s"m${i - 1}d"))
    val assign = Seq(
      s"""kassign AS (
         |  SELECT vec_id, k FROM (
         |    SELECT vec_id, k,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
         |    FROM (
         |      SELECT v.vec_id, c.k,
         |        round(list_dot_product(v.e, v.e) + list_dot_product(c.cd, c.cd)
         |              - 2 * list_dot_product(v.e, c.cd), 6) AS d2
         |      FROM vv v CROSS JOIN m${n}d c))
         |  WHERE rn = 1
         |)""".stripMargin)
    init ++ iters ++ assign
  }

  /** Twin of [[SimilarityOps.kmeansTopK]] — and, unchanged, of
    * [[SimilarityOps.kmeansPrunedTopK]]: the k-partitioned layout changes
    * the physical scan (partition pruning), never the result set.
    */
  private lazy val kmeansTopKSql: String =
    Oracle.withCtes(vecCtes ++ kmeansCtes ++ Seq(
      s"""kprobe_scored AS (
         |  SELECT query_id, q, k, ${cosSql("q", "cd")} AS c_cos
         |  FROM qv CROSS JOIN m${SimilarityOps.KmeansIters}d
         |)""".stripMargin,
      s"""kprobes AS (
         |  SELECT query_id, q, k FROM (
         |    SELECT query_id, q, k,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY c_cos DESC, k) AS pr
         |    FROM kprobe_scored)
         |  WHERE pr <= ${SimilarityOps.NProbe}
         |)""".stripMargin,
      s"""kscored AS (
         |  SELECT p.query_id, v.vec_id, p.k, ${cosSql("p.q", "v.e")} AS cosine
         |  FROM kprobes p JOIN kassign a USING (k)
         |  JOIN vv v ON v.vec_id = a.vec_id
         |  WHERE v.vec_id <> p.query_id
         |)""".stripMargin): _*)(
      s"""SELECT query_id, vec_id, k, cosine, rank FROM (
         |  SELECT query_id, vec_id, k, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, vec_id) AS rank
         |  FROM kscored)
         |WHERE rank <= ${SimilarityOps.TopK}""".stripMargin)

  // ------------------------------------------------------------------- PQ

  /** Per-subspace Lloyd + code-assignment CTEs — twin of
    * [[SimilarityOps.pqCodebooks]]/[[SimilarityOps.pqCodes]] restricted to
    * subspace `m` (vectors sliced to dims [m·16+1, (m+1)·16]); identical
    * unrolled-iteration pattern to [[lloydCtes]].
    */
  private def pqSubCtes(m: Int): Seq[String] = {
    val lo = m * SimilarityOps.PqSubDim + 1
    val hi = (m + 1) * SimilarityOps.PqSubDim
    val n = SimilarityOps.PqIters
    val init = Seq(
      s"psub$m AS (SELECT vec_id, list_slice(e, $lo, $hi) AS e FROM vv)",
      s"""pc${m}_0d AS (
         |  SELECT vec_id % ${SimilarityOps.PqKs} AS k,
         |         arg_min(e, md5(CAST(vec_id AS VARCHAR))) AS cd
         |  FROM psub$m GROUP BY 1
         |)""".stripMargin)
    val iters = (1 to n).flatMap { i =>
      val prev = if (i == 1) s"pc${m}_0d" else s"pm${m}_${i - 1}d"
      Seq(
        s"""pa${m}_$i AS (
           |  SELECT vec_id, e, k FROM (
           |    SELECT vec_id, e, k,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
           |    FROM (
           |      SELECT v.vec_id, v.e, c.k,
           |        round(list_dot_product(v.e, v.e) + list_dot_product(c.cd, c.cd)
           |              - 2 * list_dot_product(v.e, c.cd), 6) AS d2
           |      FROM psub$m v CROSS JOIN $prev c))
           |  WHERE rn = 1
           |)""".stripMargin,
        s"""pm${m}_$i AS (
           |  SELECT k, list(CAST(cx AS FLOAT) ORDER BY i) AS centroid FROM (
           |    SELECT k, i, ${anchoredMeanSql("x")} AS cx FROM (
           |      SELECT k, unnest(e) AS x, generate_subscripts(e, 1) AS i FROM pa${m}_$i)
           |    GROUP BY k, i)
           |  GROUP BY k
           |)""".stripMargin,
        s"""pm${m}_${i}d AS (SELECT k, list_transform(centroid, x -> CAST(x AS DOUBLE)) AS cd
           |       FROM pm${m}_$i)""".stripMargin)
    }
    val assign = Seq(
      s"""pcode$m AS (
         |  SELECT vec_id, $m AS m, k AS code, cc FROM (
         |    SELECT vec_id, k, cc,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
         |    FROM (
         |      SELECT v.vec_id, c.k, list_dot_product(c.cd, c.cd) AS cc,
         |        round(list_dot_product(v.e, v.e) + list_dot_product(c.cd, c.cd)
         |              - 2 * list_dot_product(v.e, c.cd), 6) AS d2
         |      FROM psub$m v CROSS JOIN pm${m}_${n}d c))
         |  WHERE rn = 1
         |)""".stripMargin)
    init ++ iters ++ assign
  }

  /** Assembled PQ derivation: all subspaces' training + the encoded corpus
    * (`pqcodes`) and the trained codebook union (`pcb`).
    */
  private val pqCtes: Seq[String] = {
    val subs = (0 until SimilarityOps.PqM).flatMap(pqSubCtes)
    val codeUnion = (0 until SimilarityOps.PqM)
      .map(m => s"SELECT * FROM pcode$m").mkString(" UNION ALL ")
    val cbUnion = (0 until SimilarityOps.PqM)
      .map(m => s"SELECT $m AS m, k AS code, cd FROM pm${m}_${SimilarityOps.PqIters}d")
      .mkString(" UNION ALL ")
    subs ++ Seq(
      s"""pqcodes AS (
         |  SELECT vec_id, list(code ORDER BY m) AS codes,
         |    round(sqrt(sum(cc)), 6) AS rn
         |  FROM ($codeUnion) GROUP BY vec_id
         |)""".stripMargin,
      s"pcb AS ($cbUnion)")
  }

  /** Quantization CTEs — twins of [[SimilarityOps.quantScales]] /
    * `quantizeExpr`: per-dim max-abs scales, int8 values via
    * floor(v/s·127 + 0.5), hoisted quantized norms.
    */
  private val quantCtes = Seq(
    """qscales AS (
      |  SELECT list(m ORDER BY i) AS s FROM (
      |    SELECT i, greatest(max(abs(x)), 0.000000000001) AS m FROM (
      |      SELECT unnest(e) AS x, generate_subscripts(e, 1) AS i FROM vv)
      |    GROUP BY i)
      |)""".stripMargin,
    s"""qvn AS (
       |  SELECT vec_id, qd, sqrt(list_dot_product(qd, qd)) AS qn FROM (
       |    SELECT v.vec_id,
       |      list_transform(range(1, ${DedupOps.EmbDim + 1}),
       |                     j -> floor(v.e[j] / sc.s[j] * 127 + 0.5)) AS qd
       |    FROM vv v CROSS JOIN qscales sc)
       |)""".stripMargin,
    """qq AS (
      |  SELECT q.query_id, n.qd AS qqd, n.qn AS qqn
      |  FROM qv q JOIN qvn n ON n.vec_id = q.query_id
      |)""".stripMargin)

  private val qScoredCte =
    """qscored AS (
      |  SELECT qq.query_id, v.vec_id,
      |    round(list_dot_product(qq.qqd, v.qd) / (qq.qqn * v.qn), 6) AS cosine
      |  FROM qq CROSS JOIN qvn v WHERE v.vec_id <> qq.query_id
      |)""".stripMargin

  private val bfScoredCte =
    s"""scored AS (
       |  SELECT query_id, vec_id, ${cosSql("q", "e")} AS cosine
       |  FROM qv CROSS JOIN vv WHERE vec_id <> query_id
       |)""".stripMargin

  private val pqScoredCtes = Seq(
    s"""plut AS (
       |  SELECT q.query_id, sqrt(list_dot_product(q.q, q.q)) AS qn, cb.m, cb.code,
       |    list_dot_product(
       |      list_slice(q.q, cb.m * ${SimilarityOps.PqSubDim} + 1,
       |                 (cb.m + 1) * ${SimilarityOps.PqSubDim}), cb.cd) AS dp
       |  FROM qv q CROSS JOIN pcb cb
       |)""".stripMargin,
    s"""pscored AS (
       |  SELECT l.query_id, c.vec_id, max(l.qn) AS qn, max(c.rn) AS rn,
       |    sum(l.dp) AS num
       |  FROM pqcodes c JOIN plut l ON l.code = c.codes[l.m + 1]
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id
       |)""".stripMargin)

  val oracles: Map[String, String] = Map(
    // same fixed-point floor quantization; HUGEINT sums cast to BIGINT
    "sim_gram_matrix" ->
      s"""WITH $gramQCte
         |SELECT a.idx AS i, b.idx AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
         |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.idx <= b.idx
         |GROUP BY a.idx, b.idx""".stripMargin,
    // grounded in the GramScale raw quantization (the one proven-identical
    // float->int step): norm = sqrt of an exact BIGINT, unit components
    // divide identical doubles, isotropy via ||sum u||^2 - sum ||u||^2
    // over AuditScale fixed-point units -- exact integers to the final
    // divisions, hash-exact
    "sim_embedding_audit" ->
      s"""WITH qraw AS (
         |  SELECT label, vec_id, s - 1 AS d,
         |    CAST(floor(CAST(embedding[s] AS DOUBLE) *
         |      ${SimilarityOps.GramScale}) AS BIGINT) AS qr
         |  FROM (SELECT label, vec_id, embedding,
         |          unnest(generate_series(1, len(embedding))) AS s
         |        FROM embeddings)),
         |b AS (
         |  SELECT label, vec_id, CAST(sum(qr * qr) AS BIGINT) AS s2
         |  FROM qraw GROUP BY 1, 2),
         |qv AS (
         |  SELECT q.label, q.vec_id, q.d,
         |    CAST(floor(CAST(q.qr AS DOUBLE) / sqrt(CAST(b.s2 AS DOUBLE)) *
         |      ${SimilarityOps.AuditScale}) AS BIGINT) AS q
         |  FROM qraw q JOIN b USING (vec_id)),
         |ps AS (SELECT label, d, CAST(sum(q) AS BIGINT) AS sq
         |       FROM qv GROUP BY 1, 2),
         |aa AS (SELECT label, sum(CAST(sq AS HUGEINT) * sq) AS a
         |       FROM ps GROUP BY 1),
         |bb AS (SELECT label, sum(CAST(q AS HUGEINT) * q) AS bsum
         |       FROM qv GROUP BY 1),
         |nr AS (
         |  SELECT label,
         |    round(sqrt(CAST(s2 AS DOUBLE)) / ${SimilarityOps.GramScale}.0, 6)
         |      AS r_norm
         |  FROM b),
         |st AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |    min(r_norm) AS min_norm, max(r_norm) AS max_norm,
         |    CAST(sum(CAST(r_norm AS DECIMAL(18,6))) AS DOUBLE) /
         |      CAST(count(*) AS DOUBLE) AS mean_norm
         |  FROM nr GROUP BY 1)
         |SELECT st.label, n_vecs, min_norm, max_norm, mean_norm,
         |  CAST(a - bsum AS DOUBLE) / CAST(n_vecs * (n_vecs - 1) AS DOUBLE)
         |    / ${SimilarityOps.AuditScale * SimilarityOps.AuditScale}.0
         |    AS mean_pair_cos
         |FROM st JOIN aa USING (label) JOIN bb USING (label)""".stripMargin,
    // the GramAgg UDAF fold must produce the bit-identical cell table
    "sim_gram_udaf" ->
      s"""WITH $gramQCte
         |SELECT a.idx AS i, b.idx AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
         |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.idx <= b.idx
         |GROUP BY a.idx, b.idx""".stripMargin,
    // power-iteration replay: exact-integer gram cells, then 3 unrolled
    // anchored matvec+normalize rounds (twin of the PcVecScale integer
    // kernel — every aggregate exact, every float op a per-cell scalar on
    // integer-valued operands), ordered-list projection
    "sim_pca_power" -> {
      val vs = SimilarityOps.PcVecScale
      val us = SimilarityOps.PcUnitScale
      val iters = (1 to SimilarityOps.PcIters).map { r =>
        val prev = if (r == 1) "pv0" else s"pv${r - 1}"
        s"""pu$r AS (
           |  SELECT f.i,
           |    sum(CAST(f.gram AS DECIMAL(29,0)) * CAST(v.vi AS DECIMAL(8,0))) AS u
           |  FROM full_g f JOIN $prev v ON f.j = v.i GROUP BY f.i),
           |pw$r AS (
           |  SELECT i, CAST(round(CAST(u AS DOUBLE) /
           |      (SELECT CAST(max(abs(u)) AS DOUBLE) FROM pu$r) * $us, 0)
           |    AS BIGINT) AS wi
           |  FROM pu$r),
           |pv$r AS (
           |  SELECT i, CAST(round(CAST(wi AS DOUBLE) /
           |      (SELECT sqrt(CAST(sum(CAST(wi AS HUGEINT) * wi) AS DOUBLE))
           |       FROM pw$r) * $vs, 0)
           |    AS BIGINT) AS vi
           |  FROM pw$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH $gramQCte,
         |g AS (
         |  SELECT a.idx AS i, b.idx AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
         |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.idx <= b.idx
         |  GROUP BY a.idx, b.idx),
         |full_g AS (
         |  SELECT i, j, gram FROM g
         |  UNION ALL SELECT j AS i, i AS j, gram FROM g WHERE i <> j),
         |pv0 AS (SELECT CAST(i AS BIGINT) AS i,
         |          CAST(${vs / 8} AS BIGINT) AS vi FROM range(64) t(i)),
         |$iters,
         |pc AS (SELECT list(CAST(vi AS DOUBLE) / $vs ORDER BY i) AS pc
         |       FROM pv${SimilarityOps.PcIters})
         |SELECT vec_id,
         |  round(list_dot_product(
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)), pc), 6) AS pc1
         |FROM embeddings, pc""".stripMargin
    },
    // both legs replayed end-to-end: the tf-idf pool/rank mirrors the
    // tx_ranked_search oracle, the cosine pool mirrors the brute-force
    // oracle for one query vector; fusion adds two exactly-rounded
    // reciprocal terms (commutative 2-term sum — bit-stable cross-engine)
    "sim_hybrid_rrf" -> {
      val termList = TextOps.SearchTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH post AS (
         |  SELECT doc_id, word, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word IN ($termList)
         |  GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM post GROUP BY word),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |lexscored AS (
         |  SELECT doc_id,
         |    sum(CAST(round(tf * (CAST(n_docs AS DOUBLE) / df)
         |                   * ${TextOps.LogScale}.0, 0) AS BIGINT)) AS score_q
         |  FROM post JOIN dfreq USING (word), n
         |  GROUP BY doc_id),
         |lexpool AS (
         |  SELECT doc_id,
         |    round(CAST(score_q AS DOUBLE) / ${TextOps.LogScale}.0, 6) AS score
         |  FROM lexscored
         |  ORDER BY score_q DESC, doc_id LIMIT ${SimilarityOps.HybridPoolK}),
         |lexrank AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
         |  FROM lexpool),
         |hq AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
         |       FROM embeddings WHERE vec_id = ${SimilarityOps.HybridQueryDoc}),
         |vpool AS (
         |  SELECT vec_id AS doc_id, ${cosSql("q", "e")} AS cosine
         |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |        FROM embeddings
         |        WHERE vec_id <> ${SimilarityOps.HybridQueryDoc}) CROSS JOIN hq
         |  ORDER BY cosine DESC, doc_id LIMIT ${SimilarityOps.HybridPoolK}),
         |vrank AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_vec
         |  FROM vpool),
         |fused AS (
         |  SELECT doc_id, rank_lex, rank_vec,
         |    COALESCE(CAST(1.0 AS DOUBLE) / (${SimilarityOps.RrfK} + rank_lex), 0) +
         |    COALESCE(CAST(1.0 AS DOUBLE) / (${SimilarityOps.RrfK} + rank_vec), 0) AS rrf
         |  FROM lexrank FULL OUTER JOIN vrank USING (doc_id))
         |SELECT doc_id, rank_lex, rank_vec, round(rrf, 6) AS rrf_score
         |FROM fused ORDER BY rrf DESC, doc_id LIMIT ${TextOps.SearchTopK}""".stripMargin
    },
    "sim_quantized_topk" ->
      Oracle.withCtes(vecCtes ++ quantCtes :+ qScoredCte: _*)(
        s"""SELECT query_id, vec_id, cosine, rank FROM (
           |  SELECT query_id, vec_id, cosine,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cosine DESC, vec_id) AS rank
           |  FROM qscored)
           |WHERE rank <= ${SimilarityOps.TopK}""".stripMargin),
    "sim_bruteforce_topk" ->
      Oracle.withCtes(vecCtes :+ bfScoredCte: _*)(
        s"""SELECT query_id, vec_id, cosine, rank FROM (
           |  SELECT query_id, vec_id, cosine,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cosine DESC, vec_id) AS rank
           |  FROM scored)
           |WHERE rank <= ${SimilarityOps.TopK}""".stripMargin),
    // hard-negative mining: the brute-force scorer restricted to vectors
    // whose label differs from the query's (the query's positive class)
    "sim_hard_negatives" ->
      Oracle.withCtes(vecCtes :+
        s"""hn_scored AS (
           |  SELECT query_id, vec_id, vv.label, ${cosSql("q", "e")} AS cosine
           |  FROM (SELECT qv.query_id, qv.q, vq.label AS q_label
           |        FROM qv JOIN vv vq ON vq.vec_id = qv.query_id) qq
           |  CROSS JOIN vv WHERE vv.label <> qq.q_label
           |)""".stripMargin: _*)(
        s"""SELECT query_id, vec_id, label, cosine, rank FROM (
           |  SELECT query_id, vec_id, label, cosine,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cosine DESC, vec_id) AS rank
           |  FROM hn_scored)
           |WHERE rank <= ${SimilarityOps.HardNegK}""".stripMargin),
    "sim_ivf_centroids" ->
      Oracle.withCtes(centroidCtes: _*)(
        """SELECT label,
          |  round(list_sum(list_transform(ce, x -> x)), 4) AS centroid_sum
          |FROM cent""".stripMargin),
    "sim_ivf_topk" ->
      Oracle.withCtes(vecCtes ++ centroidCtes ++ Seq(
        s"""probe_scored AS (
           |  SELECT query_id, q, label, ${cosSql("q", "ce")} AS c_cos
           |  FROM qv CROSS JOIN cent
           |)""".stripMargin,
        s"""probes AS (
           |  SELECT query_id, q, label FROM (
           |    SELECT query_id, q, label,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY c_cos DESC, label) AS pr
           |    FROM probe_scored)
           |  WHERE pr <= ${SimilarityOps.NProbe}
           |)""".stripMargin,
        s"""ivf_scored AS (
           |  SELECT p.query_id, v.vec_id, v.label, ${cosSql("p.q", "v.e")} AS cosine
           |  FROM probes p JOIN vv v USING (label)
           |  WHERE v.vec_id <> p.query_id
           |)""".stripMargin): _*)(
        s"""SELECT query_id, vec_id, label, cosine, rank FROM (
           |  SELECT query_id, vec_id, label, cosine,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cosine DESC, vec_id) AS rank
           |  FROM ivf_scored)
           |WHERE rank <= ${SimilarityOps.TopK}""".stripMargin),
    "sim_kmeans_centroids" ->
      Oracle.withCtes(vecCtes ++ kmeansCtes :+
        s"""ksizes AS (SELECT k, count(*) AS n_vecs FROM kassign GROUP BY k)""": _*)(
        s"""SELECT m.k, s.n_vecs, round(list_sum(m.cd), 4) AS centroid_sum
           |FROM m${SimilarityOps.KmeansIters}d m JOIN ksizes s USING (k)""".stripMargin),
    "sim_kmeans_topk" -> kmeansTopKSql,
    // the same trained probe/scan/hit chain instantiated once per nprobe;
    // scan cost replays from the kassign list sizes
    "sim_nprobe_curve" -> {
      val perNp = SimilarityOps.NProbeCurve.flatMap { np =>
        Seq(
          s"""kprobes_$np AS (
             |  SELECT query_id, q, k FROM (
             |    SELECT query_id, q, k,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY c_cos DESC, k) AS pr
             |    FROM kprobe_scored)
             |  WHERE pr <= $np)""".stripMargin,
          s"""kscored_$np AS (
             |  SELECT p.query_id, v.vec_id, ${cosSql("p.q", "v.e")} AS cosine
             |  FROM kprobes_$np p JOIN kassign a USING (k)
             |  JOIN vv v ON v.vec_id = a.vec_id
             |  WHERE v.vec_id <> p.query_id)""".stripMargin,
          s"""ktop_$np AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY cosine DESC, vec_id) AS rank
             |    FROM kscored_$np)
             |  WHERE rank <= ${SimilarityOps.TopK})""".stripMargin,
          s"""khits_$np AS (
             |  SELECT CAST(count(*) AS BIGINT) AS total_hits
             |  FROM ktop_$np t JOIN bftop e
             |    ON e.query_id = t.query_id AND e.vec_id = t.vec_id)""".stripMargin,
          s"""kscan_$np AS (
             |  SELECT CAST(sum(s.list_n) AS BIGINT) AS scanned_rows
             |  FROM kprobes_$np p JOIN lsz s ON s.k = p.k)""".stripMargin)
      }
      val unions = SimilarityOps.NProbeCurve.map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe, n_queries, total_hits,
           |  CAST(total_hits AS DOUBLE) / (n_queries * ${SimilarityOps.TopK})
           |    AS recall_at_k,
           |  scanned_rows,
           |  CAST(scanned_rows AS DOUBLE) / CAST(n_queries * n_vecs AS DOUBLE)
           |    AS scan_fraction
           |FROM khits_$np, kscan_$np, nq, nv""".stripMargin
      }.mkString("\nUNION ALL\n")
      Oracle.withCtes(vecCtes ++ kmeansCtes ++ Seq(
        bfScoredCte,
        s"""kprobe_scored AS (
           |  SELECT query_id, q, k, ${cosSql("q", "cd")} AS c_cos
           |  FROM qv CROSS JOIN m${SimilarityOps.KmeansIters}d
           |)""".stripMargin,
        s"""bftop AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY cosine DESC, vec_id) AS rank
           |    FROM scored)
           |  WHERE rank <= ${SimilarityOps.TopK})""".stripMargin,
        "nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qv)",
        "nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM kassign)",
        "lsz AS (SELECT k, CAST(count(*) AS BIGINT) AS list_n FROM kassign GROUP BY k)")
        ++ perNp: _*)(unions)
    },
    // the pruned-layout query is the same logical result — one oracle text
    "sim_kmeans_pruned_topk" -> kmeansTopKSql,
    // same trained kassign table; imbalance = (max * n_lists) / n_vecs in
    // the identical association order
    "sim_ivf_stats" ->
      Oracle.withCtes(vecCtes ++ kmeansCtes :+
        "ksz AS (SELECT k, count(*) AS n FROM kassign GROUP BY k)": _*)(
        """SELECT count(*) AS n_lists, CAST(sum(n) AS BIGINT) AS n_vecs,
          |  max(n) AS max_list, min(n) AS min_list,
          |  CAST(max(n) AS DOUBLE) * CAST(count(*) AS DOUBLE) /
          |    CAST(sum(n) AS DOUBLE) AS imbalance
          |FROM ksz""".stripMargin),
    // SemDeDup replay: same trained kassign/m{N}d tables, intra-cluster
    // pairs at >= SemDedupTau, centroid-nearer member of each pair pruned
    "dd_semdedup" ->
      Oracle.withCtes(vecCtes ++ kmeansCtes ++ Seq(
        s"""sd_members AS (
           |  SELECT v.vec_id, a.k, v.e, ${cosSql("v.e", "c.cd")} AS c_cos
           |  FROM vv v JOIN kassign a USING (vec_id)
           |  JOIN m${SimilarityOps.KmeansIters}d c USING (k)
           |)""".stripMargin,
        s"""sd_pruned AS (
           |  SELECT DISTINCT CASE
           |    WHEN x.c_cos > y.c_cos
           |      OR (x.c_cos = y.c_cos AND x.vec_id > y.vec_id)
           |    THEN x.vec_id ELSE y.vec_id END AS vec_id
           |  FROM sd_members x JOIN sd_members y
           |    ON x.k = y.k AND x.vec_id < y.vec_id
           |  WHERE ${cosSql("x.e", "y.e")} >= ${SimilarityOps.SemDedupTau}
           |)""".stripMargin): _*)(
        s"""SELECT m.vec_id, m.k, m.c_cos, (p.vec_id IS NULL) AS is_kept
           |FROM sd_members m LEFT JOIN sd_pruned p USING (vec_id)""".stripMargin),
    "sim_pq_codes" ->
      Oracle.withCtes(vecCtes ++ pqCtes: _*)(
        s"""SELECT vec_id,
           |  ${(0 until SimilarityOps.PqM).map(m => s"codes[${m + 1}] AS code$m").mkString(",\n  ")},
           |  rn
           |FROM pqcodes""".stripMargin),
    "sim_pq_topk" ->
      Oracle.withCtes(vecCtes ++ pqCtes ++ pqScoredCtes: _*)(
        s"""SELECT query_id, vec_id, adc_cosine, rank FROM (
           |  SELECT query_id, vec_id, round(num / (qn * rn), 6) AS adc_cosine,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY round(num / (qn * rn), 6) DESC, vec_id) AS rank
           |  FROM pscored)
           |WHERE rank <= ${SimilarityOps.TopK}""".stripMargin),
    // recall@k of the compressed variants vs the exact baseline — same CTE
    // text as the three individual oracles, composed
    "sim_recall_report" ->
      Oracle.withCtes(vecCtes ++ quantCtes ++ pqCtes ++ Seq(
        bfScoredCte, qScoredCte) ++ pqScoredCtes ++ Seq(
        s"""bftop AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY cosine DESC, vec_id) AS rank
           |    FROM scored)
           |  WHERE rank <= ${SimilarityOps.TopK}
           |)""".stripMargin,
        s"""qtop AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY cosine DESC, vec_id) AS rank
           |    FROM qscored)
           |  WHERE rank <= ${SimilarityOps.TopK}
           |)""".stripMargin,
        s"""ptop AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY round(num / (qn * rn), 6) DESC, vec_id) AS rank
           |    FROM pscored)
           |  WHERE rank <= ${SimilarityOps.TopK}
           |)""".stripMargin,
        "nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qv)",
        """qhits AS (
          |  SELECT CAST(count(*) AS BIGINT) AS total_hits
          |  FROM qtop t JOIN bftop e
          |    ON e.query_id = t.query_id AND e.vec_id = t.vec_id
          |)""".stripMargin,
        """phits AS (
          |  SELECT CAST(count(*) AS BIGINT) AS total_hits
          |  FROM ptop t JOIN bftop e
          |    ON e.query_id = t.query_id AND e.vec_id = t.vec_id
          |)""".stripMargin): _*)(
        s"""SELECT 'quantized_int8' AS method, n_queries, total_hits,
           |  CAST(total_hits AS DOUBLE) / (n_queries * ${SimilarityOps.TopK}) AS recall_at_k
           |FROM qhits, nq
           |UNION ALL
           |SELECT 'pq_adc' AS method, n_queries, total_hits,
           |  CAST(total_hits AS DOUBLE) / (n_queries * ${SimilarityOps.TopK}) AS recall_at_k
           |FROM phits, nq""".stripMargin),
    // Matryoshka truncation recall: per prefix length m, the exact top-k
    // over the first m dims vs the full-dim baseline; list slices are
    // 1-based inclusive in DuckDB, matching Spark's slice(col, 1, m)
    "sim_matryoshka_recall" ->
      Oracle.withCtes(vecCtes ++ Seq(
        bfScoredCte,
        s"""bftop AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |                         ORDER BY cosine DESC, vec_id) AS rank
           |    FROM scored)
           |  WHERE rank <= ${SimilarityOps.TopK}
           |)""".stripMargin,
        "nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qv)") ++
        SimilarityOps.MatryoshkaDims.flatMap { m => Seq(
          s"""ms$m AS (
             |  SELECT query_id, vec_id,
             |    ${cosSql(s"q[1:$m]", s"e[1:$m]")} AS cosine
             |  FROM qv CROSS JOIN vv WHERE vec_id <> query_id
             |)""".stripMargin,
          s"""mt$m AS (
             |  SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |      row_number() OVER (PARTITION BY query_id
             |                         ORDER BY cosine DESC, vec_id) AS rank
             |    FROM ms$m)
             |  WHERE rank <= ${SimilarityOps.TopK}
             |)""".stripMargin,
          s"""mh$m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS total_hits
             |  FROM mt$m t JOIN bftop e
             |    ON e.query_id = t.query_id AND e.vec_id = t.vec_id
             |)""".stripMargin)
        }: _*)(
        SimilarityOps.MatryoshkaDims.map { m =>
          s"""SELECT CAST($m AS BIGINT) AS dims, n_queries, total_hits,
             |  CAST(total_hits AS DOUBLE) / (n_queries * ${SimilarityOps.TopK})
             |    AS recall_at_k
             |FROM mh$m, nq""".stripMargin
        }.mkString("\nUNION ALL\n")),
    "md_metadata" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  'text/plain' AS format, md5(text) AS checksum
        |FROM documents""".stripMargin,
    "md_decode_features" -> {
      def feat(b: Int) = s"${h24(s"md5(text) || ':$b'")} / 16777216.0"
      s"""SELECT doc_id, ${feat(0)} AS f0, ${feat(1)} AS f1,
         |  ${feat(2)} AS f2, ${feat(3)} AS f3
         |FROM documents""".stripMargin
    },
    // the oracle rebuilds each image's luminances by the raster-generation
    // arithmetic, thresholds by exact integer cross-multiplication
    // (lum·n > Σlum — the expression's own division-free test), and packs
    // bits with shifts; the Spark side must RECOVER the same hash through
    // the real binary decode
    "md_ahash" -> ahashSql,
    "md_ahash_neardups" ->
      s"""WITH hashes AS ($ahashSql),
         |bands AS (
         |  SELECT doc_id, ahash, b.band_no,
         |    (ahash >> (16 * b.band_no)) & 65535 AS band_key
         |  FROM hashes CROSS JOIN (SELECT unnest(range(0, 4)) AS band_no) b),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.band_no = b.band_no AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs
         |WHERE hamming <= ${MediaOps.AHashMaxHamming}""".stripMargin,
    "md_ppm_decode" -> {
      // rebuild the PPM raster bytes by column arithmetic: pixel i is the
      // ASCII code of hex char i of md5(text) repeated; channel = (i-1)%3
      def chan(c: Int, agg: String, name: String) =
        s"CAST($agg(b) FILTER (WHERE ch = $c) AS BIGINT) AS $name"
      s"""WITH base AS (
         |  SELECT doc_id, md5(text) AS hx, 1 + (${h24("text")} % 8) AS hgt
         |  FROM documents
         |), px AS (
         |  SELECT doc_id, hgt,
         |    unnest(range(1, 24 * hgt + 1)) AS i, hx
         |  FROM base
         |), pb AS (
         |  SELECT doc_id, hgt,
         |    ascii(substr(repeat(hx, 6), CAST(i AS INT), 1)) AS b,
         |    (i - 1) % 3 AS ch
         |  FROM px
         |)
         |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(hgt AS BIGINT) AS height,
         |  CAST(255 AS BIGINT) AS maxval,
         |  ${chan(0, "sum", "r_sum")}, ${chan(0, "min", "r_min")}, ${chan(0, "max", "r_max")},
         |  ${chan(1, "sum", "g_sum")}, ${chan(1, "min", "g_min")}, ${chan(1, "max", "g_max")},
         |  ${chan(2, "sum", "b_sum")}, ${chan(2, "min", "b_min")}, ${chan(2, "max", "b_max")}
         |FROM pb GROUP BY doc_id, hgt""".stripMargin
    },
    "md_png_decode" -> {
      // the oracle never sees the compressed payload: it rebuilds the RAW
      // raster bytes by the same column arithmetic as md_ppm_decode (pixel
      // i = ASCII code of hex char i of md5(text) repeated) and aggregates.
      // The Spark side must RECOVER those bytes through CRC verification,
      // zlib inflate, and 5-filter unfiltering — any shortcut mismatches.
      def chan(c: Int, agg: String, name: String) =
        s"CAST($agg(b) FILTER (WHERE ch = $c) AS BIGINT) AS $name"
      s"""WITH base AS (
         |  SELECT doc_id, md5(text) AS hx, 1 + (${h24("text")} % 8) AS hgt
         |  FROM documents
         |), px AS (
         |  SELECT doc_id, hgt,
         |    unnest(range(1, 24 * hgt + 1)) AS i, hx
         |  FROM base
         |), pb AS (
         |  SELECT doc_id, hgt,
         |    ascii(substr(repeat(hx, 6), CAST(i AS INT), 1)) AS b,
         |    (i - 1) % 3 AS ch
         |  FROM px
         |)
         |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(hgt AS BIGINT) AS height,
         |  CAST(8 AS BIGINT) AS bit_depth, CAST(2 AS BIGINT) AS color_type,
         |  ${chan(0, "sum", "r_sum")}, ${chan(0, "min", "r_min")}, ${chan(0, "max", "r_max")},
         |  ${chan(1, "sum", "g_sum")}, ${chan(1, "min", "g_min")}, ${chan(1, "max", "g_max")},
         |  ${chan(2, "sum", "b_sum")}, ${chan(2, "min", "b_min")}, ${chan(2, "max", "b_max")}
         |FROM pb GROUP BY doc_id, hgt""".stripMargin
    },
    "md_qoi_decode" -> {
      // same raster-rebuild discipline as md_png_decode: the oracle never
      // sees the QOI op stream — it recomputes the 8×hgt raster by column
      // arithmetic (independent 1..13 height ladder) and aggregates; the
      // Spark side must RECOVER the bytes through the index/diff/luma/run
      // state machine, so any shortcut in the decoder hash-mismatches.
      def chan(c: Int, agg: String, name: String) =
        s"CAST($agg(b) FILTER (WHERE ch = $c) AS BIGINT) AS $name"
      s"""WITH base AS (
         |  SELECT doc_id, md5(text) AS hx, 1 + (${h24("text")} % 13) AS hgt
         |  FROM documents
         |), px AS (
         |  SELECT doc_id, hgt,
         |    unnest(range(1, 24 * hgt + 1)) AS i, hx
         |  FROM base
         |), pb AS (
         |  SELECT doc_id, hgt,
         |    ascii(substr(repeat(hx, 10), CAST(i AS INT), 1)) AS b,
         |    (i - 1) % 3 AS ch
         |  FROM px
         |)
         |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(hgt AS BIGINT) AS height,
         |  CAST(3 AS BIGINT) AS channels, CAST(0 AS BIGINT) AS colorspace,
         |  ${chan(0, "sum", "r_sum")}, ${chan(0, "min", "r_min")}, ${chan(0, "max", "r_max")},
         |  ${chan(1, "sum", "g_sum")}, ${chan(1, "min", "g_min")}, ${chan(1, "max", "g_max")},
         |  ${chan(2, "sum", "b_sum")}, ${chan(2, "min", "b_min")}, ${chan(2, "max", "b_max")}
         |FROM pb GROUP BY doc_id, hgt""".stripMargin
    },
    "md_wav_decode" -> {
      // rebuild the PCM data bytes by column arithmetic: sample i is the
      // ASCII code of hex char i of md5(text) repeated; header fields are
      // the render constants (8 kHz mono 8-bit) — the BINARY header is what
      // the Spark side genuinely parses, the SAMPLES are what both compute
      s"""WITH base AS (
         |  SELECT doc_id, md5(text) AS hx,
         |    16 * (1 + (${h24("text")} % 16)) AS n
         |  FROM documents
         |), px AS (
         |  SELECT doc_id, n, unnest(range(1, n + 1)) AS i, hx FROM base
         |), sb AS (
         |  SELECT doc_id, n,
         |    ascii(substr(repeat(hx, 8), CAST(i AS INT), 1)) AS b
         |  FROM px
         |)
         |SELECT doc_id, CAST(${MediaOps.WavRate} AS BIGINT) AS sample_rate,
         |  CAST(1 AS BIGINT) AS channels, CAST(8 AS BIGINT) AS bits,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(sum(b) AS BIGINT) AS s_sum, CAST(min(b) AS BIGINT) AS s_min,
         |  CAST(max(b) AS BIGINT) AS s_max, CAST(sum(b * b) AS BIGINT) AS sq_sum
         |FROM sb GROUP BY doc_id, n""".stripMargin
    },
    "md_flac_decode" -> {
      // FLAC is LOSSLESS, so the oracle rebuilds the exact PCM from the
      // generation rule — sample i = (ascii(char i of repeat(md5,16)) − 80)
      // · 257 over 64·(1+h24%8) samples — and never sees the compressed
      // bytes: a decoder that shortcuts the Rice/fixed-predictor pipeline
      // hash-mismatches. Frame count replays the blocksize-256 split.
      s"""WITH base AS (
         |  SELECT doc_id, md5(text) AS hx,
         |    64 * (1 + (${h24("text")} % 8)) AS n
         |  FROM documents
         |), px AS (
         |  SELECT doc_id, n, unnest(range(1, n + 1)) AS i, hx FROM base
         |), smp AS (
         |  SELECT doc_id, n,
         |    (ascii(substr(repeat(hx, 16), CAST(i AS INT), 1)) - 80) * 257 AS v
         |  FROM px
         |)
         |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(1 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST((n + ${MediaOps.FlacBlockSize - 1}) // ${MediaOps.FlacBlockSize}
         |       AS BIGINT) AS n_frames,
         |  CAST(sum(v) AS BIGINT) AS s_sum, CAST(min(v) AS BIGINT) AS s_min,
         |  CAST(max(v) AS BIGINT) AS s_max,
         |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sq_sum
         |FROM smp GROUP BY doc_id, n""".stripMargin
    },
    "md_gzip_decode" -> {
      // gzip is LOSSLESS and documents.text is what was compressed, so the
      // oracle computes md5(text) DIRECTLY — full-content equality, not a
      // stats summary: any shortcut through the Huffman/LZ77 pipeline
      // mismatches. Header fields replay the fixture's mode cycle
      // (doc_id % 3): FNAME always (8), FHCRC (2) / FEXTRA (4) /
      // FCOMMENT (16) per mode; MTIME = doc_id, OS 255.
      """SELECT doc_id, CAST(8 AS BIGINT) AS method,
        |  CAST(8 + (CASE CAST(doc_id % 3 AS INT)
        |            WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END) AS BIGINT) AS flags,
        |  CAST(doc_id AS BIGINT) AS mtime, CAST(255 AS BIGINT) AS os,
        |  'doc_' || doc_id || '.txt' AS fname,
        |  CAST(strlen(text) AS BIGINT) AS n_out,
        |  md5(text) AS text_md5,
        |  CAST(1 AS BIGINT) AS n_members
        |FROM documents""".stripMargin
    },
    "md_gzip_concat" -> {
      // member-concatenated archives (RFC 1952 "a series of members"): the
      // fixture splits the text bytes into 1 + (length % 3) members; a
      // correct multi-member walk makes the boundaries vanish — content
      // digest and length are the WHOLE text's. Header fields are the first
      // member's (mode doc_id % 3, FNAME doc_<id>_m0.txt, MTIME doc_id).
      """SELECT doc_id, CAST(8 AS BIGINT) AS method,
        |  CAST(8 + (CASE CAST(doc_id % 3 AS INT)
        |            WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END) AS BIGINT) AS flags,
        |  CAST(doc_id AS BIGINT) AS mtime, CAST(255 AS BIGINT) AS os,
        |  'doc_' || doc_id || '_m0.txt' AS fname,
        |  CAST(strlen(text) AS BIGINT) AS n_out,
        |  md5(text) AS text_md5,
        |  CAST(1 + (strlen(text) % 3) AS BIGINT) AS n_members
        |FROM documents""".stripMargin
    },
    "md_frames" ->
      """SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  substr(text, (frame_no - 1) * 32 + 1, 32) AS frame,
        |  md5(substr(text, (frame_no - 1) * 32 + 1, 32)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        unnest(range(1, (length(text) + 31) // 32 + 1)) AS frame_no
        |      FROM documents)""".stripMargin,
  )
}
