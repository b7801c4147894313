package graft.operators

import graft.{Oracle, QueryPack}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col}

/** Driver-contract registration for [[TextOps]] + [[DedupOps]] (north-star
  * extensions: text analysis + deduplication). The oracle twins reproduce
  * the shingle/minhash/simhash pipelines in portable DuckDB SQL.
  */
object TextDedupPack extends QueryPack {
  import Oracle.h24

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_token_counts" -> ((s, d) => TextOps.tokenCounts(s, d)),
    "tx_quality_scores" -> ((s, d) => TextOps.qualityScores(s, d)),
    "tx_language_id" -> ((s, d) => TextOps.languageId(s, d)),
    "tx_langid_eval" -> ((s, d) => TextOps.langidEval(s, d)),
    "tx_fingerprints" -> ((s, d) => TextOps.fingerprints(s, d)),
    "tx_rarity_scores" -> ((s, d) => TextOps.rarityScores(s, d)),
    "tx_top_bigrams" -> ((s, d) => TextOps.topBigramsPerLang(s, d)),
    "tx_bigram_coverage" -> ((s, d) => TextOps.bigramCoverage(s, d)),
    "tx_curated_corpus" -> ((s, d) => TextOps.curatedCorpus(s, d)),
    "tx_dsir_weights" -> ((s, d) => TextOps.dsirWeights(s, d)),
    "tx_gopher_rules" -> ((s, d) => TextOps.gopherRules(s, d)),
    "tx_source_filter" -> ((s, d) => TextOps.sourceFilter(s, d)),
    "tx_blocklist_scrub" -> ((s, d) => TextOps.blocklistScrub(s, d)),
    "tx_token_budget" -> ((s, d) => TextOps.tokenBudget(s, d)),
    "tx_curation_funnel" -> ((s, d) => TextOps.curationFunnel(s, d)),
    "tx_contamination" -> ((s, d) => TextOps.contamination(s, d)),
    "tx_stratified_sample" -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "tx_token_histogram" -> ((s, d) => TextOps.tokenHistogram(s, d)),
    "tx_sequence_packing" -> ((s, d) => TextOps.sequencePacking(s, d)),
    "tx_repetition" -> ((s, d) => TextOps.repetitionScores(s, d)),
    "tx_temperature_mix" -> ((s, d) => TextOps.temperatureMix(s, d)),
    "dd_exact" -> ((s, d) => DedupOps.exactDedup(s, d)),
    "dd_jaro_name_pairs" -> ((s, d) => DedupOps.jaroNamePairs(s, d)),
    "dd_jaro_mutual_best" -> ((s, d) => DedupOps.jaroMutualBest(s, d)),
    "dd_edit1_pairs" -> ((s, d) => DedupOps.edit1Pairs(s, d)),
    "dd_fs_scores" -> ((s, d) => DedupOps.fellegiSunter(s, d)),
    "tx_source_js_drift" -> ((s, d) => TextOps.sourceJsDrift(s, d)),
    "tx_zipf_fit" -> ((s, d) => TextOps.zipfFit(s, d)),
    "tx_search_rbo" -> ((s, d) => TextOps.searchRbo(s, d)),
    "tx_keyphrases" -> ((s, d) => TextOps.keyphrases(s, d)),
    "dd_minhash_signatures" -> ((s, d) => DedupOps.minhashSignatures(s, d)),
    "dd_minhash_sig_udaf" -> ((s, d) => DedupOps.minhashSignaturesUdaf(s, d)),
    "dd_minhash_candidates" -> ((s, d) => DedupOps.minhashCandidates(s, d)),
    "dd_lsh_eval" -> ((s, d) => DedupOps.lshEval(s, d)),
    "dd_bucket_stats" -> ((s, d) => DedupOps.bucketStats(s, d)),
    "dd_jaccard_candidates" -> ((s, d) => DedupOps.jaccardOnCandidates(s, d)),
    "dd_minhash_estimate" -> ((s, d) => DedupOps.minhashEstimate(s, d)),
    "dd_simhash" -> ((s, d) => DedupOps.simhash(s, d)),
    "dd_simhash_groups" -> ((s, d) => DedupOps.simhashGroups(s, d)),
    "dd_simhash_neighbors" -> ((s, d) => DedupOps.simhashNeighbors(s, d)),
    "dd_embedding_neardups" -> ((s, d) => DedupOps.embeddingNearDups(s, d, 0.30)),
    "dd_clusters" -> ((s, d) => DedupOps.duplicateClusters(s, d)),
    "dd_cluster_stats" -> ((s, d) => DedupOps.clusterStats(s, d)),
    "dd_source_dup_rate" -> ((s, d) => DedupOps.sourceDupRate(s, d)),
    "dd_canonical_quality" -> ((s, d) => DedupOps.canonicalByQuality(s, d)),
    "dd_sorted_neighbors" -> ((s, d) => DedupOps.sortedNeighbors(s, d)),
    "dd_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccard(s, d)),
    "dd_containment" -> ((s, d) => DedupOps.ngramContainment(s, d)),
    "tx_keyword_search" -> ((s, d) => TextOps.keywordSearch(s, d)),
    "tx_search_snippets" -> ((s, d) => TextOps.searchSnippets(s, d)),
    "tx_source_lang_mix" -> ((s, d) => TextOps.sourceLangMix(s, d)),
    "tx_heaps_curve" -> ((s, d) => TextOps.heapsCurve(s, d)),
    "tx_ranked_search" -> ((s, d) => TextOps.rankedSearch(s, d)),
    "tx_bm25_search" -> ((s, d) => TextOps.bm25Search(s, d)),
    "sim_srp_knn_join" -> ((s, d) => DedupOps.srpKnnJoin(s, d)),
    "tx_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    "tx_bpe_encode" -> ((s, d) => TextOps.bpeEncode(s, d)),
    "tx_bpe_fertility" -> ((s, d) => TextOps.bpeFertility(s, d)),
    "tx_phrase_search" -> ((s, d) => TextOps.phraseSearch(s, d)),
    "tx_doc_chunks" -> ((s, d) => TextOps.docChunks(s, d)),
    "tx_dataset_splits" -> ((s, d) => TextOps.datasetSplits(s, d)),
    "tx_weighted_sample" -> ((s, d) => TextOps.weightedSample(s, d)),
    "tx_vocab" -> ((s, d) => TextOps.vocabulary(s, d)),
    // the driver's pandas comparator cannot sort/hash a raw list column, so
    // the registered shape emits the id sequence as a space-joined string
    // (value-identical, order-preserving); the array form stays unit-tested
    // explicit element cast: pins the long→string formatting contract with
    // the DuckDB array_to_string twin instead of relying on array_join's
    // implicit (version-sensitive) element coercion
    "tx_doc_encode" -> ((s, d) => TextOps.encodeDocs(s, d)
      .select(col("doc_id"),
        array_join(col("ids").cast("array<string>"), " ").as("ids"),
        col("n_tokens"))),
    "tx_token_entropy" -> ((s, d) => TextOps.tokenEntropy(s, d)),
    "dd_prefix_jaccard" -> ((s, d) => DedupOps.prefixJaccard(s, d)),
    "dd_ppj_stats" -> ((s, d) => DedupOps.prefixJoinStats(s, d)),
    "dd_dup_spans" -> ((s, d) => DedupOps.dupSpans(s, d)),
    "dd_span_removal" -> ((s, d) => DedupOps.spanRemoval(s, d)),
    "tx_lm_score" -> ((s, d) => TextOps.lmScores(s, d)),
    "tx_perplexity_buckets" -> ((s, d) => TextOps.perplexityBuckets(s, d)),
    "tx_quality_classifier" -> ((s, d) => TextOps.qualityClassifier(s, d)),
    "dd_incremental" -> ((s, d) => DedupOps.incrementalDedup(s, d)),
    "dd_incremental_tx" -> ((s, d) => DedupOps.incrementalDedupTx(s, d)),
    "dd_incremental_cdf" -> ((s, d) => DedupOps.incrementalDedupCdf(s, d)),
    "xacid_dedup_index" -> ((s, d) => DedupOps.dedupIndexHistory(s, d)),
    "xacid_pruned_scan" -> ((s, d) => DedupOps.prunedIndexScan(s, d)),
    "xacid_bloom_scan" -> ((s, d) => DedupOps.bloomIndexScan(s, d)),
    "dd_fuzzy_decontam" -> ((s, d) => DedupOps.fuzzyDecontam(s, d)),
    "tx_leak_safe_splits" -> ((s, d) => TextOps.leakSafeSplits(s, d)),
  )

  /** Word 3-gram shingles per doc (twin of [[TextFunctions.shingles3]]). */
  /** Shared SRP collision-graph CTEs (`v` double-cast vectors, `b` one row
    * per (vector, hash table, bucket)) — identical weight literals as
    * [[DedupOps.srpWeight]] embeds in Spark; used by the near-dup threshold
    * query and the kNN-join top-k query. The adaptive bit count
    * ([[DedupOps.srpBitsFor]]) replays as an integer CASE ladder over
    * `count(*)` — bit p contributes only when `p < bits`, so the oracle is
    * exact at EVERY corpus size, not just the SF the SQL was dumped at.
    */
  private lazy val srpBucketCtes: String = {
    def wList(t: Int, p: Int): String =
      (0 until DedupOps.EmbDim)
        .map(i => f"${DedupOps.srpWeight(t, p, i)}%.3f").mkString("[", ", ", "]")
    // smallest b >= SrpBits with 2^b * SrpTargetBucket >= n — srpBitsFor's twin
    val bitsLadder = (DedupOps.SrpBits until DedupOps.SrpMaxBits)
      .map(b => s"WHEN n <= ${(1L << b) * DedupOps.SrpTargetBucket} THEN $b")
      .mkString("CASE ", " ", s" ELSE ${DedupOps.SrpMaxBits} END")
    def bucketExpr(t: Int): String =
      (0 until DedupOps.SrpMaxBits).map { p =>
        s"""(CASE WHEN $p < (SELECT bits FROM sbits)
           |  AND list_dot_product(e, ${wList(t, p)}) >= 0
           |  THEN ${1L << p} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
    val tableRows = (0 until DedupOps.SrpTables).map { t =>
      s"  SELECT vec_id, e, $t AS t, CAST(${bucketExpr(t)} AS BIGINT) AS bucket FROM v"
    }.mkString("\n  UNION ALL\n")
    s"""WITH sbits AS (SELECT $bitsLadder AS bits
       |               FROM (SELECT count(*) AS n FROM embeddings)),
       |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |           FROM embeddings),
       |b AS (
       |$tableRows
       |)""".stripMargin
  }

  /** Unrolled BPE training rounds — twin of [[TextOps.bpeTrain]]: `bw0`
    * word frequencies, `bs0` space-delimited char symbols, then per round r
    * the pair counts (`bp_r`, overlapping adjacents, freq-weighted), the
    * deterministic argmax (`bb_r`) and the literal-replace rewrite
    * (`bs_r`). Same kmeans-style unrolling precedent.
    */
  private lazy val bpeCtes: String = {
    val init = Seq(
      """bw0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word)""".stripMargin,
      """bs0 AS (SELECT word, freq,
        |  ' ' || array_to_string(list_transform(range(1, length(word) + 1),
        |          i -> substr(word, CAST(i AS INT), 1)), ' ') || ' ' AS syms
        |  FROM bw0)""".stripMargin)
    val rounds = (1 to TextOps.BpeRounds).flatMap { r =>
      val prev = s"bs${r - 1}"
      Seq(
        s"""bp$r AS (
           |  SELECT ts[CAST(i AS INT)] AS lhs, ts[CAST(i + 1 AS INT)] AS rhs,
           |    CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq, ts, unnest(range(1, len(ts))) AS i
           |        FROM (SELECT freq, string_split(trim(syms), ' ') AS ts FROM $prev))
           |  GROUP BY 1, 2)""".stripMargin,
        s"bb$r AS (SELECT lhs, rhs, cnt FROM bp$r ORDER BY cnt DESC, lhs, rhs LIMIT 1)",
        s"""bs$r AS (SELECT word, freq,
           |  replace(syms, ' ' || lhs || ' ' || rhs || ' ', ' ' || lhs || rhs || ' ') AS syms
           |  FROM $prev, bb$r)""".stripMargin)
    }
    (init ++ rounds).mkString("WITH ", ",\n", "")
  }

  private val shinglesCte =
    """doc_shingles AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, greatest(len(w)-1, 1)),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |)""".stripMargin

  private val distinctShinglesCte =
    "distinct_shingles AS (SELECT DISTINCT doc_id, shingle FROM doc_shingles)"

  /** Rare-gram candidate pairs with exact intersection and set sizes — twin
    * of [[DedupOps.rareGramOverlaps]], shared by the Jaccard and
    * containment oracles.
    */
  private def withOverlapCtes(select: String): String =
    Oracle.withCtes(shinglesCte, distinctShinglesCte,
      "tg AS (SELECT doc_id, shingle AS g FROM distinct_shingles)",
      s"""rare AS (
         |  SELECT g FROM (SELECT g, count(*) AS df FROM tg GROUP BY g)
         |  WHERE df BETWEEN 2 AND ${DedupOps.NgramRareDfMax})""".stripMargin,
      "posting AS (SELECT doc_id, g FROM tg WHERE g IN (SELECT g FROM rare))",
      """cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id)""".stripMargin,
      "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tg GROUP BY doc_id)",
      """inter AS (
        |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_inter
        |  FROM cand
        |  JOIN tg ta ON ta.doc_id = doc_a
        |  JOIN tg tb ON tb.doc_id = doc_b AND tb.g = ta.g
        |  GROUP BY doc_a, doc_b)""".stripMargin)(select)

  /** MinHash signature CTE (twin of [[DedupOps.minhashSignatures]]). */
  private val mhCte = {
    val mins = (1 to DedupOps.NumHashes)
      .map(j => s"    min(${h24(s"'$j:' || shingle")}) AS mh$j")
      .mkString(",\n")
    s"mh AS (\n  SELECT doc_id,\n$mins\n  FROM distinct_shingles GROUP BY doc_id\n)"
  }

  /** LSH bands CTE (twin of [[DedupOps.minhashBands]]). */
  private val bandsCte = {
    val rows = (1 to DedupOps.NumBands).map { b =>
      s"  SELECT doc_id, $b AS band_no, md5(CAST(mh${2 * b - 1} AS VARCHAR) || '_' || CAST(mh${2 * b} AS VARCHAR)) AS band_key FROM mh"
    }.mkString("\n  UNION ALL\n")
    s"bands AS (\n$rows\n)"
  }

  private val candCte =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_no = b.band_no AND a.band_key = b.band_key
      |  WHERE a.doc_id < b.doc_id
      |)""".stripMargin

  private val stop = TextFunctions.LangProfiles.head._2
    .map(s => s"'$s'").mkString(", ")

  private def hitsSql(prof: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> x IN (${prof.map(s => s"'$s'").mkString(", ")})))"

  /** Per-doc Gopher-rule bitmap — twin of [[TextOps.gopherRules]]; shared
    * by the bitmap query and the per-source rollup.
    */
  private lazy val gopherSql: String =
    s"""SELECT doc_id, n_words,
       |  n_words >= ${TextOps.GopherMinWords} AS r_min_words,
       |  (mean_len >= ${TextOps.GopherMeanWordLen._1}
       |    AND mean_len <= ${TextOps.GopherMeanWordLen._2}) AS r_mean_word_len,
       |  max_word <= ${TextOps.GopherMaxWordLen} AS r_max_word_len,
       |  n_stop >= ${TextOps.GopherMinStops} AS r_stop_words,
       |  alpha_frac > ${TextOps.GopherMinAlpha} AS r_alpha_words,
       |  (n_words >= ${TextOps.GopherMinWords}
       |    AND mean_len >= ${TextOps.GopherMeanWordLen._1}
       |    AND mean_len <= ${TextOps.GopherMeanWordLen._2}
       |    AND max_word <= ${TextOps.GopherMaxWordLen}
       |    AND n_stop >= ${TextOps.GopherMinStops}
       |    AND alpha_frac > ${TextOps.GopherMinAlpha}) AS passes
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w) AS mean_len,
       |    list_max(list_transform(w, x -> length(x))) AS max_word,
       |    CAST(${hitsSql(stopSeq)} AS BIGINT) AS n_stop,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS DOUBLE) / len(w) AS alpha_frac
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
       |        FROM documents))""".stripMargin

  /** Edge set + recursive reachability for the cluster oracle (twin of
    * [[DedupOps.duplicateClusters]]'s fixed point: min reachable doc_id).
    */
  private val clusterCtes: Seq[String] = Seq(
    "sizes AS (SELECT doc_id, count(*) AS n FROM distinct_shingles GROUP BY doc_id)",
    """inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      |  FROM cand c
      |  JOIN distinct_shingles sa ON sa.doc_id = c.doc_a
      |  JOIN distinct_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      |  GROUP BY c.doc_a, c.doc_b
      |)""".stripMargin,
    s"""edges AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand c
       |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |  JOIN sizes za ON za.doc_id = c.doc_a
       |  JOIN sizes zb ON zb.doc_id = c.doc_b
       |  WHERE CAST(coalesce(i.n_inter, 0) AS DOUBLE)
       |        / (za.n + zb.n - coalesce(i.n_inter, 0)) >= ${DedupOps.ClusterMinJaccard}
       |)""".stripMargin,
    """sym AS (SELECT doc_a AS s, doc_b AS d FROM edges
      |       UNION ALL SELECT doc_b, doc_a FROM edges)""".stripMargin,
    """reach AS (
      |  SELECT s AS a, s AS b FROM sym
      |  UNION
      |  SELECT r.a, e.d AS b FROM reach r JOIN sym e ON e.s = r.b
      |)""".stripMargin,
    """clusters AS (
      |  SELECT a AS doc_id, min(b) AS cluster_id, a = min(b) AS is_canonical
      |  FROM reach GROUP BY a
      |)""".stripMargin)

  /** Per-doc quality score + predicted language in one pass — twin of the
    * inline expressions [[TextOps.curatedCorpus]] computes over its single
    * scan.
    */
  private val scoredCte = {
    val hitCols = TextFunctions.LangProfiles
      .map { case (l, p) => s"    CAST(${hitsSql(p)} AS BIGINT) AS hits_$l" }
      .mkString(",\n")
    val best = "greatest(" +
      TextFunctions.LangProfiles.map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"
    val cases = TextFunctions.LangProfiles
      .map { case (l, _) => s"WHEN hits_$l = best AND best > 0 THEN '$l'" }
      .mkString(" ")
    s"""scored AS (
       |  SELECT doc_id, n_words, quality_score,
       |    CASE $cases ELSE 'und' END AS predicted_lang
       |  FROM (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |    least(len(string_split(text, ' ')) / 100.0, 1.0) *
       |      (0.5 + 0.5 * (CAST(${hitsSql(stopSeq)} AS DOUBLE)
       |                    / len(string_split(text, ' ')))) AS quality_score,
       |$hitCols,
       |    $best AS best
       |  FROM documents)
       |)""".stripMargin
  }

  private val baseOracles: Map[String, String] = Map(
    "tx_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.TokenRe.replace("\\", "\\\\")}')) AS BIGINT) AS n_re_tokens
         |FROM documents""".stripMargin,
    "tx_quality_scores" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars_actual,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |    / len(string_split(text, ' ')) AS avg_word_len,
         |  CAST(${hitsSql(stopSeq)} AS DOUBLE)
         |    / len(string_split(text, ' ')) AS stopword_ratio,
         |  least(len(string_split(text, ' ')) / 100.0, 1.0) *
         |    (0.5 + 0.5 * (CAST(${hitsSql(stopSeq)} AS DOUBLE)
         |                  / len(string_split(text, ' ')))) AS quality_score
         |FROM documents""".stripMargin,
    "tx_language_id" -> {
      val hitCols = TextFunctions.LangProfiles
        .map { case (l, p) => s"  CAST(${hitsSql(p)} AS BIGINT) AS hits_$l" }
        .mkString(",\n")
      val best = "greatest(" + TextFunctions.LangProfiles.map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"
      val cases = TextFunctions.LangProfiles
        .map { case (l, _) => s"WHEN hits_$l = best AND best > 0 THEN '$l'" }
        .mkString(" ")
      s"""SELECT doc_id, ${TextFunctions.LangProfiles.map { case (l, _) => s"hits_$l" }.mkString(", ")},
         |  CASE $cases ELSE 'und' END AS predicted_lang
         |FROM (SELECT doc_id,\n$hitCols,
         |  $best AS best
         |  FROM documents)""".stripMargin
    },
    // exact-BIGINT confusion counts off the prediction CTE; prec/rec single
    // divisions, f1 the fixed chain 2*p*r/(p+r), zero-denominator pinned
    // to 0.0 by CASE on both sides -- hash-exact, unrounded
    "tx_langid_eval" -> {
      val hitCols = TextFunctions.LangProfiles
        .map { case (l, p) => s"  CAST(${hitsSql(p)} AS BIGINT) AS hits_$l" }
        .mkString(",\n")
      val best = "greatest(" + TextFunctions.LangProfiles
        .map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"
      val cases = TextFunctions.LangProfiles
        .map { case (l, _) => s"WHEN hits_$l = best AND best > 0 THEN '$l'" }
        .mkString(" ")
      s"""WITH p AS (
         |  SELECT lang, CASE $cases ELSE 'und' END AS pred
         |  FROM (SELECT lang,\n$hitCols,
         |    $best AS best
         |    FROM documents)),
         |nt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_true
         |       FROM p GROUP BY 1),
         |np AS (SELECT pred AS lang, CAST(count(*) AS BIGINT) AS n_pred
         |       FROM p GROUP BY 1),
         |tp AS (SELECT lang, CAST(count(*) AS BIGINT) AS tp
         |       FROM p WHERE lang = pred GROUP BY 1),
         |m AS (
         |  SELECT nt.lang, n_true, COALESCE(n_pred, 0) AS n_pred,
         |    COALESCE(tp, 0) AS tp
         |  FROM nt LEFT JOIN np USING (lang) LEFT JOIN tp USING (lang)),
         |pr AS (
         |  SELECT lang, n_true, n_pred, tp,
         |    CASE WHEN n_pred > 0
         |         THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)
         |         ELSE 0.0 END AS prec,
         |    CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) AS rec
         |  FROM m)
         |SELECT lang, n_true, n_pred, tp, prec, rec,
         |  CASE WHEN prec + rec > 0
         |       THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END AS f1
         |FROM pr""".stripMargin
    },
    "tx_fingerprints" ->
      Oracle.withCtes(shinglesCte)(
        s"""SELECT doc_id, min(h) AS fingerprint,
           |  min(CASE WHEN h = mn THEN shingle END) AS rep_shingle
           |FROM (SELECT doc_id, shingle, h,
           |        min(h) OVER (PARTITION BY doc_id) AS mn
           |      FROM (SELECT doc_id, shingle, ${h24("shingle")} AS h
           |            FROM doc_shingles))
           |GROUP BY doc_id""".stripMargin),
    "tx_top_bigrams" ->
      """WITH db AS (
        |  SELECT DISTINCT lang, doc_id, bigram FROM (
        |    SELECT lang, doc_id,
        |      w[i] || ' ' || w[i + 1] AS bigram
        |    FROM (SELECT lang, doc_id, string_split(text, ' ') AS w
        |          FROM documents),
        |      UNNEST(range(1, len(w))) AS t(i)
        |    WHERE len(w) >= 2)),
        |lb AS (
        |  SELECT lang, bigram, count(*) AS doc_freq
        |  FROM db GROUP BY lang, bigram)
        |SELECT lang, bigram, doc_freq FROM (
        |  SELECT lang, bigram, doc_freq,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY doc_freq DESC, bigram) AS rn
        |  FROM lb) ranked
        |WHERE rn <= 3""".stripMargin,
    "tx_bigram_coverage" ->
      s"""WITH occ AS (
         |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |    UNNEST(range(1, len(w))) AS t(i)
         |  WHERE len(w) >= 2),
         |model AS (
         |  SELECT bigram FROM (
         |    SELECT bigram,
         |      row_number() OVER (ORDER BY count(*) DESC, bigram) AS rn
         |    FROM occ GROUP BY bigram) ranked
         |  WHERE rn <= ${TextOps.CoverageModelSize}),
         |cov AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(CASE WHEN bigram IN (SELECT bigram FROM model)
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS covered
         |  FROM occ GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_bigrams, 0) AS n_bigrams,
         |  coalesce(covered, 0) AS covered,
         |  CASE WHEN coalesce(n_bigrams, 0) > 0
         |       THEN CAST(covered AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         |  END AS coverage
         |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id""".stripMargin,
    "tx_rarity_scores" ->
      """WITH dw AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents)),
        |vocab AS (SELECT word, count(*) AS doc_freq FROM dw GROUP BY word)
        |SELECT doc_id, count(*) AS n_distinct_words,
        |  CAST(sum(doc_freq) AS DOUBLE) / count(*) AS mean_doc_freq
        |FROM dw JOIN vocab USING (word)
        |GROUP BY doc_id""".stripMargin,
    "tx_contamination" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte,
        s"""bench_shingles AS (SELECT DISTINCT shingle FROM distinct_shingles
           |  WHERE doc_id < ${TextOps.BenchmarkDocs})""".stripMargin,
        s"""corpus_sh AS (SELECT doc_id, shingle FROM distinct_shingles
           |  WHERE doc_id >= ${TextOps.BenchmarkDocs})""".stripMargin,
        """shared AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared FROM corpus_sh
          |  WHERE shingle IN (SELECT shingle FROM bench_shingles)
          |  GROUP BY doc_id)""".stripMargin,
        """totals AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
          |  FROM corpus_sh GROUP BY doc_id)""".stripMargin)(
        s"""SELECT s.doc_id, n_shared, n_shingles,
           |  CAST(n_shared AS DOUBLE) / n_shingles AS overlap,
           |  CAST(n_shared AS DOUBLE) / n_shingles >=
           |    ${TextOps.ContaminationMinOverlap} AS contaminated
           |FROM shared s JOIN totals USING (doc_id)""".stripMargin),
    "tx_stratified_sample" -> {
      val rateCase = "CASE " + TextOps.SampleRates
        .map { case (l, r) => s"WHEN predicted_lang = '$l' THEN $r" }
        .mkString(" ") + " ELSE 0 END"
      Oracle.withCtes(scoredCte)(
        s"""SELECT doc_id, predicted_lang FROM scored
           |WHERE ${h24("'sample:' || CAST(doc_id AS VARCHAR)")} % 100
           |      < $rateCase""".stripMargin)
    },
    "tx_token_histogram" ->
      s"""SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS total_tokens,
        |  CAST(min(n) AS BIGINT) AS min_tokens,
        |  CAST(max(n) AS BIGINT) AS max_tokens
        |FROM (SELECT CAST(len(string_split(text, ' ')) // ${TextOps.HistBucketWidth} AS BIGINT) AS bucket,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |      FROM documents)
        |GROUP BY bucket""".stripMargin,
    "tx_sequence_packing" ->
      s"""SELECT doc_id, shard, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       - n_tokens AS BIGINT) AS start_offset,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       - n_tokens) / ${TextOps.SeqLen}) AS BIGINT) AS seq_id
         |FROM (SELECT doc_id, doc_id % ${TextOps.PackShards} AS shard,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |      FROM documents)""".stripMargin,
    // same list-materialization discipline as the Spark side: w is split
    // once per doc, sliced per chunk
    "tx_doc_chunks" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS w,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents),
         |starts AS (
         |  SELECT doc_id, w, n,
         |         unnest(generate_series(1, n, ${TextOps.ChunkStride})) AS s
         |  FROM base)
         |SELECT doc_id,
         |  CAST((s - 1) // ${TextOps.ChunkStride} AS BIGINT) AS chunk_idx,
         |  CAST(s AS BIGINT) AS start_token,
         |  CAST(least(${TextOps.ChunkLen}, n - s + 1) AS BIGINT) AS chunk_tokens,
         |  ${h24(s"array_to_string(w[CAST(s AS BIGINT):least(s + ${TextOps.ChunkLen - 1}, n)], ' ')")}
         |    AS chunk_hash
         |FROM starts""".stripMargin,
    "tx_dataset_splits" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CASE WHEN ${h24("'split:' || CAST(doc_id AS VARCHAR)")} % 100
         |              < ${TextOps.SplitTrainPct} THEN 'train'
         |         WHEN ${h24("'split:' || CAST(doc_id AS VARCHAR)")} % 100
         |              < ${TextOps.SplitValPct} THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM d) AS doc_share
         |FROM d GROUP BY split""".stripMargin,
    "tx_repetition" ->
      """SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_word_frac,
        |  1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_word_frac
        |FROM (SELECT doc_id, word, count(*) AS c
        |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |            FROM documents)
        |      GROUP BY doc_id, word)
        |GROUP BY doc_id""".stripMargin,
    "tx_temperature_mix" ->
      s"""WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
         |rates AS (SELECT lang,
         |    CAST(floor(100 * sqrt((SELECT CAST(min(n_lang) AS DOUBLE) FROM counts)
         |                          / CAST(n_lang AS DOUBLE))) AS BIGINT) AS keep_pct
         |  FROM counts)
         |SELECT d.doc_id, d.lang, r.keep_pct
         |FROM documents d JOIN rates r USING (lang)
         |WHERE ${h24("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 100 < r.keep_pct""".stripMargin,
    "tx_curated_corpus" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes :+ scoredCte: _*)(
        s"""SELECT doc_id, n_words, quality_score, predicted_lang
           |FROM scored
           |WHERE quality_score >= ${TextOps.MinQuality}
           |  AND predicted_lang = 'en'
           |  AND doc_id NOT IN
           |    (SELECT doc_id FROM clusters WHERE NOT is_canonical)""".stripMargin),
    // DSIR replay with the anchored log kernel (r11): per-bucket Laplace
    // log-ratios are four-term DetLog chains quantized to the 1e12 grid,
    // per-doc weights are exact integer sums of bucket values over the
    // occurrence stream (order-free), one division + round at emission;
    // the `selected` flag reads the 6dp-ROUNDED weight, like the Spark side
    "tx_dsir_weights" ->
      s"""WITH tgt AS (
         |  SELECT doc_id,
         |    (least(len(string_split(text, ' ')) / 100.0, 1.0) *
         |      (0.5 + 0.5 * (CAST(${hitsSql(stopSeq)} AS DOUBLE)
         |                    / len(string_split(text, ' '))))
         |     >= ${TextOps.MinQuality}) AS in_target
         |  FROM documents),
         |occ AS (
         |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |    UNNEST(range(1, len(w))) AS t(i)
         |  WHERE len(w) >= 2),
         |occ2 AS (
         |  SELECT o.doc_id, t.in_target,
         |    ${h24("bigram")} % ${TextOps.DsirBuckets} AS f
         |  FROM occ o JOIN tgt t USING (doc_id)),
         |fs AS (
         |  SELECT f, CAST(count(*) AS BIGINT) AS sc,
         |    CAST(sum(CASE WHEN in_target THEN 1 ELSE 0 END) AS BIGINT) AS tc
         |  FROM occ2 GROUP BY f),
         |tot AS (SELECT CAST(sum(sc) AS BIGINT) AS s_tot,
         |               CAST(sum(tc) AS BIGINT) AS t_tot FROM fs),
         |args AS (
         |  SELECT f, CAST(tc + 1 AS BIGINT) AS tc1, CAST(sc + 1 AS BIGINT) AS sc1,
         |    CAST(t_tot + ${TextOps.DsirBuckets} AS BIGINT) AS tt,
         |    CAST(s_tot + ${TextOps.DsirBuckets} AS BIGINT) AS st
         |  FROM fs, tot),
         |lq AS (
         |  SELECT f,
         |    CAST(round((((${graft.functions.DetLog.lnSql("tc1")} -
         |        ${graft.functions.DetLog.lnSql("tt")}) -
         |        ${graft.functions.DetLog.lnSql("sc1")}) +
         |        ${graft.functions.DetLog.lnSql("st")}) *
         |      (1000000000000.0::DOUBLE), 0) AS BIGINT) AS lq
         |  FROM args),
         |scored_docs AS (
         |  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    round(CAST(sum(l.lq) AS DOUBLE) / (1000000000000.0::DOUBLE), 6)
         |      AS dsir_weight
         |  FROM occ2 o JOIN lq l USING (f)
         |  GROUP BY o.doc_id)
         |SELECT doc_id, n_feats, dsir_weight, (dsir_weight > 0) AS selected
         |FROM scored_docs""".stripMargin,
    "tx_gopher_rules" -> gopherSql,
    // closed-form waterfill: binding test is a pure BIGINT inequality over
    // the capacity-sorted prefix sums; both doubles are single exact
    // divisions
    "tx_token_budget" ->
      s"""WITH per AS (
         |  SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS cap
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(cap) AS BIGINT) AS total,
         |             CAST(count(*) AS BIGINT) AS n_sources FROM per),
         |f AS (
         |  SELECT source, cap, n_sources,
         |    (total * ${TextOps.BudgetNumer}) // ${TextOps.BudgetDenom} AS budget,
         |    CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS rn,
         |    CAST(COALESCE(sum(cap) OVER (ORDER BY cap, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM per, t),
         |g AS (
         |  SELECT *,
         |    cap * (n_sources - rn + 1) <= budget - cum_before AS binding
         |  FROM f),
         |s AS (
         |  SELECT
         |    CAST(sum(CASE WHEN binding THEN cap ELSE 0 END) AS BIGINT)
         |      AS bound_caps,
         |    CAST(sum(CASE WHEN binding THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_free
         |  FROM g)
         |SELECT source, n_tokens, binding, allocated,
         |  allocated / budget AS allocated_share
         |FROM (
         |  SELECT source, cap AS n_tokens, binding, budget,
         |    CASE WHEN binding THEN CAST(cap AS DOUBLE)
         |         ELSE CAST(budget - bound_caps AS DOUBLE) / n_free
         |         END AS allocated
         |  FROM g, s)""".stripMargin,
    // blocklist scrub: verdict thresholds as BIGINT products; DuckDB's
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default
    "tx_blocklist_scrub" -> {
      val pat = "\\b(" + TextOps.BlocklistTerms.mkString("|") + ")\\b"
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_hits
         |  FROM documents)
         |SELECT doc_id, n_words, n_hits,
         |  CAST(n_hits AS DOUBLE) / n_words AS hit_share,
         |  CASE WHEN n_hits = 0 THEN 'keep'
         |       WHEN n_hits * 100 < n_words * ${TextOps.ScrubMaxHitPct}
         |         THEN 'scrub'
         |       ELSE 'drop' END AS action,
         |  CASE WHEN n_hits > 0
         |         AND n_hits * 100 >= n_words * ${TextOps.ScrubMaxHitPct}
         |         THEN NULL
         |       ELSE regexp_replace(text, '$pat', '[REDACTED]', 'g')
         |       END AS scrubbed
         |FROM d""".stripMargin
    },
    // domain-level curation: gopher pass rate + exact-dup rate per source,
    // thresholds as pure BIGINT products (engine-stable verdicts)
    "tx_source_filter" ->
      s"""WITH gr AS (
         |$gopherSql
         |),
         |dup AS (
         |  SELECT doc_id, source,
         |    (doc_id <> min(doc_id) OVER (PARTITION BY md5(text))) AS is_dup
         |  FROM documents),
         |s AS (
         |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN gr.passes THEN 1 ELSE 0 END) AS BIGINT) AS n_passing,
         |    CAST(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
         |  FROM dup d JOIN gr ON gr.doc_id = d.doc_id GROUP BY 1)
         |SELECT source, n_docs, n_passing, n_dups,
         |  CAST(n_passing AS DOUBLE) / n_docs AS pass_share,
         |  CAST(n_dups AS DOUBLE) / n_docs AS dup_share,
         |  n_passing * 100 >= n_docs * ${TextOps.SourceMinPassPct} AS r_quality,
         |  n_dups * 100 <= n_docs * ${TextOps.SourceMaxDupPct} AS r_dup,
         |  (n_passing * 100 >= n_docs * ${TextOps.SourceMinPassPct}
         |    AND n_dups * 100 <= n_docs * ${TextOps.SourceMaxDupPct}) AS kept
         |FROM s""".stripMargin,
    "tx_curation_funnel" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes :+ scoredCte: _*)(
        s"""SELECT CAST(count(*) AS BIGINT) AS n_total,
           |  CAST(count(*) FILTER (WHERE quality_score >= ${TextOps.MinQuality})
           |    AS BIGINT) AS n_quality,
           |  CAST(count(*) FILTER (WHERE quality_score >= ${TextOps.MinQuality}
           |    AND predicted_lang = 'en') AS BIGINT) AS n_lang,
           |  CAST(count(*) FILTER (WHERE quality_score >= ${TextOps.MinQuality}
           |    AND predicted_lang = 'en'
           |    AND doc_id NOT IN (SELECT doc_id FROM clusters WHERE NOT is_canonical))
           |    AS BIGINT) AS n_curated
           |FROM scored""".stripMargin),
    // both blocking passes replayed leg by leg (2 passes × SnWindow lead
    // distances); levenshtein on the same prefixes, least/greatest
    // normalization, min-dist pair dedupe — all exact integers
    "dd_sorted_neighbors" -> {
      def leg(blk: String, i: Int) = {
        val w = s"OVER (PARTITION BY $blk ORDER BY key, doc_id)"
        s"""  SELECT least(doc_id, lead(doc_id, $i) $w) AS a_id,
           |    greatest(doc_id, lead(doc_id, $i) $w) AS b_id,
           |    levenshtein(key, lead(key, $i) $w) AS dist
           |  FROM d QUALIFY lead(doc_id, $i) $w IS NOT NULL""".stripMargin
      }
      val legs = (for {
        blk <- Seq("blk1", "blk2"); i <- 1 to DedupOps.SnWindow
      } yield leg(blk, i)).mkString("\n  UNION ALL\n")
      s"""WITH d AS (
         |  SELECT doc_id, substr(text, 1, ${DedupOps.SnPrefix}) AS key,
         |    substr(text, 1, ${DedupOps.SnBlock}) AS blk1,
         |    substr(text, ${DedupOps.SnBlock + 1}, ${DedupOps.SnBlock}) AS blk2
         |  FROM documents),
         |legs AS (
         |$legs)
         |SELECT a_id, b_id, min(dist) AS dist
         |FROM legs WHERE dist <= ${DedupOps.SnMaxDist}
         |GROUP BY a_id, b_id""".stripMargin
    },
    "dd_ngram_jaccard" ->
      withOverlapCtes(
        """SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
          |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE 2 * n_inter >= sa.n + sb.n - n_inter""".stripMargin),
    "dd_containment" ->
      withOverlapCtes(
        s"""SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
           |  CAST(n_inter AS DOUBLE) / sa.n AS cont_a,
           |  CAST(n_inter AS DOUBLE) / sb.n AS cont_b
           |FROM inter
           |JOIN sizes sa ON sa.doc_id = doc_a
           |JOIN sizes sb ON sb.doc_id = doc_b
           |WHERE n_inter * ${DedupOps.ContainmentDen} >=
           |  ${DedupOps.ContainmentNum} * least(sa.n, sb.n)""".stripMargin),
    "dd_exact" ->
      """SELECT doc_id, md5(text) AS text_hash,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents""".stripMargin,
    // DuckDB's jaro_winkler_similarity is the semantic twin of the
    // library's codegen'd JaroWinkler expression (validated on 3 900
    // cases); both sides cut on the 6 dp-ROUNDED score so pair membership
    // survives the <=1-ulp raw divergence between the two implementations
    "dd_jaro_name_pairs" ->
      s"""WITH names AS (
         |  SELECT p_name, CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1),
         |scored AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b,
         |    a.n AS n_a, b.n AS n_b,
         |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
         |  FROM names a JOIN names b ON a.p_name < b.p_name)
         |SELECT name_a, name_b, n_a, n_b, jw
         |FROM scored WHERE jw >= ${DedupOps.JwThreshold}""".stripMargin,
    // reciprocal top-1 on the same rounded scores: rank (jw DESC, other
    // ASC) per name, keep pairs where each side is the other's rank-1
    "dd_jaro_mutual_best" ->
      s"""WITH names AS (
         |  SELECT p_name FROM part GROUP BY 1),
         |scored AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b,
         |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
         |  FROM names a JOIN names b ON a.p_name < b.p_name),
         |kept AS (SELECT * FROM scored WHERE jw >= ${DedupOps.JwThreshold}),
         |sym AS (
         |  SELECT name_a AS name, name_b AS other, jw FROM kept
         |  UNION ALL
         |  SELECT name_b AS name, name_a AS other, jw FROM kept),
         |best AS (
         |  SELECT name, other, jw,
         |    row_number() OVER (PARTITION BY name ORDER BY jw DESC, other) AS rk
         |  FROM sym QUALIFY rk = 1)
         |SELECT x.name AS name_a, x.other AS name_b, x.jw AS jw
         |FROM best x JOIN best y
         |  ON x.other = y.name AND y.other = x.name
         |WHERE x.name < x.other""".stripMargin,
    // oracle is brute-force all-pairs levenshtein — exactly what the
    // FastSS deletion-neighborhood blocking must reproduce (the blocking
    // is exact for k = 1, so no tolerance is needed); INT cast matches
    // Spark's IntegerType levenshtein
    "dd_edit1_pairs" ->
      """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |  a.c_name AS name_a, b.c_name AS name_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    // u = chance agreement sum(f^2)/n^2 in exact BIGINTs to one division;
    // per-pair terms are libm log2 of identical doubles summed in the
    // written order and 6dp-rounded; candidates = the brute-force twin of
    // the FastSS blocking
    "dd_fs_scores" -> {
      def t(agree: String, m: Double, u: String) =
        s"CASE WHEN $agree THEN log2($m / $u) ELSE log2(${1 - m} / (1.0 - $u)) END"
      s"""WITH cust AS (
         |  SELECT c_custkey AS key, c_name AS name, c_nationkey AS nat,
         |    c_mktsegment AS seg,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS balband
         |  FROM customer),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
         |unat AS (SELECT CAST(sum(c * c) AS DOUBLE) /
         |    CAST((SELECT n * n FROM n) AS DOUBLE) AS u_nat
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY nat)),
         |useg AS (SELECT CAST(sum(c * c) AS DOUBLE) /
         |    CAST((SELECT n * n FROM n) AS DOUBLE) AS u_seg
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM cust GROUP BY seg)),
         |ubal AS (SELECT CAST(sum(c * c) AS DOUBLE) /
         |    CAST((SELECT n * n FROM n) AS DOUBLE) AS u_bal
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM cust
         |        GROUP BY balband)),
         |cand AS (
         |  SELECT a.key AS key_a, b.key AS key_b,
         |    a.nat AS nat_a, b.nat AS nat_b, a.seg AS seg_a, b.seg AS seg_b,
         |    a.balband AS bal_a, b.balband AS bal_b
         |  FROM cust a JOIN cust b ON a.key < b.key
         |  WHERE levenshtein(a.name, b.name) <= 1),
         |scored AS (
         |  SELECT key_a, key_b,
         |    nat_a = nat_b AS agree_nation, seg_a = seg_b AS agree_segment,
         |    bal_a = bal_b AS agree_balband,
         |    round(${t("nat_a = nat_b", DedupOps.FsMNation, "u_nat")} +
         |          ${t("seg_a = seg_b", DedupOps.FsMSegment, "u_seg")} +
         |          ${t("bal_a = bal_b", DedupOps.FsMBalband, "u_bal")}, 6)
         |      AS score
         |  FROM cand CROSS JOIN unat CROSS JOIN useg CROSS JOIN ubal)
         |SELECT key_a, key_b, agree_nation, agree_segment, agree_balband,
         |  score,
         |  CASE WHEN score >= ${DedupOps.FsLinkMin} THEN 'link'
         |       WHEN score >= ${DedupOps.FsPossibleMin} THEN 'possible'
         |       ELSE 'non_link' END AS verdict
         |FROM scored""".stripMargin
    },
    // mirrored JS terms per PRESENT (source, token) row; the absent-token
    // mass enters in closed form (N_r - sum r_present)/(2 N_r) - the
    // source x vocab cross product never materializes on either side
    "tx_source_js_drift" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2),
        |tot AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nsrc FROM st GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM st),
        |terms AS (
        |  SELECT st.source, ns.nsrc, n.ntot, st.c, tot.ct,
        |    CAST(st.c AS DOUBLE) / CAST(ns.nsrc AS DOUBLE) AS p,
        |    CAST(tot.ct - st.c AS DOUBLE) / CAST(n.ntot - ns.nsrc AS DOUBLE) AS q
        |  FROM st JOIN tot USING (token) JOIN ns USING (source) CROSS JOIN n),
        |agg AS (
        |  SELECT source, nsrc, ntot,
        |    sum(0.5 * p * log2(p / ((p + q) / 2.0)) +
        |        CASE WHEN ct > c THEN 0.5 * q * log2(q / ((p + q) / 2.0))
        |             ELSE 0.0 END) AS s_present,
        |    CAST(sum(ct - c) AS BIGINT) AS r_present
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT source, nsrc AS n_tokens,
        |  round(s_present + 0.5 * CAST((ntot - nsrc) - r_present AS DOUBLE) /
        |    CAST(ntot - nsrc AS DOUBLE), 6) AS js_bits
        |FROM agg""".stripMargin,
    // same (freq DESC, token) integer-deterministic rank and cut; anchored
    // log kernel: x/y are DetLog chains quantized to the 1e12 grid, moment
    // sums exact (HUGEINT), then ONE mirrored IEEE OLS chain over the
    // double-cast moments — the grid factor cancels in slope and r2, the
    // intercept rescales by explicit /1e12 divisions
    "tx_zipf_fit" -> {
      val l2rn = graft.functions.DetLog.log2Sql("rn")
      val l2f = graft.functions.DetLog.log2Sql("freq")
      val S = "(1000000000000.0::DOUBLE)"
      val kD = "CAST(k AS DOUBLE)"
      val num = s"(($kD * sxy) - (sx * sy))"
      val den = s"(($kD * sxx) - (sx * sx))"
      val deny = s"(($kD * syy) - (sy * sy))"
      s"""WITH freq AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         |  GROUP BY 1),
         |ranked AS (
         |  SELECT CAST(round($l2rn * $S, 0) AS BIGINT) AS xq,
         |    CAST(round($l2f * $S, 0) AS BIGINT) AS yq
         |  FROM (SELECT freq,
         |          row_number() OVER (ORDER BY freq DESC, token) AS rn
         |        FROM freq)
         |  WHERE rn <= ${TextOps.ZipfFitTop}),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(yq) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(xq AS HUGEINT) * yq) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS sxx,
         |    CAST(sum(CAST(yq AS HUGEINT) * yq) AS DOUBLE) AS syy
         |  FROM ranked)
         |SELECT k AS n_tokens_fit,
         |  round($num / $den, 6) AS slope,
         |  round(((sy / $S) - (($num / $den) * (sx / $S))) / $kD, 6) AS intercept,
         |  round(($num * $num) / ($den * $deny), 6) AS r2
         |FROM m""".stripMargin
    },
    "dd_minhash_signatures" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte)(
        s"SELECT doc_id, ${(1 to DedupOps.NumHashes).map(j => s"mh$j").mkString(", ")} FROM mh"),
    // the UDAF path must produce the bit-identical signature table
    "dd_minhash_sig_udaf" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte)(
        s"SELECT doc_id, ${(1 to DedupOps.NumHashes).map(j => s"mh$j").mkString(", ")} FROM mh"),
    "dd_minhash_candidates" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)(
        "SELECT doc_a, doc_b FROM cand"),
    // precision from the minhash chain's exact candidate Jaccards; recall
    // cross-checked against the independent rare-gram family's >=1/2 pairs
    // (the overlap chain with its cand/inter renamed to avoid collisions)
    "dd_lsh_eval" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte,
        "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM distinct_shingles GROUP BY doc_id)",
        """minter AS (
          |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          |  FROM cand c
          |  JOIN distinct_shingles sa ON sa.doc_id = c.doc_a
          |  JOIN distinct_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          |  GROUP BY c.doc_a, c.doc_b)""".stripMargin,
        s"""ctrue AS (
           |  SELECT c.doc_a, c.doc_b
           |  FROM cand c
           |  LEFT JOIN minter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
           |  JOIN sizes za ON za.doc_id = c.doc_a
           |  JOIN sizes zb ON zb.doc_id = c.doc_b
           |  WHERE CAST(coalesce(i.n_inter, 0) AS DOUBLE)
           |    / (za.n + zb.n - coalesce(i.n_inter, 0))
           |    >= ${DedupOps.ClusterMinJaccard})""".stripMargin,
        s"""rare AS (
           |  SELECT shingle AS g FROM (
           |    SELECT shingle, count(*) AS df FROM distinct_shingles GROUP BY shingle)
           |  WHERE df BETWEEN 2 AND ${DedupOps.NgramRareDfMax})""".stripMargin,
        "posting AS (SELECT doc_id, shingle AS g FROM distinct_shingles WHERE shingle IN (SELECT g FROM rare))",
        """ocand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id)""".stripMargin,
        """ointer AS (
          |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_inter
          |  FROM ocand
          |  JOIN distinct_shingles ta ON ta.doc_id = doc_a
          |  JOIN distinct_shingles tb ON tb.doc_id = doc_b AND tb.shingle = ta.shingle
          |  GROUP BY doc_a, doc_b)""".stripMargin,
        """audit AS (
          |  SELECT doc_a, doc_b
          |  FROM ointer
          |  JOIN sizes sa ON sa.doc_id = doc_a
          |  JOIN sizes sb ON sb.doc_id = doc_b
          |  WHERE 2 * n_inter >= sa.n + sb.n - n_inter)""".stripMargin,
        "nc AS (SELECT count(*) AS n_cand_pairs FROM cand)",
        "nv AS (SELECT count(*) AS n_cand_true FROM ctrue)",
        "na AS (SELECT count(*) AS n_audit_pairs FROM audit)",
        "ng AS (SELECT count(*) AS n_audit_caught FROM audit JOIN cand USING (doc_a, doc_b))")(
        """SELECT n_cand_pairs, n_cand_true,
          |  CASE WHEN n_cand_pairs = 0 THEN 1.0
          |       ELSE CAST(n_cand_true AS DOUBLE) / CAST(n_cand_pairs AS DOUBLE) END
          |    AS precision,
          |  n_audit_pairs, n_audit_caught,
          |  CASE WHEN n_audit_pairs = 0 THEN 1.0
          |       ELSE CAST(n_audit_caught AS DOUBLE) / CAST(n_audit_pairs AS DOUBLE) END
          |    AS recall_vs_audit
          |FROM nc CROSS JOIN nv CROSS JOIN na CROSS JOIN ng""".stripMargin),
    "dd_bucket_stats" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte,
        """bucket_sizes AS (
          |  SELECT band_no, band_key, CAST(count(*) AS BIGINT) AS n_docs
          |  FROM bands GROUP BY band_no, band_key
          |)""".stripMargin)(
        s"""SELECT band_no,
           |  CAST(count(*) AS BIGINT) AS n_buckets,
           |  max(n_docs) AS max_bucket,
           |  CAST(sum(CASE WHEN n_docs > ${DedupOps.MaxBucketDocs} THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
           |  CAST(sum(CASE WHEN n_docs > ${DedupOps.MaxBucketDocs} THEN n_docs ELSE 0 END) AS BIGINT) AS n_docs_dropped
           |FROM bucket_sizes GROUP BY band_no""".stripMargin),
    "dd_jaccard_candidates" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte,
        "sizes AS (SELECT doc_id, count(*) AS n FROM distinct_shingles GROUP BY doc_id)",
        """inter AS (
          |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          |  FROM cand c
          |  JOIN distinct_shingles sa ON sa.doc_id = c.doc_a
          |  JOIN distinct_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          |  GROUP BY c.doc_a, c.doc_b
          |)""".stripMargin)(
        """SELECT c.doc_a, c.doc_b,
          |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
          |  za.n AS n_a, zb.n AS n_b,
          |  CAST(coalesce(i.n_inter, 0) AS DOUBLE)
          |    / (za.n + zb.n - coalesce(i.n_inter, 0)) AS jaccard
          |FROM cand c
          |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          |JOIN sizes za ON za.doc_id = c.doc_a
          |JOIN sizes zb ON zb.doc_id = c.doc_b""".stripMargin),
    // the MinHash estimator replayed in SQL: matching mh components out of
    // NumHashes vs the exact shingle Jaccard on the same candidate pairs;
    // n_eq/NumHashes is an exact binary fraction, hash-stable cross-engine
    "dd_minhash_estimate" -> {
      val eqSum = (1 to DedupOps.NumHashes)
        .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte,
        "sizes AS (SELECT doc_id, count(*) AS n FROM distinct_shingles GROUP BY doc_id)",
        """inter AS (
          |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          |  FROM cand c
          |  JOIN distinct_shingles sa ON sa.doc_id = c.doc_a
          |  JOIN distinct_shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          |  GROUP BY c.doc_a, c.doc_b
          |)""".stripMargin)(
        s"""SELECT c.doc_a, c.doc_b,
           |  CAST($eqSum AS BIGINT) AS n_eq,
           |  CAST($eqSum AS DOUBLE) / ${DedupOps.NumHashes} AS jaccard_est,
           |  CAST(coalesce(i.n_inter, 0) AS DOUBLE)
           |    / (za.n + zb.n - coalesce(i.n_inter, 0)) AS jaccard_exact
           |FROM cand c
           |JOIN mh a ON a.doc_id = c.doc_a
           |JOIN mh b ON b.doc_id = c.doc_b
           |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
           |JOIN sizes za ON za.doc_id = c.doc_a
           |JOIN sizes zb ON zb.doc_id = c.doc_b""".stripMargin)
    },
    "dd_clusters" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes: _*)(
        "SELECT doc_id, cluster_id, is_canonical FROM clusters"),
    // same clusters chain; redundant = non-canonical members, left-joined
    // so dup-free sources report 0
    "dd_source_dup_rate" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes: _*)(
        """SELECT d.source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN c.doc_id IS NOT NULL AND NOT c.is_canonical
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_redundant,
          |  CAST(sum(CASE WHEN c.doc_id IS NOT NULL AND NOT c.is_canonical
          |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          |    AS dup_rate
          |FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
          |GROUP BY d.source""".stripMargin),
    // fuzzy decontamination: corpus docs colliding with a benchmark doc in
    // any LSH band, scored by the signature-estimated Jaccard
    "dd_fuzzy_decontam" -> {
      val eqSum = (1 to DedupOps.NumHashes)
        .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte,
        s"""fhits AS (
           |  SELECT DISTINCT cb.doc_id, bb.doc_id AS bench_id
           |  FROM bands cb JOIN bands bb
           |    ON bb.band_no = cb.band_no AND bb.band_key = cb.band_key
           |  WHERE NOT (cb.doc_id % ${DedupOps.FuzzyBenchMod} = 0
           |             AND cb.doc_id < ${DedupOps.FuzzyBenchCap})
           |    AND bb.doc_id % ${DedupOps.FuzzyBenchMod} = 0
           |    AND bb.doc_id < ${DedupOps.FuzzyBenchCap}
           |)""".stripMargin,
        s"""fz AS (
           |  SELECT h.doc_id, h.bench_id,
           |    CAST($eqSum AS DOUBLE) / ${DedupOps.NumHashes} AS jaccard_est
           |  FROM fhits h
           |  JOIN mh a ON a.doc_id = h.doc_id
           |  JOIN mh b ON b.doc_id = h.bench_id
           |)""".stripMargin,
        """fzr AS (
          |  SELECT doc_id, bench_id, jaccard_est,
          |    row_number() OVER (PARTITION BY doc_id
          |                       ORDER BY jaccard_est DESC, bench_id) AS rn,
          |    count(*) OVER (PARTITION BY doc_id) AS n_bench_hits
          |  FROM fz
          |)""".stripMargin)(
        s"""SELECT doc_id, CAST(n_bench_hits AS BIGINT) AS n_bench_hits,
           |  bench_id AS best_bench_id, jaccard_est,
           |  jaccard_est >= ${DedupOps.FuzzyContamMinEst} AS flagged
           |FROM fzr WHERE rn = 1""".stripMargin)
    },
    // leakage-safe splits: the h24-mod split rule keyed on the duplicate
    // cluster id (singletons fall back to their own doc_id)
    "tx_leak_safe_splits" -> {
      def splitSql(key: String): String =
        s"""CASE WHEN ${h24(s"'split:' || CAST($key AS VARCHAR)")} % 100
           |          < ${TextOps.SplitTrainPct} THEN 'train'
           |     WHEN ${h24(s"'split:' || CAST($key AS VARCHAR)")} % 100
           |          < ${TextOps.SplitValPct} THEN 'val'
           |     ELSE 'test' END""".stripMargin
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes :+
          """keyed AS (
            |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS split_key
            |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
            |)""".stripMargin: _*)(
        s"""SELECT doc_id, split_key,
           |  ${splitSql("split_key")} AS split,
           |  ${splitSql("doc_id")} AS naive_split,
           |  (${splitSql("split_key")}) <> (${splitSql("doc_id")}) AS moved
           |FROM keyed""".stripMargin)
    },
    "dd_cluster_stats" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes: _*)(
        """SELECT cluster_id, count(*) AS n_docs, count(*) - 1 AS n_droppable
          |FROM clusters GROUP BY cluster_id""".stripMargin),
    // the index is a pure layout move: the oracle is the direct
    // word-membership scan the index answers without touching `text`
    "tx_keyword_search" -> {
      val conds = TextOps.SearchTerms
        .map(t => s"list_contains(string_split(text, ' '), '$t')")
        .mkString("\n  AND ")
      s"SELECT doc_id FROM documents\nWHERE $conds"
    },
    // language mix: Gini-Simpson needs no logarithm - exact BIGINT sum of
    // squares, one division
    "tx_source_lang_mix" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  1.0 - CAST(sum(c * c) AS DOUBLE)
        |    / CAST(sum(c) * sum(c) AS DOUBLE) AS simpson_diversity
        |FROM c GROUP BY source""".stripMargin,
    // Heaps curve: "vocab at prefix n" collapses to min(doc_id) per token;
    // decile rollups + a 10-row cumulative window, exact BIGINTs
    "tx_heaps_curve" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |fs AS (
        |  SELECT token, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY token),
        |nt AS (
        |  SELECT (first_doc * 10) // n_docs AS decile,
        |         CAST(count(*) AS BIGINT) AS new_types
        |  FROM fs, n GROUP BY 1),
        |dd AS (
        |  SELECT (doc_id * 10) // n_docs AS decile,
        |         CAST(count(*) AS BIGINT) AS n_docs_in
        |  FROM documents, n GROUP BY 1)
        |SELECT dd.decile,
        |  CAST(sum(dd.n_docs_in) OVER (ORDER BY dd.decile) AS BIGINT)
        |    AS docs_seen,
        |  coalesce(nt.new_types, 0) AS new_types,
        |  CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY dd.decile)
        |    AS BIGINT) AS vocab_size
        |FROM dd LEFT JOIN nt ON nt.decile = dd.decile""".stripMargin,
    // KWIC snippets: first occurrence via list_position, edge-clipped
    // window as a 1-based inclusive list slice
    "tx_search_snippets" -> {
      val conds = TextOps.SearchTerms
        .map(t => s"list_contains(string_split(text, ' '), '$t')")
        .mkString("\n  AND ")
      val r = TextOps.SnippetRadius
      def one(t: String) =
        s"""SELECT doc_id, '$t' AS term,
           |  CAST(list_position(w, '$t') AS BIGINT) AS pos,
           |  array_to_string(
           |    w[greatest(list_position(w, '$t') - $r, 1):
           |      least(list_position(w, '$t') + $r, len(w))], ' ')
           |    AS snippet
           |FROM m""".stripMargin
      s"""WITH m AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE $conds)
         |${TextOps.SearchTerms.map(one).mkString("\nUNION ALL\n")}""".stripMargin
    },
    "tx_ranked_search" -> {
      val termList = TextOps.SearchTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH post AS (
         |  SELECT doc_id, word, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word IN ($termList)
         |  GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM post GROUP BY word),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_terms_hit,
         |    sum(CAST(round(tf * (CAST(n_docs AS DOUBLE) / df)
         |                   * ${TextOps.LogScale}.0, 0) AS BIGINT)) AS score_q
         |  FROM post JOIN dfreq USING (word), n
         |  GROUP BY doc_id)
         |SELECT doc_id, n_terms_hit,
         |  round(CAST(score_q AS DOUBLE) / ${TextOps.LogScale}.0, 6) AS score
         |FROM scored
         |ORDER BY score_q DESC, doc_id LIMIT ${TextOps.SearchTopK}""".stripMargin
    },
    // BM25 twin: rebuilt from the text; dl/avgdl and every constant are
    // spelled as the SAME double expressions Spark evaluates ((1.2 + 1),
    // (1 - 0.75)) so the exactly-rounded IEEE op sequence matches
    // bit-for-bit — no ln anywhere (see TextOps.bm25Search)
    "tx_bm25_search" -> {
      val termList = TextOps.SearchTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH dls AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM documents),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
         |          FROM dls),
         |post AS (
         |  SELECT doc_id, word, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word IN ($termList)
         |  GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM post GROUP BY word),
         |scored AS (
         |  SELECT p.doc_id, count(*) AS n_terms_hit,
         |    sum(CAST(round((((CAST(n_docs AS DOUBLE) / df) * (tf * (1.2 + 1))) /
         |        (tf + 1.2 * ((1 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
         |                   * ${TextOps.LogScale}.0, 0) AS BIGINT)) AS score_q
         |  FROM post p JOIN dfreq USING (word) JOIN dls USING (doc_id), stats
         |  GROUP BY p.doc_id)
         |SELECT doc_id, n_terms_hit,
         |  round(CAST(score_q AS DOUBLE) / ${TextOps.LogScale}.0, 6) AS score
         |FROM scored
         |ORDER BY score_q DESC, doc_id LIMIT ${TextOps.SearchTopK}""".stripMargin
    },
    // rational n_docs/df idf (two-op IEEE chain, bit-identical), raw-score
    // rank with term tie-break; the window twin of the TopKPerKeyExec cut
    "tx_keyphrases" ->
      s"""WITH tf AS (
         |  SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |  GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |    CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
         |      AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |                               ORDER BY score DESC, term) AS rk
         |  FROM scored)
         |SELECT doc_id, term, round(score, 6) AS score
         |FROM rk WHERE rk <= ${TextOps.KeyphraseK}""".stripMargin,
    // both searches' own result tables re-ranked on the 6dp-rounded
    // score (bit-identical cross-engine), full-outer doc join, k-depth
    // prefix agreements, the (1-p) complement spelled as a literal
    "tx_search_rbo" -> {
      val termList = TextOps.SearchTerms.map(t => s"'$t'").mkString(", ")
      val k = TextOps.SearchTopK
      s"""WITH dls AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM documents),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
         |          FROM dls),
         |post AS (
         |  SELECT doc_id, word, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE word IN ($termList)
         |  GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM post GROUP BY word),
         |tfidf AS (
         |  SELECT doc_id,
         |    round(CAST(score_q AS DOUBLE) / ${TextOps.LogScale}.0, 6) AS score
         |  FROM (
         |    SELECT doc_id,
         |      sum(CAST(round(tf * (CAST(n_docs AS DOUBLE) / df)
         |                     * ${TextOps.LogScale}.0, 0) AS BIGINT)) AS score_q
         |    FROM post JOIN dfreq USING (word), stats
         |    GROUP BY doc_id)
         |  ORDER BY score_q DESC, doc_id LIMIT $k),
         |bm25 AS (
         |  SELECT doc_id,
         |    round(CAST(score_q AS DOUBLE) / ${TextOps.LogScale}.0, 6) AS score
         |  FROM (
         |    SELECT p.doc_id,
         |      sum(CAST(round((((CAST(n_docs AS DOUBLE) / df) * (tf * (1.2 + 1))) /
         |          (tf + 1.2 * ((1 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
         |                     * ${TextOps.LogScale}.0, 0) AS BIGINT)) AS score_q
         |    FROM post p JOIN dfreq USING (word) JOIN dls USING (doc_id), stats
         |    GROUP BY p.doc_id)
         |  ORDER BY score_q DESC, doc_id LIMIT $k),
         |r1 AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS r1 FROM tfidf),
         |r2 AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY score DESC, doc_id) AS r2 FROM bm25),
         |joined AS (SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id, r1.r1, r2.r2
         |           FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id),
         |depths AS (SELECT unnest(generate_series(1, $k)) AS d),
         |ag AS (
         |  SELECT d, CAST(count(j.doc_id) AS BIGINT) AS a_d
         |  FROM depths LEFT JOIN joined j ON j.r1 <= d AND j.r2 <= d
         |  GROUP BY d)
         |SELECT CAST($k AS BIGINT) AS depth_k,
         |  max(CASE WHEN d = $k THEN a_d END) AS overlap_at_k,
         |  round((${TextOps.RboOneMinusP}::DOUBLE) *
         |    (CAST(sum(CAST(round((([${
        TextOps.RboPowers.map(p => s"$p::DOUBLE").mkString(", ")}][d]) *
         |      (CAST(a_d AS DOUBLE) / CAST(d AS DOUBLE))) *
         |      (1000000000000.0::DOUBLE), 0) AS BIGINT)) AS DOUBLE) /
         |      (1000000000000.0::DOUBLE)), 6) AS rbo
         |FROM ag""".stripMargin
    },
    "tx_bpe_merges" -> {
      val parts = (1 to TextOps.BpeRounds).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS round, lhs, rhs, lhs || rhs AS merged,
           |  cnt AS pair_count FROM bb$r""".stripMargin
      }
      bpeCtes + "\n" + parts.mkString("\nUNION ALL\n")
    },
    "tx_bpe_encode" ->
      s"""$bpeCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) dw
         |JOIN (SELECT word,
         |        CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_syms
         |      FROM bs${TextOps.BpeRounds}) wt USING (word)
         |GROUP BY doc_id""".stripMargin,
    // tokenizer fertility per language: same word->n_syms join as
    // tx_bpe_encode, rolled up by lang; the divisions are single exact
    // BIGINT ratios
    "tx_bpe_fertility" ->
      s"""$bpeCtes
         |SELECT lang, n_words, n_bpe_tokens, n_chars,
         |  CAST(n_bpe_tokens AS DOUBLE) / n_words AS fertility,
         |  CAST(n_chars AS DOUBLE) / n_bpe_tokens AS chars_per_token
         |FROM (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
         |    CAST(sum(length(word)) AS BIGINT) AS n_chars
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
         |        FROM documents) dw
         |  JOIN (SELECT word,
         |          CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_syms
         |        FROM bs${TextOps.BpeRounds}) wt USING (word)
         |  GROUP BY lang)""".stripMargin,
    // single-space word separation makes the padded-substring test exactly
    // the consecutive-words test the positional index answers
    "tx_phrase_search" ->
      s"""SELECT doc_id FROM documents
         |WHERE ' ' || text || ' ' LIKE '% ${TextOps.SearchPhrase.mkString(" ")} %'""".stripMargin,
    "dd_canonical_quality" ->
      Oracle.withRecursiveCtes(
        Seq(shinglesCte, distinctShinglesCte, mhCte, bandsCte, candCte)
          ++ clusterCtes :+ scoredCte: _*)(
        """SELECT doc_id, cluster_id, quality_score,
          |  row_number() OVER (PARTITION BY cluster_id
          |    ORDER BY quality_score DESC, doc_id) = 1 AS is_best
          |FROM clusters JOIN scored USING (doc_id)""".stripMargin),
    "dd_simhash" -> (simhashBase + "\nSELECT doc_id, simhash FROM sig"),
    "dd_simhash_groups" -> (simhashBase + """
      |SELECT simhash, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM sig GROUP BY simhash HAVING count(*) > 1""".stripMargin),
    "dd_simhash_neighbors" -> {
      val bandRows = (0 until DedupOps.SimhashBands)
        .map(b => s"($b)").mkString(",")
      simhashBase + s""",
        |bands AS (
        |  SELECT doc_id, simhash, b.band_no,
        |         (simhash >> (b.band_no * ${DedupOps.SimhashBandBits}))
        |           & ${(1L << DedupOps.SimhashBandBits) - 1} AS band_val
        |  FROM sig, (VALUES $bandRows) AS b(band_no)
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.simhash, c.simhash)) AS INT) AS hamming
        |  FROM bands a JOIN bands c
        |    ON a.band_no = c.band_no AND a.band_val = c.band_val
        |  WHERE a.doc_id < c.doc_id)
        |WHERE hamming BETWEEN 1 AND 3""".stripMargin
    },
    "dd_embedding_neardups" ->
      s"""$srpBucketCtes
         |SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b,
         |  round(list_dot_product(a.e, c.e) /
         |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
         |    AS cosine
         |FROM b a JOIN b c ON a.t = c.t AND a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE round(list_dot_product(a.e, c.e) /
         |    (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
         |  >= 0.30""".stripMargin,
    // same SRP collision graph, per-vector top-k instead of a threshold
    "sim_srp_knn_join" ->
      s"""$srpBucketCtes,
         |cand AS (
         |  SELECT DISTINCT a.vec_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(a.e, c.e) /
         |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
         |      AS cosine
         |  FROM b a JOIN b c
         |    ON a.t = c.t AND a.bucket = c.bucket AND a.vec_id <> c.vec_id
         |)
         |SELECT vec_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT vec_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY vec_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM cand)
         |WHERE rank <= ${DedupOps.KnnJoinK}""".stripMargin,
    // Efraimidis–Spirakis replay: same dyadic-rational u, same ln-domain
    // key, same (key desc, doc_id) cut
    "tx_weighted_sample" -> {
      val u = s"(${h24("'wsample:' || CAST(doc_id AS VARCHAR)")} + 0.5) / 16777216.0"
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE n_chars > 0
         |ORDER BY ln($u) / n_chars DESC, doc_id
         |LIMIT ${TextOps.WSampleK}""".stripMargin
    },
    "tx_vocab" ->
      s"""WITH stats AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS tf,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |        FROM documents)
         |  GROUP BY token)
         |SELECT token, tf, df,
         |  CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT) AS id
         |FROM stats
         |QUALIFY id < ${TextOps.VocabSize}""".stripMargin,
    // parallel unnests zip (token, pos); list(… ORDER BY pos) rebuilds
    // document order — the twin of sort_array over (pos, id) structs
    "tx_doc_encode" ->
      s"""WITH stats AS (
         |  SELECT token, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |        FROM documents)
         |  GROUP BY token),
         |vocab AS (
         |  SELECT token,
         |    CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT) AS id
         |  FROM stats
         |  QUALIFY id < ${TextOps.VocabSize}),
         |pos AS (
         |  SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS token,
         |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
         |  FROM documents)
         |SELECT doc_id,
         |  array_to_string(list(coalesce(id, CAST(-1 AS BIGINT)) ORDER BY p),
         |                  ' ') AS ids,
         |  CAST(count(*) AS BIGINT) AS n_tokens
         |FROM pos LEFT JOIN vocab USING (token)
         |GROUP BY doc_id""".stripMargin,
    // anchored log kernel: log2 is the DetLog deterministic chain (no
    // libm), quantized to the 1e12 grid, so the c·l2q sums are exact
    // BIGINTs and the emission is one mirrored IEEE division chain
    "tx_token_entropy" ->
      s"""WITH c AS (
         |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |        FROM documents)
         |  GROUP BY doc_id, token),
         |q AS (
         |  SELECT doc_id, c,
         |    CAST(round(${graft.functions.DetLog.log2Sql("c")} *
         |      (1000000000000.0::DOUBLE), 0) AS BIGINT) AS l2q
         |  FROM c),
         |a AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         |    CAST(sum(c * l2q) AS BIGINT) AS sclq
         |  FROM q GROUP BY doc_id)
         |SELECT doc_id, n,
         |  round(CAST(CAST(round(${graft.functions.DetLog.log2Sql("n")} *
         |      (1000000000000.0::DOUBLE), 0) AS BIGINT) * n - sclq AS DOUBLE) /
         |    (CAST(n AS DOUBLE) * (1000000000000.0::DOUBLE)), 6) AS entropy
         |FROM a""".stripMargin,
    // the oracle is the UNFILTERED exact all-pairs join — proving the
    // prefix filter's recall is 1.0, not just that the verify step agrees
    "dd_prefix_jaccard" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM toks a JOIN toks b
         |    ON a.token = b.token AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_inter, na.n AS n_a, nb.n AS n_b,
         |  CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter) AS jaccard
         |FROM inter
         |JOIN sizes na ON doc_a = na.doc_id
         |JOIN sizes nb ON doc_b = nb.doc_id
         |WHERE n_inter * ${DedupOps.PpjNum + DedupOps.PpjDen}
         |      >= (na.n + nb.n) * ${DedupOps.PpjNum}""".stripMargin,
    // replays prefixJaccard's set-collapse + (df, token) ranking exactly:
    // string_agg ORDER BY token = sort_array, md5 hex matches Spark's,
    // row_number ties are broken by the unique-per-doc token, and every
    // stat is integer arithmetic (sums re-cast: DuckDB sum(BIGINT) is
    // HUGEINT)
    "dd_ppj_stats" ->
      s"""WITH toks0 AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |sets AS (
         |  SELECT doc_id, count(*) AS n,
         |         md5(string_agg(token, ' ' ORDER BY token)) AS h
         |  FROM toks0 GROUP BY doc_id),
         |grp AS (SELECT h, min(doc_id) AS rep, count(*) AS sz
         |        FROM sets GROUP BY h),
         |rt AS (SELECT g.rep AS doc_id, t.token
         |       FROM grp g JOIN toks0 t ON t.doc_id = g.rep),
         |dfx AS (SELECT token, count(*) AS df FROM rt GROUP BY token),
         |ranked AS (
         |  SELECT doc_id, t.token,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY df, t.token) AS r,
         |    count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM rt t JOIN dfx USING (token)),
         |prefix AS (
         |  SELECT * FROM ranked
         |  WHERE r <= n - ((n * ${DedupOps.PpjNum} + ${DedupOps.PpjDen - 1})
         |                  // ${DedupOps.PpjDen}) + 1),
         |post AS (SELECT token, count(*) AS c FROM prefix GROUP BY token)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM sets) AS n_docs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM grp) AS n_groups,
         |  (SELECT CAST(max(sz) AS BIGINT) FROM grp) AS max_clique,
         |  (SELECT CAST(sum(sz * (sz - 1) // 2) AS BIGINT) FROM grp) AS intra_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM post) AS n_prefix_tokens,
         |  (SELECT CAST(max(c) AS BIGINT) FROM post) AS max_posting,
         |  (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM post) AS cand_upper""".stripMargin,
    // batch (odd ids) bands joined to index (even ids) bands — the
    // asymmetric candidate join — then exact Jaccard with the integer
    // 3·|∩| >= |A|+|B| half cut; guard replay unneeded (no bucket nears
    // the cap at this SF — same argument as dd_minhash_candidates)
    // the persisted MinHash index's recorded provenance: two appends whose
    // row metrics equal the per-parity band counts, then the band-key-
    // clustered compaction rewriting every band row (dd_incremental_tx
    // itself SHARES dd_incremental's oracle — see `oracles` below)
    "xacid_dedup_index" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte)(
        """SELECT CAST(0 AS BIGINT) AS version, 'index_batch0' AS op,
          |  (SELECT count(*) FROM bands WHERE doc_id % 2 = 0) AS rows_written
          |UNION ALL
          |SELECT CAST(1 AS BIGINT), 'index_batch1',
          |  (SELECT count(*) FROM bands WHERE doc_id % 2 = 1)
          |UNION ALL
          |SELECT CAST(2 AS BIGINT), 'compact',
          |  (SELECT count(*) FROM bands)""".stripMargin),
    // the data-skipping correctness contract: the file-pruned readWhere
    // probe must see EXACTLY the rows a full-scan filter sees (the skip
    // COUNT itself is asserted by AcidSpec — it is physical, invisible in
    // the result by design)
    "xacid_pruned_scan" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte)(
        s"""SELECT band_no, CAST(count(*) AS BIGINT) AS n_entries,
           |  CAST(count(DISTINCT band_key) AS BIGINT) AS n_buckets,
           |  min(band_key) AS min_key, max(band_key) AS max_key
           |FROM bands WHERE band_no = ${DedupOps.ProbeBand}
           |GROUP BY band_no""".stripMargin),
    // the bloom-pruned point probe must see EVERY occurrence of the key
    // across ALL bands — a filter that false-negatives (or a prover that
    // over-prunes) loses rows here and hash-mismatches
    "xacid_bloom_scan" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte)(
        s"""SELECT band_key, CAST(count(*) AS BIGINT) AS n_entries,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(min(band_no) AS BIGINT) AS min_band,
           |  CAST(max(band_no) AS BIGINT) AS max_band
           |FROM bands
           |WHERE band_key = (SELECT min(band_key) FROM bands
           |                  WHERE band_no = ${DedupOps.ProbeBand})
           |GROUP BY band_key""".stripMargin),
    "dd_incremental" ->
      Oracle.withCtes(shinglesCte, distinctShinglesCte, mhCte, bandsCte,
        """icand AS (
          |  SELECT DISTINCT b.doc_id AS batch_doc, i.doc_id AS index_doc
          |  FROM bands b JOIN bands i
          |    ON b.band_no = i.band_no AND b.band_key = i.band_key
          |  WHERE b.doc_id % 2 = 1 AND i.doc_id % 2 = 0
          |)""".stripMargin,
        "sizes AS (SELECT doc_id, count(*) AS n FROM distinct_shingles GROUP BY doc_id)",
        """iinter AS (
          |  SELECT c.batch_doc, c.index_doc, count(*) AS n_inter
          |  FROM icand c
          |  JOIN distinct_shingles sa ON sa.doc_id = c.batch_doc
          |  JOIN distinct_shingles sb ON sb.doc_id = c.index_doc
          |    AND sb.shingle = sa.shingle
          |  GROUP BY c.batch_doc, c.index_doc
          |)""".stripMargin)(
        """SELECT i.batch_doc, i.index_doc,
          |  CAST(i.n_inter AS BIGINT) AS n_inter,
          |  za.n AS n_batch, zb.n AS n_index,
          |  CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) AS jaccard
          |FROM iinter i
          |JOIN sizes za ON za.doc_id = i.batch_doc
          |JOIN sizes zb ON zb.doc_id = i.index_doc
          |WHERE i.n_inter * 3 >= za.n + zb.n""".stripMargin),
    // parallel unnests zip (p, gram); the position explode replays after
    // the duplicate join, mirroring the Spark plan's bounded blow-up
    "dd_dup_spans" -> {
      val n = DedupOps.DupSpanN
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |base AS (
         |  SELECT doc_id, len(w) AS n_tokens FROM w WHERE len(w) >= $n),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(w) - ${n - 1})) AS p,
         |    unnest(list_transform(range(0, len(w) - ${n - 1}),
         |      i -> array_to_string(list_slice(w, i + 1, i + $n), ' '))) AS g
         |  FROM w WHERE len(w) >= $n),
         |dup AS (
         |  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT doc_id, unnest(range(p, p + $n)) AS pos
         |    FROM grams JOIN dup USING (g))),
         |cnt AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_pos
         |  FROM cov GROUP BY doc_id)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  coalesce(cnt.n_dup_pos, 0) AS n_dup_pos,
         |  round(CAST(coalesce(cnt.n_dup_pos, 0) AS DOUBLE)
         |        / CAST(b.n_tokens AS DOUBLE), 6) AS dup_frac
         |FROM base b LEFT JOIN cnt USING (doc_id)""".stripMargin
    },
    // span removal: same grams/dup/cov pipeline as dd_dup_spans, then the
    // text rebuilt from the uncovered positions in order
    "dd_span_removal" -> {
      val n = DedupOps.DupSpanN
      s"""WITH w AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |base AS (
         |  SELECT doc_id, w, len(w) AS n_tokens FROM w WHERE len(w) >= $n),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(w) - ${n - 1})) AS p,
         |    unnest(list_transform(range(0, len(w) - ${n - 1}),
         |      i -> array_to_string(list_slice(w, i + 1, i + $n), ' '))) AS g
         |  FROM w WHERE len(w) >= $n),
         |dup AS (
         |  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos FROM (
         |    SELECT doc_id, unnest(range(p, p + $n)) AS pos
         |    FROM grams JOIN dup USING (g))),
         |toks AS (
         |  SELECT doc_id, unnest(range(0, len(w))) AS pos,
         |    unnest(w) AS tok
         |  FROM base),
         |kept AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    string_agg(t.tok, ' ' ORDER BY t.pos) AS cleaned
         |  FROM toks t LEFT JOIN cov c
         |    ON c.doc_id = t.doc_id AND c.pos = t.pos
         |  WHERE c.doc_id IS NULL
         |  GROUP BY t.doc_id)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(b.n_tokens AS BIGINT) - coalesce(k.n_kept, 0) AS n_removed,
         |  coalesce(k.cleaned, '') AS cleaned
         |FROM base b LEFT JOIN kept k USING (doc_id)""".stripMargin
    },
    // lead() over (doc_id, p) rebuilds the same adjacent bigrams the Spark
    // side takes from the word array; same add-one smoothing, same
    // -sum/count association, same 6-dp rounding
    "tx_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
        |  FROM toks
        |  QUALIFY w2 IS NOT NULL),
        |model AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        |ctx AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
        |voc AS (SELECT count(DISTINCT w) AS v FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(-sum(log2(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)))
        |        / CAST(count(*) AS DOUBLE), 6) AS nll_bits
        |FROM bi JOIN model USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN voc
        |GROUP BY doc_id""".stripMargin,
    // same lm CTE chain, then pure BIGINT rank-inequality terciles per
    // language; bucket mean = exact decimal sum / exact count, one IEEE
    // division
    "tx_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
        |  FROM toks
        |  QUALIFY w2 IS NOT NULL),
        |model AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        |ctx AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
        |voc AS (SELECT count(DISTINCT w) AS v FROM toks),
        |scores AS (
        |  SELECT doc_id,
        |    round(-sum(log2(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)))
        |          / CAST(count(*) AS DOUBLE), 6) AS nll_bits
        |  FROM bi JOIN model USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN voc
        |  GROUP BY doc_id),
        |ranked AS (
        |  SELECT d.lang, s.nll_bits,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY s.nll_bits, s.doc_id) AS rk,
        |    count(*) OVER (PARTITION BY d.lang) AS n
        |  FROM scores s JOIN documents d USING (doc_id))
        |SELECT lang,
        |  CASE WHEN rk * 3 <= n THEN 'head'
        |       WHEN rk * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs,
        |  min(nll_bits) AS min_nll, max(nll_bits) AS max_nll,
        |  CAST(sum(CAST(nll_bits AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS mean_nll
        |FROM ranked GROUP BY 1, 2""".stripMargin,
    // two IRLS steps with the softsign link, 9-dp decimal-anchored sums,
    // and the identical Cramer chain (see TextOps.qualityClassifier)
    "tx_quality_classifier" -> {
      def stepCtes(n: Int, tSel: String) =
        s"""e$n AS (
           |  SELECT y, x1, x2, t, 0.5 + 0.5 * t / (1.0 + abs(t)) AS p
           |  FROM (SELECT y, x1, x2, $tSel AS t FROM ${if (n == 1) "f" else "f CROSS JOIN bta1"})),
           |w$n AS (
           |  SELECT y, x1, x2,
           |    p * (1.0 - p) AS wgt,
           |    t + (y - p) / (p * (1.0 - p)) AS z
           |  FROM e$n),
           |a$n AS (
           |  SELECT
           |    CAST(sum(CAST(round(wgt, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s00,
           |    CAST(sum(CAST(round(wgt * x1, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s01,
           |    CAST(sum(CAST(round(wgt * x2, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s02,
           |    CAST(sum(CAST(round(wgt * x1 * x1, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s11,
           |    CAST(sum(CAST(round(wgt * x1 * x2, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s12,
           |    CAST(sum(CAST(round(wgt * x2 * x2, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s22,
           |    CAST(sum(CAST(round(wgt * z, 9) AS DECIMAL(38,9))) AS DOUBLE) AS b0,
           |    CAST(sum(CAST(round(wgt * x1 * z, 9) AS DECIMAL(38,9))) AS DOUBLE) AS b1,
           |    CAST(sum(CAST(round(wgt * x2 * z, 9) AS DECIMAL(38,9))) AS DOUBLE) AS b2
           |  FROM w$n),
           |bta$n AS (
           |  SELECT
           |    (b0 * (s11 * s22 - s12 * s12) - s01 * (b1 * s22 - s12 * b2) +
           |     s02 * (b1 * s12 - s11 * b2)) /
           |    (s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
           |     s02 * (s01 * s12 - s11 * s02)) AS beta0,
           |    (s00 * (b1 * s22 - s12 * b2) - b0 * (s01 * s22 - s12 * s02) +
           |     s02 * (s01 * b2 - b1 * s02)) /
           |    (s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
           |     s02 * (s01 * s12 - s11 * s02)) AS beta1,
           |    (s00 * (s11 * b2 - b1 * s12) - s01 * (s01 * b2 - b1 * s02) +
           |     b0 * (s01 * s12 - s11 * s02)) /
           |    (s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
           |     s02 * (s01 * s12 - s11 * s02)) AS beta2
           |  FROM a$n)""".stripMargin
      s"""WITH f AS (
         |  SELECT
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |    CAST(${hitsSql(TextFunctions.LangProfiles.head._2)} AS DOUBLE)
         |      / len(string_split(text, ' ')) AS x1,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS x2
         |  FROM documents),
         |${stepCtes(1, "0.0")},
         |${stepCtes(2, "beta0 + beta1 * x1 + beta2 * x2")},
         |m AS (
         |  SELECT beta0, beta1, beta2,
         |    count(*) AS n_docs,
         |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(sum(CASE WHEN y = 1.0 AND beta0 + beta1 * x1 + beta2 * x2 > 0.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN y = 0.0 AND beta0 + beta1 * x1 + beta2 * x2 > 0.0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN y = 1.0 AND NOT (beta0 + beta1 * x1 + beta2 * x2 > 0.0)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN y = 0.0 AND NOT (beta0 + beta1 * x1 + beta2 * x2 > 0.0)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM f CROSS JOIN bta2
         |  GROUP BY beta0, beta1, beta2)
         |SELECT beta0, beta1, beta2, n_docs, n_pos, tp, fp, fn, tn,
         |  CAST(tp + tn AS DOUBLE) / CAST(n_docs AS DOUBLE) AS accuracy
         |FROM m""".stripMargin
    },
  )

  /** The persisted-index incremental run must reproduce the one-shot
    * recompute bit-for-bit: `dd_incremental_tx` (TxTable snapshot read at
    * v0) SHARES `dd_incremental`'s oracle SQL, so the driver's hash
    * compare IS the equivalence proof (VERDICT r9 #8). `dd_incremental_cdf`
    * (r12) joins the same equivalence class with the batch sourced from
    * the index's CHANGE FEED — three routes, one oracle.
    */
  val oracles: Map[String, String] =
    baseOracles + ("dd_incremental_tx" -> baseOracles("dd_incremental")) +
      ("dd_incremental_cdf" -> baseOracles("dd_incremental"))

  private def stopSeq: Seq[String] = TextFunctions.LangProfiles.head._2

  /** Shared WITH-prefix for the simhash family (wh → sv → sig CTEs). */
  private def simhashBase: String = {
    val votes = (0 until DedupOps.SimhashBits)
      .map(b => s"    CAST(sum(((h >> $b) & 1) * 2 - 1) AS BIGINT) AS v$b")
      .mkString(",\n")
    val sig = (0 until DedupOps.SimhashBits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH wh AS (
       |  SELECT doc_id, ${Oracle.h48("word")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |), sv AS (
       |  SELECT doc_id,
       |$votes
       |  FROM wh GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM sv
       |)""".stripMargin
  }
}
