package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: times every SparkEntry query (count() latency) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Three explicitly separated phases, each timed and reported under
  * `"phases"` so regressions are attributable:
  *  - warmup: flagship query + fixture-table derivation (JVM/codegen/parquet
  *    footer costs);
  *  - stage: one-time training/staging work — corpus-scale derived tables
  *    written to tmp parquet (shingles, minhash signatures/candidates,
  *    duplicate clusters, k-means centroids + assignments, z2 layout) and
  *    the format exports. These run once per session, exactly as they would
  *    at 100 TB; a query's timing must never include them. Each item is
  *    timed INDIVIDUALLY (`stage_detail` in the detail JSON) so a staging
  *    regression — 48 s of a ~120 s bench — is attributable, not a lump
  *    (VERDICT r7 #1);
  *  - queries: per-query steady-state `count()` — what `"total"` sums.
  *    Exception: the media-decode family runs through `toRdd.count()` so
  *    its rows time the codec rather than a column-pruned scan (see
  *    [[Bench.ForceMaterialize]]).
  *
  * Timing discipline (VERDICT r7 #2): a single sample has no defense
  * against transient JVM/GC/page-cache interference in a shared sandbox
  * (the r4 driver run held nine 5–34x spikes), and back-to-back best-of-2
  * fails when both samples land in one contention window (r7:
  * `dd_incremental` 5.96 s driver vs 1.16 s same-binary). So: two timing
  * passes INTERLEAVED across the whole suite (pass 1 all queries, then
  * pass 2 all queries — minutes apart per query), plus a third sample for
  * any query whose two samples disagree by >3x. The min is reported (every
  * run executes the full plan; count() caches nothing).
  *
  * A failing query is reported as a FAILURE (-1 + error entry), never as
  * its fast crash latency — the r6 bench "timed" 64 analysis-failing
  * queries at ~0.05 s each, silently faking a 4.6x speedup. A query that
  * fails on only SOME samples is surfaced in `flaky` (ADVICE r7): a
  * once-in-two failure is a finding, not a clean success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.silenceBenignWarnings()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case NonFatal(_) => }
      (System.nanoTime() - t0) / 1e9
    }

    val warmupSec = timed {
      SparkEntry.entry(spark).count()
      Tables.materializeDerived(spark, sfDir)
    }

    // --- stage phase: each item individually timed and failure-isolated ---
    import operators._
    val stageItems: Seq[(String, () => Unit)] = Seq(
      "dd_minhash_candidates" -> (() => DedupOps.minhashCandidates(spark, sfDir).count(): Unit),
      "dd_clusters"           -> (() => DedupOps.duplicateClusters(spark, sfDir).count(): Unit),
      "dd_ppj_sets"           -> (() => DedupOps.ppjSets(spark, sfDir).count(): Unit),
      "dd_ppj_prefix"         -> (() => DedupOps.ppjPrefix(spark, sfDir).count(): Unit),
      "dd_rare_posting"       -> (() => DedupOps.rarePosting(spark, sfDir).count(): Unit),
      "dd_ngram_overlap"      -> (() => DedupOps.ngramJaccard(spark, sfDir).count(): Unit),
      "dd_simhash"            -> (() => DedupOps.simhash(spark, sfDir).count(): Unit),
      "dd_srp_buckets"        -> (() => DedupOps.srpBucketTable(spark, sfDir).count(): Unit),
      "dd_edit1_pairs"        -> (() => DedupOps.edit1Pairs(spark, sfDir).count(): Unit),
      "tx_bpe_word_freq"      -> (() => TextOps.bpeWordFreq(spark, sfDir).count(): Unit),
      "tx_lm_scores"          -> (() => TextOps.lmScores(spark, sfDir).count(): Unit),
      "tx_bpe_train"          -> (() => TextOps.bpeFinalSyms(spark, sfDir).count(): Unit),
      "sim_centroids"         -> (() => SimilarityOps.centroids(spark, sfDir).count(): Unit),
      "sim_kmeans_assign"     -> (() => SimilarityOps.kmeansAssignments(spark, sfDir).count(): Unit),
      "sim_kmeans_layout"     -> (() => SimilarityOps.kmeansLayout(spark, sfDir).count(): Unit),
      "sim_quantized"         -> (() => SimilarityOps.quantizedEmbeddings(spark, sfDir).count(): Unit),
      "sim_pca_direction"     -> (() => SimilarityOps.pcaPowerProjection(spark, sfDir).limit(1).count(): Unit),
      "sim_pq_codes"          -> (() => SimilarityOps.pqCodes(spark, sfDir).count(): Unit),
      "tx_inverted_index"     -> (() => TextOps.invertedIndex(spark, sfDir).count(): Unit),
      "geo_z2_layout"         -> (() => GeoOps.z2Layout(spark, sfDir).count(): Unit),
      "geo_tx_zorder"         -> (() => GeoOps.geoTxTable(spark, sfDir): Unit),
      "geo_z3_layout"         -> (() => GeoOps.z3Layout(spark, sfDir).count(): Unit),
      "geo_sym_edges"         -> (() => GeoOps.symEdges(spark, sfDir).count(): Unit),
      "geo_cc_labels"         -> (() => GeoOps.ccLabels(spark, sfDir).count(): Unit),
      "bucketed_orders"       -> (() => Tables.bucketedOrders(spark, sfDir).count(): Unit),
      "bucketed_lineitem"     -> (() => Tables.bucketedLineitem(spark, sfDir).count(): Unit),
      "mv_incremental"        -> (() => ScaleOps.incrementalMonthlyOrders(spark, sfDir).count(): Unit),
      "sorted_orders"         -> (() => ScaleOps.sortedOrdersLayout(spark, sfDir).count(): Unit),
      "zordered_orders"       -> (() => ScaleOps.zorderedOrdersLayout(spark, sfDir).count(): Unit),
      "dd_minhash_index_tx"   -> (() => DedupOps.minhashIndexTx(spark, sfDir): Unit),
      "md_png_payloads"       -> (() => MediaOps.pngPayloads(spark, sfDir).count(): Unit),
      "md_qoi_payloads"       -> (() => MediaOps.qoiPayloads(spark, sfDir).count(): Unit),
      "md_flac_payloads"      -> (() => MediaOps.flacPayloads(spark, sfDir).count(): Unit),
      "md_gzip_payloads"      -> (() => MediaOps.gzipPayloads(spark, sfDir).count(): Unit),
      "md_gzip_concat_payloads" -> (() => MediaOps.gzipConcatPayloads(spark, sfDir).count(): Unit),
      "acid_txtable"          -> (() => AcidOps.ordersTxTable(spark, sfDir): Unit),
      "acid_txn_sink"         -> (() => AcidOps.txnSinkTable(spark, sfDir): Unit),
      "acid_evo"              -> (() => AcidOps.evoTable(spark, sfDir): Unit),
      "acid_skip"             -> (() => AcidOps.skipTable(spark, sfDir): Unit),
      "acid_mor"              -> (() => AcidOps.morTable(spark, sfDir): Unit),
      "acid_sqldml"           -> (() => AcidOps.sqlDmlTable(spark, sfDir): Unit),
      "acid_sqlmerge"         -> (() => AcidOps.sqlMergeTable(spark, sfDir): Unit),
      "acid_sqlmfull"         -> (() => AcidOps.sqlMergeFullTable(spark, sfDir): Unit),
      "acid_sqlover"          -> (() => AcidOps.sqlOverwriteTable(spark, sfDir): Unit),
      "acid_restore"          -> (() => AcidOps.restoreTable(spark, sfDir): Unit),
      "fmt_avro"              -> (() => sources.Formats.avroRoundtrip(spark, sfDir).count(): Unit),
      "fmt_exports"           -> (() => sources.Formats.stageAll(spark, sfDir)))
    // Dev loop (the 100x deep-point runs): SPARK_GRAFT_STAGE_ONLY=a,b
    // stages just those items; "none" (matching no item) skips staging
    // entirely for query subsets that scan the corpus directly. Unset =
    // full stage phase (the driver path, unchanged).
    val stageOnly = sys.env.get("SPARK_GRAFT_STAGE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val stageTop: Seq[(String, Double)] = stageItems
      .filter { case (n, _) => stageOnly.forall(_.contains(n)) }
      .map { case (n, f) => n -> timed(f()) }
    // phase total sums only top-level items; the dot-keyed sub-steps below
    // are attribution INSIDE acid_txtable, not additional work
    val stageSec = stageTop.map(_._2).sum
    // split the 4-version mutation-history build into its commit steps so
    // a regression in one mutation kind is visible (VERDICT r8 #7)
    val stageDetail: Seq[(String, Double)] = stageTop.flatMap {
      case ("acid_txtable", t) =>
        ("acid_txtable", t) +: AcidOps.buildSteps(spark, sfDir)
          .map { case (s, ts) => (s"acid_txtable.$s", ts) }
      case other => Seq(other)
    }

    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // `count()` lets the optimizer prune every column off a pure
        // projection — for the media-decode family that timed the SCAN, not
        // the codec (the r10 caveat). Those rows execute the UNMODIFIED plan
        // via toRdd, which materializes every output column (the decode
        // expressions run on every payload); everything else keeps count()
        // so round-over-round totals stay comparable. Re-baseline note: from
        // r11 the md_* rows include codec cost (~2.4x the pruned scan at the
        // 100x corpus per CountCheck; noise-level at sf0.1).
        if (ForceMaterialize(name)) df.queryExecution.toRdd.count() else df.count()
        Right((System.nanoTime() - t0) / 1e9)
      }
      catch { case NonFatal(e) =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
    }
    // Dev loop: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // interleaved passes: each query's two samples are a full suite apart
    val pass1 = named.map { case (name, fn) => timeOnce(name, fn) }
    val pass2 = named.map { case (name, fn) => timeOnce(name, fn) }
    val samples: Seq[(String, Seq[Either[String, Double]])] =
      named.lazyZip(pass1).lazyZip(pass2).map { case ((name, fn), a, b) =>
        val twoOk = Seq(a, b).collect { case Right(t) => t }
        val needThird = (a.isLeft != b.isLeft) || // mixed outcome: arbitrate
          (twoOk.size == 2 && twoOk.max / math.max(twoOk.min, 1e-9) > 3.0)
        name -> (if (needThird) Seq(a, b, timeOnce(name, fn)) else Seq(a, b))
      }
    val results = samples.map { case (name, ss) =>
      val ok = ss.collect { case Right(t) => t }
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val errors = samples.collect {
      case (name, ss) if ss.forall(_.isLeft) =>
        name -> ss.head.swap.getOrElse("?")
    }
    // flaky: failed on >=1 sample but succeeded on another (ADVICE r7)
    val flaky = samples.collect {
      case (name, ss) if ss.exists(_.isLeft) && ss.exists(_.isRight) =>
        name -> ss.collectFirst { case Left(e) => e }.getOrElse("?")
    }
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0

    // degeneracy monitors -> operational warnings (VERDICT r7 #6)
    val warnings =
      if (only.isEmpty) Monitors.warnings(spark, sfDir) else Seq.empty

    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val phases =
      s"""{"warmup":${r3(warmupSec)},"stage":${r3(stageSec)},"queries":${r3(total)}}"""
    // The driver keeps only the LAST 2000 chars of this process's output (the
    // r1-r4 BENCH artifacts all show `parsed: null` with the JSON line
    // truncated at the front — the full per-query map overflowed the tail).
    // So: full per-query detail goes to a FILE, and the printed line carries
    // a fixed headline subset + the detail path, sized well under the window.
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def smap(rs: Seq[(String, String)]): String =
      rs.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val warnJson = warnings.map(jstr).mkString("[", ",", "]")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    // A STAGE_ONLY-restricted run can skip a staged table some BENCH_ONLY
    // query depends on; the memoized build then lands inside that query's
    // first timed sample. Tag such runs in the artifact so a deep-point
    // timing is never mistaken for a clean steady-state number (ADVICE r10).
    val restricted =
      if (stageOnly.isEmpty && only.isEmpty) ""
      else {
        def arr(s: Option[Set[String]]) =
          s.map(_.toSeq.sorted.map(jstr).mkString("[", ",", "]")).getOrElse("null")
        if (stageOnly.nonEmpty && only.nonEmpty)
          System.err.println("[bench] WARNING: STAGE_ONLY excludes staging " +
            "items; if a BENCH_ONLY query depends on one, its first sample " +
            "includes the memoized build (run is tagged \"restricted\")")
        s""","restricted":{"stage_only":${arr(stageOnly)},"bench_only":${arr(only)}}"""
      }
    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"n_flaky":${flaky.size},"queries":${qmap(results)},"errors":${smap(errors)},"flaky":${smap(flaky)},"warnings":$warnJson,"phases":$phases,"stage_detail":${qmap(stageDetail)}$restricted,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (detail + "\n").getBytes("UTF-8"))
    val headline = results.filter { case (k, _) => Headline(k) }
    // Headline line stays under the driver's 2000-char tail: first few error
    // NAMES only (full messages live in the detail file).
    val errNames = (errors.take(10).map(e => jstr(e._1)) ++
      (if (errors.size > 10) Seq(jstr(s"+${errors.size - 10} more")) else Nil))
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"n_flaky":${flaky.size},"failed":$errNames,"warnings":$warnJson,"queries":${qmap(headline)},"phases":$phases,"detail":"$detailPath","sf":"$sfDir"}""")
    Tables.clearDerived(spark)
    spark.stop()
  }

  /** Headline queries printed inline: the heaviest member of each major
    * family plus three TPC-H anchors, so the one-line JSON stays
    * representative while fitting the driver's 2000-char output tail. The
    * r7 driver record shows the failure mode when this grows: with every
    * TPC-H shape inlined the line ran ~1.9k chars, sbt's trailing
    * `[success]` line pushed the JSON's FRONT out of the 2000-char window,
    * and the driver logged `parsed: null` despite a green run — so the
    * full map lives in BENCH_DETAIL.json and this set stays ~25 entries.
    */
  /** Queries whose `count()` plan prunes THE WORK off the scan — pure
    * decode/hash projections. Bench executes these via `toRdd.count()`
    * (full-column materialization of the unmodified plan) so their rows
    * time the codec, not the pruned payload scan (closes VERDICT r10 #2;
    * CountCheck remains the dev tool that shows the two plans side by side).
    */
  private val ForceMaterialize: Set[String] = Set(
    "md_ppm_decode", "md_wav_decode", "md_png_decode", "md_qoi_decode",
    "md_flac_decode", "md_gzip_decode", "md_gzip_concat",
    "md_decode_features", "md_ahash")

  private val Headline: Set[String] = Set(
    "dd_minhash_candidates", "dd_clusters", "dd_sorted_neighbors",
    "dd_prefix_jaccard", "dd_semdedup",
    "sim_bruteforce_topk", "sim_ivf_topk", "sim_pq_topk", "sim_hybrid_rrf",
    "sim_pca_power", "sim_srp_knn_join",
    "tx_ranked_search", "tx_token_counts", "tx_dsir_weights", "tx_lm_score",
    "geo_neighbor_pairs", "geo_pagerank", "geo_z2_range_scan",
    "xa_q1_pricing_summary", "xa_q6_forecast_revenue", "xj_q3_shipping_priority",
    "xo_topk_custom_op", "xp_bucketed_order_revenue",
    "xt_cohort_retention", "xst_tumbling_counts")
}
