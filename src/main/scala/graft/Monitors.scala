package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Degeneracy alerting contract over the suite's two self-monitoring
  * queries (VERDICT r7 #6). `dd_ppj_stats` and `dd_minhash_estimate` exist
  * as oracle-verified reports; this object turns them into an operational
  * contract: fixed thresholds at which a corpus is degenerate enough that
  * the dedup plans' performance/accuracy assumptions no longer hold, and a
  * `warnings` list Bench embeds in its JSON so the driver (and a production
  * scheduler) sees the flag without reading the report tables.
  *
  * Thresholds carry headroom over the shipped corpus (sf0.01–sf0.1 measures
  * noted per threshold) so routine drift never cries wolf, while a planted
  * degenerate fixture (MonitorsSpec) reliably trips them.
  */
object Monitors {

  /** Max share of all docs that one identical-token-set clique may hold.
    * The PPJoin clique collapse (DedupOps.ppjPrefix) is exact at any clique
    * size, but a dominant clique means the corpus is mostly one repeated
    * document — the corpus, not the plan, is broken. Measured shipped
    * corpus: 0.052 / 0.058 / 0.050 at sf0.001/0.01/0.1 (SF-stable) — 4x
    * headroom.
    */
  val MaxCliqueShare = 0.20

  /** Max prefix-posting length as a share of clique representatives. If one
    * token's posting covers essentially ALL reps, every rep shares its
    * rarest token and the prefix filter degenerates to all-pairs. The
    * shipped corpus draws from a small vocabulary, so its hottest posting
    * already covers 0.71–0.73 of reps at every SF (the real pruning comes
    * from the length/positional filters and the clique collapse) — the
    * flag line is "universal token" territory, not routine drift.
    */
  val MaxPostingShare = 0.95

  /** Max candidate upper bound (Σ c·(c−1)/2 over postings) relative to the
    * all-pairs space of the reps, i.e. posting multiplicity. Measured
    * shipped corpus: 1.64 / 1.62 / 1.55 at sf0.001/0.01/0.1 (SF-stable);
    * >5 means pairs co-occur in many postings — a pathological shared-
    * rare-token structure the verify join would amplify.
    */
  val MaxCandidateDensity = 5.0

  /** Max RMSE of the MinHash Jaccard estimator vs exact Jaccard over the
    * LSH candidate pairs. At NumHashes=8 the estimator's per-pair sd is
    * ≤ 1/(2√8) ≈ 0.18 (Bernoulli worst case at J=0.5), and LSH selection
    * bias (pairs are candidates BECAUSE bands matched) pushes the observed
    * RMSE slightly above it: measured 0.086 / 0.097 / 0.205 at
    * sf0.001/0.01/0.1. Beyond 0.30 the signature pipeline itself is broken
    * — hash skew or fixture corruption, not sampling noise.
    */
  val MaxMinhashRmse = 0.30

  def ppjWarnings(nDocs: Long, nGroups: Long, maxClique: Long,
                  maxPosting: Long, candUpper: Long): Seq[String] = {
    val w = Seq.newBuilder[String]
    if (nDocs > 0 && maxClique.toDouble / nDocs > MaxCliqueShare)
      w += f"ppj: largest identical-token-set clique holds ${maxClique.toDouble / nDocs}%.2f of $nDocs docs (> $MaxCliqueShare%.2f)"
    if (nGroups > 0 && maxPosting.toDouble / nGroups > MaxPostingShare)
      w += f"ppj: hottest prefix-token posting covers ${maxPosting.toDouble / nGroups}%.2f of $nGroups reps (> $MaxPostingShare%.2f)"
    val allPairs = nGroups.toDouble * (nGroups - 1) / 2
    if (allPairs > 0 && candUpper / allPairs > MaxCandidateDensity)
      w += f"ppj: candidate upper bound is ${candUpper / allPairs}%.1fx the reps' all-pairs space (> $MaxCandidateDensity%.0fx)"
    w.result()
  }

  /** Guard-engagement warnings: any LSH family whose hot-bucket guard is
    * actually excluding rows means guarded results have DIVERGED from the
    * unguarded semantics (the r8 10× replay caught `simhash_bands` doing
    * exactly this) — correct behavior, but a pipeline must see it.
    */
  def guardWarnings(rows: Seq[(String, Long, Long)]): Seq[String] =
    rows.collect { case (family, maxBucket, dropped) if dropped > 0 =>
      f"guard: $family hot-bucket guard engaged - max bucket $maxBucket (cap ${operators.DedupOps.MaxBucketDocs}), $dropped rows excluded from pair generation; guarded results diverge from unguarded semantics"
    }

  /** Max distinct-name share of the part table before
    * [[operators.DedupOps.jaroNamePairs]]' vocab-collapse premise breaks:
    * the all-pairs scoring is bounded by vocab², which is only sub-corpus
    * work while names REPEAT. Shipped corpus: 62–64 distinct names at
    * every SF (share 0.31 / 0.032 / 0.0032 at sf0.001/0.01/0.1 — the
    * vocabulary is SF-stable, so the share only falls as the corpus
    * grows). A corpus-like name column (share → 1) needs the
    * sorted-neighborhood blocking path instead. The 100-row floor keeps
    * toy fixtures from tripping on small-sample noise.
    */
  val MaxNameVocabShare = 0.5

  def jaroVocabWarnings(nParts: Long, nNames: Long): Seq[String] =
    if (nParts >= 100 && nNames.toDouble / nParts > MaxNameVocabShare)
      Seq(f"jaro: part-name vocabulary $nNames is ${nNames.toDouble / nParts}%.2f of $nParts rows (> $MaxNameVocabShare%.2f) - the vocab-collapsed all-pairs stage degenerates toward rows-squared; route names through sorted-neighborhood blocking instead")
    else Seq.empty

  /** Max hot-list/mean-list ratio of the trained IVF index before pruned
    * ANN latency assumptions break: a probe hitting the hot list scans
    * `imbalance`× the budgeted fraction of the corpus. Measured shipped
    * corpus: 1.31 / 1.14 at sf0.001/0.01 (k-means on the fixture's label
    * mixture balances well) — ~3.5x headroom.
    */
  val MaxIvfImbalance = 4.0

  def ivfWarnings(nLists: Long, trainedK: Long, imbalance: Double): Seq[String] = {
    val w = Seq.newBuilder[String]
    if (trainedK > 0 && nLists < trainedK)
      w += s"ivf: only $nLists of the intended $trainedK lists are populated (collapsed clusters) - the index has less pruning power than its k claims; retrain or reduce k"
    if (nLists > 0 && imbalance > MaxIvfImbalance)
      w += f"ivf: hottest list is $imbalance%.1fx the mean list size (> $MaxIvfImbalance%.1fx) - pruned search degenerates toward brute force on the probes that matter; rebalance or split the hot list"
    w.result()
  }

  def minhashWarnings(rmse: Double, nPairs: Long): Seq[String] =
    if (nPairs > 0 && rmse > MaxMinhashRmse)
      Seq(f"minhash: estimator RMSE $rmse%.3f over $nPairs candidate pairs (> $MaxMinhashRmse%.2f at NumHashes=${operators.DedupOps.NumHashes}) - widen signatures or check hash skew")
    else Seq.empty

  /** Evaluate both monitors on a corpus. Collects two single-row aggregates
    * (metadata-sized — never data). A monitor that itself fails returns a
    * warning rather than throwing: the bench must finish.
    */
  def warnings(spark: SparkSession, sfDir: String): Seq[String] = {
    val ppj =
      try {
        val r = operators.DedupOps.prefixJoinStats(spark, sfDir).head()
        ppjWarnings(r.getAs[Long]("n_docs"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("max_clique"), r.getAs[Long]("max_posting"),
          r.getAs[Long]("cand_upper"))
      } catch { case NonFatal(e) =>
        Seq(s"monitor dd_ppj_stats failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    val mh =
      try {
        val r = operators.DedupOps.minhashEstimate(spark, sfDir)
          .agg(sqrt(avg(pow(col("jaccard_est") - col("jaccard_exact"), 2))).as("rmse"),
            count(lit(1)).as("n"))
          .head()
        minhashWarnings(Option(r.getAs[Double]("rmse")).getOrElse(0.0),
          r.getAs[Long]("n"))
      } catch { case NonFatal(e) =>
        Seq(s"monitor dd_minhash_estimate failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    val guards =
      try {
        guardWarnings(operators.DedupOps.guardStats(spark, sfDir).collect().toSeq
          .map(r => (r.getAs[String]("family"), r.getAs[Long]("max_bucket"),
            r.getAs[Long]("n_rows_dropped"))))
      } catch { case NonFatal(e) =>
        Seq(s"monitor guard_stats failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    val jaro =
      try {
        val r = Tables.part(spark, sfDir)
          .agg(count(lit(1)).as("n_parts"),
            countDistinct(col("p_name")).as("n_names"))
          .head()
        jaroVocabWarnings(r.getAs[Long]("n_parts"), r.getAs[Long]("n_names"))
      } catch { case NonFatal(e) =>
        Seq(s"monitor jaro_vocab failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    val ivf =
      try {
        val r = operators.SimilarityOps.ivfStats(spark, sfDir).head()
        // compare against the INTENDED k (kmeansKFor): the trained table
        // itself drops collapsed clusters, so its own count can't see them
        ivfWarnings(r.getAs[Long]("n_lists"),
          operators.SimilarityOps.kmeansKFor(spark, sfDir),
          r.getAs[Double]("imbalance"))
      } catch { case NonFatal(e) =>
        Seq(s"monitor sim_ivf_stats failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    ppj ++ mh ++ guards ++ jaro ++ ivf
  }
}
