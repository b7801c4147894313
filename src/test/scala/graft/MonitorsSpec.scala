package graft

import org.apache.spark.sql.functions._

/** The degeneracy alerting contract (VERDICT r7 #6): thresholds must stay
  * quiet on the shipped corpus and must TRIP on a deliberately planted
  * degenerate fixture.
  */
class MonitorsSpec extends SparkSpec {

  test("shipped corpus raises no warnings") {
    assert(Monitors.warnings(spark, Sf).isEmpty)
  }

  test("planted degenerate corpus (one giant identical-text clique) trips the ppj flag") {
    // a corpus where 90% of docs are the same document: the largest
    // identical-token-set clique holds 90% of docs — way past MaxCliqueShare
    val dir = java.nio.file.Files.createTempDirectory("graft_degenerate").toString
    import spark.implicits._
    (1 to 100).map { i =>
      val text = if (i <= 90) "the same exact document body repeated verbatim"
                 else s"unique doc $i with its own words alpha$i beta$i gamma$i"
      (i.toLong, text)
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.DedupOps.prefixJoinStats(spark, dir).head()
    val w = Monitors.ppjWarnings(r.getAs[Long]("n_docs"), r.getAs[Long]("n_groups"),
      r.getAs[Long]("max_clique"), r.getAs[Long]("max_posting"),
      r.getAs[Long]("cand_upper"))
    assert(w.exists(_.contains("clique")), s"expected a clique warning, got: $w")
  }

  test("jaro vocab share: quiet on the repeating-name corpus, trips when every name is unique") {
    // shipped shape: vocabulary is SF-stable (62-64 names), share well
    // under the threshold at every SF
    assert(Monitors.jaroVocabWarnings(200, 62).isEmpty)
    assert(Monitors.jaroVocabWarnings(20000, 64).isEmpty)
    // corpus-like name column: the vocab-collapse premise is gone
    assert(Monitors.jaroVocabWarnings(200, 200).nonEmpty)
    // toy fixtures below the floor never trip
    assert(Monitors.jaroVocabWarnings(50, 50).isEmpty)
    // end-to-end: a planted all-unique-names part table trips via warnings'
    // aggregate path
    val dir = java.nio.file.Files.createTempDirectory("graft_jaro_vocab").toString
    import spark.implicits._
    (1 to 150).map(i => (i.toLong, s"unique part name $i"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Tables.part(spark, dir)
      .agg(count(lit(1)).as("n"), countDistinct(col("p_name")).as("d"))
      .head()
    assert(Monitors.jaroVocabWarnings(r.getAs[Long]("n"), r.getAs[Long]("d"))
      .exists(_.contains("vocab")))
  }

  test("minhash estimator threshold: quiet at shipped RMSE, trips past the bias ceiling") {
    assert(Monitors.minhashWarnings(0.21, 1000).isEmpty) // measured sf0.1 value
    assert(Monitors.minhashWarnings(0.35, 1000).nonEmpty)
    assert(Monitors.minhashWarnings(0.35, 0).isEmpty) // no pairs -> no signal
  }

  test("guard engagement: quiet at zero drops, trips when a family excludes rows") {
    assert(Monitors.guardWarnings(Seq(
      ("minhash_bands", 120L, 0L), ("simhash_bands", 900L, 0L),
      ("srp_buckets", 40L, 0L))).isEmpty)
    val w = Monitors.guardWarnings(Seq(
      ("minhash_bands", 120L, 0L), ("simhash_bands", 15000L, 15000L)))
    assert(w.size == 1 && w.head.contains("simhash_bands"))
  }

  test("planted over-cap corpus: srp guard engagement measured and flagged end-to-end") {
    // simhash now collapses identical signatures and sub-bands clusters, so
    // an identical-TEXT flood must NOT engage it (asserted below). The SRP
    // family buckets distinct VECTORS with no collapse, so >MaxBucketDocs
    // co-bucketed near-identical embeddings are the honest end-to-end plant.
    val dir = java.nio.file.Files.createTempDirectory("graft_overcap").toString
    import spark.implicits._
    val n = operators.DedupOps.MaxBucketDocs.toInt + 100
    (1 to n).map { i =>
      (i.toLong, "the same exact document body repeated verbatim everywhere")
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // distinct vectors, all on the same side of every hyperplane: a shared
    // dominant direction + a tiny per-vector wiggle on one coordinate
    (1 to n).map { i =>
      val v = Array.fill(64)(0.5f); v(0) = 10f + i * 1e-4f
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val stats = operators.DedupOps.guardStats(spark, dir).collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Long]("max_bucket"),
        r.getAs[Long]("n_rows_dropped"))).toSeq
    val srp = stats.find(_._1 == "srp_buckets").get
    assert(srp._2 > operators.DedupOps.MaxBucketDocs && srp._3 > 0)
    // the identical-text flood collapsed to ONE signature: no engagement
    val simhash = stats.find(_._1 == "simhash_bands").get
    assert(simhash._3 == 0,
      s"identical-text flood must be absorbed by the signature collapse: $simhash")
    val w = Monitors.guardWarnings(stats)
    assert(w.exists(_.contains("srp_buckets")), s"expected guard warning, got: $w")
  }

  test("simhash two-level banding: hot-bucket recursion stays exact for Hamming <= 3") {
    // a corpus of signature CLUSTERS: many distinct texts sharing most
    // words, so distinct signatures concentrate in top-level band buckets.
    // With a tiny cap every bucket goes hot, forcing the sub-band path;
    // results must equal the brute-force O(n^2) answer exactly.
    val dir = java.nio.file.Files.createTempDirectory("graft_hotband").toString
    import spark.implicits._
    val base = (1 to 40).map(j => s"token$j").mkString(" ")
    (1 to 60).map(i => (i.toLong, s"$base extra${i % 15} tail${i % 7}"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = operators.DedupOps.simhash(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val expect = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h >= 1 && h <= 3
    } yield (a, b, h)).toSet
    val hot = operators.DedupOps.simhashNeighbors(spark, dir, cap = 3L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(hot == expect, s"hot-path result diverged: ${hot.size} vs ${expect.size}")
    // and the default cap (no hot buckets at this size) agrees too
    val cold = operators.DedupOps.simhashNeighbors(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(cold == expect)
  }

  test("ivf balance: quiet on the shipped index, trips on a planted collapsed index") {
    // shipped shape: measured imbalance 1.31 / 1.14 at sf0.001/0.01
    assert(Monitors.ivfWarnings(8, 8, 1.31).isEmpty)
    // a hot list past the ratio ceiling
    assert(Monitors.ivfWarnings(8, 8, 5.0).exists(_.contains("hottest")))
    // collapsed clusters: fewer populated lists than the intended k
    assert(Monitors.ivfWarnings(3, 8, 1.0).exists(_.contains("collapsed")))
    // end-to-end: 90% of vectors identical -> training collapses onto the
    // hot point (duplicate centroids merge, losers end empty) and the
    // populated-list count falls below the intended k
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_skew").toString
    import spark.implicits._
    (1 to 200).map { i =>
      val e = if (i <= 180) Array(1.0f, 0.0f, 0.0f, 0.0f)
              else Array(0.0f, (i % 7 + 1).toFloat, (i % 5 + 1).toFloat, 1.0f)
      (i.toLong, e, i % 5)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.SimilarityOps.ivfStats(spark, dir).head()
    val k = operators.SimilarityOps.kmeansKFor(spark, dir)
    assert(r.getAs[Long]("max_list") >= 180)
    assert(r.getAs[Long]("n_lists") < k)
    assert(Monitors.ivfWarnings(r.getAs[Long]("n_lists"), k,
      r.getAs[Double]("imbalance")).exists(_.contains("collapsed")))
  }

  test("posting-skew and candidate-density flags fire on synthetic stats") {
    // a universal prefix token: posting covers ~99% of reps
    assert(Monitors.ppjWarnings(1000, 800, 5, 790, 100).exists(_.contains("posting")))
    // candidate bound 6x the reps' all-pairs space (shipped corpus ~1.6x)
    assert(Monitors.ppjWarnings(1000, 800, 5, 10, 2000000).exists(_.contains("candidate")))
    // shipped-corpus-like stats stay quiet
    assert(Monitors.ppjWarnings(1000, 800, 50, 580, 510000).isEmpty)
  }
}
