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

  test("planted over-cap corpus: simhash guard engagement measured and flagged end-to-end") {
    // >MaxBucketDocs identical texts collapse to one simhash -> each band
    // bucket holds all of them -> the guard excludes them from the join,
    // and guardStats must SAY so
    val dir = java.nio.file.Files.createTempDirectory("graft_overcap").toString
    import spark.implicits._
    (1 to operators.DedupOps.MaxBucketDocs + 100).map { i =>
      (i.toLong, "the same exact document body repeated verbatim everywhere")
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (1 to 10).map(i => (i.toLong, Array.fill(64)(0.5f), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val stats = operators.DedupOps.guardStats(spark, dir).collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Long]("max_bucket"),
        r.getAs[Long]("n_rows_dropped"))).toSeq
    val simhash = stats.find(_._1 == "simhash_bands").get
    assert(simhash._2 > operators.DedupOps.MaxBucketDocs && simhash._3 > 0)
    assert(stats.find(_._1 == "srp_buckets").get._3 == 0) // 10 vecs: under cap
    val w = Monitors.guardWarnings(stats)
    assert(w.exists(_.contains("simhash_bands")), s"expected guard warning, got: $w")
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
