package graft

import graft.operators.{DedupOps, TextOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {

  test("keywordSearch: partition-pruned posting read, result matches the direct text scan") {
    import graft.functions.TextFunctions.words
    val hits = TextOps.keywordSearch(spark, Sf)
    // plan-time pruning: only the terms' buckets are listed, never all 16
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val idxFiles = TextOps.invertedIndex(spark, Sf)
      .select(input_file_name()).distinct().count()
    val touched = TextOps.invertedIndex(spark, Sf)
      .where(col("bucket").isin(
        TextOps.SearchTerms.map(t =>
          graft.functions.MinHashAgg.h24(t) % TextOps.IndexBuckets).distinct: _*))
      .select(input_file_name()).distinct().count()
    assert(touched < idxFiles,
      s"search touched $touched of $idxFiles index files - nothing pruned")
    // the index answers exactly what the direct corpus scan answers
    val direct = Tables.documents(spark, Sf)
      .where(TextOps.SearchTerms
        .map(t => array_contains(words(col("text")), t))
        .reduce(_ && _))
      .select(col("doc_id"))
    assert(hits.exceptAll(direct).count() == 0 && direct.exceptAll(hits).count() == 0)
    assert(hits.count() > 0)
  }

  test("rankedSearch: top-k tf-idf from postings matches a direct corpus recompute") {
    import graft.functions.TextFunctions.words
    val terms = TextOps.SearchTerms
    val got = TextOps.rankedSearch(spark, Sf).collect()
    assert(got.length == TextOps.SearchTopK)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(2) > b.getDouble(2) ||
          (a.getDouble(2) == b.getDouble(2) && a.getLong(0) < b.getLong(0)))
      case _ => ()
    }
    // direct recompute: same idf definition, ordered on the UNROUNDED score
    val nDocs = Tables.documents(spark, Sf).count().toDouble
    val dfs = terms.map { t =>
      t -> Tables.documents(spark, Sf)
        .where(array_contains(words(col("text")), t)).count()
    }.toMap
    val w = words(col("text"))
    val raw = terms.map { t =>
      size(filter(w, x => x === t)).cast("double") * (nDocs / dfs(t))
    }.reduce(_ + _)
    val direct = Tables.documents(spark, Sf)
      .select(col("doc_id"), raw.as("raw"))
      .where(col("raw") > 0)
      .orderBy(col("raw").desc, col("doc_id")).limit(TextOps.SearchTopK)
      .select(col("doc_id"), round(col("raw"), 6).as("score")).collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      direct.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("bm25Search: matches a direct corpus recompute; saturation and length-norm behave") {
    import graft.functions.TextFunctions.words
    val terms = TextOps.SearchTerms
    val got = TextOps.bm25Search(spark, Sf).collect()
    assert(got.length == TextOps.SearchTopK)
    got.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= terms.size))
    // direct recompute from the text with the same op sequence
    val nDocs = Tables.documents(spark, Sf).count().toDouble
    val avgdl = Tables.documents(spark, Sf)
      .select(avg(size(words(col("text"))).cast("long")).as("a"))
      .collect().head.getDouble(0)
    val dfs = terms.map { t =>
      t -> Tables.documents(spark, Sf)
        .where(array_contains(words(col("text")), t)).count()
    }.toMap
    val w = words(col("text"))
    val dl = size(w).cast("double")
    val raw = terms.map { t =>
      val tf = size(filter(w, x => x === t)).cast("double")
      when(tf > 0,
        (lit(nDocs / dfs(t)) * (tf * lit(TextOps.Bm25K1 + 1))) /
          (tf + lit(TextOps.Bm25K1) *
            (lit(1 - TextOps.Bm25B) + lit(TextOps.Bm25B) * (dl / lit(avgdl)))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val direct = Tables.documents(spark, Sf)
      .select(col("doc_id"), raw.as("raw"))
      .where(col("raw") > 0)
      .orderBy(col("raw").desc, col("doc_id")).limit(TextOps.SearchTopK)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == direct.map(_.getLong(0)).toSeq)
    got.zip(direct).foreach { case (g, d) =>
      assert(math.abs(g.getDouble(2) - d.getDouble(1)) < 1e-6)
    }
    // saturation: a term's contribution is capped at idf*(k1+1) — no score
    // can exceed sum(idf)*(k1+1) no matter how stuffed the doc
    val cap = terms.map(t => nDocs / dfs(t)).sum * (TextOps.Bm25K1 + 1)
    got.foreach(r => assert(r.getDouble(2) < cap))
  }

  test("srpKnnJoin: per-vector top-k, exact cosines, neighbors from the SRP collision graph") {
    val knn = DedupOps.srpKnnJoin(spark, Sf).collect()
    assert(knn.nonEmpty)
    val byVec = knn.groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (v, rs) =>
      assert(rs.length <= DedupOps.KnnJoinK)
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == v))
      val ranked = rs.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to rs.length).toSeq)
      val cosines = ranked.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // cosines are the exact (rounded) pair cosines: cross-check against the
    // near-dup query at threshold -1 (same collision graph, undirected)
    val pairs = DedupOps.embeddingNearDups(spark, Sf, -1.0).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("cosine")).toMap
    knn.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))
      val key = (math.min(a, b), math.max(a, b))
      assert(pairs.get(key).contains(r.getAs[Double]("cosine")),
        s"pair $key missing or cosine mismatch")
    }
  }

  test("bpeMerges: round-1 merge equals a driver-side recompute; encode shrinks toward it") {
    import graft.functions.TextFunctions.words
    val merges = TextOps.bpeMerges(spark, Sf).collect().sortBy(_.getAs[Long]("round"))
    assert(merges.length == TextOps.BpeRounds)
    merges.foreach { m =>
      assert(m.getAs[String]("merged") ==
        m.getAs[String]("lhs") + m.getAs[String]("rhs"))
      assert(m.getAs[Long]("pair_count") > 0)
    }
    // round 1 from first principles: most frequent adjacent char pair over
    // freq-weighted words, overlaps counted, (count desc, lhs, rhs) ties
    val freqs = Tables.documents(spark, Sf)
      .select(explode(words(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    freqs.foreach { case (w, f) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
    }
    val expect = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
    val got1 = merges.head
    assert((got1.getAs[String]("lhs"), got1.getAs[String]("rhs")) == expect._1)
    assert(got1.getAs[Long]("pair_count") == expect._2)
    // encoding: every word is >= 1 symbol and merges strictly shrink the
    // symbol stream relative to raw characters on this corpus
    val enc = TextOps.bpeEncode(spark, Sf).collect()
    assert(enc.nonEmpty)
    val charTotals = freqs.map { case (w, f) => w.length.toLong * f }.sum
    val bpeTotal = enc.map(_.getAs[Long]("n_bpe_tokens")).sum
    val wordTotal = enc.map(_.getAs[Long]("n_words")).sum
    assert(bpeTotal < charTotals && bpeTotal >= wordTotal)
  }

  test("bpeFertility: per-lang rollup recomputes from encode-side word stats") {
    import graft.functions.TextFunctions.words
    // expected: doc-level (lang, word) stream joined to per-word symbol
    // counts recovered from bpeEncode's own inputs (word totals per doc)
    val docLang = Tables.documents(spark, Sf)
      .select(col("lang"), explode(words(col("text"))).as("word")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val enc = TextOps.bpeEncode(spark, Sf).collect()
    val rows = TextOps.bpeFertility(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == docLang.map(_._1).toSet)
    // totals across languages agree with the per-doc encode totals
    assert(rows.values.map(_._1).sum == enc.map(_.getAs[Long]("n_words")).sum)
    assert(rows.values.map(_._2).sum == enc.map(_.getAs[Long]("n_bpe_tokens")).sum)
    // per-lang word and char counts recompute from the raw corpus
    val expWords = docLang.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    val expChars = docLang.groupBy(_._1)
      .map { case (l, v) => l -> v.map(_._2.length.toLong).sum }
    rows.foreach { case (l, (nw, nt, nc, fert, cpt)) =>
      assert(nw == expWords(l) && nc == expChars(l), s"lang $l counts")
      assert(fert == nt.toDouble / nw && cpt == nc.toDouble / nt, s"lang $l ratios")
      assert(fert >= 1.0, s"lang $l fertility < 1 - a word became 0 symbols")
    }
  }

  test("phraseSearch: positional match equals the padded-substring scan; subset of conjunctive") {
    val hits = TextOps.phraseSearch(spark, Sf)
    val direct = Tables.documents(spark, Sf)
      .where(concat(lit(" "), col("text"), lit(" "))
        .contains(" " + TextOps.SearchPhrase.mkString(" ") + " "))
      .select(col("doc_id"))
    assert(hits.exceptAll(direct).count() == 0 && direct.exceptAll(hits).count() == 0)
    assert(hits.count() > 0)
    // a phrase match implies both words present: subset of the AND query
    val conj = TextOps.keywordSearch(spark, Sf, TextOps.SearchPhrase)
    assert(hits.exceptAll(conj).count() == 0)
    assert(hits.count() < conj.count()) // and strictly stronger on this corpus
  }

  test("canonicalByQuality: one best per cluster, and it maximizes the quality score") {
    val got = DedupOps.canonicalByQuality(spark, Sf).cache()
    try {
      // covers every clustered doc, exactly once
      assert(got.count() == DedupOps.duplicateClusters(spark, Sf).count())
      assert(got.select("doc_id").distinct().count() == got.count())
      // exactly one is_best per cluster
      val perCluster = got.groupBy("cluster_id")
        .agg(sum(when(col("is_best"), 1L).otherwise(0L)).as("n_best"))
      assert(perCluster.where(col("n_best") =!= 1L).count() == 0)
      // the flagged member attains its cluster's max quality
      val best = got.where(col("is_best"))
        .select(col("cluster_id"), col("quality_score").as("best_q"))
      val maxQ = got.groupBy("cluster_id").agg(max("quality_score").as("max_q"))
      assert(best.join(maxQ, "cluster_id")
        .where(col("best_q") =!= col("max_q")).count() == 0)
    } finally got.unpersist()
  }

  test("curation: funnel is monotone and agrees with the curated corpus") {
    val f = TextOps.curationFunnel(spark, Sf).collect().head
    val (total, q, l, cur) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3))
    assert(total >= q && q >= l && l >= cur, s"funnel not monotone: $f")
    assert(cur > 0 && cur < total, "thresholds must actually select")
    val kept = TextOps.curatedCorpus(spark, Sf)
    assert(kept.count() == cur)
    // kept docs satisfy every stage's predicate
    assert(kept.where(col("quality_score") < TextOps.MinQuality).count() == 0)
    assert(kept.where(col("predicted_lang") =!= "en").count() == 0)
    val dropped = DedupOps.duplicateClusters(spark, Sf)
      .where(!col("is_canonical")).select(col("doc_id"))
    assert(kept.join(dropped, Seq("doc_id"), "left_semi").count() == 0)
    // plan shape: the dedup filter is a broadcast anti-join (the drop list
    // is tiny relative to the corpus), never a shuffle of documents
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
  }

  test("contamination: benchmark docs excluded, flag matches the overlap threshold") {
    val c = TextOps.contamination(spark, Sf)
    assert(c.where(col("doc_id") < TextOps.BenchmarkDocs).count() == 0)
    assert(c.where(col("overlap") <= 0 || col("overlap") > 1).count() == 0)
    assert(c.where(col("contaminated") =!=
      (col("overlap") >= TextOps.ContaminationMinOverlap)).count() == 0)
  }

  test("stratifiedSample: deterministic, rates honored per stratum") {
    val s1 = TextOps.stratifiedSample(spark, Sf).collect().map(_.getLong(0)).toSet
    val s2 = TextOps.stratifiedSample(spark, Sf).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // hash-based: reruns reproduce the exact sample
    val langs = TextOps.languageId(spark, Sf)
      .groupBy(col("predicted_lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TextOps.stratifiedSample(spark, Sf)
      .groupBy(col("predicted_lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-100 stratum passes through whole; rate-20 stratum shrinks
    assert(sampled.getOrElse("und", 0L) == langs.getOrElse("und", 0L))
    assert(sampled("en") < langs("en"))
  }

  test("tokenHistogram: buckets partition the corpus") {
    val h = TextOps.tokenHistogram(spark, Sf).collect()
    val total = Tables.documents(spark, Sf).count()
    assert(h.map(_.getAs[Long]("n_docs")).sum == total)
    h.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_tokens") >= b * TextOps.HistBucketWidth)
      assert(r.getAs[Long]("max_tokens") < (b + 1) * TextOps.HistBucketWidth)
    }
  }

  test("sequencePacking: contiguous per-shard offsets, correct sequence ids") {
    val rows = TextOps.sequencePacking(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(_._2)
      // offsets tile the shard's token stream with no gaps or overlaps
      var expect = 0L
      ordered.foreach { case (_, _, n, start, seq) =>
        assert(start == expect, s"offset gap: start=$start expected=$expect")
        assert(seq == start / TextOps.SeqLen)
        expect += n
      }
    }
    assert(rows.map(_._2).distinct.length ==
      Tables.documents(spark, Sf).count())
  }

  test("shingles3: n words -> n-2 shingles; short text -> none") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.shingles3(col("text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L).isEmpty)
    assert(m(3L) == Seq("x y z"))
  }

  test("token counts: regex tokenizer counts letter runs") {
    val r = TextOps.tokenCounts(spark, Sf).agg(
      min(col("n_ws_tokens")), max(col("n_ws_tokens"))).collect().head
    assert(r.getLong(0) >= 10 && r.getLong(1) <= 99)
  }

  test("language id: word-soup corpus predicts a known profile or und") {
    val langs = TextOps.languageId(spark, Sf)
      .select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "und")))
  }

  test("exact dedup: no duplicate texts in corpus -> no dups flagged") {
    val d = DedupOps.exactDedup(spark, Sf)
    assert(d.where(col("is_dup")).count() == 0)
    assert(d.count() == Tables.documents(spark, Sf).count())
  }

  test("minhash signatures: identical texts share all hashes (self-consistency)") {
    // signature of a doc joined to itself via candidates must have jaccard<=1
    val sigs = DedupOps.minhashSignatures(spark, Sf)
    assert(sigs.count() == Tables.documents(spark, Sf).count())
    (1 to DedupOps.NumHashes).foreach { j =>
      assert(sigs.where(col(s"mh$j").isNull).count() == 0)
    }
  }

  test("jaccard on candidates is within [0,1] and symmetric-safe (a<b)") {
    val j = DedupOps.jaccardOnCandidates(spark, Sf).collect()
    j.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val jac = r.getAs[Double]("jaccard")
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("simhash: signature range and stable groups") {
    val s = DedupOps.simhash(spark, Sf).collect()
    s.foreach { r =>
      val v = r.getAs[Long]("simhash")
      assert(v >= 0 && v < (1L << DedupOps.SimhashBits))
    }
  }

  test("embedding near-dups: cosine bounded, SRP buckets co-locate near-identical vectors") {
    val d = DedupOps.embeddingNearDups(spark, Sf, -1.0).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.000001 && c <= 1.000001)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
  }

  test("repetitionScores: fractions bounded, word totals agree with tokenCounts") {
    val rep = TextOps.repetitionScores(spark, Sf)
    val bad = rep.where(
      col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
        col("dup_word_frac") < 0 || col("dup_word_frac") >= 1 ||
        // the top word's mass can never exceed the duplicated mass + 1 word
        // (equality happens when one word carries all duplication; epsilon
        // absorbs the frac*n_words float round-trip)
        col("top_word_frac") * col("n_words") > col("dup_word_frac") * col("n_words") + 1 + 1e-9)
      .count()
    assert(bad == 0)
    val mismatched = rep.join(TextOps.tokenCounts(spark, Sf), "doc_id")
      .where(col("n_words") =!= col("n_ws_tokens")).count()
    assert(mismatched == 0)
    // spot-check one doc against a driver-side recompute
    val doc = Tables.documents(spark, Sf).select("doc_id", "text").head()
    val ws = doc.getString(1).split(" ")
    val top = ws.groupBy(identity).values.map(_.length).max
    val got = rep.where(col("doc_id") === doc.getLong(0)).head()
    assert(got.getAs[Long]("n_words") == ws.length)
    assert(math.abs(got.getAs[Double]("top_word_frac") - top.toDouble / ws.length) < 1e-12)
  }

  test("docChunks: stride geometry, tail coverage, hash matches a driver-side recompute") {
    val byDoc = TextOps.docChunks(spark, Sf).collect().groupBy(_.getLong(0))
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
    assert(byDoc.keySet == docs.map(_.getLong(0)).toSet) // every doc chunks, even short ones
    docs.foreach { d =>
      val ws = d.getString(1).split(" ")
      val cs = byDoc(d.getLong(0)).sortBy(_.getAs[Long]("chunk_idx"))
      assert(cs.length == (ws.length - 1) / TextOps.ChunkStride + 1)
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i)
        assert(c.getAs[Long]("start_token") == 1L + i * TextOps.ChunkStride)
        assert(c.getAs[Long]("chunk_tokens") ==
          math.min(TextOps.ChunkLen, ws.length - i * TextOps.ChunkStride))
      }
      // the last chunk ends exactly on the final token — nothing dropped
      val last = cs.last
      assert(last.getAs[Long]("start_token") + last.getAs[Long]("chunk_tokens") - 1 == ws.length)
      // content hash is the portable h24 of the sliced text (JVM twin)
      val expectHash = graft.functions.MinHashAgg.h24(
        ws.take(TextOps.ChunkLen).mkString(" "))
      assert(cs.head.getAs[Long]("chunk_hash") == expectHash)
    }
  }

  test("datasetSplits: exact partition of docs and tokens, train dominates under 90/5/5") {
    val rows = TextOps.datasetSplits(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, Sf).count())
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-12)
    val totTokens = TextOps.tokenCounts(spark, Sf)
      .agg(sum("n_ws_tokens")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("total_tokens")).sum == totTokens)
    val m = rows.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(m("train") > m("val") && m("train") > m("test"))
  }

  test("temperatureMix: rarest language keeps 100%, others downsampled, deterministic") {
    val mix = TextOps.temperatureMix(spark, Sf)
    val rates = mix.select("lang", "keep_pct").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.documents(spark, Sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = counts.minBy(_._2)._1
    assert(rates(rarest) == 100L)
    val dominant = counts.maxBy(_._2)._1
    assert(rates(dominant) < 100L)
    // keep-rate realized within the discrete hash-mod tolerance
    val kept = mix.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (l, pct) =>
      val expected = counts(l) * pct / 100.0
      assert(math.abs(kept(l) - expected) <= counts(l) * 0.15 + 3,
        s"$l kept ${kept(l)} vs ~$expected")
    }
    // retry-safety: a second run selects the identical rows
    val again = TextOps.temperatureMix(spark, Sf)
    assert(mix.exceptAll(again).count() == 0 && again.exceptAll(mix).count() == 0)
  }

  test("writeTrainingShards: one dir per shard, rows sorted within files, nothing lost") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      TextOps.writeTrainingShards(spark, Sf, out)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length == TextOps.PackShards)
      val back = spark.read.parquet(out)
      assert(back.count() == Tables.documents(spark, Sf).count())
      // intra-file ordering: within every parquet file, (seq_id, start_offset)
      // must be non-decreasing in row order
      import org.apache.spark.sql.functions.{col, input_file_name, spark_partition_id}
      val files = back
        .select(input_file_name().as("f"), col("seq_id"), col("start_offset"))
        .collect().groupBy(_.getString(0))
      files.values.foreach { rows =>
        val keys = rows.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("start_offset")))
        assert(keys.sameElements(keys.sortBy(identity)),
          "rows within a shard file are not sorted")
      }
    } finally {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rec)); f.delete(): Unit
      }
      rec(new java.io.File(out))
    }
  }

  test("simhash neighbors: banding is exact for Hamming <= 3") {
    import spark.implicits._
    val sigs = DedupOps.simhash(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    // brute-force ground truth over the small sf0.001 corpus
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h >= 1 && h <= 3
    } yield (a, b, h)).toSet
    val got = DedupOps.simhashNeighbors(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == expected)
  }
  test("rarityScores: doc-frequency mean matches a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSeq).toMap
    val df = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val got = operators.TextOps.rarityScores(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, ws) =>
      val (n, mean) = got(id)
      assert(n == ws.size)
      assert(math.abs(mean - ws.map(df(_)).sum.toDouble / ws.size) < 1e-9)
    }
  }
  test("topBigramsPerLang: MG fast path and exact fallback both match a window recompute") {
    import org.apache.spark.sql.expressions.Window
    val df = TextOps.topBigramsPerLang(spark, Sf)
    // the completeness gate passes on this corpus (kth=10 vs bound 0.8 at
    // sf0.01), so the result is the driver-emitted confirmed top-k
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // capacity 1: the MG sketch can't prove completeness (kth*(cap+1) <=
    // n_lang), so the exact TopKPerKey fallback must run — and must agree
    val fb = TextOps.topBigramsPerLang(spark, Sf, mgCapacity = 1)
    assert(fb.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(fb.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet == got)
    val w = split(col("text"), " ")
    val bigrams = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val win = Window.partitionBy(col("lang"))
      .orderBy(col("doc_freq").desc, col("bigram"))
    val expect = Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"), explode(array_distinct(bigrams)).as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("doc_freq"))
      .withColumn("rn", row_number().over(win)).where(col("rn") <= 3)
      .select("lang", "bigram", "doc_freq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("prefixJaccard: recall 1.0 vs the brute-force all-pairs join at the threshold") {
    val got = DedupOps.prefixJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sets = Tables.documents(spark, Sf)
      .select(col("doc_id"), array_distinct(TextFunctions.words(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b
      inter = (sa & sb).size.toLong
      if inter * (DedupOps.PpjNum + DedupOps.PpjDen) >=
        (sa.size + sb.size) * DedupOps.PpjNum
    } yield (a, b, inter)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("sortedIntersectN: equals size(array_intersect) on corpus pairs, codegen and interpreted") {
    import graft.functions.{SetExpressions, SortedIntersectN}
    // corpus-shaped inputs: every adjacent doc pair's sorted token sets
    val sets = Tables.documents(spark, Sf)
      .select(col("doc_id"), sort_array(array_distinct(TextFunctions.words(col("text")))).as("ts"))
    val pairs = sets.select(col("doc_id"), col("ts").as("ts_a"))
      .join(sets.select((col("doc_id") - 1).as("doc_id"), col("ts").as("ts_b")), Seq("doc_id"))
    val both = pairs.select(
      SetExpressions.sortedIntersectN(spark, col("ts_a"), col("ts_b")).as("fast"),
      size(array_intersect(col("ts_a"), col("ts_b"))).cast("long").as("ref"),
      col("ts_a"), col("ts_b"))
    val rows = both.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) == r.getLong(1)))
    // interpreted (nullSafeEval) path agrees with the codegen'd column result
    rows.foreach { r =>
      val mk = (s: Seq[String]) => org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(s.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      val lit = org.apache.spark.sql.catalyst.expressions.Literal
        .create(null, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
      val e = SortedIntersectN(lit, lit)
      val v = e.nullSafeEval(mk(r.getSeq[String](2)), mk(r.getSeq[String](3)))
      assert(v == r.getLong(0))
    }
    // edge cases: empty, disjoint, identical, interleaved
    val df = spark.createDataFrame(Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "c"), Seq("b", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "c", "e"), Seq("b", "c", "d", "e")))).toDF("a", "b")
    val got = df.select(SetExpressions.sortedIntersectN(spark, col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 3L, 2L))
  }

  test("dedup verify joins are shuffle-hash with the fused merge count, never sort-merge over array payloads") {
    // ngramJaccard reads the staged overlap table, so the verify shape to
    // guard lives in the staging BUILD plan, not the registered query's
    for (df <- Seq(DedupOps.prefixJaccard(spark, Sf),
                   DedupOps.rareGramOverlapsBuild(spark, Sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("sortedintersectn"),
        "verify must use the codegen'd SortedIntersectN merge count")
      // the load-bearing shape: every join whose row carries a token/gram
      // ARRAY is a hash join — SMJ would sort millions of wide rows
      val badSort = plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && (l.contains("ts_a") || l.contains("gs_a")))
      assert(!badSort, "array-payload verify join regressed to SortMergeJoin")
    }
  }

  test("minhashEstimate: n_eq recounts from the signatures; estimator is n_eq/NumHashes") {
    val sigs = DedupOps.minhashSignatures(spark, Sf).collect()
      .map(r => r.getLong(0) -> (1 to DedupOps.NumHashes).map(j => r.getAs[Long](s"mh$j")))
      .toMap
    val rows = DedupOps.minhashEstimate(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expectEq = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      assert(r.getAs[Long]("n_eq") == expectEq)
      assert(r.getAs[Double]("jaccard_est") ==
        expectEq.toDouble / DedupOps.NumHashes)
      val je = r.getAs[Double]("jaccard_exact")
      assert(je >= 0.0 && je <= 1.0)
    }
  }

  test("prefixJoinStats: clique and posting stats match a brute-force recount") {
    val row = DedupOps.prefixJoinStats(spark, Sf).collect().head
    val sets = Tables.documents(spark, Sf)
      .select(col("doc_id"), array_distinct(TextFunctions.words(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val byContent = sets.groupBy(_._2).values.map(_.map(_._1)).toSeq
    assert(row.getAs[Long]("n_docs") == sets.length.toLong)
    assert(row.getAs[Long]("n_groups") == byContent.size.toLong)
    assert(row.getAs[Long]("max_clique") == byContent.map(_.size).max.toLong)
    assert(row.getAs[Long]("intra_pairs") ==
      byContent.map(g => g.size.toLong * (g.size - 1) / 2).sum)
    // rep-level prefix postings: rebuild the (df asc, token asc) order over
    // group representatives and recount
    val reps = byContent.map(_.min).toSet
    val repSets = sets.filter(p => reps.contains(p._1))
    val df = repSets.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
    val postings = repSets.flatMap { case (_, s) =>
      val ordered = s.toSeq.sortBy(t => (df(t), t))
      val n = ordered.size.toLong
      val p = n - ((n * DedupOps.PpjNum + DedupOps.PpjDen - 1) / DedupOps.PpjDen) + 1
      ordered.take(p.toInt)
    }.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    assert(row.getAs[Long]("n_prefix_tokens") == postings.size.toLong)
    assert(row.getAs[Long]("max_posting") == postings.values.max)
    assert(row.getAs[Long]("cand_upper") ==
      postings.values.map(c => c * (c - 1) / 2).sum)
  }

  test("weightedSample: deterministic, k-sized, and a subset of the corpus") {
    val a = TextOps.weightedSample(spark, Sf).collect().map(_.getLong(0))
    val b = TextOps.weightedSample(spark, Sf).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq && a.length == TextOps.WSampleK)
    assert(a.distinct.length == a.length)
    val all = Tables.documents(spark, Sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(a.forall(all.contains))
  }

  test("vocabulary ids are dense ranks; encodeDocs round-trips in-vocab tokens in order") {
    val vocab = TextOps.vocabulary(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(vocab.map(_._3).sorted.toSeq == (0L until TextOps.VocabSize).toSeq)
    // ranks follow (tf desc, token asc)
    vocab.sortBy(_._3).sliding(2).foreach {
      case Array((t1, tf1, _), (t2, tf2, _)) =>
        assert(tf1 > tf2 || (tf1 == tf2 && t1 < t2))
      case _ => ()
    }
    val idOf = vocab.map(v => v._1 -> v._3).toMap
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enc = TextOps.encodeDocs(spark, Sf).collect()
    assert(enc.length == texts.size)
    enc.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val ids = r.getSeq[Long](1)
      assert(ids.length == toks.length && r.getLong(2) == toks.length)
      toks.zip(ids).foreach { case (t, id) =>
        assert(id == idOf.getOrElse(t, -1L), s"doc ${r.getLong(0)} token $t")
      }
    }
  }

  test("incrementalDedup: batch-vs-index pairs match a recompute from bands and shingles") {
    val bands = DedupOps.minhashBands(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val cand = bands.groupBy(b => (b._2, b._3)).values.flatMap { rows =>
      val batch = rows.filter(_._1 % 2 == 1).map(_._1).distinct.toSeq
      val index = rows.filter(_._1 % 2 == 0).map(_._1).distinct.toSeq
      for (b <- batch; i <- index) yield (b, i)
    }.toSet
    val sh = DedupOps.distinctShingles(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expect = cand.flatMap { case (b, i) =>
      val (sa, sb) = (sh(b), sh(i))
      val inter = (sa & sb).size.toLong
      if (inter * 3 >= sa.size + sb.size)
        Some((b, i, inter, sa.size.toLong, sb.size.toLong))
      else None
    }
    val got = DedupOps.incrementalDedup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect && got.nonEmpty)
    // the split is honored: batch side odd, index side even
    got.foreach { case (b, i, _, _, _) =>
      assert(b % 2 == 1 && i % 2 == 0)
    }
  }

  test("incrementalDedupTx: persisted-index run equals the one-shot recompute; history records both batches") {
    // the stored-table path (TxTable snapshot at v0, parquet on disk) must
    // reproduce the in-lineage recompute bit-for-bit — the same equivalence
    // the shared driver oracle checks (VERDICT r9 #8)
    val oneShot = DedupOps.incrementalDedup(spark, Sf).collect()
      .map(_.toString).sorted.toSeq
    val viaTx = DedupOps.incrementalDedupTx(spark, Sf).collect()
      .map(_.toString).sorted.toSeq
    assert(oneShot == viaTx && oneShot.nonEmpty)
    // the index table's provenance: v0 = accumulated index, v1 = today's
    // batch ingested after its dedup, v2 = the band-key-clustered
    // compaction; metrics = per-parity band counts / the full rewrite
    val h = DedupOps.dedupIndexHistory(spark, Sf).collect().sortBy(_.getLong(0))
    assert(h.map(_.getString(1)).toSeq ==
      Seq("index_batch0", "index_batch1", "compact"))
    val bands = DedupOps.minhashBands(spark, Sf)
    assert(h(0).getLong(2) == bands.where(col("doc_id") % 2 === 0).count())
    assert(h(1).getLong(2) == bands.where(col("doc_id") % 2 === 1).count())
    assert(h(2).getLong(2) == bands.count())
    // the dedup read is genuinely the v0 snapshot: the full table (v1)
    // also holds the batch's signatures
    val root = DedupOps.minhashIndexTx(spark, Sf)
    import graft.sources.TxTable
    assert(TxTable.read(spark, root, asOf = Some(0L))
      .where(col("doc_id") % 2 === 1).count() == 0)
    assert(TxTable.read(spark, root)
      .where(col("doc_id") % 2 === 1).count() > 0)
  }

  test("bloomIndexScan: key-only probes skip via blooms where ranges cannot") {
    import graft.sources.TxTable
    val root = DedupOps.minhashIndexTx(spark, Sf)
    val key = TxTable.readWhere(spark, root, col("band_no") === DedupOps.ProbeBand)
      .agg(min(col("band_key"))).head().getString(0)
    // the compacted layout sorts by (band_no, band_key): every file's
    // band_key [min,max] spans essentially the whole md5 space, so a
    // key-only equality probe is range-unskippable — the per-file blooms
    // recorded by the compaction are what must prove absence
    val (kept, skipped) = TxTable.pruneFiles(spark, root, col("band_key") === key)
    assert(kept.size + skipped.size == 4, s"expected the 4-file layout")
    assert(skipped.nonEmpty, "blooms should prove at least one file key-free")
    // result identity: the pruned read loses no occurrence of the key
    val full = TxTable.read(spark, root).where(col("band_key") === key)
      .collect().map(_.toString).sorted.toSeq
    val pruned = TxTable.readWhere(spark, root, col("band_key") === key)
      .collect().map(_.toString).sorted.toSeq
    assert(full == pruned && full.nonEmpty)
    // an absent digest: whatever the blooms keep (false positives allowed),
    // the read is exactly empty
    val absent = "0" * 32
    assert(TxTable.readWhere(spark, root, col("band_key") === absent).count() == 0L)
    val (_, sAbsent) = TxTable.pruneFiles(spark, root, col("band_key") === absent)
    assert(sAbsent.nonEmpty)
  }

  test("dupSpans: coverage matches a driver-side recompute of cross-doc 5-gram spans") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val n = DedupOps.DupSpanN
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, w) =>
      (0 to w.length - n).foreach { p =>
        val g = w.slice(p, p + n).mkString(" ")
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    val dup = gramDocs.filter(_._2.size >= 2).keySet
    val expect = docs.collect { case (id, w) if w.length >= n =>
      val covered = (0 to w.length - n).flatMap { p =>
        val g = w.slice(p, p + n).mkString(" ")
        if (dup.contains(g)) p until p + n else Nil
      }.toSet
      id -> (w.length.toLong, covered.size.toLong)
    }
    val got = DedupOps.dupSpans(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect && got.nonEmpty)
    assert(got.exists(_._2._2 > 0)) // planted near-dups produce real spans
    got.foreach { case (id, (nt, nd)) => assert(nd <= nt, s"doc $id") }
  }

  test("lmScores: self-trained bigram cross-entropy matches a driver-side model") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val bigrams = docs.toSeq.flatMap { case (id, w) =>
      w.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))).toSeq
    }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size }
    val c1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size }
    val v = docs.values.flatten.toSet.size
    val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, w1, w2) =>
        math.log((c12((w1, w2)) + 1).toDouble / (c1(w1) + v)) / math.log(2.0)
      }.sum
      id -> (bs.size.toLong, -s / bs.size)
    }
    val got = TextOps.lmScores(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { case (id, nb, nll) =>
      val (enb, enll) = expect(id)
      assert(nb == enb, s"doc $id")
      assert(math.abs(nll - enll) < 1e-5, s"doc $id: $nll vs $enll")
      assert(nll > 0, s"doc $id") // probabilities < 1 so bits are positive
    }
  }

  test("tokenEntropy: bounded by log2(n); uniform and degenerate cases exact") {
    val n = TextOps.tokenEntropy(spark, Sf).collect()
    assert(n.nonEmpty)
    n.foreach { r =>
      val (cnt, h) = (r.getLong(1), r.getDouble(2))
      // 5e-7 slack: the emitted entropy is rounded to 6 dp, which can tip
      // the exact log2(n) bound by half an ulp of the rounding grid
      assert(h >= -5e-7 && h <= math.log(cnt.toDouble) / math.log(2.0) + 5e-7,
        s"doc ${r.getLong(0)}: h=$h n=$cnt")
    }
    // independent recompute for one doc
    val doc = Tables.documents(spark, Sf).select("doc_id", "text")
      .orderBy("doc_id").limit(1).collect().head
    val counts = doc.getString(1).split(" ", -1).groupBy(identity).map(_._2.length)
    val tot = counts.sum.toDouble
    val expect = counts.map { c =>
      -(c / tot) * (math.log(c / tot) / math.log(2.0))
    }.sum
    val got = n.find(_.getLong(0) == doc.getLong(0)).get.getDouble(2)
    assert(math.abs(got - expect) < 1e-6)
  }

  test("dsirWeights: full driver-side recompute of hashed-bigram log-ratio weights") {
    // in_target read from the (independently oracle-verified) quality rule
    val inTarget = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"),
        TextFunctions.words(col("text")).as("w"))
      .collect().map { r =>
        val wds = r.getAs[scala.collection.Seq[String]]("w")
        val stop = TextFunctions.LangProfiles.head._2
        val hits = wds.count(w => stop.contains(w))
        val q = math.min(wds.size / 100.0, 1.0) * (0.5 + 0.5 * hits.toDouble / wds.size)
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
          q >= TextOps.MinQuality)
      }
    def h24mod(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % TextOps.DsirBuckets
    }
    // per-doc hashed-bigram counts, then the Laplace-smoothed stats
    val docFeats = inTarget.map { case (id, text, t) =>
      val w = text.split(" ", -1)
      val fs = w.sliding(2).filter(_.length == 2)
        .map(p => h24mod(p(0) + " " + p(1))).toSeq
        .groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
      (id, t, fs)
    }.filter(_._3.nonEmpty)
    val sc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val tc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docFeats.foreach { case (_, t, fs) => fs.foreach { case (f, c) =>
      sc(f) += c; if (t) tc(f) += c
    }}
    val (sTot, tTot) = (sc.values.sum, tc.values.sum)
    val logr = sc.keys.map { f =>
      f -> (math.log((tc(f) + 1).toDouble / (tTot + TextOps.DsirBuckets)) -
        math.log((sc(f) + 1).toDouble / (sTot + TextOps.DsirBuckets)))
    }.toMap
    val expect = docFeats.map { case (id, _, fs) =>
      id -> fs.map { case (f, c) => c * logr(f) }.sum
    }.toMap
    val got = TextOps.dsirWeights(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("dsir_weight"),
          r.getAs[Boolean]("selected"))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (nf, dw, sel)) =>
      assert(nf == docFeats.find(_._1 == id).get._3.values.sum)
      assert(math.abs(dw - expect(id)) < 2e-6, s"doc $id: $dw vs ${expect(id)}")
      assert(sel == (dw > 0))
    }
    // the rule genuinely splits the corpus at test SF
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("gopherRules: bitmap matches a driver-side recompute; passes is the conjunction") {
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = TextFunctions.LangProfiles.head._2.toSet
    val rows = TextOps.gopherRules(spark, Sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val w = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      val meanLen = w.map(_.length).sum.toDouble / w.length
      val exp = Seq(
        w.length >= TextOps.GopherMinWords,
        meanLen >= TextOps.GopherMeanWordLen._1 && meanLen <= TextOps.GopherMeanWordLen._2,
        w.map(_.length).max <= TextOps.GopherMaxWordLen,
        w.count(stop) >= TextOps.GopherMinStops,
        w.count(_.exists(_.isLetter)).toDouble / w.length > TextOps.GopherMinAlpha)
      val got = Seq("r_min_words", "r_mean_word_len", "r_max_word_len",
        "r_stop_words", "r_alpha_words").map(r.getAs[Boolean])
      assert(got == exp, s"doc ${r.getLong(0)}: $got vs $exp")
      assert(r.getAs[Boolean]("passes") == exp.forall(identity))
    }
    // the conjunction genuinely splits the corpus at test SF
    assert(rows.exists(_.getAs[Boolean]("passes")) &&
      rows.exists(!_.getAs[Boolean]("passes")))
  }

  test("sourceFilter: per-source shares recompute from the doc-level verdicts; rule splits") {
    val passes = TextOps.gopherRules(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("passes")).toMap
    val dups = DedupOps.exactDedup(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_dup")).toMap
    val bySource = Tables.documents(spark, Sf).select("doc_id", "source").collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .map { case (s, v) => s -> v.map(_._2) }
    val rows = TextOps.sourceFilter(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == bySource.keySet)
    rows.foreach { r =>
      val ids = bySource(r.getString(0))
      val (n, np, nd) =
        (ids.length.toLong, ids.count(passes).toLong, ids.count(dups).toLong)
      assert(r.getLong(1) == n && r.getLong(2) == np && r.getLong(3) == nd)
      assert(r.getDouble(4) == np.toDouble / n && r.getDouble(5) == nd.toDouble / n)
      assert(r.getBoolean(6) == (np * 100 >= n * TextOps.SourceMinPassPct))
      assert(r.getBoolean(7) == (nd * 100 <= n * TextOps.SourceMaxDupPct))
      assert(r.getBoolean(8) == (r.getBoolean(6) && r.getBoolean(7)))
    }
    // the quality threshold genuinely splits the fixture's sources
    assert(rows.exists(_.getBoolean(8)) && rows.exists(!_.getBoolean(8)))
  }

  test("blocklistScrub: counts/verdicts/redaction recompute; all three verdicts occur") {
    val pat = ("\\b(" + TextOps.BlocklistTerms.mkString("|") + ")\\b").r
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.blocklistScrub(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSet == texts.keySet)
    rows.foreach { r =>
      val text = texts(r.getLong(0))
      val (nw, nh) =
        (text.split(" ").length.toLong, pat.findAllIn(text).length.toLong)
      assert(r.getLong(1) == nw && r.getLong(2) == nh)
      assert(r.getDouble(3) == nh.toDouble / nw)
      val exp = if (nh == 0) "keep"
        else if (nh * 100 < nw * TextOps.ScrubMaxHitPct) "scrub" else "drop"
      assert(r.getString(4) == exp, s"doc ${r.getLong(0)} verdict")
      if (exp == "drop") assert(r.isNullAt(5))
      else {
        val scrubbed = r.getString(5)
        assert(scrubbed == pat.replaceAllIn(text, "[REDACTED]"))
        assert(pat.findFirstIn(scrubbed).isEmpty, "blocklisted term survived")
        if (exp == "keep") assert(scrubbed == text)
      }
    }
    // the policy genuinely exercises all three branches at test SF
    val verdicts = rows.map(_.getString(4)).toSet
    assert(verdicts == Set("keep", "scrub", "drop"), verdicts.toString)
  }

  test("sourceLangMix: counts and Simpson diversity recompute from raw docs") {
    val docs = Tables.documents(spark, Sf).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    val rows = TextOps.sourceLangMix(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == bySource.keySet)
    rows.foreach { r =>
      val langs = bySource(r.getString(0)).map(_._2)
      val counts = langs.groupBy(identity).view.mapValues(_.length.toLong)
      val n = langs.length.toLong
      assert(r.getLong(1) == n && r.getLong(2) == counts.size.toLong)
      val sumSq = counts.values.map(c => c * c).sum
      assert(r.getDouble(3) == 1.0d - sumSq.toDouble / (n * n).toDouble)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
    // the fixture's sources are genuinely multilingual
    assert(rows.forall(_.getLong(2) > 1))
  }

  test("searchSnippets: first-hit windows recompute; every match doc contributes every term") {
    import graft.functions.TextFunctions.words
    val matchDocs = TextOps.keywordSearch(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    assert(matchDocs.nonEmpty)
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val rows = TextOps.searchSnippets(spark, Sf).collect()
    assert(rows.length == matchDocs.size * TextOps.SearchTerms.length)
    rows.foreach { r =>
      val (id, term, pos, snip) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      assert(matchDocs.contains(id))
      val w = texts(id)
      assert(pos == w.indexOf(term) + 1, s"doc $id term $term pos")
      val s = math.max(pos.toInt - TextOps.SnippetRadius, 1)
      val e = math.min(pos.toInt + TextOps.SnippetRadius, w.length)
      assert(snip == w.slice(s - 1, e).mkString(" "), s"doc $id term $term")
      assert(snip.split(" ").contains(term))
      assert(snip.split(" ").length <= 2 * TextOps.SnippetRadius + 1)
    }
  }

  test("spanRemoval: reconciles with dupSpans; cleaned text is the uncovered subsequence") {
    val spans = DedupOps.dupSpans(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = DedupOps.spanRemoval(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSet == spans.keySet)
    // recompute covered positions from first principles
    val docWords = texts.view.mapValues(_.split(" ")).toMap
    val gramOwners = scala.collection.mutable.Map.empty[String, Set[Long]]
    docWords.foreach { case (id, w) =>
      if (w.length >= DedupOps.DupSpanN)
        w.sliding(DedupOps.DupSpanN).foreach { g =>
          val k = g.mkString(" ")
          gramOwners(k) = gramOwners.getOrElse(k, Set.empty) + id
        }
    }
    rows.foreach { r =>
      val (id, nTok, nRem, cleaned) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val w = docWords(id)
      assert(nTok == w.length.toLong)
      val covered = (0 to w.length - DedupOps.DupSpanN).flatMap { p =>
        val g = w.slice(p, p + DedupOps.DupSpanN).mkString(" ")
        if (gramOwners(g).size >= 2) p until p + DedupOps.DupSpanN else Nil
      }.toSet
      assert(nRem == covered.size.toLong, s"doc $id removed count")
      assert(nRem == spans(id), s"doc $id disagrees with dupSpans")
      val expect = w.indices.filterNot(covered).map(w).mkString(" ")
      assert(cleaned == expect, s"doc $id cleaned text")
      if (nRem == 0) assert(cleaned == texts(id))
    }
    // the fixture exercises untouched, partial, and fully-removed docs
    val states = rows.map(r => (r.getLong(2), r.getLong(1))).map {
      case (0, _) => "none"; case (rm, nt) if rm == nt => "all"; case _ => "part"
    }.toSet
    assert(states == Set("none", "part", "all"), states.toString)
  }

  test("tokenBudget: closed-form waterfill matches a driver recompute; allocations fill the budget") {
    import graft.functions.TextFunctions.words
    val caps = Tables.documents(spark, Sf)
      .select(col("source"), explode(words(col("text"))).as("w")).collect()
      .map(r => r.getString(0)).groupBy(identity)
      .map { case (s, v) => s -> v.length.toLong }
    val total = caps.values.sum
    val budget = total * TextOps.BudgetNumer / TextOps.BudgetDenom
    // reference waterfill: sort ascending, binding prefix, one level
    val sorted = caps.toSeq.sortBy { case (s, c) => (c, s) }
    var (cum, nBind) = (0L, 0)
    sorted.zipWithIndex.foreach { case ((_, c), i) =>
      val k = sorted.length - i
      if (c * k <= budget - cum && nBind == i) { cum += c; nBind += 1 }
    }
    val level = (budget - cum).toDouble / (sorted.length - nBind)
    val rows = TextOps.tokenBudget(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == caps.keySet)
    sorted.zipWithIndex.foreach { case ((s, c), i) =>
      val (nt, binding, alloc, share) = rows(s)
      assert(nt == c)
      assert(binding == (i < nBind), s"source $s binding prefix broken")
      val expAlloc = if (binding) c.toDouble else level
      assert(alloc == expAlloc && share == expAlloc / budget, s"source $s")
      if (!binding) assert(c.toDouble >= alloc, "a non-binding source over-allocated")
    }
    // both states occur and the allocations exactly exhaust the budget
    assert(nBind > 0 && nBind < sorted.length)
    assert(math.abs(rows.values.map(_._3).sum - budget) < 1e-6 * budget)
  }

  test("fuzzyDecontam: hits are real band collisions; estimate matches the signatures") {
    def isBench(i: Long): Boolean =
      i % DedupOps.FuzzyBenchMod == 0 && i < DedupOps.FuzzyBenchCap
    val bands = DedupOps.minhashBands(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val benchBands = bands.filter(b => isBench(b._1)).map(b => (b._2, b._3) -> b._1)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val sigs = DedupOps.minhashSignatures(spark, Sf).collect()
      .map(r => r.getLong(0) -> (1 to DedupOps.NumHashes).map(j => r.getAs[Long](s"mh$j")))
      .toMap
    // expected: corpus doc -> set of bench docs sharing any band bucket
    val expHits = bands.filter(b => !isBench(b._1))
      .flatMap(b => benchBands.getOrElse((b._2, b._3), Set.empty).map(b._1 -> _))
      .distinct.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    val got = DedupOps.fuzzyDecontam(spark, Sf).collect()
    assert(got.map(_.getLong(0)).toSet == expHits.keySet)
    got.foreach { r =>
      val doc = r.getLong(0)
      val hits = expHits(doc)
      assert(r.getLong(1) == hits.size, s"doc $doc n_bench_hits")
      def est(b: Long): Double =
        sigs(doc).zip(sigs(b)).count { case (x, y) => x == y }.toDouble /
          DedupOps.NumHashes
      // best = highest estimate, smallest bench id on ties
      val best = hits.toSeq.map(b => (-est(b), b)).min._2
      assert(r.getLong(2) == best, s"doc $doc best_bench_id")
      assert(r.getDouble(3) == est(best), s"doc $doc jaccard_est")
      assert(r.getBoolean(4) == (est(best) >= DedupOps.FuzzyContamMinEst))
    }
  }

  test("leakSafeSplits: clusters stay whole; singletons match the naive split") {
    val rows = TextOps.leakSafeSplits(spark, Sf).collect()
    val nDocs = Tables.documents(spark, Sf).count()
    assert(rows.length == nDocs)
    val clusters = DedupOps.duplicateClusters(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = rows.filter(r => clusters.contains(r.getLong(0)))
      .groupBy(r => clusters(r.getLong(0)))
    assert(byCluster.nonEmpty, "test corpus has no duplicate clusters")
    // every cluster lands wholly in ONE split
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getString(2)).toSet.size == 1, s"cluster $cid split")
    }
    rows.foreach { r =>
      val (doc, key) = (r.getLong(0), r.getLong(1))
      assert(key == clusters.getOrElse(doc, doc), s"doc $doc split_key")
      if (!clusters.contains(doc))
        assert(r.getString(2) == r.getString(3), s"singleton $doc moved")
      assert(r.getBoolean(4) == (r.getString(2) != r.getString(3)))
    }
  }

  test("matryoshkaRecall: per-dim prefix top-k overlap recomputes exactly") {
    import graft.operators.SimilarityOps
    val vecs = Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = vecs.filter(v => v._1 % 100 == 0 && v._1 < SimilarityOps.QueryPanelCap)
    def cos(a: Array[Float], b: Array[Float], m: Int): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.take(m).zip(y.take(m)).map { case (p, q) => p.toDouble * q.toDouble }.sum
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def topk(m: Int): Map[Long, Set[Long]] = queries.map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map(v => (v._1, cos(q, v._2, m)))
        .sortBy { case (id, c) => (-c, id) }
        .take(SimilarityOps.TopK).map(_._1).toSet
    }.toMap
    val exact = topk(vecs.head._2.length)
    val rows = SimilarityOps.matryoshkaRecall(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == SimilarityOps.MatryoshkaDims.map(_.toLong).toSet)
    SimilarityOps.MatryoshkaDims.foreach { m =>
      val hits = topk(m).map { case (qid, ids) => (ids & exact(qid)).size }.sum
      val (nq, th, r) = rows(m.toLong)
      assert(nq == queries.length && th == hits.toLong,
        s"dims $m: got $th hits want $hits")
      assert(r == hits.toDouble / (queries.length * SimilarityOps.TopK))
    }
  }

  test("hardNegatives: top-k highest-cosine different-label vectors per query") {
    import graft.operators.SimilarityOps
    val vecs = Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val queries = vecs.filter(v => v._1 % 100 == 0 && v._1 < SimilarityOps.QueryPanelCap)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SimilarityOps.hardNegatives(spark, Sf).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == queries.map(_._1).toSet)
    queries.foreach { case (qid, q, qLabel) =>
      val exp = vecs.filter(_._3 != qLabel)
        .map(v => (v._1, cos(q, v._2)))
        .sortBy { case (id, c) => (-c, id) }
        .take(SimilarityOps.HardNegK)
      val rows = got(qid).sortBy(_.getLong(4))
      assert(rows.length == exp.length)
      rows.zip(exp).zipWithIndex.foreach { case ((r, (id, c)), i) =>
        assert(r.getLong(1) == id && r.getDouble(3) == c && r.getLong(4) == i + 1,
          s"query $qid rank ${i + 1}: got (${r.getLong(1)}, ${r.getDouble(3)}) want ($id, $c)")
      }
      // negatives only: no returned row carries the query's label
      rows.foreach(r => assert(r.getInt(2) != qLabel))
    }
  }

  test("JaroWinkler expression: textbook vectors, edge cases, and codegen/interpreted agreement") {
    import graft.functions.StringSimilarity.jaroWinkler
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(jaroWinkler("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(jaroWinkler("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(close(jaroWinkler("DWAYNE", "DUANE"), 0.84))
    assert(close(jaroWinkler("JELLYFISH", "SMELLYFISH"), 0.8962962962962964))
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(close(jaroWinkler("abcdxxxx", "abcdyyyyzz"), 0.6333333333333333))
    // prefix bonus caps at 4 shared chars
    assert(close(jaroWinkler("aaaaa", "aaaaaaaaaaaaaaaaaaaa"), 0.85))
    assert(jaroWinkler("", "") == 0.0 && jaroWinkler("", "abc") == 0.0)
    assert(jaroWinkler("abc", "abc") == 1.0)
    // transpositions halve by INTEGER division (3 mismatches -> t = 1)
    assert(close(jaroWinkler("abcdef", "bcadef"), 0.9444444444444445))
    // the Column path (codegen) agrees with the static helper bit-for-bit
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("red widget", "red gadget"),
      ("DIXON", "DICKSONX"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val viaExpr = pairs
      .withColumn("jw", graft.functions.StringSimilarity.jaroWinklerCol(spark, "a", "b"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getDouble(2) == jaroWinkler(r.getString(0), r.getString(1)))
    }
  }

  test("jaroNamePairs: vocab-collapsed pairs recompute driver-side") {
    val names = Tables.part(spark, Sf)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = (for {
      a <- names.keys; b <- names.keys if a < b
      jw = BigDecimal(graft.functions.StringSimilarity.jaroWinkler(a, b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jw >= DedupOps.JwThreshold
    } yield (a, b, names(a), names(b), jw)).toSet
    val got = DedupOps.jaroNamePairs(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expect && got.nonEmpty)
    // the scorer is doing real fuzzy work: reported pairs are distinct
    // names (jw < 1), not exact-string matches
    assert(got.exists { case (_, _, _, _, jw) => jw < 1.0 })
  }

  test("jaroMutualBest: reciprocal top-1 assignment recomputes from the pair table") {
    val pairs = DedupOps.jaroNamePairs(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    val sym = pairs.flatMap { case (a, b, jw) => Seq((a, b, jw), (b, a, jw)) }
    val best = sym.groupBy(_._1).map { case (name, cands) =>
      name -> cands.minBy(c => (-c._3, c._2))._2
    }
    val expect = best.collect {
      case (a, b) if a < b && best.get(b).contains(a) =>
        (a, b, sym.find(s => s._1 == a && s._2 == b).get._3)
    }.toSet
    val got = DedupOps.jaroMutualBest(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expect && got.nonEmpty)
    // the assignment is 1:1 — no name appears in two surviving links
    val members = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(members.distinct.size == members.size)
    // and strictly smaller than the raw candidate cloud
    assert(got.size < pairs.length)
  }

  test("sourceJsDrift: per-source JS divergence recomputes from driver-side distributions") {
    val toks = Tables.documents(spark, Sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    val bySrcTok = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTok = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nTot = toks.length.toLong
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def js(src: String): Double = {
      val nS = bySrc(src); val nR = nTot - nS
      var s = 0.0
      byTok.keys.foreach { t =>
        val c = bySrcTok.getOrElse((src, t), 0L)
        val r = byTok(t) - c
        val p = c.toDouble / nS; val q = r.toDouble / nR
        val m = (p + q) / 2.0
        if (c > 0) s += 0.5 * p * log2(p / m)
        if (r > 0) s += 0.5 * q * log2(q / m)
      }
      s
    }
    val got = TextOps.sourceJsDrift(spark, Sf).collect()
    assert(got.length == bySrc.size && got.nonEmpty)
    got.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) == bySrc(src), s"$src token count")
      // the closed-form absent-mass shortcut equals the full naive sum
      assert(math.abs(r.getDouble(2) - js(src)) < 2e-6, s"$src js")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // sources genuinely differ from the rest somewhere
    assert(got.map(_.getDouble(2)).max > 0.0)
  }

  test("zipfFit: log-log OLS recomputes from a driver-side rank-frequency table") {
    val freqs = Tables.documents(spark, Sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
      .take(TextOps.ZipfFitTop)
    def log2(v: Double) = math.log(v) / math.log(2.0)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (log2((i + 1).toDouble), log2(f.toDouble))
    }
    val k = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    val num = k * sxy - sx * sy
    val den = k * sxx - sx * sx
    val r = TextOps.zipfFit(spark, Sf).collect().head
    assert(r.getLong(0) == pts.length.toLong)
    assert(math.abs(r.getDouble(1) - num / den) < 2e-6)
    assert(math.abs(r.getDouble(2) - (sy - num / den * sx) / k) < 2e-6)
    assert(math.abs(r.getDouble(3) - num * num / (den * (k * syy - sy * sy))) < 2e-6)
    // the synthetic near-uniform vocabulary is rightly NOT Zipfian: the
    // slope sits far above the natural-corpus -1 — a true detection of
    // templated text, the op's purpose
    assert(r.getDouble(1) > -0.6 && r.getDouble(1) <= 0.0)
    assert(r.getDouble(3) < 0.5)
  }

  test("keyphrases: per-doc tf-idf top-k recomputes against a driver-side rank") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val tf = docs.toSeq.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (t, g) => (id, t, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val n = docs.size.toLong
    val expect = tf.groupBy(_._1).flatMap { case (id, ts) =>
      ts.map { case (_, t, f) => (t, f.toDouble * (n.toDouble / dfm(t))) }
        .sortBy { case (t, s) => (-s, t) }.take(TextOps.KeyphraseK)
        .map { case (t, s) => (id, t,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toSet
    val got = TextOps.keyphrases(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expect && got.nonEmpty)
    // every document got at most k phrases and at least one
    val perDoc = got.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.forall(s => s >= 1 && s <= TextOps.KeyphraseK))
    assert(perDoc.size == docs.size)
  }

  test("searchRbo: rank-biased overlap recomputes from the two search rankings") {
    def ranking(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(r => (r.getLong(0), r.getDouble(2)))
        .sortBy { case (id, s) => (-s, id) }.map(_._1).toSeq
    val s1 = ranking(TextOps.rankedSearch(spark, Sf))
    val s2 = ranking(TextOps.bm25Search(spark, Sf))
    val k = TextOps.SearchTopK
    val ads = (1 to k).map { d =>
      d -> s1.take(d).toSet.intersect(s2.take(d).toSet).size
    }
    val exp = TextOps.RboOneMinusP * ads.map { case (d, a) =>
      math.pow(TextOps.RboP, (d - 1).toDouble) * (a.toDouble / d.toDouble)
    }.sum
    val r = TextOps.searchRbo(spark, Sf).collect().head
    assert(r.getLong(0) == k.toLong)
    assert(r.getLong(1) == ads.last._2.toLong)
    assert(math.abs(r.getDouble(2) - exp) < 2e-6)
    // RBO is top-weighted and bounded
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    // the two scorers genuinely disagree somewhere on this fixture (if they
    // were identical rankings the metric would be exactly 1)
    assert(r.getDouble(2) < 1.0)
  }

  test("edit1Pairs: FastSS deletion-neighborhood blocking reproduces brute-force levenshtein<=1 exactly") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.customer(spark, Sf).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expect = (for {
      (ka, na) <- names; (kb, nb) <- names if ka < kb
      d = lev(na, nb) if d <= 1
    } yield (ka, kb, na, nb, d)).toSet
    val got = DedupOps.edit1Pairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4))).toSet
    assert(got == expect)
    // the zero-padded key fixture genuinely exercises the blocking: many
    // true distance-1 pairs, and brute force found them all
    assert(expect.nonEmpty)
    // transposition pairs ("...01"/"...10") are delete-1-variant-sharing
    // candidates at distance 2 — set equality above proves the verify
    // discarded them rather than the blocking missing anything
  }

  test("fellegiSunter: u-estimates, log-likelihood scores, and verdicts recompute driver-side") {
    val cust = Tables.customer(spark, Sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2),
        math.floor(r.getDouble(3) / 1000).toLong)).toMap
    val n = cust.size.toLong
    def u[T](f: ((Int, String, Long)) => T): Double = {
      val num = cust.values.groupBy(f).values.map(g => { val c = g.size.toLong; c * c }).sum
      num.toDouble / (n * n).toDouble
    }
    val (uNat, uSeg, uBal) = (u(_._1), u(_._2), u(_._3))
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def term(agree: Boolean, m: Double, uu: Double) =
      if (agree) log2(m / uu) else log2((1 - m) / (1.0 - uu))
    val rows = DedupOps.fellegiSunter(spark, Sf).collect()
    assert(rows.nonEmpty)
    // same candidate cardinality as the blocking stage
    assert(rows.length.toLong == DedupOps.edit1Pairs(spark, Sf).count())
    rows.foreach { r =>
      val (a, b) = (cust(r.getLong(0)), cust(r.getLong(1)))
      val (an, as_, ab) = (a._1 == b._1, a._2 == b._2, a._3 == b._3)
      assert(r.getBoolean(2) == an && r.getBoolean(3) == as_ &&
        r.getBoolean(4) == ab)
      val exp = term(an, DedupOps.FsMNation, uNat) +
        term(as_, DedupOps.FsMSegment, uSeg) +
        term(ab, DedupOps.FsMBalband, uBal)
      assert(math.abs(r.getDouble(5) - exp) < 2e-6,
        s"pair ${r.getLong(0)}/${r.getLong(1)}: ${r.getDouble(5)} vs $exp")
      val v = if (r.getDouble(5) >= DedupOps.FsLinkMin) "link"
        else if (r.getDouble(5) >= DedupOps.FsPossibleMin) "possible"
        else "non_link"
      assert(r.getString(6) == v)
    }
    // the scorer genuinely splits the candidate cloud
    assert(rows.map(_.getString(6)).distinct.length > 1)
  }

  test("langidEval: confusion counts and PRF recompute from the oracle-verified predictions") {
    val preds = TextOps.languageId(spark, Sf)
      .select(col("doc_id"), col("predicted_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val langs = truth.values.toSet
    val got = TextOps.langidEval(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == langs)
    langs.foreach { l =>
      val nTrue = truth.count(_._2 == l).toLong
      val nPred = preds.count(_._2 == l).toLong
      val tp = truth.count { case (id, t) => t == l && preds(id) == l }.toLong
      val r = got(l)
      assert(r.getLong(1) == nTrue && r.getLong(2) == nPred && r.getLong(3) == tp)
      val p = if (nPred > 0) tp.toDouble / nPred.toDouble else 0.0
      val rc = tp.toDouble / nTrue.toDouble
      assert(r.getDouble(4) == p && r.getDouble(5) == rc)
      val f1 = if (p + rc > 0) 2.0 * p * rc / (p + rc) else 0.0
      assert(r.getDouble(6) == f1)
      assert(p >= 0 && p <= 1 && rc >= 0 && rc <= 1)
    }
    // the heuristic is genuinely informative on the fixture: at least one
    // language is classified better than chance (5 classes -> 0.2)
    assert(got.values.exists(_.getDouble(6) > 0.2))
  }

  test("perplexityBuckets: exact tercile splits, ordered NLL envelopes per language") {
    val rows = TextOps.perplexityBuckets(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val scored = TextOps.lmScores(spark, Sf).select(col("doc_id")).count()
    assert(rows.values.map(_._1).sum == scored)
    val langs = rows.keys.map(_._1).toSet
    for (l <- langs) {
      val n = rows.collect { case ((`l`, _), v) => v._1 }.sum
      // integer tercile sizes: head floor(n/3), middle floor(2n/3)-floor(n/3)
      assert(rows.get((l, "head")).forall(_._1 == n / 3))
      assert(rows.get((l, "middle")).forall(_._1 == 2 * n / 3 - n / 3))
      assert(rows.get((l, "tail")).forall(_._1 == n - 2 * n / 3))
      // envelopes are ordered: head's max <= middle's min <= tail's min
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
           if rows.contains((l, a)) && rows.contains((l, b)))
        assert(rows((l, a))._3 <= rows((l, b))._2)
      // mean sits inside the envelope
      for (b <- Seq("head", "middle", "tail"); v <- rows.get((l, b)))
        assert(v._2 <= v._4 && v._4 <= v._3)
    }
  }

  test("sourceDupRate: redundant counts replay from the cluster table") {
    val got = DedupOps.sourceDupRate(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val redundant = DedupOps.duplicateClusters(spark, Sf)
      .where(!col("is_canonical")).collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._2).toSet)
    for ((src, (n, nr, rate)) <- got) {
      val mine = docs.filter(_._2 == src)
      assert(n == mine.length)
      assert(nr == mine.count(d => redundant(d._1)))
      assert(rate == nr.toDouble / n)
    }
    // the fixture has real duplication and it concentrates somewhere
    assert(got.values.map(_._2).sum > 0)
  }

  test("lshEval: precision and independent-family recall replay from the staged tables") {
    val r = DedupOps.lshEval(spark, Sf).collect().head
    val cand = DedupOps.minhashCandidates(spark, Sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val nTrue = DedupOps.jaccardOnCandidates(spark, Sf)
      .where(col("jaccard") >= DedupOps.ClusterMinJaccard).count()
    val audit = DedupOps.ngramJaccard(spark, Sf).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.getLong(0) == cand.size)
    assert(r.getLong(1) == nTrue)
    assert(r.getLong(3) == audit.size)
    assert(r.getLong(4) == (audit & cand).size)
    assert(r.getDouble(2) == nTrue.toDouble / cand.size)
    assert(r.getDouble(5) == (audit & cand).size.toDouble / audit.size)
    // the eval is non-vacuous on the fixture: both families find pairs,
    // and the bands catch a recognizable share of the independent truth
    assert(cand.nonEmpty && audit.nonEmpty)
    assert(r.getDouble(5) > 0.5, s"banding recall ${r.getDouble(5)}")
  }

  test("qualityClassifier: two IRLS steps replay exactly driver-side") {
    val r = TextOps.qualityClassifier(spark, Sf).collect().head
    // independent replay: features, softsign IRLS, Cramer — in plain Scala
    val stops = graft.functions.TextFunctions.LangProfiles.head._2.toSet
    val feats = Tables.documents(spark, Sf)
      .select(col("lang"), col("text")).collect().map { row =>
      val toks = row.getString(1).split(" ", -1)
      val y = if (row.getString(0) == "en") 1.0 else 0.0
      val x1 = toks.count(stops).toDouble / toks.length
      val x2 = toks.map(_.length).sum.toDouble / toks.length
      (y, x1, x2)
    }
    def q(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def step(beta: (Double, Double, Double)): (Double, Double, Double) = {
      var (s00, s01, s02, s11, s12, s22, b0, b1, b2) =
        (BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0),
          BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
      for ((y, x1, x2) <- feats) {
        val t = beta._1 + beta._2 * x1 + beta._3 * x2
        val p = 0.5 + 0.5 * t / (1.0 + math.abs(t))
        val w = p * (1.0 - p)
        val z = t + (y - p) / w
        s00 += q(w); s01 += q(w * x1); s02 += q(w * x2)
        s11 += q(w * x1 * x1); s12 += q(w * x1 * x2); s22 += q(w * x2 * x2)
        b0 += q(w * z); b1 += q(w * x1 * z); b2 += q(w * x2 * z)
      }
      val (d00, d01, d02, d11, d12, d22, e0, e1, e2) =
        (s00.toDouble, s01.toDouble, s02.toDouble, s11.toDouble,
          s12.toDouble, s22.toDouble, b0.toDouble, b1.toDouble, b2.toDouble)
      val det = d00 * (d11 * d22 - d12 * d12) -
        d01 * (d01 * d22 - d12 * d02) + d02 * (d01 * d12 - d11 * d02)
      ((e0 * (d11 * d22 - d12 * d12) - d01 * (e1 * d22 - d12 * e2) +
        d02 * (e1 * d12 - d11 * e2)) / det,
        (d00 * (e1 * d22 - d12 * e2) - e0 * (d01 * d22 - d12 * d02) +
          d02 * (d01 * e2 - e1 * d02)) / det,
        (d00 * (d11 * e2 - e1 * d12) - d01 * (d01 * e2 - e1 * d02) +
          e0 * (d01 * d12 - d11 * d02)) / det)
    }
    val beta = step(step((0.0, 0.0, 0.0)))
    assert(math.abs(r.getDouble(0) - beta._1) < 1e-9, s"beta0 ${r.getDouble(0)} vs $beta")
    assert(math.abs(r.getDouble(1) - beta._2) < 1e-9)
    assert(math.abs(r.getDouble(2) - beta._3) < 1e-9)
    val preds = feats.map { case (y, x1, x2) =>
      (y, beta._1 + beta._2 * x1 + beta._3 * x2 > 0.0) }
    assert(r.getLong(3) == feats.length)
    assert(r.getLong(4) == feats.count(_._1 == 1.0))
    assert(r.getLong(5) == preds.count(p => p._1 == 1.0 && p._2))   // tp
    assert(r.getLong(6) == preds.count(p => p._1 == 0.0 && p._2))   // fp
    assert(r.getLong(7) == preds.count(p => p._1 == 1.0 && !p._2))  // fn
    assert(r.getLong(8) == preds.count(p => p._1 == 0.0 && !p._2))  // tn
    assert(r.getDouble(9) ==
      (r.getLong(5) + r.getLong(8)).toDouble / feats.length.toDouble)
  }
}
