package graft

import graft.operators.{DedupOps, ScaleOps}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("bucketed join: sort-merge join and aggregation run with zero exchanges") {
    val df = ScaleOps.bucketedOrderRevenue(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side or the aggregation:\n$plan")
    // the scans themselves carry the bucket spec
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
    assert(df.count() == 10)
  }

  test("bucketed join result is identical to the plain-layout join") {
    val bucketed = ScaleOps.bucketedOrderRevenue(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val o = Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .as("rev"))
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev")).as("revenue_dec"))
      .orderBy(col("revenue_dec").desc, col("o_orderkey")).limit(10)
      .select(col("o_orderkey"), col("o_orderdate"),
        col("revenue_dec").cast("double").as("revenue"))
      .collect().map(_.toSeq).toSeq
    assert(bucketed == plain)
  }

  test("saltedJoin spreads the key space and matches the unsalted join") {
    val salted = ScaleOps.saltedFlagRevenue(spark, Sf)
    // the physical join key carries the salt
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
    val got = salted.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.lineitem(spark, Sf)
      .groupBy(concat(lit("flag_"), lower(col("l_returnflag"))).as("flag_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    // every (key, salt) bucket is a strict subset of the key's rows: the
    // fact side really fans out over multiple sub-keys per flag
    val nSubKeys = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"),
        pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(ScaleOps.NumSalts))
          .as("salt"))
      .distinct().count()
    assert(nSubKeys > 3, s"expected >3 (flag, salt) sub-keys, got $nSubKeys")
  }

  test("pricePercentiles: monotone order statistics per flag") {
    val rows = ScaleOps.pricePercentiles(spark, Sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (p25, p50, p90, p99) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99,
        s"percentiles not monotone: $r")
    }
  }

  test("MinHashAgg UDAF signatures are bit-identical to the expression pipeline") {
    val viaExpr = DedupOps.minhashSignatures(spark, Sf)
      .collect().map(_.toSeq).toSet
    val viaUdaf = DedupOps.minhashSignaturesUdaf(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(viaUdaf == viaExpr)
  }

  test("MinHashAgg h24 matches the SQL-side md5-prefix hash") {
    import spark.implicits._
    val s = "1:the quick brown"
    val sqlSide = Seq(s).toDF("x")
      .select(Tables.h24(col("x"))).head.getLong(0)
    assert(graft.functions.MinHashAgg.h24(s) == sqlSide)
  }

  test("runtime bloom filter: injected under shuffle-join thresholds, result unchanged") {
    // Reference result under default confs (dim side broadcasts at this SF).
    val expect = ScaleOps.runtimeFilteredRevenue(spark, Sf).collect().map(_.toSeq).toSeq
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // Simulate the 100-TB regime: join can't broadcast, fact scan is
      // "large" relative to the activation threshold, dim side is small.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val df = ScaleOps.runtimeFilteredRevenue(spark, Sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter in:\n$optimized")
      assert(df.collect().map(_.toSeq).toSeq == expect)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
  test("incrementalMonthlyOrders: history-partial merge equals the full recompute exactly") {
    import org.apache.spark.sql.functions._
    val inc = ScaleOps.incrementalMonthlyOrders(spark, Sf)
    // the registered plan reads the staged history aggregate + a cutoff-
    // filtered orders scan — never the pre-cutoff facts
    val qe = inc.queryExecution.toString
    assert(qe.contains("graft_stage"), "history partial not read from the staged parquet")
    val direct = Tables.orders(spark, Sf)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
    assert(inc.exceptAll(direct).count() == 0 && direct.exceptAll(inc).count() == 0)
    // months exist on both sides of the cutoff, so the merge is exercised
    val cutoff = lit(ScaleOps.IncrementalCutoff).cast("timestamp")
    assert(Tables.orders(spark, Sf).where(col("o_orderdate") < cutoff).count() > 0)
    assert(Tables.orders(spark, Sf).where(col("o_orderdate") >= cutoff).count() > 0)
  }
  test("sortedLayoutMonthScan: clustering confines a month slice to few files, filter pushed") {
    import org.apache.spark.sql.functions._
    val slice = ScaleOps.sortedLayoutMonthScan(spark, Sf)
    val qe = slice.queryExecution.toString
    assert(qe.contains("PushedFilters") && qe.contains("o_orderdate"))
    val layoutFiles = ScaleOps.sortedOrdersLayout(spark, Sf)
      .select(input_file_name()).distinct().count()
    val sliceFiles = slice.select(input_file_name()).distinct().count()
    // 30 days of a ~6.5-year span range-partitioned into 8 files: the slice
    // must live in at most 2 adjacent files
    assert(layoutFiles >= 4, s"layout has only $layoutFiles files")
    assert(sliceFiles <= 2, s"month slice touched $sliceFiles files")
    // and the layout is lossless: same rows as the plain-table slice
    val direct = Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    assert(slice.exceptAll(direct).count() == 0 && direct.exceptAll(slice).count() == 0)
  }

  test("zorderSliceScan: z-layout skips files on BOTH dims, filters pushed, lossless") {
    import org.apache.spark.sql.functions._
    val slice = ScaleOps.zorderSliceScan(spark, Sf)
    val qe = slice.queryExecution.toString
    assert(qe.contains("PushedFilters") && qe.contains("o_orderdate") &&
      qe.contains("o_custkey"))
    val layoutFiles = ScaleOps.zorderedOrdersLayout(spark, Sf)
      .select(input_file_name()).distinct().count()
    assert(layoutFiles >= 4, s"layout has only $layoutFiles files")
    // the conjunctive slice (one z-quadrant's worth of both dims) must not
    // touch every file — the property the single-dim sorted layout lacks
    val sliceFiles = slice.select(input_file_name()).distinct().count()
    assert(sliceFiles < layoutFiles,
      s"z slice touched all $layoutFiles files")
    // lossless vs the plain table on the same predicates
    val direct = Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp") &&
        col("o_custkey") <= 4095)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    assert(slice.exceptAll(direct).count() == 0 && direct.exceptAll(slice).count() == 0)
  }

  test("hllSegmentDistinct: merged sketch covers the union; every estimate within tolerance") {
    import org.apache.spark.sql.functions._
    val rows = ScaleOps.hllSegmentDistinct(spark, Sf).collect()
    val (all, segs) = rows.partition(_.getString(0) == "ALL")
    assert(all.length == 1 && segs.nonEmpty)
    // segments partition the customer set: global exact = sum of segment exacts
    assert(all.head.getLong(1) == segs.map(_.getLong(1)).sum)
    // the in-query assertion: every HLL estimate (incl. the union) within 5%
    assert(rows.forall(_.getBoolean(2)), s"an HLL estimate left tolerance: ${rows.mkString(", ")}")
    // ground truth against a direct recompute
    val exact = Tables.orders(spark, Sf)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(all.head.getLong(1) == exact)
  }

  test("hllIntersect: exact overlap recomputes; inclusion-exclusion estimate in tolerance") {
    import org.apache.spark.sql.functions._
    val row = ScaleOps.hllIntersect(spark, Sf).collect().head
    // ground truth from a direct per-year distinct recompute
    val byYear = Tables.orders(spark, Sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .where(col("yr").isin(1996, 1997)).distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val a = byYear.filter(_._2 == 1996).map(_._1).toSet
    val b = byYear.filter(_._2 == 1997).map(_._1).toSet
    assert(row.getLong(0) == a.size.toLong && row.getLong(1) == b.size.toLong)
    assert(row.getLong(2) == (a & b).size.toLong)
    assert((a & b).nonEmpty, "fixture has no year overlap - the op tests nothing")
    // the in-query sketch-quality assertion
    assert(row.getBoolean(3), s"inclusion-exclusion estimate left tolerance: $row")
  }

  test("fkConformance: one row per relationship; the synthetic schema is orphan-free") {
    import org.apache.spark.sql.functions._
    val rows = ScaleOps.fkConformance(spark, Sf).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(0)).distinct.length == 4)
    rows.foreach(r => assert(r.getLong(2) == 0L,
      s"${r.getString(0)} reports ${r.getLong(2)} orphans"))
    // n_rows are the fact-table counts (the left join must not fan out)
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("orders.o_custkey->customer") == Tables.orders(spark, Sf).count())
    assert(byName("lineitem.l_partkey->part") == Tables.lineitem(spark, Sf).count())
    // and a synthetic orphan IS caught: drop half the dimension, recount
    val half = Tables.customer(spark, Sf).where(col("c_custkey") % 2 === 0)
    val orphans = Tables.orders(spark, Sf)
      .join(broadcast(half.select(col("c_custkey"), lit(1).as("present"))),
        col("o_custkey") === col("c_custkey"), "left")
      .where(col("present").isNull).count()
    assert(orphans > 0)
  }

  test("bloomMembership: no false negatives, flag accounting exact, merge = OR") {
    val r = ScaleOps.bloomMembership(spark, Sf).head()
    assert(r.getAs[Long]("false_negatives") == 0L) // the Bloom guarantee
    assert(r.getAs[Long]("n_flagged") ==
      r.getAs[Long]("n_members") + r.getAs[Long]("false_positives"))
    val exactMembers = Tables.orders(spark, Sf)
      .where(col("o_totalprice") > ScaleOps.BloomMemberThreshold)
      .select("o_custkey").distinct().count()
    assert(r.getAs[Long]("n_members") == exactMembers && exactMembers > 0)
    val nonMembers = r.getAs[Long]("n_customers") - exactMembers
    // 8192 bits / 3 hashes: realized FP rate stays far from saturation
    assert(r.getAs[Long]("false_positives") <= math.max(1L, nonMembers / 10))
    // mergeability: OR of two half-built filters == filter of the union
    val agg = new graft.functions.BloomAgg(256, 3)
    val (a, b) = (agg.zero, agg.zero)
    (1L to 50L).foreach(k => agg.reduce(a, k))
    (40L to 90L).foreach(k => agg.reduce(b, k))
    val whole = agg.zero
    (1L to 90L).foreach(k => agg.reduce(whole, k))
    assert(agg.merge(a, b).toSeq == whole.toSeq)
  }

  test("columnProfile: one row per column, stats agree with direct recomputes") {
    import org.apache.spark.sql.functions._
    val prof = ScaleOps.columnProfile(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 6)
    val o = Tables.orders(spark, Sf)
    val nRows = o.count()
    assert(prof.values.forall(_.getLong(1) == nRows))
    assert(prof.values.forall(_.getLong(2) == 0L)) // fixture has no nulls
    val keyRow = prof("o_orderkey")
    assert(keyRow.getLong(3) == nRows) // orderkey is unique
    assert(keyRow.getDouble(4) ==
      o.agg(min("o_orderkey")).collect().head.getLong(0).toDouble)
    // typed min/max: numeric cols carry no timestamps and vice versa
    assert(keyRow.isNullAt(6) && keyRow.isNullAt(7))
    val dateRow = prof("o_orderdate")
    assert(dateRow.isNullAt(4) && dateRow.isNullAt(5))
    // untyped compare: the fixture's NTZ timestamps surface as LocalDateTime
    assert(dateRow.get(6) == o.agg(min("o_orderdate")).collect().head.get(0))
    val statusRow = prof("o_orderstatus")
    assert(statusRow.isNullAt(4) && statusRow.isNullAt(6))
    assert(statusRow.getLong(3) ==
      o.select(countDistinct(col("o_orderstatus"))).collect().head.getLong(0))
  }

  test("skylineOn: strict-domination semantics — duplicates survive, equal-on-one-axis loses") {
    import spark.implicits._
    val pts = Seq(
      (1L, 10L, 1L),  // frontier (best x)
      (2L, 5L, 5L),   // frontier
      (3L, 5L, 5L),   // exact duplicate of 2 — must ALSO survive
      (4L, 5L, 4L),   // dominated by 2 (x equal, y smaller)
      (5L, 4L, 5L),   // dominated by 2 (y equal, x smaller)
      (6L, 1L, 9L),   // frontier (best y)
      (7L, 0L, 0L)    // dominated by everything
    ).toDF("id", "x", "y").repartition(3) // survivors must not depend on layout
    val got = graft.operators.ScaleOps.skylineOn(spark, pts, "x", "y")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 6L))
  }

  test("paretoFrontier: no global sort, no frontier point dominated, no survivor missed") {
    val df = graft.operators.ScaleOps.paretoFrontier(spark, Sf)
    // two-level sweep must never plan a global Sort (flag `true`): only
    // per-partition sorts (`Sort [...], false`)
    val p = df.queryExecution.executedPlan.toString
    assert("Sort \\[spend_cents[^\\]]*\\], true".r.findFirstIn(p).isEmpty)
    assert("Sort \\[spend_cents[^\\]]*\\], false".r.findFirstIn(p).nonEmpty)
    val frontier = df.collect().map(r => (r.getLong(1), r.getLong(2)))
    val all = graft.Tables.customer(spark, Sf)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long").as("y"))
      .join(graft.Tables.orders(spark, Sf).groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100).cast("long").as("x")),
        col("c_custkey") === col("o_custkey"))
      .select(col("x"), col("y")).collect().map(r => (r.getLong(0), r.getLong(1)))
    def dominated(p: (Long, Long)) = all.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
    assert(frontier.forall(!dominated(_)))
    assert(frontier.length == all.count(!dominated(_)))
  }

  test("cmsJoinEstimate: never undercounts and matches a driver-side replay") {
    val r = graft.operators.ScaleOps.cmsJoinEstimate(spark, Sf).collect().head
    val (exact, est) = (r.getLong(0), r.getLong(1))
    // exact side replayed with a literal join
    val want = graft.Tables.lineitem(spark, Sf)
      .join(graft.Tables.part(spark, Sf)
          .where(col("p_brand") === graft.operators.ScaleOps.JoinCmsBrand),
        col("l_partkey") === col("p_partkey")).count()
    assert(exact == want && want > 0)
    // CMS inner product can only overcount (Cormode & Muthukrishnan §4.2)
    assert(est >= exact)
    assert(r.getLong(2) == est - exact)
    assert(math.abs(r.getDouble(3) - (est - exact).toDouble / exact) < 1e-12)
    // sketch replay: per-key exact counts pushed through the same slot hash
    val w = graft.operators.ScaleOps.JoinCmsWidth
    val d = graft.operators.ScaleOps.JoinCmsDepth
    def sketch(rows: Seq[(Long, Long)]): Array[Long] = {
      val a = new Array[Long](d * w)
      for ((k, c) <- rows; j <- 0 until d)
        a(j * w + (graft.functions.MinHashAgg.h24(s"$j:$k") % w).toInt) += c
      a
    }
    val lc = graft.Tables.lineitem(spark, Sf).groupBy(col("l_partkey")).count()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val pcRows = graft.Tables.part(spark, Sf)
      .where(col("p_brand") === graft.operators.ScaleOps.JoinCmsBrand)
      .groupBy(col("p_partkey")).count()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val (sl, sp) = (sketch(lc), sketch(pcRows))
    val wantEst = (0 until d).map { j =>
      (0 until w).map(k => sl(j * w + k) * sp(j * w + k)).sum
    }.min
    assert(est == wantEst)
  }

  test("bootstrapCi: Poisson weights, replicate means, and order-stat CI replay") {
    val r = graft.operators.ScaleOps.bootstrapCi(spark, Sf).collect().head
    val rows = graft.Tables.orders(spark, Sf)
      .select(col("o_orderkey").cast("string"),
        col("o_totalprice").cast("decimal(12,2)"))
      .collect().map(x => (x.getString(0), BigDecimal(x.getDecimal(1))))
    val cdf = graft.operators.ScaleOps.BootCdf24
    def wgt(b: Int, k: String): Int = {
      val h = graft.functions.MinHashAgg.h24Slice(s"${b / 5}:$k", b % 5)
      cdf.indexWhere(h < _) match { case -1 => 5; case i => i }
    }
    val means = (0 until graft.operators.ScaleOps.BootReplicates).map { b =>
      var s = BigDecimal(0); var n = 0L
      rows.foreach { case (k, p) => val w = wgt(b, k); s += p * w; n += w }
      (b, s.toDouble / n.toDouble)
    }
    val sorted = means.sortBy(m => (m._2, m._1)).map(_._2)
    assert(math.abs(r.getDouble(2) - sorted(1)) < 1e-12)  // ci_lo = 2nd of 32
    assert(math.abs(r.getDouble(3) - sorted(30)) < 1e-12) // ci_hi = 31st of 32
    val pm = rows.map(_._2).sum.toDouble / rows.length
    assert(math.abs(r.getDouble(0) - pm) < 1e-9)
    assert(r.getLong(4) == rows.length)
    // the interval brackets the point estimate on this sample
    assert(r.getDouble(2) <= r.getDouble(0) && r.getDouble(0) <= r.getDouble(3))
    // Poisson(1) weights resample to ~n rows per replicate (law of large
    // numbers at fixture size: within 20%)
    val totW = rows.map { case (k, _) => wgt(0, k).toLong }.sum
    assert(math.abs(totW - rows.length).toDouble / rows.length < 0.2)
  }

  test("compactionPlan: ordered packing replays driver-side and covers all rows") {
    val plan = graft.operators.ScaleOps.compactionPlan(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toMap
    val target = graft.operators.ScaleOps.CompactTargetRows
    val parts = graft.Tables.orders(spark, Sf)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.get(0).asInstanceOf[Comparable[Any]], r.getLong(1)))
      .sortWith((a, b) => a._1.compareTo(b._1) < 0)
    var cum = 0L
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, n) <- parts) {
      val fid = cum / target
      val (np, nr) = want.getOrElse(fid, (0L, 0L))
      want(fid) = (np + 1, nr + n)
      cum += n
    }
    assert(plan.keySet == want.keySet)
    for ((fid, (np, nr)) <- want) {
      assert(plan(fid)._1 == np && plan(fid)._2 == nr)
      assert(plan(fid)._3 == nr.toDouble / target)
    }
    assert(plan.values.map(_._2).sum == graft.Tables.orders(spark, Sf).count())
  }

  test("expectations: every constraint's violation count replays driver-side") {
    val got = graft.operators.ScaleOps.expectations(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got.size == 10)
    val nO = graft.Tables.orders(spark, Sf).count()
    val nL = graft.Tables.lineitem(spark, Sf).count()
    assert(got.keys.count(_.startsWith("orders.")) == 5)
    got.foreach { case (k, (n, v, p)) =>
      assert(n == (if (k.startsWith("orders.")) nO else nL))
      assert(v >= 0 && v <= n && p == (v == 0))
    }
    // replay two representative constraints exactly
    val dupKeys = nO - graft.Tables.orders(spark, Sf)
      .select(col("o_orderkey")).distinct().count()
    assert(got("orders.o_orderkey is unique")._2 == dupKeys)
    val badQty = graft.Tables.lineitem(spark, Sf)
      .where(col("l_quantity").isNull ||
        col("l_quantity") <= 0 || col("l_quantity") > 50).count()
    assert(got("lineitem.l_quantity in (0,50]")._2 == badQty)
    // the fixture's order key is unique; its composite line key is NOT
    // (the synthetic generator draws linenumbers with replacement) — the
    // suite's value is that it REPORTS that honestly, so pin the exact
    // violation count instead of assuming the TPC-H contract
    assert(got("orders.o_orderkey is unique")._3)
    val dupLines = nL - graft.Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(got("lineitem.(l_orderkey,l_linenumber) is unique")._2 == dupLines)
  }

  test("zonemapPrune: no false negatives, covers every order, clusters the slice") {
    val zones = graft.operators.ScaleOps.zonemapPrune(spark, Sf).collect()
    val total = graft.Tables.orders(spark, Sf).count()
    assert(zones.map(_.getLong(1)).sum == total)
    // every zone is full except possibly the last
    assert(zones.map(_.getLong(1)).count(_ != graft.operators.ScaleOps.ZoneRows) <= 1)
    for (z <- zones) {
      // zone stats are consistent (NTZ timestamps surface as LocalDateTime)
      assert(z.get(2).asInstanceOf[Comparable[Any]].compareTo(z.get(3)) <= 0)
      // skipping never loses rows: a pruned zone holds no matching row
      if (!z.getBoolean(4)) assert(z.getLong(5) == 0L)
      // and a zone with matches always survives
      if (z.getLong(5) > 0L) assert(z.getBoolean(4))
    }
    // date-sorted clustering: surviving zones ~ ceil(matching/ZoneRows)+1,
    // never "all zones survive" once there are several zones
    val matching = zones.map(_.getLong(5)).sum
    val surviving = zones.count(_.getBoolean(4))
    val ideal = math.ceil(matching.toDouble / graft.operators.ScaleOps.ZoneRows).toInt
    assert(surviving <= ideal + 1, s"surviving=$surviving ideal=$ideal")
    // the zoning recompute is DISTRIBUTED (VERDICT r8 #4): the corpus-sized
    // rank window must be day-partitioned — the only unpartitioned window
    // in the plan is the day-cardinality offset cumsum (a SUM, never the
    // per-row row_number)
    import org.apache.spark.sql.catalyst.expressions.WindowExpression
    import org.apache.spark.sql.catalyst.expressions.RowNumber
    val plan = graft.operators.ScaleOps.zonemapPrune(spark, Sf)
      .queryExecution.analyzed
    val rowNumWindows = plan.flatMap(_.expressions.flatMap(_.collect {
      case w @ WindowExpression(_: RowNumber, _) => w
    }))
    assert(rowNumWindows.nonEmpty)
    rowNumWindows.foreach(w =>
      assert(w.windowSpec.partitionSpec.nonEmpty,
        "corpus-sized rank window lost its day partitioning"))
  }

  test("BootWeights kernel is bit-identical to the composed h24Slice inverse-CDF draw (oracle unchanged)") {
    import org.apache.spark.sql.{Column, GraftBridge}
    // numeric keys (the production shape), a zero, and a key long enough
    // that "g:"+key crosses FastMd5's single-block boundary (fallback path)
    import spark.implicits._
    val keys = ((0L to 400L).map(_.toString) :+ "9" * 60 :+ "123456789012345")
    val df = keys.toSeq.toDF("key")
    def composed(b: Int): Column = {
      val h = Tables.h24Slice(concat(lit(s"${b / 5}:"), col("key")), b % 5)
      when(h < ScaleOps.BootCdf24(0), 0L).when(h < ScaleOps.BootCdf24(1), 1L)
        .when(h < ScaleOps.BootCdf24(2), 2L).when(h < ScaleOps.BootCdf24(3), 3L)
        .when(h < ScaleOps.BootCdf24(4), 4L).otherwise(5L)
    }
    val kernel = GraftBridge.column(graft.functions.BootWeights(
      GraftBridge.expression(col("key")),
      ScaleOps.BootCdf24.toArray, ScaleOps.BootReplicates))
    val mismatches = df
      .select(col("key"),
        array((0 until ScaleOps.BootReplicates).map(composed): _*).as("a"),
        kernel.as("b"))
      .where(not(col("a") <=> col("b")))
      .collect()
    assert(mismatches.isEmpty,
      s"kernel drifted from the composed form: ${mismatches.take(2).mkString}")
    // weights are genuinely Poisson-ish: all 6 buckets occur across keys
    val dist = df.select(explode(kernel).as("w")).groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L), s"$dist")
    assert(dist(0L) > dist(2L) && dist(1L) > dist(3L), s"$dist")
  }
}
