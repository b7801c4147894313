package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private val revExpr =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))

  test("clicksBeforeError: value-based frame counts exactly the prior-10-minute clicks") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: clicks at -601s (out), -600s (in), -1s (in), 0s (excluded: same second)
      (1L, 1L, t("2024-01-01 09:49:59"), "click"),
      (2L, 1L, t("2024-01-01 09:50:00"), "click"),
      (3L, 1L, t("2024-01-01 09:59:59"), "click"),
      (4L, 1L, t("2024-01-01 10:00:00"), "click"),
      (5L, 1L, t("2024-01-01 10:00:00"), "error"),
      // user 2: no clicks before its error
      (6L, 2L, t("2024-01-01 10:00:00"), "click"),
      (7L, 2L, t("2024-01-01 09:00:00"), "error")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = RelationalOps.clicksBeforeErrorOn(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(5L -> 2L, 7L -> 0L))
  }

  test("pricingSummary pushes the shipdate filter to the parquet scan") {
    val p = RelationalOps.pricingSummary(spark, Sf).queryExecution.toString
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("shippingPriority broadcasts the customer dimension") {
    assert(plan(RelationalOps.shippingPriority(spark, Sf)).contains("BroadcastHashJoin"))
  }

  test("forecastRevenue (Q6) pushes every predicate to the parquet scan") {
    val p = RelationalOps.forecastRevenue(spark, Sf).queryExecution.toString
    assert(p.contains("PushedFilters"))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      // each filter column appears inside the pushed-filter list, not only post-scan
      assert(p.contains(c), s"$c not in plan")
    }
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"$c not pushed: $pushed")
    }
  }

  test("largeQuantityOrders (Q18): heavy set broadcasts, totals match a recompute") {
    val df = RelationalOps.largeQuantityOrders(spark, Sf, 250.0)
    assert(plan(df).contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
    val expect = Tables.lineitem(spark, Sf)
      .groupBy(col("l_orderkey")).agg(sum("l_quantity").as("q"))
      .where(col("q") > 250.0).count()
    assert(rows.length == expect)
  }

  test("brandTierRevenue (Q19): disjunction partially pushes, part broadcasts, result non-trivial") {
    val df = RelationalOps.brandTierRevenue(spark, Sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"))
    // Catalyst extracts the per-side common factor of the OR and pushes it:
    // the part scan must carry a brand filter, not read the full dimension.
    val full = df.queryExecution.toString
    assert(full.contains("p_brand"))
    val rev = df.collect().head.getAs[Double]("revenue")
    assert(rev > 0.0)
  }

  test("idleRichCustomers (Q22): threshold row broadcasts; members beat avg and have no orders") {
    val df = RelationalOps.idleRichCustomers(spark, Sf)
    val total = df.agg(sum("n_customers")).collect().head.getLong(0)
    val avgBal = Tables.customer(spark, Sf).where(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") / count("*")))
      .collect().head.getDouble(0)
    val expect = Tables.customer(spark, Sf)
      .where(col("c_acctbal") > avgBal)
      .join(Tables.orders(spark, Sf)
        .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(total == expect && total > 0)
  }

  test("segmentYearPivot: single shuffle, matches the .pivot() API form, conserves totals") {
    val df = RelationalOps.segmentYearPivot(spark, Sf)
    assert(df.columns.toSeq == ("order_year" +: RelationalOps.Segments))
    // single-shuffle shape: one partial+final aggregate pair over the broadcast join
    // (BroadcastExchange is not a shuffle — count only hash/range repartitions)
    val shuffles = plan(df).linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 1, s"pivot plan has $shuffles shuffles")
    val api = RelationalOps.segmentYearPivotApi(spark, Sf)
    assert(df.exceptAll(api).count() == 0 && api.exceptAll(df).count() == 0)
    val pivotTotal = df.select(
      RelationalOps.Segments.map(s => coalesce(col(s"`$s`"), lit(0.0))).reduce(_ + _).as("t"))
      .agg(sum("t")).collect().head.getDouble(0)
    val direct = Tables.orders(spark, Sf)
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-4)
  }

  test("extremeOrdersPerSegment: max_by/min_by agree with a window recompute") {
    val rows = RelationalOps.extremeOrdersPerSegment(spark, Sf).collect()
    assert(rows.length == RelationalOps.Segments.length)
    rows.foreach { r =>
      val seg = r.getString(0)
      val best = Tables.orders(spark, Sf)
        .join(Tables.customer(spark, Sf).where(col("c_mktsegment") === seg)
          .select("c_custkey"), col("o_custkey") === col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
        .select("o_orderkey", "o_totalprice").head()
      assert(r.getAs[Long]("top_orderkey") == best.getLong(0))
      assert(r.getAs[Double]("top_price") == best.getDouble(1))
    }
  }

  test("promoRevenueShare (Q14): share in (0,100), counts match the window join") {
    val r = RelationalOps.promoRevenueShare(spark, Sf).collect().head
    val share = r.getAs[Double]("promo_share")
    assert(share > 0 && share < 100)
    val expect = Tables.lineitem(spark, Sf)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp")).count()
    assert(r.getAs[Long]("n_items") == expect)
  }

  test("smallQuantityRevenue (Q17): single shuffle, rows below their part's threshold") {
    val df = RelationalOps.smallQuantityRevenue(spark, Sf)
    val shuffles = df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    // window shuffle on l_partkey + final single-row aggregate exchange
    assert(shuffles <= 2, s"Q17 plans $shuffles shuffles")
    val r = df.collect().head
    assert(r.getAs[Long]("n_items") > 0)
    assert(r.getAs[Double]("total_price") > 0)
  }

  test("orderCountHistogram (Q13): zero-order customers counted, mass conserved") {
    val rows = RelationalOps.orderCountHistogram(spark, Sf).collect()
    val totalCustomers = rows.map(_.getAs[Long]("n_customers")).sum
    assert(totalCustomers == Tables.customer(spark, Sf).count())
    val totalOrders = rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("n_customers")).sum
    assert(totalOrders == Tables.orders(spark, Sf).count())
  }

  test("orderQuartiles: 4 buckets per segment, sizes within 1, max monotone") {
    val rows = RelationalOps.orderQuartiles(spark, Sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("quartile")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      val sizes = g.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1) // ntile balance property
      val maxes = g.sortBy(_.getAs[Long]("quartile")).map(_.getAs[Double]("max_price"))
      assert(maxes.sameElements(maxes.sorted))
    }
  }

  test("unpivot is the inverse of pivot: matches the direct two-key aggregation") {
    val melted = RelationalOps.segmentYearUnpivot(spark, Sf)
    val direct = Tables.orders(spark, Sf)
      .join(Tables.customer(spark, Sf), col("c_custkey") === col("o_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
        col("c_mktsegment").as("segment"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("revenue"))
    assert(melted.exceptAll(direct).count() == 0 && direct.exceptAll(melted).count() == 0)
  }

  test("custom TopKPerKey operator: plans heap exec with no sort, equals the window form") {
    val df = RelationalOps.topOrdersPerCustomerCustom(spark, Sf, 2)
    val p = plan(df)
    assert(p.contains("TopKPerKey"), s"custom exec missing from plan:\n$p")
    assert(!p.contains("Window") && !p.contains("Sort "),
      "custom top-k must not plan a window or a sort")
    // one clustering exchange, nothing else
    val shuffles = p.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles == 1, s"expected exactly 1 shuffle, got $shuffles")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expect = RelationalOps.topOrdersPerCustomer(spark, Sf, 2).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    assert(got == expect)
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    assert(plan(RelationalOps.topOrders(spark, Sf, 10)).contains("TakeOrderedAndProject"))
  }

  test("asOf join: last_signup_ts <= error ts and is the max qualifying signup") {
    val ev = Tables.events(spark, Sf).cache()
    val result = RelationalOps.asOfLastSignup(spark, Sf).collect()
    assert(result.nonEmpty)
    val signups = ev.where(col("event_type") === "signup")
      .select("user_id", "ts").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getTimestamp(1)).sorted).toMap
    result.foreach { r =>
      val t = r.getTimestamp(2)
      val expected = signups.getOrElse(r.getLong(1), Array.empty[java.sql.Timestamp])
        .filter(s => !s.after(t)).lastOption.orNull
      assert(r.getTimestamp(3) == expected)
    }
  }

  test("set ops are disjoint and cover the 1995 cohort") {
    val repeat = RelationalOps.repeatCustomers(spark, Sf)
    val churned = RelationalOps.churnedCustomers(spark, Sf)
    assert(repeat.intersect(churned).count() == 0)
    val cohort95 = Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    assert(repeat.count() + churned.count() == cohort95)
  }

  test("rollup emits detail + subtotal + grand-total levels") {
    val rows = RelationalOps.returnsRollup(spark, Sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, Sf).count())
  }

  test("cube adds the marginals rollup lacks; grouping flags disambiguate NULLs") {
    val cube = RelationalOps.returnsCube(spark, Sf).collect()
    val rollup = RelationalOps.returnsRollup(spark, Sf).collect()
    // cube ⊃ rollup: extra rows are exactly the (NULL, linestatus) marginals
    val statuses = Tables.lineitem(spark, Sf)
      .select("l_linestatus").distinct().count()
    assert(cube.length == rollup.length + statuses)
    val gs = RelationalOps.shipGroupingSets(spark, Sf).collect()
    gs.foreach { r =>
      // a grouped-away column is NULL exactly when its grouping flag is 1
      assert((r.getAs[Long]("g_flag") == 1L) == r.isNullAt(0))
      assert((r.getAs[Long]("g_status") == 1L) == r.isNullAt(1))
    }
  }

  test("approx distinct within its band") {
    val r = RelationalOps.approxDistinctOrders(spark, Sf).collect().head
    assert(r.getAs[Boolean]("approx_within_10pct"))
  }

  test("soleLateSuppliers (Q21 shape): window decorrelation equals the self-join form") {
    import spark.implicits._
    val got = RelationalOps.soleLateSuppliers(spark, Sf)
      .as[(String, Long)].collect().toMap
    // reference semantics via the textbook EXISTS / NOT EXISTS self-joins
    val ord = Tables.orders(spark, Sf).where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", datediff(col("l_shipdate"), col("o_orderdate")) > 90)
    val l1 = li.where(col("late"))
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1")).distinct()
    val other = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")).distinct()
    val otherLate = li.where(col("late"))
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")).distinct()
    val expect = l1
      .join(other, col("k1") === col("k2") && col("s1") =!= col("s2"), "left_semi")
      .join(otherLate, col("k1") === col("k3") && col("s1") =!= col("s3"), "left_anti")
      .join(Tables.supplier(spark, Sf), col("s1") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .as[(String, Long)].collect().toMap
    assert(got == expect && got.nonEmpty)
  }

  test("cheapestSupplierPerPart (Q2 shape): one winner per part, the true minimum") {
    val rows = RelationalOps.cheapestSupplierPerPart(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length) // one per part
    // spot-check a part: the winner's price is the min over its suppliers
    val partKey = rows.head.getLong(0)
    val unit = Tables.lineitem(spark, Sf)
      .where(col("l_partkey") === partKey)
      .groupBy(col("l_suppkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") /
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")).as("up"))
      .agg(min(col("up"))).collect().head.getDouble(0)
    assert(math.abs(rows.head.getAs[Double]("unit_price") - unit) < 1e-9)
  }

  test("FrequencyAgg: merged sketch candidates are a superset of true heavy hitters") {
    // skewed synthetic stream over 1000 keys: a few dominate, long tail below
    val rnd = new scala.util.Random(7)
    val stream = (0 until 20000).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.4) rnd.nextInt(3).toLong         // 3 hot keys share 40%
      else if (r < 0.7) (3 + rnd.nextInt(20)).toLong
      else (23 + rnd.nextInt(977)).toLong        // long tail
    }
    val n = stream.length
    val capacity = 64
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size).toMap
    val guaranteed = trueCounts.collect {
      case (k, c) if c > n / (capacity + 1) => k
    }.toSet
    // fold in shuffled chunks, merge pairwise in an arbitrary tree — the
    // plan shape a map-side-combined Spark aggregation produces
    val agg = new graft.functions.FrequencyAgg(capacity)
    val partials = stream.grouped(997).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = partials.reduce(agg.merge)
    val cands = agg.finish(merged).toSet
    assert(guaranteed.nonEmpty && guaranteed.subsetOf(cands))
    assert(cands.size <= capacity)
  }

  test("CountMinAgg: linear merge, and estimates never undercount") {
    val agg = new graft.functions.CountMinAgg(4, 64)
    val keys = (1L to 5000L).map(i => i % 37) // skewed: 37 distinct keys
    val whole = keys.foldLeft(agg.zero)(agg.reduce)
    // linearity: any split merges to the same block
    val parts = keys.grouped(613).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    assert(java.util.Arrays.equals(whole, merged))
    // no-undercount on every key
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (k, cnt) =>
      val est = (0 until 4).map(j =>
        whole(j * 64 + graft.functions.CountMinAgg.slot(j, k, 64))).min
      assert(est >= cnt, s"undercount for $k: $est < $cnt")
    }
  }

  test("cmsSupplierCounts: every estimate bounds the exact count from above") {
    val rows = RelationalOps.cmsSupplierCounts(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted supplier ${r.getLong(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
  }

  test("heavyHitterSuppliers: sketch+confirm equals naive groupBy-HAVING") {
    import spark.implicits._
    val got = RelationalOps.heavyHitterSuppliers(spark, Sf)
      .as[(Long, Long)].collect().toMap
    val li = Tables.lineitem(spark, Sf)
    val n = li.count()
    val expect = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt").cast("double") > n / 100.0)
      .as[(Long, Long)].collect().toMap
    assert(got == expect && got.nonEmpty)
  }

  test("latePriorityCounts (Q4 shape): semi-join counts orders once, matches distinct recompute") {
    val got = RelationalOps.latePriorityCounts(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(spark, Sf), col("o_orderkey") === col("l_orderkey"))
      .where(datediff(col("l_shipdate"), col("o_orderdate")) > 30)
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("volumeShipping (Q7 shape): only cross-nation pairs within the pinned cohort") {
    val rows = RelationalOps.volumeShipping(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ns = RelationalOps.TradeNations.toSet
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.forall { case (a, b) => ns(a) && ns(b) && a != b })
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("returnedItemLosses (Q10 shape): k rows, sorted by revenue, true top set") {
    val rows = RelationalOps.returnedItemLosses(spark, Sf, 20).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // the 20th revenue bounds everything outside the set
    val perCust = Tables.lineitem(spark, Sf)
      .where(col("l_returnflag") === "R")
      .join(Tables.orders(spark, Sf)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revExpr).cast("double").as("rev"))
    val inSet = rows.map(_.getLong(0)).toSet
    val maxOutside = perCust.where(!col("o_custkey").isin(inSet.toSeq: _*))
      .agg(max(col("rev"))).collect().head.getDouble(0)
    assert(maxOutside <= revs.last)
  }

  test("topRevenueSupplier (Q15 shape): every returned supplier hits the max") {
    val rows = RelationalOps.topRevenueSupplier(spark, Sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1) // ties all share the exact max
    val expectMax = Tables.lineitem(spark, Sf)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revExpr).cast("double").as("rev"))
      .agg(max(col("rev"))).collect().head.getDouble(0)
    assert(revs.head == expectMax)
  }

  test("supplierVariety: anti-join excludes negative-balance suppliers everywhere") {
    val bad = Tables.supplier(spark, Sf).where(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    // recompute with the exclusion applied up front; totals must match
    val expect = Tables.lineitem(spark, Sf)
      .where(!col("l_suppkey").isin(bad.toSeq: _*))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Tables.part(spark, Sf).where(col("p_brand") =!= "Brand#1"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .agg(sum("supplier_cnt")).collect().head.getLong(0)
    val got = RelationalOps.supplierVariety(spark, Sf)
      .agg(sum("supplier_cnt")).collect().head.getLong(0)
    assert(got == expect && got > 0)
  }
  test("bottomKSample: exact k per segment via TopKPerKeyExec, equals hash-rank recompute") {
    import org.apache.spark.sql.expressions.Window
    val df = RelationalOps.bottomKSample(spark, Sf, 5)
    val p = plan(df)
    assert(p.contains("TopKPerKey") && !p.contains("Window"))
    val rows = df.collect()
    val perSeg = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perSeg.values.forall(_ == 5))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Tables.h24(col("c_custkey").cast("string")), col("c_custkey"))
    val expect = Tables.customer(spark, Sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("c_mktsegment", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet == expect)
  }
  test("prioritySample: exact top-k by hash priority, TakeOrderedAndProject plan") {
    val df = RelationalOps.prioritySample(spark, Sf)
    assert(plan(df).contains("TakeOrderedAndProject"))
    val got = df.collect()
    assert(got.length == RelationalOps.PrioritySampleK)
    assert(got.map(_.getLong(0)).distinct.length == got.length)
    // equals a driver-side sort of the full priority scan (same pure row
    // function, independent of the TakeOrdered path)
    val all = Tables.orders(spark, Sf)
      .select(col("o_orderkey"),
        (col("o_totalprice") * lit(16777216.0) /
          (Tables.h24(concat(lit("ps:"), col("o_orderkey").cast("string"))) + lit(1)))
          .as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = all.sortBy { case (k, q) => (-q, k) }
      .take(RelationalOps.PrioritySampleK).map(_._1).toSeq
    assert(got.map(_.getLong(0)).toSeq == expect)
    // heavy rows dominate: the sample's mean weight exceeds the population's
    val sampleMean = got.map(_.getDouble(1)).sum / got.length
    val popMean = Tables.orders(spark, Sf)
      .agg(avg(col("o_totalprice"))).head.getDouble(0)
    assert(sampleMean > popMean)
  }

  test("segmentPrioritySample: exact k per segment via TopKPerKeyExec, matches window recompute") {
    import org.apache.spark.sql.expressions.Window
    val df = RelationalOps.segmentPrioritySample(spark, Sf)
    assert(plan(df).contains("TopKPerKey") && !plan(df).contains("Window"))
    val got = df.collect()
      .map(r => (r.getString(1), r.getLong(0))).toSet
    val pri = col("o_totalprice") * lit(16777216.0) /
      (Tables.h24(concat(lit("ps:"), col("o_orderkey").cast("string"))) + lit(1))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(pri.desc, col("o_orderkey"))
    val expect = Tables.orders(spark, Sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= RelationalOps.SegmentSampleK)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect && got.size == 5 * RelationalOps.SegmentSampleK)
  }

  test("trendOls: closed-form moments agree with Spark's regr_* aggregates") {
    val got = RelationalOps.trendOls(spark, Sf).collect()
    assert(got.length == 5)
    val built = Tables.orders(spark, Sf)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit(RelationalOps.TrendEpoch))).cast("double").as("x"),
        col("o_totalprice").as("y"))
      .groupBy(col("o_orderpriority"))
      .agg(regr_slope(col("y"), col("x")).as("s"),
        regr_intercept(col("y"), col("x")).as("i"),
        regr_r2(col("y"), col("x")).as("r2"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    got.foreach { r =>
      val b = built(r.getString(0))
      assert(r.getAs[Long]("n") == b.getAs[Long]("n"))
      def close(a: Double, e: Double, tol: Double) =
        math.abs(a - e) <= tol * (1 + math.abs(e))
      assert(close(r.getAs[Double]("slope"), b.getAs[Double]("s"), 1e-6))
      assert(close(r.getAs[Double]("intercept"), b.getAs[Double]("i"), 1e-6))
      assert(close(r.getAs[Double]("r2"), b.getAs[Double]("r2"), 1e-6))
      assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0)
    }
  }

  test("marketShare (Q8 shape): shares bounded by [0,1], denominator covers the region") {
    val rows = RelationalOps.marketShare(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        val sh = r.getDouble(1)
        assert(sh >= 0.0 && sh <= 1.0, s"share $sh out of range")
      }
    }
  }

  test("profitByNation (Q9 shape): profit equals revenue minus 0.6 cost recompute") {
    val rows = RelationalOps.profitByNation(spark, Sf).collect()
    assert(rows.nonEmpty)
    val joined = Tables.lineitem(spark, Sf)
      .join(Tables.part(spark, Sf).where(col("p_name").contains("gear")),
        col("l_partkey") === col("p_partkey"))
    val rev = joined.agg(sum(revExpr).cast("double")).collect().head.getDouble(0)
    val cost = joined.agg(sum(col("l_quantity").cast("decimal(12,2)") *
      col("p_retailprice").cast("decimal(12,2)")).cast("double")).collect().head.getDouble(0)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - (rev - 0.6 * cost)) < 1e-4)
  }

  test("latePrioritySplit (Q12 shape): high+low equals the late-lineitem total") {
    val rows = RelationalOps.latePrioritySplit(spark, Sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expect = Tables.lineitem(spark, Sf)
      .join(Tables.orders(spark, Sf)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .where(datediff(col("l_shipdate"), col("o_orderdate")) > 60).count()
    assert(total == expect && total > 0)
  }

  test("excessSuppliers (Q20 shape): every member beats the 1.1x-mean threshold") {
    val rows = RelationalOps.excessSuppliers(spark, Sf).collect()
    assert(rows.nonEmpty)
    val perSupp = Tables.lineitem(spark, Sf)
      .join(Tables.part(spark, Sf).where(col("p_name").contains("bolt")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
    val stats = perSupp.agg(sum("q"), count(lit(1))).collect().head
    val thr = 1.1 * stats.getDouble(0) / stats.getLong(1)
    rows.foreach(r => assert(r.getDouble(2) > thr - 1e-6))
    // and nothing qualifying was dropped
    assert(rows.length == perSupp.where(col("q") > thr).count())
  }

  test("importantStock (Q11 shape): exact int64 values, threshold honored, nothing dropped") {
    val rows = RelationalOps.importantStock(spark, Sf).collect()
    assert(rows.nonEmpty)
    // independent recompute of per-part values for the nation cohort
    val perPart = Tables.partsupp(spark, Sf)
      .join(Tables.supplier(spark, Sf)
          .join(Tables.nation(spark, Sf).where(col("n_nationkey") % 4 === 1),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey")),
        col("ps_suppkey") === col("s_suppkey"), "leftsemi")
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = perPart.values.sum
    rows.foreach { r =>
      assert(perPart(r.getLong(0)) == r.getLong(1)) // exact value match
      assert(r.getLong(1) * 10000 > total)          // threshold strict
    }
    assert(rows.length == perPart.count(_._2 * 10000 > total)) // completeness
  }

  test("yearOverYearReconcile: genuine full outer join, statuses consistent with sides") {
    val df = RelationalOps.yearOverYearReconcile(spark, Sf)
    assert(plan(df).contains("FullOuter"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rev96, rev97, status) = (r.getDouble(1), r.getDouble(2), r.getString(3))
      status match {
        case "only_1996" => assert(rev97 == 0.0 && rev96 > 0.0)
        case "only_1997" => assert(rev96 == 0.0 && rev97 > 0.0)
        case "both"      => assert(rev96 > 0.0 && rev97 > 0.0)
      }
      assert(math.abs(r.getDouble(4) - (rev97 - rev96)) < 1e-9)
    }
  }

  test("weightedMedianPrice: single-pass kernel (r15), exact lower weighted median, bit-identical to the bucketed reference") {
    val df = RelationalOps.weightedMedianPrice(spark, Sf)
    // the r15 kernel shape: ONE fact scan, no windows, no joins — the
    // whole answer is one map-side-combined aggregate (the replaced
    // three-level plan re-scanned the fact table in three un-reused
    // branches)
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.sliding("Relation".length).count(_ == "Relation") == 1,
      "kernel plan must scan the fact table exactly once:\n" + p)
    // bit-identical to the retained three-level bucket reference — the
    // adjudication pin: same (flag, median, total) DOUBLES, exactly
    val kernel = df.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val reference = RelationalOps.weightedMedianPriceBucketed(spark, Sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(kernel == reference,
      s"kernel $kernel differs from bucketed reference $reference")
    val med = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // independent check: med is the smallest price whose cumulative weight
    // reaches half the flag's total
    val cells = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"), col("l_extendedprice").cast("decimal(12,2)").as("p"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("w"))
      .collect()
      .groupBy(_.getString(0))
    med.foreach { case (flag, m) =>
      val sorted = cells(flag)
        .map(r => (r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue()))
        .sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0.0
      val expect = sorted.find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      assert(m == expect, s"flag $flag")
    }
  }

  test("basketPairs: supports and lift recompute from the raw baskets; cut respected") {
    import org.apache.spark.sql.functions._
    val items = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nBaskets = baskets.size.toLong
    val itemSup = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expSup = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.values.foreach { parts =>
      val s = parts.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        expSup((s(i), s(j))) = expSup.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val expect = expSup.filter(_._2 >= RelationalOps.BasketMinSupport)
    val rows = RelationalOps.basketPairs(spark, Sf).collect()
    assert(rows.nonEmpty)
    val got = rows.map { r =>
      ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case ((a, b), (sup, sa, sb, lift)) =>
      assert(a < b, s"pair order ($a,$b)")
      assert(sup == expect((a, b)))
      assert(sa == itemSup(a) && sb == itemSup(b))
      assert(lift == (sup * nBaskets).toDouble / (sa * sb).toDouble)
    }
    // lift discriminates: dependent and near-independent pairs both occur
    assert(got.values.exists(_._4 > 1.0))
  }

  test("reorderGaps: per-customer lag gaps recompute; rollup exact") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps: Seq[Long] = orders.groupBy(_._1).values.toSeq.flatMap { os =>
      val ds = os.sortBy(o => (o._3, o._2)).map(_._3).toList
      ds.zip(ds.tail).map { case (a, b) => b - a }
    }
    val repeatCustomers = orders.groupBy(_._1).count(_._2.length >= 2)
    val r = RelationalOps.reorderGaps(spark, Sf).collect().head
    assert(r.getLong(0) == repeatCustomers.toLong)
    assert(r.getLong(1) == gaps.length.toLong)
    assert(r.getDouble(2) == gaps.sum.toDouble / gaps.length)
    val s = gaps.map(_.toDouble).sorted
    val pos = 0.5 * (s.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    assert(r.getDouble(3) == s(lo) + (s(hi) - s(lo)) * (pos - lo))
    assert(gaps.nonEmpty && r.getDouble(2) > 0)
  }

  test("spendConcentration: shares recompute against a full driver-side sort") {
    import org.apache.spark.sql.functions._
    val spends = Tables.orders(spark, Sf)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(14,2)")).as("s")).collect()
      .map(r => r.getDecimal(1))
    def quantile(p: Double): Double = {
      val s = spends.map(_.doubleValue).sorted
      val pos = p * (s.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      s(lo) + (s(hi) - s(lo)) * (pos - lo)
    }
    val (p80, p95) = (quantile(0.80), quantile(0.95))
    val total = spends.map(BigDecimal(_)).sum
    def share(thr: Double) =
      (spends.filter(_.doubleValue > thr).map(BigDecimal(_)).sum / total).toDouble
    val r = RelationalOps.spendConcentration(spark, Sf).collect().head
    assert(r.getLong(0) == spends.length.toLong)
    assert(r.getLong(1) == spends.count(_.doubleValue > p80).toLong)
    assert(r.getLong(2) == spends.count(_.doubleValue > p95).toLong)
    assert(r.getDouble(3) == total.toDouble)
    // shares reconcile within fp tolerance of the exact-decimal ratio
    assert(math.abs(r.getDouble(4) - share(p80)) < 1e-12)
    assert(math.abs(r.getDouble(5) - share(p95)) < 1e-12)
    // concentration is real: the top quintile holds more than its headcount share
    assert(r.getDouble(4) > 0.2 && r.getDouble(5) > 0.05)
  }

  test("benfordAudit: digit histogram and z-flags recompute; synthetic prices rightly fail") {
    import org.apache.spark.sql.functions._
    val digits = Tables.orders(spark, Sf)
      .select(floor(col("o_totalprice")).cast("long")).collect()
      .map(_.getLong(0).toString.head.asDigit.toLong)
    val n = digits.length.toLong
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = RelationalOps.benfordAudit(spark, Sf).collect()
    assert(rows.length == 9 && rows.map(_.getLong(0)).toSet == (1L to 9L).toSet)
    var expDeviant = 0L
    RelationalOps.BenfordP6.foreach { case (d, p6) =>
      val exp = (n * p6).toDouble / 1000000.0d
      if (math.abs(counts.getOrElse(d, 0L).toDouble - exp) > 3.0 * math.sqrt(exp))
        expDeviant += 1
    }
    rows.foreach { r =>
      val d = r.getLong(0)
      val p6 = RelationalOps.BenfordP6.find(_._1 == d).get._2
      val exp = (n * p6).toDouble / 1000000.0d
      assert(r.getLong(1) == counts.getOrElse(d, 0L))
      assert(r.getDouble(2) == exp)
      val z = BigDecimal((counts.getOrElse(d, 0L).toDouble - exp) / math.sqrt(exp))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == z, s"digit $d z")
      assert(r.getBoolean(4) ==
        (math.abs(counts.getOrElse(d, 0L).toDouble - exp) > 3.0 * math.sqrt(exp)))
      assert(r.getLong(5) == expDeviant && r.getBoolean(6) == (expDeviant == 0))
    }
    // the synthetic uniform-ish price generator is NOT Benford - a true
    // rejection is the audit working
    assert(rows.head.getLong(5) > 0 && !rows.head.getBoolean(6))
  }

  test("rfmSegments: scores recompute against exact interpolated quintiles; all rules fire") {
    import org.apache.spark.sql.functions._
    val per = Tables.orders(spark, Sf)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("mon"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2), r.getDouble(3)))
    val anchor = per.map(_._2).max
    val rec = per.map { case (c, d, _, _) =>
      c -> java.time.temporal.ChronoUnit.DAYS.between(d, anchor) }.toMap
    // Spark percentile: linear interpolation at p*(n-1) over the sorted set
    def quintiles(vs: Seq[Double]): Seq[Double] = {
      val s = vs.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map { p =>
        val pos = p * (s.length - 1)
        val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
        s(lo) + (s(hi) - s(lo)) * (pos - lo)
      }
    }
    val rb = quintiles(per.map(p => rec(p._1).toDouble).toSeq)
    val fb = quintiles(per.map(_._3.toDouble).toSeq)
    val mb = quintiles(per.map(_._4).toSeq)
    def score(v: Double, b: Seq[Double]): Long = 1L + b.count(v > _)
    val rows = RelationalOps.rfmSegments(spark, Sf).collect()
    assert(rows.length == per.length)
    rows.foreach { r =>
      val c = r.getLong(0)
      val (_, _, freq, mon) = per.find(_._1 == c).get
      assert(r.getLong(1) == rec(c) && r.getLong(2) == freq && r.getDouble(3) == mon)
      val (rs, fs, ms) =
        (6L - score(rec(c).toDouble, rb), score(freq.toDouble, fb), score(mon, mb))
      assert(r.getLong(4) == rs && r.getLong(5) == fs && r.getLong(6) == ms,
        s"customer $c scores")
      val seg = if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs <= 2 && fs <= 2) "dormant"
        else if (ms >= 4) "big_spender" else "regular"
      assert(r.getString(7) == seg)
    }
    // every rule fires at test SF
    assert(rows.map(_.getString(7)).toSet ==
      Set("champion", "dormant", "big_spender", "regular"))
  }

  test("chi2FlagStatus: per-cell expected/contrib recompute from a driver-side contingency table") {
    import org.apache.spark.sql.functions._
    val pairs = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"), col("l_linestatus")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowT = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = pairs.length.toLong
    val rows = RelationalOps.chi2FlagStatus(spark, Sf).collect()
    assert(rows.length == cells.size && rows.nonEmpty)
    rows.foreach { r =>
      val (f, s) = (r.getString(0), r.getString(1))
      val key = (f, s)
      val o = cells(key)
      val e = rowT(f).toDouble * colT(s).toDouble / n.toDouble
      val diff = o.toDouble - e
      assert(r.getLong(2) == o && r.getLong(3) == rowT(f) &&
        r.getLong(4) == colT(s) && r.getLong(5) == n)
      assert(r.getDouble(6) == e, s"cell $key expected")
      assert(r.getDouble(7) == diff * diff / e, s"cell $key contrib")
      assert(r.getBoolean(8) == (diff * diff > 9.0 * e), s"cell $key flag")
    }
    // the synthetic fixture draws flag and status independently, so the
    // audit's clean verdict here is a TRUE NEGATIVE (cf. benfordAudit's
    // true rejection); the invariants below pin the table's consistency
    assert(rows.map(_.getLong(2)).sum == n)
    assert(math.abs(rows.map(_.getDouble(6)).sum - n.toDouble) < 1e-6)
  }

  test("giniSpend: rank-formula coefficient recomputes from exact driver-side cents") {
    import org.apache.spark.sql.functions._
    val spend = Tables.orders(spark, Sf)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).movePointRight(2).longValueExact())
      .toMap
    val seg = Tables.customer(spark, Sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = RelationalOps.giniSpend(spark, Sf).collect()
    assert(rows.length == seg.values.toSet.size && rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getString(0)
      val xs = spend.toSeq.collect { case (ck, c) if seg.get(ck).contains(m) => (c, ck) }
        .sortBy(identity).map(_._1)
      val nn = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val sixi = xs.zipWithIndex.map { case (x, i0) => BigInt(i0 + 1) * x }.sum
      assert(r.getLong(1) == xs.length.toLong, s"segment $m n")
      assert(r.getDouble(2) == sx.toDouble / 100.0, s"segment $m total")
      val g = (2 * sixi - (nn + 1) * sx).toDouble / (nn * sx).toDouble
      assert(r.getDouble(3) == g, s"segment $m gini")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
    // spend inequality is real on the fixture: some segment's gini is
    // non-trivially positive
    assert(rows.map(_.getDouble(3)).max > 0.05)
  }
  test("assocRules: both directions per pair, confidence replays exactly") {
    val pairs = RelationalOps.basketPairs(spark, Sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    val rules = RelationalOps.assocRules(spark, Sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rules.size == 2 * pairs.length)
    for (((a, b), (sup, supA, supB, lift)) <- pairs) {
      val ab = rules((a, b))
      val ba = rules((b, a))
      assert(ab._1 == sup && ba._1 == sup)
      assert(ab._2 == supA && ba._2 == supB)
      assert(ab._3 == sup.toDouble / supA && ba._3 == sup.toDouble / supB)
      assert(ab._4 == lift && ba._4 == lift)
      assert(ab._3 > 0 && ab._3 <= 1.0 && ba._3 <= 1.0)
    }
  }
}

