package graft

import graft.operators.TimeSeriesOps
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("gapFillHourly: hand-built frame — dense grid, zero-fill, forward-fill") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: span 09:00-12:00 => 4 grid hours, purchase at 09 then silence
      (1L, t("2024-01-01 09:10:00"), "purchase", 5.0),
      (1L, t("2024-01-01 09:20:00"), "click", 0.0),
      (1L, t("2024-01-01 12:30:00"), "click", 0.0),
      // user 2: single event => 1 grid hour, no purchase ever
      (2L, t("2024-01-01 00:05:00"), "click", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = TimeSeriesOps.gapFillHourlyOn(ev, 100L)
      .orderBy("user_id", "hour").collect()
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.length == 4) // 09,10,11,12 — gaps materialized
    assert(u1.map(_.getAs[Long]("clicks")).toSeq == Seq(1L, 0L, 0L, 1L))
    // purchase value carried forward across the empty hours
    assert(u1.forall(_.getAs[Double]("last_purchase_value") == 5.0))
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.isNullAt(3)) // never purchased => null, not 0
  }

  test("sessionize: splits strictly-greater-than-gap, keeps boundary gap in-session") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 10:10:00")),
      (3L, 1L, t("2024-01-01 10:40:00")), // exactly 30 min after prev => same session
      (4L, 1L, t("2024-01-01 11:11:00")), // 31 min gap => new session
      (5L, 2L, t("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = TimeSeriesOps.sessionizeOn(ev, 30)
      .orderBy("user_id", "session_seq").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_events"))).toSeq ==
      Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
    val s1 = got.head
    assert(s1.getAs[java.sql.Timestamp]("session_start") == t("2024-01-01 10:00:00"))
    assert(s1.getAs[java.sql.Timestamp]("session_end") == t("2024-01-01 10:40:00"))
  }

  test("sessionize on the corpus: single shuffle; event totals conserved") {
    val df = TimeSeriesOps.sessionize(spark, Sf)
    val shuffles = df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 1, s"sessionize plans $shuffles shuffles")
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, Sf).count())
  }

  test("gapFillHourly on the corpus: spine is gap-free and click totals are conserved") {
    val df = TimeSeriesOps.gapFillHourly(spark, Sf).cache()
    try {
      // per-user row count == hours between that user's min and max hour, inclusive
      val spans = df.groupBy("user_id")
        .agg(count("*").as("n"),
          ((unix_timestamp(max("hour")) - unix_timestamp(min("hour"))) / 3600 + 1).as("expect"))
        .where(col("n") =!= col("expect")).count()
      assert(spans == 0)
      val gridClicks = df.agg(sum("clicks")).collect().head.getLong(0)
      val rawClicks = Tables.events(spark, Sf)
        .where(col("user_id") < 20 && col("event_type") === "click").count()
      assert(gridClicks == rawClicks)
    } finally df.unpersist()
  }
  test("rollingActiveUsers: hand-built frame — window coverage, spine-bounded days") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // u1 active day 1 and day 9; u2 active day 1 only; corpus days {1, 9}
    val ev = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-09")),
      (2L, t("2024-01-01"))
    ).toDF("user_id", "ts")
    val got = TimeSeriesOps.rollingActiveUsersOn(ev, 7)
      .orderBy("day_idx").collect()
    // only real corpus days emit (no phantom trailing days 2..8, 10..15)
    assert(got.map(_.getAs[java.sql.Date]("day").toString).toSeq ==
      Seq("2024-01-01", "2024-01-09"))
    // day 1: both users active that day; day 9: u1 only (day 1 is 8 days back)
    assert(got.map(_.getAs[Long]("active_users")).toSeq == Seq(2L, 1L))
    // duplicate events inside the window never double-count
    val dup = Seq((1L, t("2024-01-02")), (1L, t("2024-01-03")), (1L, t("2024-01-05")))
      .toDF("user_id", "ts")
    val one = TimeSeriesOps.rollingActiveUsersOn(dup, 7).collect()
    assert(one.forall(_.getAs[Long]("active_users") == 1L))
  }

  test("rollingActiveUsers on the corpus: window >= daily actives, bounded by cumulative") {
    val daily = TimeSeriesOps.rollingActiveUsersOn(Tables.events(spark, Sf), 1)
      .withColumnRenamed("active_users", "dau")
    val weekly = TimeSeriesOps.rollingActiveUsers(spark, Sf)
    val joined = weekly.join(daily, Seq("day_idx")).collect()
    assert(joined.nonEmpty)
    // WAU dominates DAU on every day
    assert(joined.forall(r => r.getAs[Long]("active_users") >= r.getAs[Long]("dau")))
    val totalUsers = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(joined.forall(_.getAs[Long]("active_users") <= totalUsers))
  }

  test("interpHourly: hand-built frame — midpoint interpolation, edge semantics") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // purchases at 09:xx (10.0) and 13:xx (30.0): hours 10,11,12 interpolate
      (1L, t("2024-01-01 09:10:00"), "purchase", 10.0),
      (1L, t("2024-01-01 13:30:00"), "purchase", 30.0),
      (1L, t("2024-01-01 15:30:00"), "click", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = TimeSeriesOps.interpHourlyOn(ev, 100L)
      .orderBy("hour").collect()
    assert(got.length == 7) // 09..15
    val vals = got.map(r =>
      if (r.isNullAt(3)) None else Some(r.getAs[Double]("interp_value")))
    // 09 observed, 10..12 linear (15, 20, 25), 13 observed, 14-15 hold last
    assert(vals.toSeq == Seq(Some(10.0), Some(15.0), Some(20.0), Some(25.0),
      Some(30.0), Some(30.0), Some(30.0)))
    assert(got.map(_.getAs[Boolean]("is_observed")).toSeq ==
      Seq(true, false, false, false, true, false, false))
    // leading edge: user with a click-hour BEFORE the first purchase => null
    val lead = Seq(
      (2L, t("2024-01-01 08:00:00"), "click", 0.0),
      (2L, t("2024-01-01 10:00:00"), "purchase", 7.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val l = TimeSeriesOps.interpHourlyOn(lead, 100L).orderBy("hour").collect()
    assert(l.head.isNullAt(3) && l.last.getAs[Double]("interp_value") == 7.0)
  }

  test("changepoints: hand-built level shift — CUSUM peaks at the last pre-shift point") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: 0,0,0 then 10,10,10 — n·S_i − i·S_n peaks at i=3 (dev 90)
    // user 2: constant stream — dev identically 0, tie-break picks i=1
    val ev = (1 to 6).map(i =>
        (1L, t(i), i.toLong, if (i <= 3) 0.0 else 10.0)) ++
      (1 to 4).map(i => (2L, t(i), 10L + i, 5.0))
    val got = TimeSeriesOps.changepointsOn(
        ev.toDF("user_id", "ts", "event_id", "value"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(1L) == ((3L, 6L, 90.0)))
    assert(got(2L) == ((1L, 4L, 0.0)))
    // custom top-k operator carries the argmax (no Window sort on dev)
    val plan = TimeSeriesOps.changepointsOn(
      ev.toDF("user_id", "ts", "event_id", "value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
  }

  test("cohortRetention: hand-built frame — offsets, sizes, and rates") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // both users first seen Jan 5; user 1 returns on the 6th and 8th,
      // user 2 resurfaces only on the 15th
      (1L, t("2024-01-05 09:00:00")), (1L, t("2024-01-06 10:00:00")),
      (1L, t("2024-01-08 08:00:00")), (1L, t("2024-01-08 23:00:00")), // same day twice
      (2L, t("2024-01-05 12:00:00")), (2L, t("2024-01-15 00:00:00"))
    ).toDF("user_id", "ts")
    val got = TimeSeriesOps.cohortRetentionOn(ev)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val jan5 = java.time.LocalDate.of(2024, 1, 5).toEpochDay
    assert(got.toSeq == Seq(
      (jan5, 0L, 2L, 2L, 1.0),   // both users active on their cohort day
      (jan5, 1L, 1L, 2L, 0.5),   // only user 1 back the next day
      (jan5, 3L, 1L, 2L, 0.5),   // two same-day events still count once
      (jan5, 10L, 1L, 2L, 0.5))) // user 2 resurfaces on day 10
  }

  test("cohortRetention on the corpus: offset-0 retention is 1 and actives never exceed cohort") {
    val rows = TimeSeriesOps.cohortRetention(spark, Sf).collect()
    assert(rows.length > 1) // daily grain over the one-month stream: a real triangle
    rows.foreach { r =>
      val (off, active, size, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(active <= size)
      if (off == 0L) assert(active == size && ret == 1.0)
    }
    // every user lands in exactly one cohort: offset-0 actives sum to user count
    val users = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum == users)
  }

  test("funnelSteps: sequential semantics — stage timestamps must be strictly ordered") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:05:00"), "click"),
      (1L, t("2024-01-01 10:10:00"), "purchase"),
      // user 2: clicked BEFORE first view — not a conversion
      (2L, t("2024-01-01 09:00:00"), "click"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      // user 3: view+click but purchase precedes the click — stops at click
      (3L, t("2024-01-01 08:00:00"), "view"),
      (3L, t("2024-01-01 08:30:00"), "purchase"),
      (3L, t("2024-01-01 09:00:00"), "click"),
      // user 4: never viewed
      (4L, t("2024-01-01 07:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = TimeSeriesOps.funnelStepsOn(ev).collect().head
    assert(r.getLong(0) == 4L) // n_users
    assert(r.getLong(1) == 3L) // n_view: users 1,2,3
    assert(r.getLong(2) == 2L) // n_view_click: users 1,3 (user 2's click too early)
    assert(r.getLong(3) == 1L) // n_view_click_purchase: user 1 only
    assert(r.getDouble(4) == 2.0 / 3.0 && r.getDouble(5) == 0.5)
  }

  test("funnelSteps on the corpus: monotone stage counts, raw stream never shuffled") {
    val df = TimeSeriesOps.funnelSteps(spark, Sf)
    // plan shape read BEFORE execution (post-AQE toString doubles up
    // initial+final sections): each cascaded stage may exchange its
    // map-side-combined per-user partials (≤ one row per user per
    // partition), but the raw event rows themselves must reach every
    // stage via broadcast or a reused exchange — never a per-stage
    // reshuffle of the full stream
    val plan = df.queryExecution.executedPlan.toString
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 3, s"funnelSteps plans $hashExchanges hash exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val r = df.collect().head
    assert(r.getLong(0) >= r.getLong(1) &&
      r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3))
    assert(r.getLong(3) > 0) // the synthetic stream does contain full funnels
  }

  test("valueOutliers: flags exactly the far points; z agrees with Spark's stddev") {
    val got = TimeSeriesOps.valueOutliers(spark, Sf).cache()
    try {
      assert(got.count() > 0)
      // every flagged z clears the cut (rounded emission, unrounded filter)
      assert(got.where(abs(col("z")) <= TimeSeriesOps.OutlierZ - 0.001).count() == 0)
      // cross-check vs the library estimator: same flag set at the same cut
      val viaStddev = Tables.events(spark, Sf)
        .withColumn("mu", avg(col("value")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
        .withColumn("sd", stddev(col("value")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
        .where(col("sd") > 0 &&
          abs((col("value") - col("mu")) / col("sd")) > TimeSeriesOps.OutlierZ)
        .select(col("event_id"))
      assert(got.select(col("event_id")).exceptAll(viaStddev).count() == 0)
      assert(viaStddev.exceptAll(got.select(col("event_id"))).count() == 0)
    } finally got.unpersist()
  }

  test("madOutliers: flag set matches a driver-side median/MAD recompute") {
    val got = TimeSeriesOps.madOutliers(spark, Sf).collect()
      .map(r => r.getLong(0)).toSet
    def medOf(xs: Array[Double]): Double = {
      // linear-interpolation median — the percentile(0.5) definition
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val byUser = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._2)
    val expect = byUser.flatMap { case (_, rows) =>
      if (rows.length <= 2) Nil
      else {
        val med = medOf(rows.map(_._3))
        val mad = medOf(rows.map(r => math.abs(r._3 - med)))
        if (mad <= 0) Nil
        else rows.filter(r =>
          math.abs(TimeSeriesOps.MadK * (r._3 - med) / mad) > TimeSeriesOps.MadZ)
          .map(_._1).toSeq
      }
    }.toSet
    assert(got == expect && got.nonEmpty)
  }

  test("valueMoments: closed-form moments agree with Spark's estimators") {
    val got = TimeSeriesOps.valueMoments(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val ref = Tables.events(spark, Sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean"),
        var_samp(col("value")).as("v"), skewness(col("value")).as("sk"),
        kurtosis(col("value")).as("ku"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    got.foreach { case (et, n, mean, v, sk, ku) =>
      val (rn, rmean, rv, rsk, rku) = ref(et)
      assert(n == rn)
      assert(math.abs(mean - rmean) < 1e-4, s"$et mean $mean vs $rmean")
      assert(math.abs(v - rv) / rv < 1e-6, s"$et var $v vs $rv")
      assert(math.abs(sk - rsk) < 1e-4, s"$et skew $sk vs $rsk")
      assert(math.abs(ku - rku) < 1e-4, s"$et kurt $ku vs $rku")
    }
  }

  test("decayedEngagement: weights bounded by counts, today's events weigh 1") {
    val rows = TimeSeriesOps.decayedEngagement(spark, Sf).collect()
    assert(rows.nonEmpty)
    val horizon = Tables.events(spark, Sf)
      .agg(max(col("ts").cast("date"))).collect().head.getDate(0)
    rows.foreach { r =>
      val (n, wsum) = (r.getLong(1), r.getDouble(2))
      // each weight is in (0, 1]: the sum is positive and never exceeds n
      assert(wsum > 0.0 && wsum <= n.toDouble)
    }
    // a user active on the horizon day contributes a full 1.0 from that event
    val lastDay = rows.filter(_.getDate(3) == horizon)
    assert(lastDay.nonEmpty && lastDay.forall(_.getDouble(2) >= 1.0))
  }

  test("eventTransitions: probabilities sum to 1 per source; totals conserve the stream") {
    val rows = TimeSeriesOps.eventTransitions(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(math.abs(grp.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    // every non-first event is exactly one transition's target
    val total = rows.map(_.getLong(2)).sum
    val nEvents = Tables.events(spark, Sf).count()
    val nUsers = Tables.events(spark, Sf).select("user_id").distinct().count()
    assert(total == nEvents - nUsers)
  }

  test("seasonalForecast: forecast is the season-lagged actual; MASE recomputes exactly") {
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val oneStep = daily.toSeq.flatMap { case (d, y) =>
      daily.get(d.minusDays(1)).map(p => math.abs(y - p))
    }
    val scale1 = oneStep.sum.toDouble / oneStep.size
    val rows = TimeSeriesOps.seasonalForecast(spark, Sf).collect()
    val expDays = daily.keySet.filter(d =>
      daily.contains(d.minusDays(TimeSeriesOps.ForecastSeason)))
    assert(rows.map(_.getDate(0).toLocalDate).toSet == expDays)
    val sumErr = rows.map(_.getLong(3)).sum
    val expMase = BigDecimal((sumErr.toDouble / rows.length) / scale1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(1) == daily(d))
      assert(r.getLong(2) == daily(d.minusDays(TimeSeriesOps.ForecastSeason)))
      assert(r.getLong(3) == math.abs(r.getLong(1) - r.getLong(2)))
      val expScaled = BigDecimal(r.getLong(3).toDouble / scale1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expScaled)
      assert(r.getDouble(5) == expMase)
    }
  }

  test("stlDecompose: trend/seasonal/residual recompute; components reassemble the actual") {
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    def dayi(d: java.time.LocalDate): Long = d.toEpochDay
    // full-window days and their exact integer moments
    val full = daily.keys.filter { d =>
      (-3 to 3).forall(k => daily.contains(d.plusDays(k)))
    }.toSeq
    val t7 = full.map(d => d -> (-3 to 3).map(k => daily(d.plusDays(k))).sum).toMap
    val dnum = full.map(d => d -> (7L * daily(d) - t7(d))).toMap
    val byDow = full.groupBy(d => dayi(d) % 7)
    val snum = byDow.view.mapValues(_.map(dnum).sum).toMap
    val sden = byDow.view.mapValues(_.size.toLong).toMap
    val rows = TimeSeriesOps.stlDecompose(spark, Sf).collect()
    assert(rows.map(_.getDate(0).toLocalDate).toSet == full.toSet && full.nonEmpty)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val dow = dayi(d) % 7
      assert(r.getLong(1) == daily(d) && r.getLong(2) == dow)
      val trend = t7(d).toDouble / 7
      val seasonal = snum(dow).toDouble / (sden(dow) * 7L).toDouble
      val residual = dnum(d).toDouble / 7 - seasonal
      assert(r.getDouble(3) == trend && r.getDouble(4) == seasonal &&
        r.getDouble(5) == residual, s"day $d components")
      // additive identity within fp tolerance
      assert(math.abs(trend + seasonal + residual - daily(d)) < 1e-9)
    }
    // seasonal genuinely varies by day-of-week on this series
    assert(rows.map(_.getDouble(4)).distinct.length > 1)
  }

  test("stlAnomalies: robust-z flags recompute from the decomposition residuals") {
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val pos = 0.5 * (s.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      s(lo) + (s(hi) - s(lo)) * (pos - lo)
    }
    val res = TimeSeriesOps.stlDecompose(spark, Sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(5)).toMap
    val med = median(res.values.toSeq)
    val mad = median(res.values.map(v => math.abs(v - med)).toSeq)
    val rows = TimeSeriesOps.stlAnomalies(spark, Sf).collect()
    assert(rows.map(_.getDate(0).toLocalDate).toSet == res.keySet)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getDouble(2) == res(d) && r.getDouble(3) == med && r.getDouble(4) == mad)
      val exp = math.abs(res(d) - med) * TimeSeriesOps.StlMadDen >
        mad * TimeSeriesOps.StlMadNum
      assert(r.getBoolean(5) == exp, s"day $d flag")
    }
    // the alarm is rare by construction (sf0.001's 11-day series happens
    // to be all-quiet; the sf0.01 oracle run exercises the firing branch)
    val n = rows.count(_.getBoolean(5))
    assert(n <= rows.length / 10, s"$n of ${rows.length} flagged")
  }

  test("sessionStats: rollup reconciles exactly with the per-session table") {
    // duration = floor(end epoch-sec) - floor(start epoch-sec), exactly the
    // unix_timestamp difference the op computes (NOT floor of the delta)
    val sess = TimeSeriesOps.sessionize(spark, Sf).collect()
      .map(r => (r.getTimestamp(3).getTime / 1000L -
        r.getTimestamp(2).getTime / 1000L, r.getLong(4)))
    val r = TimeSeriesOps.sessionStats(spark, Sf).collect().head
    val (ns, nb) = (sess.length.toLong, sess.count(_._2 == 1L).toLong)
    assert(r.getLong(0) == ns && r.getLong(1) == nb)
    assert(r.getDouble(2) == nb.toDouble / ns)
    assert(r.getDouble(3) == sess.map(_._1).sum.toDouble / ns)
    assert(r.getDouble(4) == sess.map(_._2).sum.toDouble / ns)
    // both engagement states exist in the fixture
    assert(nb > 0 && nb < ns)
  }

  test("activityHeatmap: cells recompute from epoch arithmetic; dow rows sum to one") {
    val evs = Tables.events(spark, Sf).select(col("ts")).collect()
      .map(_.getTimestamp(0).getTime / 1000L)
    val exp = evs.map(s => (s / 86400L % 7L, s / 3600L % 24L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TimeSeriesOps.activityHeatmap(spark, Sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == exp.keySet)
    val dowTotals = exp.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == exp(k) && r.getLong(3) == dowTotals(k._1))
      assert(r.getDouble(4) == exp(k).toDouble / dowTotals(k._1))
    }
    // each dow row's shares sum to ~1
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    }
  }

  test("topPaths: trigram counts recompute from per-user ordered streams") {
    val evs = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    evs.groupBy(_._1).values.foreach { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3).foreach { t =>
        val p = t.mkString(">")
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    }
    val exp = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(TimeSeriesOps.TopPathsK)
    val got = TimeSeriesOps.topPaths(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq.sortBy { case (p, n) => (-n, p) } == exp && got.nonEmpty)
  }

  test("windowFunnel: earliest-anchor chain recomputes; the window genuinely constrains") {
    val evs = Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
    val byUser = evs.groupBy(_._1)
    val windowMs = TimeSeriesOps.FunnelWindowHours * 3600 * 1000L
    val exp = byUser.flatMap { case (u, es) =>
      val views = es.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) None else {
        val t1 = views.min
        val t2 = es.filter(e => e._3 == "click" && e._2 > t1 &&
          e._2 <= t1 + windowMs).map(_._2).minOption
        val t3 = t2.flatMap(c => es.filter(e => e._3 == "purchase" &&
          e._2 > c && e._2 <= t1 + windowMs).map(_._2).minOption)
        Some(u -> (t1, t2, t3))
      }
    }
    val rows = TimeSeriesOps.windowFunnel(spark, Sf).collect()
    assert(rows.map(_.getLong(0)).toSet == exp.keySet && exp.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(0)
      val (t1, t2, t3) = exp(u)
      assert(r.getTimestamp(1).getTime == t1)
      assert(Option(r.getTimestamp(2)).map(_.getTime) == t2, s"user $u click")
      assert(Option(r.getTimestamp(3)).map(_.getTime) == t3, s"user $u purchase")
      assert(r.getLong(4) == 1L + t2.size + t3.size)
    }
    // the time window genuinely cuts vs the unconstrained funnel
    val unconstrained = byUser.count { case (_, es) =>
      val views = es.filter(_._3 == "view").map(_._2)
      views.nonEmpty && es.exists(e => e._3 == "click" && e._2 > views.min)
    }
    assert(rows.count(_.getLong(4) >= 2) < unconstrained)
  }

  test("scd2UserState: intervals tile each user's timeline with no overlap or dup states") {
    val rows = TimeSeriesOps.scd2UserState(spark, Sf)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(r => (r.getTimestamp(2).getTime, r.getTimestamp(2).getNanos))
      // exactly one open (current) interval per user, and it is the last one
      assert(sorted.count(_.isNullAt(3)) == 1 && sorted.last.isNullAt(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each interval closes exactly where the next opens
          assert(a.getTimestamp(3) == b.getTimestamp(2))
          // consecutive duplicate states were collapsed
          assert(a.getString(1) != b.getString(1))
        case _ => ()
      }
    }
  }

  test("ewmaDaily: truncated convolution recomputes from a driver-side daily series") {
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("rev"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(1)).toMap
    def ewma(d: java.time.LocalDate): (Long, Double) = {
      val terms = (0 until TimeSeriesOps.EwmaWindow)
        .flatMap(k => daily.get(d.minusDays(k.toLong))
          .map(rev => math.pow(TimeSeriesOps.EwmaDecay, k.toDouble) * rev))
      val s = BigDecimal(TimeSeriesOps.EwmaAlpha * terms.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (terms.size.toLong, s)
    }
    val got = TimeSeriesOps.ewmaDaily(spark, Sf).collect()
    assert(got.length == daily.size && got.nonEmpty)
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val (nk, e) = ewma(d)
      assert(r.getDouble(1) == daily(d), s"day $d revenue")
      assert(r.getLong(2) == nk, s"day $d kernel size")
      assert(math.abs(r.getDouble(3) - e) < 2e-6, s"day $d ewma")
      // causal smoother stays within the window's observed revenue range
      val window = (0 until TimeSeriesOps.EwmaWindow)
        .flatMap(k => daily.get(d.minusDays(k.toLong)))
      assert(r.getDouble(3) <= window.max + 1e-6)
    }
    // kernels are bounded by the window and non-trivial somewhere (the
    // sf0.001 daily series is sparse, so full 30-day kernels need not occur)
    assert(got.map(_.getLong(2)).forall(k => k >= 1 && k <= TimeSeriesOps.EwmaWindow))
    assert(got.map(_.getLong(2)).max > 1)
  }

  test("mannKendall: S, tie-corrected variance, and z recompute driver-side") {
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1))
      .sortBy(_._1.toEpochDay)
    val xs = daily.map(_._2)
    var s = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      s += java.lang.Long.signum(xs(j) - xs(i)).toLong
    val n = xs.length.toLong
    val tieTerm = xs.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = (n * (n - 1) * (2 * n + 5) - tieTerm).toDouble / 18.0
    val z = if (s > 0) (s - 1).toDouble / math.sqrt(varS)
      else if (s < 0) (s + 1).toDouble / math.sqrt(varS) else 0.0
    val r = TimeSeriesOps.mannKendall(spark, Sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == s)
    assert(r.getLong(2) == xs.distinct.length.toLong)
    assert(r.getDouble(3) == varS && r.getDouble(4) == z)
    val trend = if (z > TimeSeriesOps.MkZCrit) "increasing"
      else if (z < -TimeSeriesOps.MkZCrit) "decreasing" else "no_trend"
    assert(r.getString(5) == trend)
    // ties are real on a count-valued series, so the correction is exercised
    assert(tieTerm > 0)
  }

  test("seasonalityStrength: both strengths recompute from the collected decomposition") {
    // columns: day, actual, dow, trend(3), seasonal(4), residual(5)
    val stl = TimeSeriesOps.stlDecompose(spark, Sf).collect()
    val rs = stl.map(_.getDouble(5))
    val srs = stl.map(r => r.getDouble(4) + r.getDouble(5))
    val trs = stl.map(r => r.getDouble(3) + r.getDouble(5))
    def varP(xs: Array[Double]): Double = {
      val n = xs.length.toDouble
      xs.map(x => x * x).sum / n - (xs.sum / n) * (xs.sum / n)
    }
    val fs = math.max(0.0, 1.0 - varP(rs) / varP(srs))
    val ft = math.max(0.0, 1.0 - varP(rs) / varP(trs))
    val r = TimeSeriesOps.seasonalityStrength(spark, Sf).collect().head
    assert(r.getLong(0) == rs.length.toLong)
    assert(math.abs(r.getDouble(1) - fs) < 2e-6)
    assert(math.abs(r.getDouble(2) - ft) < 2e-6)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    // residual variation is real on every fixture (neither strength
    // saturates at 1), and the two strengths genuinely differ — the
    // decomposition is not degenerate. (Regime note: the sparse sf0.001
    // series reads seasonal 0.42 — dow means absorb noise — while the
    // dense sf0.01 series reads 0.004: the no-weekly-shape truth.)
    assert(r.getDouble(1) < 1.0 && r.getDouble(2) < 1.0)
    assert(r.getDouble(1) != r.getDouble(2))
  }

  test("mannWhitney: closed-form 2U equals the naive pairwise count; variance and z replay") {
    val ev = Tables.events(spark, Sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = ev.collect { case ("purchase", c) => c }
    val ys = ev.collect { case ("click", c) => c }
    // naive definition: 2U = #(x>y)*2 + #(x=y)
    var u2 = 0L
    for (x <- xs; y <- ys) {
      if (x > y) u2 += 2L else if (x == y) u2 += 1L
    }
    val (n1, n2) = (xs.length.toLong, ys.length.toLong)
    val n = n1 + n2
    val tieCubes = (xs ++ ys).groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val varU = n1.toDouble * n2.toDouble *
      ((n + 1) * n * (n - 1) - tieCubes).toDouble / (12.0 * (n * (n - 1)).toDouble)
    val z = (u2.toDouble / 2.0 - (n1 * n2).toDouble / 2.0) / math.sqrt(varU)
    val r = TimeSeriesOps.mannWhitney(spark, Sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == u2, "closed-form 2U vs naive pairwise")
    assert(r.getDouble(3) == u2.toDouble / 2.0)
    assert(r.getDouble(4) == varU && r.getDouble(5) == z)
    assert(r.getBoolean(6) == (math.abs(z) > TimeSeriesOps.MkZCrit))
    // ties exist on a 2dp-quantized value domain, so the correction is real
    assert(tieCubes > 0)
  }

  test("ksPurchaseClick: D statistic recomputes from driver-side ECDFs") {
    val ev = Tables.events(spark, Sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n1 = ev.count(_._1 == "purchase").toLong
    val n2 = ev.count(_._1 == "click").toLong
    val support = ev.map(_._2).distinct.sorted
    var (c1, c2) = (0L, 0L)
    val byCents = ev.groupBy(_._2)
    val ecdf = support.map { c =>
      c1 += byCents(c).count(_._1 == "purchase").toLong
      c2 += byCents(c).count(_._1 == "click").toLong
      c -> math.abs(c1.toDouble / n1.toDouble - c2.toDouble / n2.toDouble)
    }
    val dMax = ecdf.map(_._2).max
    val expAt = ecdf.filter(_._2 == dMax).map(_._1).min
    val r = TimeSeriesOps.ksPurchaseClick(spark, Sf).collect().head
    assert(r.getLong(1) == n1 && r.getLong(2) == n2)
    assert(r.getLong(0) == expAt && r.getDouble(3) == dMax)
    assert(r.getBoolean(4) ==
      (dMax > TimeSeriesOps.KsCoeff *
        math.sqrt((n1 + n2).toDouble / (n1 * n2).toDouble)))
    assert(dMax > 0.0 && dMax < 1.0)
  }

  test("theilSen: slope and intercept recompute from driver-side brute-force medians") {
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    // the same bracketing-rank median the operator computes: sort, take the
    // values at ranks (n+1)/2 and (n+2)/2, average — no interpolation kernel
    def med(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val (k1, k2) = ((s.length + 1) / 2, (s.length + 2) / 2)
      (s(k1 - 1) + s(k2 - 1)) / 2.0
    }
    val slopes = for {
      Seq((d1, x1), (d2, x2)) <- daily.toSeq.combinations(2).toSeq
    } yield (x2 - x1).toDouble / (d2 - d1).toDouble
    val slope = med(slopes)
    val icept = med(daily.toSeq.map { case (d, x) => x.toDouble - slope * d.toDouble })
    val r = TimeSeriesOps.theilSen(spark, Sf).collect().head
    assert(r.getLong(0) == daily.length.toLong)
    assert(r.getLong(1) == slopes.length.toLong)
    assert(r.getDouble(2) == slope, s"slope ${r.getDouble(2)} != $slope")
    assert(r.getDouble(3) == icept, s"intercept ${r.getDouble(3)} != $icept")
    // the synthetic order stream is rate-stationary: the robust slope must
    // be tiny relative to the daily level
    val meanX = daily.map(_._2).sum.toDouble / daily.length
    assert(math.abs(slope) < 0.05 * meanX)
  }

  test("psiDrift: brute-force decile PSI replays, reference week reads exactly zero") {
    val ev = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase")
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val refWeek = ev.map(_._1).min
    val refVals = ev.filter(_._1 == refWeek).map(_._2).sorted
    val nRef = refVals.length.toLong
    // edge_k = min cents whose cumulative count satisfies cum*10 >= k*n
    val edges = (1 to 9).map { k =>
      refVals(refVals.indices.find(i => (i + 1) * 10 >= k * nRef).get)
    }
    def bin(c: Long): Int = edges.count(c > _)
    val refBins = refVals.groupBy(bin).map { case (b, vs) => b -> vs.length.toLong }
    val got = TimeSeriesOps.psiDrift(spark, Sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
    val byWeek = ev.groupBy(_._1)
    assert(got.keySet == byWeek.keySet)
    byWeek.foreach { case (w, vs) =>
      val nW = vs.length.toLong
      val wBins = vs.map(v => bin(v._2)).groupBy(identity)
        .map { case (b, xs) => b -> xs.length.toLong }
      val psi = (0 to 9).map { b =>
        val pc = (wBins.getOrElse(b, 0L) + 1).toDouble / (nW + 10).toDouble
        val pr = (refBins.getOrElse(b, 0L) + 1).toDouble / (nRef + 10).toDouble
        (pc - pr) * math.log(pc / pr)
      }.sum
      val rounded = BigDecimal(psi)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gp, gv) = got(w)
      assert(gn == nW)
      assert(math.abs(gp - rounded) <= 1e-6, s"week $w: $gp vs $rounded")
      assert(gv == (if (gp < TimeSeriesOps.PsiModerate) "stable"
        else if (gp < TimeSeriesOps.PsiMajor) "moderate" else "major"))
    }
    // the baseline compared against itself is a true zero
    assert(got(refWeek)._2 == 0.0)
  }

  test("welchTTest: moments, t, and Welch-Satterthwaite df recompute driver-side") {
    val ev = Tables.events(spark, Sf)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def moments(t: String): (Long, Double, Double) = {
      val vs = ev.filter(_._1 == t).map(_._2)
      (vs.length.toLong, vs.map(BigDecimal(_)).sum.toDouble,
        vs.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble)
    }
    val (n1, sx1, sxx1) = moments("purchase")
    val (n2, sx2, sxx2) = moments("click")
    val (n1d, n2d) = (n1.toDouble, n2.toDouble)
    val (m1, m2) = (sx1 / n1d, sx2 / n2d)
    val w1 = ((sxx1 - sx1 * sx1 / n1d) / (n1d - 1.0)) / n1d
    val w2 = ((sxx2 - sx2 * sx2 / n2d) / (n2d - 1.0)) / n2d
    val t = (m1 - m2) / math.sqrt(w1 + w2)
    val df = (w1 + w2) * (w1 + w2) /
      (w1 * w1 / (n1d - 1.0) + w2 * w2 / (n2d - 1.0))
    val r = TimeSeriesOps.welchTTest(spark, Sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(2) - m1) < 1e-9)
    assert(math.abs(r.getDouble(3) - m2) < 1e-9)
    assert(math.abs(r.getDouble(4) - t) < 1e-9, s"t ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - df) < 1e-6, s"df ${r.getDouble(5)} vs $df")
    assert(r.getBoolean(6) == (math.abs(t) > TimeSeriesOps.WelchCrit))
    // Welch df is bounded by the pooled df and exceeds the smaller sample
    assert(df > math.min(n1d, n2d) - 1 && df <= n1d + n2d - 2)
  }

  test("acf: every lag's correlation replays; exactly one dominant lag") {
    val rows = TimeSeriesOps.acf(spark, Sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(rows.keySet == (1 to TimeSeriesOps.AcfMaxLag).toSet)
    val daily = Tables.orders(spark, Sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    for (lag <- 1 to TimeSeriesOps.AcfMaxLag) {
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d.plusDays(lag.toLong)).map(y => (x, y)) }
      val n = pairs.length.toLong
      assert(rows(lag)._1 == n)
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val r = BigDecimal((n * sxy - sx * sy).toDouble /
        math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rows(lag)._2 - r) < 1e-9, s"lag $lag ${rows(lag)._2} vs $r")
    }
    // exactly one dominant lag, and it's the max-r / smallest-lag choice
    val tops = rows.filter(_._2._3).keys.toSeq
    assert(tops.size == 1)
    val want = rows.toSeq.sortBy { case (l, v) => (-v._2, l) }.head._1
    assert(tops.head == want)
  }

  test("markovAttribution: paths, chains, and removal effects replay driver-side") {
    val chans = TimeSeriesOps.MarkovChannels
    val got = TimeSeriesOps.markovAttribution(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == chans.toSet)
    // replay: walk user streams, build transition counts
    val streams = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    def bump(f: String, t: String): Unit =
      counts((f, t)) = counts.getOrElse((f, t), 0L) + 1
    for ((_, evs) <- streams) {
      val ordered = evs.sortBy(_._2).map(_._3)
      val fp = ordered.indexOf("purchase")
      val path = (if (fp >= 0) ordered.take(fp) else ordered)
        .filter(_ != "purchase")
      if (path.isEmpty && fp >= 0) bump("START", "CONV")
      else if (path.nonEmpty) {
        bump("START", path.head)
        path.sliding(2).foreach {
          case Array(a, b) => bump(a, b); case _ => }
        bump(path.last, if (fp >= 0) "CONV" else "NULL")
      }
    }
    val froms = "START" +: chans
    val tos = chans ++ Seq("CONV", "NULL")
    def p(f: String, t: String): Double = {
      val n = tos.map(x => counts.getOrElse((f, x), 0L)).sum
      if (n == 0) 0.0 else counts.getOrElse((f, t), 0L).toDouble / n
    }
    def absorb(removedChan: Option[String]): Double = {
      val live = chans.filterNot(removedChan.contains)
      var a = (froms.map(_ -> 0.0)).toMap
      for (_ <- 0 until TimeSeriesOps.AttribIters) {
        a = (for (s <- froms if s == "START" || live.contains(s)) yield {
          s -> live.foldLeft(p(s, "CONV"))((acc, t) => acc + a(t) * p(s, t))
        }).toMap.withDefaultValue(0.0)
      }
      a("START")
    }
    val base = absorb(None)
    val effects = chans.map(c => base - absorb(Some(c)))
    val effectSum = effects.sum
    for ((c, eff) <- chans.zip(effects)) {
      val g = got(c)
      assert(math.abs(g._1 - base) < 1e-9, s"base ${g._1} vs $base")
      assert(math.abs(g._3 - eff) < 1e-9, s"$c effect ${g._3} vs $eff")
      assert(g._3 >= 0.0) // same-K monotonicity: removal never helps
      if (effectSum > 0) assert(math.abs(g._4 - eff / effectSum) < 1e-6)
    }
    // conversion is near-certain on this corpus but strictly below 1
    assert(base > 0.9 && base <= 1.0)
    // shares sum to 1 when any effect exists
    if (effectSum > 0)
      assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-9)
  }

  test("cohortLtv: cumulative revenue per cohort-age replays driver-side") {
    val rows = TimeSeriesOps.cohortLtv(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (d, v) => d -> v.size }
    val purch = ev.filter(_._3 == "purchase")
      .map(e => ((cohort(e._1), e._2 - cohort(e._1)), e._4))
    val byAge = purch.groupBy(_._1)
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    assert(rows.keySet == byAge.keySet)
    for (((cd, age), (np, rc)) <- byAge) {
      val got = rows((cd, age))
      assert(got._1 == np && got._2 == rc && got._3 == sizes(cd))
      val cum = byAge.collect { case ((`cd`, a), (_, c)) if a <= age => c }.sum
      assert(math.abs(got._4 - cum.toDouble / sizes(cd) / 100.0) < 1e-9)
    }
    // the curve is non-decreasing within every cohort
    for (cd <- rows.keys.map(_._1).toSet[Long]) {
      val curve = rows.collect { case ((`cd`, a), v) => (a, v._4) }.toSeq.sortBy(_._1)
      curve.map(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b >= a - 1e-12); case _ => }
    }
  }

  test("abTest: both bucketing schemes replay; z and SRM are the written chains") {
    val rows = TimeSeriesOps.abTest(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id_parity", "hash_bucket"))
    val users = Tables.events(spark, Sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .collect().map(x => (x.getLong(0),
        if (x.getLong(1) >= TimeSeriesOps.AbConvMinPurchases) 1L else 0L))
    def check(name: String, armA: Long => Boolean): Unit = {
      val r = rows(name)
      val (a, b) = users.partition(u => armA(u._1))
      assert(r.getLong(1) == a.length && r.getLong(3) == b.length)
      assert(r.getLong(2) == a.map(_._2).sum && r.getLong(4) == b.map(_._2).sum)
      val (pa, pb) = (r.getLong(2).toDouble / a.length,
        r.getLong(4).toDouble / b.length)
      val pp = (r.getLong(2) + r.getLong(4)).toDouble / users.length
      val z =
        if (pp == 0.0 || pp == 1.0) 0.0
        else (pa - pb) /
          math.sqrt(pp * (1.0 - pp) * (1.0 / a.length + 1.0 / b.length))
      assert(math.abs(r.getDouble(7) - z) < 1e-12, s"$name z")
      val srm = (a.length.toDouble - b.length.toDouble) /
        math.sqrt(a.length.toDouble + b.length.toDouble)
      assert(math.abs(r.getDouble(9) - srm) < 1e-12)
      assert(r.getBoolean(8) == (math.abs(z) > TimeSeriesOps.AbCrit))
      assert(r.getBoolean(10) == (math.abs(srm) > TimeSeriesOps.SrmCrit))
    }
    check("id_parity", _ % 2 == 0)
    check("hash_bucket",
      id => graft.functions.MinHashAgg.h24(s"ab:$id") % 2 == 0)
    // the hash scheme never trips SRM at fixture sizes
    assert(!rows("hash_bucket").getBoolean(10))
  }

  test("firstTouchAttribution: first-touch credit replays against a driver-side walk") {
    val got = TimeSeriesOps.firstTouchAttribution(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val streams = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1)
    val credits = scala.collection.mutable.Map.empty[String, Long]
    for ((_, evs) <- streams) {
      var firstTouch: Option[String] = None
      for ((_, _, tpe) <- evs.sortBy(_._2)) {
        if (tpe == "purchase") {
          val k = firstTouch.getOrElse("none")
          credits(k) = credits.getOrElse(k, 0L) + 1
        } else if (firstTouch.isEmpty) firstTouch = Some(tpe)
      }
    }
    assert(got.keySet == credits.keySet)
    val total = credits.values.sum
    for ((k, n) <- credits) {
      assert(got(k)._1 == n, s"$k: ${got(k)._1} vs $n")
      assert(math.abs(got(k)._2 - n.toDouble / total) < 1e-12)
    }
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("attribution: last-touch credit replays against a driver-side walk") {
    val got = TimeSeriesOps.attribution(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replay: walk each user's ordered stream, credit the nearest
    // preceding non-purchase event for every purchase
    val streams = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1)
    val credits = scala.collection.mutable.Map.empty[String, Long]
    for ((_, evs) <- streams) {
      var lastTouch: Option[String] = None
      for ((_, _, tpe) <- evs.sortBy(_._2)) {
        if (tpe == "purchase") {
          val k = lastTouch.getOrElse("none")
          credits(k) = credits.getOrElse(k, 0L) + 1
        } else lastTouch = Some(tpe)
      }
    }
    assert(got.keySet == credits.keySet)
    val total = credits.values.sum
    for ((k, n) <- credits) {
      assert(got(k)._1 == n, s"$k: ${got(k)._1} vs $n")
      assert(math.abs(got(k)._2 - n.toDouble / total) < 1e-12)
    }
    // shares sum to 1, purchase never credits itself
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
    assert(!got.contains("purchase"))
  }

  test("stationaryMix: power iterations replay driver-side and converge") {
    val states = TimeSeriesOps.MarkovStates
    val got = TimeSeriesOps.stationaryMix(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == states.toSet)
    // replay: transition counts from the same lag pairs
    val counts = TimeSeriesOps.eventTransitions(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def p(t: String, s: String): Double = {
      val n = states.map(x => counts.getOrElse((t, x), 0L)).sum
      if (n == 0) 0.0 else counts.getOrElse((t, s), 0L).toDouble / n
    }
    var v = states.map(_ => 1.0 / states.size)
    var prev = v
    for (_ <- 0 until TimeSeriesOps.MarkovIters) {
      prev = v
      v = states.map(s =>
        states.zip(prev).map { case (t, vt) => vt * p(t, s) }.reduceLeft(_ + _))
    }
    for ((s, i) <- states.zipWithIndex) {
      assert(math.abs(got(s)._1 - v(i)) < 1e-12, s"$s ${got(s)._1} vs ${v(i)}")
      assert(math.abs(got(s)._2 - prev(i)) < 1e-12)
      assert(math.abs(got(s)._3 - math.abs(v(i) - prev(i))) < 1e-12)
    }
    // a probability vector, and essentially converged on this chain
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(got.values.forall(_._3 < 0.01))
  }

  test("kaplanMeier: risk sets, censoring, and the product-limit curve replay") {
    val rows = TimeSeriesOps.kaplanMeier(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) 0.0 else r.getDouble(4)))
      .sortBy(_._1)
    // replay spans driver-side
    val spans = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val h = spans.map(_._2).max
    val users = spans.map { case (f, l) =>
      (l - f, l <= h - TimeSeriesOps.KmChurnGapDays) }
    assert(rows.map(_._2).head == users.length) // first risk set = everyone
    // n_at_risk and n_churned replay per tenure
    var surv = 1.0
    for ((t, nAtRisk, nChurned, s) <- rows) {
      assert(nAtRisk == users.count(_._1 >= t))
      assert(nChurned == users.count(u => u._1 == t && u._2))
      if (nChurned > 0 && nChurned < nAtRisk)
        surv *= (nAtRisk - nChurned).toDouble / nAtRisk.toDouble
      if (nChurned == nAtRisk) surv = 0.0
      // product-limit value within the layered-rounding tolerance
      assert(math.abs(s - surv) < 1e-4, s"t=$t got $s want $surv")
    }
    // survival is non-increasing and starts at/below 1
    assert(rows.map(_._4).head <= 1.0)
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-12); case _ => }
    // censoring is real on this corpus: the newest spans must not count
    // as deaths (some user is active within the churn gap)
    assert(users.exists(!_._2))
  }
}
