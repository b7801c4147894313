package graft.operators

import graft.{Oracle, QueryPack}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[RelationalOps]] (SURVEY §2 rows X-J,
  * X-A, X-O, X-T).
  */
object RelationalPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xa_q1_pricing_summary" -> ((s, d) => RelationalOps.pricingSummary(s, d)),
    "xj_q3_shipping_priority" -> ((s, d) => RelationalOps.shippingPriority(s, d)),
    "xj_q5_local_supplier" -> ((s, d) => RelationalOps.localSupplierVolume(s, d)),
    "xa_q6_forecast_revenue" -> ((s, d) => RelationalOps.forecastRevenue(s, d)),
    "xj_q18_large_orders" -> ((s, d) => RelationalOps.largeQuantityOrders(s, d, 250.0)),
    "xj_anti_no_orders" -> ((s, d) => RelationalOps.customersWithoutOrders(s, d)),
    "xj_semi_big_spenders" -> ((s, d) => RelationalOps.bigSpenders(s, d, 400000.0)),
    "xj_asof_last_signup" -> ((s, d) => RelationalOps.asOfLastSignup(s, d)),
    "xj_interval_clicks" -> ((s, d) => RelationalOps.clicksBeforeError(s, d)),
    "xo_topk_per_customer" -> ((s, d) => RelationalOps.topOrdersPerCustomer(s, d, 2)),
    "xo_topk_custom_op" -> ((s, d) => RelationalOps.topOrdersPerCustomerCustom(s, d, 2)),
    "xo_running_total" -> ((s, d) => RelationalOps.runningOrderTotal(s, d)),
    "xo_global_topk" -> ((s, d) => RelationalOps.topOrders(s, d, 10)),
    "xo_intersect_repeat" -> ((s, d) => RelationalOps.repeatCustomers(s, d)),
    "xo_except_churned" -> ((s, d) => RelationalOps.churnedCustomers(s, d)),
    "xa_rollup_returns" -> ((s, d) => RelationalOps.returnsRollup(s, d)),
    "xa_cube_returns" -> ((s, d) => RelationalOps.returnsCube(s, d)),
    "xa_grouping_sets" -> ((s, d) => RelationalOps.shipGroupingSets(s, d)),
    "xa_approx_distinct" -> ((s, d) => RelationalOps.approxDistinctOrders(s, d)),
    "xf_q19_disjunctive" -> ((s, d) => RelationalOps.brandTierRevenue(s, d)),
    "xj_q22_idle_rich" -> ((s, d) => RelationalOps.idleRichCustomers(s, d)),
    "xa_pivot_segment_year" -> ((s, d) => RelationalOps.segmentYearPivot(s, d)),
    "xa_extreme_orders" -> ((s, d) => RelationalOps.extremeOrdersPerSegment(s, d)),
    "xt_gapfill_hourly" -> ((s, d) => TimeSeriesOps.gapFillHourly(s, d)),
    "xo_sessionize" -> ((s, d) => TimeSeriesOps.sessionize(s, d)),
    "xa_q13_order_histogram" -> ((s, d) => RelationalOps.orderCountHistogram(s, d)),
    "xa_q14_promo_share" -> ((s, d) => RelationalOps.promoRevenueShare(s, d)),
    "xa_q17_small_orders" -> ((s, d) => RelationalOps.smallQuantityRevenue(s, d)),
    "xo_ntile_quartiles" -> ((s, d) => RelationalOps.orderQuartiles(s, d)),
    "xa_unpivot_segment_year" -> ((s, d) => RelationalOps.segmentYearUnpivot(s, d)),
    "xt_json_props" -> ((s, d) => RelationalOps.propsSummary(s, d)),
    "xt_monthly_orders" -> ((s, d) => RelationalOps.monthlyOrders(s, d)),
    "xt_map_click_stats" -> ((s, d) => RelationalOps.clickStatsViaMap(s, d)),
    "xt_ship_delay" -> ((s, d) => RelationalOps.shipDelay(s, d)),
    "xj_q21_sole_late_supplier" -> ((s, d) => RelationalOps.soleLateSuppliers(s, d)),
    "xa_q16_supplier_variety" -> ((s, d) => RelationalOps.supplierVariety(s, d)),
    "xj_q2_cheapest_supplier" -> ((s, d) => RelationalOps.cheapestSupplierPerPart(s, d)),
    "xa_heavy_hitters" -> ((s, d) => RelationalOps.heavyHitterSuppliers(s, d)),
    "xj_q4_late_priority" -> ((s, d) => RelationalOps.latePriorityCounts(s, d)),
    "xj_q7_volume_shipping" -> ((s, d) => RelationalOps.volumeShipping(s, d)),
    "xj_q10_returned_losses" -> ((s, d) => RelationalOps.returnedItemLosses(s, d)),
    "xa_q15_top_supplier" -> ((s, d) => RelationalOps.topRevenueSupplier(s, d)),
    "xt_scd2_user_state" -> ((s, d) => TimeSeriesOps.scd2UserState(s, d)),
    "xo_bottomk_sample" -> ((s, d) => RelationalOps.bottomKSample(s, d)),
    "xj_q8_market_share" -> ((s, d) => RelationalOps.marketShare(s, d)),
    "xj_q9_profit_nation" -> ((s, d) => RelationalOps.profitByNation(s, d)),
    "xa_q12_priority_split" -> ((s, d) => RelationalOps.latePrioritySplit(s, d)),
    "xj_q20_excess_suppliers" -> ((s, d) => RelationalOps.excessSuppliers(s, d)),
    "xj_q11_important_stock" -> ((s, d) => RelationalOps.importantStock(s, d)),
    "xt_cohort_retention" -> ((s, d) => TimeSeriesOps.cohortRetention(s, d)),
    "xt_funnel_steps" -> ((s, d) => TimeSeriesOps.funnelSteps(s, d)),
    "xt_value_outliers" -> ((s, d) => TimeSeriesOps.valueOutliers(s, d)),
    "xa_cms_counts" -> ((s, d) => RelationalOps.cmsSupplierCounts(s, d)),
    "xt_decayed_engagement" -> ((s, d) => TimeSeriesOps.decayedEngagement(s, d)),
    "xt_event_transitions" -> ((s, d) => TimeSeriesOps.eventTransitions(s, d)),
    "xo_priority_sample" -> ((s, d) => RelationalOps.prioritySample(s, d)),
    "xa_trend_ols" -> ((s, d) => RelationalOps.trendOls(s, d)),
    "xa_corr_pairs" -> ((s, d) => RelationalOps.corrPairs(s, d)),
    "xa_basket_pairs" -> ((s, d) => RelationalOps.basketPairs(s, d)),
    "xa_assoc_rules" -> ((s, d) => RelationalOps.assocRules(s, d)),
    "xa_rfm_segments" -> ((s, d) => RelationalOps.rfmSegments(s, d)),
    "xa_benford_audit" -> ((s, d) => RelationalOps.benfordAudit(s, d)),
    "xa_spend_concentration" -> ((s, d) => RelationalOps.spendConcentration(s, d)),
    "xa_reorder_gaps" -> ((s, d) => RelationalOps.reorderGaps(s, d)),
    "xt_rolling_active" -> ((s, d) => TimeSeriesOps.rollingActiveUsers(s, d)),
    "xt_interp_hourly" -> ((s, d) => TimeSeriesOps.interpHourly(s, d)),
    "xt_changepoint" -> ((s, d) => TimeSeriesOps.changepoints(s, d)),
    "xo_segment_priority_sample" -> ((s, d) => RelationalOps.segmentPrioritySample(s, d)),
    "xj_full_outer_reconcile" -> ((s, d) => RelationalOps.yearOverYearReconcile(s, d)),
    "xa_weighted_median" -> ((s, d) => RelationalOps.weightedMedianPrice(s, d)),
    "xa_price_histogram" -> ((s, d) => RelationalOps.priceHistogram(s, d)),
    "xo_percent_rank" -> ((s, d) => RelationalOps.spendPercentiles(s, d)),
    "xt_autocorr_daily" -> ((s, d) => TimeSeriesOps.dailyAutocorr(s, d)),
    "xt_seasonal_forecast" -> ((s, d) => TimeSeriesOps.seasonalForecast(s, d)),
    "xt_stl_decompose" -> ((s, d) => TimeSeriesOps.stlDecompose(s, d)),
    "xt_stl_anomalies" -> ((s, d) => TimeSeriesOps.stlAnomalies(s, d)),
    "xt_window_funnel" -> ((s, d) => TimeSeriesOps.windowFunnel(s, d)),
    "xt_session_stats" -> ((s, d) => TimeSeriesOps.sessionStats(s, d)),
    "xt_top_paths" -> ((s, d) => TimeSeriesOps.topPaths(s, d)),
    "xt_activity_heatmap" -> ((s, d) => TimeSeriesOps.activityHeatmap(s, d)),
    "xt_mad_outliers" -> ((s, d) => TimeSeriesOps.madOutliers(s, d)),
    "xt_value_moments" -> ((s, d) => TimeSeriesOps.valueMoments(s, d)),
    "xa_chi2_flag_status" -> ((s, d) => RelationalOps.chi2FlagStatus(s, d)),
    "xa_gini_spend" -> ((s, d) => RelationalOps.giniSpend(s, d)),
    "xt_ewma_daily" -> ((s, d) => TimeSeriesOps.ewmaDaily(s, d)),
    "xt_mann_kendall" -> ((s, d) => TimeSeriesOps.mannKendall(s, d)),
    "xt_theil_sen" -> ((s, d) => TimeSeriesOps.theilSen(s, d)),
    "xt_psi_drift" -> ((s, d) => TimeSeriesOps.psiDrift(s, d)),
    "xt_welch_ttest" -> ((s, d) => TimeSeriesOps.welchTTest(s, d)),
    "xt_kaplan_meier" -> ((s, d) => TimeSeriesOps.kaplanMeier(s, d)),
    "xt_stationary_mix" -> ((s, d) => TimeSeriesOps.stationaryMix(s, d)),
    "xt_attribution" -> ((s, d) => TimeSeriesOps.attribution(s, d)),
    "xt_markov_attribution" -> ((s, d) => TimeSeriesOps.markovAttribution(s, d)),
    "xt_first_touch" -> ((s, d) => TimeSeriesOps.firstTouchAttribution(s, d)),
    "xa_ab_test" -> ((s, d) => TimeSeriesOps.abTest(s, d)),
    "xt_cohort_ltv" -> ((s, d) => TimeSeriesOps.cohortLtv(s, d)),
    "xt_acf" -> ((s, d) => TimeSeriesOps.acf(s, d)),
    "xt_ks_purchase_click" -> ((s, d) => TimeSeriesOps.ksPurchaseClick(s, d)),
    "xt_mann_whitney" -> ((s, d) => TimeSeriesOps.mannWhitney(s, d)),
    "xt_seasonality_strength" -> ((s, d) => TimeSeriesOps.seasonalityStrength(s, d)),
  )

  private val rev =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
  private def msum(c: String) = s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"

  /** Sessionizer CTE chain (ends at `sessions`) shared by the per-session
    * dump and the engagement rollup — twin of [[TimeSeriesOps.sessionize]]
    * (30-minute gap, (ts, event_id) tie order).
    */
  private val sessionCtes =
    """ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, session_seq, min(ts) AS session_start,
      |    max(ts) AS session_end, count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_seq)""".stripMargin

  /** STL-lite CTE chain (ends at `stl`) shared by the decomposition and
    * the anomaly-alarm oracles — integer until single divisions, twin of
    * [[TimeSeriesOps.stlDecompose]].
    */
  private val stlCtes =
    """daily AS (
      |  SELECT day, y,
      |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS dayi
      |  FROM (SELECT CAST(o_orderdate AS DATE) AS day,
      |          CAST(count(*) AS BIGINT) AS y
      |        FROM orders GROUP BY 1)),
      |t0 AS (
      |  SELECT day, y, dayi,
      |    CAST(sum(y) OVER win AS BIGINT) AS t7,
      |    count(*) OVER win AS n7
      |  FROM daily
      |  WINDOW win AS (ORDER BY dayi
      |                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |t AS (
      |  SELECT day, y, dayi, t7, 7 * y - t7 AS dnum,
      |    CAST(dayi % 7 AS BIGINT) AS dow
      |  FROM t0 WHERE n7 = 7),
      |s AS (
      |  SELECT dow, CAST(sum(dnum) AS BIGINT) AS snum,
      |    CAST(count(*) AS BIGINT) AS sden
      |  FROM t GROUP BY dow),
      |stl AS (
      |  SELECT day, y AS actual, dow,
      |    CAST(t7 AS DOUBLE) / 7 AS trend,
      |    CAST(snum AS DOUBLE) / CAST(sden * 7 AS DOUBLE) AS seasonal,
      |    CAST(dnum AS DOUBLE) / 7
      |      - CAST(snum AS DOUBLE) / CAST(sden * 7 AS DOUBLE) AS residual
      |  FROM t JOIN s USING (dow))""".stripMargin

  val oracles: Map[String, String] = Map(
    "xa_q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${msum("l_quantity")} AS sum_qty,
         |  ${msum("l_extendedprice")} AS sum_base_price,
         |  CAST(sum($rev) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($rev * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "xj_q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(revenue_dec AS DOUBLE) AS revenue FROM (
         |  SELECT l_orderkey, o_orderdate, sum($rev) AS revenue_dec
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |    AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
         |  GROUP BY l_orderkey, o_orderdate
         |  ORDER BY revenue_dec DESC, l_orderkey LIMIT 10)""".stripMargin,
    "xj_q5_local_supplier" ->
      s"""SELECT n_name, CAST(sum($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "xa_q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "xj_q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250.0) h
        |JOIN orders ON o_orderkey = h.l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "xj_anti_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment""".stripMargin,
    "xj_semi_big_spenders" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY c_mktsegment""".stripMargin,
    "xj_asof_last_signup" ->
      """SELECT event_id, user_id, ts, last_signup_ts FROM (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
        |  FROM events)
        |WHERE event_type = 'error'""".stripMargin,
    "xj_interval_clicks" ->
      """SELECT event_id, user_id, ts, n_recent_clicks FROM (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    count(CASE WHEN event_type = 'click' THEN 1 END)
        |      OVER (PARTITION BY user_id
        |            ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |                               CAST(ts AS TIMESTAMP))
        |            RANGE BETWEEN 600 PRECEDING AND 1 PRECEDING) AS n_recent_clicks
        |  FROM events)
        |WHERE event_type = 'error'""".stripMargin,
    "xo_topk_custom_op" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2""".stripMargin,
    "xo_topk_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2""".stripMargin,
    "xo_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders""".stripMargin,
    "xo_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "xo_intersect_repeat" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'""".stripMargin,
    "xo_except_churned" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'""".stripMargin,
    "xa_rollup_returns" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${msum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "xa_cube_returns" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${msum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "xa_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
         |  count(*) AS n, ${msum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
         |                        (l_returnflag, l_linestatus))""".stripMargin,
    "xa_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS approx_within_10pct FROM lineitem""".stripMargin,
    "xf_q19_disjunctive" ->
      s"""SELECT CAST(sum($rev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 50
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "xj_q22_idle_rich" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers,
         |  ${msum("c_acctbal")} AS total_bal
         |FROM customer
         |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |                          / count(*)
         |                   FROM customer WHERE c_acctbal > 0)
         |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
         |                        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY c_mktsegment""".stripMargin,
    "xa_pivot_segment_year" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         |       FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS DOUBLE) AS "AUTOMOBILE",
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         |       FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS "BUILDING",
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         |       FILTER (WHERE c_mktsegment = 'FURNITURE') AS DOUBLE) AS "FURNITURE",
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         |       FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS DOUBLE) AS "HOUSEHOLD",
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
         |       FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS "MACHINERY"
         |FROM orders JOIN customer ON c_custkey = o_custkey
         |GROUP BY 1""".stripMargin,
    "xa_extreme_orders" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice, o_orderdate,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS rmin,
        |    min(o_orderdate) OVER (PARTITION BY c_mktsegment) AS first_orderdate
        |  FROM orders JOIN customer ON c_custkey = o_custkey)
        |SELECT a.c_mktsegment, a.o_orderkey AS top_orderkey,
        |  a.o_totalprice AS top_price, b.o_orderkey AS first_orderkey,
        |  a.first_orderdate
        |FROM ranked a JOIN ranked b
        |  ON a.c_mktsegment = b.c_mktsegment AND a.rmax = 1 AND b.rmin = 1""".stripMargin,
    "xa_q14_promo_share" ->
      s"""SELECT CAST(100.0 * CAST(sum($rev) FILTER (WHERE p_type = 'PROMO') AS DOUBLE)
         |       / CAST(sum($rev) AS DOUBLE) AS DOUBLE) AS promo_share,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin,
    "xa_q17_small_orders" ->
      s"""SELECT ${msum("l_extendedprice")} AS total_price, count(*) AS n_items
         |FROM (
         |  SELECT l_quantity, l_extendedprice,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
         |           OVER (PARTITION BY l_partkey) AS DOUBLE)
         |      / count(*) OVER (PARTITION BY l_partkey) AS avg_qty
         |  FROM lineitem)
         |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "xa_q13_order_histogram" ->
      """SELECT c_count, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "xo_ntile_quartiles" ->
      s"""SELECT c_mktsegment, quartile, count(*) AS n,
         |  ${msum("o_totalprice")} AS total, max(o_totalprice) AS max_price
         |FROM (
         |  SELECT c_mktsegment, o_totalprice,
         |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
         |                        ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         |      AS quartile
         |  FROM orders JOIN customer ON c_custkey = o_custkey)
         |GROUP BY c_mktsegment, quartile""".stripMargin,
    "xa_unpivot_segment_year" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  c_mktsegment AS segment, ${msum("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON c_custkey = o_custkey
         |GROUP BY 1, 2""".stripMargin,
    "xo_sessionize" ->
      s"""WITH $sessionCtes
         |SELECT user_id, session_seq, session_start, session_end, n_events
         |FROM sessions""".stripMargin,
    // session rollup: exact BIGINT sums over the session table divided once
    "xt_session_stats" ->
      s"""WITH $sessionCtes,
         |d AS (
         |  SELECT CAST(date_diff('second', session_start, session_end)
         |      AS BIGINT) AS dur_sec,
         |    n_events
         |  FROM sessions),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_bounces,
         |    CAST(sum(dur_sec) AS BIGINT) AS total_dur_sec,
         |    CAST(sum(n_events) AS BIGINT) AS total_events
         |  FROM d)
         |SELECT n_sessions, n_bounces,
         |  CAST(n_bounces AS DOUBLE) / n_sessions AS bounce_rate,
         |  CAST(total_dur_sec AS DOUBLE) / n_sessions AS avg_duration_sec,
         |  CAST(total_events AS DOUBLE) / n_sessions AS avg_events
         |FROM m""".stripMargin,
    "xt_gapfill_hourly" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |            FROM events WHERE user_id < 20),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(date_trunc('hour', min(ts)),
        |                           date_trunc('hour', max(ts)),
        |                           INTERVAL 1 HOUR)) AS hour
        |  FROM ev GROUP BY user_id),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    count(*) FILTER (WHERE event_type = 'click') AS clicks_raw,
        |    max(value) FILTER (WHERE event_type = 'purchase') AS purchase_raw
        |  FROM ev GROUP BY 1, 2)
        |SELECT s.user_id, CAST(s.hour AS TIMESTAMP) AS hour,
        |  coalesce(h.clicks_raw, 0) AS clicks,
        |  last_value(h.purchase_raw IGNORE NULLS)
        |    OVER (PARTITION BY s.user_id ORDER BY s.hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM spine s
        |LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour""".stripMargin,
    "xt_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        |FROM (SELECT event_type,
        |        CAST(NULLIF(regexp_extract(props, '"k": (-?[0-9]+)', 1), '') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "xt_map_click_stats" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS clicks,
        |  count(*) FILTER (WHERE event_type = 'error') AS errors,
        |  count(*) AS total
        |FROM events GROUP BY user_id""".stripMargin,
    "xt_monthly_orders" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         |  count(*) AS n_orders, ${msum("o_totalprice")} AS total
         |FROM orders GROUP BY 1""".stripMargin,
    "xt_ship_delay" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS sum_delay_days,
        |  CAST(sum(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / count(*) AS avg_delay_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "xj_q21_sole_late_supplier" ->
      """WITH flags AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
        |             THEN 1 ELSE 0 END) AS any_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |stats AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(any_late) AS n_late
        |  FROM flags GROUP BY l_orderkey)
        |SELECT s_name, count(*) AS numwait
        |FROM flags
        |JOIN stats USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE any_late = 1 AND n_supp >= 2 AND n_late = 1
        |GROUP BY s_name""".stripMargin,
    "xa_q16_supplier_variety" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size""".stripMargin,
    "xj_q2_cheapest_supplier" ->
      """SELECT part_key, supp_key, s_name, unit_price FROM (
        |  SELECT l_partkey AS part_key, l_suppkey AS supp_key,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
        |      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS unit_price,
        |    row_number() OVER (PARTITION BY l_partkey ORDER BY
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
        |        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE),
        |      l_suppkey) AS rn
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 5
        |  GROUP BY l_partkey, l_suppkey) ranked
        |JOIN supplier ON supp_key = s_suppkey
        |WHERE rn = 1""".stripMargin,
    "xa_heavy_hitters" ->
      """SELECT l_suppkey, count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING CAST(count(*) AS DOUBLE) >
        |  (SELECT count(*) FROM lineitem) / 100.0""".stripMargin,
    "xj_q4_late_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o.o_orderkey
        |                AND datediff('day', o.o_orderdate, l_shipdate) > 30)
        |GROUP BY o_orderpriority""".stripMargin,
    "xj_q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, ship_year,
         |  CAST(sum(rev) AS DOUBLE) AS revenue FROM (
         |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS ship_year, $rev AS rev
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  WHERE ns.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
         |    AND nc.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
         |    AND ns.n_name <> nc.n_name) pairs
         |GROUP BY supp_nation, cust_nation, ship_year""".stripMargin,
    "xj_q10_returned_losses" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(revenue_dec AS DOUBLE) AS revenue FROM (
         |  SELECT o_custkey, sum($rev) AS revenue_dec
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         |  GROUP BY o_custkey
         |  ORDER BY revenue_dec DESC, o_custkey LIMIT 20) top
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "xa_q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum($rev) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "xt_scd2_user_state" ->
      """WITH changes AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |  FROM events)
        |SELECT user_id, state, valid_from, valid_to,
        |  valid_to IS NULL AS is_current FROM (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM changes
        |  WHERE prev_type IS NULL OR prev_type <> event_type) intervals""".stripMargin,
    "xo_bottomk_sample" ->
      s"""SELECT c_mktsegment, c_custkey, c_name FROM (
         |  SELECT c_mktsegment, c_custkey, c_name,
         |    row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY ${Oracle.h24("CAST(c_custkey AS VARCHAR)")}, c_custkey) AS rn
         |  FROM customer) ranked
         |WHERE rn <= 5""".stripMargin,
    "xj_q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(sum(CASE WHEN sn.n_name = 'NATION_0' THEN $rev END) AS DOUBLE) /
         |    CAST(sum($rev) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE r_name = 'AMERICA'
         |GROUP BY 1""".stripMargin,
    "xj_q9_profit_nation" ->
      s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |  CAST(sum($rev) AS DOUBLE) - 0.6 *
         |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
         |             CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY n_name, ship_year""".stripMargin,
    "xa_q12_priority_split" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND datediff('day', o_orderdate, l_shipdate) > 60
        |GROUP BY l_returnflag""".stripMargin,
    "xj_q11_important_stock" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |  FROM lineitem),
        |partsupp AS (
        |  SELECT ps_partkey, ps_suppkey,
        |    (ps_partkey*37 + ps_suppkey*17) % 9999 + 1 AS ps_availqty,
        |    (ps_partkey*13 + ps_suppkey*7) % 100000 + 100 AS ps_supplycost_cents
        |  FROM pairs),
        |nat_supp AS (
        |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_nationkey % 4 = 1),
        |per_part AS (
        |  SELECT ps_partkey,
        |    CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
        |  FROM partsupp
        |  WHERE ps_suppkey IN (SELECT s_suppkey FROM nat_supp)
        |  GROUP BY ps_partkey),
        |total AS (
        |  SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM per_part)
        |SELECT ps_partkey, value_cents
        |FROM per_part, total
        |WHERE value_cents * 10000 > total_cents""".stripMargin,
    "xt_cohort_retention" ->
      """WITH am AS (
        |  SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01',
        |                  CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS day_idx
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, min(day_idx) AS cohort_day FROM am GROUP BY user_id),
        |sizes AS (
        |  SELECT cohort_day, count(*) AS cohort_users FROM cohorts GROUP BY cohort_day)
        |SELECT cohort_day, day_idx - cohort_day AS day_offset,
        |  count(*) AS n_active, cohort_users,
        |  CAST(count(*) AS DOUBLE) / cohort_users AS retention
        |FROM am JOIN cohorts USING (user_id) JOIN sizes USING (cohort_day)
        |GROUP BY cohort_day, day_idx - cohort_day, cohort_users""".stripMargin,
    "xt_funnel_steps" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |v AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM ev GROUP BY user_id),
        |c AS (
        |  SELECT ev.user_id, min(v.t_view) AS t_view,
        |    min(CASE WHEN event_type = 'click' AND ts > v.t_view THEN ts END) AS t_click
        |  FROM ev JOIN v USING (user_id) GROUP BY ev.user_id),
        |p AS (
        |  SELECT ev.user_id, min(c.t_view) AS t_view, min(c.t_click) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' AND ts > c.t_click THEN ts END)
        |      AS t_purchase
        |  FROM ev JOIN c USING (user_id) GROUP BY ev.user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_click,
        |  CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_click_purchase,
        |  CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS click_conv,
        |  CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS purchase_conv
        |FROM p""".stripMargin,
    // the oracle REBUILDS the Count-Min cells with a GROUP BY over the same
    // portable h24 slot hash, so the estimates replay exactly
    "xa_cms_counts" -> {
      def slot(jRef: String) = Oracle.h24(
        s"CAST($jRef AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)") +
        s" % ${RelationalOps.CmsWidth}"
      s"""WITH counts AS (
         |  SELECT l_suppkey, count(*) AS exact_cnt FROM lineitem GROUP BY l_suppkey),
         |rows_j AS (SELECT unnest(range(0, ${RelationalOps.CmsDepth})) AS j),
         |cells AS (
         |  SELECT j, ${slot("j")} AS slot, CAST(sum(exact_cnt) AS BIGINT) AS cell
         |  FROM counts CROSS JOIN rows_j
         |  GROUP BY 1, 2)
         |SELECT l_suppkey, exact_cnt, min(cell) AS cms_est
         |FROM counts CROSS JOIN rows_j
         |JOIN cells ON cells.j = rows_j.j AND cells.slot = ${slot("rows_j.j")}
         |GROUP BY l_suppkey, exact_cnt""".stripMargin
    },
    "xt_event_transitions" ->
      """WITH pairs AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type,
        |         event_type AS next_type
        |  FROM events),
        |counts AS (
        |  SELECT prev_type, next_type, count(*) AS n_transitions
        |  FROM pairs WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |    sum(n_transitions) OVER (PARTITION BY prev_type) AS prob
        |FROM counts""".stripMargin,
    // decay weights are exact binary fractions (long shift + exact binary
    // division), so the double sums agree at any aggregation order
    "xt_decayed_engagement" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |h AS (SELECT max(d) AS d_max FROM ev)
        |SELECT user_id, count(*) AS n_events,
        |  sum(CAST(1 AS DOUBLE) /
        |      (CAST(1 AS BIGINT) << least(datediff('day', d, d_max), 62)))
        |    AS decayed_weight,
        |  max(d) AS last_seen
        |FROM ev CROSS JOIN h
        |GROUP BY user_id""".stripMargin,
    // identical expression structure to the Spark side: exact decimal
    // moments cast to double only inside the closed-form variance
    "xt_value_outliers" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
        |         AS DOUBLE) AS sxx
        |  FROM events GROUP BY user_id)
        |SELECT event_id, user_id, value,
        |  round((value - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 6) AS z
        |FROM events JOIN s USING (user_id)
        |WHERE n > 1 AND sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) > 0
        |  AND abs((value - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))) > 2.0""".stripMargin,
    // n-scaled CUSUM: |n·S_i − i·S_n| stays exact decimal end to end; the
    // same (12,0)×(25,2) casts pin precision 38 in both engines
    "xt_changepoint" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(value AS DECIMAL(12,2)) AS v
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DECIMAL(25,2)) AS s_i,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS DECIMAL(12,0)) AS i,
        |    CAST(sum(v) OVER (PARTITION BY user_id) AS DECIMAL(25,2)) AS s_n,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS DECIMAL(12,0)) AS n
        |  FROM ev),
        |d AS (SELECT user_id, event_id, ts, i, n,
        |        abs(n * s_i - i * s_n) AS dev FROM c)
        |SELECT user_id, event_id AS cp_event_id, ts AS cp_ts,
        |  CAST(i AS BIGINT) AS cp_pos, CAST(n AS BIGINT) AS n_events,
        |  CAST(dev AS DOUBLE) AS dev
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY dev DESC, i) AS rn FROM d)
        |WHERE rn = 1""".stripMargin,
    // coverage expansion: each distinct (user, active-day) covers its
    // window days; second distinct + count per day — exact epoch-day ints
    "xt_rolling_active" -> {
      val win = graft.operators.TimeSeriesOps.RollingWindowDays
      s"""WITH pairs AS (
         |  SELECT DISTINCT user_id,
         |    CAST(datediff('day', DATE '1970-01-01',
         |         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS day_idx
         |  FROM events),
         |spine AS (SELECT DISTINCT day_idx FROM pairs),
         |cov AS (
         |  SELECT DISTINCT user_id, day_idx + off AS day_idx
         |  FROM (SELECT user_id, day_idx,
         |          unnest(generate_series(0, ${win - 1})) AS off
         |        FROM pairs))
         |SELECT DATE '1970-01-01' + CAST(c.day_idx AS INTEGER) AS day,
         |  c.day_idx, CAST(count(*) AS BIGINT) AS active_users
         |FROM cov c JOIN spine USING (day_idx)
         |GROUP BY c.day_idx""".stripMargin
    },
    // identical interpolation expression order: prev + (next-prev) * (dt/dT),
    // dt/dT an exact-int-seconds ratio — bit-identical cross-engine
    "xt_interp_hourly" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |            FROM events WHERE user_id < 20),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(date_trunc('hour', min(ts)),
        |                           date_trunc('hour', max(ts)),
        |                           INTERVAL 1 HOUR)) AS hour
        |  FROM ev GROUP BY user_id),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    max(value) FILTER (WHERE event_type = 'purchase') AS obs
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.user_id, s.hour, h.obs,
        |    last_value(h.obs IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN h.obs IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.hour
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        |    first_value(h.obs IGNORE NULLS) OVER (
        |      PARTITION BY s.user_id ORDER BY s.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN h.obs IS NOT NULL THEN s.hour END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.hour
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
        |  FROM spine s
        |  LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour)
        |SELECT user_id, CAST(hour AS TIMESTAMP) AS hour,
        |  obs IS NOT NULL AS is_observed,
        |  CASE
        |    WHEN prev_h IS NOT NULL AND next_h IS NOT NULL AND next_h <> prev_h
        |    THEN prev_v + (next_v - prev_v) *
        |      (CAST(datediff('second', prev_h, hour) AS DOUBLE) /
        |       CAST(datediff('second', prev_h, next_h) AS DOUBLE))
        |    WHEN prev_h IS NOT NULL THEN prev_v
        |  END AS interp_value
        |FROM grid""".stripMargin,
    // stratified twin: same bit-identical priority, ranked per segment
    "xo_segment_priority_sample" ->
      s"""SELECT o_orderkey, o_orderpriority, o_totalprice, priority FROM (
         |  SELECT o_orderkey, o_orderpriority, o_totalprice,
         |    o_totalprice * 16777216.0 /
         |      (${Oracle.h24("'ps:' || CAST(o_orderkey AS VARCHAR)")} + 1) AS priority,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice * 16777216.0 /
         |        (${Oracle.h24("'ps:' || CAST(o_orderkey AS VARCHAR)")} + 1) DESC,
         |      o_orderkey) AS rn
         |  FROM orders)
         |WHERE rn <= ${RelationalOps.SegmentSampleK}""".stripMargin,
    // priority q = w·2^24/(h+1): one exact power-of-two scale + ONE IEEE
    // division, so both engines compute bit-identical priorities
    "xo_priority_sample" ->
      s"""SELECT o_orderkey, o_totalprice,
         |  o_totalprice * 16777216.0 /
         |    (${Oracle.h24("'ps:' || CAST(o_orderkey AS VARCHAR)")} + 1) AS priority
         |FROM orders
         |ORDER BY priority DESC, o_orderkey
         |LIMIT ${RelationalOps.PrioritySampleK}""".stripMargin,
    // RFM: quintile boundaries from quantile_cont (the percentile twin),
    // scores as 4 strict-> comparisons, decimal-exact monetary; DuckDB
    // lists are 1-indexed where Spark arrays are 0-indexed
    "xa_rfm_segments" -> {
      def raw(c: String, b: String) =
        (1 to 4).map(i => s"(CASE WHEN $c > $b[$i] THEN 1 ELSE 0 END)")
          .mkString("(", " + ", " + 1)")
      s"""WITH per AS (
         |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
         |    CAST(count(*) AS BIGINT) AS frequency,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
         |      AS monetary
         |  FROM orders GROUP BY o_custkey),
         |a AS (SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
         |rfm AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', last_day, anchor) AS BIGINT)
         |      AS recency_days,
         |    frequency, monetary
         |  FROM per, a),
         |b AS (
         |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
         |    quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,
         |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb
         |  FROM rfm),
         |s AS (
         |  SELECT o_custkey, recency_days, frequency, monetary,
         |    CAST(6 - ${raw("recency_days", "rb")} AS BIGINT) AS r_score,
         |    CAST(${raw("frequency", "fb")} AS BIGINT) AS f_score,
         |    CAST(${raw("monetary", "mb")} AS BIGINT) AS m_score
         |  FROM rfm, b)
         |SELECT *, CASE
         |    WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
         |      THEN 'champion'
         |    WHEN r_score <= 2 AND f_score <= 2 THEN 'dormant'
         |    WHEN m_score >= 4 THEN 'big_spender'
         |    ELSE 'regular' END AS segment
         |FROM s""".stripMargin
    },
    // reorder gaps: lag over each customer's (date, orderkey) total order;
    // exact BIGINT day sums, quantile_cont median
    "xa_reorder_gaps" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS d
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey,
        |    d - lag(d) OVER (PARTITION BY o_custkey
        |                     ORDER BY d, o_orderkey) AS gap
        |  FROM o)
        |SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
        |  CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(sum(gap) AS DOUBLE) / count(*) AS mean_gap_days,
        |  quantile_cont(gap, 0.5) AS p50_gap_days
        |FROM g WHERE gap IS NOT NULL""".stripMargin,
    // Pareto concentration: thresholds from quantile_cont over per-customer
    // decimal totals; shares are conditional exact decimal sums divided once
    "xa_spend_concentration" ->
      """WITH per AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
        |  FROM orders GROUP BY o_custkey),
        |t AS (
        |  SELECT quantile_cont(CAST(spend AS DOUBLE), 0.80) AS p80,
        |    quantile_cont(CAST(spend AS DOUBLE), 0.95) AS p95
        |  FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CASE WHEN CAST(spend AS DOUBLE) > p80 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top20,
        |  CAST(sum(CASE WHEN CAST(spend AS DOUBLE) > p95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_top5,
        |  CAST(sum(spend) AS DOUBLE) AS total_spend,
        |  CAST(sum(CASE WHEN CAST(spend AS DOUBLE) > p80 THEN spend
        |               ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
        |    / CAST(sum(spend) AS DOUBLE) AS top20_share,
        |  CAST(sum(CASE WHEN CAST(spend AS DOUBLE) > p95 THEN spend
        |               ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
        |    / CAST(sum(spend) AS DOUBLE) AS top5_share
        |FROM per, t""".stripMargin,
    // Benford: exact integer probability literals, one division for
    // expected, integer window count for the verdict - no order-dependent
    // double summation
    "xa_benford_audit" -> {
      val lits = RelationalOps.BenfordP6
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")
      """WITH obs AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM orders GROUP BY 1),
        |bp(digit, p6) AS (VALUES LITS),
        |j AS (
        |  SELECT CAST(bp.digit AS BIGINT) AS digit,
        |    coalesce(obs.n_obs, 0) AS n_obs,
        |    CAST(bp.p6 AS BIGINT) AS p6
        |  FROM bp LEFT JOIN obs ON obs.digit = bp.digit),
        |t AS (SELECT *, CAST(sum(n_obs) OVER () AS BIGINT) AS n FROM j),
        |d AS (
        |  SELECT digit, n_obs,
        |    CAST(n * p6 AS DOUBLE) / 1000000.0 AS expected,
        |    round((CAST(n_obs AS DOUBLE) - CAST(n * p6 AS DOUBLE) / 1000000.0)
        |      / sqrt(CAST(n * p6 AS DOUBLE) / 1000000.0), 6) AS z,
        |    abs(CAST(n_obs AS DOUBLE) - CAST(n * p6 AS DOUBLE) / 1000000.0) >
        |      3.0 * sqrt(CAST(n * p6 AS DOUBLE) / 1000000.0) AS deviant
        |  FROM t)
        |SELECT digit, n_obs, expected, z, deviant,
        |  CAST(sum(CASE WHEN deviant THEN 1 ELSE 0 END) OVER () AS BIGINT)
        |    AS n_deviant,
        |  CAST(sum(CASE WHEN deviant THEN 1 ELSE 0 END) OVER () AS BIGINT) = 0
        |    AS is_benford
        |FROM d""".stripMargin.replace("LITS", lits)
    },
    // basket pairs: within-order self-join, exact BIGINT supports, lift as
    // one division of integer products
    "xa_basket_pairs" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
         |       FROM items),
         |isup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup
         |         FROM items GROUP BY pk),
         |p AS (
         |  SELECT a.pk AS part_a, b.pk AS part_b,
         |    CAST(count(*) AS BIGINT) AS support
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2
         |  HAVING count(*) >= ${RelationalOps.BasketMinSupport})
         |SELECT part_b, part_a, support, sa.sup AS sup_a, sb.sup AS sup_b,
         |  CAST(support * n_baskets AS DOUBLE) /
         |    CAST(sa.sup * sb.sup AS DOUBLE) AS lift
         |FROM p
         |JOIN isup sa ON sa.pk = p.part_a
         |JOIN isup sb ON sb.pk = p.part_b, nb""".stripMargin,
    // same pair chain; each pair unions its two directional rules
    "xa_assoc_rules" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
         |       FROM items),
         |isup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup
         |         FROM items GROUP BY pk),
         |p AS (
         |  SELECT a.pk AS part_a, b.pk AS part_b,
         |    CAST(count(*) AS BIGINT) AS support
         |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2
         |  HAVING count(*) >= ${RelationalOps.BasketMinSupport}),
         |base AS (
         |  SELECT part_a, part_b, support, sa.sup AS sup_a, sb.sup AS sup_b,
         |    CAST(support * n_baskets AS DOUBLE) /
         |      CAST(sa.sup * sb.sup AS DOUBLE) AS lift
         |  FROM p
         |  JOIN isup sa ON sa.pk = p.part_a
         |  JOIN isup sb ON sb.pk = p.part_b, nb)
         |SELECT part_a AS antecedent, part_b AS consequent, support,
         |  sup_a AS sup_ante,
         |  CAST(support AS DOUBLE) / CAST(sup_a AS DOUBLE) AS confidence, lift
         |FROM base
         |UNION ALL
         |SELECT part_b, part_a, support, sup_b,
         |  CAST(support AS DOUBLE) / CAST(sup_b AS DOUBLE) AS confidence, lift
         |FROM base""".stripMargin,
    // identical expression structure to the Spark side: exact decimal/long
    // moments, doubles only inside the mirrored closed form
    // one 15-number moment aggregate, six unrolled pair rows; doubles only
    // inside the mirrored closed form (trend_ols discipline, incl. IEEE sqrt)
    "xa_corr_pairs" -> {
      val cols = RelationalOps.CorrCols
      def dec(c: String) = s"CAST($c AS DECIMAL(12,2))"
      val moments = cols.flatMap { case (c, n) =>
        Seq(s"CAST(sum(${dec(c)}) AS DOUBLE) AS s_$n",
          s"CAST(sum(${dec(c)} * ${dec(c)}) AS DOUBLE) AS s_${n}_$n")
      } ++ cols.map(_._2).combinations(2).map { pr =>
        val Seq(x, y) = pr
        val cx = cols.find(_._2 == x).get._1
        val cy = cols.find(_._2 == y).get._1
        s"CAST(sum(${dec(cx)} * ${dec(cy)}) AS DOUBLE) AS s_${x}_$y"
      }
      val pairSelects = cols.map(_._2).combinations(2).map { pr =>
        val Seq(x, y) = pr
        val num = s"(n * s_${x}_$y - s_$x * s_$y)"
        val denx = s"(n * s_${x}_$x - s_$x * s_$x)"
        val deny = s"(n * s_${y}_$y - s_$y * s_$y)"
        s"""SELECT '$x' AS x_name, '$y' AS y_name, n,
           |  $num / sqrt($denx * $deny) AS r,
           |  $num * $num / ($denx * $deny) AS r2
           |FROM m""".stripMargin
      }
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    ${moments.mkString(",\n    ")}
         |  FROM lineitem)
         |${pairSelects.mkString("\nUNION ALL\n")}""".stripMargin
    },
    "xa_trend_ols" -> {
      val day =
        s"CAST(datediff('day', DATE '${RelationalOps.TrendEpoch}', CAST(o_orderdate AS DATE)) AS BIGINT)"
      val dayDec =
        s"CAST(datediff('day', DATE '${RelationalOps.TrendEpoch}', CAST(o_orderdate AS DATE)) AS DECIMAL(18,0))"
      val yDec = "CAST(o_totalprice AS DECIMAL(12,2))"
      s"""WITH m AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum($day) AS DOUBLE) AS sx,
         |    CAST(sum($yDec) AS DOUBLE) AS sy,
         |    CAST(sum($dayDec * $dayDec) AS DOUBLE) AS sxx,
         |    CAST(sum($dayDec * $yDec) AS DOUBLE) AS sxy,
         |    CAST(sum($yDec * $yDec) AS DOUBLE) AS syy
         |  FROM orders GROUP BY o_orderpriority),
         |f AS (
         |  SELECT o_orderpriority, n, sx, sy,
         |    n * sxy - sx * sy AS num,
         |    n * sxx - sx * sx AS den,
         |    n * syy - sy * sy AS deny
         |  FROM m),
         |g AS (SELECT *, num / den AS slope FROM f)
         |SELECT o_orderpriority, n, slope,
         |  (sy - slope * sx) / n AS intercept,
         |  num * num / (den * deny) AS r2
         |FROM g""".stripMargin
    },
    "xj_q20_excess_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%bolt%'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(qty_dec AS DOUBLE) AS shipped_qty
        |FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        |WHERE CAST(qty_dec AS DOUBLE) >
        |  (SELECT 1.1 * (CAST(sum(qty_dec) AS DOUBLE) / count(*)) FROM per_supp)""".stripMargin,
    "xj_full_outer_reconcile" ->
      """WITH a AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec_1996
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey AS b_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec_1997
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT coalesce(o_custkey, b_custkey) AS custkey,
        |  CAST(coalesce(rev_dec_1996, CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS rev_1996,
        |  CAST(coalesce(rev_dec_1997, CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS rev_1997,
        |  CASE WHEN o_custkey IS NULL THEN 'only_1997'
        |       WHEN b_custkey IS NULL THEN 'only_1996'
        |       ELSE 'both' END AS status,
        |  CAST(coalesce(rev_dec_1997, CAST(0 AS DECIMAL(12,2)))
        |       - coalesce(rev_dec_1996, CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS delta
        |FROM a FULL OUTER JOIN b ON o_custkey = b_custkey""".stripMargin,
    "xa_weighted_median" ->
      """WITH cells AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, price,
        |         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |         sum(w) OVER (PARTITION BY l_returnflag) AS total
        |  FROM cells)
        |SELECT l_returnflag, CAST(min(price) AS DOUBLE) AS median_price,
        |       CAST(min(total) AS DOUBLE) AS total_weight
        |FROM cum WHERE cumw * 2 >= total GROUP BY l_returnflag""".stripMargin,
    "xa_price_histogram" ->
      s"""WITH c AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         |  FROM orders)
         |SELECT cents - (cents % ${RelationalOps.HistBucketCents}) AS bucket_lo_cents,
         |       count(*) AS n
         |FROM c GROUP BY 1""".stripMargin,
    "xo_percent_rank" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_mktsegment,
        |  CAST(spend_dec AS DOUBLE) AS spend,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer JOIN spend ON c_custkey = o_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend_dec)""".stripMargin,
    // same moment discipline as xa_trend_ols: exact BIGINT sums, doubles
    // only inside the mirrored closed form (product of deviations in DOUBLE);
    // seasonal-naive backtest: both means are exact-BIGINT sums divided
    // once, so the doubles (and the 6dp rounds) are engine-identical
    "xt_seasonal_forecast" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS actual
         |  FROM orders GROUP BY 1),
         |sc AS (
         |  SELECT CAST(sum(abs(a.actual - b.actual)) AS DOUBLE) / count(*) AS scale1
         |  FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 1 DAY),
         |f AS (
         |  SELECT a.day, a.actual, b.actual AS forecast,
         |    CAST(abs(a.actual - b.actual) AS BIGINT) AS abs_err
         |  FROM daily a
         |  JOIN daily b ON a.day = b.day + INTERVAL ${TimeSeriesOps.ForecastSeason} DAY)
         |SELECT day, actual, forecast, abs_err,
         |  round(CAST(abs_err AS DOUBLE) / scale1, 6) AS scaled_err,
         |  round((CAST(sum(abs_err) OVER () AS DOUBLE) / (count(*) OVER ())) / scale1, 6)
         |    AS mase
         |FROM f, sc""".stripMargin,
    // STL-lite: stays integer until single divisions (detrended carried
    // as 7y - sum7, a long), dow is dayi % 7 (no locale calendar call)
    "xt_stl_decompose" ->
      s"""WITH $stlCtes
         |SELECT day, actual, dow, trend, seasonal, residual
         |FROM stl""".stripMargin,
    // the alarm the decomposition feeds: robust z on the residual; both
    // medians are single quantile_cont interpolations, the multiplier an
    // exact rational
    "xt_stl_anomalies" ->
      s"""WITH $stlCtes,
         |med AS (SELECT quantile_cont(residual, 0.5) AS res_med FROM stl),
         |dev AS (
         |  SELECT day, actual, residual, res_med,
         |    abs(residual - res_med) AS abs_dev
         |  FROM stl, med),
         |mad AS (SELECT quantile_cont(abs_dev, 0.5) AS res_mad FROM dev)
         |SELECT day, actual, residual, res_med, res_mad,
         |  abs_dev * ${TimeSeriesOps.StlMadDen} >
         |    res_mad * ${TimeSeriesOps.StlMadNum} AS is_anomaly
         |FROM dev, mad""".stripMargin,
    // heatmap: dow/hour as pure epoch integer arithmetic (no locale
    // calendar), 168-cell collapse, share one exact division
    "xt_activity_heatmap" ->
      """WITH c AS (
        |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) % 7
        |      AS BIGINT) AS dow,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) % 24
        |      AS BIGINT) AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT dow, CAST(sum(n_events) AS BIGINT) AS dow_total
        |      FROM c GROUP BY dow)
        |SELECT dow, hour, n_events, dow_total,
        |  CAST(n_events AS DOUBLE) / dow_total AS share_of_dow
        |FROM c JOIN r USING (dow)""".stripMargin,
    // top paths: two leads over one (user, ts, event_id) sort, bounded
    // path domain, deterministic (count desc, path) cut
    "xt_top_paths" ->
      s"""WITH ev AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
         |  FROM events),
         |tri AS (
         |  SELECT event_type || '>' || lead(event_type, 1) OVER w
         |      || '>' || lead(event_type, 2) OVER w AS path
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT path, CAST(count(*) AS BIGINT) AS n
         |FROM tri WHERE path IS NOT NULL
         |GROUP BY path ORDER BY n DESC, path
         |LIMIT ${TimeSeriesOps.TopPathsK}""".stripMargin,
    // window funnel: earliest-anchor semantics, pure timestamp-interval
    // comparisons (microsecond-exact cross-engine)
    "xt_window_funnel" -> {
      val h = TimeSeriesOps.FunnelWindowHours
      s"""WITH v AS (
         |  SELECT user_id, min(ts) AS t_view FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |c AS (
         |  SELECT e.user_id, min(e.ts) AS t_click
         |  FROM events e JOIN v USING (user_id)
         |  WHERE e.event_type = 'click' AND e.ts > v.t_view
         |    AND e.ts <= v.t_view + INTERVAL $h HOURS
         |  GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, min(e.ts) AS t_purchase
         |  FROM events e JOIN v USING (user_id) JOIN c USING (user_id)
         |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
         |    AND e.ts <= v.t_view + INTERVAL $h HOURS
         |  GROUP BY e.user_id)
         |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
         |  CAST(1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
         |         + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS depth
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin
    },
    // consecutive days pair via the day = day+1 self-join (calendar
    // adjacency), the twin of the Spark side's join — not lag-over-rows
    "xt_autocorr_daily" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT a.x AS x, b.x AS y FROM daily a
        |  JOIN daily b ON a.day = b.day + INTERVAL 1 DAY),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pairs)
        |SELECT n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)) AS r1
        |FROM m""".stripMargin,
    // quantile_cont is DuckDB's name for the linear-interpolation exact
    // percentile Spark calls percentile() — established twin pair
    // (xa_price_percentiles); filter on the unrounded modified z, emit
    // rounded
    "xt_mad_outliers" ->
      s"""WITH med AS (
         |  SELECT user_id, quantile_cont(value, 0.5) AS med,
         |         count(*) AS n
         |  FROM events GROUP BY user_id),
         |dev AS (
         |  SELECT user_id, event_id, value, med, n,
         |         abs(value - med) AS dev
         |  FROM events JOIN med USING (user_id)),
         |mad AS (
         |  SELECT user_id, quantile_cont(dev, 0.5) AS mad
         |  FROM dev GROUP BY user_id)
         |SELECT event_id, user_id, value,
         |  round(${TimeSeriesOps.MadK} * (value - med) / mad, 6) AS mz
         |FROM dev JOIN mad USING (user_id)
         |WHERE n > 2 AND mad > 0
         |  AND abs(${TimeSeriesOps.MadK} * (value - med) / mad) > ${TimeSeriesOps.MadZ}""".stripMargin,
    // exact decimal power sums (associative — drift-free), doubles only in
    // the mirrored closed-form central moments; same association as the
    // Spark expressions
    "xt_value_moments" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS c
        |  FROM events),
        |s AS (
        |  SELECT event_type, count(*) AS cnt,
        |    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) / 1e2 AS sx,
        |    CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE) / 1e4 AS sxx,
        |    CAST(sum(CAST(c AS HUGEINT) * c * c) AS DOUBLE) / 1e6 AS sxxx,
        |    CAST(sum(CAST(c AS HUGEINT) * c * c * c) AS DOUBLE) / 1e8 AS sxxxx
        |  FROM ev GROUP BY event_type),
        |m AS (
        |  SELECT event_type, cnt, CAST(cnt AS DOUBLE) AS n, sx, sxx, sxxx, sxxxx,
        |    sxx - sx * sx / CAST(cnt AS DOUBLE) AS m2,
        |    sxxx - 3.0 * sx * sxx / CAST(cnt AS DOUBLE)
        |         + 2.0 * sx * sx * sx
        |           / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS m3,
        |    sxxxx - 4.0 * sx * sxxx / CAST(cnt AS DOUBLE)
        |          + 6.0 * sx * sx * sxx
        |            / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
        |          - 3.0 * sx * sx * sx * sx
        |            / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
        |               * CAST(cnt AS DOUBLE)) AS m4
        |  FROM s)
        |SELECT event_type, CAST(cnt AS BIGINT) AS n,
        |  round(sx / n, 6) AS mean,
        |  round(m2 / (n - 1.0), 6) AS var_samp,
        |  round(sqrt(n) * m3 / power(m2, 1.5), 6) AS skew_g1,
        |  round(n * m4 / (m2 * m2) - 3.0, 6) AS kurt_excess
        |FROM m""".stripMargin,
    // per-cell χ² contributions: exact BIGINT counts/marginals, expected
    // one exact-product division, every later double a deterministic
    // per-row IEEE chain (no order-dependent float sum — the Benford
    // portability discipline)
    "xa_chi2_flag_status" ->
      """WITH cells AS (
        |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS observed
        |  FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag, CAST(sum(observed) AS BIGINT) AS row_total
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT l_linestatus, CAST(sum(observed) AS BIGINT) AS col_total
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells),
        |ex AS (
        |  SELECT c.l_returnflag, c.l_linestatus, c.observed,
        |    rt.row_total, ct.col_total, tot.n,
        |    CAST(rt.row_total AS DOUBLE) * CAST(ct.col_total AS DOUBLE) /
        |      CAST(tot.n AS DOUBLE) AS expected,
        |    CAST(c.observed AS DOUBLE) -
        |      CAST(rt.row_total AS DOUBLE) * CAST(ct.col_total AS DOUBLE) /
        |        CAST(tot.n AS DOUBLE) AS diff
        |  FROM cells c
        |  JOIN rt USING (l_returnflag) JOIN ct USING (l_linestatus)
        |  CROSS JOIN tot)
        |SELECT l_returnflag, l_linestatus, observed, row_total, col_total, n,
        |  expected, diff * diff / expected AS chi2_contrib,
        |  diff * diff > 9.0 * expected AS deviant_3sigma
        |FROM ex""".stripMargin,
    // exact integer CENTS throughout (HUGEINT sums mirror Spark's
    // decimal(38,0) widening); gini is ONE double division of exact
    // operands — hash-exact, no rounding
    "xa_gini_spend" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT c.c_mktsegment, s.cents,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |                       ORDER BY s.cents, c.c_custkey) AS i
        |  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey),
        |agg AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |    sum(CAST(cents AS HUGEINT)) AS sx,
        |    sum(i * CAST(cents AS HUGEINT)) AS sixi
        |  FROM ranked GROUP BY 1)
        |SELECT c_mktsegment, n_customers,
        |  CAST(sx AS DOUBLE) / 100.0 AS total_spend,
        |  CAST(2 * sixi - (n_customers + 1) * sx AS DOUBLE) /
        |    CAST(n_customers * sx AS DOUBLE) AS gini
        |FROM agg""".stripMargin,
    // truncated-convolution twin with the SAME 12-dp-quantized decimal
    // kernel weights (TimeSeriesOps.EwmaKernel): weight(12,12) ×
    // revenue(22,2) products summed exactly at DECIMAL(38,14) — the whole
    // chain is association-free decimal arithmetic in both engines, so
    // the 6-dp emission is hash-exact (the r8 determinism fix)
    "xt_ewma_daily" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS revd
         |  FROM orders GROUP BY 1)
         |SELECT a.day, CAST(a.revd AS DOUBLE) AS revenue,
         |  CAST(count(*) AS BIGINT) AS kernel_days,
         |  CAST(round(sum(
         |    list_extract(${TimeSeriesOps.ewmaKernelSql},
         |                 date_diff('day', b.day, a.day) + 1) * b.revd), 6)
         |    AS DOUBLE) AS ewma
         |FROM daily a JOIN daily b
         |  ON date_diff('day', b.day, a.day)
         |     BETWEEN 0 AND ${TimeSeriesOps.EwmaWindow - 1}
         |GROUP BY a.day, a.revd""".stripMargin,
    // exact +-1/0 BIGINT S over the day-pair join, tie-corrected var18,
    // z a one-row IEEE chain over exact BIGINTs -- hash-exact, unrounded
    "xt_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |s AS (
         |  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
         |                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM daily a JOIN daily b ON a.day < b.day),
         |ties AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_value_groups,
         |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY x)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         |m AS (
         |  SELECT n_days, s, n_value_groups,
         |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE)
         |      / 18.0 AS var_s
         |  FROM s CROSS JOIN ties CROSS JOIN nn),
         |zc AS (
         |  SELECT *, CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
         |                 WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
         |                 ELSE 0.0 END AS z
         |  FROM m)
         |SELECT n_days, s, n_value_groups, var_s, z,
         |  CASE WHEN z > ${TimeSeriesOps.MkZCrit} THEN 'increasing'
         |       WHEN z < -${TimeSeriesOps.MkZCrit} THEN 'decreasing'
         |       ELSE 'no_trend' END AS trend
         |FROM zc""".stripMargin,
    // medians with NO quantile kernel: slopes are single IEEE divisions of
    // exact BIGINTs (bit-identical -> group exactly), cumulative counts
    // over distinct-value groups locate ranks k1/k2, median = (min+max)/2
    // of the bracketing values -- hash-exact, unrounded
    "xt_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |sl AS (
        |  SELECT CAST(b.x - a.x AS DOUBLE) /
        |    CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |sg AS (SELECT slope, CAST(count(*) AS BIGINT) AS c FROM sl GROUP BY 1),
        |sc AS (SELECT slope, c,
        |         CAST(sum(c) OVER (ORDER BY slope) AS BIGINT) AS hi FROM sg),
        |st AS (SELECT CAST(sum(c) AS BIGINT) AS n_pairs FROM sg),
        |sk AS (SELECT n_pairs, (n_pairs + 1) // 2 AS k1,
        |              (n_pairs + 2) // 2 AS k2 FROM st),
        |sm AS (SELECT (min(slope) + max(slope)) / 2.0 AS slope_per_day
        |       FROM sc, sk WHERE hi >= k1 AND hi - c < k2),
        |rs AS (SELECT CAST(x AS DOUBLE) - slope_per_day *
        |         CAST(date_diff('day', DATE '1970-01-01', day) AS DOUBLE) AS r
        |       FROM daily, sm),
        |rg AS (SELECT r, CAST(count(*) AS BIGINT) AS c FROM rs GROUP BY 1),
        |rc AS (SELECT r, c,
        |         CAST(sum(c) OVER (ORDER BY r) AS BIGINT) AS hi FROM rg),
        |rt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |rk AS (SELECT n_days, (n_days + 1) // 2 AS k1,
        |              (n_days + 2) // 2 AS k2 FROM rt),
        |rm AS (SELECT (min(r) + max(r)) / 2.0 AS intercept
        |       FROM rc, rk WHERE hi >= k1 AND hi - c < k2)
        |SELECT n_days, n_pairs, slope_per_day, intercept
        |FROM rt, st, sm, rm""".stripMargin,
    // one conditional-aggregation pass of exact decimal moments, cast to
    // double once, closed form a mirrored one-row IEEE chain (corrPairs
    // discipline) -- hash-exact, unrounded
    "xt_welch_ttest" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DECIMAL(12,0)) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents END)
         |      AS DOUBLE) AS sx1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents * cents END)
         |      AS DOUBLE) AS sxx1,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN cents END)
         |      AS DOUBLE) AS sx2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN cents * cents END)
         |      AS DOUBLE) AS sxx2
         |  FROM ev),
         |c AS (
         |  SELECT n1, n2,
         |    sx1 / CAST(n1 AS DOUBLE) AS m1, sx2 / CAST(n2 AS DOUBLE) AS m2,
         |    ((sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE)) /
         |      (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE) AS w1,
         |    ((sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE)) /
         |      (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) AS w2
         |  FROM m)
         |SELECT n1, n2, m1 AS mean_purchase_cents, m2 AS mean_click_cents,
         |  (m1 - m2) / sqrt(w1 + w2) AS t_welch,
         |  (w1 + w2) * (w1 + w2) /
         |    (w1 * w1 / (CAST(n1 AS DOUBLE) - 1.0) +
         |     w2 * w2 / (CAST(n2 AS DOUBLE) - 1.0)) AS df,
         |  abs((m1 - m2) / sqrt(w1 + w2)) > ${TimeSeriesOps.WelchCrit}
         |    AS reject_equal_means
         |FROM c""".stripMargin,
    // identical per-user conversion collapse and the same two fixed IEEE
    // chains per bucketing scheme; both verdict cuts are literal critical
    // values (see TimeSeriesOps.abTest on the id-parity failure)
    "xa_ab_test" -> {
      def armSql(name: String, armExpr: String) =
        s"""  SELECT '$name' AS split_method, n_a, conv_a, n_b, conv_b, p_a, p_b,
           |    CASE WHEN pp = 0.0 OR pp = 1.0 THEN 0.0
           |      ELSE (p_a - p_b) / sqrt(pp * (1.0 - pp) * (1.0 / nad + 1.0 / nbd))
           |      END AS z,
           |    abs(CASE WHEN pp = 0.0 OR pp = 1.0 THEN 0.0
           |      ELSE (p_a - p_b) / sqrt(pp * (1.0 - pp) * (1.0 / nad + 1.0 / nbd))
           |      END) > ${TimeSeriesOps.AbCrit} AS reject_equal_rates,
           |    (nad - nbd) / sqrt(nad + nbd) AS srm_z,
           |    abs((nad - nbd) / sqrt(nad + nbd)) > ${TimeSeriesOps.SrmCrit}
           |      AS srm_flag
           |  FROM (
           |    SELECT n_a, conv_a, n_b, conv_b,
           |      CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           |      CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           |      CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp,
           |      CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd
           |    FROM (
           |      SELECT
           |        CAST(sum(CASE WHEN $armExpr THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |        CAST(sum(CASE WHEN $armExpr THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
           |        CAST(sum(CASE WHEN NOT ($armExpr) THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |        CAST(sum(CASE WHEN NOT ($armExpr) THEN converted ELSE 0 END) AS BIGINT) AS conv_b
           |      FROM u))""".stripMargin
      val hashArm =
        s"${graft.Oracle.h24("'ab:' || CAST(user_id AS VARCHAR)")} % 2 = 0"
      s"""WITH u AS (
         |  SELECT user_id,
         |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      >= ${TimeSeriesOps.AbConvMinPurchases} THEN 1 ELSE 0 END AS converted
         |  FROM events GROUP BY user_id)
         |${armSql("id_parity", "user_id % 2 = 0")}
         |UNION ALL
         |${armSql("hash_bucket", hashArm)}""".stripMargin
    },
    // same daily collapse, same per-lag calendar join, same closed-form
    // moments; dominant lag = max r with smallest-lag tie-break
    "xt_acf" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
         |  FROM orders GROUP BY 1),
         |lags AS (
         |  SELECT CAST(unnest(range(1, ${TimeSeriesOps.AcfMaxLag + 1})) AS INTEGER) AS lag),
         |j AS (
         |  SELECT p.lag, p.xl, d2.x AS y
         |  FROM (SELECT l.lag, d.day + l.lag AS day, d.x AS xl
         |        FROM daily d CROSS JOIN lags l) p
         |  JOIN daily d2 ON d2.day = p.day),
         |m AS (
         |  SELECT lag, count(*) AS n,
         |    round(CAST(count(*) * sum(xl * y) - sum(xl) * sum(y) AS DOUBLE) /
         |      sqrt(CAST(count(*) * sum(xl * xl) - sum(xl) * sum(xl) AS DOUBLE) *
         |           CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)), 6)
         |      AS r
         |  FROM j GROUP BY lag),
         |best AS (SELECT r AS best_r, lag AS best_lag FROM m
         |         ORDER BY r DESC, lag LIMIT 1)
         |SELECT m.lag, m.n, m.r, m.lag = best.best_lag AS is_top
         |FROM m CROSS JOIN best""".stripMargin,
    // exact BIGINT cents, exact BIGINT window cumsum, the same two-step
    // division chain
    "xt_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
        |    event_type,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |cohorts AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM cohorts GROUP BY cohort_day),
        |rev AS (
        |  SELECT cohort_day, d - cohort_day AS age_days,
        |    count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS rev_cents
        |  FROM ev JOIN cohorts USING (user_id)
        |  WHERE event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_day, age_days, n_purchases, rev_cents, cohort_users,
        |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY age_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(cohort_users AS DOUBLE) / 100.0 AS ltv_per_user
        |FROM rev JOIN sizes USING (cohort_day)""".stripMargin,
    // the last-touch twin with MIN over the same frame
    "xt_first_touch" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |wt AS (
        |  SELECT user_id, event_type, rn,
        |    min(CASE WHEN event_type <> 'purchase' THEN rn END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_rn
        |  FROM ev),
        |credited AS (
        |  SELECT coalesce(t.event_type, 'none') AS touch_type
        |  FROM wt p
        |  LEFT JOIN ev t ON t.user_id = p.user_id AND t.rn = p.touch_rn
        |  WHERE p.event_type = 'purchase'),
        |total AS (SELECT count(*) AS n_total FROM credited)
        |SELECT touch_type, count(*) AS n_purchases,
        |  CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        |FROM credited CROSS JOIN total
        |GROUP BY touch_type, n_total""".stripMargin,
    // identical path construction (two windows, one user-stream sort),
    // identical count pivot, identical unrolled absorption chains per
    // variant (see TimeSeriesOps.markovAttribution determinism notes)
    "xt_markov_attribution" -> {
      val chans = TimeSeriesOps.MarkovChannels
      val froms = "START" +: chans
      val tos = chans ++ Seq("CONV", "NULL")
      val k0 = TimeSeriesOps.AttribIters
      val cCols = froms.flatMap(f => tos.map(t =>
        s"    CAST(sum(CASE WHEN f = '$f' AND t = '$t' THEN 1 ELSE 0 END) " +
          s"AS BIGINT) AS c_${f}_$t")).mkString(",\n")
      def rowSum(f: String) = tos.map(t => s"c_${f}_$t").mkString(" + ")
      val pCols = froms.flatMap(f => tos.map(t =>
        s"    CASE WHEN ${rowSum(f)} = 0 THEN 0.0 ELSE CAST(c_${f}_$t AS DOUBLE)" +
          s" / CAST(${rowSum(f)} AS DOUBLE) END AS p_${f}_$t")).mkString(",\n")
      val variants = "base" +: chans
      def alive(v: String) = chans.filterNot(_ == v)
      def iterCols(k: Int) =
        (for (v <- variants; s <- froms if s == "START" || alive(v).contains(s))
          yield {
            val chain = alive(v).map(t =>
              (if (k == 0) "0.0" else s"a${k}_${t}_$v") + s" * p_${s}_$t")
            "    " + (s"p_${s}_CONV" +: chain).mkString(" + ") +
              s" AS a${k + 1}_${s}_$v"
          }).mkString(",\n")
      val iters = (0 until k0).map { k =>
        s"it${k + 1} AS (\n  SELECT *,\n${iterCols(k)}\n  FROM ${if (k == 0) "probs" else s"it$k"})"
      }.mkString(",\n")
      val effectSum = chans
        .map(c => s"(a${k0}_START_base - a${k0}_START_$c)").mkString(" + ")
      val unions = chans.map(c =>
        s"""SELECT '$c' AS channel, a${k0}_START_base AS base_conv,
           |  a${k0}_START_$c AS removal_conv,
           |  a${k0}_START_base - a${k0}_START_$c AS removal_effect,
           |  CASE WHEN $effectSum = 0.0 THEN 0.0
           |    ELSE (a${k0}_START_base - a${k0}_START_$c) / ($effectSum) END
           |    AS share
           |FROM it$k0""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         |  FROM events),
         |fp AS (
         |  SELECT user_id, min(rn) AS fp FROM ev
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |path AS (
         |  SELECT e.user_id, e.event_type, e.rn, f.fp
         |  FROM ev e LEFT JOIN fp f USING (user_id)
         |  WHERE e.event_type <> 'purchase' AND (f.fp IS NULL OR e.rn < f.fp)),
         |steps AS (
         |  SELECT user_id, event_type, fp,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
         |    row_number() OVER (PARTITION BY user_id ORDER BY rn) AS prn
         |  FROM path),
         |trans AS (
         |  SELECT event_type AS f,
         |    coalesce(nxt, CASE WHEN fp IS NOT NULL THEN 'CONV' ELSE 'NULL' END) AS t
         |  FROM steps
         |  UNION ALL
         |  SELECT 'START', event_type FROM steps WHERE prn = 1
         |  UNION ALL
         |  SELECT 'START', 'CONV' FROM fp
         |  WHERE user_id NOT IN (SELECT DISTINCT user_id FROM path)),
         |wide AS (
         |  SELECT
         |$cCols
         |  FROM trans),
         |probs AS (
         |  SELECT
         |$pCols
         |  FROM wide),
         |$iters
         |$unions""".stripMargin
    },
    // same full-stream rn + null-skipping MAX window + rn join-back; the
    // 'none' bucket keeps shares summing to 1
    "xt_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |wt AS (
        |  SELECT user_id, event_type, rn,
        |    max(CASE WHEN event_type <> 'purchase' THEN rn END)
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch_rn
        |  FROM ev),
        |credited AS (
        |  SELECT coalesce(t.event_type, 'none') AS touch_type
        |  FROM wt p
        |  LEFT JOIN ev t ON t.user_id = p.user_id AND t.rn = p.touch_rn
        |  WHERE p.event_type = 'purchase'),
        |total AS (SELECT count(*) AS n_total FROM credited)
        |SELECT touch_type, count(*) AS n_purchases,
        |  CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
        |FROM credited CROSS JOIN total
        |GROUP BY touch_type, n_total""".stripMargin,
    // identical wide pivot of exact transition counts, identical
    // fixed-order probability and power-iteration chains (see
    // TimeSeriesOps.stationaryMix determinism notes)
    "xt_stationary_mix" -> {
      val states = TimeSeriesOps.MarkovStates
      val cCols = states.flatMap(t => states.map(s =>
        s"    CAST(sum(CASE WHEN prev_type = '$t' AND next_type = '$s' " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS c_${t}_$s")).mkString(",\n")
      def rowSum(t: String) = states.map(s => s"c_${t}_$s").mkString(" + ")
      val pCols = states.flatMap(t => states.map(s =>
        s"    CASE WHEN ${rowSum(t)} = 0 THEN 0.0 ELSE CAST(c_${t}_$s AS DOUBLE)" +
          s" / CAST(${rowSum(t)} AS DOUBLE) END AS p_${t}_$s")).mkString(",\n")
      def vCols(from: Int) = states.map { s =>
        val chain = states.map { t =>
          if (from == 0) s"0.2 * p_${t}_$s" else s"v${from}_$t * p_${t}_$s"
        }.mkString(" + ")
        s"    $chain AS v${from + 1}_$s"
      }.mkString(",\n")
      val iters = (0 until TimeSeriesOps.MarkovIters).map { k =>
        s"it${k + 1} AS (\n  SELECT *,\n${vCols(k)}\n  FROM ${if (k == 0) "pmat" else s"it$k"})"
      }.mkString(",\n")
      val last = TimeSeriesOps.MarkovIters
      val unions = states.map(s =>
        s"SELECT '$s' AS state, v${last}_$s AS prob, v${last - 1}_$s AS prev_prob," +
          s" abs(v${last}_$s - v${last - 1}_$s) AS abs_delta FROM it$last")
        .mkString("\n  UNION ALL\n")
      s"""WITH pairs AS (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id
         |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type,
         |         event_type AS next_type
         |  FROM events
         |  QUALIFY prev_type IS NOT NULL),
         |wide AS (
         |  SELECT
         |$cCols
         |  FROM pairs),
         |pmat AS (
         |  SELECT *,
         |$pCols
         |  FROM wide),
         |$iters
         |$unions""".stripMargin
    },
    // same span collapse, BIGINT window risk sets, 9-dp decimal-anchored
    // ln terms summed exactly, one exp + 6-dp round at display time
    "xt_kaplan_meier" ->
      s"""WITH spans AS (
         |  SELECT user_id,
         |    min(CAST(datediff('day', DATE '1970-01-01',
         |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)) AS first_day,
         |    max(CAST(datediff('day', DATE '1970-01-01',
         |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)) AS last_day
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |h AS (SELECT max(last_day) AS h, count(*) AS n_users FROM spans),
         |byt AS (
         |  SELECT last_day - first_day AS t, n_users,
         |    count(*) AS ending,
         |    CAST(sum(CASE WHEN last_day <= h - ${TimeSeriesOps.KmChurnGapDays}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
         |  FROM spans CROSS JOIN h GROUP BY 1, 2),
         |risk AS (
         |  SELECT t, n_churned, ending,
         |    CAST(n_users - COALESCE(sum(ending) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS n_at_risk
         |  FROM byt),
         |term AS (
         |  SELECT t, n_at_risk, n_churned,
         |    CAST(CASE WHEN n_churned > 0 AND n_churned < n_at_risk
         |      THEN round(ln(CAST(n_at_risk - n_churned AS DOUBLE)
         |                    / CAST(n_at_risk AS DOUBLE)), 9)
         |      ELSE 0.0 END AS DECIMAL(18,9)) AS lterm,
         |    CASE WHEN n_churned = n_at_risk THEN 1 ELSE 0 END AS dead
         |  FROM risk),
         |acc AS (
         |  SELECT t, n_at_risk, n_churned,
         |    sum(lterm) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS log_s,
         |    max(dead) OVER (ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS died
         |  FROM term)
         |SELECT t AS t_days, n_at_risk, n_churned,
         |  CASE WHEN died = 1 THEN NULL
         |       ELSE CAST(log_s AS DOUBLE) END AS log_survival,
         |  CASE WHEN died = 1 THEN 0.0
         |       ELSE round(exp(CAST(log_s AS DOUBLE)), 6) END AS survival
         |FROM acc""".stripMargin,
    // decile edges by pure BIGINT rank inequality (no quantile kernel),
    // integer edge-comparison bins, Laplace-smoothed exact-ratio p's;
    // anchored log kernel (r11): ln(pc/pr) is four integer-argument DetLog
    // chains, per-bin terms quantize to the 1e12 grid, psi is an exact
    // integer sum divided and rounded once
    "xt_psi_drift" ->
      s"""WITH ev AS (
         |  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |cells AS (SELECT week, cents, CAST(count(*) AS BIGINT) AS cnt
         |          FROM ev GROUP BY 1, 2),
         |rw AS (SELECT min(week) AS ref_week FROM cells),
         |ref AS (SELECT cents, cnt FROM cells, rw WHERE week = ref_week),
         |nr AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_ref FROM ref),
         |rc AS (SELECT cents,
         |         CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
         |       FROM ref),
         |edges AS (
         |  SELECT k, min(cents) AS edge
         |  FROM rc, nr, (SELECT unnest(generate_series(1, 9)) AS k)
         |  WHERE cum * 10 >= k * n_ref GROUP BY k),
         |binned AS (
         |  SELECT week, bin, CAST(sum(cnt) AS BIGINT) AS nwb FROM (
         |    SELECT c.week, c.cents, c.cnt,
         |      CAST(sum(CASE WHEN c.cents > e.edge THEN 1 ELSE 0 END)
         |        AS BIGINT) AS bin
         |    FROM cells c CROSS JOIN edges e
         |    GROUP BY c.week, c.cents, c.cnt) GROUP BY 1, 2),
         |nw AS (SELECT week, CAST(sum(cnt) AS BIGINT) AS n_w
         |       FROM cells GROUP BY 1),
         |rb AS (SELECT bin, nwb AS nrb FROM binned, rw WHERE week = ref_week),
         |grid AS (
         |  SELECT week, CAST(k AS BIGINT) AS bin
         |  FROM (SELECT DISTINCT week FROM cells),
         |       (SELECT unnest(generate_series(0, 9)) AS k)),
         |terms AS (
         |  SELECT g.week, n_w,
         |    CAST(COALESCE(b.nwb, 0) + 1 AS BIGINT) AS cw,
         |    CAST(COALESCE(r.nrb, 0) + 1 AS BIGINT) AS cr,
         |    CAST(n_w + 10 AS BIGINT) AS nw10,
         |    CAST(n_ref + 10 AS BIGINT) AS nr10
         |  FROM grid g
         |  LEFT JOIN binned b ON g.week = b.week AND g.bin = b.bin
         |  LEFT JOIN rb r ON g.bin = r.bin
         |  JOIN nw ON g.week = nw.week
         |  CROSS JOIN nr),
         |tq AS (
         |  SELECT week, n_w,
         |    CAST(round((((CAST(cw AS DOUBLE) / CAST(nw10 AS DOUBLE)) -
         |        (CAST(cr AS DOUBLE) / CAST(nr10 AS DOUBLE))) *
         |      (((${graft.functions.DetLog.lnSql("cw")} -
         |         ${graft.functions.DetLog.lnSql("nw10")}) -
         |         ${graft.functions.DetLog.lnSql("cr")}) +
         |         ${graft.functions.DetLog.lnSql("nr10")})) *
         |      (1000000000000.0::DOUBLE), 0) AS BIGINT) AS tq
         |  FROM terms),
         |p AS (
         |  SELECT week, n_w AS n_values,
         |    round(CAST(sum(tq) AS DOUBLE) / (1000000000000.0::DOUBLE), 6) AS psi
         |  FROM tq GROUP BY 1, 2)
         |SELECT week, n_values, psi,
         |  CASE WHEN psi < ${TimeSeriesOps.PsiModerate} THEN 'stable'
         |       WHEN psi < ${TimeSeriesOps.PsiMajor} THEN 'moderate'
         |       ELSE 'major' END AS verdict
         |FROM p""".stripMargin,
    // exact integer-cents support, cumulative BIGINT ECDFs, per-row |F1-F2|
    // IEEE chains, argmax cut on (diff DESC, cents) -- engine-identical
    "xt_ks_purchase_click" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |bins AS (
         |  SELECT cents,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM ev GROUP BY cents),
         |tot AS (
         |  SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM ev),
         |ecdf AS (
         |  SELECT cents,
         |    sum(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS f1,
         |    sum(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS f2
         |  FROM bins),
         |d AS (
         |  SELECT e.cents AS at_cents, t.n1, t.n2,
         |    abs(CAST(e.f1 AS DOUBLE) / CAST(t.n1 AS DOUBLE) -
         |        CAST(e.f2 AS DOUBLE) / CAST(t.n2 AS DOUBLE)) AS d_stat
         |  FROM ecdf e CROSS JOIN tot t)
         |SELECT at_cents, n1, n2, d_stat,
         |  d_stat > ${TimeSeriesOps.KsCoeff} *
         |    sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) AS reject_05
         |FROM d
         |ORDER BY d_stat DESC, at_cents
         |LIMIT 1""".stripMargin,
    // same exact cents bins; 2U in closed form over the strictly-below
    // cumulative, tie-corrected variance from exact BIGINT factors, z a
    // one-row IEEE chain -- hash-exact, unrounded
    "xt_mann_whitney" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |bins AS (
         |  SELECT cents,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM ev GROUP BY cents),
         |cum AS (
         |  SELECT cents, c1, c2,
         |    CAST(coalesce(sum(c2) OVER (ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum2
         |  FROM bins),
         |m AS (
         |  SELECT CAST(sum(c1 * (2 * cum2 + c2)) AS BIGINT) AS u2,
         |    CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         |    CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT)
         |      AS tie_cubes
         |  FROM cum),
         |f AS (
         |  SELECT *, n1 + n2 AS n,
         |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
         |      CAST((n1 + n2 + 1) * (n1 + n2) * (n1 + n2 - 1) - tie_cubes AS DOUBLE) /
         |      (12.0 * CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE)) AS var_u
         |  FROM m),
         |zf AS (
         |  SELECT *,
         |    (CAST(u2 AS DOUBLE) / 2.0 - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(var_u)
         |      AS z
         |  FROM f)
         |SELECT n1, n2, u2, CAST(u2 AS DOUBLE) / 2.0 AS u, var_u, z,
         |  abs(z) > ${TimeSeriesOps.MkZCrit} AS reject_05
         |FROM zf""".stripMargin,
    // explicit population moments over the StrengthScale-anchored integer
    // components (sum(x^2)/n - (sum(x)/n)^2) mirror the Spark chain
    // op-for-op: sums are exact HUGEINTs, every float op a per-row / one-row
    // scalar on identical operands; greatest(0, 1 - ratio) clamps both
    "xt_seasonality_strength" ->
      s"""WITH $stlCtes,
         |parts AS (
         |  SELECT
         |    CAST(round(residual * ${TimeSeriesOps.StrengthScale}, 0) AS BIGINT) AS r,
         |    CAST(round((seasonal + residual) * ${TimeSeriesOps.StrengthScale}, 0) AS BIGINT) AS sr,
         |    CAST(round((trend + residual) * ${TimeSeriesOps.StrengthScale}, 0) AS BIGINT) AS tr
         |  FROM stl),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(r) AS s_r, sum(CAST(r AS HUGEINT) * r) AS s_rr,
         |    sum(sr) AS s_sr, sum(CAST(sr AS HUGEINT) * sr) AS s_srsr,
         |    sum(tr) AS s_tr, sum(CAST(tr AS HUGEINT) * tr) AS s_trtr
         |  FROM parts)
         |SELECT n AS n_days,
         |  round(greatest(0.0, 1.0 -
         |    (s_rr / CAST(n AS DOUBLE) -
         |     (s_r / CAST(n AS DOUBLE)) * (s_r / CAST(n AS DOUBLE))) /
         |    (s_srsr / CAST(n AS DOUBLE) -
         |     (s_sr / CAST(n AS DOUBLE)) * (s_sr / CAST(n AS DOUBLE)))), 6)
         |    AS seasonal_strength,
         |  round(greatest(0.0, 1.0 -
         |    (s_rr / CAST(n AS DOUBLE) -
         |     (s_r / CAST(n AS DOUBLE)) * (s_r / CAST(n AS DOUBLE))) /
         |    (s_trtr / CAST(n AS DOUBLE) -
         |     (s_tr / CAST(n AS DOUBLE)) * (s_tr / CAST(n AS DOUBLE)))), 6)
         |    AS trend_strength
         |FROM m""".stripMargin,
  )
}
