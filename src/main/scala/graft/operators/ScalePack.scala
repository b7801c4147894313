package graft.operators

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[ScaleOps]]. Oracles are plain-layout
  * SQL on purpose: bucketing and salting are *physical* techniques — the
  * oracle proving the result identical to the unbucketed/unsalted query IS
  * the correctness claim.
  */
object ScalePack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xp_bucketed_order_revenue" -> ((s, d) => ScaleOps.bucketedOrderRevenue(s, d)),
    "xp_salted_flag_revenue" -> ((s, d) => ScaleOps.saltedFlagRevenue(s, d)),
    "xa_price_percentiles" -> ((s, d) => ScaleOps.pricePercentiles(s, d)),
    "xa_approx_percentile" -> ((s, d) => ScaleOps.approxPercentileCheck(s, d)),
    "xp_runtime_filter_revenue" -> ((s, d) => ScaleOps.runtimeFilteredRevenue(s, d)),
    "xp_incremental_monthly" -> ((s, d) => ScaleOps.incrementalMonthlyOrders(s, d)),
    "xp_sorted_layout_scan" -> ((s, d) => ScaleOps.sortedLayoutMonthScan(s, d)),
    "xp_zorder_scan" -> ((s, d) => ScaleOps.zorderSliceScan(s, d)),
    "xa_hll_union" -> ((s, d) => ScaleOps.hllSegmentDistinct(s, d)),
    "xa_hll_intersect" -> ((s, d) => ScaleOps.hllIntersect(s, d)),
    "xa_column_profile" -> ((s, d) => ScaleOps.columnProfile(s, d)),
    "xa_fk_conformance" -> ((s, d) => ScaleOps.fkConformance(s, d)),
    "xp_bloom_membership" -> ((s, d) => ScaleOps.bloomMembership(s, d)),
    "xo_pareto_frontier" -> ((s, d) => ScaleOps.paretoFrontier(s, d)),
    "xp_cms_join_estimate" -> ((s, d) => ScaleOps.cmsJoinEstimate(s, d)),
    "xp_zonemap_prune" -> ((s, d) => ScaleOps.zonemapPrune(s, d)),
    "xa_expectations" -> ((s, d) => ScaleOps.expectations(s, d)),
    "xa_bootstrap_ci" -> ((s, d) => ScaleOps.bootstrapCi(s, d)),
    "xp_compaction_plan" -> ((s, d) => ScaleOps.compactionPlan(s, d)),
  )

  private val rev =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  val oracles: Map[String, String] = Map(
    // same month parts, same BIGINT cumsum // target assignment
    "xp_compaction_plan" ->
      s"""WITH parts AS (
         |  SELECT date_trunc('month', o_orderdate) AS part_month,
         |    count(*) AS n_rows,
         |    min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
         |  FROM orders GROUP BY 1),
         |assigned AS (
         |  SELECT *,
         |    CAST(COALESCE(sum(n_rows) OVER (ORDER BY part_month
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // ${ScaleOps.CompactTargetRows} AS BIGINT) AS file_id
         |  FROM parts)
         |SELECT file_id, count(*) AS n_parts,
         |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
         |  min(min_date) AS min_date, max(max_date) AS max_date,
         |  CAST(sum(n_rows) AS DOUBLE) / ${ScaleOps.CompactTargetRows}.0
         |    AS fill_ratio
         |FROM assigned GROUP BY file_id""".stripMargin,
    // identical B-counter pass: the same h24-bucketed Poisson weights, the
    // same exact-decimal/exact-count divisions, the same order statistics
    "xa_bootstrap_ci" -> {
      def w(b: Int): String = {
        val h = graft.Oracle.h24Slice(
          s"'${b / 5}:' || CAST(o_orderkey AS VARCHAR)", b % 5)
        val cdf = ScaleOps.BootCdf24
        s"(CASE WHEN $h < ${cdf(0)} THEN 0 WHEN $h < ${cdf(1)} THEN 1" +
          s" WHEN $h < ${cdf(2)} THEN 2 WHEN $h < ${cdf(3)} THEN 3" +
          s" WHEN $h < ${cdf(4)} THEN 4 ELSE 5 END)"
      }
      val sums = (0 until ScaleOps.BootReplicates).map { b =>
        s"    sum(${w(b)} * CAST(o_totalprice AS DECIMAL(12,2))) AS s_$b,\n" +
          s"    CAST(sum(${w(b)}) AS BIGINT) AS n_$b"
      }.mkString(",\n")
      val unions = (0 until ScaleOps.BootReplicates).map { b =>
        s"  SELECT $b AS b, CAST(s_$b AS DOUBLE) / CAST(n_$b AS DOUBLE) AS m FROM a"
      }.mkString("\n  UNION ALL\n")
      s"""WITH a AS (
         |  SELECT sum(CAST(o_totalprice AS DECIMAL(12,2))) AS tot,
         |    count(*) AS n,
         |$sums
         |  FROM orders),
         |m AS (
         |$unions),
         |r AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS rn FROM m),
         |sel AS (
         |  SELECT
         |    min(CASE WHEN rn = 2 THEN m END) AS ci_lo,
         |    min(CASE WHEN rn = ${ScaleOps.BootReplicates - 1} THEN m END) AS ci_hi,
         |    CAST(sum(CAST(round(m, 9) AS DECIMAL(18,9))) AS DOUBLE) /
         |      ${ScaleOps.BootReplicates}.0 AS boot_mean
         |  FROM r)
         |SELECT CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) AS point_mean,
         |  boot_mean, ci_lo, ci_hi, n AS n_orders
         |FROM a CROSS JOIN sel""".stripMargin
    },
    // same one-pass conditional aggregation per table, unioned; NULLs
    // violate range/domain constraints in both engines by explicit IS NULL
    "xa_expectations" ->
      """WITH o AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(DISTINCT o_orderkey) AS v_unique,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_complete,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL OR o_orderpriority NOT IN
        |      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL
        |      OR o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
        |      OR o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_range
        |  FROM orders),
        |l AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(DISTINCT
        |      CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
        |      AS v_unique,
        |    CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
        |      OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0
        |      OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |    CAST(sum(CASE WHEN l_returnflag IS NULL
        |      OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_flag,
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price
        |  FROM lineitem),
        |u AS (
        |  SELECT 'orders.o_orderkey is unique' AS "constraint", n, v_unique AS v FROM o
        |  UNION ALL SELECT 'orders.o_custkey is complete', n, v_complete FROM o
        |  UNION ALL SELECT 'orders.o_totalprice > 0', n, v_price FROM o
        |  UNION ALL SELECT 'orders.o_orderpriority in domain', n, v_domain FROM o
        |  UNION ALL SELECT 'orders.o_orderdate in [1992,1999)', n, v_range FROM o
        |  UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber) is unique', n, v_unique FROM l
        |  UNION ALL SELECT 'lineitem.l_quantity in (0,50]', n, v_qty FROM l
        |  UNION ALL SELECT 'lineitem.l_discount in [0,0.5]', n, v_disc FROM l
        |  UNION ALL SELECT 'lineitem.l_returnflag in {A,N,R}', n, v_flag FROM l
        |  UNION ALL SELECT 'lineitem.l_extendedprice > 0', n, v_price FROM l)
        |SELECT "constraint", n AS n_rows, v AS n_violations,
        |  v = 0 AS passed
        |FROM u""".stripMargin,
    // identical zoning: row_number over the same (date, key) order,
    // integer-divided into fixed-size zones; min/max/count replay exactly
    "xp_zonemap_prune" ->
      s"""WITH ranked AS (
         |  SELECT o_orderdate, o_orderkey,
         |    (row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
         |      // ${ScaleOps.ZoneRows} AS zone
         |  FROM orders)
         |SELECT zone, count(*) AS n_rows,
         |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
         |  max(o_orderdate) >= TIMESTAMP '1997-03-01 00:00:00' AND
         |    min(o_orderdate) < TIMESTAMP '1997-04-01 00:00:00' AS survives,
         |  CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
         |        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
         |FROM ranked GROUP BY zone""".stripMargin,
    // both sketches rebuilt cell-by-cell with GROUP BYs over the same
    // portable h24 slot hash; the inner product replays as exact integer
    // arithmetic. pcells LEFT JOIN lcells with COALESCE 0 mirrors the
    // Spark sum over all width slots (a dim slot with no fact mass
    // contributes a zero product, never drops the j row).
    "xp_cms_join_estimate" -> {
      def slot(jRef: String, keyRef: String) = graft.Oracle.h24(
        s"CAST($jRef AS VARCHAR) || ':' || CAST($keyRef AS VARCHAR)") +
        s" % ${ScaleOps.JoinCmsWidth}"
      s"""WITH lc AS (
         |  SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
         |pc AS (
         |  SELECT p_partkey AS key, count(*) AS cnt FROM part
         |  WHERE p_brand = '${ScaleOps.JoinCmsBrand}' GROUP BY 1),
         |rows_j AS (SELECT unnest(range(0, ${ScaleOps.JoinCmsDepth})) AS j),
         |lcells AS (
         |  SELECT j, ${slot("j", "key")} AS slot,
         |    CAST(sum(cnt) AS BIGINT) AS cell
         |  FROM lc CROSS JOIN rows_j GROUP BY 1, 2),
         |pcells AS (
         |  SELECT j, ${slot("j", "key")} AS slot,
         |    CAST(sum(cnt) AS BIGINT) AS cell
         |  FROM pc CROSS JOIN rows_j GROUP BY 1, 2),
         |ip AS (
         |  SELECT p.j,
         |    CAST(sum(COALESCE(l.cell, 0) * p.cell) AS BIGINT) AS prod
         |  FROM pcells p LEFT JOIN lcells l ON l.j = p.j AND l.slot = p.slot
         |  GROUP BY p.j),
         |est AS (SELECT CAST(min(prod) AS BIGINT) AS cms_est FROM ip),
         |ex AS (
         |  SELECT count(*) AS exact_join_rows
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = '${ScaleOps.JoinCmsBrand}')
         |SELECT exact_join_rows, cms_est,
         |  cms_est - exact_join_rows AS overcount,
         |  CAST(cms_est - exact_join_rows AS DOUBLE) /
         |    CAST(exact_join_rows AS DOUBLE) AS rel_error
         |FROM ex CROSS JOIN est""".stripMargin
    },
    "xp_bucketed_order_revenue" ->
      s"""SELECT o_orderkey, o_orderdate, CAST(revenue_dec AS DOUBLE) AS revenue FROM (
         |  SELECT o_orderkey, o_orderdate, sum($rev) AS revenue_dec
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY o_orderkey, o_orderdate
         |  ORDER BY revenue_dec DESC, o_orderkey LIMIT 10)""".stripMargin,
    "xp_salted_flag_revenue" ->
      s"""SELECT 'flag_' || lower(l_returnflag) AS flag_label,
         |  count(*) AS n, CAST(sum($rev) AS DOUBLE) AS revenue
         |FROM lineitem GROUP BY 1""".stripMargin,
    "xp_runtime_filter_revenue" ->
      s"""SELECT count(*) AS n_items, CAST(sum($rev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "xa_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  TRUE AS approx_within_1pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "xp_sorted_layout_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,
    // the z-ordered layout is lossless: the slice equals the plain-table
    // filter on both dimensions
    "xp_zorder_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_custkey <= 4095""".stripMargin,
    "xp_incremental_monthly" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "xa_fk_conformance" -> {
      def check(name: String, fact: String, key: String,
                dim: String, dimKey: String) =
        s"""SELECT '$name' AS relationship, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $dimKey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_orphans
           |FROM $fact LEFT JOIN $dim ON $key = $dimKey""".stripMargin
      Seq(
        check("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        check("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        check("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        check("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey")).mkString("\nUNION ALL\n")
    },
    // exact distinct counts replayed; the within-tolerance flag is the
    // sketch-quality assertion the Spark side computes against its own HLL
    "xa_hll_union" ->
      """SELECT c_mktsegment AS segment,
        |  count(DISTINCT o_custkey) AS exact_customers,
        |  TRUE AS hll_within_5pct
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT 'ALL', count(DISTINCT o_custkey), TRUE
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // inclusion-exclusion intersection: exact overlap counts replayed; the
    // tolerance flag is the sketch-quality assertion the Spark side
    // computes against its own HLL algebra
    "xa_hll_intersect" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS in_b
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY o_custkey)
        |SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
        |  CAST(sum(in_b) AS BIGINT) AS exact_b,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS exact_common,
        |  TRUE AS hll_within_10pct
        |FROM f""".stripMargin,
    "xa_column_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS TIMESTAMP) AS min_ts, CAST(NULL AS TIMESTAMP) AS max_ts
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c', count(*),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  count(DISTINCT $c),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
           |FROM orders""".stripMargin
      def ts(c: String) =
        s"""SELECT '$c', count(*),
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  count(DISTINCT $c),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           |  CAST(min($c) AS TIMESTAMP), CAST(max($c) AS TIMESTAMP)
           |FROM orders""".stripMargin
      (Seq("o_orderkey", "o_custkey", "o_totalprice").map(num) ++
        Seq("o_orderstatus", "o_orderpriority").map(str) ++
        Seq("o_orderdate").map(ts)).mkString("\nUNION ALL\n")
    },
    // the oracle REBUILDS the bloom bit set from the same salted-h24 family
    // and replays every membership verdict, false positives included
    "xp_bloom_membership" -> {
      import graft.Oracle.h24
      val bits = ScaleOps.BloomBits
      s"""WITH members AS (
         |  SELECT DISTINCT o_custkey AS k FROM orders
         |  WHERE o_totalprice > ${ScaleOps.BloomMemberThreshold}),
         |js AS (SELECT unnest(generate_series(0, ${ScaleOps.BloomHashes - 1})) AS j),
         |bits AS (
         |  SELECT DISTINCT
         |    ${h24("CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % $bits AS pos
         |  FROM members CROSS JOIN js),
         |probe AS (
         |  SELECT c_custkey,
         |    bool_and(
         |      ${h24("CAST(j AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} % $bits
         |        IN (SELECT pos FROM bits)) AS bloom_hit
         |  FROM customer CROSS JOIN js
         |  GROUP BY c_custkey),
         |verd AS (
         |  SELECT p.c_custkey, p.bloom_hit, m.k IS NOT NULL AS is_member
         |  FROM probe p LEFT JOIN members m ON p.c_custkey = m.k)
         |SELECT CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(count(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_flagged,
         |  CAST(count(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
         |  CAST(count(*) FILTER (WHERE bloom_hit AND NOT is_member) AS BIGINT)
         |    AS false_positives,
         |  CAST(count(*) FILTER (WHERE is_member AND NOT bloom_hit) AS BIGINT)
         |    AS false_negatives
         |FROM verd""".stripMargin
    },
    "xa_price_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // the O(n²) NOT-EXISTS form IS the skyline definition — the Spark side
    // must reproduce it exactly via the two-level sweep
    "xo_pareto_frontier" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY o_custkey),
        |pts AS (
        |  SELECT c_custkey AS custkey, spend_cents,
        |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acctbal_cents
        |  FROM customer JOIN spend ON c_custkey = o_custkey)
        |SELECT custkey, spend_cents, acctbal_cents FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.spend_cents >= p.spend_cents AND q.acctbal_cents >= p.acctbal_cents
        |    AND (q.spend_cents > p.spend_cents OR q.acctbal_cents > p.acctbal_cents))""".stripMargin,
  )
}
