package graft.operators

import graft.{Oracle, QueryPack}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[LifecycleOps]] (SURVEY §2 rows ST1/ST2,
  * M2–M9, T4, C1).
  */
object LifecyclePack extends QueryPack {
  import Oracle._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st2_removal_plan" -> ((s, d) => LifecycleOps.removalPlan(s, d, "purchase")),
    "m6_flush_commands" -> ((s, d) => LifecycleOps.flushCommands(s, d, "ks1", "purchase")),
    "m7_stop_commands" -> ((s, d) => LifecycleOps.stopCommands(s, d, "ks1", "catalog_purchase_z3")),
    "m8_clear_snapshot_commands" -> ((s, d) => LifecycleOps.clearSnapshotCommands(s, d, "ks1", "catalog_purchase_z3")),
    "m9_repair_plan" -> ((s, d) => LifecycleOps.repairPlan(s, d, "purchase")),
    "m2_truncated" -> ((s, d) => LifecycleOps.truncated(s, d)),
    "m3_after_drop" -> ((s, d) => LifecycleOps.afterDrop(s, d, "catalog_error_z3")),
    "m4_m5_table_properties" -> ((s, d) => LifecycleOps.tableProperties(s, d, 86400, 3600)),
    "m4_ttl_view" -> ((s, d) => LifecycleOps.ttlView(s, d, 7)),
    "st1_restart_poll" -> ((s, d) => LifecycleOps.restartPoll(s, d)),
    "m10_after_upsert" -> ((s, d) => LifecycleOps.afterUpsert(s, d)),
    "xacid_final_state" -> ((s, d) => AcidOps.finalState(s, d)),
    "xacid_txn_sink" -> ((s, d) => AcidOps.txnSinkState(s, d)),
    "xacid_schema_evolution" -> ((s, d) => AcidOps.schemaEvolutionState(s, d)),
    "xacid_time_travel" -> ((s, d) => AcidOps.timeTravelV2(s, d)),
    "xacid_history" -> ((s, d) => AcidOps.history(s, d)),
    "xacid_prefix_scan" -> ((s, d) => AcidOps.prefixScan(s, d)),
    "xacid_connector_scan" -> ((s, d) => AcidOps.connectorScan(s, d)),
    "xacid_sql_dml" -> ((s, d) => AcidOps.sqlDmlState(s, d)),
    "xacid_sql_merge" -> ((s, d) => AcidOps.sqlMergeState(s, d)),
    "xacid_sql_merge_full" -> ((s, d) => AcidOps.sqlMergeFullState(s, d)),
    "xacid_sql_overwrite" -> ((s, d) => AcidOps.sqlOverwriteState(s, d)),
    "xacid_restore" -> ((s, d) => AcidOps.restoreState(s, d)),
    "xacid_nullskip_scan" -> ((s, d) => AcidOps.nullSkipScan(s, d)),
    "xacid_cdf" -> ((s, d) => AcidOps.changeFeed(s, d)),
    "xacid_cdf_connector" -> ((s, d) => AcidOps.changeFeedConnector(s, d)),
    "xacid_dv_scan" -> ((s, d) => AcidOps.dvState(s, d)),
    "xacid_mv" -> ((s, d) => AcidOps.incrementalMv(s, d)),
  )

  private val stagesValues = LifecycleOps.Stages
    .map { case (i, n, t) => s"($i, '$n', '${t.replace("'", "''")}')" }
    .mkString(", ")

  private val compRe = """([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_]+)\s+([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_-]+)"""
  private val snapRe = """([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_]+)\s+([0-9a-zA-Z_-]+)"""

  // the change data feed replayed from the raw mutation rules: appends as
  // inserts, the TTL delete's expired rows, the merge's pre/post update
  // images and its two insert sources (resubmissions + TTL'd correction
  // targets re-arriving) — shared by the library-path and connector-path
  // feed queries, so their hash equality is a single-oracle equivalence
  private val cdfOracleSql: String =
    s"""SELECT CAST(0 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
       |  count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
       |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |UNION ALL
       |SELECT 1, 'insert', count(*), CAST(sum(o_orderkey) AS BIGINT),
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
       |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
       |UNION ALL
       |SELECT 2, 'delete', count(*), CAST(sum(o_orderkey) AS BIGINT),
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
       |FROM orders WHERE o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}'
       |UNION ALL
       |SELECT 3, 'update_preimage', count(*), CAST(sum(o_orderkey) AS BIGINT),
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
       |FROM orders
       |WHERE o_orderkey % 10 = 3 AND o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'
       |UNION ALL
       |SELECT 3, 'update_postimage', count(*), CAST(sum(o_orderkey) AS BIGINT),
       |  CAST(sum(CAST(o_totalprice + ${AcidOps.PriceCorrection} AS DECIMAL(14,2))) AS DOUBLE)
       |FROM orders
       |WHERE o_orderkey % 10 = 3 AND o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'
       |UNION ALL
       |SELECT 3, 'insert', count(*), CAST(sum(k) AS BIGINT),
       |  CAST(sum(CAST(p AS DECIMAL(14,2))) AS DOUBLE)
       |FROM (
       |  SELECT o_orderkey + ${AcidOps.InsertKeyOffset} AS k, o_totalprice AS p
       |  FROM orders WHERE o_orderkey % 97 = 0
       |  UNION ALL
       |  SELECT o_orderkey, o_totalprice + ${AcidOps.PriceCorrection}
       |  FROM orders
       |  WHERE o_orderkey % 10 = 3 AND o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}'
       |) reinserts""".stripMargin

  val oracles: Map[String, String] = Map(
    "st2_removal_plan" ->
      withCtes(catalogCte)(
        s"""SELECT CAST(st.stage_order AS BIGINT) AS stage_order, st.stage,
           |  lower(trim(c.value)) AS table_name,
           |  replace(st.cmd_template, '%s', lower(trim(c.value))) AS command
           |FROM catalog c
           |CROSS JOIN (VALUES $stagesValues) AS st(stage_order, stage, cmd_template)
           |WHERE c.sft = 'purchase' AND lower(trim(c.value)) LIKE 'catalog%'""".stripMargin),
    "m6_flush_commands" ->
      withCtes(catalogCte, schemaTablesCte, registryCte)(
        """SELECT r.name AS node, t.table_name,
          |  'nodetool flush -- ks1 ' || t.table_name AS command
          |FROM registry r CROSS JOIN schema_tables t
          |WHERE t.sft = 'purchase'""".stripMargin),
    "m7_stop_commands" ->
      withCtes(catalogCte, schemaTablesCte, registryCte, compactionLinesCte,
        compactionStdoutCte)(
        s"""SELECT node, 'nodetool stop -id ' || id AS command FROM (
           |  SELECT node,
           |    regexp_extract(line, '$compRe', 1) AS id,
           |    regexp_extract(line, '$compRe', 3) AS keyspace,
           |    regexp_extract(line, '$compRe', 4) AS table_name
           |  FROM (SELECT node, unnest(string_split(stdout, chr(10))) AS line
           |        FROM compaction_stdout)
           |) WHERE id <> '' AND keyspace = 'ks1' AND table_name = 'catalog_purchase_z3'""".stripMargin),
    "m8_clear_snapshot_commands" ->
      withCtes(catalogCte, schemaTablesCte, registryCte, snapshotLinesCte)(
        s"""SELECT node,
           |  'nodetool clearsnapshot -t ' || regexp_extract(line, '$snapRe', 1)
           |    || ' -- ks1' AS command
           |FROM snapshot_lines
           |WHERE regexp_extract(line, '$snapRe', 1) <> ''
           |  AND regexp_extract(line, '$snapRe', 2) = 'ks1'
           |  AND regexp_extract(line, '$snapRe', 3) = 'catalog_purchase_z3'""".stripMargin),
    "m9_repair_plan" ->
      withCtes(catalogCte, schemaTablesCte, registryCte)(
        """SELECT r.name AS node, t.table_name,
          |  'nodetool repair -pr ks1 ' || t.table_name AS command
          |FROM registry r CROSS JOIN schema_tables t
          |WHERE t.sft = 'purchase'""".stripMargin),
    "m2_truncated" ->
      withCtes(catalogCte)("SELECT sft, value FROM catalog WHERE false"),
    "m3_after_drop" ->
      withCtes(catalogCte, schemaTablesCte)(
        "SELECT sft, table_name FROM schema_tables WHERE table_name <> 'catalog_error_z3'"),
    "m4_m5_table_properties" ->
      withCtes(catalogCte, schemaTablesCte)(
        """SELECT table_name, p.prop, p.value FROM schema_tables
          |CROSS JOIN (VALUES ('default_time_to_live', '86400'),
          |                   ('gc_grace_seconds', '3600')) AS p(prop, value)""".stripMargin),
    "m4_ttl_view" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, user_id
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >=
        |  (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 7 DAY""".stripMargin,
    "st1_restart_poll" ->
      withCtes(registryCte)(
        s"""SELECT name AS node,
           |  CASE WHEN ${h24("name")} % 200 <= 150
           |       THEN ${h24("name")} % 200 END AS first_up_attempt,
           |  CASE WHEN ${h24("name")} % 200 <= 150
           |       THEN (${h24("name")} % 200) * 2 END AS elapsed_sec,
           |  (${h24("name")} % 200 > 150) AS timed_out
           |FROM registry""".stripMargin),
    "m10_after_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
        |changes AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal
        |  FROM base WHERE c_custkey % 97 = 0)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM (
        |  SELECT * FROM base
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM changes)
        |  UNION ALL SELECT * FROM changes) merged
        |GROUP BY c_mktsegment""".stripMargin,
    // replay of the FULL mutation history's net effect: TTL survivors with
    // price corrections applied, TTL'd correction keys re-arriving as
    // inserts (the upsert contract), and the resubmitted-order inserts
    "xacid_final_state" ->
      s"""WITH final AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + ${AcidOps.PriceCorrection}
         |         ELSE o_totalprice END AS o_totalprice,
         |    o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    o_totalprice + ${AcidOps.PriceCorrection}, o_orderdate, o_orderpriority
         |  FROM orders
         |  WHERE o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}' AND o_orderkey % 10 = 3
         |  UNION ALL
         |  SELECT o_orderkey + ${AcidOps.InsertKeyOffset}, o_custkey, 'R',
         |    o_totalprice, o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 97 = 0
         |)
         |SELECT * FROM final""".stripMargin,
    // the exactly-once sink: three batches delivered FOUR times (batch 1
    // redelivered) through appendOnce txn identity — the final state must
    // equal the raw table's aggregates, where a double-applied batch
    // would inflate a third of every group
    "xacid_txn_sink" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_ids,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    // schema evolution: v0 lacks o_orderpriority entirely (files predate
    // the column), v1 carries it — the union read groups v0 rows under the
    // sentinel; a read that drops or mis-aligns the evolved column breaks
    // the parity split
    "xacid_schema_evolution" ->
      s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN '${AcidOps.PreEvolution}'
         |            ELSE o_orderpriority END AS priority,
         |  count(*) AS n_orders,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM orders GROUP BY 1""".stripMargin,
    // the v2 snapshot (post-TTL, pre-merge): time travel must reconstruct
    // it exactly even though v3 rewrote files afterwards
    "xacid_time_travel" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM orders WHERE o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'
         |GROUP BY o_orderstatus""".stripMargin,
    // the commit log's own provenance: every version's op + row metrics
    // derived from the raw table by the same deterministic rules
    "xacid_history" ->
      s"""SELECT CAST(0 AS BIGINT) AS version, 'append' AS op,
         |  (SELECT count(*) FROM orders
         |   WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') AS rows_written,
         |  CAST(0 AS BIGINT) AS rows_updated, CAST(0 AS BIGINT) AS rows_inserted,
         |  CAST(0 AS BIGINT) AS rows_deleted
         |UNION ALL
         |SELECT 1, 'append',
         |  (SELECT count(*) FROM orders
         |   WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'), 0, 0, 0
         |UNION ALL
         |SELECT 2, 'delete', 0, 0, 0,
         |  (SELECT count(*) FROM orders
         |   WHERE o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}')
         |UNION ALL
         |SELECT 3, 'merge', 0,
         |  (SELECT count(*) FROM orders
         |   WHERE o_orderkey % 10 = 3
         |     AND o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'),
         |  (SELECT count(*) FROM orders WHERE o_orderkey % 97 = 0)
         |    + (SELECT count(*) FROM orders
         |       WHERE o_orderkey % 10 = 3
         |         AND o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}'),
         |  0""".stripMargin,
    // prefix-pruned read (r12): the prover ranges LIKE '3%' as ['3','4')
    // against each file's UTF-8 string stats and opens 2 of 4 files
    // (AcidSpec asserts the count); the oracle asserts the pruned read
    // sees exactly what a full scan's filter sees
    "xacid_prefix_scan" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders WHERE o_orderpriority LIKE '3%'
        |GROUP BY o_orderpriority""".stripMargin,
    // the registered graft-tx connector (r13): same table through the
    // DataSource surface, compound prefix+notnull predicate pruned by the
    // connector's FileIndex — the oracle replays from the stamping rule
    "xacid_connector_scan" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |WHERE o_orderpriority LIKE '3%' AND o_orderkey % 3 = 0
        |GROUP BY o_orderpriority""".stripMargin,
    // SQL DML surface (r13): the TxCatalog's DELETE FROM + INSERT INTO
    // replayed from the raw rules — delete complement plus the literal
    // inserted row
    "xacid_sql_dml" ->
      """SELECT bucket, count(*) AS n_orders,
        |  CAST(sum(k) AS BIGINT) AS sum_keys,
        |  CAST(sum(CAST(p AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey % 7 AS bucket, o_orderkey AS k, o_totalprice AS p
        |  FROM orders WHERE o_orderkey > 2000
        |  UNION ALL
        |  SELECT 2000000000 % 7, 2000000000, 99.99
        |)
        |GROUP BY bucket""".stripMargin,
    // the SQL star-merge's update/insert rules and the SQL update's
    // arithmetic predicate, replayed from raw orders: corrections (+1.5 on
    // key ≡ 3 mod 10) update in place, resubmissions (key + 10⁹, status
    // 'R' on key ≡ 0 mod 97) insert, then key ≡ 7 mod 20 takes +0.25 —
    // both constants exact in IEEE double, hash-identical cross-engine
    "xacid_sql_merge" ->
      s"""WITH merged AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 10 = 3
         |         THEN o_totalprice + ${AcidOps.PriceCorrection}
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + ${AcidOps.InsertKeyOffset}, 'R', o_totalprice
         |  FROM orders WHERE o_orderkey % 97 = 0
         |), updated AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 20 = 7 THEN o_totalprice + 0.25
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM merged
         |)
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM updated GROUP BY o_orderstatus""".stripMargin,
    // the generalized merge's two statements replayed from raw orders.
    // Statement 1 over matched keys (≡ 0 mod 3): price > threshold
    // deletes FIRST, else even keys double (tgt + src price, status 'M'),
    // else +0.5; keys ≡ 0 mod 89 insert at key+10⁹ routed 'I1' (odd) /
    // 'I2' (even) — parity survives the even offset. Statement 2: matched
    // keys (≡ 0 mod 3 below 10⁹, or ≥ 10⁹ — all inserted keys came from
    // the source) take 'K' when ≡ 0 mod 1000; unmatched rows delete when
    // ≡ 4 mod 10, take 'U' when ≡ 7 mod 10. All constants exact in IEEE
    // double, hash-identical cross-engine.
    "xacid_sql_merge_full" ->
      s"""WITH m1 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 2 = 0 THEN 'M' ELSE o_orderstatus END
         |      AS o_orderstatus,
         |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + o_totalprice
         |         ELSE o_totalprice + 0.5 END AS o_totalprice
         |  FROM orders
         |  WHERE o_orderkey % 3 = 0
         |    AND NOT (o_totalprice > ${AcidOps.MergeDeleteThreshold})
         |  UNION ALL
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderkey + ${AcidOps.InsertKeyOffset},
         |    CASE WHEN o_orderkey % 2 = 1 THEN 'I1' ELSE 'I2' END,
         |    o_totalprice
         |  FROM orders WHERE o_orderkey % 89 = 0
         |), m2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN (o_orderkey % 3 = 0 OR
         |               o_orderkey >= ${AcidOps.InsertKeyOffset})
         |              AND o_orderkey % 1000 = 0 THEN 'K'
         |         WHEN NOT (o_orderkey % 3 = 0 OR
         |                   o_orderkey >= ${AcidOps.InsertKeyOffset})
         |              AND o_orderkey % 10 = 7 THEN 'U'
         |         ELSE o_orderstatus END AS o_orderstatus,
         |    o_totalprice
         |  FROM m1
         |  WHERE NOT (NOT (o_orderkey % 3 = 0 OR
         |                  o_orderkey >= ${AcidOps.InsertKeyOffset})
         |             AND o_orderkey % 10 = 4)
         |)
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM m2 GROUP BY o_orderstatus""".stripMargin,
    // the restore's two visible snapshots, replayed from raw orders: the
    // restored final state is the FULL v1 table (every key-≡-0-mod-5 row
    // the delete removed is back), the pre-restore state still shows the
    // delete — restore adds history, it never erases it
    "xacid_restore" ->
      """SELECT 'final' AS side, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM orders
        |UNION ALL
        |SELECT 'pre_restore', count(*),
        |  CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
        |FROM orders WHERE o_orderkey % 5 <> 0""".stripMargin,
    // the atomic overwrite's two visible snapshots, replayed from raw
    // orders: the final state is the overwrite SELECT (key ≡ 1 mod 4,
    // +10.0), v0 is the seeded even-key half — an overwrite that leaks
    // old rows into the final state or breaks time travel mismatches
    "xacid_sql_overwrite" ->
      """SELECT 'final' AS side, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(sum(CAST(o_totalprice + 10.0 AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 4 = 1
        |UNION ALL
        |SELECT 'v0', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,
    // null-accounting reads (r12): IsNull proves absence on the stamped
    // files (footer null count 0), IsNotNull on the unstamped ones (null
    // count = row count) — each side opens 1 of 4 files; the oracle
    // replays both sides' aggregates from the raw stamping rule
    "xacid_nullskip_scan" ->
      """SELECT 'unstamped' AS side, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |WHERE o_orderkey % 3 <> 0 AND o_orderpriority LIKE '3%'
        |UNION ALL
        |SELECT 'stamped', count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  count(DISTINCT o_custkey)
        |FROM orders
        |WHERE o_orderkey % 3 = 0 AND o_orderpriority LIKE '3%'""".stripMargin,
    // the change data feed replayed from the raw mutation rules: appends
    // as inserts, the TTL delete's expired rows, the merge's pre/post
    // update images and its two insert sources (resubmissions + TTL'd
    // correction targets re-arriving)
    "xacid_cdf" -> cdfOracleSql,
    // the registered source's readChangeFeed option replays the SAME feed
    // (r14): identical oracle — hash equality proves the connector path
    // loses/duplicates nothing vs the library path
    "xacid_cdf_connector" -> cdfOracleSql,
    // merge-on-read deletes: two overlapping deletion-vector sweeps, no
    // file rewritten — the scan-time anti-filter must reproduce exactly
    // the conjunction of both predicates' complements
    "xacid_dv_scan" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE NOT (o_orderkey % 7 = 0)
        |  AND NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
        |GROUP BY o_orderstatus""".stripMargin,
    // the change-feed-maintained MV must equal the FINAL state aggregate
    // (the same replay CTE as xacid_final_state, rolled up by status):
    // inserts − deletes + postimages − preimages is algebraically the
    // final state iff the feed is complete and exactly-once
    "xacid_mv" ->
      s"""WITH final AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + ${AcidOps.PriceCorrection}
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '${AcidOps.TtlCutoff}'
         |  UNION ALL
         |  SELECT o_orderkey, o_orderstatus, o_totalprice + ${AcidOps.PriceCorrection}
         |  FROM orders
         |  WHERE o_orderdate < TIMESTAMP '${AcidOps.TtlCutoff}' AND o_orderkey % 10 = 3
         |  UNION ALL
         |  SELECT o_orderkey + ${AcidOps.InsertKeyOffset}, 'R', o_totalprice
         |  FROM orders WHERE o_orderkey % 97 = 0
         |)
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
         |FROM final GROUP BY o_orderstatus""".stripMargin,
  )
}
