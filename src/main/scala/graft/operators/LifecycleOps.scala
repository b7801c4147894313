package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle / mutation family (SURVEY §2 ST1/ST2, M2–M9, T4): the
  * reference's effectful 7-stage table-removal pipeline and nodetool
  * maintenance commands, surfaced as pure, oracle-testable read-side plans
  * (SURVEY §7 "hard parts": expose mutations' read-sides as derived
  * DataFrames).
  *
  * The effectful execution itself (ordered actions, each a cluster barrier —
  * /root/reference/geomesa_cassandra.py:66-85) is [[removeSchema]]: a
  * driver-side sequence of Spark actions, where each action's completion is
  * the barrier the reference gets from `asyncio.gather`.
  */
object LifecycleOps {

  /** The 7 removal stages in their mandated order
    * (/root/reference/geomesa_cassandra.py:66-85: flush → stop-compactions →
    * truncate → clear-snapshots → repair → cleanup → compact).
    */
  val Stages: Seq[(Int, String, String)] = Seq(
    (1, "flush", "nodetool flush -- ks1 %s"),
    (2, "stop_compactions", "nodetool stop -id <per-compaction> # ks1.%s"),
    (3, "truncate", "cqlsh -e \"CONSISTENCY ALL; TRUNCATE ks1.%s;\""),
    (4, "clear_snapshots", "nodetool clearsnapshot -t <per-snapshot> -- ks1 # %s"),
    (5, "repair", "nodetool repair -pr ks1 %s"),
    (6, "cleanup", "nodetool cleanup ks1 %s"),
    (7, "compact", "nodetool compact ks1 %s"))

  /** ST2 read-side: the ordered stage × table execution plan for one SFT's
    * removal — every (stage, table) command the pipeline will run, with
    * command strings templated like the reference's f-strings (T4,
    * /root/reference/geomesa_cassandra.py:88,133,174,183,189).
    */
  def removalPlan(spark: SparkSession, sfDir: String, sft: String): DataFrame = {
    val stages = spark.createDataFrame(Stages).toDF("stage_order", "stage", "cmd_template")
    CatalogOps.findSchemaTables(spark, sfDir, sft)
      .crossJoin(stages)
      .select(col("stage_order").cast("long"), col("stage"), col("table_name"),
        replace(col("cmd_template"), lit("%s"), col("table_name")).as("command"))
  }

  /** M6 read-side + T4 + C1: the flush fan-out — `nodetool flush -- ks t` on
    * every node for every schema table of the SFT
    * (/root/reference/node.py:73-74 run cluster-wide by
    * geomesa_cassandra.py:87-90). Spark has no memtable, so the command plan
    * IS the operator's content; the no-op analog action is a `df.write`
    * commit (SURVEY §2 M6).
    */
  def flushCommands(spark: SparkSession, sfDir: String, ks: String, sft: String): DataFrame =
    Tables.registry(spark, sfDir).select(col("name").as("node"))
      .crossJoin(CatalogOps.findSchemaTables(spark, sfDir, sft))
      .select(col("node"), col("table_name"),
        concat(lit(s"nodetool flush -- $ks "), col("table_name")).as("command"))

  /** M7 read-side + T4: stop commands for every live compaction of a table
    * (/root/reference/node.py:102-108: find ids, then `nodetool stop -id x`).
    */
  def stopCommands(spark: SparkSession, sfDir: String, ks: String, table: String): DataFrame =
    ParseOps.findTableCompactions(spark, sfDir, ks, table)
      .select(col("node"),
        concat(lit("nodetool stop -id "), col("id")).as("command"))

  /** M8 read-side + T4: clearsnapshot commands
    * (/root/reference/node.py:119-123).
    */
  def clearSnapshotCommands(spark: SparkSession, sfDir: String, ks: String, table: String): DataFrame =
    ParseOps.findTableSnapshots(spark, sfDir, ks, table)
      .select(col("node"),
        concat(lit("nodetool clearsnapshot -t "), col("name"), lit(" -- "), lit(ks))
          .as("command"))

  /** M9+C1 read-side: the repair fan-out plan — one command per (node, table)
    * (/root/reference/geomesa_cassandra.py:172-179 over get_remote_ips).
    */
  def repairPlan(spark: SparkSession, sfDir: String, sft: String): DataFrame =
    Tables.registry(spark, sfDir).select(col("name").as("node"))
      .crossJoin(CatalogOps.findSchemaTables(spark, sfDir, sft))
      .select(col("node"), col("table_name"),
        concat(lit("nodetool repair -pr ks1 "), col("table_name")).as("command"))

  /** M2 read-side: a truncated table — same schema, zero rows
    * (/root/reference/node.py:168-172); overwrite-with-empty at scale.
    */
  def truncated(spark: SparkSession, sfDir: String): DataFrame =
    Tables.catalog(spark, sfDir).limit(0)

  /** M3 read-side: schema tables surviving `DROP TABLE ks.t`
    * (/root/reference/geomesa_cassandra.py:194-196).
    */
  def afterDrop(spark: SparkSession, sfDir: String, table: String): DataFrame =
    Tables.schemaTables(spark, sfDir).where(col("table_name") =!= table)

  /** M4/M5 read-side: table properties after the TTL / gc_grace ALTERs
    * (/root/reference/geomesa_cassandra.py:259-290) — property rows per
    * schema table, the Spark-world `TBLPROPERTIES` analog.
    */
  def tableProperties(spark: SparkSession, sfDir: String,
                      ttl: Int, gcGrace: Int): DataFrame = {
    val props = spark.createDataFrame(Seq(
      ("default_time_to_live", ttl.toString),
      ("gc_grace_seconds", gcGrace.toString))).toDF("prop", "value")
    Tables.schemaTables(spark, sfDir).select(col("table_name")).crossJoin(props)
  }

  /** M4 enforcement view: TTL as a filter relative to the table's own
    * high-watermark (deterministic, unlike now()-anchored TTL): keep events
    * within `ttlDays` of max(ts). At scale the max comes from partition
    * stats / a broadcast single-row subquery, not a full shuffle.
    */
  def ttlView(spark: SparkSession, sfDir: String, ttlDays: Int): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hw = ev.agg(max(col("ts")).as("hw"))
    ev.crossJoin(broadcast(hw))
      .where(col("ts") >= col("hw") - expr(s"INTERVAL $ttlDays DAYS"))
      .select(col("event_id"), col("ts"), col("event_type"), col("user_id"))
  }

  /** ST1 batch analog: poll-until-up with timeout
    * (/root/reference/node.py:57-65: probe every 2 s, give up at 300 s).
    * Derived probe outcomes: node n comes up at attempt `h24(n) % 200`;
    * the poll sees it if that lands within the 150-attempt budget.
    * Emits per node: first successful attempt (null if none), elapsed
    * seconds, and timed_out — the reference's TimeoutError as a value.
    */
  def restartPoll(spark: SparkSession, sfDir: String): DataFrame = {
    val maxAttempts = 150 // 300 s cap / 2 s interval
    Tables.registry(spark, sfDir)
      .select(col("name").as("node"), (Tables.h24(col("name")) % 200).as("up_at"))
      .select(col("node"),
        when(col("up_at") <= maxAttempts, col("up_at")).as("first_up_attempt"),
        when(col("up_at") <= maxAttempts, col("up_at") * 2).as("elapsed_sec"),
        (col("up_at") > maxAttempts).as("timed_out"))
  }

  /** M10 (extension) upsert read-side: MERGE INTO without a transactional
    * table format — the after-state of applying a change set (updates +
    * inserts) to the customer dimension, expressed as the immutable-storage
    * rewrite: base ANTI-JOIN changed-keys UNION changes. The change set is
    * derived deterministically from the corpus so the oracle can replay it:
    * every custkey ≡ 0 (mod 7) gets +100.00 balance (update), and every
    * custkey ≡ 0 (mod 97) also appears as a NEW row keyed custkey + 10^7
    * (insert). Scale shape: the change set is tiny relative to the base
    * (the usual CDC regime), so the anti-join broadcasts it and the base
    * never shuffles; with partitioned storage, only partitions containing
    * changed keys are rewritten (dynamic partition overwrite) — full ACID
    * MERGE needs Delta/Iceberg, which is exactly what this plan compiles to
    * there. Output is the per-segment summary of the after-state (count +
    * exact balance sum), so the oracle checks the whole state, compactly.
    */
  def afterUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val updates = base.where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
    val inserts = base.where(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        col("c_mktsegment"), col("c_acctbal"))
    val changes = updates.unionAll(inserts)
    base
      .join(broadcast(changes.select(col("c_custkey"))), Seq("c_custkey"), "left_anti")
      .unionAll(changes)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_bal"))
  }

  /** ST2 effectful: the actual ordered execution — each stage is one Spark
    * action (count/write), whose completion is the cluster-wide barrier.
    * Returns the per-stage row counts in execution order. Used by tests;
    * not oracle-registered (side-effect ordering, not a dataset).
    */
  def removeSchema(spark: SparkSession, sfDir: String, sft: String): Seq[(String, Long)] = {
    val preflight = CatalogOps.missingTables(spark, sfDir).where(col("sft") === sft)
    val missing = preflight.count()
    require(missing == 0 || sft == "error", // fixture: 'error' tables partly missing
      s"pre-flight: $missing schema tables missing for $sft")
    Stages.map { case (_, stage, _) =>
      val touched = stage match {
        case "stop_compactions" =>
          stopCommands(spark, sfDir, "ks1", s"catalog_${sft}_z3").count()
        case "clear_snapshots" =>
          clearSnapshotCommands(spark, sfDir, "ks1", s"catalog_${sft}_z3").count()
        case _ => repairPlan(spark, sfDir, sft).count()
      }
      stage -> touched
    }
  }
}
