package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semi-structured text parsing + scatter-gather family (SURVEY §2 S5,
  * T3/T5/T6, F5/F6/F9, C1–C4, A4/A5, J1, O1/O2): the reference's
  * `nodetool`-output pipelines as single Catalyst plans.
  *
  * The reference's physical shape — fan out a command to every node
  * (`asyncio.gather`, /root/reference/cluster.py:147-148), split stdout into
  * lines, regex-parse, filter, flatten — is exactly Spark's narrow-op
  * pipeline: `explode(split())` → `regexp_extract` → `where`. No shuffle
  * anywhere except the explicitly aggregating ops (A4 gather), so these scale
  * linearly with node count and stdout volume: at a 1000-node fleet the
  * per-node blobs partition freely and WholeStageCodegen fuses the whole
  * parse chain into one pass.
  */
object ParseOps {

  /** Compaction-line regex — the reference's named-group pattern
    * (/root/reference/node.py:111, geomesa_cassandra.py:121) with numbered
    * groups (hyphen moved to class end: identical language, portable to RE2).
    */
  val CompactionRe = "([0-9a-zA-Z_-]+)\\s+([0-9a-zA-Z_]+)\\s+([0-9a-zA-Z_-]+)\\s+([0-9a-zA-Z_-]+)"

  /** Snapshot-line regex (/root/reference/node.py:153). */
  val SnapshotRe = "([0-9a-zA-Z_-]+)\\s+([0-9a-zA-Z_]+)\\s+([0-9a-zA-Z_-]+)"

  /** Liveness regex (/root/reference/node.py:50-53): Gossip/Thrift/Transport
    * all true, dot-all across the multiline `nodetool info` output.
    */
  val LivenessRe = "(?s)Gossip active : true.*Thrift active : true.*Native Transport active : true"

  /** S5+T3+F6+C2: per-node `compactionstats` stdout blobs → parsed compaction
    * records. Mirrors `Node.find_compactions`
    * (/root/reference/node.py:79-114): split lines, regex-extract
    * {id,type,keyspace,table}, drop non-matches; node key carried in-row
    * (cluster-wide variant, /root/reference/geomesa_cassandra.py:99-124).
    */
  def parseCompactions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.compactionStdout(spark, sfDir)
      .select(col("node"), explode(split(col("stdout"), "\n")).as("line"))
      .select(col("node"),
        regexp_extract(col("line"), CompactionRe, 1).as("id"),
        regexp_extract(col("line"), CompactionRe, 2).as("type"),
        regexp_extract(col("line"), CompactionRe, 3).as("keyspace"),
        regexp_extract(col("line"), CompactionRe, 4).as("table_name"))
      .where(col("id") =!= "")

  /** S5 snapshot variant (/root/reference/node.py:143-154). */
  def parseSnapshots(spark: SparkSession, sfDir: String): DataFrame =
    Tables.snapshotLines(spark, sfDir)
      .select(col("node"),
        regexp_extract(col("line"), SnapshotRe, 1).as("name"),
        regexp_extract(col("line"), SnapshotRe, 2).as("keyspace"),
        regexp_extract(col("line"), SnapshotRe, 3).as("snap_table"))
      .where(col("name") =!= "")

  /** F6 observability: parse totality per node — raw data lines vs parsed
    * records (the `if compaction` miss-filter, /root/reference/node.py:86).
    */
  def parseTotality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.compactionStdout(spark, sfDir)
      .select(col("node"), explode(split(col("stdout"), "\n")).as("line"))
      .groupBy(col("node"))
      .agg(count("*").as("n_lines"),
        count(when(regexp_extract(col("line"), CompactionRe, 1) =!= "", 1))
          .as("n_parsed"))

  /** C2+F5 = EP3 `find_table_compactions` (/root/reference/cluster.py:83-93,
    * node.py:79-100): cluster-wide gather → flatten → conjunctive (ks, table)
    * filter → compaction ids per node. Single narrow Catalyst plan.
    */
  def findTableCompactions(spark: SparkSession, sfDir: String,
                           ks: String, table: String): DataFrame =
    parseCompactions(spark, sfDir)
      .where(col("keyspace") === ks && col("table_name") === table)
      .select(col("node"), col("id"))

  /** C2 snapshot variant (/root/reference/cluster.py:107-117). */
  def findTableSnapshots(spark: SparkSession, sfDir: String,
                         ks: String, table: String): DataFrame =
    parseSnapshots(spark, sfDir)
      .where(col("keyspace") === ks && col("snap_table") === table)
      .select(col("node"), col("name"))

  /** F9+T6: node liveness — the multiline dot-all regex over `nodetool info`
    * (/root/reference/node.py:48-55).
    */
  def nodeLiveness(spark: SparkSession, sfDir: String): DataFrame =
    Tables.infoResults(spark, sfDir)
      .select(col("node"), col("stdout").rlike(LivenessRe).as("is_up"))

  /** A1 cluster-level: `all(node.is_up() for ...)`
    * (/root/reference/cluster.py:56-59).
    */
  def clusterUp(spark: SparkSession, sfDir: String): DataFrame =
    nodeLiveness(spark, sfDir)
      .agg(bool_and(col("is_up")).as("cluster_up"),
        count(when(col("is_up"), 1)).as("n_up"),
        count("*").as("n_nodes"))

  /** A4 gather: per-node compaction ids as one deterministic row — the
    * `asyncio.gather` result list (/root/reference/geomesa_cassandra.py:99-111)
    * with order pinned by sorting (the reference's list order is arrival
    * order — nondeterministic; we do better).
    */
  def gatherCompactionIds(spark: SparkSession, sfDir: String): DataFrame =
    parseCompactions(spark, sfDir)
      .groupBy(col("node"))
      .agg(array_join(array_sort(collect_list(col("id"))), ",").as("ids"),
        count("*").as("n_compactions"))

  /** Scale-safe positional index: sort (range-partitioned, distributed) then
    * `zipWithIndex`, which computes global offsets from per-partition counts
    * only — no partition-less Window, no single-partition funnel. 1-based to
    * mirror SQL row_number.
    */
  private def withSortedIndex(df: DataFrame, sortCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val sorted = df.orderBy(col(sortCol))
    val schema = sorted.schema.add("idx", LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /** J1 done right: the reference's positional `zip(results, nodes)`
    * (/root/reference/geomesa_cassandra.py:102) is order-dependent; here the
    * index is an explicit 1-based position over a total order, assigned via
    * distributed sort + `zipWithIndex` (r1 used two partition-less Windows —
    * the textbook single-partition scale-killer; this form shuffles for the
    * range sort only and never funnels rows through one task).
    */
  def zipJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val left = withSortedIndex(
      Tables.schemaTables(spark, sfDir).select(col("table_name")), "table_name")
    val right = withSortedIndex(
      Tables.describeResults(spark, sfDir)
        .select(col("table_name"), (col("stderr") === "").as("tbl_exists")),
      "table_name").drop("table_name")
    left.join(right, Seq("idx"))
  }

  /** C3: error-tolerant row handling — `return_exceptions=True` +
    * `get_output_or_raise` (/root/reference/geomesa_cassandra.py:199-235):
    * non-zero exit keeps the error as a value; strict mode would raise.
    * Modeled as Try-columns: (node, ok, output, error).
    */
  def cmdOutcomes(spark: SparkSession, sfDir: String): DataFrame = {
    val results = Tables.infoResults(spark, sfDir)
      .select(col("node"), col("stdout"),
        (Tables.h24(col("node")) % 5 === 0).cast("int").as("exit_status"))
    results.select(
      col("node"),
      (col("exit_status") === 0).as("ok"),
      when(col("exit_status") === 0, col("stdout")).as("output"),
      when(col("exit_status") =!= 0,
        concat(lit("command failed on "), col("node"))).as("error"))
  }

  /** C4: named-node registry lookup (/root/reference/remote.py:75-100). */
  def namedLookup(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.registry(spark, sfDir).where(col("name") === name)

  /** C4 error path: the reference raises a ValueError when a name is absent
    * from the registry (/root/reference/remote.py:91-100). Errors are values
    * here: one outcome row (name, found, error) — found=false carries the
    * not-found message instead of silently returning an empty frame.
    */
  def namedLookupOutcome(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Tables.registry(spark, sfDir)
      .agg(count(when(col("name") === name, 1)).as("n"))
      .select(lit(name).as("name"), (col("n") > 0).as("found"),
        when(col("n") > 0, lit(null).cast("string"))
          .otherwise(concat(lit("node '"), lit(name),
            lit("' not found in remotes registry"))).as("error"))

  /** O1: coordinator pick — the reference uses `random.choice`
    * (/root/reference/cluster.py:42-43); we pin determinism by hashing:
    * min over md5(name), stable across engines and partitionings.
    */
  def pickCoordinator(spark: SparkSession, sfDir: String): DataFrame =
    Tables.registry(spark, sfDir)
      .select(col("name"), md5(col("name")).as("h"))
      .agg(min_by(col("name"), col("h")).as("coordinator"))

  /** O2: seed node = first by total order (/root/reference/geomesa_cassandra.py:69). */
  def seedNode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.registry(spark, sfDir).agg(min(col("name")).as("seed"))
}
