package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md) plus the
  * *derived* reference-model tables (SURVEY.md §1): a GeoMesa-style catalog,
  * a node registry, and command-result tables. The derivations are pure,
  * deterministic functions of the corpus so each is equally expressible as a
  * DuckDB CTE (see [[Oracle]]) — that's what makes every reference-parity
  * operator oracle-testable.
  *
  * Scale note: every derived table is built with narrow ops only (no shuffle
  * except where an aggregation is semantically required), so derivations
  * stay cheap at 100 TB: they pipeline into the consuming operator and
  * Catalyst prunes/pushes through them.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Derived fixture tables are memoized + cached once per (session, sfDir)
    * so per-query work measures the operator, not the fixture derivation:
    * without this, e.g. every catalog query re-runs an events scan +
    * distinct for what is logically a 25-row table. All cached tables are
    * tiny (catalog/registry/command blobs — KBs at any SF); big corpus
    * tables (lineitem, documents, events, ...) are never cached — they are
    * the operators' real scan inputs.
    */
  private val derivedCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]

  private[graft] def derived(spark: SparkSession, sfDir: String, name: String)
                            (build: => DataFrame): DataFrame =
    derivedCache.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, name), build.cache())

  /** Session staging dir for corpus-scale derived tables, keyed by sf dir so
    * concurrent runs at different SFs never collide.
    */
  private[graft] def stageDir(sfDir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_stage/" +
      s"${Integer.toHexString(sfDir.hashCode)}/$name"

  private val attemptSeq = new java.util.concurrent.atomic.AtomicLong()
  private val attemptDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** A staging path no other build attempt can ever collide with. A
    * timed-out Verify worker is abandoned, not killed (thread interrupt
    * doesn't stop driver-side planning) — with a SHARED overwrite path the
    * abandoned writer and a later rebuild of the same lineage would run two
    * concurrent parquet overwrites on one directory and silently poison
    * every downstream read (ADVICE r7). Unique per-attempt dirs make the
    * abandoned writer harmless: nothing ever reads its directory, and
    * [[clearDerived]] deletes whatever this session registered.
    */
  private[graft] def uniqueStageDir(spark: SparkSession, sfDir: String,
                                    name: String): String = {
    val p = stageDir(sfDir, name) +
      s"/a${ProcessHandle.current().pid()}_${attemptSeq.incrementAndGet()}"
    attemptDirs.add((System.identityHashCode(spark), p)): Unit
    p
  }

  /** Corpus-scale derived tables (exploded shingles, per-vector assignments,
    * z-keyed layouts) must NOT live in the executor block store for the
    * session's lifetime — at 100 TB they don't fit, and even at bench SF the
    * accumulated blocks crowd every later query's working set (the r2/r3
    * bench regressions). Stage them once per (session, sfDir) as partitioned
    * parquet in tmp — the only shape that exists at scale — and read back:
    * consumers get column pruning + min/max stats instead of pinned memory.
    */
  private[graft] def derivedBig(spark: SparkSession, sfDir: String, name: String)
                               (build: => DataFrame): DataFrame =
    derivedBigBy(spark, sfDir, name, Nil)(build)

  /** [[derivedBig]] with a hive-style partition layout: the staged table is
    * written `partitionBy(partitionCols)`, so downstream filters on those
    * columns become partition-pruned scans (directories never listed) — the
    * layout move an ANN/geo table makes at 100 TB.
    */
  private[graft] def derivedBigBy(spark: SparkSession, sfDir: String, name: String,
                                  partitionCols: Seq[String])
                                 (build: => DataFrame): DataFrame =
    derivedCache.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, name), {
        val path = uniqueStageDir(spark, sfDir, name)
        val w = build.write.mode("overwrite")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(path)
        spark.read.parquet(path)
      })

  /** Number of buckets for the bucketed fact-table layouts. At 100 TB this
    * is sized to executor count × a small factor (e.g. 4 × 1000); here it
    * just needs to exceed local parallelism so the co-location property —
    * not partition count — is what the plan demonstrates.
    */
  val NumBuckets = 8

  /** A corpus table staged once per (session, sfDir) as a *bucketed* catalog
    * table: hash-bucketed and sorted by `key` into [[NumBuckets]] files per
    * the Spark bucketing spec. Joins and aggregations keyed on `key` between
    * tables bucketed the same way need NO exchange — the scan itself reports
    * hash partitioning — which at 100 TB removes the single biggest cost of
    * a fact⋈fact join (shuffling both sides every query) in exchange for
    * one-time layout work at write time. Registered as an external table
    * (explicit path under the stage dir) because bucket metadata lives in
    * the catalog, not the parquet footer.
    */
  private[graft] def bucketed(spark: SparkSession, sfDir: String, src: String,
                              key: String): DataFrame =
    derivedCache.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, s"bkt_$src"), {
        val path = uniqueStageDir(spark, sfDir, s"bkt_$src")
        // catalog name carries the attempt suffix too: bucket metadata lives
        // in the catalog, and an abandoned attempt must never DROP/replace a
        // live attempt's entry
        val tbl = s"graft_bkt_${src}_" + path.substring(path.lastIndexOf('/') + 1)
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        table(spark, sfDir, src).write.mode("overwrite")
          .option("path", path)
          .bucketBy(NumBuckets, key).sortBy(key)
          .format("parquet").saveAsTable(tbl)
        bucketedTables.add((System.identityHashCode(spark), tbl)): Unit
        spark.table(tbl)
      })

  private val bucketedTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** [[derivedBig]] staged as a BUCKETED catalog table (hash-bucketed and
    * sorted by `key` into [[NumBuckets]] buckets): for a derived layout that
    * downstream operators repeatedly JOIN or AGGREGATE on `key`, the scan
    * itself reports hash partitioning, so those consumers need no exchange
    * on this side — the [[bucketed]] corpus-table move applied to a derived
    * table (guide §6 / §2.4). At 100 TB this is the difference between an
    * iterative graph query shuffling its edge list every round and shuffling
    * only the vertex-sized message vector.
    */
  private[graft] def derivedBigBucketed(spark: SparkSession, sfDir: String,
                                        name: String, key: String)
                                       (build: => DataFrame): DataFrame =
    derivedCache.getOrElseUpdate(
      (System.identityHashCode(spark), sfDir, name), {
        val path = uniqueStageDir(spark, sfDir, name)
        // catalog name carries the attempt suffix (see [[bucketed]]): an
        // abandoned attempt must never DROP/replace a live attempt's entry
        val tbl = s"graft_${name}_" + path.substring(path.lastIndexOf('/') + 1)
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        build.write.mode("overwrite")
          .option("path", path)
          .bucketBy(NumBuckets, key).sortBy(key)
          .format("parquet").saveAsTable(tbl)
        bucketedTables.add((System.identityHashCode(spark), tbl)): Unit
        spark.table(tbl)
      })

  def bucketedOrders(spark: SparkSession, sfDir: String): DataFrame =
    bucketed(spark, sfDir, "orders", "o_orderkey")

  def bucketedLineitem(spark: SparkSession, sfDir: String): DataFrame =
    bucketed(spark, sfDir, "lineitem", "l_orderkey")

  private def deleteLocal(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(): Unit
    }
    rec(new java.io.File(path))
  }

  /** Eagerly materialize every derived fixture table (Bench warmup /
    * Verify preamble). Each derivation is individually failure-isolated:
    * one broken lineage (e.g. a fixture-schema drift in `events`, the r6
    * incident) must degrade only the queries on that lineage — never zero
    * the whole round's correctness dump. Queries on a failed lineage still
    * throw at their own call site, where Verify/Bench record them per-query.
    */
  def materializeDerived(spark: SparkSession, sfDir: String): Unit = {
    val derivations: Seq[(String, () => Long)] = Seq(
      "catalog"            -> (() => catalog(spark, sfDir).count()),
      "registry"           -> (() => registry(spark, sfDir).count()),
      "schema_tables"      -> (() => schemaTables(spark, sfDir).count()),
      "compaction_stdout"  -> (() => compactionStdout(spark, sfDir).count()),
      "snapshot_lines"     -> (() => snapshotLines(spark, sfDir).count()),
      "describe_results"   -> (() => describeResults(spark, sfDir).count()),
      "info_results"       -> (() => infoResults(spark, sfDir).count()))
    derivations.foreach { case (name, run) =>
      // NonFatal only: an OOM or interrupt must abort the round loudly, not
      // be logged as a fixture failure while the JVM limps on (ADVICE r7)
      try { run(): Unit } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[tables] fixture derivation '$name' failed: ${e.getMessage}")
      }
    }
  }

  /** Session-keyed cache invalidation hooks: modules holding their own
    * per-(session, sfDir) memos (SRP bit counts, registered-function
    * ownership) register a hook so [[clearDerived]] drains them together
    * with the staged tables — a memo keyed to a corpus snapshot must not
    * outlive the snapshot (ADVICE r8: a within-session corpus rebuild
    * would silently diverge from the oracle's fresh recompute). Hooks
    * receive the session identity being cleared. Registered lazily by the
    * owning module, so Tables never depends on operator packages.
    */
  private val sessionCacheHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[Int => Unit]()
  private[graft] def onClearDerived(hook: Int => Unit): Unit = {
    sessionCacheHooks.add(hook): Unit
  }

  /** Unpersist and drop this session's derived-table cache (long-lived
    * sessions must not accumulate cached blocks — ADVICE r1), drop its
    * bucketed catalog entries, delete its staged attempt directories, and
    * drain every registered session-keyed module cache.
    */
  def clearDerived(spark: SparkSession): Unit = {
    val id = System.identityHashCode(spark)
    sessionCacheHooks.forEach(h => h(id))
    derivedCache.keys.filter(_._1 == id).foreach { k =>
      derivedCache.remove(k).foreach(_.unpersist())
    }
    bucketedTables.removeIf { case (sid, tbl) =>
      if (sid == id) { spark.sql(s"DROP TABLE IF EXISTS $tbl"); true } else false
    }: Unit
    attemptDirs.removeIf { case (sid, p) =>
      if (sid == id) { deleteLocal(p); true } else false
    }: Unit
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame   = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame   = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame   = table(spark, d, "region")
  /** `events.ts` has shipped under two fixture encodings: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader only accepts as raw long nanos via the
    * legacy conf — floor to µs) and, since the 2026-08-13 corpus refresh,
    * plain `timestamp[us]` with no zone (read natively as TIMESTAMP_NTZ).
    * Branch on the loaded dtype so the engine is robust to either corpus
    * (FIXTURES.md caution). Both branches normalize to session-zone
    * `TimestampType` — the type every downstream op, streaming watermark,
    * and the r5-green oracle comparison were built against; with the
    * session timezone pinned to UTC the NTZ→LTZ cast is value-identity,
    * and DuckDB's naive `CAST(ts AS TIMESTAMP)` stays µs-exact on both.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** Derived `partsupp` — the corpus ships no partsupp fixture, so the TPC-H
    * Q11 shape derives one: the distinct `(l_partkey, l_suppkey)` pairs that
    * actually traded, with availqty/supplycost as deterministic integer
    * functions of the keys (exactly reproducible as a DuckDB CTE, so Q11
    * stays hash-checkable). Supply cost is kept in integer CENTS so every
    * downstream sum is exact int64 — no decimal/double portability rules
    * needed. Corpus-scale (≈ lineitem's key cardinality), so staged via
    * [[derivedBig]]: one distinct shuffle once per session, then consumers
    * get a plain pruned parquet scan — at 100 TB this is a written-once
    * dimension layout, not a per-query recompute.
    */
  def partsupp(spark: SparkSession, sfDir: String): DataFrame =
    derivedBig(spark, sfDir, "partsupp") {
      lineitem(spark, sfDir)
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .select(col("ps_partkey"), col("ps_suppkey"),
          (((col("ps_partkey") * 37 + col("ps_suppkey") * 17) % 9999) + 1)
            .as("ps_availqty"),
          (((col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 100000) + 100)
            .as("ps_supplycost_cents"))
    }

  /** Portable deterministic 24-bit hash of a string column: the first 6 hex
    * digits of md5, as a long in [0, 2^24). Identical in DuckDB via strpos
    * arithmetic ([[Oracle.h24]]) — used wherever a derivation needs a
    * pseudo-random but engine-agnostic selector.
    */
  def h24(c: Column): Column = conv(substring(md5(c), 1, 6), 16, 10).cast("long")

  /** [[h24]] from an arbitrary 6-hex-digit slice of the md5: one digest
    * yields FIVE independent 24-bit draws (slices at 1,7,13,19,25), which
    * is how hash-hungry per-row derivations (the 32-replicate bootstrap)
    * amortize the digest cost 5×. `slice` ∈ [0,4].
    */
  def h24Slice(c: Column, slice: Int): Column =
    conv(substring(md5(c), 1 + 6 * slice, 6), 16, 10).cast("long")

  /** Portable deterministic 48-bit hash: the first 12 hex digits of md5 as a
    * long in [0, 2^48). The wide variant exists for signatures whose BANDS
    * must stay selective at corpus scale — a 24-bit SimHash split into 4
    * bands gives only 64 bucket values per band, so every band bucket holds
    * ~n/64 docs and the hot-bucket guard engages (observed at the 10x scale
    * point: max bucket 12.5k vs cap 1k, 152k rows excluded). 48 bits / 4
    * bands = 4096 values per band — bucket occupancy drops 64x and the
    * banding survives another ~3 orders of magnitude of corpus growth.
    * DuckDB twin: [[Oracle.h48]].
    */
  def h48(c: Column): Column = conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Index-table suffixes a GeoMesa SFT materializes in Cassandra. The
    * reference manipulates these tables by name (it reads them out of the
    * catalog's `value` column — /root/reference/geomesa_cassandra.py:48-52);
    * we derive the same shape from the corpus.
    */
  val IndexSuffixes: Seq[String] = Seq("Z3", "Z2", "ID", "ATTR")

  /** GeoMesa-style catalog table `(sft string, value string)` (SURVEY §1 #2),
    * derived deterministically from `events.event_type`. Values carry
    * whitespace + upper-case noise so the trim/lower normalization of the
    * reference (/root/reference/geomesa.py:51) is observable, plus one
    * non-prefix metadata row per SFT so the prefix filter
    * (/root/reference/geomesa_cassandra.py:52) is observable.
    *
    * DuckDB twin: [[Oracle.catalogCte]].
    *
    * SOURCE SWITCH (VERDICT r8 #6): the reference's catalog scan is a live
    * CQL query (`/root/reference/geomesa.py:36-38`); this environment has
    * no Cassandra and no connector jar, so the default is the documented
    * corpus derivation above. `spark.graft.catalog.format` selects the
    * deployment path without code changes:
    *   - `derived` (default): the corpus derivation (oracle-testable),
    *   - `parquet`: read `(sft, value)` from `spark.graft.catalog.path`
    *     (a snapshotted catalog export — unit-tested branch),
    *   - any other value is a DataSource format name, e.g.
    *     `org.apache.spark.sql.cassandra` with
    *     `spark.graft.catalog.keyspace`/`spark.graft.catalog.table` — in a
    *     live deployment with the connector jar this IS the real
    *     CQL-backed scan, predicate pushdown included.
    * The memo key carries the format AND the branch-specific confs
    * (path / keyspace+table), so switching either mid-session never
    * serves a stale snapshot (ADVICE r9: a format-only key re-served the
    * previous path's read after a `spark.graft.catalog.path` change).
    */
  /** Memo-key suffix identifying the catalog SOURCE a session is reading:
    * format plus its branch-specific confs. Every derived table downstream
    * of [[catalog]] (schema tables, per-table command fixtures) carries it
    * too, so a mid-session source switch re-derives the whole lineage
    * instead of serving any stale layer (ADVICE r9).
    */
  private def catalogBranchKey(spark: SparkSession): String = {
    val fmt = spark.conf.get("spark.graft.catalog.format", "derived")
    fmt match {
      case "derived" => fmt
      case "parquet" =>
        s"$fmt@${spark.conf.get("spark.graft.catalog.path", "")}"
      case connector =>
        s"$connector@${spark.conf.get("spark.graft.catalog.keyspace", "geomesa")}" +
          s".${spark.conf.get("spark.graft.catalog.table", "catalog")}"
    }
  }

  def catalog(spark: SparkSession, sfDir: String): DataFrame = {
    val fmt = spark.conf.get("spark.graft.catalog.format", "derived")
    val branchKey = catalogBranchKey(spark)
    derived(spark, sfDir, s"catalog@$branchKey") {
      fmt match {
        case "derived" => catalogDerived(spark, sfDir)
        case "parquet" =>
          spark.read.parquet(spark.conf.get("spark.graft.catalog.path"))
            .select(col("sft").cast("string").as("sft"),
              col("value").cast("string").as("value"))
        case connector =>
          spark.read.format(connector)
            .option("keyspace",
              spark.conf.get("spark.graft.catalog.keyspace", "geomesa"))
            .option("table",
              spark.conf.get("spark.graft.catalog.table", "catalog"))
            .load()
            .select(col("sft").cast("string").as("sft"),
              col("value").cast("string").as("value"))
      }
    }
  }

  private def catalogDerived(spark: SparkSession, sfDir: String): DataFrame = {
      val sfts = events(spark, sfDir).select(col("event_type").as("sft")).distinct()
      val indexRows = sfts
        .select(col("sft"),
          explode(array(IndexSuffixes.map(lit): _*)).as("suffix"))
        .select(col("sft"),
          concat(lit("  CATALOG_"), upper(col("sft")), lit("_"), col("suffix"), lit("  "))
            .as("value"))
      val metaRows = sfts.select(col("sft"),
        concat(lit("metadata_"), col("sft")).as("value"))
      indexRows.unionAll(metaRows)
    }

  /** Node registry `(name, host, port, user, password)` (SURVEY §1 #1;
    * /root/reference/remotes.json.example), derived from `supplier`.
    * DuckDB twin: [[Oracle.registryCte]].
    */
  def registry(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, "registry") {
      supplier(spark, sfDir).select(
        col("s_name").as("name"),
        concat(lit("10.148.128."), (col("s_suppkey") % 250).cast("string")).as("host"),
        lit(22).as("port"),
        concat(lit("user_"), col("s_suppkey").cast("string")).as("user"),
        concat(lit("pw_"), col("s_suppkey").cast("string")).as("password"))
    }

  /** Lowercased index-table names for every SFT — what
    * `identify_schema_tables` yields (/root/reference/geomesa_cassandra.py:48-52).
    */
  def schemaTables(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, s"schema_tables@${catalogBranchKey(spark)}") {
      catalog(spark, sfDir)
        .select(col("sft"), lower(trim(col("value"))).as("table_name"))
        .where(col("table_name").startsWith("catalog"))
    }

  /** Per-(node, table) `nodetool compactionstats` data lines (SURVEY §1 #5
    * fixture). A deterministic subset of node × table pairs carries a
    * compaction, formatted exactly like the output the reference's regex
    * (/root/reference/node.py:111) parses.
    */
  def compactionLines(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = registry(spark, sfDir).select(col("name").as("node"))
    val tabs = schemaTables(spark, sfDir).select(col("table_name"))
    nodes.crossJoin(tabs)
      .where((h24(col("node")) + h24(col("table_name"))) % 3 === 0)
      .select(col("node"), col("table_name"),
        concat(lit("c"), ((h24(col("node")) + h24(col("table_name"))) % 100000).cast("string"),
          lit("-id   Compaction   ks1   "), col("table_name"),
          lit("   5123456   10234567   bytes   50.05%")).as("line"))
  }

  /** Per-node `nodetool compactionstats` stdout blobs: header + sorted data
    * lines, as one `CmdResult`-shaped row per node (SURVEY §1 #4).
    */
  def compactionStdout(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, s"compaction_stdout@${catalogBranchKey(spark)}") {
      compactionLines(spark, sfDir)
        .groupBy(col("node"))
        .agg(concat(lit("pending tasks: 2\n"),
          concat_ws("\n", array_sort(collect_list(col("line"))))).as("stdout"))
        .select(col("node"), lit("nodetool compactionstats").as("command"),
          col("stdout"), lit("").as("stderr"), lit(0).as("exit_status"))
    }

  /** Per-(node, table) `nodetool listsnapshots` lines, shaped for the
    * reference's snapshot regex (/root/reference/node.py:153).
    */
  def snapshotLines(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, s"snapshot_lines@${catalogBranchKey(spark)}") {
      val nodes = registry(spark, sfDir).select(col("name").as("node"))
      val tabs = schemaTables(spark, sfDir).select(col("table_name"))
      nodes.crossJoin(tabs)
        .where((h24(col("node")) + h24(col("table_name"))) % 2 === 0)
        .select(col("node"), col("table_name"),
          concat(lit("snap_"), (h24(col("table_name")) % 1000).cast("string"),
            lit("   ks1   "), col("table_name"),
            lit("   12.3 MB   45.6 MB")).as("line"))
    }

  /** `DESCRIBE ks.<table>` outcomes per schema table (SURVEY §1 #8): tables
    * whose h24 % 7 == 0 are "missing" (stderr carries `not found`,
    * /root/reference/geomesa_cassandra.py:58), the rest exist (stdout carries
    * `CREATE TABLE`, /root/reference/node.py:174-180).
    */
  def describeResults(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, s"describe_results@${catalogBranchKey(spark)}") {
      schemaTables(spark, sfDir).select(
      col("sft"), col("table_name"),
      when(h24(col("table_name")) % 7 === 0, lit(""))
        .otherwise(concat(lit("CREATE TABLE ks1."), col("table_name"), lit(" (...)")))
        .as("stdout"),
      when(h24(col("table_name")) % 7 === 0,
        concat(lit("'"), col("table_name"), lit("' not found in keyspace 'ks1'")))
        .otherwise(lit("")).as("stderr"))
    }

  /** Per-node `nodetool info` stdout (SURVEY §1 #7): nodes with odd suppkey
    * report all of Gossip/Thrift/Transport active (up per the liveness regex
    * /root/reference/node.py:50-53); even ones report Gossip inactive.
    */
  def infoResults(spark: SparkSession, sfDir: String): DataFrame =
    derived(spark, sfDir, "info_results") {
      supplier(spark, sfDir).select(
        col("s_name").as("node"),
        when(col("s_suppkey") % 2 === 1, lit(
          "ID : n\nGossip active : true\nThrift active : true\nNative Transport active : true\nLoad : 1 GiB"))
          .otherwise(lit(
            "ID : n\nGossip active : false\nThrift active : true\nNative Transport active : true\nLoad : 1 GiB"))
          .as("stdout"))
    }
}
