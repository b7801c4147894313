package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming family (SURVEY §2 X-ST + ST1 + S4): tumbling / sliding /
  * session windows, watermark semantics, and the level-split log sink.
  *
  * Each operator has a *batch-windowed* form (below — oracle-comparable,
  * identical semantics to the streaming plan) and a true Structured
  * Streaming form ([[streamingTumbling]]) exercised in tests via
  * MemoryStream. At scale the streaming forms carry state in the state
  * store keyed by (group, window) — the batch forms shuffle once on the
  * same key, so the plans are cost-equivalent per micro-batch.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event type (X-ST): `window()` groupBy —
    * the exact groupBy key Structured Streaming would use.
    */
  def tumblingCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes — each event lands in 2 windows. */
  def slidingCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count("*").as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user, 10-minute gap (X-ST session_window). */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Watermark semantics, batch form: events older than (max ts − 15 min)
    * are "late"; per-type on-time/late split — what
    * `withWatermark("ts", "15 minutes")` drops in a stream.
    */
  def watermarkSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val wm = ev.agg((max(col("ts")) - expr("INTERVAL 15 MINUTES")).as("wm"))
    ev.crossJoin(broadcast(wm))
      .groupBy(col("event_type"))
      .agg(count(when(col("ts") >= col("wm"), 1)).as("n_on_time"),
        count(when(col("ts") < col("wm"), 1)).as("n_late"))
  }

  /** S4 log sink read-side: the reference's dual-file logger
    * (/root/reference/remote.py:103-133) — INFO+ stream plus an ERROR-only
    * branch — as a level-tagged dataset filter.
    */
  def logRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("ts"), col("event_id"),
      when(col("event_type") === "error", lit("ERROR")).otherwise(lit("INFO"))
        .as("level"),
      concat(lit("event "), col("event_id").cast("string"), lit(" type="),
        col("event_type")).as("message"))

  def errorLogRows(spark: SparkSession, sfDir: String): DataFrame =
    logRows(spark, sfDir).where(col("level") === "ERROR")

  /** S4 effectful sink: write the full log and the error split — two
    * branches of one lineage, the batch analog of a `foreachBatch` dual
    * writer. Returns row counts (all, errors).
    */
  def writeLogSink(spark: SparkSession, sfDir: String, outDir: String): (Long, Long) = {
    val rows = logRows(spark, sfDir).cache()
    try {
      rows.write.mode("overwrite").parquet(s"$outDir/log_all")
      rows.where(col("level") === "ERROR").write.mode("overwrite")
        .parquet(s"$outDir/log_error")
      (rows.count(), rows.where(col("level") === "ERROR").count())
    } finally rows.unpersist() // don't hold blocks past the sink's actions
  }

  /** True Structured Streaming tumbling aggregation with watermark — the
    * streaming twin of [[tumblingCounts]]; fed by MemoryStream in tests.
    */
  def streamingTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "15 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** True Structured Streaming session windows with watermark — the
    * streaming twin of [[sessionCounts]]. Unlike fixed windows, session
    * state MERGES: an event can bridge two open sessions into one, so the
    * state store keeps per-(user, open-session) entries and the watermark
    * is what closes them — a session emits (append mode) only once the
    * watermark passes its end, i.e. no event can extend it any more. That
    * same watermark bounds state size at scale: closed sessions leave the
    * store, so state is proportional to concurrently-open sessions, not to
    * history.
    */
  def streamingSession(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "15 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count("*").as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-stream interval join — the streaming twin of
    * [[graft.operators.RelationalOps.clicksBeforeError]]: pair each error
    * with the same user's clicks from the preceding 10 minutes, as two
    * watermarked streams joined on user + a time-range condition. The
    * watermarks bound both join states: a click older than 20 minutes can
    * no longer match any future error (10-minute range + 10-minute
    * out-of-orderness), so the state store evicts it — the property that
    * keeps an unbounded two-stream join feasible. Append-mode rows emit
    * once the watermark passes the range's upper bound.
    */
  def streamingClicksBeforeErrors(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val e = errors.withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("user_id"), col("ts"))
    e.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"))
  }

  /** Stream-static enrichment join: attach a static dimension (user →
    * segment) to the event stream. The static side is broadcast into every
    * micro-batch; stream-static inner joins are STATELESS by construction —
    * no watermark, no state store, nothing to evict. At scale this is the
    * pattern for decorating a firehose with slowly-changing dimensions
    * without ever shuffling the stream side.
    */
  def streamingEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("segment"))

  /** `foreachBatch` sink: land each micro-batch as an append to a parquet
    * dir, stamped with its batch id. This is the general-purpose escape
    * hatch for sinks Structured Streaming lacks natively (JDBC upserts,
    * multi-table writes) — the batch handle is a full DataFrame, so any
    * batch op (dedup against the target, merge keys, repartition by
    * layout) runs per micro-batch with exactly-once effects deriving from
    * the checkpointed batch id (idempotent overwrite-by-batch at scale;
    * plain append here).
    */
  def foreachBatchParquetSink(stream: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()

  /** Streaming incremental aggregate maintenance — the ingest-time twin of
    * [[graft.operators.ScaleOps.incrementalMonthlyOrders]] (X-P11): each
    * micro-batch folds its orders into per-month PARTIALS (count +
    * decimal sum — algebraic, so partial ⊕ partial ≡ total exactly) and
    * lands them under `batch_id=<id>` with dynamic partition OVERWRITE:
    * a replayed batch rewrites ITS OWN partition instead of double-counting,
    * which is the exactly-once contract foreachBatch leaves to the sink.
    * Readers merge |months × batches| partial rows ([[readIncrementalMonthly]])
    * — never the fact stream. At 100 TB this is the always-on materialized
    * view: the corpus is aggregated once, and each arriving batch costs its
    * own size plus a rows-not-facts merge at read time (compact partials
    * periodically if batch count grows unbounded).
    */
  def streamingIncrementalMonthly(orders: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    orders.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n_part"),
            sum(col("o_totalprice").cast("decimal(12,2)")).as("total_part"))
          .withColumn("batch_id", lit(id))
          .write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
      }
      .start()

  /** Merge the staged partials into the monthly view — the read side of
    * [[streamingIncrementalMonthly]]; same decimal-exact merge as the batch
    * form.
    */
  def readIncrementalMonthly(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("month"))
      .agg(sum(col("n_part")).as("n_orders"),
        sum(col("total_part")).cast("double").as("total"))

  /** Streaming exact dedup — the ingest-time form of
    * [[graft.operators.DedupOps.exactDedup]]: drop any row whose content
    * hash was already seen within the watermark horizon. State is one entry
    * per distinct hash inside the horizon (bounded — expired keys are
    * evicted as the watermark advances), which is what makes continuous
    * dedup of an unbounded training-data firehose feasible: the batch job
    * dedups the corpus once; this keeps it deduped as it grows.
    */
  def streamingDedup(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "15 minutes")
      .dropDuplicatesWithinWatermark(Seq("text_hash"))

  /** One liveness probe observation for a node (ST1 input). */
  case class Probe(node: String, is_up: Boolean)
  /** Poll progress carried between micro-batches. */
  case class PollState(attempts: Int)
  /** Terminal poll outcome: status ∈ {up, timeout}. */
  case class PollResult(node: String, status: String, attempts: Int)

  /** ST1, true streaming form: the reference's restart poll — probe every
    * 2 s until up, give up after 300 s (/root/reference/node.py:57-65) — as
    * `flatMapGroupsWithState` keyed by node with a processing-time timeout.
    * Each micro-batch of probes increments per-node state; the first up
    * probe emits a terminal `up` row and clears state; a node whose probes
    * stay down long enough for the timeout to fire emits `timeout` — exactly
    * the reference's TimeoutError, as a row. The batch analog
    * (`st1_restart_poll`, LifecycleOps) stays the oracle entry; this is the
    * production-shaped twin (state store keyed by node, scales with fleet
    * size, no driver-side loop).
    */
  def pollUntilUp(probes: org.apache.spark.sql.Dataset[Probe],
                  timeoutMs: Long = 300000L): org.apache.spark.sql.Dataset[PollResult] = {
    import probes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    probes.groupByKey(_.node).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (node: String, it: Iterator[Probe], state: GroupState[PollState]) =>
        if (state.hasTimedOut) {
          val n = state.getOption.map(_.attempts).getOrElse(0)
          state.remove()
          Iterator(PollResult(node, "timeout", n))
        } else {
          val batch = it.toSeq
          val attempts = state.getOption.map(_.attempts).getOrElse(0) + batch.size
          if (batch.exists(_.is_up)) {
            state.remove()
            Iterator(PollResult(node, "up", attempts))
          } else {
            state.update(PollState(attempts))
            state.setTimeoutDuration(timeoutMs)
            Iterator.empty
          }
        }
    }
  }

  /** Streaming heavy hitters — [[graft.functions.FrequencyAgg]] composed
    * with a watermarked tumbling window: per hour, the Misra–Gries candidate
    * set of keys carrying more than ~1/capacity of that window's stream.
    * The sketch is a standard mergeable Aggregator, so Structured Streaming
    * treats it like any aggregate — partial sketches merge across
    * micro-batches in the state store, and state per (window) is ≤capacity
    * counters no matter how many distinct keys the hour saw. That bounded
    * state is the whole point: an exact per-key streaming count would hold
    * every key ever seen inside the watermark. Append mode emits each
    * window's final candidates once the watermark closes it. The batch twin
    * with the exact confirm pass (`xa_heavy_hitters`) is the oracle-backed
    * form; the spec checks the streaming candidates cover the true heavy
    * keys of each window.
    */
  def streamingHeavyKeys(events: DataFrame, capacity: Int = 64): DataFrame = {
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.FrequencyAgg(capacity))
    events
      .withWatermark("ts", "15 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg(col("user_id")).as("candidate_keys"))
      .select(col("window.start").as("window_start"), col("candidate_keys"))
  }

  /** One arriving order for the streaming priority sample. */
  case class OrderArrival(o_orderkey: Long, o_orderpriority: String,
                          o_totalprice: Double)
  /** A sample-membership delta: a row entered (`admit`) or left (`evict`)
    * the current top-k of its segment.
    */
  case class SampleChange(segment: String, o_orderkey: Long,
                          priority: Double, change: String)
  /** Per-segment sample carried between micro-batches: the current top-k
    * (priority, key, weight) triples — k rows of state, never more.
    */
  case class SampleHeap(items: List[(Double, Long, Double)])

  /** Streaming priority sample — the ingest-time twin of
    * [[graft.operators.RelationalOps.prioritySample]], keyed by order
    * priority class: maintain each segment's current top-k by the SAME
    * deterministic hash priority q = w·2^24/(h24+1) and emit membership
    * DELTAS (admit/evict) the moment they happen. Append mode stays honest
    * because the final sample is exactly `admits − evicts`, replayable from
    * the log. State is k triples per segment REGARDLESS of stream length —
    * the bounded-state property that makes a weighted sample maintainable
    * on a firehose; and because the priority is a pure row function, the
    * sample is resume/replay-correct: re-sorting any superset of arrivals
    * reproduces it (the same min-wise mergeability the batch twin's
    * shard-union relies on). Rows that never beat the current k-th priority
    * emit nothing and leave no state.
    */
  def streamingPrioritySample(orders: org.apache.spark.sql.Dataset[OrderArrival],
      k: Int = 10): org.apache.spark.sql.Dataset[SampleChange] = {
    import orders.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    orders.groupByKey(_.o_orderpriority).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (seg: String, it: Iterator[OrderArrival], state: GroupState[SampleHeap]) =>
        val prev = state.getOption.map(_.items).getOrElse(Nil)
        val arrivals = it.map { o =>
          val q = o.o_totalprice * 16777216.0 /
            (graft.functions.MinHashAgg.h24(s"ps:${o.o_orderkey}") + 1)
          (q, o.o_orderkey, o.o_totalprice)
        }.toList
        val next = (prev ++ arrivals)
          .distinctBy(_._2) // keys are unique per order; state wins on replay
          .sortBy { case (q, key, _) => (-q, key) }
          .take(k)
        val prevKeys = prev.map(_._2).toSet
        val nextKeys = next.map(_._2).toSet
        val admits = next.collect { case (q, key, _) if !prevKeys.contains(key) =>
          SampleChange(seg, key, q, "admit") }
        val evicts = prev.collect { case (q, key, _) if !nextKeys.contains(key) =>
          SampleChange(seg, key, q, "evict") }
        state.update(SampleHeap(next))
        (admits ++ evicts).iterator
    }
  }

  /** One user event for the streaming SCD2 build. */
  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                       event_type: String)
  /** Open interval carried between micro-batches: the user's current state,
    * when it began, and the max event time already folded in (the late-event
    * watermark for this user).
    */
  case class Scd2Open(state: String, validFromMs: Long, maxSeenMs: Long)
  /** A closed validity interval (the open/current one stays in state). */
  case class Scd2Closed(user_id: Long, state: String,
                        valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Streaming nearest-centroid assignment — the inference-time twin of
    * [[graft.operators.SimilarityOps.kmeansAssignments]]: score each
    * arriving embedding against the trained centroids and emit its cluster.
    * The model is collected once (model-sized: k×64 doubles — the
    * broadcast-literal shape) and embedded into a STATELESS projection:
    * per row, k codegen'd `VecDot` distances fold into an `array_min`
    * argmin — no state store, no watermark, no shuffle, which is what makes
    * model-scoring on a firehose embarrassingly parallel. Arithmetic
    * parity with the batch assignment is exact: the driver-side fold for
    * ‖c‖² adds left-to-right like `VecDot`, distances round to 6 decimals
    * before the argmin, and ties break on k — so every vector lands in the
    * same cluster the batch trainer put it in (spec-checked by corpus
    * replay).
    */
  def streamingClusterAssign(stream: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    val cents: Array[(Long, Array[Double])] = centroids
      .select(col("k"), transform(col("centroid"), x => x.cast("double")).as("cd"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val e = col("embedding")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.vecDot(spark, a, b)
    val entries = cents.map { case (k, cd) =>
      val cc = cd.foldLeft(0.0)((a, x) => a + x * x)
      val cArr = array(cd.toSeq.map(lit): _*)
      struct(round(dot(e, e) + lit(cc) - lit(2) * dot(e, cArr), 6).as("d2"),
        lit(k).as("k"))
    }
    stream.withColumn("m", array_min(array(entries.toSeq: _*)))
      .select(col("vec_id"), col("m.k").as("k"))
  }

  /** A funnel stage-crossing emitted the moment a user advances. */
  case class FunnelAdvance(user_id: Long, stage: String, ts: java.sql.Timestamp)
  /** Per-user funnel progress carried between micro-batches: stage reached
    * (0–3) and the event time of the last advance, in microseconds.
    */
  case class FunnelProgress(stage: Int, lastAdvanceUs: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Streaming sequential funnel — the ingest-time twin of
    * [[graft.operators.TimeSeriesOps.funnelSteps]]: advance each user's
    * view→click→purchase stage machine as events arrive and emit a row at
    * every crossing. Same in-order-per-user delivery contract as
    * [[streamingScd2]] (in-batch order restored by an explicit sort); with
    * in-order input the first view IS the earliest view, so the strictly-
    * after comparisons reproduce the batch semantics exactly — comparisons
    * run at microsecond precision because the batch twin compares full
    * timestamps. State is one (int, long) per user who ever entered the
    * funnel; a completed funnel keeps a terminal stage-3 tombstone — without
    * it a user's LATER view would re-enter stage 0 and double-count, which
    * the corpus-replay spec checks against the batch counts. (An
    * unbounded-retention funnel is the batch semantic; a production stream
    * would bound state by scoping the funnel to a session/day window and
    * evicting via an event-time timeout at window close.)
    */
  def streamingFunnel(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[UserEvent], state: GroupState[FunnelProgress]) =>
        val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var cur = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
        val out = Seq.newBuilder[FunnelAdvance]
        sorted.foreach { e =>
          val crossed = (cur.stage, e.event_type) match {
            case (0, "view") => true
            case (1, "click") if micros(e.ts) > cur.lastAdvanceUs => true
            case (2, "purchase") if micros(e.ts) > cur.lastAdvanceUs => true
            case _ => false
          }
          if (crossed) {
            cur = FunnelProgress(cur.stage + 1, micros(e.ts))
            out += FunnelAdvance(uid, e.event_type, e.ts)
          }
        }
        if (cur.stage > 0) state.update(cur)
        out.result().iterator
    }
  }

  /** Streaming SCD2 build — the ingest-time twin of
    * [[graft.operators.TimeSeriesOps.scd2UserState]]: maintain each user's
    * open state interval in the state store and emit an interval row the
    * moment a state CHANGE closes it. State is one (string, long) per user
    * regardless of history length; closed intervals append exactly once.
    * Append mode can only ever emit closed intervals — the open one lives
    * in state until its closing event arrives, which is the semantically
    * honest streaming rendering of "is_current" (the batch twin, which sees
    * the whole corpus, materializes it as `valid_to IS NULL`).
    *
    * In-batch ordering is restored by an explicit (ts, event_id) sort of
    * the group's iterator; ACROSS batches events are expected in order per
    * user (the kafka-partition-by-key delivery contract). Out-of-contract
    * input is GUARDED, not silently folded in: each user's state carries
    * the max event time already applied, a cross-batch event older than
    * that is dropped, and the drop is counted in the `lateEvents`
    * accumulator — late data becomes an observable metric instead of
    * overlapping or out-of-order interval history. (A reordering buffer
    * would need an event-time timeout + per-user heap; the contract here
    * is the same one the batch twin's global sort enforces.)
    */
  def streamingScd2(events: org.apache.spark.sql.Dataset[UserEvent],
                    lateEvents: Option[org.apache.spark.util.LongAccumulator] = None)
      : org.apache.spark.sql.Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[UserEvent], state: GroupState[Scd2Open]) =>
        val seen = state.getOption.map(_.maxSeenMs).getOrElse(Long.MinValue)
        val (onTime, late) = it.toSeq.partition(_.ts.getTime >= seen)
        lateEvents.foreach(_.add(late.size))
        val sorted = onTime.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[Scd2Closed]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(open) if open.state != e.event_type =>
              out += Scd2Closed(uid, open.state,
                new java.sql.Timestamp(open.validFromMs), e.ts)
              cur = Some(Scd2Open(e.event_type, e.ts.getTime, e.ts.getTime))
            case Some(open) => // same state: the open interval extends
              cur = Some(open.copy(maxSeenMs = e.ts.getTime))
            case None =>
              cur = Some(Scd2Open(e.event_type, e.ts.getTime, e.ts.getTime))
          }
        }
        cur.foreach(state.update)
        out.result().iterator
    }
  }

  /** One arriving day of the pre-aggregated revenue series. */
  case class DayRevenue(series: String, day: java.sql.Date, revenue: Double)
  /** The smoother's output: one EWMA point per arriving day. */
  case class EwmaPoint(series: String, day: java.sql.Date, revenue: Double,
                       kernel_days: Int, ewma: Double)
  /** State carried between micro-batches: the trailing ≤EwmaWindow
    * (epochDay, revenue) points — bounded REGARDLESS of stream length. */
  case class EwmaTail(recent: List[(Long, Double)])

  /** Streaming EWMA — the online twin of
    * [[graft.operators.TimeSeriesOps.ewmaDaily]]: the causal smoother
    * replayed as a monitor, consuming the pre-aggregated daily series
    * (the shape a production pipeline streams — the fact-to-day collapse
    * happens upstream) keyed by series name. Instead of the infinite
    * recurrence α·x + (1−α)·prev (whose kernel never truncates and
    * diverges from the batch op on gapped days), state carries the
    * trailing ≤[[graft.operators.TimeSeriesOps.EwmaWindow]] calendar days
    * and each arriving day re-evaluates the SAME truncated convolution —
    * so an in-order replay reproduces the batch table value-for-value
    * (spec-asserted), gaps and all, with bounded state per series. Days
    * arriving out of order beyond the window are dropped by the window
    * filter rather than corrupting emitted history (append-mode honesty:
    * emitted points never revise).
    */
  def streamingEwma(daily: org.apache.spark.sql.Dataset[DayRevenue])
      : org.apache.spark.sql.Dataset[EwmaPoint] = {
    import daily.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.TimeSeriesOps.{EwmaKernel, EwmaWindow}
    daily.groupByKey(_.series).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (series: String, it: Iterator[DayRevenue], state: GroupState[EwmaTail]) =>
        var recent = state.getOption.map(_.recent).getOrElse(Nil)
        val out = it.toSeq.sortBy(_.day.getTime).map { d =>
          val epochDay = d.day.toLocalDate.toEpochDay
          val withCur = (epochDay, d.revenue) :: recent
          // the current day's kernel sees only its own past — computed
          // BEFORE trimming, so even a beyond-window-late day still sees
          // itself and emits its own partial kernel. Same 12-dp-quantized
          // decimal kernel + exact decimal sum as the batch op (the r8
          // determinism fix, TimeSeriesOps.EwmaKernel): the arriving
          // revenue is a ≤2-dp decimal that round-trips its double, so
          // BigDecimal.decimal recovers the batch op's exact operand and
          // the 6-dp emission matches the batch table bit-for-bit
          val terms = withCur.collect {
            case (e, r) if epochDay - e >= 0 && epochDay - e < EwmaWindow =>
              BigDecimal(EwmaKernel((epochDay - e).toInt)) * BigDecimal.decimal(r)
          }
          // trim relative to the NEWEST day seen (a late older day must
          // not evict newer state), keeping the tail bounded at EwmaWindow
          val maxEpoch = withCur.map(_._1).max
          recent = withCur.filter { case (e, _) => maxEpoch - e < EwmaWindow }
          EwmaPoint(series, d.day, d.revenue, terms.size,
            terms.foldLeft(BigDecimal(0))(_ + _)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        state.update(EwmaTail(recent))
        out.iterator
    }
  }

  /** Streaming incremental dedup — the ingest-time twin of
    * [[graft.operators.DedupOps.incrementalDedupTx]] (X-P27 ⋈ X-M2 ⋈
    * X-ST): documents arrive as a stream and are deduped, ON ARRIVAL,
    * against the PERSISTED MinHash index (the TxTable snapshot at v0 —
    * the same stored table the batch run reads). Entirely STATELESS:
    *
    *  - the arriving row's MinHash signature and band keys are NARROW
    *    per-row expressions (min over the distinct-shingle array of the
    *    salted h24 family — identical arithmetic to the batch
    *    signature's groupBy form, since min is order-free);
    *  - candidate retrieval is [[graft.operators.DedupOps.NumBands]]
    *    stream-static LEFT joins, one per band, against the index
    *    pre-grouped into (band_key → doc list) buckets; the per-row
    *    `array_distinct` of the concatenated hit lists collapses
    *    multi-band collisions WITHOUT a streaming `distinct()` (which
    *    would need state), so each (batch, index) pair emits exactly
    *    once — the batch plan's post-join distinct, done per arrival;
    *  - exact verification is one more stream-static join to the index
    *    docsets plus the codegen'd sorted-intersection expression per
    *    pair — no aggregation, so no watermark and `append` mode.
    *
    * The index side carries the hot-bucket guard (computable statically);
    * the batch side's guard is a whole-batch protection a per-arrival
    * stream has no analog for — per-arrival fan-out is already bounded by
    * the guarded index buckets. At every shipped SF no bucket nears the
    * cap, so the corpus replay reproduces [[graft.operators.DedupOps
    * .incrementalDedup]]'s result set EXACTLY (spec-checked).
    */
  def streamingIncrementalDedup(docs: DataFrame, sfDir: String,
                                indexRoot: Option[String] = None): DataFrame = {
    import graft.functions.TextFunctions
    import graft.operators.DedupOps
    val spark = docs.sparkSession
    // ---- static sides: the persisted index, read through the commit log.
    // The v0 file list resolves ONCE at plan construction; later commits —
    // including a compaction rewriting the whole layout — cannot disturb a
    // running stream, because old versions' files stay on disk until
    // vacuum. That reader isolation under layout churn is spec-pinned
    // (StreamingSpec compacts mid-stream). `indexRoot` overrides the
    // staged table for such isolation tests.
    val idxBands = graft.sources.TxTable
      .read(spark, indexRoot.getOrElse(DedupOps.minhashIndexTx(spark, sfDir)),
        asOf = Some(0L))
    val guarded = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_no"), col("band_key"))
      idxBands.withColumn("bucket_n", count(lit(1)).over(w))
        .where(col("bucket_n") <= DedupOps.MaxBucketDocs)
        .drop("bucket_n")
    }
    val idxBuckets = (1 to DedupOps.NumBands).map { b =>
      guarded.where(col("band_no") === b)
        .groupBy(col("band_key").as(s"bk$b"))
        .agg(sort_array(collect_list(col("doc_id"))).as(s"hits$b"))
    }
    val idxSets = DedupOps.distinctShingles(spark, sfDir)
      .join(idxBands.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("shingle"))).as("gs_i"),
        count(lit(1)).as("n_index"))
      .select(col("doc_id").as("index_doc"), col("gs_i"), col("n_index"))
    // ---- per-arrival narrow pipeline: shingles → signature → band keys
    val sh = array_distinct(TextFunctions.shingles3OfWords(
      TextFunctions.words(col("text"))))
    val mh = (1 to DedupOps.NumHashes).map { j =>
      array_min(transform(col("gs"), s =>
        Tables.h24(concat(lit(s"$j:"), s)))).as(s"mh$j")
    }
    val withSig = docs
      .select(col("doc_id").as("batch_doc"), sort_array(sh).as("gs"))
      .where(size(col("gs")) > 0) // no shingles → no signature, as in batch
      .select(col("batch_doc") +: col("gs") +:
        size(col("gs")).cast("long").as("n_batch") +: mh: _*)
    val keyed = withSig.select(Seq(col("batch_doc"), col("gs"), col("n_batch")) ++
      (1 to DedupOps.NumBands).map(b => md5(concat_ws("_",
        col(s"mh${2 * b - 1}"), col(s"mh${2 * b}"))).as(s"bk$b")): _*)
    val withBands = (1 to DedupOps.NumBands).foldLeft(keyed) {
      (df, b) => df.join(idxBuckets(b - 1), Seq(s"bk$b"), "left")
    }
    val cands = withBands
      .select(col("batch_doc"), col("gs"), col("n_batch"),
        array_distinct(concat((1 to DedupOps.NumBands).map(b =>
          coalesce(col(s"hits$b"),
            array().cast("array<long>"))): _*)).as("cand"))
      .select(col("batch_doc"), col("gs"), col("n_batch"),
        explode(col("cand")).as("index_doc"))
    cands.join(idxSets, Seq("index_doc"))
      .select(col("batch_doc"), col("index_doc"),
        graft.functions.SetExpressions
          .sortedIntersectN(spark, col("gs"), col("gs_i")).as("n_inter"),
        col("n_batch"), col("n_index"))
      .where(col("n_inter") * 3 >= col("n_batch") + col("n_index"))
      .select(col("batch_doc"), col("index_doc"), col("n_inter"),
        col("n_batch"), col("n_index"),
        (col("n_inter").cast("double") /
          (col("n_batch") + col("n_index") - col("n_inter"))).as("jaccard"))
  }

  /** EXACTLY-ONCE streaming sink into a [[graft.sources.TxTable]] — the
    * write-side twin of [[graft.operators.AcidOps.txnSinkState]]: pass the
    * returned function to `writeStream.foreachBatch`. Structured
    * Streaming's foreachBatch contract is AT-LEAST-ONCE — after a sink
    * crash the restarted query REDELIVERS the last batch with the same
    * batchId — so the sink routes every batch through [[graft.sources
    * .TxTable.appendOnce]] with `(appId, batchId)` txn identity: the replay
    * finds its id already committed and no-ops, upgrading the pipeline to
    * exactly-once without any sink-side dedup state (the commit log IS the
    * state, and it survives restarts because it is the table). Spec-pinned:
    * a redelivered batch leaves the row set byte-identical and adds no
    * version.
    */
  def exactlyOnceSink(root: String, appId: String,
                      bloomCols: Seq[String] = Nil)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.sources.TxTable.appendOnce(
      batch.sparkSession, root, batch, appId, batchId, bloomCols): Unit
  }

  /** A TxTable's CHANGE FEED as a streaming DataFrame (r12) — the read
    * half of the CDC loop whose write half is [[exactlyOnceSink]]: table
    * versions are the offsets (the commit log is the write-ahead log), so
    * each micro-batch carries exactly the row-level changes of the
    * versions committed since the last batch, with `_change_type` and
    * `_commit_version` columns. Chain the two and mutations flow
    * table → feed → transform → exactly-once table with end-to-end
    * exactly-once semantics and no snapshot diffing anywhere.
    */
  def changeFeedStream(spark: SparkSession, root: String,
                       startVersion: Long = 0L,
                       maxVersionsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("graft-tx-changes")
      .option("root", root)
      .option("startVersion", startVersion.toString)
    maxVersionsPerTrigger.fold(r)(m =>
      r.option("maxVersionsPerTrigger", m.toString)).load()
  }
}
