package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STREAMING CHANGE FEED over a [[TxTable]] commit log (r12) — the Delta
  * `readChangeFeed` streaming mode, re-expressed as a Structured Streaming
  * V1 `Source` (the DeltaSource/FileStreamSource shape: the commit log IS
  * the write-ahead log, so offsets are simply table VERSIONS):
  *
  * {{{
  * spark.readStream.format("graft-tx-changes")
  *   .option("root", tableRoot).option("startVersion", "0")
  *   .option("maxVersionsPerTrigger", "100") // page a long backlog
  *   .load()
  * }}}
  *
  * Each micro-batch is `readChanges(lastSeen+1, latest)` — row-level
  * changes with `_change_type` / `_commit_version` — so any Structured
  * Streaming program (windowed aggregates, `foreachBatch` into a
  * downstream index, another TxTable via the exactly-once sink) consumes
  * mutations incrementally with NO snapshot diffing and NO sink-side
  * polling loop. Offsets serialize as the version number, so checkpoint
  * recovery resumes exactly after the last committed batch; compaction
  * commits contribute empty batches (layout surgery is not a change);
  * a pre-CDF mutation in the consumed range fails loudly (readChanges'
  * contract), never silently drops a mutation.
  *
  * The batch DataFrame is computed by the ordinary batch reader and
  * wrapped streaming via `internalCreateDataFrame` — columns are aligned
  * to the source's FIXED schema (the table schema at source creation +
  * the two feed columns), with batches that predate a schema evolution
  * surfacing NULL for columns they lack.
  */
class TxChangesSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-tx-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxChangesSource.schemaFor(ctx.sparkSession,
      TxChangesSource.rootOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new TxChangesSource(ctx.sparkSession, TxChangesSource.rootOf(parameters),
      parameters.get("startVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxVersionsPerTrigger").map { v =>
        val n = v.toLong
        require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
        n
      })
}

object TxChangesSource {
  private[sources] def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("root",
      throw new IllegalArgumentException("graft-tx-changes needs option root=<table dir>"))

  /** The feed's fixed schema: the table schema as of source creation plus
    * `_change_type` and `_commit_version`. Pre-schema logs fall back to a
    * live file's footer (same rule as the batch reader). The footer read
    * goes through the PROVIDER'S session, not `SparkSession.active`
    * (ADVICE r12) — in a multi-session deployment the active session can
    * be a different one with different conf/catalog state. */
  private[sources] def schemaFor(spark: SparkSession, root: String): StructType =
    tableSchemaFor(spark, root)
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)

  /** The TABLE schema half of [[schemaFor]] — also the fixed schema of
    * the r15 table stream ([[TxStreamSource]]), which carries no feed
    * columns. */
  private[sources] def tableSchemaFor(spark: SparkSession, root: String): StructType = {
    // the snapshot too threads the provider's session (ADVICE r13): a
    // checkpoint-accelerated snapshot can run a distributed parquet read,
    // which must land on THIS session, not whichever is `active`
    val s = TxTable.snapshot(spark, root, None)
    s.schemaJson.map(TxTable.schemaOf).getOrElse {
      val f = s.liveFiles.headOption.getOrElse(
        throw new IllegalStateException(s"empty tx table at $root"))
      spark.read.parquet(s"$root/data/$f").schema
    }
  }
}

class TxChangesSource(spark: SparkSession, root: String, startVersion: Long,
                      maxVersionsPerTrigger: Option[Long] = None)
    extends Source {

  private val schema0 = TxChangesSource.schemaFor(spark, root)

  override def schema: StructType = schema0

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  /** Highest version already HANDED OUT as a batch end (advanced in
    * [[getBatch]], including checkpoint-recovery replays) — the base the
    * rate limit counts from. The DeltaSource `maxFilesPerTrigger` shape
    * (VERDICT r12 #5): without it, a late subscriber over a long history
    * gets the whole backlog as ONE micro-batch. */
  @volatile private var handedOut: Long = startVersion - 1L

  override def getOffset: Option[Offset] = {
    val v = TxTable.snapshot(spark, root, None).version
    if (v < startVersion) None
    else {
      // page through the backlog: at most maxVersionsPerTrigger versions
      // beyond what getBatch has already served (unbounded when unset)
      val capped = maxVersionsPerTrigger
        .fold(v)(m => math.min(v, math.max(handedOut, startVersion - 1L) + m))
      if (capped < startVersion) None else Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver(_) + 1).getOrElse(startVersion)
    val to = ver(end)
    // rate-limit base: covers normal progress AND checkpoint recovery
    // (the first getBatch replays the last committed range)
    if (to > handedOut) handedOut = to
    val batch =
      if (from > to)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema0)
      else {
        val df = TxTable.readChanges(spark, root, from, Some(to))
        // a MID-STREAM schema evolution surfaces as batch columns beyond
        // the source's fixed schema: FAIL (the Delta stream-restart
        // contract) — silently projecting the new column away would feed
        // every downstream consumer a feed that never mentions it
        val extra = df.columns.toSet -- schema0.fieldNames.toSet
        if (extra.nonEmpty)
          throw new IllegalStateException(
            s"graft-tx-changes: table at $root evolved mid-stream " +
              s"(new columns ${extra.mkString(", ")}); restart the stream " +
              "to adopt the new schema")
        // align to the fixed source schema: a batch predating a schema
        // evolution lacks the later columns — surface NULL for them
        df.select(schema0.fields.map { f =>
          if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toSeq: _*)
      }
    org.apache.spark.sql.GraftBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema0)
  }

  override def stop(): Unit = ()
}
