package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** STREAMING SOURCE over a [[TxTable]] ITSELF (r15 — the Delta streaming
  * source shape, completing the registered streaming story: the change
  * FEED was [[TxChangesSource]], this streams the TABLE):
  *
  * {{{
  * spark.readStream.format("graft-tx").load(tableRoot)       // snapshot + appends
  *   .option("startingVersion", "3")   // skip the snapshot: appends ≥ 3
  *   .option("maxVersionsPerTrigger", "100")  // page the version backlog
  * }}}
  *
  * The FIRST micro-batch is the full snapshot as of source start (one
  * batch — the Delta initial-snapshot move), and every later batch is the
  * rows APPENDED by the commits it covers, read from their data files
  * (appends pay no change capture, so this is the cheapest possible
  * tail). Offsets are table versions, exactly like the feed source, so
  * checkpoint recovery resumes after the last committed batch.
  *
  * CONTRACT ON MUTATIONS: a commit that REMOVES files or commits deletion
  * vectors inside the consumed range FAILS the stream loudly — an
  * append-only consumer fed from a mutating table would silently miss
  * the deletes/updates (consume `graft-tx-changes` for row-level change
  * semantics; Delta's source likewise fails without
  * ignoreChanges/ignoreDeletes). Layout-only commits (compaction,
  * `dataChange: false` — and metadata-only schema commits) contribute
  * NOTHING: re-emitting compacted files would duplicate every row. A
  * mid-stream schema evolution that ADDS columns beyond the source's
  * fixed schema fails with the restart message (the feed source's rule);
  * batches predating an evolution NULL-fill.
  */
class TxStreamSource(spark: SparkSession, root: String,
                     startingVersion: Option[Long],
                     maxVersionsPerTrigger: Option[Long] = None)
    extends Source {

  /** The snapshot the stream opens on: its version is the first batch's
    * END (inclusive); `startingVersion` replaces the snapshot with
    * "appends from this version on" (the Delta spelling). */
  private val startSnapshot = TxTable.snapshot(spark, root, None)
  private val firstVersion: Long = startingVersion.getOrElse {
    if (startSnapshot.version < 0)
      throw new IllegalArgumentException(s"no tx table at $root")
    startSnapshot.version
  }
  private val initialSnapshot = startingVersion.isEmpty

  private val schema0: StructType = TxChangesSource.tableSchemaFor(spark, root)

  override def schema: StructType = schema0

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  /** Highest version already handed out as a batch end — the rate-limit
    * base (the feed source's `maxVersionsPerTrigger` shape). */
  @volatile private var handedOut: Long = firstVersion - 1L

  override def getOffset: Option[Offset] = {
    val v = TxTable.snapshot(spark, root, None).version
    if (v < firstVersion) None
    else {
      val capped = maxVersionsPerTrigger
        .fold(v)(m => math.min(v, math.max(handedOut, firstVersion - 1L) + m))
      if (capped < firstVersion) None else Some(LongOffset(capped))
    }
  }

  /** Rows appended by commits in [from, to]: add-only commits read from
    * their data files; mutation commits FAIL; layout/metadata-only
    * commits contribute nothing. */
  private def appendedRows(from: Long, to: Long): Option[DataFrame] = {
    val range = TxTable.commits(root)
      .filter(c => c.version >= from && c.version <= to)
    range.foreach { c =>
      if (c.dataChange && (c.removes.nonEmpty || c.dvs.nonEmpty))
        throw new IllegalStateException(
          s"graft-tx stream: version ${c.version} (op ${c.op}) of $root " +
            "mutates existing rows — an append-only table stream cannot " +
            "represent it; consume format graft-tx-changes for row-level " +
            "change semantics")
    }
    val files = range.filter(_.dataChange).flatMap(_.adds)
    if (files.isEmpty) None
    else Some(spark.read.schema(schema0)
      .parquet(files.map(f => s"$root/data/$f"): _*))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = ver(end)
    if (to > handedOut) handedOut = to
    // mid-stream evolution beyond the fixed schema: fail with the
    // restart contract (checked on the LOG's recorded schema — cheaper
    // and sooner than a per-batch column diff)
    TxTable.snapshot(spark, root, Some(to)).schemaJson
      .map(TxTable.schemaOf).foreach { live =>
        val extra = live.fieldNames.toSet -- schema0.fieldNames.toSet
        if (extra.nonEmpty)
          throw new IllegalStateException(
            s"graft-tx stream: table at $root evolved mid-stream (new " +
              s"columns ${extra.mkString(", ")}); restart the stream to " +
              "adopt the new schema")
      }
    val tail = start match {
      case Some(s) => appendedRows(ver(s) + 1, to)
      case None if initialSnapshot =>
        // first batch: the opening snapshot (its version ≤ to by
        // construction) plus any appends that landed before the first
        // trigger fired. The snapshot goes through the SNAPSHOT-GOVERNED
        // reader — a merge-on-read table's deletion vectors apply; a raw
        // file read would resurrect the vector-deleted rows
        val snap =
          if (startSnapshot.liveFiles.isEmpty) None
          else Some(TxTable.read(spark, root, Some(startSnapshot.version))
            .select(schema0.fieldNames.map(col).toIndexedSeq: _*))
        val later = appendedRows(firstVersion + 1, to)
        (snap, later) match {
          case (Some(a), Some(b)) => Some(a.unionByName(b))
          case (a, b) => a.orElse(b)
        }
      case None => appendedRows(firstVersion, to)
    }
    val batch = tail.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema0))
    org.apache.spark.sql.GraftBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema0)
  }

  override def stop(): Unit = ()
}
