package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S3 as a real DataSourceV2: the scatter-gather command runner exposed as a
  * pluggable `BatchScan` (`spark.read.format("graft-cmd")`), the production
  * shape SURVEY §2 S1/S3 names for the reference's SSH fan-out
  * (/root/reference/remote.py:52-72, cluster.py:147-148). The
  * `mapPartitions` variant ([[Registry.runOnAll]]) stays as the embedded
  * API; this source is what a deployment mounts so command output is a TABLE
  * — joinable, filterable, and visible to Catalyst like any other scan.
  *
  * Shape at fleet scale:
  *  - planInputPartitions reads the node registry DRIVER-side and slices it
  *    into `partitions` input splits. The registry is metadata (remotes.json
  *    / a node table — KBs for a 10 000-node fleet), and the driver-side
  *    read IS the partition spec, exactly like a file source listing files.
  *  - Each [[CmdPartition]] carries only its node slice; executors run the
  *    commands (here: the deterministic [[Registry.PureExec]] stand-ins,
  *    resolved executor-side by id so nothing but strings is serialized)
  *    and emit rows. Failures become C3 error-value rows, never task
  *    failures — one dead node cannot fail a 10k-node sweep.
  *  - Column pruning is pushed into the scan
  *    (SupportsPushDownRequiredColumns): `SELECT node, exit_status` ships
  *    two fields per row out of the reader, not five — at fleet scale the
  *    stdout blobs dominate row width, so pruning them at the source is the
  *    difference between KB and MB per node.
  *
  * Options: `command` (required), `exec` (`fixture` | `flaky`), and one of
  * `registry` (remotes.json path → [[Registry.readRemotesJson]]) or `sfdir`
  * (corpus-derived [[graft.Tables.registry]]); `partitions` caps splits.
  */
class CmdSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cmd"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CmdSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CmdTable(properties.asScala.toMap)
}

object CmdSource {
  val Schema: StructType = StructType(Seq(
    StructField("node", StringType), StructField("command", StringType),
    StructField("stdout", StringType), StructField("stderr", StringType),
    StructField("exit_status", IntegerType)))

  /** Executor-side resolution of the pure command executors by id — the
    * pluggable seam where a deployment registers its SSH implementation.
    */
  private[sources] def resolveExec(id: String): (Registry.NodeInfo, String) => (String, String, Int) =
    id match {
      case "fixture" => Registry.PureExec.sshFixture
      case "flaky"   => Registry.PureExec.sshFlaky
      case other     => throw new IllegalArgumentException(s"unknown exec '$other'")
    }
}

private[sources] class CmdTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft_cmd(${props.getOrElse("command", "?")})"
  override def schema(): StructType = CmdSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CmdScanBuilder(props ++ options.asScala)
}

private[sources] class CmdScanBuilder(props: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = CmdSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new CmdScan(props, required)
}

private[sources] class CmdScan(props: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-cmd command=${props.getOrElse("command", "?")} " +
      s"columns=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    import spark.implicits._
    val nodes = (props.get("registry"), props.get("sfdir")) match {
      case (Some(path), _) =>
        Registry.readRemotesJson(spark, path).as[Registry.NodeInfo].collect()
      case (_, Some(d)) =>
        graft.Tables.registry(spark, d).as[Registry.NodeInfo].collect()
      case _ => throw new IllegalArgumentException("need option registry=<json> or sfdir=<dir>")
    }
    val maxParts = props.getOrElse("partitions",
      spark.sparkContext.defaultParallelism.toString).toInt.max(1)
    val slices = math.min(maxParts, nodes.length).max(1)
    nodes.grouped(((nodes.length + slices - 1) / slices).max(1))
      .map(g => CmdPartition(g, props.getOrElse("command", "true"),
        props.getOrElse("exec", "fixture")): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CmdReaderFactory(required.fieldNames)
}

private[sources] case class CmdPartition(nodes: Seq[Registry.NodeInfo], command: String,
                                         execId: String) extends InputPartition

private[sources] class CmdReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CmdPartition]
    val exec = CmdSource.resolveExec(p.execId)
    new PartitionReader[InternalRow] {
      private val it = p.nodes.iterator
      private var current: InternalRow = _
      override def next(): Boolean = it.hasNext && {
        val n = it.next()
        val (out, err, status) =
          try exec(n, p.command)
          catch { case e: Exception => ("", e.getMessage, 255) }
        current = new GenericInternalRow(columns.map[Any] {
          case "node"        => UTF8String.fromString(n.name)
          case "command"     => UTF8String.fromString(p.command)
          case "stdout"      => UTF8String.fromString(out)
          case "stderr"      => UTF8String.fromString(err)
          case "exit_status" => status
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
