package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST FIXTURE — a minimal DataSourceV2 standing in for a live catalog
  * connector (the Cassandra connector of `Tables.catalog`'s third branch).
  * It serves rows derived from its `keyspace`/`table` OPTIONS, so a spec
  * can assert the full option-plumbing path: conf → `catalog()` →
  * `.option(...)` → this source → rows. The schema is deliberately NOT
  * `(string, string)` — `sft` is an INT — so the branch's `cast("string")`
  * coercion is exercised too, exactly what a real connector with typed
  * columns needs (VERDICT r9 #6).
  */
class StubCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StubCatalogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new StubCatalogTable(
      Option(properties.get("keyspace")).getOrElse("<no-keyspace>"),
      Option(properties.get("table")).getOrElse("<no-table>"))
}

object StubCatalogSource {
  val Schema: StructType = StructType(Seq(
    StructField("sft", IntegerType), StructField("value", StringType)))
}

private[sources] class StubCatalogTable(keyspace: String, table: String)
    extends Table with SupportsRead {
  override def name(): String = s"stub_catalog($keyspace.$table)"
  override def schema(): StructType = StubCatalogSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = StubCatalogSource.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(StubCatalogPartition(keyspace, table))
      override def createReaderFactory(): PartitionReaderFactory =
        new StubCatalogReaderFactory
    }
}

private[sources] case class StubCatalogPartition(keyspace: String, table: String)
    extends InputPartition

private[sources] class StubCatalogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StubCatalogPartition]
    val rows: Iterator[InternalRow] = Iterator(
      (1, s"  CATALOG_${p.keyspace}_${p.table}_Z3  "),
      (2, s"metadata_${p.table}")).map { case (sft, v) =>
      new GenericInternalRow(Array[Any](sft, UTF8String.fromString(v)))
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
