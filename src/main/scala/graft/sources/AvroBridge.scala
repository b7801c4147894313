package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableFileInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.spark.sql.Row

/** Executor-side bridge between Spark rows and REAL Avro container files,
  * built on the canonical Apache Avro Java library (`org.apache.avro`,
  * avro-core 1.12 — present on the cluster classpath; only the thin
  * `spark-avro` connector is absent, see [[Formats]]). The row mapping
  * covers the roundtrip schema's types: long, string, double, and
  * TimestampType as the Avro spec's `timestamp-micros` logical type.
  */
object AvroBridge extends Serializable {

  /** Avro record schema for the `orders` roundtrip slice. */
  val OrdersAvroSchema: String =
    """{"type":"record","name":"orders","namespace":"graft","fields":[
      |{"name":"o_orderkey","type":"long"},
      |{"name":"o_custkey","type":"long"},
      |{"name":"o_orderstatus","type":"string"},
      |{"name":"o_totalprice","type":"double"},
      |{"name":"o_orderdate","type":{"type":"long","logicalType":"timestamp-micros"}}
      |]}""".stripMargin

  def parseSchema(json: String): Schema = new Schema.Parser().parse(json)

  /** Spark Row (positionally matching [[OrdersAvroSchema]]) → GenericRecord. */
  def toRecord(schema: Schema, r: Row): GenericRecord = {
    val rec = new GenericData.Record(schema)
    rec.put("o_orderkey", r.getLong(0))
    rec.put("o_custkey", r.getLong(1))
    rec.put("o_orderstatus", r.getString(2))
    rec.put("o_totalprice", r.getDouble(3))
    rec.put("o_orderdate", toMicros(r.get(4)))
    rec
  }

  /** Epoch micros from any of Spark's external timestamp models:
    * java.sql.Timestamp / java.time.Instant (TimestampType, per
    * `spark.sql.datetime.java8API.enabled`) and java.time.LocalDateTime
    * (TimestampNTZType — what the fixtures' unannotated parquet
    * timestamp[us] loads as; NTZ wall time maps to micros as-at-UTC, the
    * identity the read side inverts).
    */
  private def toMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: java.time.LocalDateTime =>
      d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  private def fromMicros(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** Decode one container file (any codec avro-core knows, incl. the
    * deflate our writer uses) back to Rows. The reader streams blocks —
    * memory is one decompressed block, not the file.
    */
  def readFile(path: String): Iterator[Row] = {
    val reader = new DataFileReader(
      new SeekableFileInput(new java.io.File(path)),
      new GenericDatumReader[GenericRecord]())
    new Iterator[Row] {
      override def hasNext: Boolean = {
        val h = reader.hasNext
        if (!h) reader.close()
        h
      }
      override def next(): Row = {
        val rec = reader.next()
        Row(
          rec.get("o_orderkey").asInstanceOf[Long],
          rec.get("o_custkey").asInstanceOf[Long],
          rec.get("o_orderstatus").toString, // avro strings arrive as Utf8
          rec.get("o_totalprice").asInstanceOf[Double],
          fromMicros(rec.get("o_orderdate").asInstanceOf[Long]))
      }
    }
  }
}
