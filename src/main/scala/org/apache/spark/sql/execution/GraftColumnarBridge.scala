package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Accessor for [[RowToColumnConverter]] (private[execution]) — see
  * [[org.apache.spark.sql.GraftBridge.rowsToColumnarBatches]] for the
  * contract and the caller. Lives in the execution namespace for
  * visibility only; the logic is the same per-partition repacking
  * `RowToColumnarExec` performs.
  */
private[sql] object GraftColumnarBridge {

  def rowsToColumnarBatches(schema: StructType, rows: Iterator[InternalRow],
                            batchSize: Int): Iterator[ColumnarBatch] =
    new Iterator[ColumnarBatch] {
      private val converter = new RowToColumnConverter(schema)
      private val vectors = OnHeapColumnVector.allocateColumns(batchSize, schema)
      private val writable: Array[WritableColumnVector] = vectors.toArray
      private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
      override def hasNext: Boolean = rows.hasNext
      override def next(): ColumnarBatch = {
        var i = 0
        vectors.foreach(_.reset())
        while (i < batchSize && rows.hasNext) {
          converter.convert(rows.next(), writable)
          i += 1
        }
        batch.setNumRows(i)
        batch
      }
    }
}
