package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Forwarder for Spark's `private[execution]` row→column machinery, used
  * by the graft batch scan to rebuild a deletion-vector-filtered
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]] without reimplementing
  * per-type appends. Same converter `RowToColumnarExec` runs — nested
  * arrays/maps/structs, decimals, intervals all covered by Spark itself.
  */
object GraftColumnarShim {

  /** A reusable row→vectors appender for `schema`-shaped rows. Each call
    * appends one row across the supplied vectors (which must match
    * `schema` positionally). */
  final class RowAppender(schema: StructType) extends Serializable {
    private val conv = new RowToColumnConverter(schema)
    def append(row: InternalRow, vectors: Array[WritableColumnVector]): Unit =
      conv.convert(row, vectors)
  }

  def rowAppender(schema: StructType): RowAppender = new RowAppender(schema)
}
