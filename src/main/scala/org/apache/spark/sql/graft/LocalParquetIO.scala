package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.{ReadSupport, WriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.RebaseDateTime.RebaseSpec
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
import org.apache.spark.sql.internal.{LegacyBehaviorPolicy, SQLConf}
import org.apache.spark.sql.types._

/** Driver-side parquet IO through Spark's OWN row converters
  * ([[ParquetWriteSupport]] / [[ParquetReadSupport]]) — the same classes
  * every executor-side parquet task uses, minus the job. Files written here
  * are bit-compatible with Spark's writer (same logical-type annotations,
  * same encodings) and files written by Spark read back identically, so a
  * table's history can freely mix driver-written and executor-written
  * files.
  *
  * Exists for the transactional small-commit fast path
  * (`graft.lake.AcidTable`): a 3-row commit through the distributed write
  * stack pays ~100 ms of job scheduling plus ~100 ms of
  * FileFormatWriter/committer machinery for microseconds of actual row
  * work. At driver scale the same read-merge-write is a few milliseconds.
  *
  * The supported-type gate is deliberate: these are the types whose parquet
  * encoding has NO conf-sensitive variants (no rebase modes, no INT96/
  * micros choice), so driver and executor writers cannot diverge however
  * the session is configured. Decimals qualify too: [[ioConf]] pins
  * `writeLegacyFormat=false` for driver writes (INT32/INT64/FIXED by
  * precision — the modern layout the distributed writer emits under the
  * default conf), and Spark's read converters accept every decimal
  * physical layout regardless, so a history mixing a legacy-conf
  * distributed writer with driver files still reads one way. Timestamps,
  * dates, binary, and nested types fall back to the distributed path.
  */
object LocalParquetIO {

  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType |
         IntegerType | LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  def supportedSchema(schema: StructType): Boolean =
    schema.fields.forall(f => supportedType(f.dataType))

  /** One immutable Configuration per distinct (schema, direction, conf
    * values) carrying everything the two support classes read at init.
    * Parquet's support objects mutate nothing in it, so concurrent
    * readers/writers can share it.
    */
  // Keyed by the VALUES the built conf depends on, never the SparkSession:
  // a session-keyed cache would strongly retain every cloned session (the
  // harness clones one per writer thread) for process lifetime.
  private final case class ConfKey(
      schema: StructType, forWrite: Boolean,
      binaryAsString: Boolean, int96AsTimestamp: Boolean, caseSensitive: Boolean)

  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[ConfKey, Configuration]

  private def ioConf(spark: SparkSession, schema: StructType, forWrite: Boolean): Configuration =
    confCache.computeIfAbsent(ConfKey(schema, forWrite,
      spark.sessionState.conf.isParquetBinaryAsString,
      spark.sessionState.conf.isParquetINT96AsTimestamp,
      spark.sessionState.conf.caseSensitiveAnalysis), _ => {
      val conf = spark.sessionState.newHadoopConf()
      // Spark's schema converters read these keys UNCONDITIONALLY from the
      // task-side conf (prepareWrite/buildReaderWithPartitionValues set
      // them on every job); a bare session conf lacks them. Pin every one
      // to the no-variant encodings the type gate guarantees anyway.
      conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key,
        spark.sessionState.conf.isParquetBinaryAsString.toString)
      conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
        spark.sessionState.conf.isParquetINT96AsTimestamp.toString)
      conf.set(SQLConf.CASE_SENSITIVE.key,
        spark.sessionState.conf.caseSensitiveAnalysis.toString)
      conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
      conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, "false")
      conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
      conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
      if (forWrite) {
        ParquetWriteSupport.setSchema(schema, conf)
        conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
        conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
        conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
        conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
        conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
      } else {
        conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schema.json)
      }
      conf
    })

  // java.nio-backed parquet files, NOT Hadoop Path IO: the Hadoop local
  // filesystem is a ChecksumFileSystem — every write doubles into a .crc
  // sidecar and every open pays FS-cache and stat overhead, none of which
  // a driver-local commit file needs (the distributed write path's staged
  // files lose their sidecars at the staging move anyway, so files from
  // the two writers are indistinguishable on disk).
  private final class WriterBuilder(out: org.apache.parquet.io.OutputFile)
      extends ParquetWriter.Builder[InternalRow, WriterBuilder](out) {
    override def self(): WriterBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Write `rows` (layout = `schema`) as one parquet file; returns bytes. */
  def write(
      file: java.io.File,
      schema: StructType,
      rows: Iterable[InternalRow],
      spark: SparkSession): Long = {
    val conf = ioConf(spark, schema, forWrite = true)
    val writer = new WriterBuilder(
      new org.apache.parquet.io.LocalOutputFile(file.toPath))
      .withConf(conf)
      // Spark's session default codec; matches what the distributed writer
      // would produce for the same session
      .withCompressionCodec(CompressionCodecName.fromConf(
        spark.sessionState.conf.parquetCompressionCodec.toUpperCase(java.util.Locale.ROOT)))
      .build()
    try rows.foreach(writer.write)
    finally writer.close()
    file.length()
  }

  private final class ReaderBuilder(
      in: org.apache.parquet.io.InputFile, support: ReadSupport[InternalRow])
      extends ParquetReader.Builder[InternalRow](in) {
    override def getReadSupport: ReadSupport[InternalRow] = support
  }

  /** Read a parquet file driver-side with `schema` as the requested
    * schema — columns absent from the file (older writes of an evolved
    * table) surface as NULL, exactly like the distributed scan.
    */
  def read(
      file: java.io.File,
      schema: StructType,
      spark: SparkSession): Seq[InternalRow] = {
    val conf = ioConf(spark, schema, forWrite = false)
    val support = new ParquetReadSupport(
      None, // no INT96 conversion timezone needed: timestamps are gated out
      // false = the parquet-mr record-reader construction Spark itself
      // uses in ParquetFileFormat's non-vectorized path — this reader IS
      // that path minus the job
      enableVectorizedReader = false,
      RebaseSpec(LegacyBehaviorPolicy.CORRECTED),
      RebaseSpec(LegacyBehaviorPolicy.CORRECTED))
    val reader = new ReaderBuilder(
      new org.apache.parquet.io.LocalInputFile(file.toPath), support)
      .withConf(conf)
      .build()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    try {
      var row = reader.read()
      while (row != null) {
        out += row.copy() // the materializer reuses its row buffer
        row = reader.read()
      }
    } finally reader.close()
    out.toSeq
  }
}
