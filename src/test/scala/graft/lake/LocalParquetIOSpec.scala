package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.LocalParquetIO
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The driver-side parquet shim's contract: files it writes are
  * indistinguishable from executor-written files, in BOTH directions, for
  * every supported type — including the evolved-schema (missing column →
  * NULL) behavior the ACID layer's schema evolution relies on.
  */
class LocalParquetIOSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("f", FloatType),
    StructField("d", DoubleType)))

  private def sampleRows: Seq[InternalRow] = Seq(
    InternalRow(UTF8String.fromString("alpha"), true, 1, 10L, 1.5f, 2.5),
    InternalRow(UTF8String.fromString(""), false, -2, Long.MinValue, Float.NaN, -0.0),
    InternalRow(null, null, null, null, null, null))

  // string rendering: still distinguishes -0.0 from 0.0 and null from "",
  // without tripping on boxed-NaN bit-pattern equality
  private def collectRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")).sorted

  test("driver-written files read back identically through the distributed reader") {
    val dir = Files.createTempDirectory("lpio-w-").toFile
    val f = new java.io.File(dir, "x.parquet")
    val bytes = LocalParquetIO.write(f, schema, sampleRows, spark)
    assert(bytes > 0 && f.exists())
    val viaSpark = collectRows(spark.read.schema(schema).parquet(f.toString))
    val expected = collectRows(spark.createDataFrame(
      java.util.List.of(
        Row("alpha", true, 1, 10L, 1.5f, 2.5),
        Row("", false, -2, Long.MinValue, Float.NaN, -0.0),
        Row(null, null, null, null, null, null)),
      schema))
    assert(viaSpark == expected)
  }

  test("executor-written files read back identically through the driver reader") {
    val dir = Files.createTempDirectory("lpio-r-").toFile
    spark.createDataFrame(
      java.util.List.of(
        Row("alpha", true, 1, 10L, 1.5f, 2.5),
        Row(null, null, null, null, null, null)),
      schema).coalesce(1).write.mode("overwrite").parquet(dir.toString + "/t")
    val file = new java.io.File(dir, "t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rows = LocalParquetIO.read(file, schema, spark)
    val got = rows.map(r => (0 until schema.length).map(i =>
      r.get(i, schema(i).dataType)).mkString("|")).sorted
    assert(got == Seq(
      Seq(UTF8String.fromString("alpha"), true, 1, 10L, 1.5f, 2.5).mkString("|"),
      Seq(null, null, null, null, null, null).mkString("|")).sorted)
  }

  test("round trip driver write -> driver read preserves values") {
    val dir = Files.createTempDirectory("lpio-rt-").toFile
    val f = new java.io.File(dir, "x.parquet")
    LocalParquetIO.write(f, schema, sampleRows, spark)
    val back = LocalParquetIO.read(f, schema, spark)
    assert(back.size == 3)
    val strings = back.map(r => (0 until schema.length).map(i =>
      String.valueOf(r.get(i, schema(i).dataType))).mkString("|")).sorted
    val orig = sampleRows.map(r => (0 until schema.length).map(i =>
      String.valueOf(r.get(i, schema(i).dataType))).mkString("|")).sorted
    assert(strings == orig)
  }

  test("evolved schema: columns absent from the file surface as NULL") {
    val narrow = StructType(schema.fields.take(2))
    val dir = Files.createTempDirectory("lpio-ev-").toFile
    val f = new java.io.File(dir, "x.parquet")
    LocalParquetIO.write(f, narrow,
      Seq(InternalRow(UTF8String.fromString("old"), true)), spark)
    val rows = LocalParquetIO.read(f, schema, spark)
    assert(rows.size == 1)
    val r = rows.head
    assert(r.get(0, StringType) == UTF8String.fromString("old"))
    assert(r.get(1, BooleanType) == true)
    (2 until schema.length).foreach(i =>
      assert(r.isNullAt(i), s"expected NULL at evolved column $i"))
  }

  test("type gate: conf-sensitive types are rejected; decimals pass") {
    assert(!LocalParquetIO.supportedType(TimestampType))
    assert(!LocalParquetIO.supportedType(DateType))
    // decimals joined the gate in round 14: the driver writer pins
    // writeLegacyFormat=false and every decimal physical layout reads one
    // way, so encoding cannot diverge by session conf
    assert(LocalParquetIO.supportedType(DecimalType(18, 2)))
    assert(LocalParquetIO.supportedType(DecimalType(38, 10)))
    assert(!LocalParquetIO.supportedType(BinaryType))
    assert(!LocalParquetIO.supportedType(ArrayType(LongType)))
    assert(LocalParquetIO.supportedSchema(schema))
  }

  test("decimal round trip: driver write reads back through both readers") {
    val dSchema = StructType(Seq(
      StructField("k", StringType),
      StructField("small", DecimalType(9, 2)),   // INT32-backed
      StructField("mid", DecimalType(18, 2)),    // INT64-backed
      StructField("wide", DecimalType(38, 10)))) // FIXED_LEN_BYTE_ARRAY
    def dec(s: String, p: Int, sc: Int) =
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s), p, sc)
    val rows = Seq(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString("a"),
        dec("1234567.89", 9, 2), dec("123456789012345.67", 18, 2),
        dec("1234567890123456789012345678.0123456789", 38, 10))),
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString("b"),
        null, dec("-0.01", 18, 2), null)))
    val f = java.nio.file.Files.createTempDirectory("lpio-dec-")
      .resolve("d.parquet").toFile
    LocalParquetIO.write(f, dSchema, rows, spark)
    // driver reader
    val back = LocalParquetIO.read(f, dSchema, spark)
    assert(back.size == 2)
    assert(back.head.get(1, DecimalType(9, 2)).toString == "1234567.89")
    assert(back(1).isNullAt(1) && back(1).isNullAt(3))
    assert(back(1).get(2, DecimalType(18, 2)).toString == "-0.01")
    // distributed reader sees the same values
    val viaSpark = spark.read.schema(dSchema).parquet(f.getParent)
      .orderBy("k").collect()
    assert(viaSpark(0).getDecimal(3).toPlainString ==
      "1234567890123456789012345678.0123456789")
    assert(viaSpark(1).isNullAt(1) && viaSpark(1).getDecimal(2).toPlainString == "-0.01")
  }
}
