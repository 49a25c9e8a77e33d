package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Record

/** Partition values with characters Spark's partitioned writer escapes
  * (space, colon, ...) must round-trip through commit, carry-forward, and
  * delete — a raw-interpolated directory name would silently drop them.
  */
class AcidTableEscapingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("primaryKeyValue", StringType),
    StructField("partitionKeyValue", StringType),
    StructField("dataValue", StringType)))

  test("special-character partition values survive rewrite, carry, and delete") {
    val path = Files.createTempDirectory("acid-esc-").resolve("t").toString
    val t = AcidTable.create(spark, path, schema, "primaryKeyValue", "partitionKeyValue")
    val odd = "2024-01-01 10:00" // space + colons → escaped dir name
    t.upsert(spark.createDataset(Seq(
      Record("R1", odd, "a"), Record("R2", "plain", "b"))).toDF())
    t.upsert(spark.createDataset(Seq(Record("R3", "plain", "c"))).toDF()) // carries odd partition
    assert(t.snapshot().as[Record].collect().map(_.primaryKeyValue).sorted.toSeq
      == Seq("R1", "R2", "R3"))
    t.upsert(spark.createDataset(Seq(Record("R1", odd, "a2"))).toDF()) // rewrite odd partition
    val r1 = t.snapshot().as[Record].collect().find(_.primaryKeyValue == "R1").get
    assert(r1.dataValue == "a2" && r1.partitionKeyValue == odd)
    t.delete(Seq("R1"))
    assert(t.snapshot().count() == 2)
  }
}
