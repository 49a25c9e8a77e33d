package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Record

/** Degenerate-input behavior of the commit path: empty batches, deletes of
  * absent keys, and hint misuse must be boring (correct, no data motion),
  * not crashes — at 100 TB these arise constantly from upstream filters
  * that happen to match nothing.
  */
class AcidTableEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("primaryKeyValue", StringType),
    StructField("partitionKeyValue", StringType),
    StructField("dataValue", StringType)))

  private def tmp(): String =
    Files.createTempDirectory("acid-edge-").resolve("t").toString

  private def df(rs: Record*) = spark.createDataset(rs).toDF()

  test("empty-batch upsert commits nothing and moves no data") {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    t.upsert(df(Record("A", "P0", "v1")))
    val v = t.latestVersion()
    t.upsert(df().where(lit(false)))
    // a no-op batch touches no partitions: the commit publishes a manifest
    // that carries every file forward unchanged
    assert(t.snapshot().count() == 1)
    assert(t.latestVersion() == v + 1)
  }

  test("precombine-less merge dedups a duplicate-PK source to one deterministic winner") {
    // round-6 ADVICE latent bug: windowMerge collapsed matched duplicates
    // to the max-struct winner but inserted unmatched duplicates TWICE,
    // and joinMerge multiplied matched target rows — the same source gave
    // different results depending on schema orderability. The contract is
    // now: greatest remaining-columns tuple wins per PK, both matched and
    // unmatched, on both formulations.
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    t.upsert(df(Record("A", "P0", "v0")))
    t.merge(df(
      Record("A", "P0", "v1"), Record("A", "P0", "v9"),   // matched duplicate
      Record("B", "P1", "u1"), Record("B", "P1", "u7")),  // unmatched duplicate
      updateCols = Seq("dataValue"))
    val got = t.snapshot().as[Record].collect().map(r => r.primaryKeyValue -> r.dataValue).toMap
    assert(got == Map("A" -> "v9", "B" -> "u7"))
  }

  test("precombine-less duplicate-PK merge on a map-typed schema fails loudly") {
    // maps are unorderable: no deterministic winner exists, so a
    // duplicate-PK source must be rejected instead of silently depending
    // on the physical merge formulation
    val mapSchema = StructType(Seq(
      StructField("pk", StringType),
      StructField("part", StringType),
      StructField("attrs", MapType(StringType, StringType))))
    def row(pk: String, v: String) =
      Seq((pk, "p0", Map("k" -> v))).toDF("pk", "part", "attrs")
    val t = AcidTable.create(spark, tmp(), mapSchema, "pk", "part")
    t.upsert(row("a", "1"))
    // unique-PK source merges fine through the join formulation
    t.merge(row("a", "2"), updateCols = Seq("attrs"))
    assert(t.snapshot().count() == 1)
    val dup = row("a", "3").unionByName(row("a", "4"))
    val e = intercept[IllegalArgumentException] { t.merge(dup, updateCols = Seq("attrs")) }
    assert(e.getMessage.contains("duplicate"))
  }

  test("delete of absent keys leaves content identical") {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    t.upsert(df(Record("A", "P0", "v1"), Record("B", "P1", "v2")))
    t.delete(Seq("NOPE", "ALSO_NOPE"))
    assert(t.snapshot().orderBy("primaryKeyValue").collect().map(_.getString(0)).toSeq
      == Seq("A", "B"))
  }

  test("upsert with a missing schema column fails loudly") {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    val bad = Seq(("A", "P0")).toDF("primaryKeyValue", "partitionKeyValue")
    assertThrows[IllegalArgumentException] { t.upsert(bad) }
  }

  test("partitionsHint without stablePartitions is rejected") {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue",
      stablePartitions = false)
    assertThrows[IllegalArgumentException] {
      t.upsert(df(Record("A", "P0", "v1")), Some(Seq("P0")))
    }
  }

  test("snapshot of a version beyond retention still resolves after compact") {
    val t = AcidTable.create(spark, tmp(), schema, "primaryKeyValue", "partitionKeyValue")
    val v0 = t.upsert(df(Record("A", "P0", "v1")))
    t.upsert(df(Record("A", "P0", "v2")))
    t.compact(maxFilesPerPartition = 1)
    // no vacuum ran: the pinned historical manifest still reads cleanly
    assert(t.snapshot(v0).collect().map(_.getString(2)).toSeq == Seq("v1"))
  }
}
