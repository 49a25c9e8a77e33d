package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snapshot tags (round 18c): named immutable refs that pin their
  * versions against vacuum's timeline archival. Pins the lifecycle, the
  * prefix-stop retention semantics (archival halts at the oldest tagged
  * version; drop releases it), data-file survival through a sweep that
  * would otherwise collect them, and the catalog's `VERSION AS OF
  * '<tag>'` resolution.
  */
class TagSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))

  private def mkTable(path: String = Files.createTempDirectory("graft-tag-")
      .resolve("t").toString): AcidTable = {
    val t = AcidTable.create(spark, path, schema, "pk", "part", stablePartitions = true)
    t.upsert((0 until 12).map(i => (s"k$i", s"p${i % 2}", i.toDouble)).toDF("pk", "part", "v"))
    t
  }

  test("tag lifecycle: create, list, resolve, drop; immutability and name rules") {
    val t = mkTable()
    t.upsert(Seq(("k0", "p0", 99.0)).toDF("pk", "part", "v")) // v1
    assert(t.createTag("stable", 0L) == 0L)
    assert(t.createTag("latest.run") == 1L)
    assert(t.listTags() == Seq("latest.run" -> 1L, "stable" -> 0L))
    assert(t.tagVersion("stable") == 0L)
    assert(t.snapshotTag("stable").filter($"pk" === "k0").head().getDouble(2) == 0.0)

    // immutable: re-tagging fails; numeric names reserved; unknowns loud
    assertThrows[IllegalArgumentException] { t.createTag("stable", 1L) }
    assertThrows[IllegalArgumentException] { t.createTag("123") }
    assertThrows[IllegalArgumentException] { t.tagVersion("nope") }
    assertThrows[IllegalArgumentException] { t.dropTag("nope") }
    t.dropTag("stable")
    assert(t.listTags() == Seq("latest.run" -> 1L))
  }

  test("a tag pins its version (and the suffix above it) through vacuum; drop releases") {
    val t = mkTable() // v0
    t.upsert(Seq(("x1", "p1", 50.0)).toDF("pk", "part", "v")) // v1
    t.createTag("train") // pins v1
    t.upsert(Seq(("x2", "p0", 60.0)).toDF("pk", "part", "v")) // v2
    t.upsert(Seq(("x3", "p1", 70.0)).toDF("pk", "part", "v")) // v3
    Thread.sleep(30)
    t.vacuum(keepVersions = 1, graceMillis = 0)
    // archival candidates v0..v2: v0 goes, stops at tagged v1 (prefix rule)
    assert(scala.util.Try(t.snapshot(0L).collect()).isFailure, "v0 must archive")
    assert(t.snapshot(1L).count() == 13)
    assert(t.snapshot(2L).count() == 14, "suffix above the tag is retained too")
    assert(t.snapshotTag("train").filter($"pk" === "x1").head().getDouble(2) == 50.0)

    t.dropTag("train")
    Thread.sleep(30)
    t.vacuum(keepVersions = 1, graceMillis = 0)
    assert(scala.util.Try(t.snapshot(1L).collect()).isFailure,
      "dropping the tag must release its versions to archival")
    assert(t.snapshot().count() == 15)
  }

  test("tagged data files survive a sweep that collects the untagged rest") {
    val t = mkTable() // v0: 12 rows across p0/p1
    t.createTag("corpus") // pins v0
    // overwrite-style churn: delete everything, insert fresh rows — v0's
    // files become dead to every later version
    t.deleteWhere(org.apache.spark.sql.functions.lit(true)) // v1
    t.upsert(Seq(("n1", "p0", 1.0)).toDF("pk", "part", "v")) // v2
    t.upsert(Seq(("n2", "p1", 2.0)).toDF("pk", "part", "v")) // v3
    Thread.sleep(30)
    t.vacuum(keepVersions = 1, graceMillis = 0)
    // the tagged snapshot still reads its original 12 rows byte-for-byte
    val tagged = t.snapshotTag("corpus").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(tagged == (0 until 12).map(i => (s"k$i", i.toDouble)).toSet)
    assert(t.snapshot().count() == 2)
  }

  test("tagging an archived version is refused loudly") {
    val t = mkTable() // v0
    t.upsert(Seq(("k0", "p0", 5.0)).toDF("pk", "part", "v")) // v1
    t.upsert(Seq(("k1", "p1", 6.0)).toDF("pk", "part", "v")) // v2
    Thread.sleep(30)
    t.vacuum(keepVersions = 1, graceMillis = 0) // archives v0, v1
    val e = intercept[IllegalArgumentException] { t.createTag("late", 0L) }
    assert(e.getMessage.contains("archived"))
  }

  test("catalog time travel resolves VERSION AS OF '<tag>'") {
    val wh = Files.createTempDirectory("graft-tag-wh-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tags")
    spark.sql("""CREATE TABLE graft.tags.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part)
                |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1.0)).toDF("pk", "part", "v").createOrReplaceTempView("tag_src0")
    spark.sql("INSERT INTO graft.tags.t SELECT * FROM tag_src0") // v0
    val t = AcidTable.open(spark, Paths.get(wh, "tags", "t").toString)
    t.createTag("first")
    Seq(("a", "p0", 2.0)).toDF("pk", "part", "v").createOrReplaceTempView("tag_src1")
    spark.sql("INSERT INTO graft.tags.t SELECT * FROM tag_src1") // v1
    assert(spark.sql("SELECT v FROM graft.tags.t VERSION AS OF 'first'")
      .head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT v FROM graft.tags.t VERSION AS OF 1")
      .head().getDouble(0) == 2.0)
  }
}
