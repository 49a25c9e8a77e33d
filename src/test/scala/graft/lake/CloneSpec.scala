package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SHALLOW CLONE (round 10): zero-copy fork of a pinned snapshot.
  * Pins the properties the gate query can't see: shared inodes (no data
  * bytes copied), vacuum independence in both directions, version
  * pinning, the travelling dropped-column ledger, and the SQL-text
  * statement.
  */
class CloneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(): String =
    Files.createTempDirectory("graft-clone-").resolve("t").toString

  private def mkTable(rows: Seq[(String, String, Double)]): AcidTable = {
    val t = AcidTable.create(spark, scratch(),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      "pk", "part", stablePartitions = true)
    t.upsert(rows.toDF("pk", "part", "v"))
    t
  }

  test("clone shares inodes (zero copy) and diverges independently") {
    val t = mkTable((0 until 20).map(i => (s"k$i", s"p${i % 2}", i.toDouble)))
    val srcFiles = Files.walk(Paths.get(t.path, "data")).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path]).filter(_.toString.endsWith(".parquet"))
    assert(srcFiles.nonEmpty)

    val c = t.cloneTo(scratch())
    // zero-copy: every source data file now has TWO directory entries
    srcFiles.foreach { f =>
      assert(Files.getAttribute(f, "unix:nlink").asInstanceOf[Number].intValue() == 2,
        s"clone copied instead of linking: $f")
    }
    assert(c.snapshot().count() == 20)

    // divergence: clone writes never touch the source, and vice versa
    c.upsert(Seq(("k1", "p1", 100.0)).toDF("pk", "part", "v"))
    c.delete(Seq("k2"))
    t.delete(Seq("k3"))
    assert(c.snapshot().filter($"pk" === "k1").head().getDouble(2) == 100.0)
    assert(t.snapshot().filter($"pk" === "k1").head().getDouble(2) == 1.0)
    assert(c.snapshot().filter($"pk" === "k3").count() == 1)
    assert(t.snapshot().filter($"pk" === "k2").count() == 1)

    // the clone's history starts at its own v0, labelled CLONE
    val ops = c.history().orderBy("version").collect().map(_.getString(1)).toSeq
    assert(ops.head == "CLONE", s"clone v0 op was ${ops.head}")
  }

  test("vacuum on either side never breaks the other (shared-inode refcount)") {
    val t = mkTable((0 until 12).map(i => (s"k$i", s"p${i % 3}", i.toDouble)))
    val c = t.cloneTo(scratch())
    // source rewrites everything, then vacuums its old files aggressively
    t.overwrite(Seq(("z", "p0", 0.0)).toDF("pk", "part", "v"))
    t.vacuum(keepVersions = 1, graceMillis = 0L)
    // the clone still reads the pre-overwrite snapshot in full
    assert(c.snapshot().count() == 12)
    // and the clone's own vacuum after rewriting leaves the source intact
    c.overwrite(Seq(("y", "p1", 1.0)).toDF("pk", "part", "v"))
    c.vacuum(keepVersions = 1, graceMillis = 0L)
    assert(t.snapshot().collect().map(_.getString(0)).toSeq == Seq("z"))
  }

  test("clone pins a version; ledger and cluster stats travel") {
    val t = mkTable(Seq(("a", "p0", 1.0)))
    t.upsert(Seq(("b", "p1", 2.0)).toDF("pk", "part", "v")) // v1
    t.upsert(Seq(("c", "p0", 3.0)).toDF("pk", "part", "v")) // v2
    val atV1 = t.cloneTo(scratch(), version = 1L)
    assert(atV1.snapshot().collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))

    // dropped-column ledger travels: re-adding the name on the CLONE is
    // blocked until the clone itself purges (the bytes came along)
    val t2 = mkTable(Seq(("a", "p0", 1.0)))
    val dropped = t2.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "tag", org.apache.spark.sql.types.StringType)))
    dropped.upsert(Seq(("b", "p1", 2.0, "x")).toDF("pk", "part", "v", "tag"))
    val afterDrop = dropped.dropColumns(Seq("tag"))
    val c2 = afterDrop.cloneTo(scratch())
    intercept[IllegalArgumentException] {
      c2.addColumns(Seq(org.apache.spark.sql.types.StructField(
        "tag", org.apache.spark.sql.types.StringType)))
    }
    c2.purgeDroppedColumns()
    AcidTable.open(spark, c2.path).addColumns(Seq(org.apache.spark.sql.types.StructField(
      "tag", org.apache.spark.sql.types.StringType)))
  }

  test("SQL text: CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]") {
    val wh = Files.createTempDirectory("graft-clone-wh-").toString
    val sess = new AcidSqlSession(spark, wh)
    sess.execute("CREATE SCHEMA IF NOT EXISTS db")
    sess.execute("""CREATE TABLE db.src (pk STRING, part STRING, v DOUBLE)
                   |USING hudi PARTITIONED BY (part)
                   |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1.0), ("b", "p1", 2.0)).toDF("pk", "part", "v")
      .createOrReplaceTempView("clone_src_rows")
    sess.execute("INSERT INTO db.src SELECT * FROM clone_src_rows")
    Seq(("c", "p0", 3.0)).toDF("pk", "part", "v")
      .createOrReplaceTempView("clone_src_rows2")
    sess.execute("INSERT INTO db.src SELECT * FROM clone_src_rows2")

    sess.execute("CREATE TABLE db.fork SHALLOW CLONE db.src")
    assert(sess.table("db.fork").snapshot().count() == 3)
    sess.execute("CREATE TABLE db.fork0 SHALLOW CLONE db.src VERSION AS OF 0")
    assert(sess.table("db.fork0").snapshot().collect().map(_.getString(0)).sorted.toSeq
      == Seq("a", "b"))
    // the fork is writable through the same session, source unaffected
    sess.execute("DELETE FROM db.fork WHERE pk IN ('a')")
    assert(sess.table("db.fork").snapshot().count() == 2)
    assert(sess.table("db.src").snapshot().count() == 3)
  }

  test("clone carries free-form table properties (morDeletes keeps MOR behavior)") {
    val t = mkTable((0 until 6).map(i => (s"k$i", s"p${i % 2}", i.toDouble)))
    t.setTableProperty("morDeletes", Some("true"))
    t.setTableProperty("statsColumns", Some("pk"))
    t.setTableProperty("team", Some("data-eng"))
    val c = t.cloneTo(scratch())
    assert(c.morDeletes, "clone silently reverted to copy-on-write deletes")
    assert(c.tableProperty("statsColumns").contains("pk"))
    assert(c.tableProperty("team").contains("data-eng"))
    // and the behavior, not just the flag: a key delete on the clone is a
    // zero-rewrite DV commit (manifest reuses the same data lines)
    val v0 = c.latestVersion()
    val v1 = c.delete(Seq("k1"))
    def lines(v: Long) = new String(Files.readAllBytes(
      Paths.get(c.path, "_commits", f"v$v%012d.txt"))).linesIterator
      .filterNot(_.startsWith("#")).filter(_.nonEmpty).toSeq
    assert(lines(v1) == lines(v0), "clone's delete rewrote data instead of DV commit")
    assert(c.snapshot().count() == 5)
  }
}
