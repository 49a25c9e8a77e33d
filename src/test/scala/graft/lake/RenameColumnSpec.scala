package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only RENAME COLUMN (round 10): zero-rewrite renames via the
  * coalescing scan over current+prior names, chained renames, the
  * dropped-name ledger interplay (no byte resurrection), the physical
  * purge restoring plain scans, and all three front-ends.
  */
class RenameColumnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scratch(): String =
    Files.createTempDirectory("graft-rn-").resolve("t").toString

  private def mkTable(): AcidTable =
    AcidTable.create(spark, scratch(),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("part", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      "pk", "part", stablePartitions = true)

  test("rename is metadata-only; old and new files read through one name") {
    var t = mkTable()
    t.upsert(Seq(("a", "p0", 1.0), ("b", "p1", 2.0)).toDF("pk", "part", "v"))
    val filesBefore = Files.walk(java.nio.file.Paths.get(t.path, "data")).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).toSet

    t = t.renameColumn("v", "score")
    assert(t.schema.fieldNames.toSeq == Seq("pk", "part", "score"))
    // ZERO data movement: exactly the same physical files
    val filesAfter = Files.walk(java.nio.file.Paths.get(t.path, "data")).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).toSet
    assert(filesAfter == filesBefore, "rename rewrote data files")

    // pre-rename rows read through the new name
    assert(t.snapshot().orderBy("pk").collect().map(_.getDouble(2)).toSeq == Seq(1.0, 2.0))

    // post-rename writes carry the new name; mixed old/new files coalesce
    t.upsert(Seq(("c", "p0", 3.0)).toDF("pk", "part", "score"))
    assert(t.snapshot().orderBy("pk").collect().map(_.getDouble(2)).toSeq
      == Seq(1.0, 2.0, 3.0))
    // updates through the new name rewrite correctly (old-file rows too)
    t.update(Seq("score" -> (org.apache.spark.sql.functions.col("score") + 10)),
      org.apache.spark.sql.functions.col("pk") === "a")
    assert(t.snapshot().filter($"pk" === "a").head().getDouble(2) == 11.0)

    // chained rename: score → points still reads the ORIGINAL v bytes
    t = t.renameColumn("score", "points")
    assert(t.snapshot().orderBy("pk").collect().map(_.getDouble(2)).toSeq
      == Seq(11.0, 2.0, 3.0))

    // the old names' bytes block reuse until purge (no resurrection)
    intercept[IllegalArgumentException] {
      t.addColumns(Seq(org.apache.spark.sql.types.StructField(
        "v", org.apache.spark.sql.types.DoubleType)))
    }
    intercept[IllegalArgumentException] { t.renameColumn("points", "v") }

    // physical purge: files rewritten under the current name, map cleared,
    // names free again
    t = t.purgeDroppedColumns()
    assert(t.renamedCols.isEmpty && t.droppedCols.isEmpty)
    assert(t.snapshot().orderBy("pk").collect().map(_.getDouble(2)).toSeq
      == Seq(11.0, 2.0, 3.0))
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "v", org.apache.spark.sql.types.DoubleType)))
  }

  test("structural columns and constraint-referenced columns refuse to rename") {
    var t = mkTable()
    t.upsert(Seq(("a", "p0", 1.0)).toDF("pk", "part", "v"))
    intercept[IllegalArgumentException] { t.renameColumn("pk", "id") }
    intercept[IllegalArgumentException] { t.renameColumn("part", "shard") }
    t = t.addConstraint("v_pos", "v > 0.0")
    intercept[IllegalArgumentException] { t.renameColumn("v", "score") }
    t = t.dropConstraint("v_pos")
    t = t.renameColumn("v", "score")
    // time travel reads history through the CURRENT schema (like add/drop)
    assert(t.snapshot(0L).columns.toSeq == Seq("pk", "part", "score"))
  }

  test("SQL front-ends: ALTER TABLE RENAME COLUMN in text and catalog") {
    val wh = Files.createTempDirectory("graft-rn-wh-").toString
    val sess = new AcidSqlSession(spark, wh)
    sess.execute("CREATE SCHEMA IF NOT EXISTS db")
    sess.execute("""CREATE TABLE db.t (pk STRING, part STRING, v DOUBLE)
                   |USING hudi PARTITIONED BY (part)
                   |TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 1.0)).toDF("pk", "part", "v").createOrReplaceTempView("rn_rows")
    sess.execute("INSERT INTO db.t SELECT * FROM rn_rows")
    sess.execute("ALTER TABLE db.t RENAME COLUMN v TO score")
    assert(sess.table("db.t").schema.fieldNames.toSeq == Seq("pk", "part", "score"))
    assert(sess.query("SELECT score FROM db.t").head().getDouble(0) == 1.0)

    val wh2 = Files.createTempDirectory("graft-rn-cat-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rn")
    spark.sql("""CREATE TABLE graft.rn.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    Seq(("a", "p0", 7.0)).toDF("pk", "part", "v").createOrReplaceTempView("rn_cat_rows")
    spark.sql("INSERT INTO graft.rn.t SELECT * FROM rn_cat_rows")
    spark.sql("ALTER TABLE graft.rn.t RENAME COLUMN v TO score")
    assert(spark.sql("SELECT score FROM graft.rn.t").head().getDouble(0) == 7.0)
    spark.sql("DROP TABLE graft.rn.t")
  }
}
