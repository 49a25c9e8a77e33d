package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference writers' SQL TEXT surface (TransactionWriter.java:153-175)
  * routed through AcidSql: the statements below keep the reference's exact
  * shapes (MERGE with temp-view USING source, DELETE … IN-list).
  */
class AcidSqlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("primaryKeyValue", StringType),
    StructField("partitionKeyValue", StringType),
    StructField("dataValue", StringType)))

  private def freshTable(): (AcidTable, Map[String, AcidTable]) = {
    val t = AcidTable.create(spark,
      Files.createTempDirectory("acid-sql-").resolve("t").toString,
      schema, "primaryKeyValue", "partitionKeyValue")
    (t, Map("acid.records" -> t, "records" -> t))
  }

  test("INSERT INTO / MERGE INTO / DELETE FROM text execute transactionally") {
    val (t, reg) = freshTable()

    Seq(("R1", "P0", "v1"), ("R2", "P1", "v2"), ("R3", "P0", "v3"))
      .toDF("primaryKeyValue", "partitionKeyValue", "dataValue")
      .createOrReplaceTempView("ins_src")
    AcidSql.execute(spark, reg, "INSERT INTO acid.records SELECT * FROM ins_src")
    assert(t.snapshot().count() == 3)

    Seq(("R2", "P1", "v2-updated"), ("R4", "P1", "v4"))
      .toDF("primaryKeyValue", "partitionKeyValue", "dataValue")
      .createOrReplaceTempView("temp_view_1")
    // the reference's MERGE statement, verbatim shape (TransactionWriter.java:154-160)
    AcidSql.execute(spark, reg,
      """MERGE INTO acid.records t
        |USING (SELECT * FROM temp_view_1) s
        |ON t.primaryKeyValue = s.primaryKeyValue
        |WHEN MATCHED THEN UPDATE SET t.dataValue = s.dataValue
        |WHEN NOT MATCHED THEN
        |INSERT (t.primaryKeyValue, t.partitionKeyValue, t.dataValue) VALUES (s.primaryKeyValue, s.partitionKeyValue, s.dataValue)
        |""".stripMargin)
    val afterMerge = t.snapshot().orderBy("primaryKeyValue")
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(afterMerge == Seq("R1" -> "v1", "R2" -> "v2-updated", "R3" -> "v3", "R4" -> "v4"))

    AcidSql.execute(spark, reg,
      """DELETE FROM acid.records WHERE primaryKeyValue IN ("R1", "R3")""")
    assert(t.snapshot().select("primaryKeyValue").as[String].collect().sorted.toSeq
      == Seq("R2", "R4"))
  }

  test("reference DDL text lifecycle: CREATE SCHEMA / CREATE TABLE / DROP TABLE") {
    val wh = Files.createTempDirectory("acid-sql-wh-").toString
    val sess = new AcidSqlSession(spark, wh)
    sess.execute("CREATE SCHEMA IF NOT EXISTS acid")
    sess.execute("DROP TABLE IF EXISTS acid.records")
    // the reference's CREATE TABLE, verbatim shape (TransactionManager.java:76-88)
    sess.execute("""
      CREATE TABLE IF NOT EXISTS acid.records(
          primaryKeyValue STRING,
          partitionKeyValue STRING,
          dataValue STRING
      )
      USING hudi
      PARTITIONED BY (partitionKeyValue)
      TBLPROPERTIES (
          primaryKey = 'primaryKeyValue',
          preCombinedField = 'dataValue'
      )
    """)
    Seq(("K1", "P0", "a"), ("K1", "P0", "z"), ("K2", "P1", "b"))
      .toDF("primaryKeyValue", "partitionKeyValue", "dataValue")
      .createOrReplaceTempView("ddl_src")
    sess.execute("INSERT INTO acid.records SELECT * FROM ddl_src")
    // precombine from TBLPROPERTIES: greatest dataValue wins for K1
    val rows = sess.table("acid.records").snapshot()
      .orderBy("primaryKeyValue").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(rows == Seq("K1" -> "z", "K2" -> "b"))
    sess.execute("DELETE FROM acid.records WHERE primaryKeyValue IN ('K2')")
    assert(sess.table("records").snapshot().count() == 1)
    // the reference reader's literal SELECT text (ReaderThread.java:77-78)
    // resolves through the same session — qualified name, filters, aggs
    val selected = sess.query("SELECT primaryKeyValue, dataValue FROM acid.records")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(selected == Seq("K1" -> "z"))
    assert(sess.query("SELECT count(*) AS n FROM acid.records WHERE dataValue = 'z'")
      .collect().head.getLong(0) == 1L)
    sess.execute("DROP TABLE IF EXISTS acid.records")
    assertThrows[IllegalArgumentException] { sess.table("acid.records") }
  }

  test("unsupported statement shapes fail loudly, not silently") {
    val (_, reg) = freshTable()
    assertThrows[IllegalArgumentException] {
      AcidSql.execute(spark, reg, "DELETE FROM acid.records WHERE dataValue = 'x'")
    }
    assertThrows[IllegalArgumentException] {
      AcidSql.execute(spark, reg, "SELECT 1")
    }
    assertThrows[IllegalArgumentException] {
      AcidSql.execute(spark, reg, "DELETE FROM unknown.tbl WHERE primaryKeyValue = 'a'")
    }
  }
}
