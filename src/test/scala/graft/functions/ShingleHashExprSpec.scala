package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleHashExpr
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native shingle-hash expression must be BIT-EQUIVALENT (as a
  * multiset — consumers sort or count) to the HOF semantic definition
  * `transform(wordShingles(text, 2), polyHash)` on the corpus and on
  * adversarial strings: consecutive/leading/trailing spaces (empty words),
  * repeated shingles (distinctness on the STRING, pre-hash), single-word
  * and empty documents, multi-byte codepoints.
  */
class ShingleHashExprSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def both(texts: Seq[String]): Seq[(Seq[Long], Seq[Long])] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        sort_array(ShingleHashExpr.column(col("text"))).as("native"),
        sort_array(transform(TextHash.wordShingles(col("text"), 2),
          x => TextHash.polyHashHof(x))).as("hof"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1))).toSeq
  }

  test("native equals the HOF definition on adversarial strings") {
    val texts = Seq(
      "", " ", "one", "one two", "one two three",
      "a  b", "  lead", "trail  ", "a a a a", "x y x y x y",
      "é ü 日本 語", "tab\tnot split", "a " + "b " * 50,
      "same same same", "w1 w2 w1 w2 w3")
    both(texts).zip(texts).foreach { case ((n, h), t) =>
      assert(n === h, s"divergence for ${t.take(30).replace("\n", "\\n")}")
    }
  }

  test("native equals the HOF definition over the sf0.001 corpus") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    assert(texts.nonEmpty)
    both(texts).foreach { case (n, h) => assert(n === h) }
  }

  test("distinctness is on the shingle STRING and sz counts distinct shingles") {
    import spark.implicits._
    val r = Seq("p q p q").toDF("text")
      .select(ShingleHashExpr.column(col("text")).as("hv"))
      .select(size(col("hv"))).as[Int].collect().head
    // shingles: "p q", "q p", "p q"(dup) -> 2 distinct
    assert(r === 2)
  }
}
