package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("polyHash matches the closed-form fold (cross-engine contract)") {
    // "abc" → ((0*31+97)*31+98)*31+99 = 96354, the same value the DuckDB
    // oracle rendering computes (verified in the driver gate)
    val out = Seq("abc", "", "a b").toDF("s")
      .select(TextHash.polyHash(col("s")).as("h")).as[Long].collect()
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextHash.P)
    assert(out.toSeq == Seq(ref("abc"), 0L, ref("a b")))
  }

  test("wordShingles: distinct n-grams, short-document guard") {
    val out = Seq("a b c", "a", "a b a b").toDF("s")
      .select(TextHash.wordShingles(col("s"), 2).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c"))
    assert(out(1) == Seq.empty) // 1 word, no bigram — must NOT produce a descending range
    assert(out(2) == Seq("a b", "b a")) // distinct
  }

  test("minhashPerm is a permutation family: distinct inputs stay distinct") {
    val hs = (0L until 1000L)
    (0 to 3).foreach { j =>
      val mapped = hs.map(h => ((2 * j + 1) * h + 7919L * j) % TextHash.P)
      assert(mapped.distinct.size == hs.size)
    }
  }
}
