package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SubwordCountExpr
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The greedy longest-match subword tokenizer's contract: the native
  * expression must equal a direct reference implementation of the
  * WordPiece inference rule on arbitrary strings (including words outside
  * the vocabulary, multi-byte chars, and boundary overlaps), and the
  * codegen path must equal the interpreted eval.
  */
class SubwordSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Straight-line reference: longest piece at the cursor, else 1 char. */
  private def reference(w: String): Long = {
    var pos = 0; var cnt = 0L
    while (pos < w.length) {
      val lens = SubwordCountExpr.Vocab
        .filter(p => w.startsWith(p, pos)).map(_.length)
      pos += (if (lens.isEmpty) 1 else lens.max)
      cnt += 1
    }
    cnt
  }

  test("native count equals the reference rule on corpus and adversarial words") {
    val words = Seq(
      "table", "window", "customer", "query", "value", "stream", "column",
      "vector", "filter", "order", "sort", "a", "the", "", "zzz", "tab",
      "tablescan", "aggagg", "keykey", "ta", "quer", "windowstream",
      "érydow", "日本table", "custcust", "omeromer", "xtable", "tablex")
    words.foreach { w =>
      assert(SubwordCountExpr.countPieces(UTF8String.fromString(w)) === reference(w),
        s"mismatch for '$w'")
    }
  }

  test("greedy is longest-match, not first-match") {
    // "agg" must consume as ONE piece though "a" also matches at pos 0
    assert(SubwordCountExpr.countPieces(UTF8String.fromString("agg")) === 1L)
    // "sort" (4) beats "s"-fallback; "spark" (5) beats nothing shorter
    assert(SubwordCountExpr.countPieces(UTF8String.fromString("sortspark")) === 2L)
  }

  test("codegen path equals interpreted eval over the corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaExpr = docs
      .select(explode(split(trim(col("text")), " ")).as("wd")).distinct()
      .select(col("wd"), TextHash.subwordCount(col("wd")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaExpr.foreach { case (w, n) =>
      assert(n === reference(w), s"codegen diverged for '$w'")
    }
    assert(viaExpr.nonEmpty)
  }
}
