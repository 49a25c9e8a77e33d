package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form semantics of the round-8 text additions on synthetic
  * corpora where the expected answer is computable by hand:
  * `q_text_span_dedup` (duplicated-8-gram coverage) and `q_text_bm25`
  * (Okapi BM25 top-k). Cross-engine equality is the driver's oracle gate;
  * these pin the Spark-side semantics against hand-derived values so a
  * formulation change cannot drift both engines together.
  */
class TextSpanBm25Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withCorpus(docs: Seq[(Long, String)])(f: String => Unit): Unit = {
    val dirPath = java.nio.file.Files.createTempDirectory("textspec-")
    try {
      import spark.implicits._
      docs.map { case (id, t) => (id, t, "en", "srcX", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dirPath/documents.parquet")
      f(dirPath.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def spanRows(dir: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("q_text_span_dedup")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_ratio")))).toMap

  test("span dedup: a cross-document shared 8-gram covers exactly its positions") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    withCorpus(Seq(
      (1L, s"a b $shared x y z q r"), // 15 tokens, span at positions 3..10
      (2L, s"c d e $shared u v"),     // 13 tokens, span at positions 4..11
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")) // no duplicated span
    )) { dir =>
      val out = spanRows(dir)
      // only the s1..s8 8-gram repeats (its shifted variants embed
      // different context words), so coverage is exactly 8 tokens
      assert(out(1L) == ((15L, 8L, 0.5333)))
      assert(out(2L) == ((13L, 8L, 0.6154)))
      assert(out(3L) == ((12L, 0L, 0.0)))
    }
  }

  test("span dedup: WITHIN-document repetition counts, overlapping spans union") {
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    withCorpus(Seq(
      // s1..s8 at positions 1 and 10 — a within-doc repeat; covered
      // positions are 1..8 ∪ 10..17 = 16 of 17 tokens
      (1L, s"$s8 m $s8"),
      (2L, "lone words only here nothing repeats at all") // 8 tokens, unique
    )) { dir =>
      val out = spanRows(dir)
      assert(out(1L) == ((17L, 16L, 0.9412)))
      assert(out(2L) == ((8L, 0L, 0.0)))
    }
  }

  test("span dedup: documents shorter than 8 tokens have no spans, ratio 0") {
    withCorpus(Seq((1L, "a b c"), (2L, "a b c"))) { dir =>
      val out = spanRows(dir)
      assert(out(1L) == ((3L, 0L, 0.0)))
      assert(out(2L) == ((3L, 0L, 0.0)))
    }
  }

  test("bm25: scores match the closed-form Okapi computation and rank correctly") {
    withCorpus(Seq(
      (1L, "spark merge spark alpha"), // dl=4, tf: spark 2, merge 1
      (2L, "beta gamma delta"),        // dl=3, no query terms → score 0
      (3L, "vector merge")             // dl=2, tf: vector 1, merge 1
    )) { dir =>
      val out = SparkEntry.queries("q_text_bm25")(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
          r.getAs[Long]("rk")))
      // N=3, sum_dl=9, avgdl=3; df_spark=1, df_merge=2, df_vector=1
      def idf(df: Double) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
      def contrib(tf: Double, df: Double, dl: Double) =
        (idf(df) * (tf * 2.2)) / (tf + 1.2 * (0.25 + 0.75 * dl / (9.0 / 3.0)))
      def score(tfS: Double, tfM: Double, tfV: Double, dl: Double) =
        contrib(tfS, 1, dl) + contrib(tfM, 2, dl) + contrib(tfV, 1, dl)
      val expect = Map(
        1L -> score(2, 1, 0, 4), 2L -> 0.0, 3L -> score(0, 1, 1, 2))
      assert(out.length == 3) // top-25 over 3 docs returns all
      out.foreach { case (id, sc, _) =>
        assert(math.abs(sc - expect(id)) < 1e-6,
          s"doc $id score $sc != closed form ${expect(id)}")
      }
      // doc 3 (two rarer terms, short doc) outranks doc 1; zero-hit last
      assert(out.sortBy(_._3).map(_._1).toSeq == Seq(3L, 1L, 2L))
    }
  }
}
