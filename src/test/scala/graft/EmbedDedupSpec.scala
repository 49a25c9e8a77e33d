package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The embedding near-dedup scale paths must reproduce the all-pairs
  * witness (`q_dedup_embed_cosine`) exactly:
  *  - `q_dedup_embed_cosine_blocked` is exact BY CONSTRUCTION (same dots,
  *    reorganized into block-pair tasks) — equality must hold at every SF;
  *  - `q_dedup_embed_cosine_lsh` is exact on this corpus because the
  *    (P=4, L=16, probe≤1) family was verified lossless against the actual
  *    data at sf0.001 and sf0.01 — this spec is that verification, kept
  *    running so a parameter or plane-family change that silently drops a
  *    borderline pair (min true cosine 0.4227 vs threshold 0.42) fails CI
  *    instead of shipping.
  */
class EmbedDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rows(name: String, sf: String): Seq[(Long, Long, Double)] = {
    val df: DataFrame = SparkEntry.queries(name)(spark, s"/root/testdata/$sf")
    df.collect().toSeq.map(r =>
      (r.getLong(r.fieldIndex("vec_a")), r.getLong(r.fieldIndex("vec_b")),
        r.getDouble(r.fieldIndex("cos"))))
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    lazy val witness = rows("q_dedup_embed_cosine", sf)

    test(s"blocked pair scan equals the all-pairs witness at $sf") {
      val blocked = rows("q_dedup_embed_cosine_blocked", sf)
      assert(blocked == witness)
      assert(witness.nonEmpty)
    }

    test(s"LSH candidate generation is lossless at 0.42 at $sf") {
      val lsh = rows("q_dedup_embed_cosine_lsh", sf)
      assert(lsh == witness)
    }

    test(s"semantic dedup keep rule = within-cell restriction of the witness at $sf") {
      // q_dedup_semantic drops vector b iff some a < b in the SAME CELL has
      // cos(a, b) >= 0.42. The all-pairs witness restricted to same-cell
      // pairs is therefore the exact reference for the drop set, and the
      // difference (witness pairs straddling cells) is the approximation
      // SemDeDup-style clustering declares.
      val out = SparkEntry.queries("q_dedup_semantic")(spark, s"/root/testdata/$sf")
        .collect().map(r => (r.getLong(r.fieldIndex("vec_id")),
          r.getLong(r.fieldIndex("cell")), r.getBoolean(r.fieldIndex("kept"))))
      val cell = out.map(t => t._1 -> t._2).toMap
      val dropped = witness.filter { case (a, b, _) => cell(a) == cell(b) }
        .map(_._2).toSet
      out.foreach { case (id, _, kept) =>
        assert(kept == !dropped.contains(id),
          s"vec $id kept=$kept disagrees with the within-cell pair relation")
      }
      // the threshold/clustering must be non-degenerate on this corpus
      assert(dropped.nonEmpty, "no within-cell near-dup pairs — test lost its teeth")
    }
  }
}
