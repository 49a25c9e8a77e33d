package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quantized ANN is an accuracy/cost trade; this spec makes the accuracy
  * side a number that cannot silently rot. `q_sim_topk_sq8` ranks by
  * int8-quantized dot products — against the exact-cosine brute-force
  * top-k it must keep high recall on the actual test corpora (measured
  * 1.0 at both SFs when written; the floor leaves room for legitimate
  * re-quantization tweaks, not for a broken quantizer, whose recall
  * collapses toward the random ~k/n floor).
  */
class SimilarityRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def topk(name: String, sf: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, s"/root/testdata/$sf")
      .collect().toSeq
      .map(r => (r.getLong(r.fieldIndex("q_id")), r.getLong(r.fieldIndex("neighbor_id"))))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"sq8 quantized top-k keeps recall >= 0.8 vs exact brute force ($sf)") {
      val exact = topk("q_sim_topk_brute", sf)
      val quant = topk("q_sim_topk_sq8", sf)
      assert(exact.keySet == quant.keySet, "query sets differ")
      val recalls = exact.map { case (q, e) =>
        quant(q).intersect(e).size.toDouble / e.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.8, f"mean recall@5 $mean%.3f below floor (per-query: $recalls)")
    }
  }

  test("embed-LSH near-dup keeps recall >= 0.95 vs the blocked exact witness at the bench SF") {
    // Round-7 verdict #2: the LSH path is lossless at the oracle SFs
    // (sf0.001/sf0.01 — EmbedDedupSpec asserts set equality), but the bench
    // runs at sf0.1 where (P=4, L=8, probe<=1) measures 97.3% recall
    // (429/441 pairs) with, previously, NO gate — a re-tune could have
    // dropped it silently. This is the declared floor at the bench SF: a
    // probe/plane change that costs recall now fails here, loudly.
    val dir = "/root/testdata/sf0.1"
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(r.fieldIndex("vec_a")), r.getLong(r.fieldIndex("vec_b"))))
        .toSet
    val exact = pairs("q_dedup_embed_cosine_blocked")
    val lsh = pairs("q_dedup_embed_cosine_lsh")
    // the LSH path verifies candidates with exact cosine, so false
    // positives are impossible by construction — pin that too
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-pairs (verification broke): ${(lsh -- exact).take(5)}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.95,
      f"embed-LSH recall $recall%.3f (${lsh.size}/${exact.size} pairs) below the declared 0.95 floor")
  }
}
