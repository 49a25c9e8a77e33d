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
}
