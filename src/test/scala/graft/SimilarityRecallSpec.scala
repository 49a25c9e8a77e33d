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

  test("PQ shortlist+rerank keeps recall >= 0.75 vs the exact scan at the bench SF") {
    // The PQ gate's two-stage shape (ADC top-100 shortlist → exact
    // rerank) stands on the shortlist not losing the true neighbors:
    // measured 0.84 at sf0.1 / 0.86 at sf0.01 when written (M=8, K=16,
    // SHORT=100). A codebook, seeding, or quantization regression
    // collapses this toward the random SHORT/n floor (~0.05) — the 0.75
    // floor leaves tuning headroom, not brokenness headroom. The witness
    // is the same integer-L2 exact ranking the rerank stage uses, so the
    // comparison isolates exactly the shortlist's loss.
    val dir = "/root/testdata/sf0.1"
    val pq = SparkEntry.queries("q_sim_topk_pq")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("vec_id"))))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    // exact integer-L2 witness over the same quantized vectors
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val qe = Tables.embeddings(spark, dir).select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1e6).cast("long")).as("q"))
    val d2 = aggregate(zip_with(col("qq"), col("q"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("vec_id"))
    val exact = qe.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
      .crossJoin(qe)
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("vec_id"))))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    assert(exact.keySet == pq.keySet, "query sets differ")
    val recalls = exact.map { case (q, e) => pq(q).intersect(e).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.75, f"PQ recall@5 $mean%.3f below the 0.75 floor (per-query: $recalls)")
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
