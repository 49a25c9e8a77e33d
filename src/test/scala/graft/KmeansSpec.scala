package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Semantics of the Lloyd k-means training query (`q_embed_kmeans`):
  * assignment is a total function of the corpus, cells come from the seed
  * codebook's id range, the trained codebook actually fits better than
  * the seed (the point of the E/M loop), and the whole pipeline is
  * deterministic run-to-run. Cross-engine equality is the driver's
  * oracle gate.
  */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("kmeans: total assignment, seed-range cells, training improves the fit, deterministic") {
    val out = SparkEntry.queries("q_embed_kmeans")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong == n, "every vector must be assigned")
    assert(out.map(_._1).distinct.length == out.length, "exactly once each")
    assert(out.forall(t => t._2 >= 0 && t._2 < 8), "cells come from the seed id range")

    // the trained codebook must fit better than the seed codebook: mean
    // best-cosine after 2 Lloyd iterations > mean best-cosine against the
    // raw seed centroids (recomputed here independently of the query)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), VectorOps.norm(col("embedding")).as("nrm"))
    val seed = e.filter(col("vec_id") < 8)
      .select(col("embedding").as("c_vec"), col("nrm").as("c_nrm"))
    val seedMean = e.join(broadcast(seed), lit(true))
      .withColumn("c_cos",
        VectorOps.dot(col("embedding"), col("c_vec")) / (col("nrm") * col("c_nrm")))
      .groupBy(col("vec_id")).agg(max(col("c_cos")).as("best"))
      .agg(avg(col("best"))).collect().head.getDouble(0)
    val trainedMean = out.map(_._3).sum / out.length
    assert(trainedMean > seedMean,
      f"training did not improve the fit: trained $trainedMean%.4f vs seed $seedMean%.4f")

    // deterministic run-to-run (fixed seed, fixed-point M-step)
    val again = SparkEntry.queries("q_embed_kmeans")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Double]("cos")))
    assert(out.toSeq == again.toSeq)
  }
}
