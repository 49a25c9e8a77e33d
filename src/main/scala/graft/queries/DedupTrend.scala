package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** SF-trend probe for the dedup family's CANDIDATE volumes.
  *
  * The four banded/prefix candidate generators are the places a quadratic
  * blowup would hide: each is sub-quadratic only as long as its buckets
  * stay small, and a bench second-count alone cannot distinguish "healthy
  * n·log n growth" from "n² arriving". This main counts the DISTINCT
  * candidate pairs each generator feeds its verifier at one scale factor;
  * run it across SFs and the growth curve is the regression gate
  * (recorded in BASELINE.md).
  *
  * Candidate stages mirror the live queries (cited), not a private fork:
  *  - simhash banded pairs    — TextQueries `q_dedup_simhash_pairs`
  *  - minhash LSH band pairs  — TextQueries `q_dedup_minhash_lsh`
  *  - jaccard prefix pairs    — TextQueries.jaccardPairs candidates
  *  - containment probe pairs — PipelineQueries `q_dedup_containment`
  *
  * Usage: `runMain graft.queries.DedupTrend /root/testdata/sf0.01`
  * Prints one JSON line: {"sf":dir,"docs":N,"simhash_cand":...}
  */
object DedupTrend {

  def counts(s: SparkSession, dir: String): Map[String, Long] = {
    val sh = TextQueries.hashedShingleSets(s, dir)
    val docs = sh.count()

    // simhash: 4 x 16-bit bands, same-lang, doc_a < doc_b
    val sim = TextQueries.simhashDF(s, dir).persist()
    val simBanded = sim.select(col("doc_id"), col("lang"),
      posexplode(array(Seq.tabulate(4)(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band_idx", "band_val")))
    val simCand = simBanded.as("a").join(simBanded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.lang") === col("b.lang")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).dropDuplicates().count()
    sim.unpersist()

    // minhash LSH: 4 bands of 4 minhashes over the 16-perm signature
    val P = TextHash.P
    val sigs = sh.select(col("doc_id"),
        transform(sequence(lit(0L), lit(15L)),
          j => array_min(transform(col("hs"), h => TextHash.minhashPerm(j, h)))).as("sig"))
      .withColumn("bands", transform(sequence(lit(0), lit(3)), b =>
        (get(col("sig"), b * 4) * lit(29791L)
          + get(col("sig"), b * 4 + 1) * lit(961L)
          + get(col("sig"), b * 4 + 2) * lit(31L)
          + get(col("sig"), b * 4 + 3)) % lit(P)))
    val mhBanded = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val mhCand = mhBanded.as("a").join(mhBanded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).dropDuplicates().count()

    // jaccard: df-ascending prefix inverted-index join (first ds/5+1 of hd)
    val jTok = sh.select(col("lang"), col("doc_id"),
      explode(expr("slice(hd, 1, ds div 5 + 1)")).as("tok"))
    val jCand = jTok.as("a").join(jTok.as("b"),
        col("a.lang") === col("b.lang") && col("a.tok") === col("b.tok")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).dropDuplicates().count()

    // containment: rare-token probe (first ds/10+1 of hd) vs full index
    val cIndex = sh.select(col("lang"), col("doc_id"), explode(col("hs")).as("tok"))
    val cProbe = sh.select(col("lang"), col("doc_id"),
      explode(expr("slice(hd, 1, ds div 10 + 1)")).as("tok"))
    val cCand = cProbe.as("a").join(cIndex.as("b"),
        col("a.lang") === col("b.lang") && col("a.tok") === col("b.tok")
          && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .dropDuplicates().count()

    Map("docs" -> docs, "simhash_cand" -> simCand, "minhash_cand" -> mhCand,
      "jaccard_cand" -> jCand, "containment_cand" -> cCand)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dedup-trend").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val c = counts(spark, dir)
    println(s"""{"sf":"$dir","docs":${c("docs")},"simhash_cand":${c("simhash_cand")},""" +
      s""""minhash_cand":${c("minhash_cand")},"jaccard_cand":${c("jaccard_cand")},""" +
      s""""containment_cand":${c("containment_cand")}}""")
    // caches must be released while the context is still alive — unpersist
    // after stop() throws (SparkContext already shut down)
    TextQueries.clearShingleCache()
    TextQueries.cleanupSignatureStores()
    spark.stop()
  }
}
