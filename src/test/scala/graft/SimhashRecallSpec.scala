package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Pins `q_dedup_simhash_pairs`' recall SEMANTICS (round-6 ADVICE: the
  * 24→64-bit re-band silently tightened the near-dup criterion, and no
  * gate covered it).
  *
  * The declared operating point is the Manku et al. web-dedup standard —
  * 64-bit SimHash, Hamming ≤ 3 — which targets NEAR-IDENTICAL documents
  * (on this corpus's 40-200-word docs a single substituted word already
  * costs ~4 expected signature bits, so word-level Jaccard-0.8 pairs are
  * intentionally OUT of scope; `q_dedup_ngram_jaccard` owns that band).
  * Two gates:
  *
  *  1. BANDING LOSSLESSNESS — the 4×16-bit band join must produce exactly
  *     the brute-force `bit_count(xor) <= 3` pair set (pigeonhole: ≤3
  *     differing bits cannot touch all four bands). This is the property
  *     a future re-band most easily breaks.
  *  2. MUTATION SENSITIVITY — exact clones must always be caught
  *     (hamming 0), and the median hamming of one-word-substituted
  *     clones must stay inside a pinned band. The corpus and mutation
  *     are deterministic, so the medians are constants of the code, not
  *     statistical bounds; a signature-family / bit-count / banding
  *     change that shifts the operating point moves them immediately.
  */
class SimhashRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"banded pairs == brute-force hamming<=3 pairs ($sf)") {
      val sh = TextQueries.simhashOf(docs(sf)).persist()
      val banded = TextQueries.simhashPairsOf(sh)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = sh.as("a").join(sh.as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id")
            && bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sh.unpersist()
      assert(banded == brute,
        s"banding lost ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
    }
  }

  test("exact clones always collide; one-word mutation sensitivity stays pinned") {
    val base = docs("sf0.001")
      .filter(size(split(trim(col("text")), " ")) >= 40)
      .persist()
    val n = base.count()
    assert(n >= 100, s"corpus too small for the gate ($n docs)")

    def cloned(mutate: Boolean) = base.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("lang"),
      (if (!mutate) col("text")
       else concat_ws(" ", transform(split(trim(col("text")), " "),
         (w, i) => when(i === 7, concat(w, lit("zq"))).otherwise(w)))).as("text"))

    // exact clones: the full pair query must catch every one (hamming 0)
    val exactCaught = TextQueries.simhashPairsOf(
        TextQueries.simhashOf(base.unionByName(cloned(mutate = false))))
      .filter(col("doc_b") >= 1000000L && col("doc_a") === col("doc_b") - 1000000L)
      .count()
    assert(exactCaught == n, s"an exact clone must be hamming-0 ($exactCaught of $n caught)")

    // one-word mutation: pin the SENSITIVITY of the signature, not a
    // recall number the short synthetic docs cannot honestly support
    // (their distinct vocabularies are small, so one substituted word
    // legitimately moves several bits — median hamming measured 7 at
    // spec-writing, recall@<=3 only ~0.07; word-level near-dup at THAT
    // band is q_dedup_ngram_jaccard's job). A future change to the hash
    // family, bit count, or banding that silently loosens or tightens
    // the operating point moves this median far before any oracle row
    // notices: a 24-bit signature halves it, a broken mixing family
    // pushes it toward 32 (random).
    val sh = TextQueries.simhashOf(base.unionByName(cloned(mutate = true)))
    val hams = sh.as("a").join(sh.as("b"),
        col("a.doc_id") === col("b.doc_id") - 1000000L)
      .select(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(hams.length == n)
    val median = hams(hams.length / 2)
    assert(median >= 2 && median <= 14,
      s"one-word-mutation median hamming $median left the pinned [2,14] band " +
        "(measured 7 at spec-writing; drift means the signature family or " +
        "bit count changed semantics)")
    base.unpersist()
    ()
  }
}
