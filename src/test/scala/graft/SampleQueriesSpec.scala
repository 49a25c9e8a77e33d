package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the data-mixture operators (SampleQueries): deterministic
  * hash sampling must be reproducible and partitioning-independent, the
  * rebalance must actually flatten the language mixture, and the mixture
  * plan's integer arithmetic must be self-consistent. (Cross-engine
  * equality is the driver's oracle gate; these pin the Spark-side
  * properties a refactor could silently lose.)
  */
class SampleQueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("lang rebalance: kept counts concentrate near the smallest language") {
    val d = Tables.documents(spark, sf)
    val perLang = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = perLang.values.min

    val kept = run("q_sample_lang_rebalance").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    perLang.keys.foreach { lang =>
      val k = kept.getOrElse(lang, 0L)
      assert(k <= perLang(lang), s"$lang kept more than exists")
      // Bernoulli with expectation = minCnt per language; allow wide
      // (±60%) slack so only a broken rate, not hash variance, fails
      assert(k >= (minCnt * 0.4).toLong && k <= (minCnt * 1.6).toLong,
        s"$lang kept $k, expected ≈$minCnt (all langs: $kept)")
    }
  }

  test("rebalance selection is deterministic across runs") {
    // (partitioning-independence follows from the keep decision being a
    // pure row function of text and the broadcast budgets — there is no
    // partition-dependent input to regress; this pins run-to-run
    // determinism, which rand()-based sampling would break)
    val a = run("q_sample_lang_rebalance").collect().map(_.toString).sorted
    val b = run("q_sample_lang_rebalance").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("temperature sampling: kept counts track the geometric mean sqrt(min*n) per cell") {
    val d = Tables.documents(spark, sf)
    val perCell = d.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val minCnt = perCell.values.min

    val kept = run("q_sample_temperature").groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    perCell.foreach { case (cell, n) =>
      assert(kept.getOrElse(cell, 0L) <= n, s"$cell kept more than exists")
    }
    // per-cell counts are 1-6 docs at this SF — Bernoulli noise swamps any
    // per-cell bound, so pin the statistic where it concentrates: total
    // kept vs the summed expectation Σ sqrt(min·n_g) (n≈500 trials)
    val total = kept.values.sum.toDouble
    val expected = perCell.values.map(n => math.sqrt(minCnt.toDouble * n)).sum
    assert(total >= expected * 0.6 && total <= expected * 1.4,
      s"total kept $total, expected ≈$expected")
    // α=1/2 must sit strictly between equalize-all and keep-all overall
    assert(total > minCnt * perCell.size && total < perCell.values.sum,
      s"total kept $total outside (equalized ${minCnt * perCell.size}, full ${perCell.values.sum})")
  }

  test("exact-budget sampling keeps EXACTLY min_cnt documents per language, deterministically") {
    val d = Tables.documents(spark, sf)
    val minCnt = d.groupBy("lang").count().collect().map(_.getLong(1)).min
    val kept = run("q_sample_exact_budget").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the defining property Bernoulli cannot give: exact quotas
    kept.foreach { case (lang, k) =>
      assert(k == minCnt, s"$lang kept $k, quota is exactly $minCnt")
    }
    val a = run("q_sample_exact_budget").collect().map(_.toString).sorted
    val b = run("q_sample_exact_budget").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("temperature selection is deterministic and independent of the rebalance stream") {
    val a = run("q_sample_temperature").collect().map(_.toString).sorted
    val b = run("q_sample_temperature").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // different salt ⇒ not the same doc set as the uniform rebalance
    // (statistically: identical streams would make the two samples nest)
    val reb = run("q_sample_lang_rebalance").collect().map(_.getAs[Long]("doc_id")).toSet
    val tmp = a.map(_.split(",")(0).stripPrefix("[")).map(_.toLong).toSet
    assert((tmp -- reb).nonEmpty && (reb -- tmp).nonEmpty,
      "temperature sample nests inside the rebalance sample — salts collided")
  }

  test("mixture plan: budget is the smallest language's tokens; permille consistent") {
    val rows = run("q_mixture_plan").collect()
    val tokens = rows.map(r => r.getAs[Long]("n_tokens"))
    val budget = rows.head.getAs[Long]("token_budget")
    assert(budget == tokens.min)
    rows.foreach { r =>
      val exp = budget * 1000 / r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("keep_permille") == exp)
      assert(r.getAs[Long]("keep_permille") <= 1000)
    }
    // exactly the language inventory, once each
    assert(rows.map(_.getAs[String]("lang")).distinct.length == rows.length)
  }

  test("boilerplate: every doc scored once, ratio = n_boiler/n_shingles in [0,1]") {
    val rows = run("q_text_boilerplate").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "docs with ≥2 words must all be scored")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val b = r.getAs[Long]("n_boiler")
      assert(b >= 0 && b <= n)
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(math.abs(ratio - math.round(b.toDouble / n * 10000) / 10000.0) < 1e-9)
    }
    // the threshold must be non-degenerate on this corpus
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0))
  }

  test("lm score: all docs scored, surprisal positive and below the rarest-term bound") {
    val rows = run("q_text_lm_score").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    // upper bound: a doc of only hapax terms scores ln(T/1) micro-nats
    val totalTokens = rows.map(_.getAs[Long]("ntok")).sum
    // round, not truncate: an all-hapax doc scores round(ln(T)*1e6) exactly
    val bound = math.round(math.log(totalTokens.toDouble) * 1e6)
    rows.foreach { r =>
      val m = r.getAs[Long]("mean_micronats")
      assert(m > 0 && m <= bound, s"mean surprisal $m outside (0, $bound]")
    }
  }

  test("bigram LM: all docs scored over all tokens; fits better than the unigram LM") {
    val bi = run("q_text_lm_bigram").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("mean_micronats")))).toMap
    val un = run("q_text_lm_score").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ntok"), r.getAs[Long]("mean_micronats")))).toMap
    assert(bi.keySet == un.keySet, "both LMs must score the same documents")
    // the bigram scorer covers every token: first token (unigram term) +
    // one transition per remaining token
    bi.foreach { case (doc, (ntok, m)) =>
      assert(ntok == un(doc)._1, s"doc $doc token coverage differs")
      assert(m > 0, s"doc $doc surprisal must be positive")
    }
    // a corpus-trained interpolated bigram must beat the unigram fit in
    // aggregate (that's what conditioning buys; per-doc it may lose)
    val biMean = bi.values.map(_._2).sum / bi.size
    val unMean = un.values.map(_._2).sum / un.size
    assert(biMean < unMean,
      s"bigram LM ($biMean micro-nats) did not improve on unigram ($unMean)")
  }

  test("token chunks: sizes within [8,32] and every token of a doc is covered") {
    val chunks = run("q_text_chunk").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text")))
    assert(chunks.nonEmpty)
    chunks.foreach { case (_, s0, n, text) =>
      // a doc's first window is kept whatever its size (short docs must
      // not vanish); later windows are only kept at >= 8 tokens
      assert(n <= 32 && (n >= 8 || s0 == 1L))
      assert(text.split(" ").length.toLong == n, "chunk_text length must equal n_tokens")
    }
    // stride 24 < size 32, and tails shorter than the 8-token overlap are
    // dropped only when the previous window already covers them → the
    // union of [tok_start, tok_start+n) must cover 1..ntok exactly
    val ntok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_._1)
    // no document may vanish from the chunked output
    assert(byDoc.keySet == ntok.keySet,
      s"docs without chunks: ${ntok.keySet -- byDoc.keySet}")
    byDoc.foreach { case (doc, cs) =>
      val covered = cs.flatMap(c => c._2 until (c._2 + c._3)).toSet
      assert(covered == (1L to ntok(doc)).toSet,
        s"doc $doc: chunk union ${covered.size} tokens, doc has ${ntok(doc)}")
    }
  }

  test("chunking keeps a short document as one small chunk instead of dropping it") {
    // the shipped testdata has no <8-token docs, so pin the edge on a
    // synthetic corpus: a 3-token doc must yield exactly its first window
    val dirPath = java.nio.file.Files.createTempDirectory("chunk-short-")
    val dir = dirPath.toString
    try {
      import spark.implicits._
      Seq(
        (1L, "a b c", "en", "srcX", 5L),
        (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "srcX", 120L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("q_text_chunk")(spark, dir).collect()
      val short = out.filter(_.getAs[Long]("doc_id") == 1L)
      assert(short.length == 1 && short.head.getAs[Long]("n_tokens") == 3L
        && short.head.getAs[String]("chunk_text") == "a b c")
      // the 40-token doc gets windows at 1 and 25 (tail 25..40 has 16 >= 8)
      val long = out.filter(_.getAs[Long]("doc_id") == 2L).map(_.getAs[Long]("tok_start")).sorted
      assert(long.sameElements(Array(1L, 25L)), s"got starts ${long.toSeq}")
    } finally {
      // don't leak a temp tree per run (the repo otherwise cleans its stores)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("shard shuffle: exact partition of the corpus, contiguous pos per shard, deterministic") {
    val rows = run("q_sample_shards").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos"), r.getAs[Long]("ntok")))
    val nDocs = Tables.documents(spark, sf).count()
    // a shuffle is a PERMUTATION: every doc appears exactly once
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, g) =>
      assert(shard >= 0 && shard < 8, s"shard $shard out of range")
      // pos is a contiguous 1..n ordinal within the shard
      assert(g.map(_._3).sorted.toSeq == (1L to g.length.toLong),
        s"shard $shard positions not contiguous")
    }
    // all 8 shards populated and no shard hogs the corpus (hash balance)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 8L).toSet, s"empty shards: $sizes")
    assert(sizes.values.max < nDocs / 2, s"degenerate shard balance: $sizes")
    // deterministic run-to-run (the whole point vs rand()-keyed shuffles)
    val again = run("q_sample_shards").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == again.toSet)
  }

  test("curriculum: 4 near-equal phases per language, ordered by quality") {
    val rows = run("q_sample_curriculum").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("phase"),
        r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val byPhase = g.groupBy(_._2).view.mapValues(_.length).toMap
      assert(byPhase.keySet == Set(1L, 2L, 3L, 4L), s"$lang phases: $byPhase")
      // ntile: equal-depth buckets, sizes differing by at most one
      assert(byPhase.values.max - byPhase.values.min <= 1, s"$lang sizes: $byPhase")
      // phase order respects quality order (ties may straddle boundaries)
      (1L to 3L).foreach { ph =>
        assert(g.filter(_._2 == ph).map(_._3).max
          <= g.filter(_._2 == ph + 1).map(_._3).min,
          s"$lang: phase $ph quality exceeds phase ${ph + 1}")
      }
    }
  }

  test("context packing: offsets are running token sums within each sub-shard") {
    val rows = run("q_pack_context").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("shard"), r.getAs[Long]("doc_id"), r.getAs[Long]("ntok"),
        r.getAs[Long]("bin"), r.getAs[Long]("bin_offset")))
    // round 10: the packing stream is (lang, source, shard) — budgets
    // must stay exact within each salted sub-shard
    val groups = rows.groupBy(t => (t._1, t._2, t._3))
    assert(groups.size > rows.map(t => (t._1, t._2)).distinct.size,
      "sub-sharding should split (lang, source) cells into multiple streams")
    groups.foreach { case (_, shard) =>
      val inOrder = shard.sortBy(_._4)
      var cum = 0L
      inOrder.foreach { case (_, _, _, _, ntok, bin, off) =>
        assert(bin == cum / 256 && off == cum % 256,
          s"expected bin=${cum / 256} offset=${cum % 256}, got $bin/$off")
        cum += ntok
      }
    }
  }
}
