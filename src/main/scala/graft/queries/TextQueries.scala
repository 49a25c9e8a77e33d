package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PositionalEqCount
import org.apache.spark.sql.graft.SortedLongIntersectCount.intersectCount

import graft.Tables
import graft.functions.TextHash

/** North-star text surface (SURVEY §2C C42/C43/C45): text analysis,
  * document fingerprinting, and the dedup family (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash) over the `documents` table.
  *
  * Scale posture: every pipeline here is shuffle-minimal — per-document
  * signatures are computed with codegen'd HOFs (no explode of
  * doc×shingle rows except where the algorithm itself needs the
  * inverted index), and candidate generation goes through LSH band
  * buckets rather than an O(n²) cross join, so the same plan holds when
  * `documents` is 100 TB: band-bucket join shuffles only (band, hash)
  * keys, and the expensive exact-Jaccard verification runs only on
  * candidates.
  */
object TextQueries {

  private val P = TextHash.P

  /** DuckDB rendering of [[TextHash.polyHash]] over an arbitrary SQL expr. */
  private[queries] def sqlPolyHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % $P)""".stripMargin

  /** BPE training rounds shared by the train/apply gates and their
    * oracle-CTE generator — one constant so the Spark loop and the
    * unrolled DuckDB replay can never disagree on k. */
  private val BpeRounds = 8

  /** The BPE training loop (round 18): word-frequency table from ONE
    * corpus pass, then `k` rounds of highest-frequency adjacent-pair
    * merging over `(a)(b)`-encoded symbol strings (ties count DESC,
    * pair ASC — fully deterministic). Returns the FINAL segmentation
    * (wd, syms, cnt — still persisted; caller unpersists) and the merge
    * table (step, lhs, rhs, freq). Corpus text is touched exactly once;
    * each round is a vocabulary-sized codegen hash aggregation + a
    * 1-row TakeOrdered + a map-side literal replace.
    */
  private def bpeTrain(s: SparkSession, dir: String, k: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    val base = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("wd"))
      // \A..\z, not ^..$: Java's $ also matches before a trailing line
      // terminator, so "word\n" would count here yet fail the oracle's
      // regexp_full_match (RE2 whole-string semantics)
      .filter(col("wd").rlike("\\A[a-z]+\\z") && length(col("wd")) >= 2)
      .groupBy("wd").agg(count(lit(1)).as("cnt"))
      .select(col("wd"),
        regexp_replace(col("wd"), "(.)", "($1)").as("syms"), col("cnt"))
    var ws = base.persist()
    // previous generation, kept cached until the CURRENT one has been
    // materialized by a real consumer: each round's pair aggregation is
    // the first action on the freshly-persisted frame, so it materializes
    // the cache AND aggregates in one job — the former nxt.count()
    // materialization job (one per round, k jobs total) was pure fixed
    // cost (guide §1.2: fewer passes). Two vocabulary-sized generations
    // are cached at once, which is the same budget the count() protocol
    // held between count() and unpersist().
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val pairs = ws
        .select(col("cnt"),
          split(expr("substring(syms, 2, length(syms) - 2)"), "\\)\\(").as("ss"))
        .select(col("cnt"), explode(zip_with(
          slice(col("ss"), lit(1), size(col("ss")) - 1),
          slice(col("ss"), lit(2), size(col("ss")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      // ws is materialized now; its parent can release its storage
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, n))
        val nxt = ws.select(col("wd"),
          expr(s"replace(syms, '($l)($r)', '($l$r)')").as("syms"),
          col("cnt")).persist()
        prev = ws; ws = nxt
        step += 1
      }
    }
    // the final generation may be unmaterialized (its pair aggregation
    // never ran): materialize before releasing its parent, or the
    // caller's first action would recompute through an unpersisted
    // lineage all the way down to the raw corpus
    if (prev != null) { ws.count(); prev.unpersist(); prev = null }
    (ws, merges.toSeq)
  }

  /** The DuckDB replay of [[bpeTrain]] as chained CTEs: `wfreq`, `ws0`,
    * then per round i `p_i` (pair counts), `m_i` (the argmax merge), and
    * `ws_i` (the rewritten segmentation, word carried through). */
  private def bpeOracleCtes(k: Int): String = {
    val wfreq = """
          wfreq AS (
            SELECT wd, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
              SELECT unnest(string_split(lower(text), ' ')) AS wd FROM documents)
            WHERE regexp_full_match(wd, '[a-z]+') AND len(wd) >= 2
            GROUP BY wd),
          ws0 AS (
            SELECT wd, regexp_replace(wd, '(.)', '(\1)', 'g') AS syms, cnt FROM wfreq)"""
    val iters = (1 to k).map { i =>
      s"""
          p$i AS (
            SELECT ss[i] AS l, ss[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS n
            FROM (SELECT string_split(trim(syms, '()'), ')(') AS ss, cnt
                  FROM ws${i - 1}) t,
                 LATERAL (SELECT unnest(generate_series(1, len(ss) - 1)) AS i) g
            GROUP BY 1, 2),
          m$i AS (SELECT $i AS step, l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
          ws$i AS (
            SELECT w.wd,
                   CASE WHEN m.l IS NULL THEN w.syms
                        ELSE replace(w.syms, '(' || m.l || ')(' || m.r || ')',
                                     '(' || m.l || m.r || ')') END AS syms,
                   w.cnt
            FROM ws${i - 1} w LEFT JOIN m$i m ON TRUE)"""
    }.mkString(",")
    wfreq + "," + iters
  }

  /** The trained-BPE tokenizer as a LOCAL (word → subword count)
    * DataFrame — materialized BEFORE the training frame unpersists, so
    * plans built on it never re-run the training lineage per action. The
    * map is vocabulary-sized by construction (the same bound the
    * training loop's per-round aggregation rides), and as a local
    * relation its broadcast to a corpus join is the plan we want anyway.
    * Shared by the apply gate and the BPE-budget packing gate.
    */
  private val bpeNtokCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Array[org.apache.spark.sql.Row]]

  private[queries] def bpeTrainedNtok(s: SparkSession, dir: String): DataFrame = {
    // training is deterministic, so gates sharing a session re-use one
    // trained map instead of re-running the 8-round loop per gate
    val vocabRows = bpeNtokCache.getOrElseUpdate((s, dir), {
      val (ws, _) = bpeTrain(s, dir, BpeRounds)
      val rows = ws.select(col("wd"),
        size(split(expr("substring(syms, 2, length(syms) - 2)"), "\\)\\("))
          .cast("long").as("ntok")).collect()
      ws.unpersist()
      rows
    })
    localNtokDf(s,
      vocabRows.toSeq.map(r => (r.getString(0), r.getLong(1))))
  }

  /** A local `(wd STRING, ntok BIGINT)` relation — the broadcastable
    * trained-tokenizer shape the BPE and unigram apply/packing gates
    * share (one definition so the contract cannot drift between the two
    * families). */
  private def localNtokDf(s: SparkSession, rows: Seq[(String, Long)]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("wd",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ntok",
        org.apache.spark.sql.types.LongType)))
    s.createDataFrame(java.util.Arrays.asList(
      rows.map(t => org.apache.spark.sql.Row(t._1, t._2)): _*), schema)
  }

  /** The CTE prefix replaying BPE training into the trained `vocab`
    * (wd → ntok) table — the apply gate's oracle head, shared with the
    * BPE-budget packing gate. */
  private[queries] def bpeVocabOracleCtes: String = s"""
        ${bpeOracleCtes(BpeRounds)},
        vocab AS (
          SELECT wd, CAST(len(string_split(trim(syms, '()'), ')(')) AS BIGINT) AS ntok
          FROM ws$BpeRounds)"""

  /** Unigram-LM (SentencePiece-style) tokenizer training constants,
    * shared by the train/apply gates and their oracle-CTE generator so
    * the Spark loop and the unrolled DuckDB replay cannot disagree. */
  private val UniPieceMax = 4 // max piece length (seed substrings + DP span)
  private val UniRounds = 3 // hard-EM iterations
  private val UniWordMax = 16 // words longer than this are excluded BOTH sides

  /** Viterbi segmentation of one word under integer micro-nat piece
    * costs: minimize total cost; ties prefer the LONGER final piece
    * (deterministic — integer costs, left-to-right positions, k
    * ascending with `<=` so the larger k wins equal totals). Returns the
    * BPE-style `(p1)(p2)…` encoding, or null when no piece path covers
    * the word (callers treat that as a loud invariant breach: round-1
    * vocab contains every single character, and a later round's vocab
    * contains each word's own previous segmentation pieces).
    */
  private def uniViterbi(wd: String, cost: collection.Map[String, Long]): String = {
    val n = wd.length
    val best = new Array[Long](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    val seg = new Array[String](n + 1)
    best(0) = 0L; seg(0) = ""
    var p = 1
    while (p <= n) {
      var k = 1
      while (k <= math.min(UniPieceMax, p)) {
        if (best(p - k) != Long.MaxValue) {
          cost.get(wd.substring(p - k, p)) match {
            case Some(c) =>
              val tot = best(p - k) + c
              if (tot <= best(p)) {
                best(p) = tot
                seg(p) = seg(p - k) + "(" + wd.substring(p - k, p) + ")"
              }
            case None =>
          }
        }
        k += 1
      }
      p += 1
    }
    seg(n)
  }

  /** Micro-nat piece costs from a vocab's counts: `round(ln(T/cnt)·1e6)`
    * — the q_text_lm_score determinism contract (fixed-point BEFORE any
    * comparison/summation; cross-engine parity assumes Math.log and
    * DuckDB ln round identically, as every LM gate already does). */
  private def uniCosts(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val tot = vocab.iterator.map(_._2).sum.toDouble
    vocab.iterator.map { case (p, c) =>
      p -> math.round(math.log(tot / c) * 1e6) }.toMap
  }

  /** Hard-EM unigram-LM training (round 18b — the SentencePiece-flavored
    * sibling of [[bpeTrain]]): seed the vocabulary with EVERY substring
    * of length 1..[[UniPieceMax]] of the corpus's words (occurrence-
    * weighted by word frequency), then [[UniRounds]] rounds of
    * (Viterbi-segment every distinct word under the current micro-nat
    * costs) → (re-count pieces from the segmentations) → (re-derive
    * costs). Pieces that no segmentation uses drop out — the vocabulary
    * shrinks monotonically toward the used set, and feasibility is
    * invariant because each word's own previous pieces survive by
    * construction.
    *
    * Scale shape: ONE corpus pass builds the word-frequency table; every
    * round is vocabulary-sized — the cost map is the trained tokenizer
    * (collected like the BPE apply gate's vocab, broadcast into a
    * per-word Scala UDF; the DP is genuinely imperative per-row work, the
    * one place a UDF beats composition), and the re-count is a map-side
    * explode + hash aggregation over |vocab| rows. At web-corpus vocab
    * (1e8 words) the same loop degrades to a shuffled piece join, as the
    * LM gates declare.
    *
    * Returns (final segmentations: wd/cnt/seg, final vocab rows:
    * piece/cnt/cost ordered by piece).
    */
  private val unigramCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String),
      (Seq[(String, Long, String)], Seq[(String, Long, Long)])]

  private def unigramTrain(s: SparkSession, dir: String)
      : (Seq[(String, Long, String)], Seq[(String, Long, Long)]) =
    // deterministic training: the train/apply gates sharing a session
    // re-use one EM run instead of re-training per gate
    unigramCache.getOrElseUpdate((s, dir), unigramTrainUncached(s, dir))

  private def unigramTrainUncached(s: SparkSession, dir: String)
      : (Seq[(String, Long, String)], Seq[(String, Long, Long)]) = {
    val words = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("wd"))
      .filter(col("wd").rlike("\\A[a-z]+\\z") &&
        length(col("wd")).between(2, UniWordMax))
      .groupBy("wd").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      val seed = words.select(col("cnt"), explode(expr(
          s"""flatten(transform(sequence(1, length(wd)),
              i -> transform(sequence(1, least($UniPieceMax, length(wd) - i + 1)),
                   k -> substring(wd, i, k))))""")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
        .orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      var vocab = seed
      var segged: Seq[(String, Long, String)] = Nil
      for (t <- 1 to UniRounds) {
        val cost = uniCosts(vocab)
        val segUdf = udf((wd: String) => {
          val sgm = uniViterbi(wd, cost)
          require(sgm != null, s"unigram vocab cannot cover '$wd'")
          sgm
        })
        // persisted: the final round runs TWO actions (recount + the
        // segmentation collect) — uncached, the per-word DP would run
        // over the whole vocabulary twice
        val round = words.withColumn("seg", segUdf(col("wd"))).persist()
        try {
          vocab = round.select(col("cnt"),
              explode(split(expr("substring(seg, 2, length(seg) - 2)"), "\\)\\("))
                .as("piece"))
            .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
            .orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          if (t == UniRounds)
            segged = round.orderBy("wd").collect()
              .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
        } finally { round.unpersist(); () }
      }
      val cost = uniCosts(vocab)
      (segged, vocab.map { case (p, c) => (p, c, cost(p)) })
    } finally { words.unpersist(); () }
  }

  /** The DuckDB replay of [[unigramTrain]] as chained CTEs: `uw` (word
    * frequencies), `v0` (the substring seed), then per round t `c_t`
    * (micro-nat costs), the UNROLLED Viterbi DP `dp{t}_{p}` for p =
    * 0..[[UniWordMax]] (each position's best row QUALIFY-selected with
    * the same total-ASC / piece-length-DESC tie-break the Scala DP
    * applies), `fin_t` (each word's segmentation read off at its own
    * length), and `v_t` (the re-count). */
  private def unigramOracleCtes(): String = {
    val uw = s"""
          uw AS MATERIALIZED (
            SELECT wd, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
              SELECT unnest(string_split(lower(text), ' ')) AS wd FROM documents)
            WHERE regexp_full_match(wd, '[a-z]+')
              AND len(wd) BETWEEN 2 AND $UniWordMax
            GROUP BY wd),
          v0 AS MATERIALIZED (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
              SELECT substr(wd, i, k) AS piece, cnt
              FROM uw,
                   LATERAL (SELECT unnest(generate_series(1, len(wd))) AS i) gi,
                   LATERAL (SELECT unnest(generate_series(1, $UniPieceMax)) AS k) gk
              WHERE i + k - 1 <= len(wd))
            GROUP BY piece)"""
    val rounds = (1 to UniRounds).map { t =>
      val costs = s"""
          c$t AS MATERIALIZED (
            SELECT piece, CAST(round(ln(
              (SELECT CAST(SUM(cnt) AS DOUBLE) FROM v${t - 1}) / cnt) * 1000000)
              AS BIGINT) AS cost
            FROM v${t - 1})"""
      val dp0 = s"""
          dp${t}_0 AS MATERIALIZED (SELECT wd, cnt, CAST(0 AS BIGINT) AS best, '' AS seg FROM uw)"""
      val dps = (1 to UniWordMax).map { p =>
        val branches = (1 to math.min(UniPieceMax, p)).map { k =>
          s"""
            SELECT d.wd, d.cnt, d.best + c.cost AS best,
                   d.seg || '(' || substr(d.wd, ${p - k + 1}, $k) || ')' AS seg,
                   $k AS k
            FROM dp${t}_${p - k} d
            JOIN c$t c ON c.piece = substr(d.wd, ${p - k + 1}, $k)
            WHERE len(d.wd) >= $p"""
        }.mkString(" UNION ALL ")
        s"""
          dp${t}_$p AS MATERIALIZED (
            SELECT wd, cnt, best, seg FROM ($branches) cand
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY wd ORDER BY best ASC, k DESC) = 1)"""
      }.mkString(",")
      val fin = (2 to UniWordMax).map(p =>
        s"SELECT wd, cnt, seg FROM dp${t}_$p WHERE len(wd) = $p")
        .mkString(" UNION ALL ")
      s"""$costs,
          $dp0,
          $dps,
          fin$t AS MATERIALIZED ($fin),
          v$t AS MATERIALIZED (
            SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
              SELECT unnest(string_split(trim(seg, '()'), ')(')) AS piece, cnt
              FROM fin$t)
            GROUP BY piece)"""
    }.mkString(",")
    uw + "," + rounds
  }

  /** DuckDB rendering of distinct word-bigram shingles of `trim(text)`. */
  private[queries] val sqlShingles =
    """list_distinct(list_transform(
      |   range(1, greatest(len(w) - 1, 0) + 1),
      |   i -> w[i] || ' ' || w[i + 1]))""".stripMargin

  /** The corpus quality score (length / stopword / word-shape heuristics,
    * 4-dp rounded) — ONE definition shared by `q_text_quality` and the
    * curation pipeline so the two cannot drift. [[sqlQualityExpr]] is its
    * DuckDB rendering; the two must change together.
    */
  /** The heuristic's three RAW feature components — (capped length,
    * stopword ratio, capped average word length) — shared by
    * [[qualityScore]] and the LR classifier gate so trained features can
    * never drift from the labels they predict. [[sqlQualityFeatures]] is
    * the DuckDB rendering; the two must change together. */
  private[queries] def qualityFeatures
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val words = split(trim(col("text")), " ")
    val nTokens = size(words).cast("double")
    val stopHits = size(filter(words, w => w.isin("the", "a", "data", "row"))).cast("double")
    val avgWlen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTokens
    (least(nTokens / 100.0, lit(1.0)),
      stopHits / nTokens,
      least(avgWlen / 10.0, lit(1.0)))
  }

  private[queries] def qualityScore: org.apache.spark.sql.Column = {
    val (f1, f2, f3) = qualityFeatures
    round(f1 * 0.5 + (lit(1.0) - f2) * 0.3 + f3 * 0.2, 4)
  }

  /** DuckDB renderings of [[qualityFeatures]] given token-list and text
    * column names. */
  private[queries] def sqlQualityFeatures(
      w: String, text: String): (String, String, String) = (
    s"least(CAST(len($w) AS DOUBLE) / 100.0, 1.0)",
    s"""CAST(len(list_filter($w, x -> x IN ('the', 'a', 'data', 'row'))) AS DOUBLE)
       |             / CAST(len($w) AS DOUBLE)""".stripMargin,
    s"""least(CAST(length(replace($text, ' ', '')) AS DOUBLE)
       |             / CAST(len($w) AS DOUBLE) / 10.0, 1.0)""".stripMargin)

  /** DuckDB rendering of [[qualityScore]] given token-list and text
    * column names. */
  private[queries] def sqlQualityExpr(w: String, text: String): String = {
    val (f1, f2, f3) = sqlQualityFeatures(w, text)
    s"""round($f1 * 0.5
       |      + (1.0 - $f2) * 0.3
       |      + $f3 * 0.2, 4)""".stripMargin
  }

  /** Spark-side 64-bit word-level SimHash as a (doc_id, lang, simhash)
    * DataFrame (shared by the signature and pair queries; the DuckDB
    * rendering in [[sqlSimhashCtes]] must stay in lock-step).
    *
    * Shape: explode distinct words → codegen'd hash aggregate with one
    * ±1-sum per bit. The earlier formulation (nested `aggregate` HOF, one
    * interpreted fold per bit per document) dominated the dedup bench;
    * this one is a single whole-stage-codegen'd partial+final aggregation,
    * and at 100 TB it is the plan you want anyway — word explosion is
    * map-side, the shuffle carries only (doc_id, 64 longs).
    *
    * Width: 64 bits (round-5 verdict #2 — the former 24-bit signature
    * capped banding at 6-bit bands / 64 buckets, a ~n²/256-per-language
    * candidate blowup at corpus scale). The word hash `polyHash < P ≈ 1e9`
    * carries only ~30 bits, so bit `b` draws from the mixed per-bit hash
    * `minhashPerm(b, h) mod 2` (odd multiplier mod a prime — an
    * independent-parity family reproducible in plain SQL). Bit 63's place
    * value is `Long.MinValue`; building the signature with bitwise OR
    * keeps the arithmetic overflow-free in both engines.
    */
  private[queries] val SimhashBits = 64

  private[queries] def simhashDF(s: SparkSession, dir: String): DataFrame =
    simhashOf(Tables.documents(s, dir))

  /** The signature pipeline over any `(doc_id, lang, text)` frame —
    * shared by the dir-reading query path and the recall gate
    * (`SimhashRecallSpec`), so the gate exercises the exact production
    * pipeline, not a re-implementation.
    */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    // single-file corpus → single input partition: without a repartition
    // the explode AND the 64-way partial aggregate below run in one task
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val words = spread
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(trim(col("text")), " "))).as("w"))
      .withColumn("h", TextHash.polyHash(col("w")))
    val bitSums = Seq.tabulate(SimhashBits)(b =>
      sum(when(TextHash.minhashPerm(lit(b.toLong), col("h")) % 2 === 1, 1L)
        .otherwise(-1L)).as(s"s$b"))
    val simhash = Seq.tabulate(SimhashBits)(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    words.groupBy(col("doc_id"), col("lang")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), col("lang"), simhash.as("simhash"))
  }

  /** Banded hamming-≤3 near-dup pairs over a signature frame — the
    * candidate+verify stage of `q_dedup_simhash_pairs`, extracted for the
    * same reason as [[simhashOf]].
    */
  private[graft] def simhashPairsOf(sh: DataFrame): DataFrame = {
    val banded = sh.select(col("doc_id"), col("lang"), col("simhash"),
      posexplode(array(Seq.tabulate(4)(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band_idx", "band_val")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.lang") === col("b.lang")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= 3)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  private val shingleCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]
  private val signatureStores =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The hashed-shingle signature plan: `sz` is the raw (pre-distinct)
    * signature length the size-ratio prune uses, `hs` the sorted distinct
    * hash set for the merge-intersect, `ds` its cardinality, and `hd` the
    * first `ds div 2 + 1` elements of the same set reordered by ascending
    * global document frequency (ties by hash value — a total order,
    * consistent across every document); only that prefix is stored because
    * it is the largest any consumer probes.
    *
    * `hd` exists for the prefix-filtered candidate joins (round-5 verdict
    * #4, the classic prefix-filtering refinement): a probe prefix drawn
    * from the START of `hd` consists of the corpus's RAREST tokens, so
    * inverted-index buckets stay small even for boilerplate-heavy corpora
    * where hash-ordered prefixes can land on hot shared tokens. The
    * pigeonhole bounds only need one globally consistent token order, so
    * the filter stays lossless. Computing `hd` costs two extra shuffles
    * (df count + per-doc reorder) paid ONCE at signature-build time — the
    * store is corpus infrastructure, which is exactly where a global
    * statistic like df belongs.
    */
  /** Per-document shingle signature WITHOUT the df-ordered column — one
    * pass over the raw corpus (the interpreted shingle hashing is the
    * expensive part of the whole build).
    */
  private def shingleBasePlan(s: SparkSession, dir: String): DataFrame =
    shingleBaseOf(s, Tables.documents(s, dir))

  /** The base-signature pipeline over ANY `(doc_id, lang, text)` frame —
    * shared by the dir-reading build above and the CDC-incremental
    * maintenance path (`q_dedup_signature_incremental`), so the increment
    * runs the exact production hashing, not a re-implementation.
    */
  private[graft] def shingleBaseOf(s: SparkSession, docs: DataFrame): DataFrame =
    docs
      // the corpus parquet is one small file → one input partition, and
      // the interpreted shingle hashing below is the most expensive map in
      // the dedup family — round-robin the docs first so it runs on every
      // core instead of one (the same single-task cliff the embed-LSH
      // query had; negligible shuffle, per-doc results unchanged)
      .repartition(s.sparkContext.defaultParallelism)
      // native one-pass shingle hashing (round 9) — bit-equivalent to
      // transform(TextHash.wordShingles(text, 2), polyHash), the HOF
      // semantic definition the oracle replays (ShingleHashExprSpec)
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.graft.ShingleHashExpr.column(col("text")).as("hv"))
      .select(col("doc_id"), col("lang"), size(col("hv")).as("sz"),
        array_sort(array_distinct(col("hv"))).as("hs"))
      .withColumn("ds", size(col("hs")))

  /** Extend a base signature frame with `hd`. The base frame feeds THREE
    * subtrees (two token explosions and the final join), so callers must
    * hand in a materialized/cached `base` — on a raw-corpus plan the
    * shingle hashing would run three times over (the round-6 4× build
    * regression was exactly that).
    */
  private def withHd(base: DataFrame): DataFrame = {
    val tok = base.select(col("doc_id"), explode(col("hs")).as("tok"))
    val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // (df, tok) PACKED into one BIGINT: tok = polyHash < P < 2^30 and
    // df < 2^31 documents, so `df * 2^32 + tok` is overflow-free and an
    // ascending PRIMITIVE long sort IS the (df asc, tok asc) total order —
    // no per-doc struct sort
    val hd = tok.join(df, "tok")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(shiftleft(col("df"), 32) + col("tok"))).as("hdp"))
    base.join(hd, Seq("doc_id"), "left")
      // store only the prefix consumers read: the largest probe prefix any
      // dedup query takes is `ds div 2 + 1` (q_dedup_incremental; Jaccard
      // pairs take ds div 5 + 1, containment ds div 10 + 1) — halves the
      // stored signature width. The unpack mask recovers the token.
      .withColumn("hd", coalesce(
        expr("transform(slice(hdp, 1, ds div 2 + 1), x -> x & 4294967295)"),
        array().cast("array<bigint>")))
      .drop("hdp")
  }

  /** Oracle-comparable digest of a signature frame `(doc_id, lang, sz,
    * hs, ds, hd)`. hd_ord is a POSITION-WEIGHTED digest of the df-ordered
    * column (the stored `ds div 2 + 1` prefix — all any consumer probes):
    * with hs pinned by sum/extrema, it pins both that hd holds the right
    * tokens and that their ORDER is the declared (df asc, tok asc) order
    * the prefix-filter joins rely on. Shared by the store gate
    * (`q_dedup_signature_table`) and the CDC-incremental gate so the two
    * cannot drift.
    */
  private def signatureDigest(sig: DataFrame): DataFrame = {
    val hdOrd = when(size(col("hd")) === 0, lit(0L)).otherwise(
      aggregate(
        zip_with(col("hd"), sequence(lit(1), size(col("hd"))),
          (h, i) => (h * i.cast("long")) % lit(P)),
        lit(0L), (acc, x) => acc + x))
    sig.select(col("doc_id"), col("lang"),
      col("sz").cast("long").as("sz"), col("ds").cast("long").as("ds"),
      aggregate(col("hs"), lit(0L), (acc, x) => acc + x).as("hs_sum"),
      array_min(col("hs")).as("hs_min"), array_max(col("hs")).as("hs_max"),
      hdOrd.as("hd_ord"))
  }

  /** CDC-incremental maintenance of the stored BASE signature table
    * (round-8 verdict #5 — the composition gap between the C5 and C43
    * families): starting from the full build at `fromVersion` of `t` (an
    * ACID `(doc_id, lang, text)` documents table), fold each commit's
    * row-level changes ([[graft.lake.AcidTable.changesBetween]]) into the
    * store — retract every `delete` image's doc_id, shingle-hash ONLY the
    * `insert` images. Each step is staged to parquet like
    * [[materializeSignatures]] stages the full build (the store is
    * durable corpus infrastructure, and the staged file is what the next
    * increment reads). Returns the maintained base frame at `toVersion`.
    *
    * 100 TB shape: per increment the expensive interpreted shingle pass
    * runs over the CHANGED documents only; the carry is a broadcast-able
    * anti-join on the retracted ids against the stored base. The
    * corpus-global df-ordered `hd` column is NOT incrementally
    * maintainable (any insert can shift every df) and is not stored
    * per-increment — consumers re-derive it from the maintained base via
    * [[withHd]], the cheap columnar stage of the two-stage build.
    */
  private[graft] def maintainSignatureBase(
      s: SparkSession,
      t: graft.lake.AcidTable,
      stage: java.nio.file.Path,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    val basePath = stage.resolve(s"base-v$fromVersion").toString
    shingleBaseOf(s, t.snapshot(fromVersion)).write.mode("overwrite").parquet(basePath)
    var base = s.read.parquet(basePath)
    (fromVersion until toVersion).foreach { v =>
      val cdc = t.changesBetween(v, v + 1)
      val dels = cdc.filter(col("_change_type") === "delete").select(col("doc_id"))
      val ins = cdc.filter(col("_change_type") === "insert")
        .select(col("doc_id"), col("lang"), col("text"))
      val next = base.join(dels, Seq("doc_id"), "left_anti")
        .unionByName(shingleBaseOf(s, ins))
      val nextPath = stage.resolve(s"base-v${v + 1}").toString
      next.write.mode("overwrite").parquet(nextPath)
      base = s.read.parquet(nextPath)
    }
    base
  }

  private val persistedBases = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private def shingleSetsPlan(s: SparkSession, dir: String): DataFrame = {
    val base = shingleBasePlan(s, dir).persist()
    persistedBases.synchronized { persistedBases += base }
    withHd(base)
  }

  /** Write the corpus's shingle-signature table to parquet and register it:
    * every later [[hashedShingleSets]] call for `dir` reads the stored
    * table instead of recomputing the shingle hashing. This is the
    * production protocol at 100 TB — the signature table is a pipeline
    * stage of its own, computed once per corpus and STORED; each dedup job
    * then reads it like any other table. The bench times this build as the
    * `prep_shingle_signatures` entry so per-query dedup times show
    * incremental cost only.
    *
    * Two-stage build: the base signature (the corpus pass) is STAGED to
    * parquet, and the df-ordered `hd` derivation reads the staged columnar
    * file — so the expensive shingle hashing runs exactly once and the
    * hd stage's three base references hit cheap columnar scans. At 100 TB
    * staging to storage (not executor memory) is the only shape that
    * works; locally it cut the build 11.4 s → ~4 s at sf0.1.
    */
  def materializeSignatures(s: SparkSession, dir: String): String = {
    val root = signatureStores.get(dir)
      .map(p => java.nio.file.Paths.get(p).getParent)
      .getOrElse(java.nio.file.Files.createTempDirectory("graft-sigs-"))
    val stage = root.resolve("base").toString
    val out = root.resolve("signatures").toString
    shingleBasePlan(s, dir).write.mode("overwrite").parquet(stage)
    withHd(s.read.parquet(stage)).write.mode("overwrite").parquet(out)
    signatureStores(dir) = out
    out
  }

  /** Hashed word-bigram shingle SETS per document, the shared input of the
    * n-gram Jaccard / containment family. Served from the materialized
    * parquet store when [[materializeSignatures]] has run for `dir`
    * (immune to cache clearing, the production shape); otherwise computed
    * and persisted per (session, dir) so every dedup query in a session
    * reads the SAME materialized signatures instead of recomputing the
    * interpreted shingle hashing.
    */
  private[queries] def hashedShingleSets(s: SparkSession, dir: String): DataFrame =
    signatureStores.get(dir) match {
      case Some(path) => s.read.parquet(path)
        .select(col("doc_id"), col("lang"), col("sz"), col("hs"), col("ds"), col("hd"))
      case None =>
        // keyed on the session OBJECT (identity), not identityHashCode:
        // hash reuse after a session is GC'd could hand a new session
        // another session's cached frame
        shingleCache.getOrElseUpdate((s, dir),
          shingleSetsPlan(s, dir).persist())
    }

  /** Unpersist and forget all memoized signature frames (bench/test
    * hygiene: after a blanket `clearCache()` the memoized entry would stay
    * registered but never re-persist, silently recomputing per reference).
    */
  def clearShingleCache(): Unit = {
    shingleCache.values.foreach(_.unpersist(false))
    shingleCache.clear()
    persistedBases.synchronized {
      persistedBases.foreach(_.unpersist(false))
      persistedBases.clear()
    }
  }

  /** Delete every materialized signature store and forget its
    * registration (end-of-process hygiene: the stores live in
    * `graft-sigs-*` temp directories that nothing else cleans up).
    */
  def cleanupSignatureStores(): Unit = {
    signatureStores.values.foreach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      // the store is <tmpdir>/signatures — remove the enclosing tmpdir
      rm(new java.io.File(p).getParentFile)
    }
    signatureStores.clear()
    // release the session-keyed trained tokenizers too: the caches are
    // keyed by SparkSession, so without this a long-lived JVM cycling
    // sessions would pin each session (and its vocab-sized artifacts)
    bpeNtokCache.clear()
    unigramCache.clear()
  }

  /** Exact Jaccard ≥ 0.8 near-dup pairs over [[hashedShingleSets]]. The
    * per-pair verify is a codegen'd sorted-merge `|A∩B|`
    * ([[SortedLongIntersectCount]]) with `|A∪B| = ds_a + ds_b − |A∩B|` —
    * no per-pair hash sets. Value-identical to the oracle's
    * `len(list_intersect)/len(list_distinct(list_concat))`.
    */
  private def jaccardPairs(sh: DataFrame): DataFrame = {
    // PREFIX-FILTERED candidate generation (Bayardo/Xiao all-pairs
    // similarity search): under any global token order, J(A,B) >= 0.8
    // forces a shared token within the first floor(|S|/5)+1 ordered tokens
    // of BOTH sets — so candidates come from an inverted-index equi-join
    // on prefix tokens instead of the O(n² per lang) blocked cross. The
    // order used is `hd` (ascending global document frequency): prefixes
    // then hold the corpus's RAREST tokens, bounding per-token bucket size
    // — hash-ordered prefixes can land every doc on the same hot
    // boilerplate shingle. The filter is LOSSLESS for the threshold; the
    // final semantics (raw-size ratio prune + exact sorted-merge Jaccard)
    // are unchanged, so the brute-force DuckDB oracle is the standing
    // witness. At 100 TB this is the difference between a shuffle keyed on
    // rare prefix tokens and a quadratic blowup.
    val tok = sh.select(col("lang"), col("doc_id"),
      explode(expr("slice(hd, 1, ds div 5 + 1)")).as("tok"))
    val cand = tok.as("a").join(tok.as("b"),
        col("a.lang") === col("b.lang") && col("a.tok") === col("b.tok")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // size-ratio bound is LOSSLESS for j >= 0.8: j <= min(|A|,|B|)/max(|A|,|B|),
    // so 5*min >= 4*max must hold — prunes pairs before the merge-intersect runs
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
        col("sz").as("sz_a"), col("ds").as("ds_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
        col("sz").as("sz_b"), col("ds").as("ds_b")), "doc_b")
      .filter(col("sz_a") * 5 >= col("sz_b") * 4
        && col("sz_b") * 5 >= col("sz_a") * 4)
      .withColumn("inter", intersectCount(col("hs_a"), col("hs_b")).cast("double"))
      .withColumn("j", col("inter") / (col("ds_a") + col("ds_b") - col("inter")))
      .filter(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("j"))
  }

  /** Min-label propagation to FIXPOINT over an undirected edge list
    * `(doc_a, doc_b)` → `(doc_id, lbl)` where `lbl` is the connected
    * component's min id. Each superstep (hop) takes the min of a node's
    * label and its neighbors' previous labels; the loop stops when no
    * label changed, so chain-shaped duplicate graphs merge fully no matter
    * their diameter (a fixed round count silently under-merges any chain
    * longer than rounds+1 — MinLabelFixpointSpec proves that on a
    * 5-chain). `maxRounds` caps the HOP count as a runaway guard; label
    * propagation needs at most `diameter` hops.
    *
    * Iteration mechanics, sized for per-round latency (the frames are
    * edge-count-sized — tiny next to the corpus — so superstep cost is
    * Spark job-scheduling overhead, not data):
    *  - TWO hops are chained into each materialized round (labels are
    *    monotone non-increasing, so comparing against the round-start
    *    frame still detects convergence exactly) → half the round trips;
    *  - each round materializes through an eager `localCheckpoint`, which
    *    both caches the frame for its two next-round references AND
    *    truncates lineage (a `persist` chain keeps the full plan history —
    *    planning time grows every round). Checkpoint blocks are freed by
    *    the ContextCleaner once unreferenced, so unlike `persist` nothing
    *    stays in the cache registry after the caller drops the result.
    */
  private[graft] def minLabelFixpoint(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    // pin the iteration frames to a handful of partitions: 32 near-empty
    // shuffle tasks per round is pure overhead. On a cluster this is the
    // same knob sized to |edges|, not to the corpus.
    val edges = pairs.select(col("doc_a").as("d"), col("doc_b").as("nb"))
      .union(pairs.select(col("doc_b").as("d"), col("doc_a").as("nb")))
      .repartition(4, col("d"))
      .persist()
    // one hop of synchronous min-propagation; preserves any extra columns
    // (the round carries `prev` through both hops for the convergence test)
    def hop(l: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(l.select(col("doc_id").as("nb"), col("lbl").as("nbl")), "nb")
        .groupBy(col("d")).agg(min(col("nbl")).as("nl"))
      l.join(nbrMin.select(col("d").as("doc_id"), col("nl")), Seq("doc_id"), "left")
        .withColumn("lbl", least(col("lbl"), coalesce(col("nl"), col("lbl"))))
        .drop("nl")
    }
    var labels = edges.select(col("d").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    var hops = 0
    while (changed > 0 && hops < maxRounds) {
      val steps = math.min(2, maxRounds - hops)
      hops += steps
      var frame = labels.withColumn("prev", col("lbl"))
      (1 to steps).foreach(_ => frame = hop(frame))
      val next = frame.localCheckpoint(true)
      // cheap scan of the 4-partition checkpointed blocks
      changed = next.filter(col("lbl") =!= col("prev")).count()
      labels = next.select(col("doc_id"), col("lbl"))
    }
    // Budget exhausted while the LAST round still moved labels. That is
    // exactly what a component of diameter == maxRounds looks like (the
    // final hop legitimately changes labels and the loop exits before the
    // next convergence check), so run ONE confirming hop before judging:
    // if it changes nothing, the labeling converged on the budget's edge.
    if (changed > 0) {
      val confirm = hop(labels.withColumn("prev", col("lbl"))).localCheckpoint(true)
      changed = confirm.filter(col("lbl") =!= col("prev")).count()
      labels = confirm.select(col("doc_id"), col("lbl"))
      hops += 1
    }
    // hop-count telemetry (round-16 verdict #3: the driver bench saw this
    // entry at 13.4 s vs 3.0 s idle and could not tell iteration growth
    // from per-hop inflation — now the record says which)
    graft.QueryTelemetry.recordFixpoint("min_label_fixpoint", hops)
    edges.unpersist()
    // loud-failure guard: labels still moving past the confirming hop
    // means a component of diameter > maxRounds was UNDER-MERGED —
    // silently returning would ship extra "canonicals" (and diverge from
    // the oracle's exact transitive closure)
    require(changed == 0,
      s"min-label propagation did not converge within $maxRounds hops; " +
        "a duplicate chain exceeds the budget - raise maxRounds")
    labels
  }

  /** DuckDB CTE chain computing `simhash` per doc_id (mirror of
    * [[simhashDF]]); callers append their own final SELECT. Bit b's parity
    * hash is minhashPerm's `((2b+1)h + 7919b) mod P mod 2`; bit 63's place
    * value must be the Long.MinValue literal (DuckDB `1 << 63` overflows),
    * and the set bits are disjoint so `list_sum` equals the bitwise OR.
    */
  private def sqlSimhashCtes: String =
    s"""ws AS (SELECT doc_id, lang, list_distinct(string_split(trim(text), ' ')) AS w FROM documents),
       |shv AS (SELECT doc_id, lang, list_transform(w, x -> ${sqlPolyHash("x")}) AS hs FROM ws),
       |bits AS (SELECT doc_id, lang, list_transform(range(0, $SimhashBits), b ->
       |           CASE WHEN list_sum(list_transform(hs,
       |                  h -> CASE WHEN ((2 * b + 1) * h + 7919 * b) % $P % 2 = 1 THEN 1 ELSE -1 END)) > 0
       |                THEN (CASE WHEN b = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                           ELSE (CAST(1 AS BIGINT) << b) END)
       |                ELSE CAST(0 AS BIGINT) END) AS bv
       |         FROM shv),
       |sh AS (SELECT doc_id, lang, CAST(list_sum(bv) AS BIGINT) AS simhash FROM bits)""".stripMargin

  def all: Seq[Q] = Seq(
    // ---- C45 per-document token/char statistics --------------------------------
    Q(
      "q_text_stats",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val words = split(trim(col("text")), " ")
        d.select(
            col("doc_id"),
            size(words).cast("long").as("n_tokens"),
            size(array_distinct(words)).cast("long").as("n_distinct"),
            length(col("text")).cast("long").as("n_chars_actual"),
            size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
              .cast("long").as("n_bpe_tokens"),
            round(length(regexp_replace(col("text"), " ", "")).cast("double") / size(words), 4)
              .as("avg_word_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS n_distinct,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(trim(text), ' ')), 4) AS avg_word_len
        FROM documents ORDER BY doc_id
      """)),

    // ---- C45 quality scoring (length / stopword / word-shape heuristics) --------
    Q(
      "q_text_quality",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val words = split(trim(col("text")), " ")
        val nTokens = size(words).cast("double")
        val stopHits = size(filter(words, w => w.isin("the", "a", "data", "row"))).cast("double")
        val lengthScore = least(nTokens / 100.0, lit(1.0))
        val stopRatio = stopHits / nTokens
        d.select(
            col("doc_id"),
            round(stopRatio, 4).as("stop_ratio"),
            round(lengthScore, 4).as("length_score"),
            // the composite is the SHARED definition (also the curation
            // pipeline's filter input)
            qualityScore.as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS n_tokens,
                 CAST(len(list_filter(string_split(trim(text), ' '),
                                      w -> w IN ('the', 'a', 'data', 'row'))) AS DOUBLE) AS stop_hits,
                 CAST(length(replace(text, ' ', '')) AS DOUBLE) AS nsp
          FROM documents)
        SELECT doc_id,
               round(stop_hits / n_tokens, 4) AS stop_ratio,
               round(least(n_tokens / 100.0, 1.0), 4) AS length_score,
               round(least(n_tokens / 100.0, 1.0) * 0.5
                     + (1.0 - stop_hits / n_tokens) * 0.3
                     + least(nsp / n_tokens / 10.0, 1.0) * 0.2, 4) AS quality_score
        FROM t ORDER BY doc_id
      """)),

    // ---- C45 language ID: corpus-derived top-word profiles, argmax overlap ------
    Q(
      "q_text_langid",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val allWords = d.select(col("lang"), explode(split(trim(col("text")), " ")).as("word"))
        val prof = allWords
          .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("n").desc, col("word"))))
          .filter(col("rk") <= 8)
          .select(col("lang").as("p_lang"), col("word"))
        val docWords = d.select(
          col("doc_id"), explode(array_distinct(split(trim(col("text")), " "))).as("word"))
        val best = docWords.join(prof, "word")
          .groupBy(col("doc_id"), col("p_lang")).agg(count(lit(1)).as("hits"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("p_lang"))))
          .filter(col("rk") === 1)
        d.select(col("doc_id"), col("lang"))
          .join(best, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("p_lang"), lit("unknown")).as("guessed_lang"),
            coalesce(col("hits"), lit(0L)).cast("long").as("hits"),
            col("lang").as("actual_lang"),
            (coalesce(col("p_lang"), lit("")) === col("lang")).as("is_match"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS word FROM documents),
        freq AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2),
        prof AS (SELECT lang AS p_lang, word FROM
                   (SELECT lang, word, row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk FROM freq)
                 WHERE rk <= 8),
        dw AS (SELECT DISTINCT doc_id, word FROM w),
        sc AS (SELECT doc_id, p_lang, count(*) AS hits FROM dw JOIN prof USING (word) GROUP BY 1, 2),
        best AS (SELECT doc_id, p_lang, hits FROM
                   (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, p_lang) AS rk FROM sc)
                 WHERE rk = 1)
        SELECT d.doc_id,
               coalesce(b.p_lang, 'unknown') AS guessed_lang,
               CAST(coalesce(b.hits, 0) AS BIGINT) AS hits,
               d.lang AS actual_lang,
               (coalesce(b.p_lang, '') = d.lang) AS is_match
        FROM documents d LEFT JOIN best b USING (doc_id) ORDER BY doc_id
      """)),

    // ---- C45 TF-IDF: top term per document --------------------------------------
    Q(
      "q_text_tfidf",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val n = d.count()
        val terms = d.select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = terms.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        tf.join(df, "term")
          .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("term").as("top_term"), round(col("tfidf"), 6).as("tfidf"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH terms AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        scored AS (
          SELECT doc_id, term, tf * ln(n.n / df) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
          FROM scored)
        SELECT doc_id, term AS top_term, round(tfidf, 6) AS tfidf
        FROM ranked WHERE rk = 1 ORDER BY doc_id
      """)),

    // ---- C45 stopword filtering: cleaned token stream per doc -------------------
    Q(
      "q_text_stopword_filter",
      (s, dir) => {
        val stop = Seq("the", "a", "and", "of", "data", "row")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            filter(split(trim(col("text")), " "), w => !w.isin(stop: _*)).as("kept"))
          .select(col("doc_id"),
            size(col("kept")).cast("long").as("n_kept"),
            concat_ws(" ", slice(col("kept"), 1, 8)).as("head_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
                 list_filter(string_split(trim(text), ' '),
                             w -> w NOT IN ('the', 'a', 'and', 'of', 'data', 'row')) AS kept
          FROM documents)
        SELECT doc_id,
               CAST(len(kept) AS BIGINT) AS n_kept,
               array_to_string(kept[1:8], ' ') AS head_tokens
        FROM f ORDER BY doc_id
      """)),

    // ---- C45 corpus term frequency, top 50 --------------------------------------
    Q(
      "q_text_tf_top",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(split(trim(col("text")), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(50),
      Some("""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT 50
      """)),

    // ---- C45 document fingerprint: rolling polynomial hash ----------------------
    Q(
      "q_text_fingerprint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextHash.polyHash(col("text")).as("fingerprint"))
          .orderBy(col("doc_id")),
      Some(s"""
        SELECT doc_id, ${sqlPolyHash("text")} AS fingerprint
        FROM documents ORDER BY doc_id
      """)),

    // ---- C45/C52 tokenizer vocabulary INDUCTION (round 10b) ---------------------
    // The training half of the subword story (SubwordCountExpr is the
    // INFERENCE half over a fixed vocabulary): induce the top-K candidate
    // wordpieces by corpus frequency — every character n-gram (length
    // 2..6) of every word occurrence, counted across the corpus, top 64
    // by (count DESC, gram ASC — a total order, so the cut is
    // deterministic). This is the frequency-scoring pass every
    // WordPiece/BPE vocabulary build starts from. Shape: two generators
    // (words, then gram positions×lengths) feeding codegen partial+final
    // hash aggregation over narrow (gram) rows — text never shuffles —
    // then a 64-row TakeOrdered. At 100 TB the gram aggregation is the
    // same map-side-combine shape as term frequency; the explosion factor
    // (~5 lengths × word length) is bandwidth, not shuffle width.
    Q(
      "q_text_vocab_induct",
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(trim(col("text")), " ")).as("wd"))
          .filter(length(col("wd")) >= 2)
        val grams = words
          .select(col("wd"), explode(expr("sequence(1, length(wd))")).as("pos"))
          .select(col("wd"), col("pos"), explode(expr("sequence(2, 6)")).as("len"))
          .select(expr("substring(wd, pos, len)").as("gram"), col("len"))
          .filter(length(col("gram")) === col("len"))
        grams.groupBy("gram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("gram"))
          .limit(64)
      },
      Some("""
        WITH words AS (
          SELECT unnest(string_split(trim(text), ' ')) AS wd FROM documents),
        w2 AS (SELECT wd FROM words WHERE len(wd) >= 2),
        grams AS (
          SELECT substr(wd, pos, l) AS gram, l
          FROM w2,
               LATERAL (SELECT unnest(generate_series(1, len(wd))) AS pos) p,
               LATERAL (SELECT unnest(generate_series(2, 6)) AS l) q
          WHERE len(substr(wd, pos, l)) = l)
        SELECT gram, COUNT(*) AS n FROM grams
        GROUP BY gram ORDER BY n DESC, gram LIMIT 64
      """)),

    // ---- C45/C52 BPE merge-rule TRAINING (round 18, r17 verdict #6) -------------
    // The iterative half of tokenizer training (q_text_vocab_induct is
    // the frequency-scoring pass): k rounds of highest-frequency
    // adjacent-pair merging over the corpus vocabulary — real BPE, not a
    // frequency cut. Shape: ONE corpus pass builds the word-frequency
    // table (text never touched again), then each iteration is a
    // generator + codegen hash aggregation over vocabulary-sized (pair,
    // weight) rows and a 1-row TakeOrdered; the merge itself is a
    // map-side literal string replace. At 100 TB the corpus cost is the
    // single word count; the k-round loop costs k × |vocab|, independent
    // of corpus size. Symbol sequences ride as `(a)(b)(c)` strings:
    // adjacent matches share no characters, so SQL `replace`'s
    // left-to-right non-overlapping scan IS the greedy BPE merge — and
    // DuckDB replays the identical deterministic sequence (ties broken
    // count DESC, pair ASC) with the same encoding, k rounds unrolled as
    // chained CTEs.
    Q(
      "q_text_bpe_train",
      (s, dir) => {
        val (ws, merges) = bpeTrain(s, dir, BpeRounds)
        ws.unpersist()
        import s.implicits._
        merges.toDF("step", "lhs", "rhs", "freq")
          .select(col("step"), col("lhs"), col("rhs"),
            concat(col("lhs"), col("rhs")).as("merged"), col("freq"))
          .orderBy(col("step"))
      },
      Some {
        val union = (1 to BpeRounds).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
        s"""
        WITH ${bpeOracleCtes(BpeRounds)}
        SELECT step, l AS lhs, r AS rhs, l || r AS merged, n AS freq
        FROM ($union) ORDER BY step
        """
      }),

    // ---- C45/C52 BPE tokenizer INFERENCE on the trained merges ------------------
    // The loop closed (r17 verdict #6's second half): the merge table
    // q_text_bpe_train produces is immediately CONSUMED — every corpus
    // word segments under the trained merge sequence (the vocabulary-
    // keyed map is the trained tokenizer), and each document's subword
    // budget is the sum over its words' segment counts. Shape: the
    // trained (word → token count) map is vocabulary-sized and
    // broadcast-joins the exploded corpus words — one corpus pass on top
    // of training's. The oracle replays training AND inference in one
    // DuckDB query (the same unrolled merge CTEs, final segmentation
    // joined back to the documents' words).
    Q(
      "q_text_bpe_apply",
      (s, dir) => {
        val vocab = bpeTrainedNtok(s, dir)
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("wd"))
          .filter(col("wd").rlike("\\A[a-z]+\\z") && length(col("wd")) >= 2)
          .join(broadcast(vocab), Seq("wd"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $bpeVocabOracleCtes,
        dw AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd FROM documents),
        dwf AS (
          SELECT doc_id, wd FROM dw
          WHERE regexp_full_match(wd, '[a-z]+') AND len(wd) >= 2)
        SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(v.ntok) AS BIGINT) AS n_tokens
        FROM dwf JOIN vocab v USING (wd)
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // ---- C45/C52 unigram-LM tokenizer TRAINING (round 18b) ----------------------
    // The OTHER standard tokenizer-training family (SentencePiece's
    // unigram model) next to BPE's merge rules: hard-EM over a substring
    // seed — each round Viterbi-segments every distinct corpus word under
    // integer micro-nat piece costs (min total; ties to the longer
    // piece), re-counts pieces from the segmentations, and re-derives
    // costs; unused pieces fall out of the vocabulary. All comparisons
    // happen on fixed-point integers (the q_text_lm_score contract), so
    // the DuckDB oracle replays the identical EM trajectory with the DP
    // UNROLLED over word positions as chained CTEs.
    Q(
      "q_text_unigram_train",
      (s, dir) => {
        // the TRAIN gate always trains (the bench must time real EM
        // rounds, not a cache read); the result refreshes the session
        // cache the apply gate reads
        val trained = unigramTrainUncached(s, dir)
        unigramCache.put((s, dir), trained)
        import s.implicits._
        trained._2.toDF("piece", "cnt", "cost").orderBy(col("piece"))
      },
      Some(s"""
        WITH ${unigramOracleCtes()}
        SELECT piece, cnt, CAST(round(ln(
          (SELECT CAST(SUM(cnt) AS DOUBLE) FROM v$UniRounds) / cnt) * 1000000)
          AS BIGINT) AS cost
        FROM v$UniRounds ORDER BY piece
      """)),

    // ---- C45/C52 unigram-LM tokenizer INFERENCE ---------------------------------
    // The trained unigram tokenizer consumed: each corpus word's final-
    // round Viterbi segmentation gives its piece count, and per-document
    // subword budgets sum through a broadcast join of the vocabulary-
    // sized (word → piece count) map — the q_text_bpe_apply shape on the
    // unigram model.
    Q(
      "q_text_unigram_apply",
      (s, dir) => {
        val (segged, _) = unigramTrain(s, dir)
        val ntok = localNtokDf(s, segged.map { case (wd, _, seg) =>
          (wd, seg.stripPrefix("(").stripSuffix(")").split("\\)\\(").length.toLong)
        })
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("wd"))
          .filter(col("wd").rlike("\\A[a-z]+\\z") &&
            length(col("wd")).between(2, UniWordMax))
          .join(broadcast(ntok), Seq("wd"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${unigramOracleCtes()},
        nw AS (
          SELECT wd, CAST(len(string_split(trim(seg, '()'), ')(')) AS BIGINT) AS ntok
          FROM fin$UniRounds),
        dw AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd FROM documents),
        dwf AS (
          SELECT doc_id, wd FROM dw
          WHERE regexp_full_match(wd, '[a-z]+')
            AND len(wd) BETWEEN 2 AND $UniWordMax)
        SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(nw.ntok) AS BIGINT) AS n_tokens
        FROM dwf JOIN nw USING (wd)
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // ---- C45 repetition / boilerplate filter (Gopher-style) ---------------------
    // The standard LLM-corpus quality gate: flag documents dominated by a
    // single token or bigram. Shape: explode → codegen'd partial+final
    // hash aggregation per (doc, gram), then a per-doc max/sum — the same
    // plan as the term-frequency queries. (A first formulation computed
    // the counts in-row with nested array HOFs; higher-order functions are
    // interpreted, and the per-doc distinct×n lambda evaluation ran ~50×
    // slower than this aggregate at sf0.1.)
    Q(
      "q_text_repetition",
      (s, dir) => {
        val words = split(trim(col("text")), " ")
        // zip adjacent tokens; slice lengths go to 0 on 1-token docs (a
        // sequence(1, size-1) would DESCEND to [1, 0] there and fault)
        val bigrams = zip_with(
          slice(words, lit(1), size(words) - 1),
          slice(words, lit(2), size(words) - 1),
          (a, b) => concat_ws(" ", a, b))
        def topShare(d: DataFrame, gram: org.apache.spark.sql.Column, out: String) =
          d.select(col("doc_id"), explode(gram).as("g"))
            .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
            .groupBy(col("doc_id"))
            .agg((max(col("n")).cast("double") / sum(col("n"))).as(out))
        val docs = Tables.documents(s, dir)
        docs.select(col("doc_id"))
          .join(topShare(docs, words, "tok_share"), Seq("doc_id"), "left")
          .join(topShare(docs, bigrams, "bi_share"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            round(coalesce(col("tok_share"), lit(0.0)), 4).as("top_token_share"),
            round(coalesce(col("bi_share"), lit(0.0)), 4).as("top_bigram_share"))
          .withColumn("flagged",
            col("top_token_share") > 0.2 || col("top_bigram_share") > 0.1)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        b AS (
          SELECT doc_id, w,
                 list_transform(range(1, greatest(len(w), 1)),
                                i -> w[i] || ' ' || w[i+1]) AS bg
          FROM t),
        shares AS (
          SELECT doc_id,
                 round(CAST(list_max(list_transform(list_distinct(w),
                         g -> len(list_filter(w, x -> x = g)))) AS DOUBLE)
                       / greatest(len(w), 1), 4) AS top_token_share,
                 round(coalesce(CAST(list_max(list_transform(list_distinct(bg),
                         g -> len(list_filter(bg, x -> x = g)))) AS DOUBLE)
                       / greatest(len(bg), 1), 0.0), 4) AS top_bigram_share
          FROM b)
        SELECT doc_id, top_token_share, top_bigram_share,
               (top_token_share > 0.2 OR top_bigram_share > 0.1) AS flagged
        FROM shares ORDER BY doc_id
      """)),

    // ---- C45 pattern + lexicon scrubbing (the PII-redaction stage shape) --------
    // Counts and redacts email/URL patterns (regex machinery; this corpus
    // contains none, which the oracle confirms) plus a term lexicon (real
    // hits). Narrow map — regex + per-token transform, no shuffle.
    Q(
      "q_text_scrub",
      (s, dir) => {
        val email = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
        val url = "https?://[^ ]+"
        val lexicon = Seq("key", "value", "table")
        val words = split(trim(col("text")), " ")
        val scrubbed = concat_ws(" ",
          transform(words, w => when(w.isin(lexicon: _*), lit("<TERM>")).otherwise(w)))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            regexp_count(col("text"), lit(email)).cast("long").as("n_email"),
            regexp_count(col("text"), lit(url)).cast("long").as("n_url"),
            size(filter(words, w => w.isin(lexicon: _*))).cast("long").as("n_term"),
            length(scrubbed).cast("long").as("scrubbed_len"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_url,
               CAST(len(list_filter(w, x -> x IN ('key', 'value', 'table'))) AS BIGINT) AS n_term,
               CAST(length(array_to_string(list_transform(w,
                      x -> CASE WHEN x IN ('key', 'value', 'table') THEN '<TERM>' ELSE x END),
                    ' ')) AS BIGINT) AS scrubbed_len
        FROM t ORDER BY doc_id
      """)),

    // ---- C43 edit-distance verification of blocked candidates -------------------
    // The cheap-blocking + expensive-verify dedup shape: documents sharing
    // a (lang, 16-char prefix) block are candidate pairs; a BANDED
    // Levenshtein (threshold-capped — Spark's 3-arg levenshtein abandons
    // the DP past the cap) confirms real near-duplicates. At 100 TB the
    // equi-join shuffles block keys, never crosses blocks, and the verify
    // cost is bounded per pair by the cap.
    Q(
      "q_dedup_edit_verify",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("text"),
            substring(col("text"), 1, 16).as("blk"))
        // verify-cost hygiene: restrict BOTH join sides to blocks holding
        // >1 document first. Catalyst pushes the levenshtein filter into
        // the join condition ahead of the cheap doc_id< conjunct, so
        // without this prune every singleton's self-pair pays a banded
        // edit-distance evaluation (measured: 14.5 s → ~1 s at sf0.1)
        val multi = d.groupBy(col("lang"), col("blk"))
          .agg(count(lit(1)).as("bn")).filter(col("bn") > 1)
          .select(col("lang"), col("blk"))
        val c = d.join(multi, Seq("lang", "blk"))
        val cap = 120
        val bound = least(
          greatest(length(col("a.text")), length(col("b.text"))) * 0.2, lit(cap))
        c.as("a").join(c.as("b"),
            col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
              col("a.doc_id") < col("b.doc_id"))
          .withColumn("dist",
            levenshtein(col("a.text"), col("b.text"), cap).cast("long"))
          .filter(col("dist") >= 0 && col("dist") <= bound)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("dist"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, text, substr(text, 1, 16) AS blk FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.text, b.text)
                <= least(0.2 * greatest(length(a.text), length(b.text)), 120)
        ORDER BY doc_a, doc_b
      """)),

    // ---- End-to-end corpus curation (the stages above composed as ONE query) ----
    // The artifact a training-data pipeline actually ships: quality-filter
    // the corpus, drop near-duplicates (keep each cluster's canonical),
    // and report the curated per-language corpus. Every stage is one of
    // the declared operators (q_text_quality's score, jaccardPairs'
    // lossless prefix-filtered candidates, minLabelFixpoint's clusters) —
    // this entry pins that they COMPOSE: filters push into the shared
    // scan, the cluster join keys only surviving docs, and the final
    // aggregate is exact (decimal quality sum) so the result is
    // order-independent at any scale.
    Q(
      "q_dedup_pipeline_corpus",
      (s, dir) => {
        val words = split(trim(col("text")), " ")
        val kept = Tables.documents(s, dir)
          .withColumn("quality", qualityScore)
          .withColumn("n_tokens", size(words).cast("long"))
          .filter(col("quality") >= 0.5)
        // near-dup clusters among SURVIVING docs only (the signature table
        // is corpus infrastructure; the semi join restricts candidates)
        val sh = hashedShingleSets(s, dir)
          .join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val pairs = jaccardPairs(sh).select(col("doc_a"), col("doc_b"))
        val labels = minLabelFixpoint(pairs)
        kept.join(labels, Seq("doc_id"), "left")
          .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (sum(col("quality").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
              .cast("double") / count(lit(1))).as("avg_quality"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH RECURSIVE t AS (
          SELECT doc_id, lang, text, string_split(trim(text), ' ') AS w FROM documents),
        scored AS (
          SELECT doc_id, lang, w, CAST(len(w) AS BIGINT) AS n_tokens,
                 ${sqlQualityExpr("w", "text")} AS quality
          FROM t),
        kept AS (SELECT * FROM scored WHERE quality >= 0.5),
        sh AS (
          SELECT doc_id, lang, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
          FROM kept),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
            AND len(a.hv) * 5 >= len(b.hv) * 4 AND len(b.hv) * 5 >= len(a.hv) * 4
          WHERE CAST(len(list_intersect(a.hv, b.hv)) AS DOUBLE)
                / len(list_distinct(list_concat(a.hv, b.hv))) >= 0.8),
        e AS (SELECT doc_a AS d, doc_b AS nb FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT DISTINCT d AS doc_id, d AS nb FROM e
          UNION
          SELECT r.doc_id, e.nb FROM reach r JOIN e ON e.d = r.nb),
        lbl AS (SELECT doc_id, min(nb) AS lbl FROM reach GROUP BY doc_id),
        curated AS (
          SELECT k.lang, k.n_tokens, k.quality
          FROM kept k LEFT JOIN lbl ON k.doc_id = lbl.doc_id
          WHERE lbl.lbl IS NULL OR lbl.lbl = k.doc_id)
        SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS DOUBLE)
                 AS avg_quality
        FROM curated GROUP BY lang ORDER BY lang
      """)),

    // ---- C43 INCREMENTAL near-dedup: new batch vs existing corpus ---------------
    // The production dedup shape: a daily ingest batch (doc_id % 5 == 0
    // stands in for it) is checked against the standing corpus and each
    // batch document gets a keep/drop DECISION with its duplicate count.
    // Candidates come from prefix-filtered probing (J >= 0.5 forces a
    // shared token in the first floor(|S|/2)+1 sorted tokens of both
    // sets), so at 100 TB the batch probes a prefix-token index of the
    // corpus instead of cross-joining it; exact Jaccard verifies
    // survivors. The oracle recomputes the decisions by brute force.
    Q(
      "q_dedup_incremental",
      (s, dir) => {
        val sh = hashedShingleSets(s, dir)
        val corpus = sh.filter(col("doc_id") % 5 =!= 0)
        val batch = sh.filter(col("doc_id") % 5 === 0)
        // prefixes over the df-ascending order `hd` (rarest tokens first;
        // same lossless pigeonhole bound, far smaller index buckets)
        val ctok = corpus.select(col("lang"), col("doc_id").as("corpus_doc"),
          explode(expr("slice(hd, 1, ds div 2 + 1)")).as("tok"))
        val btok = batch.select(col("lang"), col("doc_id").as("batch_doc"),
          explode(expr("slice(hd, 1, ds div 2 + 1)")).as("tok"))
        val cand = btok.join(ctok, Seq("lang", "tok"))
          .select(col("batch_doc"), col("corpus_doc"))
          .dropDuplicates("batch_doc", "corpus_doc")
        val dups = cand
          .join(batch.select(col("doc_id").as("batch_doc"), col("hs").as("hs_a"),
            col("ds").as("ds_a")), "batch_doc")
          .join(corpus.select(col("doc_id").as("corpus_doc"), col("hs").as("hs_b"),
            col("ds").as("ds_b")), "corpus_doc")
          .withColumn("inter", intersectCount(col("hs_a"), col("hs_b")).cast("double"))
          .withColumn("j", col("inter") / (col("ds_a") + col("ds_b") - col("inter")))
          .filter(col("j") >= 0.5)
          .groupBy(col("batch_doc")).agg(count(lit(1)).as("n_dups"))
        batch.select(col("doc_id").as("batch_doc"))
          .join(dups, Seq("batch_doc"), "left")
          .select(col("batch_doc"), coalesce(col("n_dups"), lit(0L)).as("n_dups"))
          .withColumn("keep", col("n_dups") === 0)
          .orderBy(col("batch_doc"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, lang,
                 list_sort(list_distinct(list_transform($sqlShingles, x -> ${sqlPolyHash("x")}))) AS hs
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents)),
        dups AS (
          SELECT a.doc_id AS batch_doc, count(*) AS n_dups
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
          WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.5
          GROUP BY 1)
        SELECT s.doc_id AS batch_doc, coalesce(p.n_dups, 0) AS n_dups,
               coalesce(p.n_dups, 0) = 0 AS keep
        FROM sh s LEFT JOIN dups p ON p.batch_doc = s.doc_id
        WHERE s.doc_id % 5 = 0
        ORDER BY batch_doc
      """)),

    // ---- C43 the STORED signature table itself, oracle-gated --------------------
    // Every dedup query above trusts the materialized signature store as
    // its input; this entry hashes the store's CONTENT against a DuckDB
    // recomputation from raw text (per-doc raw size, distinct size, and a
    // sum/min/max digest of the sorted hash set — a digest because the
    // driver compare canonicalizes scalar columns, and sum+extrema+counts
    // over a sorted distinct set pin it for all practical purposes). The
    // query reads the PARQUET STORE (materializing it on first use), so
    // the write→read roundtrip is inside the gate.
    Q(
      "q_dedup_signature_table",
      (s, dir) => {
        val path = signatureStores.getOrElse(dir, materializeSignatures(s, dir))
        signatureDigest(s.read.parquet(path)).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH hv AS (
          SELECT doc_id, lang, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents)),
        sh AS (SELECT doc_id, lang, len(hv) AS sz, list_sort(list_distinct(hv)) AS hs FROM hv),
        tok AS (SELECT doc_id, unnest(hs) AS tok FROM sh),
        dfreq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
        hdt AS (SELECT t.doc_id, list(t.tok ORDER BY d.df, t.tok) AS hd
                FROM tok t JOIN dfreq d ON t.tok = d.tok GROUP BY t.doc_id)
        SELECT s.doc_id, s.lang, s.sz, len(s.hs) AS ds,
               CAST(coalesce(list_sum(s.hs), 0) AS BIGINT) AS hs_sum,
               list_min(s.hs) AS hs_min, list_max(s.hs) AS hs_max,
               CAST(coalesce(list_sum(list_transform(range(1, len(s.hs) // 2 + 2),
                      i -> (i * h.hd[i]) % $P)), 0) AS BIGINT) AS hd_ord
        FROM sh s LEFT JOIN hdt h ON s.doc_id = h.doc_id ORDER BY s.doc_id
      """)),

    // ---- C5×C43 CDC-incremental signature maintenance ---------------------------
    // The production protocol a 100 TB corpus actually runs: the corpus
    // lives in an ACID table, the signature store was built ONCE, and each
    // new corpus version maintains the store from the table's row-level
    // CDC instead of re-shingling everything. This gate drives a realistic
    // history — a standing corpus, then an ingest+revision commit, then a
    // takedown delete — maintains the store through changesBetween, and
    // digests the result; the DuckDB oracle computes the FULL REBUILD at
    // the final state, so a green row IS the incremental≡rebuild proof.
    Q(
      "q_dedup_signature_incremental",
      (s, dir) => {
        import org.apache.spark.sql.types.{LongType, StringType => SStr, StructField, StructType}
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", SStr),
          StructField("text", SStr)))
        val stage = java.nio.file.Files.createTempDirectory("graft-incsig-")
        val t = graft.lake.AcidTable.create(s, stage.resolve("t").toString,
          schema, "doc_id", "lang", stablePartitions = true)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text"))
        // v1: the standing corpus (everything except the incoming batch)
        val v1 = t.upsert(docs.filter(col("doc_id") % 7 =!= 3))
        // increment 1: the batch arrives AND a slice of standing docs is
        // revised (WHEN order = the oracle's CASE order)
        t.upsert(docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 11 === 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" delta")))
              .otherwise(concat(col("text"), lit(" rev2")))))
        // increment 2: a takedown slice is deleted
        t.delete(docs.filter(col("doc_id") % 13 === 5).select(col("doc_id")))
        val maintained = maintainSignatureBase(s, t, stage, v1, t.latestVersion())
        signatureDigest(withHd(maintained)).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH finaldocs AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 7 = 3 THEN text || ' delta'
                      WHEN doc_id % 11 = 0 THEN text || ' rev2'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 13 <> 5),
        hv AS (
          SELECT doc_id, lang, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM finaldocs)),
        sh AS (SELECT doc_id, lang, len(hv) AS sz, list_sort(list_distinct(hv)) AS hs FROM hv),
        tok AS (SELECT doc_id, unnest(hs) AS tok FROM sh),
        dfreq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
        hdt AS (SELECT t.doc_id, list(t.tok ORDER BY d.df, t.tok) AS hd
                FROM tok t JOIN dfreq d ON t.tok = d.tok GROUP BY t.doc_id)
        SELECT s.doc_id, s.lang, s.sz, len(s.hs) AS ds,
               CAST(coalesce(list_sum(s.hs), 0) AS BIGINT) AS hs_sum,
               list_min(s.hs) AS hs_min, list_max(s.hs) AS hs_max,
               CAST(coalesce(list_sum(list_transform(range(1, len(s.hs) // 2 + 2),
                      i -> (i * h.hd[i]) % $P)), 0) AS BIGINT) AS hd_ord
        FROM sh s LEFT JOIN hdt h ON s.doc_id = h.doc_id ORDER BY s.doc_id
      """)),

    // ---- C42 exact dedup on normalized text -------------------------------------
    Q(
      "q_dedup_exact_docs",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .groupBy(col("norm"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .select(col("canonical_id"), col("n_copies"),
            TextHash.polyHash(col("norm")).as("norm_fp"))
          .orderBy(col("canonical_id")),
      Some(s"""
        WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents)
        SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
               ${sqlPolyHash("norm")} AS norm_fp
        FROM n GROUP BY norm ORDER BY canonical_id
      """)),

    // ---- C42 exact dedup with real duplicate groups (events by user+type) -------
    Q(
      "q_dedup_exact_events",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("event_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .orderBy(col("user_id"), col("event_type")),
      Some("""
        SELECT user_id, event_type, min(event_id) AS canonical_id, count(*) AS n_copies
        FROM events GROUP BY 1, 2 ORDER BY user_id, event_type
      """)),

    // ---- C43 exact n-gram Jaccard near-dup pairs (lang-blocked baseline) --------
    // Jaccard is computed over HASHED shingle sets (8-byte longs instead of
    // ~15-char strings): identical result (the oracle hashes the same way),
    // half the shuffle width and a much cheaper set intersection. Still the
    // deliberate O(n² per lang) exact baseline — q_dedup_minhash_lsh is the
    // scale path.
    Q(
      "q_dedup_ngram_jaccard",
      (s, dir) => {
        jaccardPairs(hashedShingleSets(s, dir))
          .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, lang, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(len(list_intersect(a.hv, b.hv)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.hv, b.hv))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          AND len(a.hv) * 5 >= len(b.hv) * 4 AND len(b.hv) * 5 >= len(a.hv) * 4
        WHERE CAST(len(list_intersect(a.hv, b.hv)) AS DOUBLE)
              / len(list_distinct(list_concat(a.hv, b.hv))) >= 0.8
        ORDER BY doc_a, doc_b
      """)),

    // ---- C43 MinHash signatures + LSH band candidate join + exact verify --------
    // Pipeline shape is deliberately thin at every shuffle (bench-driven —
    // the testdata plants duplicate CLUSTERS, so band buckets reach
    // hundreds of docs and candidate pairs are quadratic per bucket):
    //   1. per-doc signature table, persisted once (at 100 TB this would be
    //      a materialized signatures table);
    //   2. band self-join carries ONLY (band, doc_id) — 16-byte rows;
    //   3. signature est-Jaccard prefilter (128-byte sig arrays) drops
    //      non-candidates BEFORE any shingle set is shuffled;
    //   4. exact verify joins the HASHED shingle sets (longs, not strings)
    //      only for surviving pairs.
    Q(
      "q_dedup_minhash_lsh",
      (s, dir) => {
        // MinHash over the sorted DISTINCT hash set: array_min over the
        // permuted values is unaffected by duplicates, so this matches the
        // oracle (which permutes the raw hv list) exactly.
        val sigs = hashedShingleSets(s, dir)
          .select(col("doc_id"), col("hs"), col("ds"),
            transform(sequence(lit(0L), lit(15L)),
              j => array_min(transform(col("hs"), h => TextHash.minhashPerm(j, h)))).as("sig"))
          .withColumn("bands", transform(sequence(lit(0), lit(3)), b =>
            (get(col("sig"), b * 4) * lit(29791L)
              + get(col("sig"), b * 4 + 1) * lit(961L)
              + get(col("sig"), b * 4 + 2) * lit(31L)
              + get(col("sig"), b * 4 + 3)) % lit(P)))
          .persist()
        // the band self-join CARRIES the 16-long signatures (128 B/row at
        // 4 bands/doc) instead of re-joining them onto candidates — two
        // fewer shuffles; est-filter is a codegen'd positional-eq count
        val banded = sigs.select(col("doc_id"), col("sig"),
          posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
        val est = banded.as("a")
          .join(banded.as("b"),
            col("a.band_idx") === col("b.band_idx")
              && col("a.band_hash") === col("b.band_hash")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
          .dropDuplicates("doc_a", "doc_b")
          .withColumn("est_j",
            PositionalEqCount.eqCount(col("sig_a"), col("sig_b")).cast("double") / 16.0)
          .filter(col("est_j") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("est_j"))
        est
          .join(sigs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
            col("ds").as("ds_a")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
            col("ds").as("ds_b")), "doc_b")
          .withColumn("inter", intersectCount(col("hs_a"), col("hs_b")).cast("double"))
          .withColumn("exact_j", col("inter") / (col("ds_a") + col("ds_b") - col("inter")))
          .filter(col("exact_j") >= 0.5)
          .select(col("doc_a"), col("doc_b"),
            round(col("est_j"), 6).as("est_jaccard"),
            round(col("exact_j"), 6).as("exact_jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        hs AS (SELECT doc_id, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
               FROM base),
        sig AS (SELECT doc_id, hv,
                  list_transform(range(0, 16),
                    j -> list_min(list_transform(hv, h -> ((2 * j + 1) * h + 7919 * j) % $P))) AS sg
                FROM hs),
        bands AS (SELECT doc_id, t.b AS band_idx,
                    (sg[b * 4 + 1] * 29791 + sg[b * 4 + 2] * 961
                     + sg[b * 4 + 3] * 31 + sg[b * 4 + 4]) % $P AS band_hash
                  FROM sig, unnest(range(0, 4)) AS t(b)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                      AND a.doc_id < b.doc_id),
        est AS (SELECT doc_a, doc_b,
                  CAST(list_sum(list_transform(range(1, 17),
                    i -> CASE WHEN sa.sg[i] = sb.sg[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16.0 AS est_j
                FROM cand
                JOIN sig sa ON sa.doc_id = cand.doc_a
                JOIN sig sb ON sb.doc_id = cand.doc_b),
        surv AS (SELECT doc_a, doc_b, est_j FROM est WHERE est_j >= 0.5)
        SELECT doc_a, doc_b,
               round(est_j, 6) AS est_jaccard,
               round(CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE)
                     / len(list_distinct(list_concat(ha.hv, hb.hv))), 6) AS exact_jaccard
        FROM surv
        JOIN hs ha ON ha.doc_id = surv.doc_a
        JOIN hs hb ON hb.doc_id = surv.doc_b
        WHERE CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE)
              / len(list_distinct(list_concat(ha.hv, hb.hv))) >= 0.5
        ORDER BY doc_a, doc_b
      """)),

    // ---- C42/C43 duplicate-cluster resolution (keep one canonical per group) ----
    // Near-dup PAIRS become dedup DECISIONS: undirected edges from the
    // jaccard>=0.8 pairs, then min-label propagation TO FIXPOINT (see
    // [[minLabelFixpoint]]) → every document maps to its connected
    // component's min doc_id; `is_canonical` marks the survivor. The
    // oracle computes the same fixpoint as a recursive CTE (min reachable
    // id per node) — converged label propagation IS connected components,
    // so both engines agree regardless of round count.
    Q(
      "q_dedup_clusters",
      (s, dir) => {
        val pairs = jaccardPairs(hashedShingleSets(s, dir))
          .select(col("doc_a"), col("doc_b"))
        minLabelFixpoint(pairs)
          .select(col("doc_id"), col("lbl").as("cluster_id"),
            (col("doc_id") === col("lbl")).as("is_canonical"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, lang, list_transform($sqlShingles, x -> ${sqlPolyHash("x")}) AS hv
          FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
            AND len(a.hv) * 5 >= len(b.hv) * 4 AND len(b.hv) * 5 >= len(a.hv) * 4
          WHERE CAST(len(list_intersect(a.hv, b.hv)) AS DOUBLE)
                / len(list_distinct(list_concat(a.hv, b.hv))) >= 0.8),
        e AS (SELECT doc_a AS d, doc_b AS nb FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT DISTINCT d AS doc_id, d AS nb FROM e
          UNION
          SELECT r.doc_id, e.nb FROM reach r JOIN e ON e.d = r.nb)
        SELECT doc_id, min(nb) AS cluster_id, (doc_id = min(nb)) AS is_canonical
        FROM reach GROUP BY doc_id ORDER BY doc_id
      """)),

    // ---- C43 SimHash document signatures (64-bit, word-level) -------------------
    Q(
      "q_dedup_simhash",
      (s, dir) =>
        simhashDF(s, dir)
          .select(col("doc_id"), col("simhash"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH $sqlSimhashCtes
        SELECT doc_id, simhash FROM sh ORDER BY doc_id
      """)),

    // ---- C43 SimHash near-dup pairs via banded hamming distance -----------------
    // Pigeonhole-lossless candidate generation: 64 bits in four 16-bit
    // bands — any pair within hamming distance 3 matches at least one band
    // exactly. Candidates verified with bit_count(xor) <= 3. Same
    // band-bucket join shape as MinHash LSH; shuffles only (band, 16 bits).
    // Bucket cardinality per (band, lang) is 2^16 = 65,536 (the former
    // 24-bit/6-bit-band pairing capped it at 64, a ~n²/256-per-language
    // candidate blowup at corpus scale — round-5 verdict #2). Random
    // signatures spread n docs over 65k buckets per band, so expected
    // same-bucket candidates stay ~n²·4/65536 per language — 1024× fewer
    // than the 6-bit banding — while true near-dup clusters still collide
    // on their matching band. Band extraction masks after an arithmetic
    // shift, which is sign-safe for the bit-63 band in both engines.
    Q(
      "q_dedup_simhash_pairs",
      (s, dir) => {
        // persist: the signature aggregation would otherwise run once per
        // self-join side. Candidate+verify live in [[simhashPairsOf]]
        // (hamming is a pure function of the pair, so its cheap bit_count
        // filter runs BEFORE the dedup shuffle: only qualifying candidate
        // rows are shuffled by dropDuplicates — same result either way).
        simhashPairsOf(simhashDF(s, dir).persist())
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $sqlSimhashCtes,
        banded AS (
          SELECT doc_id, lang, simhash, t.b AS band_idx,
                 ((simhash >> (t.b * 16)) & 65535) AS band_val
          FROM sh, unnest(range(0, 4)) AS t(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sh_a, b.simhash AS sh_b
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
               AND a.lang = b.lang AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= 3
        ORDER BY doc_a, doc_b
      """)),

    // ---- C43 benchmark decontamination (train-vs-eval n-gram overlap) ----------
    // The standard pre-training hygiene pass: flag training documents whose
    // n-gram sets overlap a held-out benchmark/eval suite (here the
    // deterministic doc_id % 10 == 7 slice stands in for the eval corpus).
    // Scale shape: the eval suite is tiny relative to a 100 TB corpus, so
    // its DISTINCT shingle-hash set BROADCASTS — the training side is one
    // map-local pass (explode → broadcast hash join → partial agg); no
    // corpus-wide shuffle keyed by shingle ever happens.
    Q(
      "q_dedup_decontaminate",
      (s, dir) => {
        val sh = hashedShingleSets(s, dir)
        val bench = sh.filter(col("doc_id") % 10 === 7)
          .select(explode(col("hs")).as("h")).distinct()
          .withColumn("hit", lit(1L))
        sh.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), explode(col("hs")).as("h"))
          .join(broadcast(bench), Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("overlap_ratio",
            round(col("n_hit").cast("double") / col("n_shingles"), 6))
          .withColumn("contaminated",
            col("n_hit").cast("double") / col("n_shingles") >= 0.5)
          .select(col("doc_id"), col("n_shingles"), col("n_hit"),
            col("overlap_ratio"), col("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform($sqlShingles, x -> ${sqlPolyHash("x")})) AS hv
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
        bench AS (SELECT DISTINCT unnest(hv) AS h FROM sh WHERE doc_id % 10 = 7),
        train AS (SELECT doc_id, unnest(hv) AS h FROM sh WHERE doc_id % 10 <> 7)
        SELECT t.doc_id,
               count(*) AS n_shingles,
               count(b.h) AS n_hit,
               round(CAST(count(b.h) AS DOUBLE) / count(*), 6) AS overlap_ratio,
               (CAST(count(b.h) AS DOUBLE) / count(*)) >= 0.5 AS contaminated
        FROM train t LEFT JOIN bench b ON t.h = b.h
        GROUP BY t.doc_id ORDER BY doc_id
      """)),

    // ---- C43 Bloom-filter decontamination (round 18c) ---------------------------
    // The q_dedup_decontaminate shape for the regime where the blocklist
    // is TOO BIG to broadcast as a raw shingle set: at web scale the
    // "benchmark" side can itself be billions of shingles (all known eval
    // suites + their paraphrases), but a Bloom filter over it is bounded
    // by its BIT ARRAY regardless of blocklist size. Built here as pure
    // relational algebra so DuckDB replays it bit-exactly: each shingle
    // hash probes k=4 positions of an m=2^20 ring via double hashing
    // (h1 = h mod m; stride h2 odd so probes cycle the full ring), the
    // blocklist's DISTINCT position set IS the filter (≤ min(k·|bench|,
    // m) rows — capped by m forever), and a training shingle is a
    // CANDIDATE iff all k probed positions are present. Candidates —
    // bloom-FP-inflated but tiny relative to the corpus — then verify
    // against the exact blocklist with a SHUFFLED equi-join (no broadcast
    // claimed on the exact set; the join input is the candidate subset,
    // not the corpus). False positives are deterministic (fixed hash
    // family), so n_candidates ≥ n_hit is itself oracle-checked.
    // Scale shape: corpus side stays map-local through probe generation +
    // broadcast position join + partial agg; only candidates shuffle.
    Q(
      "q_dedup_decontaminate_bloom",
      (s, dir) => {
        val m = 1048576L // 2^20 bloom bits
        val k = 4
        val sh = hashedShingleSets(s, dir)
        val bench = sh.filter(col("doc_id") % 10 === 7)
          .select(explode(col("hs")).as("h")).distinct()
        // pos_j = (h % m + j * stride) % m, stride = ((h/7) % (m/2))*2+1
        // (odd). h ∈ [0, 1e9+7) so nothing here can overflow a BIGINT in
        // either engine, and Spark's Long '/' matches DuckDB '//' on the
        // non-negative domain.
        def posOf(h: org.apache.spark.sql.Column,
            j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          ((h % m) + j * ((h.cast("long") / 7L % (m / 2)) * 2L + 1L)) % m
        val js = explode(sequence(lit(0L), lit(k - 1L))).as("j")
        val bloomPos = bench.select(col("h"), js)
          .select(posOf(col("h"), col("j")).as("pos")).distinct()
          .withColumn("bit", lit(1L))
        val train = sh.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), explode(col("hs")).as("h"))
        val flagged = train.select(col("doc_id"), col("h"), js)
          .withColumn("pos", posOf(col("h"), col("j")))
          .join(broadcast(bloomPos), Seq("pos"), "left")
          .groupBy(col("doc_id"), col("h"))
          .agg(sum(coalesce(col("bit"), lit(0L))).as("hits"))
          .withColumn("cand", col("hits") === k)
        val verified = flagged.filter(col("cand"))
          .join(bench.withColumn("hit", lit(1L)), Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        flagged.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("cand"), lit(1L)).otherwise(lit(0L))).as("n_candidates"))
          .join(verified, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"), col("n_candidates"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles") >= 0.5)
              .as("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform($sqlShingles, x -> ${sqlPolyHash("x")})) AS hv
          FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
        bench AS (SELECT DISTINCT unnest(hv) AS h FROM sh WHERE doc_id % 10 = 7),
        jj AS (SELECT unnest(range(0, 4)) AS j),
        bpos AS (SELECT DISTINCT ((h % 1048576) + j * (((h // 7) % 524288) * 2 + 1)) % 1048576 AS pos
                 FROM bench, jj),
        train AS (SELECT doc_id, unnest(hv) AS h FROM sh WHERE doc_id % 10 <> 7),
        probes AS (SELECT doc_id, h,
                          ((h % 1048576) + j * (((h // 7) % 524288) * 2 + 1)) % 1048576 AS pos
                   FROM train, jj),
        cand AS (SELECT pr.doc_id AS doc_id, pr.h AS h, (count(p.pos) = 4) AS cand
                 FROM probes pr LEFT JOIN bpos p ON pr.pos = p.pos
                 GROUP BY pr.doc_id, pr.h),
        ver AS (SELECT c.doc_id AS doc_id, count(b.h) AS n_hit
                FROM cand c LEFT JOIN bench b ON c.h = b.h
                WHERE c.cand GROUP BY c.doc_id)
        SELECT c.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN c.cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
               CAST(coalesce(any_value(v.n_hit), 0) AS BIGINT) AS n_hit,
               (CAST(coalesce(any_value(v.n_hit), 0) AS DOUBLE) / count(*)) >= 0.5
                 AS contaminated
        FROM cand c LEFT JOIN ver v ON c.doc_id = v.doc_id
        GROUP BY c.doc_id ORDER BY c.doc_id
      """)),

    // ---- C43 duplicated-span coverage (substring-dedup metric) ------------------
    // How much of each document is covered by corpus-duplicated spans —
    // the document-level metric behind exact substring deduplication (Lee
    // et al., "Deduplicating Training Data Makes Language Models Better",
    // arXiv:2107.06499), computed at token-8-gram granularity instead of
    // suffix-array byte ranges so the DuckDB oracle can recompute it
    // exactly. A span is "duplicated" when its 8-gram occurs ≥2 times in
    // the whole corpus (within- or cross-document); a document's
    // dup_ratio is the fraction of its token positions covered by at
    // least one duplicated span.
    // Scale shape: the span stream is a map-side generator pass (explode
    // of start offsets; the 8-gram is hashed by the codegen PolyHash
    // before anything moves), the occurrence count is a partial-aggregated
    // hash aggregate on span hashes, and coverage union is per-document
    // (distinct positions, partial-agg). The dup-span mark join is keyed
    // by span hash — unlike the boilerplate set (high-df ⇒ small by
    // construction) the df≥2 span set GROWS with corpus duplication, so
    // no broadcast is claimed: at 100 TB this is an honest shuffled
    // equi-join on 8-byte keys, the same shape Lee et al.'s distributed
    // implementations use.
    Q(
      "q_text_span_dedup",
      (s, dir) => {
        val N = 8
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("ntok"))
        // docs shorter than N contribute no spans (sequence(1, n<1) would
        // DESCEND in Spark — same guard as TextHash.wordShingles)
        val spans = base.filter(col("ntok") >= N)
          .select(col("doc_id"),
            explode(sequence(lit(1), (col("ntok") - (N - 1)).cast("int"))).as("i"),
            col("w"))
          .select(col("doc_id"), col("i"),
            TextHash.polyHash(concat_ws(" ", slice(col("w"), col("i"), lit(N)))).as("h"))
          .persist() // feeds both the occurrence count and the mark join
        val dup = spans.groupBy("h").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select(col("h"))
        val covered = spans.join(dup, "h")
          .select(col("doc_id"), explode(sequence(col("i"), col("i") + (N - 1))).as("pos"))
          .groupBy("doc_id").agg(countDistinct(col("pos")).as("dup_tokens"))
        base.select(col("doc_id"), col("ntok"))
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("ntok"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            round(coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("ntok"), 4)
              .as("dup_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        base AS (SELECT doc_id, w, len(w) AS ntok FROM w),
        st AS (SELECT doc_id, w,
                      unnest(range(1, greatest(ntok - 7, 0) + 1)) AS i
               FROM base),
        sp AS (SELECT doc_id, i,
                      ${sqlPolyHash("array_to_string(list_slice(w, i, i + 7), ' ')")} AS h
               FROM st),
        dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(*) >= 2),
        hits AS (SELECT s.doc_id, s.i FROM sp s JOIN dup d ON s.h = d.h),
        cov AS (SELECT doc_id, unnest(range(i, i + 8)) AS pos FROM hits),
        cc AS (SELECT doc_id, COUNT(DISTINCT pos) AS dup_tokens FROM cov GROUP BY doc_id)
        SELECT b.doc_id, CAST(b.ntok AS BIGINT) AS ntok,
               CAST(COALESCE(cc.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               round(CAST(COALESCE(cc.dup_tokens, 0) AS DOUBLE) / b.ntok, 4) AS dup_ratio
        FROM base b LEFT JOIN cc USING (doc_id)
        ORDER BY doc_id
      """)),

    // ---- C45 BM25 retrieval scoring (Okapi BM25) -------------------------------
    // Classic sparse retrieval over the corpus: Okapi BM25 (Robertson &
    // Spärck Jones probabilistic relevance framework) for a fixed 3-term
    // query, k1 = 1.2, b = 0.75, returning the top-25 documents. The
    // training-pipeline use is query-targeted corpus inspection ("show me
    // what the corpus says about X") and retrieval-based data selection.
    // Cross-engine float parity: every constant is a shared decimal
    // LITERAL (never derived arithmetic — 1.2 + 1.0 rounds a ulp away
    // from literal 2.2), per-term contributions are summed in fixed
    // left-assoc query order, df/dl/N are exact integer-valued doubles,
    // and avgdl = sum_dl / n_docs is one correctly-rounded division in
    // both engines. ln shares q_text_tfidf's correctly-rounded-log
    // assumption; scores round to 6 dp.
    // Scale shape: corpus stats (N, Σdl, one df per query term) come back
    // as a 1-row broadcast, tf is a map-side codegen filter per term, and
    // the global top-k is orderBy+limit → TakeOrderedAndProject (per-
    // partition heaps + driver merge of k rows, never a full sort); the
    // rank window then runs on the bounded k-row result, not the corpus.
    Q(
      "q_text_bm25",
      (s, dir) => {
        val terms = Seq("spark", "merge", "vector")
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).cast("double").as("dl"))
        val statAggs =
          count(lit(1)).cast("double").as("n_docs") +:
            (sum(col("dl")).as("sum_dl") +:
              terms.map(t => sum(when(array_contains(col("w"), t), 1L).otherwise(0L))
                .cast("double").as(s"df_$t")))
        val stats = d.agg(statAggs.head, statAggs.tail: _*)
        val avgdl = col("sum_dl") / col("n_docs")
        val contribs = terms.map { t =>
          val tf = size(filter(col("w"), x => x === lit(t))).cast("double")
          val idf = log((col("n_docs") - col(s"df_$t") + lit(0.5))
            / (col(s"df_$t") + lit(0.5)) + lit(1.0))
          (idf * (tf * lit(2.2))) /
            (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
        }
        val scored = d.join(broadcast(stats))
          .select(col("doc_id"), round(contribs.reduce(_ + _), 6).as("score"))
        scored.orderBy(col("score").desc, col("doc_id")).limit(25)
          .withColumn("rk", row_number()
            .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("score"), col("rk"))
          .orderBy(col("rk"))
      },
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        d AS (SELECT doc_id, w, CAST(len(w) AS DOUBLE) AS dl FROM w),
        st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl,
                      CAST(SUM(CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
                      CAST(SUM(CASE WHEN list_contains(w, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df_merge,
                      CAST(SUM(CASE WHEN list_contains(w, 'vector') THEN 1 ELSE 0 END) AS DOUBLE) AS df_vector
               FROM d),
        sc AS (SELECT doc_id, round(
                 ${Seq("spark", "merge", "vector").map(t =>
                   s"""ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
                      * (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) * 2.2)
                      / (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs)))""")
                   .mkString(" + ")}, 6) AS score
               FROM d CROSS JOIN st),
        top AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 25)
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        FROM top ORDER BY rk
      """))
  )
}
