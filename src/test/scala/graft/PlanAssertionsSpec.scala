package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression gates: the properties that make these queries
  * scale are asserted, not assumed. Each assertion names the plan feature
  * that would silently vanish under a careless refactor (a dropped
  * broadcast hint, a filter that stops reaching the scan, a bucketed join
  * that regrows its exchange) and would only show up as a 100× cost at
  * cluster scale, far from local-test visibility.
  */
class PlanAssertionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() executes THIS DataFrame's QueryExecution (a noop write
    // would run a copy), so AQE settles and the rendered plan is final
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    // AQE renders "== Final Plan ==" followed by "== Initial Plan ==";
    // assertions must look at the final section only
    val start = full.indexOf("== Final Plan ==")
    val end = full.indexOf("== Initial Plan ==")
    if (start >= 0 && end > start) full.substring(start, end) else full
  }

  test("filter+projection reach the parquet scan (pushdown + pruning)") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(!p.contains("PushedFilters: []"), s"empty pushdown in:\n$p")
    // projection pruning: the lineitem scan must not read all 16 columns
    assert(p.contains("ReadSchema"), p)
  }

  test("dimension joins broadcast; no shuffle of the fact side for the dim") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("bucketed join runs with no exchange below the sort-merge join") {
    val p = plan("q_join_bucketed")
    assert(p.contains("SortMergeJoin"), p)    // bucketed co-location → SMJ
    assert("Bucketed: true".r.findAllIn(p).size == 2, s"scans not bucketed:\n$p")
    // nothing below the join may shuffle: the join subtree is everything
    // after the SortMergeJoin line in the rendered tree
    val belowJoin = p.substring(p.indexOf("SortMergeJoin"))
    Seq("Exchange", "ShuffleQueryStage", "AQEShuffleRead").foreach(m =>
      assert(!belowJoin.contains(m),
        s"bucketed join regrew a shuffle ($m) below the SMJ:\n$p"))
  }

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("per-group top-k pushes a WindowGroupLimit below the exchange") {
    val p = plan("q_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("aggregates run partial (map-side) + final hash aggregation") {
    val p = plan("q_agg_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
  }

  test("native as-of join plans its custom exec with SMJ exchange shape") {
    val p = plan("q_join_asof_native")
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      s"expected co-partitioned exchanges:\n$p")
  }

  test("hive-partitioned data prunes to the filtered partition at planning") {
    val dir = java.nio.file.Files.createTempDirectory("prune-").toString
    Tables.documents(spark, sf).write.partitionBy("lang").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(
      org.apache.spark.sql.functions.col("lang") === "en").select("doc_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"partition filter did not reach the scan:\n$p")
    // the equality predicate must be a partition filter, not a data filter
    assert(!p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"),
      s"lang filter leaked into data filters instead of pruning:\n$p")
  }

  test("whole-stage codegen covers the similarity hot path") {
    // "*(n)" is the whole-stage-codegen stage marker in rendered plans
    val p = plan("q_dedup_embed_cosine")
    assert(p.contains("*("), s"no codegen stages in:\n$p")
  }

  test("IVF assignment broadcasts only the fixed-k centroid relation") {
    // the coarse-quantizer pass is corpus × centroids; the broadcast side
    // must be the CONSTANT-k centroid sample (vec_id < 64 reaches the scan
    // as a pushed filter) — a centroid set that grows with the corpus
    // makes the broadcast itself the scale ceiling
    val p = plan("q_sim_topk_ivf")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the bounded quantizer BNLJ:\n$p")
    assert(p.contains("LessThan(vec_id,64)"),
      s"fixed-k centroid filter did not reach the broadcast-side scan:\n$p")
    // cell argmax must partial-aggregate map-side: the k·n expanded rows
    // collapse back to n BEFORE the shuffle
    assert(p.contains("partial_max_by") || p.contains("partial max_by")
        || p.contains("Partial"),
      s"cell argmax is not a partial (map-side) aggregation:\n$p")
  }

  test("LSH near-dedup verify broadcasts the embedding side, never shuffles candidates by id") {
    // the candidate stream is ~n²-ish pairs of 16-byte ids; the embedding
    // side is n rows — shuffling the candidates to meet a shuffled
    // embedding table would dominate the query, so both verify fetches
    // must be broadcast hash joins
    val p = plan("q_dedup_embed_cosine_lsh")
    val broadcastJoins = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcastJoins >= 2,
      s"expected both verify fetches to be BroadcastHashJoin (saw $broadcastJoins):\n$p")
  }

  test("embedding near-dedup scale paths have no corpus×corpus nested loop") {
    // the all-pairs witness is ALLOWED its broadcast-nested-loop (it is the
    // small-data correctness baseline); both scale paths must materialize
    // pairs through equi joins only — a BNLJ or cartesian over the corpus
    // is the 100 TB death sentence the blocked/LSH designs exist to avoid
    for (q <- Seq("q_dedup_embed_cosine_blocked", "q_dedup_embed_cosine_lsh",
        "q_dedup_incremental", "q_dedup_pipeline_corpus")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a broadcast nested loop:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q planned a cartesian product:\n$p")
    }
  }

  test("edit-distance verify pairs come from equi joins, never a nested loop") {
    // the blocked self-join must stay an equi join on (lang, blk) — a
    // nested loop here evaluates a banded Levenshtein per corpus² pair
    val p = plan("q_dedup_edit_verify")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on block keys:\n$p")
  }

  test("repetition filter aggregates partially before its shuffles") {
    // explode fans out (doc, gram) rows map-side; the per-gram counts must
    // collapse there (partial_count) before the exchange — at corpus scale
    // the shuffle carries one row per distinct (doc, gram), not per token
    val p = plan("q_text_repetition")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation in:\n$p")
  }

  test("decontamination probes the eval set via broadcast, never shuffling the corpus by shingle") {
    // the eval suite is tiny vs a 100 TB training corpus: its distinct
    // shingle set must BROADCAST so the training side stays one map-local
    // pass (explode → broadcast join → partial agg). A sort-merge join
    // here would shuffle every (doc, shingle) row of the corpus by hash —
    // the exact corpus-wide exchange this operator's shape exists to avoid
    val p = plan("q_dedup_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set probe is not a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side got shuffled by shingle (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation of per-doc hit counts:\n$p")
  }

  test("bloom decontamination broadcasts only the position set; corpus stays map-local to the probe") {
    // the blocklist can be too big to broadcast raw — the Bloom position
    // set is bounded by the bit-array size (m) forever, so THAT side must
    // broadcast while the corpus probe stream stays map-local; only the
    // candidate subset (bloom survivors) may shuffle into the exact
    // verification join
    val p = plan("q_dedup_decontaminate_bloom")
    assert(p.contains("BroadcastHashJoin"),
      s"bloom position probe is not a broadcast hash join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("lang rebalance never shuffles or sorts the corpus: stats join back as broadcasts") {
    // the per-language counts (5 rows) and the global min (1 row) must
    // come back to the corpus scan as broadcasts — at 100 TB the sampler
    // is a single map-local filter pass; a sort-merge join here would
    // shuffle the whole corpus by lang (5 hot partitions, to boot)
    val p = plan("q_sample_lang_rebalance")
    assert(p.contains("BroadcastHashJoin"),
      s"per-lang counts not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled by lang (SMJ present):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("epoch repetition never shuffles the corpus: budget stats broadcast, generator map-side") {
    // the per-language token sums (5 rows) and the 1-row budget join back
    // to the corpus scan as broadcasts, and the epoch explosion is a
    // map-side generator over that scan — the repetition plan for a
    // 100 TB corpus is one filterless map pass; an SMJ or cartesian here
    // would shuffle the whole corpus by lang
    val p = plan("q_sample_epochs")
    assert(p.contains("BroadcastHashJoin"), s"budget stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled by lang (SMJ):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("Generate"), s"epoch explosion lost its generator:\n$p")
  }

  test("vocabulary induction: map-side gram combine, 64-row bounded top-k") {
    // the gram explosion must fold through partial (map-side) hash
    // aggregation — only (gram, partial count) rows cross the exchange,
    // never text — and the final cut must be a TakeOrderedAndProject
    // bounded heap, not a full sort of the gram space
    val p = plan("q_text_vocab_induct")
    assert(p.contains("HashAggregate"), s"gram counting lost hash aggregation:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab cut regressed to a full sort:\n$p")
  }

  test("temperature sampling never shuffles the corpus: cell stats join back as broadcasts") {
    // same contract as the uniform rebalance: per-(lang, source) counts
    // and the 1-row min must broadcast so the sampler stays one map-local
    // filter pass over the corpus scan at any scale
    val p = plan("q_sample_temperature")
    assert(p.contains("BroadcastHashJoin"),
      s"per-cell counts not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled by (lang, source) (SMJ present):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("exact-budget sampling shuffles once by group, never the text, never a range sort") {
    // the rank pass may move only the narrow (doc_id, lang, source, key)
    // projection — the salted hash consumes text BEFORE the exchange —
    // and a global sort (range partitioning) would be a scale bug.
    // Exactly TWO hash exchanges are expected: the corpus rank shuffle
    // and the per-language count aggregate (a rows-per-group stats side).
    val p = plan("q_sample_exact_budget")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the rank exchange + the stats aggregate exchange only:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"exact-budget sampler must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin"), s"budget join regrew a shuffle:\n$p")
    // (narrowness — text consumed by the salted hash BEFORE the exchange,
    // so the shuffle carries (doc_id, lang, source, k) only — is enforced
    // structurally by the query's pre-window projection; the rendered plan
    // inlines the hash EXPRESSION into the project line, so a string
    // assertion on "text#" cannot distinguish consuming from carrying)
  }

  test("DSIR scoring broadcasts the 128-bucket models and partial-aggregates per doc") {
    // the hashed-feature importance model is 128 rows by construction —
    // it must come back to the token stream as a broadcast (never shuffle
    // the corpus by bucket), and the per-doc log-ratio sum must collapse
    // map-side so the final shuffle carries one row per document
    val p = plan("q_sample_dsir")
    assert(p.contains("BroadcastHashJoin"), s"bucket model not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream shuffled by bucket (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("NB classifier broadcasts the trained model and partial-aggregates per doc") {
    // the train-vocab log-odds table, the OOV constant, and the prior are
    // model-sized — all must broadcast to the scoring pass so the corpus
    // token stream is never shuffled by term; the per-doc score collapses
    // map-side (one row per doc crosses the wire)
    val p = plan("q_text_quality_nb")
    assert(p.contains("BroadcastHashJoin"), s"model not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream shuffled by term (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("LR quality scoring is a joinless map projection over the corpus") {
    // round 18b: training happens in the builder (driver-coordinated
    // integer-sum aggregations over the persisted labeled slice); the
    // RETURNED plan is the corpus-wide scoring pass — the trained weights
    // are driver literals, so the plan must carry no join of any kind and
    // only the final orderBy's range exchange
    val p = plan("q_text_quality_lr")
    assert(!p.contains("Join"), s"scoring pass must be joinless:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1,
      s"scoring pass should shuffle only for the final orderBy:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring pass must not hash-shuffle the corpus:\n$p")
  }

  test("lm scoring joins the vocab as a broadcast and partial-aggregates per doc") {
    // the unigram vocab is tiny vs the token stream: it must broadcast so
    // the token explode never shuffles by term, and the per-doc surprisal
    // sum must collapse map-side (one row per doc crosses the wire)
    val p = plan("q_text_lm_score")
    assert(p.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream shuffled by term (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("boilerplate scoring broadcasts the high-df shingle set and partial-aggregates per doc") {
    // document frequency saturates a text corpus's shingle vocabulary, so
    // the boilerplate set is small by construction → it must broadcast to
    // the mark-and-score pass, and the per-doc aggregate must collapse
    // map-side so the final shuffle carries one row per document, not one
    // per (doc, shingle)
    val p = plan("q_text_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"boilerplate set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled for the mark join (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("mixture plan joins its 1-row budget as a broadcast, never a sort-merge") {
    val p = plan("q_mixture_plan")
    assert(!p.contains("SortMergeJoin"), s"budget join regrew a shuffle:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"token counting must partial-aggregate map-side:\n$p")
  }

  test("token chunking is a pure generator pass: no exchange anywhere in the plan") {
    // chunking is per-row explode work — ANY Exchange here means a
    // refactor made the corpus move for a map-local transformation
    val p = plan("q_text_chunk")
    Seq("Exchange", "ShuffleQueryStage", "AQEShuffleRead").foreach(m =>
      assert(!p.contains(m), s"chunker grew a shuffle ($m):\n$p"))
  }

  test("context packing shuffles once, by the shard key, for its window pass") {
    val p = plan("q_pack_context")
    assert(p.contains("Window"), s"no window operator:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shard-key exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"packing must not global-sort:\n$p")
  }

  test("PQ lifecycle: codebooks broadcast, the corpus never self-joins") {
    // every join in train/encode/ADC has a broadcast O(M·K) or O(queries)
    // side; a CartesianProduct or sort-merge self-join here means the
    // formulation regressed to something that cannot run at corpus scale
    val p = plan("q_sim_topk_pq")
    assert(!p.contains("CartesianProduct"), s"PQ grew a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"), s"PQ shuffled a join side:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in PQ plan:\n$p")
    // BOTH rank filters (ADC shortlist srk<=100 and exact rerank rk<=5)
    // must push down as WindowGroupLimit bounded heaps — at least one
    // operator per window (AQE may elide the map-side partial when a
    // stage collapses to one partition, so partial+final pairs are not
    // countable; the FINAL operator is what keeps the per-query rank a
    // bounded heap instead of a full per-query sort — round-9 verdict #2).
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"shortlist/rerank ranks lost their WindowGroupLimit push-down:\n$p")
  }

  test("ACID catalog join broadcasts the dim side from manifest statistics, no hint") {
    // the DSv2 scan reports its pruned manifest bytes via
    // SupportsReportStatistics; without it every catalog relation
    // estimates at defaultSizeInBytes (Long.MaxValue) and this join
    // degrades to sort-merge — the silent 100×-at-scale regression this
    // gate exists to catch (exact estimate values are pinned in
    // GraftCatalogSpec)
    val p = plan("q_sql_acid_stats_join")
    assert(p.contains("BroadcastHashJoin"),
      s"catalog dim join did not broadcast from manifest stats:\n$p")
  }

  test("ANN shortlist ranks all run as pushed-down WindowGroupLimit bounded heaps") {
    // every shortlist formulation ranks with row_number().over(query
    // window) + a rank filter; Spark rewrites that to WindowGroupLimit
    // (per-partition bounded heap below the exchange) only while the
    // filter stays a literal bound directly over the window — the gate
    // catches a refactor that breaks the rewrite (e.g. ranking through a
    // non-pushable expression), which would re-sort each query's whole
    // candidate set in a single task. Count >= 1: AQE can elide the
    // map-side partial, but the final bounded-heap operator must exist.
    for (q <- Seq("q_sim_topk_brute", "q_sim_topk_lsh", "q_sim_topk_sq8",
        "q_sim_topk_ivf")) {
      val p = plan(q)
      assert("WindowGroupLimit".r.findAllIn(p).size >= 1,
        s"$q lost its WindowGroupLimit push-down:\n$p")
    }
  }

  test("packing execution shuffles text ONCE: the bin aggregate reuses the window exchange") {
    // (lang, source) hash partitioning clusters (lang, source, bin), so
    // EnsureRequirements must not insert a second exchange between the
    // window pass and the per-bin aggregate — text crosses the cluster
    // exactly once
    val p = plan("q_pack_execute")
    assert(p.contains("Window"), s"no window operator:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"packed text must cross exactly one exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort:\n$p")
  }

  test("subword chunking/packing keep the word gates' plan shapes exactly") {
    // the tokenizer is a per-row codegen expression — budget realism must
    // not cost a single extra exchange over the whitespace formulations
    val c = plan("q_text_chunk_subword")
    Seq("Exchange", "ShuffleQueryStage", "AQEShuffleRead").foreach(m =>
      assert(!c.contains(m), s"subword chunker grew a shuffle ($m):\n$c"))
    val p = plan("q_pack_context_subword")
    assert(p.contains("Window"), s"no window operator:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shard-key exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"packing must not global-sort:\n$p")
  }

  test("shard shuffle moves one narrow hash exchange, never a range sort") {
    // the deterministic global shuffle carries (doc_id, ntok, k) through
    // exactly one hash exchange by shard — the salted hash consumes text
    // map-side; a range exchange would mean a global sort snuck in
    val p = plan("q_sample_shards")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the shard exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"shard shuffle must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("bm25 broadcasts its 1-row stats and takes the top-k with a bounded heap") {
    // corpus stats come back as a broadcast (never a shuffle of the
    // corpus), and the global top-25 must be TakeOrderedAndProject —
    // per-partition heaps + a k-row driver merge — not a full sort
    val p = plan("q_text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k fell back to a full sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"stats join regrew a shuffle or cartesian:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("span dedup partial-aggregates its counts; no cartesian anywhere") {
    // the occurrence count and the per-doc coverage count must both
    // collapse map-side (the explode streams are corpus×spans-sized), and
    // the dup-span mark join must ride equi-join keys — a cartesian here
    // is the n² failure this operator's banded cousins exist to avoid
    val p = plan("q_text_span_dedup")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span mark join lost its equi keys:\n$p")
  }

  test("semantic dedup bounds its pair search by cell equi-join, codebook broadcast") {
    // the only nested-loop allowed is the O(k)-codebook assignment
    // broadcast; the within-cell pair search must be an equi join on cell
    // (a cartesian = the unbounded n² SemDeDup exists to avoid), and the
    // assignment argmax must partial-aggregate map-side
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"), s"pair search went cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"codebook assignment lost its broadcast:\n$p")
    assert(p.contains("partial_first") || p.contains("partial first")
      || p.contains("partial_max_by") || p.contains("HashAggregate"),
      s"assignment argmax not aggregated:\n$p")
  }

  test("bigram LM joins its model tables as broadcasts and partial-aggregates per doc") {
    // same contract as the unigram scorer: uni/bigram tables broadcast so
    // the transition stream never shuffles by term, and the per-doc
    // micro-nat sum collapses map-side
    val p = plan("q_text_lm_bigram")
    assert(p.contains("BroadcastHashJoin"), s"model tables not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"transition stream shuffled by term (SMJ present):\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("curriculum ranking shuffles once by lang; quality is consumed map-side") {
    // the ntile pass may move only (doc_id, lang, quality) — the quality
    // score consumes text BEFORE the exchange — and phases come from ONE
    // hash exchange by language; a range exchange would be a global sort
    val p = plan("q_sample_curriculum")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the lang rank exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"curriculum must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("kmeans E-steps broadcast the codebook; M-steps shuffle (cell, dim) triples only") {
    // every E-step joins an O(k) codebook — broadcast nested loop, never a
    // cartesian — and the argmax collapses map-side; the M-step's
    // component sums are ordinary partial+final hash aggregation. A
    // range exchange anywhere would mean a global sort snuck into the
    // train loop.
    val p = plan("q_embed_kmeans")
    assert(!p.contains("CartesianProduct"), s"E-step went cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"codebook lost its broadcast:\n$p")
    // exactly ONE range exchange is legitimate: the final presentation
    // ORDER BY vec_id — a second one would mean a global sort inside the
    // train loop itself
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1,
      s"global sort inside the train loop:\n$p")
    assert("partial_max_by".r.findAllIn(p).size >= 1,
      s"E-step argmax lost its map-side partial:\n$p")
  }

  test("BPE inference broadcasts the trained vocab and partial-aggregates per doc") {
    // round 18: the trained (word -> token count) map is vocabulary-sized
    // — it must broadcast so the exploded corpus words never shuffle by
    // word for the join, and the per-doc budget sum must collapse
    // map-side. (Training itself is k vocab-sized hash aggregations +
    // 1-row TakeOrdereds, exercised by the same call.)
    val p = plan("q_text_bpe_apply")
    assert(p.contains("BroadcastHashJoin"), s"trained vocab not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus words shuffled by word (SMJ present):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("unigram-LM inference broadcasts the trained tokenizer and partial-aggregates") {
    // round 18b: same contract as the BPE gate for the unigram sibling —
    // the (word -> piece count) map from training is vocabulary-sized and
    // must broadcast; the corpus never shuffles by word, and per-doc
    // budgets collapse map-side. (The training loop's per-round work is
    // vocabulary-sized by construction; this pins the one corpus-scale
    // plan the family produces.)
    val p = plan("q_text_unigram_apply")
    assert(p.contains("BroadcastHashJoin"), s"trained tokenizer not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus words shuffled by word (SMJ present):\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side partial aggregation:\n$p")
  }
}
