package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-parsing contract: the orchestrator reads child JSON
  * back with small regex parsers, so each parser is pinned against the
  * exact format `emit` writes. Also pins the per-entry contamination rule
  * (round-7 verdict #1) on the verdict's own evidence vectors.
  */
class BenchParseSpec extends AnyFunSuite {

  test("isSpread trips on the round-7 mid-entry contamination vectors, not on stable ones") {
    // contaminated in BENCH_r07 (adjudicated by judge-isolated re-runs):
    assert(Bench.isSpread(Seq(11.19, 5.90, 0.83)))   // q_dedup_minhash_lsh
    assert(Bench.isSpread(Seq(3.08, 2.89, 9.20)))    // q_sql_acid_dml_catalog
    // stable triples must not re-run:
    assert(!Bench.isSpread(Seq(2.25, 2.25, 2.25)))
    assert(!Bench.isSpread(Seq(1.34, 1.36, 1.30)))
    // ratio > 3 but under the absolute floor: scheduler noise on a
    // micro-entry, not contamination
    assert(!Bench.isSpread(Seq(0.10, 0.35, 0.10)))
    // failed reps (-1) are excluded from the spread measure
    assert(!Bench.isSpread(Seq(-1.0, 2.0, 2.1)))
    assert(Bench.isSpread(Seq(-1.0, 2.0, 7.0)))
  }

  test("stream entries use the tighter 1.8 spread trigger (round-8 verdict #3)") {
    // the BENCH_r08 q_stream_stream_join vector sat under the generic 3.0
    // trigger while reading 1.5x isolated truth — it must trip at 1.8
    val r08ssj = Seq(9.3, 8.6, 5.0)
    assert(!Bench.isSpread(r08ssj))
    assert(Bench.isSpread(r08ssj, Bench.spreadRatioFor("q_stream_stream_join")))
    // a clean stream triple (observed spread <= 1.4) must not re-run
    assert(!Bench.isSpread(Seq(5.6, 5.0, 4.7), Bench.spreadRatioFor("q_stream_stream_join")))
    // batch entries keep the generic ratio
    assert(Bench.spreadRatioFor("q_agg_rollup") === 3.0)
  }

  test("hot-window rule catches uniformly-inflated entries that spread cannot") {
    // q_agg_weighted_avg round-7 shape: all reps equally inflated
    // ([2.25, 2.25, 2.25] vs 0.54 s isolated — zero spread), so the
    // neighbor canaries are the only tell. Canary plan at best ~0.25 s;
    // a loaded window pushes the single-shot canaries to ~1 s+.
    assert(Bench.isHotWindow(before = 1.2, after = 0.9, best = 0.25))
    // one CLEAN neighbor acquits (transient ended inside the entry —
    // then rep spread is the trigger instead)
    assert(!Bench.isHotWindow(before = 1.2, after = 0.26, best = 0.25))
    // small ratio excursions under the absolute floor stay quiet
    assert(!Bench.isHotWindow(before = 0.34, after = 0.36, best = 0.25))
  }

  test("string-array and raw-object parsers round-trip the emitted format") {
    val json = """{"metric":"total","value":1.0,"unit":"sec",""" +
      """"queries":{"q_a":1.000},"sf":"/x",""" +
      """"reps":{"q_a":[1.000,2.000]},"canary":[0.100,0.200],""" +
      """"reran_entries":["q_a","prep_shingle_signatures"],""" +
      """"contaminated_entries":["q_a"],""" +
      """"dedup_candidates":{"docs":500,"simhash_cand":4929},""" +
      """"dedup_candidate_breaches":["jaccard_cand:2.3x"]}"""
    assert(Bench.parseStringArray(json, "reran_entries") ==
      Seq("q_a", "prep_shingle_signatures"))
    assert(Bench.parseStringArray(json, "contaminated_entries") == Seq("q_a"))
    assert(Bench.parseStringArray(json, "dedup_candidate_breaches") ==
      Seq("jaccard_cand:2.3x"))
    assert(Bench.parseRawObject(json, "dedup_candidates") ==
      """{"docs":500,"simhash_cand":4929}""")
    // absent keys parse to empty, not error
    assert(Bench.parseStringArray(json, "missing_key").isEmpty)
    assert(Bench.parseRawObject(json, "missing_key").isEmpty)
    // existing parsers unaffected by the new fields
    assert(Bench.parseQueryTimes(json) == Map("q_a" -> 1.0))
    assert(Bench.parseRepArrays(json) == Map("q_a" -> Seq(1.0, 2.0)))
    assert(Bench.parseCanary(json) == Seq(0.1, 0.2))
  }
}
