package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Fixpoint guarantee for duplicate-cluster resolution: a FIXED round count
  * under-merges chain-shaped duplicate graphs (A~B~C~D~E with no shortcut
  * edges needs 4 synchronous supersteps for E to learn A's label — 3 rounds
  * provably leave E labeled B), while the convergence-checked loop merges
  * any diameter. Chains are exactly what fuzzy near-dup graphs produce at
  * scale: each document is within threshold of its neighbors but not of the
  * chain's far end.
  */
class MinLabelFixpointSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def chain(ids: Long*) = {
    import spark.implicits._
    ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("doc_a", "doc_b")
  }

  test("5-node chain collapses to one cluster at fixpoint") {
    val labels = TextQueries.minLabelFixpoint(chain(10L, 20L, 30L, 40L, 50L))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.toSeq == Seq(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 50L -> 10L))
  }

  test("an exhausted hop budget fails loudly instead of under-merging") {
    // maxRounds=3 cannot close a 5-node chain: the old fixed-round
    // implementation silently returned node 50 still labeled 20 — an
    // under-merged labeling that ships wrong canonicals. The contract is
    // now a loud failure.
    val e = intercept[IllegalArgumentException] {
      TextQueries.minLabelFixpoint(chain(10L, 20L, 30L, 40L, 50L), maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a component of diameter exactly maxRounds converges without a spurious failure") {
    // 5-node chain: diameter 4. With maxRounds=4 the final hop legitimately
    // still moves labels (node 50 learns 10 on hop 4), so the loop exits on
    // the budget with changed>0 — the pre-round-7 guard threw here even
    // though the labeling is complete. The confirming hop must prove
    // convergence instead.
    val labels = TextQueries.minLabelFixpoint(chain(10L, 20L, 30L, 40L, 50L), maxRounds = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.toSeq == Seq(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L, 50L -> 10L))
  }

  test("two disjoint components keep distinct canonical labels") {
    val pairs = chain(1L, 2L, 3L).union(chain(100L, 101L))
    val labels = TextQueries.minLabelFixpoint(pairs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 100L -> 100L, 101L -> 100L))
  }
}
