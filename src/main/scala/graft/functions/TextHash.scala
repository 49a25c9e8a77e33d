package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible hashing built ONLY from
  * whole-stage-codegen'd Catalyst HOFs (`transform`/`aggregate`/`filter`) —
  * no UDFs, no JVM-private hash functions. Every formula here has an exact
  * DuckDB counterpart (`list_transform`/`list_reduce`) using the same
  * BIGINT arithmetic, so the driver's oracle can recompute signatures
  * bit-for-bit (SURVEY §2C C43 requires fixed-seed reproducibility).
  *
  * All arithmetic stays below 2^63: polyHash < P ≈ 1e9, multipliers ≤ 3e4,
  * so products ≤ ~3e13. Safe without overflow in both engines.
  */
object TextHash {

  /** Modulus: a prime ≈ 1e9 keeping fold state small. */
  val P = 1000000007L

  /** Left-to-right polynomial rolling hash of a string's character codes:
    * h = fold(h * 31 + code(ch)) mod P. The canonical "document
    * fingerprint" (rolling hash) of the north-star text-analysis surface.
    *
    * Served by the native codegen expression
    * [[org.apache.spark.sql.graft.PolyHashExpr]] (one unboxed loop over
    * the UTF-8 bytes, round-8); bit-identical to the HOF formulation
    * below, which remains the cross-engine SEMANTIC definition and the
    * equivalence witness (`PolyHashExprSpec` pins them together).
    *
    * DuckDB equivalent:
    * {{{
    * list_reduce(list_prepend(0::BIGINT,
    *   list_transform(string_split(s,''), c -> ascii(c)::BIGINT)),
    *   (acc, x) -> (acc*31 + x) % 1000000007)
    * }}}
    */
  def polyHash(c: Column): Column =
    org.apache.spark.sql.graft.PolyHashExpr.column(c)

  /** The original whole-stage-codegen'd HOF formulation of [[polyHash]] —
    * the executable spec the native expression is verified against.
    */
  private[graft] def polyHashHof(c: Column): Column =
    aggregate(
      // Spark's split(s, "") yields a trailing "" (Java split limit -1);
      // DuckDB's does not — drop empties so both fold the same sequence.
      filter(split(c, ""), ch => ch =!= lit("")),
      lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(P))

  /** Greedy longest-match subword piece COUNT of a word over the fixed
    * vocabulary (WordPiece inference rule) — served by the native codegen
    * expression [[org.apache.spark.sql.graft.SubwordCountExpr]]; the
    * DuckDB counterpart is a recursive CTE over the same vocabulary
    * (rendered from the SAME list, `SampleQueries.sqlSubwordCtes`).
    */
  def subwordCount(c: Column): Column =
    org.apache.spark.sql.graft.SubwordCountExpr.column(c)

  /** MinHash permutation j applied to a precomputed element hash h:
    * ((2j+1)·h + 7919·j) mod P. Odd multiplier, P prime → a proper
    * permutation family with fixed "seeds" derivable in plain SQL.
    */
  def minhashPerm(j: Column, h: Column): Column =
    ((lit(2L) * j + lit(1L)) * h + lit(7919L) * j) % lit(P)

  /** Word shingles (n-grams joined by a space) from a whitespace-tokenized
    * text column. DuckDB equivalent built from `range` + list slicing.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(trim(text), " ")
    val cnt = size(words) - lit(n - 1)
    // sequence(1, 0) would generate a DESCENDING range in Spark — guard the
    // short-document case to an empty array instead.
    when(cnt >= 1,
      array_distinct(
        transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(words, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }
}
