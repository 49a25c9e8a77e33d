package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd HOFs (`zip_with` + `aggregate`) per SURVEY §4.4: correct and
  * whole-stage-codegen'd without a custom Expression. All arithmetic is
  * promoted to DOUBLE element-by-element and folded LEFT-TO-RIGHT, which is
  * exactly what the DuckDB oracle does
  * (`list_aggregate(list_transform(...), 'sum')`) — the two engines execute
  * the identical IEEE op sequence, so results are bit-comparable before any
  * rounding.
  */
object VectorOps {

  /** Codegen'd dot product (SURVEY M7); see
    * [[org.apache.spark.sql.graft.FloatDotProduct]] — bit-identical to the
    * HOF formulation below, ~10× faster on the O(n²) pair queries.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.FloatDotProduct.dot(a, b)

  /** The HOF reference formulation — kept as the correctness witness for
    * [[dot]] (asserted equal in VectorOpsSpec).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB rendering of [[cosine]] for d-dimensional vectors. */
  def sqlCosine(a: String, b: String, d: Int): String = {
    def sdot(x: String, y: String) =
      s"""list_aggregate(list_transform(range(1, ${d + 1}),
         |  i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), 'sum')""".stripMargin
    s"(${sdot(a, b)} / (sqrt(${sdot(a, a)}) * sqrt(${sdot(b, b)})))"
  }

  /** Deterministic pseudo-random hyperplane component for LSH: plane j,
    * dimension k → an integer in [-1000, 1000] via an LCG on (j*dim + k),
    * scaled to [-1, 1]. Pure integer arithmetic → exactly reproducible in
    * SQL on both engines (the "fixed seed" of the LSH family).
    */
  def planeComponent(j: Column, k: Column, dim: Int): Column =
    (((lit(1103515245L) * (j.cast("long") * dim + k) + lit(12345L)) % lit(2001L)) - lit(1000L))
      .cast("double") / 1000.0

  def sqlPlaneComponent(j: String, k: String, dim: Int): String =
    s"CAST((1103515245 * ($j * $dim + $k) + 12345) % 2001 - 1000 AS DOUBLE) / 1000.0"

  /** Random-hyperplane signature bucket: `planes` sign bits packed into an
    * integer. Vectors with the same bucket are ANN candidates.
    */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), j =>
        when(
          aggregate(
            transform(sequence(lit(0), lit(dim - 1)), k =>
              get(v, k).cast("double") * planeComponent(j, k, dim)),
            lit(0.0), (acc, x) => acc + x) > 0,
          pow(lit(2.0), j.cast("double")).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

  def sqlLshBucket(v: String, planes: Int, dim: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $planes), j ->
       |  CASE WHEN list_aggregate(list_transform(range(0, $dim),
       |         k -> CAST($v[k + 1] AS DOUBLE) * ${sqlPlaneComponent("j", "k", dim)}), 'sum') > 0
       |       THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** Well-mixed deterministic plane component for a MULTI-TABLE LSH family.
    *
    * [[planeComponent]]'s single-LCG planes are all shifts of ONE arithmetic
    * progression mod 2001 (step −237), which is fine for one 6-plane bucket
    * but makes a multi-table family pathologically correlated (measured:
    * pairs at cosine 0.42 with 4/32 sign agreements, impossible under
    * independence). Two LCG rounds mod the Mersenne prime 2^31−1 break the
    * progression structure; all arithmetic stays within BIGINT in both
    * engines, so the family is integer-exact and reproducible in SQL.
    */
  def mixedPlaneComponent(j: Column, k: Column): Column = {
    val h1 = (lit(1103515245L) * (j.cast("long") * lit(67L) + k.cast("long")) + lit(12345L)) % lit(2147483647L)
    val h2 = (lit(1103515245L) * h1 + lit(12345L)) % lit(2147483647L)
    (h2 % lit(2001L) - lit(1000L)).cast("double") / 1000.0
  }

  def sqlMixedPlaneComponent(j: String, k: String): String =
    s"CAST(((1103515245 * ((1103515245 * (($j) * 67 + ($k)) + 12345) % 2147483647) + 12345)" +
      s" % 2147483647) % 2001 - 1000 AS DOUBLE) / 1000.0"

  /** `tables` independent sign-random-projection buckets per vector, each
    * packing `planes` sign bits (table t uses planes t*planes .. t*planes+
    * planes−1 of the mixed family). Computed in ONE narrow pass per vector —
    * the signature table is built once and reused by both sides of the
    * candidate join.
    */
  def lshBuckets(v: Column, planes: Int, tables: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), t =>
      aggregate(
        transform(sequence(lit(0), lit(planes - 1)), p =>
          when(
            aggregate(
              transform(sequence(lit(0), lit(dim - 1)), k =>
                get(v, k).cast("double") * mixedPlaneComponent(t * planes + p, k)),
              lit(0.0), (acc, x) => acc + x) > 0,
            pow(lit(2.0), p.cast("double")).cast("long")).otherwise(0L)),
        lit(0L), (acc, x) => acc + x))

  def sqlLshBuckets(v: String, planes: Int, tables: Int, dim: Int): String =
    s"""list_transform(range(0, $tables), t ->
       |  CAST(list_sum(list_transform(range(0, $planes), p ->
       |    CASE WHEN list_aggregate(list_transform(range(0, $dim),
       |           k -> CAST($v[k + 1] AS DOUBLE) * ${sqlMixedPlaneComponent(s"t * $planes + p", "k")}), 'sum') > 0
       |         THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT))""".stripMargin
}
