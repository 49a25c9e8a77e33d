package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator query: a Spark DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the driver
  * runs as the oracle. Names must match between the Spark result columns and
  * the SQL aliases — the comparator sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Qdsl {

  /** Money-exact aggregation: doubles in the testdata carry 2-dp values, so
    * casting to DECIMAL(18,2) before summing makes the aggregate exact and
    * order-independent — identical in Spark and DuckDB regardless of
    * partitioning / shuffle order. Cast back to double for a stable schema.
    * (A raw double sum differs in the last ulps between engines because the
    * addition order differs; at 100 TB the partial-aggregation order is
    * nondeterministic run-to-run, so exactness must come from the type.)
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact, order-independent average: decimal sum divided by count in
    * double space (both operands identical across engines → IEEE-identical
    * quotient). */
  def avgMoney(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(c)).cast("double")

  /** DuckDB-side equivalents (kept adjacent so the two dialects stay in
    * lock-step). */
  def sqlSumMoney(expr: String, as: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) AS $as"
  def sqlAvgMoney(expr: String, as: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / COUNT($expr) AS DOUBLE) AS $as"
}
