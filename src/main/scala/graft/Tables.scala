package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata tables
  * (`/root/testdata/sf*`, see TESTDATA.md). All queries go through here so
  * schema quirks are normalized in exactly one place.
  *
  * Scale posture: these are plain distributed parquet scans — column pruning
  * and predicate pushdown flow from the caller's `select`/`filter` straight
  * into the scan, so the same code works at sf0.001 and at 100 TB.
  */
object Tables {

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects. We read it as a long (legacy conf, set in
    * [[Sessions]]) and truncate to microseconds — the exact same truncation
    * DuckDB performs on `CAST(ts_ns AS TIMESTAMP)`, keeping oracle parity.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      // integral `div`, NOT floor(x / 1000.0): epoch-nanos ≈ 1.7e18 exceed
      // double's 2^53 exact range, so the double-division floor drifts by
      // ±1 µs from DuckDB's exact ns→µs truncation
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
