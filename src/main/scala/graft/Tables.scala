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

  /** `events.parquet` has shipped with two `ts` layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) (rejected by Spark's vectorized
    * reader — read as a long via the legacy conf and truncated to micros,
    * the same truncation DuckDB performs on `CAST(ts_ns AS TIMESTAMP)`) and
    * plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
    * TIMESTAMP_NTZ). Both normalize to a session-UTC TIMESTAMP column so
    * every downstream query and its DuckDB oracle see identical instants
    * regardless of which generation is on disk.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, NOT floor(x / 1000.0): epoch-nanos ≈ 1.7e18 exceed
        // double's 2^53 exact range, so the double-division floor drifts by
        // ±1 µs from DuckDB's exact ns→µs truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // wall-clock reinterpreted in the (always-UTC) session zone: the
        // same instants the nanos layout produced
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // fail LOUDLY on the next testdata-generation drift instead of
        // letting an unrecognized layout surface as downstream mismatches
        sys.error(s"events.ts: unhandled parquet layout $other — " +
          "normalize it here (see TablesSpec temporal-loading pins)")
    }
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
