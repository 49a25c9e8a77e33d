package graft

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Loader-normalization contract: the testdata generator has already
  * changed physical layouts between rounds (events.ts: INT64
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, ntz), which broke every
  * events-based query at analysis time until `Tables.events` learned both
  * layouts). These pin the normalized schema every query builds on, so the
  * NEXT layout drift fails here with a clear message instead of 30 queries
  * deep in the oracle gate.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("events.ts normalizes to a session-UTC TIMESTAMP whatever the file layout") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    // and it must be usable: hour extraction is what q_stat_summary and
    // the streaming window queries do first
    assert(df.selectExpr("hour(ts)").limit(1).collect().nonEmpty)
  }

  test("order/shipment dates load as temporal types, whatever the physical layout") {
    // o_orderdate/l_shipdate have shipped as timestamp[ms] and
    // timestamp[us] ntz across generations; every date function the
    // queries use (year, date_trunc, comparisons) works on any temporal
    // type — an int64-epoch generation would not, and must fail here
    import org.apache.spark.sql.types.{DateType, TimestampNTZType}
    val temporal = Set[org.apache.spark.sql.types.DataType](
      TimestampType, TimestampNTZType, DateType)
    assert(temporal.contains(Tables.orders(spark, sf).schema("o_orderdate").dataType))
    assert(temporal.contains(Tables.lineitem(spark, sf).schema("l_shipdate").dataType))
  }

  test("key columns keep their declared integral types across generations") {
    assert(Tables.events(spark, sf).schema("event_id").dataType == LongType)
    assert(Tables.documents(spark, sf).schema("doc_id").dataType == LongType)
    assert(Tables.lineitem(spark, sf).schema("l_orderkey").dataType == LongType)
  }
}
