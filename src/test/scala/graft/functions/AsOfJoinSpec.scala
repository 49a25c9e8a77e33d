package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the native as-of join exec against the window+filter
  * composition (the witness formulation), across shuffled partitions with
  * AQE on.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches window formulation on keys, ties, and missing matches") {
    val left = Seq(
      (1L, ts(100), "l-a"), (1L, ts(50), "l-b"), (1L, ts(10), "l-early"),
      (2L, ts(500), "l-c"), (3L, ts(70), "l-no-match"), (4L, ts(5), "l-d"))
      .toDF("k", "lts", "ltag")
    val right = Seq(
      (1L, ts(40), 1L), (1L, ts(40), 2L), (1L, ts(90), 3L), (1L, ts(101), 4L),
      (2L, ts(499), 5L), (2L, ts(500), 6L), (4L, ts(5), 7L), (9L, ts(1), 8L))
      .toDF("rk", "rts", "rid")

    val native = AsOfJoin.join(left, right,
        left("k"), right("rk"), left("lts"), right("rts"), right("rid"))
      .select(col("ltag"), coalesce(col("rid"), lit(-1L)).as("rid"))
      .orderBy(col("ltag"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val witness = left.join(right, col("k") === col("rk") && col("rts") <= col("lts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k"), col("lts"), col("ltag"))
          .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("ltag"), coalesce(col("rid"), lit(-1L)).as("rid"))
      .orderBy(col("ltag"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    assert(native == witness)
    // spot-check the interesting cases directly
    val m = native.toMap
    assert(m("l-a") == 3L)      // ts 90 <= 100, not 101
    assert(m("l-b") == 2L)      // tie at ts 40 → greatest rid
    assert(m("l-early") == -1L) // nothing at-or-before ts 10
    assert(m("l-c") == 6L)      // equality bound is inclusive
    assert(m("l-no-match") == -1L)
    assert(m("l-d") == 7L)
  }

  test("survives multi-partition shuffle on a larger keyspace") {
    val left = spark.range(2000).select(
      (col("id") % 97).as("k"),
      timestamp_seconds(col("id") % 1000).as("lts"),
      col("id").as("lid"))
    val right = spark.range(5000).select(
      (col("id") % 101).as("rk"),
      timestamp_seconds((col("id") * 7) % 1000).as("rts"),
      col("id").as("rid"))
    val native = AsOfJoin.join(left, right,
        left("k"), right("rk"), left("lts"), right("rts"), right("rid"))
      .select(col("lid"), coalesce(col("rid"), lit(-1L)).as("rid"))
    val witness = left.join(right, col("k") === col("rk") && col("rts") <= col("lts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lid"))
          .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("lid"), coalesce(col("rid"), lit(-1L)).as("rid"))
    assert(native.exceptAll(witness).count() == 0)
    assert(witness.exceptAll(native).count() == 0)
    assert(native.count() == 2000)
  }
}
