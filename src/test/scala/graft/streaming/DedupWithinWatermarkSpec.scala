package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The semantics `q_stream_dedup_within_wm`'s corpus span hides:
  * dropDuplicatesWithinWatermark evicts a key's state once the watermark
  * passes event time + delay, so a key RE-EMITS after its window — where
  * dropDuplicates stays silent forever. Crafted MemoryStream batches make
  * watermark progression explicit (each processAllAvailable commits a
  * batch; the watermark for batch k+1 derives from batch k's max event
  * time), so every drop/emit below is deterministic.
  */
class DedupWithinWatermarkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Int): Timestamp =
    new Timestamp(3600L * 1000 * 24 * 365 * 50 + minutes * 60000L)

  private def runBatches(withinWatermark: Boolean): Seq[(String, Long)] = {
    val input = MemoryStream[(String, Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp)]], spark)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val base = input.toDF().toDF("k", "ts").withWatermark("ts", "15 minutes")
      val dedup =
        if (withinWatermark) base.dropDuplicatesWithinWatermark("k")
        else base.dropDuplicates("k")
      val name = s"dedup_wm_${math.abs(java.util.UUID.randomUUID().hashCode())}"
      val q = dedup
        .select(col("k"), unix_timestamp(col("ts")).as("t"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // batch 0: first occurrences emit
        input.addData(("a", ts(0)), ("b", ts(0)))
        q.processAllAvailable()
        // batch 1: duplicate of a INSIDE the 15-min window → dropped by
        // both operators; carrier c at +60 min drags the watermark to
        // +45 min, past a's expiry (+15 min)
        input.addData(("a", ts(5)), ("c", ts(60)))
        q.processAllAvailable()
        // batch 2: a returns at +61 min. WithinWatermark evicted a's
        // state (watermark 45 > expiry 15) → re-emits; plain
        // dropDuplicates holds the key forever → still silent
        input.addData(("a", ts(61)))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      } finally { q.stop() }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("state evicts past the watermark and the key re-emits; plain dedup stays silent") {
    val within = runBatches(withinWatermark = true)
    val plain = runBatches(withinWatermark = false)
    def keys(r: Seq[(String, Long)]) = r.map(_._1)
    // both drop the in-window duplicate at +5
    assert(!within.exists { case (k, t) => k == "a" && t == ts(5).getTime / 1000 })
    assert(!plain.exists { case (k, t) => k == "a" && t == ts(5).getTime / 1000 })
    // the bounded-state operator re-emits a after eviction — the unbounded
    // one never does
    assert(keys(within).count(_ == "a") == 2,
      s"expected re-emission after state eviction, got $within")
    assert(keys(plain).count(_ == "a") == 1,
      s"plain dropDuplicates must hold the key forever, got $plain")
    assert(keys(within).count(_ == "b") == 1 && keys(within).count(_ == "c") == 1)
  }
}
