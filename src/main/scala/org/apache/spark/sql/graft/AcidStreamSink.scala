package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** `writeStream.format("graft-acid")` — the ACID table as a first-class
  * Structured Streaming SINK (the DeltaStreamer / `delta` sink shape),
  * completing the streaming loop the CDC source opened: a table can now
  * be both the head and the tail of a live pipeline with no foreachBatch
  * glue.
  *
  * Exactly-once: each micro-batch commits through
  * `AcidTable.streamUpsert`, which stamps the (stream, batch) identity
  * into the commit manifest's `#op=` header — dedup record and data
  * commit are ONE atomic publish (Delta's txnAppId/txnVersion design).
  * After a crash between commit and checkpoint, the replayed batch is
  * recognized and skipped, so table state is exactly-once even though
  * the streaming engine's contract is at-least-once. The stream identity
  * is the checkpoint location (same checkpoint ⇒ same batchId sequence),
  * overridable with `option("streamId", …)`.
  *
  * Scale posture: one transactional upsert per micro-batch — commit cost
  * tracks the batch's touched cells, identical to the batch upsert path;
  * nothing row-scale crosses the driver.
  */
class AcidStreamSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-acid"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-acid sink requires option(\"path\", <acid table dir>)"))
    val streamId = parameters.get("streamId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-acid sink requires a checkpointLocation (or an explicit " +
          "option(\"streamId\", …)) to key its exactly-once batch ledger"))
    new AcidStreamSink(path, streamId)
  }
}

private[graft] class AcidStreamSink(tablePath: String, streamId: String) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // the incoming DataFrame is the batch's IncrementalExecution — re-root
    // it as a plain batch plan (the ForeachBatchSink technique) so the
    // upsert's own planning applies
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val node = LogicalRDD.fromDataset(
      rdd = classic.queryExecution.toRdd, originDataset = classic, isStreaming = false)
    val batch = PlanShim.ofRows(spark, node)
    graft.lake.AcidTable.open(spark, tablePath).streamUpsert(batch, streamId, batchId)
    ()
  }

  override def toString: String = s"AcidStreamSink[$tablePath]"
}
