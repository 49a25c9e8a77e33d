package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.lake.AcidTable

/** Structured Streaming CHANGE-FEED source over a [[graft.lake.AcidTable]]
  * — the streaming form of the batch CDC surface
  * (`AcidTable.changesBetween`), with Delta `readChangeFeed` semantics:
  * version-ordered row images, replayable from any retained start version.
  *
  * The stream's offset IS the table's commit version (one `LongOffset`
  * per manifest version — checkpoint-stable and human-readable), and a
  * micro-batch covering versions `(start, end]` emits, per version `v`,
  * exactly `changesBetween(v-1, v)` tagged with `_commit_version = v`:
  * an update appears as its delete+insert row-image pair, inside the
  * version that committed it. Downstream consumers fold the feed in
  * `_commit_version` order (the incremental-signature pipeline's live
  * driver — `AcidCdcStreamSpec` runs it off this stream bit-identically
  * to a full rebuild).
  *
  * Built on the v1 `Source` API (the Delta-source architecture): v1's
  * `getBatch` returns a DataFrame, so each micro-batch is the SAME
  * partition-pruned diff plan batch CDC runs — per-version cost tracks
  * what changed, not table size, and nothing row-scale crosses the
  * driver. Options:
  *
  *  - `path` (required): the table directory.
  *  - `startingVersion` (default 0): first version whose changes to emit.
  *  - `maxVersionsPerBatch` (default unbounded): cap versions per
  *    micro-batch — bounds a catch-up replay's per-batch work, the knob
  *    a backfilling 100 TB consumer sizes to its sink's commit cadence.
  *
  * Schema evolution note: images project through the schema pinned when
  * the stream STARTS (the handle's schema), as Delta's change feed does;
  * restart the stream to pick up evolved columns.
  */
final class AcidCdcSource(
    sqlContext: SQLContext,
    parameters: Map[String, String]) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val spark: SparkSession = sqlContext.sparkSession
  private val acid: AcidTable = AcidCdcSource.openTable(spark, parameters)
  private val startingVersion: Long =
    parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
  private val maxVersionsPerBatch: Long =
    parameters.get("maxVersionsPerBatch").map(_.toLong).getOrElse(Long.MaxValue)
  require(startingVersion >= 0, "startingVersion must be >= 0")
  require(maxVersionsPerBatch > 0, "maxVersionsPerBatch must be > 0")

  /** Version ceiling captured when an AvailableNow run starts: the run
    * drains up to here in `maxVersionsPerBatch` micro-batches and stops,
    * even if commits keep landing (the FileStreamSource contract).
    */
  @volatile private var availableNowCap: Long = Long.MaxValue

  override val schema: StructType = AcidCdcSource.cdcSchema(acid.schema)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = acid.latestVersion()

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    // "rows" at the admission-control layer are table VERSIONS: the unit
    // a change-feed batch is sized in
    else ReadLimit.maxRows(maxVersionsPerBatch)

  /** Admission control (the engine's per-batch sizing path — replaces
    * getOffset): next batch ends at min(latest, AvailableNow ceiling,
    * start + cap); null = no new data.
    */
  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val floor = Option(start).map(AcidCdcSource.versionOf).getOrElse(startingVersion - 1)
    val latest = math.min(acid.latestVersion(), availableNowCap)
    val capped = limit match {
      case r: ReadMaxRows => math.min(latest, floor + r.maxRows())
      case _ => latest
    }
    if (capped <= floor) null else LongOffset(capped)
  }

  override def reportLatestOffset(): V2Offset = {
    val latest = acid.latestVersion()
    if (latest < startingVersion) null else LongOffset(latest)
  }

  /** Unused once SupportsAdmissionControl is implemented (the engine
    * calls [[latestOffset]]); kept equivalent for completeness. */
  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => LongOffset(AcidCdcSource.versionOf(o)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startV = start.map(AcidCdcSource.versionOf(_)).getOrElse(startingVersion - 1)
    val endV = AcidCdcSource.versionOf(end)
    val perVersion = ((startV + 1) to endV).map { v =>
      acid.changesBetween(v - 1, v).withColumn("_commit_version", lit(v))
    }
    val batch = perVersion.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(new java.util.ArrayList[Row](), schema))
    // the engine requires getBatch's frame to be streaming-flagged (the
    // FileStreamSource convention): hand it the diff plan's RDD lineage —
    // planning (and the partition-pruned scan underneath) stays the batch
    // CDC plan; only the leaf node changes flavor
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      batch.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.toRdd,
      schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

object AcidCdcSource {
  private[graft] def cdcSchema(table: StructType): StructType =
    StructType(table.fields.toSeq
      :+ StructField("_change_type", StringType, nullable = false)
      :+ StructField("_commit_version", LongType, nullable = false))

  private def openTable(spark: SparkSession, parameters: Map[String, String]): AcidTable =
    AcidTable.open(spark, parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc source needs option 'path'")))

  /** Version carried by an engine offset: a live LongOffset, or the raw
    * checkpointed JSON (a bare number) after restart. */
  private def versionOf(o: V2Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }
}

/** `spark.readStream.format(<this class name>)` provider (also registered
  * under the short name `graft-cdc` for sessions that carry the service
  * registration). Prefer [[graft.lake.AcidCdc.readStream]].
  */
final class AcidCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-cdc derives its schema from the table; do not set one")
    ("graft-cdc", AcidCdcSource.cdcSchema(
      AcidTable.open(sqlContext.sparkSession, parameters.getOrElse("path",
        throw new IllegalArgumentException("graft-cdc source needs option 'path'"))).schema))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new AcidCdcSource(sqlContext, parameters)
}
