package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.Tables
import graft.queries.Q

/** Structured Streaming surface (SURVEY §2C C37-C41) over the `events`
  * table replayed as a file stream.
  *
  * Determinism strategy (the `batch-equiv` oracle contract): events are
  * split into four TIME-SORTED parquet chunks with strictly increasing
  * file mtimes; the stream reads them with `maxFilesPerTrigger=1` under
  * `Trigger.AvailableNow`, so the query processes four ordered
  * micro-batches and the watermark advances monotonically between them
  * with no late rows — every streaming result below therefore equals its
  * batch formulation, which is exactly what the DuckDB oracle computes.
  *
  * Scale posture: these are the same plans a production 100 TB stream
  * would run — windowed partial aggregation shuffled by (window, key),
  * broadcast stream-static join, and keyed state in
  * `flatMapGroupsWithState` partitioned by user — only the source
  * (files replayed) is test-shaped.
  */
object StreamingQueries {

  private val nameCounter = new AtomicInteger(0)
  private val chunkCache = TrieMap.empty[(String, Int), String]
  private val lateChunkCache = TrieMap.empty[String, String]

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class UserCounter(user_id: Long, n_events: Long, last_event_type: String)

  /** Spark 4 `transformWithState` processor: per-user running counter in a
    * RocksDB-backed ValueState — the new-generation arbitrary-state API
    * next to the `flatMapGroupsWithState` formulation in
    * `q_stream_state_counter` (same semantics, same oracle).
    */
  final class CounterProcessor extends StatefulProcessor[Long, Event, UserCounter] {
    @transient private var state: ValueState[UserCounter] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserCounter](
        "counter", Encoders.product[UserCounter], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event], timerValues: TimerValues): Iterator[UserCounter] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      if (sorted.isEmpty) Iterator.empty
      else {
        val prev = if (state.exists()) state.get() else UserCounter(key, 0L, "")
        val next = UserCounter(key, prev.n_events + sorted.size, sorted.last.event_type)
        state.update(next)
        Iterator.single(next)
      }
    }
  }

  /** Pre-build the chunked replay files (idempotent) — Bench calls this in
    * its untimed warmup so chunking cost doesn't land on whichever
    * streaming query happens to run first.
    */
  def warm(s: SparkSession, dir: String): Unit = {
    chunkedEventsDir(s, dir); chunkedEventsDir(s, dir, 2)
    lateChunkedEventsDir(s, dir); ()
  }

  /** Job-scoped streaming checkpoint directory, on the RAM-backed tmpfs
    * when available (round 14, r11 verdict #6): an AvailableNow replay
    * fsyncs offset/commit/state files once per micro-batch, and on this
    * container /tmp is disk-backed — that fixed sync latency is
    * environment cost, not operator cost. Production deployments make the
    * same placement choice with local NVMe or a job-scoped checkpoint
    * tier; results are bit-identical, only the sync target changes. */
  private def ckptDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val useShm = !sys.env.contains("SPARK_GRAFT_CKPT_DISK") &&
      Files.isDirectory(shm) && Files.isWritable(shm)
    (if (useShm) Files.createTempDirectory(shm, prefix)
     else Files.createTempDirectory(prefix)).toString
  }

  /** Write `events` as `chunks` time-ordered chunk files with increasing
    * mtimes. The default 4 is the replay shape the append-mode and
    * watermark-sensitive gates were adjudicated on; Complete-mode gates
    * (whose OUTPUT is chunking-invariant) replay 2 chunks — still a
    * multi-batch incremental state fold, half the per-batch fixed cost
    * (round 14, r11 verdict #6). */
  private def chunkedEventsDir(s: SparkSession, dir: String, chunks: Int = 4): String =
    chunkCache.getOrElseUpdate((dir, chunks), {
      val out = Files.createTempDirectory("graft-stream-")
      val ev = Tables.events(s, dir)
        .withColumn("__rn", row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      val n = ev.count()
      (0 until chunks).foreach { k =>
        val lo = k * n / chunks + 1
        val hi = (k + 1) * n / chunks
        val tmp = out.resolve(s"tmp-$k")
        ev.filter(col("__rn").between(lo, hi)).drop("__rn")
          .coalesce(1).write.parquet(tmp.toString)
        val part = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet written for chunk $k"))
        val dest = out.resolve(f"chunk-$k%02d.parquet")
        Files.move(part.toPath, dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L + k * 1000L))
        deleteRecursively(tmp)
      }
      out.toString
    })

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    Option(f.listFiles()).getOrElse(Array.empty).foreach(c => deleteRecursively(c.toPath))
    f.delete(); ()
  }

  /** Chunked replay WITH LATE DATA: the deterministic slice
    * `event_id % 50 == 7` (minus the stream's final row, so the on-time
    * max — and therefore the watermark — is unchanged by the withholding)
    * is REMOVED from its time-ordered position and arrives as a fifth
    * chunk after everything else. By then the watermark has advanced to
    * max(ts) − delay, so the withheld rows straddle it: the older ones
    * must be DROPPED as late, the recent ones accepted — the semantics
    * the all-in-order replay above can never exercise.
    */
  private def lateChunkedEventsDir(s: SparkSession, dir: String): String =
    lateChunkCache.getOrElseUpdate(dir, {
      val out = Files.createTempDirectory("graft-stream-late-")
      val ev = Tables.events(s, dir)
        .withColumn("__rn", row_number().over(Window.orderBy(col("ts"), col("event_id"))))
      val n = ev.count()
      val isLate = col("event_id") % 50 === 7 && col("__rn") < n
      def writeChunk(df: DataFrame, k: Int): Unit = {
        val tmp = out.resolve(s"tmp-$k")
        df.drop("__rn").coalesce(1).write.parquet(tmp.toString)
        val part = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet written for chunk $k"))
        val dest = out.resolve(f"chunk-$k%02d.parquet")
        Files.move(part.toPath, dest)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L + k * 1000L))
        deleteRecursively(tmp)
      }
      // chunks 0-3: the on-time rows at their global-rank quartiles (the
      // same boundaries as the in-order replay, minus the withheld slice)
      (0 until 4).foreach { k =>
        val lo = k * n / 4 + 1
        val hi = (k + 1) * n / 4
        writeChunk(ev.filter(!isLate && col("__rn").between(lo, hi)), k)
      }
      // watermark-carrier chunk: a REPEAT of the stream's max-ts row.
      // Spark propagates a watermark update with (at least) one batch of
      // lag — measured on 4.1.2: the watermark operative in batch k is
      // from batch k-2's data. This batch adds no new output (the dedup
      // drops the repeated event_id) and no new max; it exists so that by
      // the time the late chunk runs, the watermark REACHED max(ts) −
      // delay whatever the engine's exact propagation lag (1 or 2
      // batches), keeping the gate's drop boundary pinned to declared
      // semantics instead of a lag quirk.
      writeChunk(ev.filter(col("__rn") === n), 4)
      writeChunk(ev.filter(isLate), 5)
      out.toString
    })

  /** Run a streaming transform over the chunked events to a memory sink,
    * wait for AvailableNow to drain, and return the sink table.
    */
  private def runStream(
      s: SparkSession, dir: String, mode: OutputMode,
      statePartitions: Int = 4,
      lateReplay: Boolean = false,
      // Complete-mode gates: output is chunking-invariant and needs no
      // no-data flush batch, so they replay 2 chunks with
      // noDataMicroBatches off — same incremental state fold, half the
      // fixed per-batch latency. Append/watermark gates keep the
      // 4-chunk replay and no-data batches (their EMISSION depends on
      // watermark progression across batches).
      chunks: Int = 4,
      noDataBatches: Boolean = true)(
      transform: DataFrame => DataFrame): DataFrame = {
    val src = if (lateReplay) lateChunkedEventsDir(s, dir)
      else chunkedEventsDir(s, dir, chunks)
    val schema = s.read.parquet(src).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    // Stateful operators instantiate (and commit) one state store per
    // shuffle partition per micro-batch, so the session-wide partition
    // count — sized for batch shuffles — multiplies straight into
    // per-batch fixed cost. Size state parallelism to the stream instead;
    // the partition count binds at checkpoint creation, so setting it just
    // for the start of this query is safe and local. On a real cluster
    // this is the same knob, sized to state volume ÷ target store size.
    // Round 18 re-measured the interval joins' former 8-store override:
    // per-batch cost is store-commit fixed cost with CONTENTION that grows
    // with concurrent state tasks (2≈4 < 8 ≪ 32: 32 stores read 2.3 s per
    // TASK vs 0.24 s at 8 — a 20× taskTime blowup on identical ~5 MB
    // state), so the joins now ride the family default; by the volume ÷
    // 64 MB sizing rule even 4 is generous for this state.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q =
      try {
        s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatches.toString)
        transform(stream).writeStream
          .format("memory").queryName(name)
          .option("checkpointLocation", ckptDir("graft-ckpt-"))
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prev)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      }
    q.awaitTermination()
    graft.QueryTelemetry.recordStream(q)
    s.table(name)
  }

  def all: Seq[Q] = Seq(
    // ---- streaming ACID ingest (DeltaStreamer-shaped: stream → upsert) ----------
    // Each micro-batch lands as ONE transactional upsert into an AcidTable
    // keyed by event_id with ts precombine — the lakehouse streaming-ingest
    // capability (Hudi DeltaStreamer's job) on the native manifest layer.
    // Batch-level semantics are last-writer-wins per key across batches and
    // greatest-precombine (deterministic full-row tie-break) within a
    // batch; upserting a deterministic batch twice is a no-op, so
    // AvailableNow replay gives effectively-once results on at-least-once
    // delivery. The oracle reconstructs the chunk assignment (row_number
    // over µs-truncated ts, quartile boundaries with integer division —
    // exactly chunkedEventsDir's split) and picks per key the winner of
    // (chunk DESC, ts DESC, remaining columns DESC).
    Q(
      "q_acid_stream_ingest",
      (s, dir) => {
        val src = chunkedEventsDir(s, dir)
        val schema = s.read.parquet(src).schema
        val t = graft.lake.AcidTable.create(s,
          Files.createTempDirectory("acid-ingest-").resolve("t").toString,
          schema, pkCol = "event_id", partitionCol = "event_type",
          precombineCol = Some("ts"),
          // an event's type never changes across replays, so a key's
          // partition is stable — the producer contract that lets every
          // commit derive its touched cells from the batch alone instead
          // of a per-commit matched-key join against the whole snapshot
          stablePartitions = true)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
        val prev = s.conf.get("spark.sql.shuffle.partitions")
        val q =
          try {
            s.conf.set("spark.sql.shuffle.partitions", "4")
            stream.writeStream
              .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], _: Long) => {
                t.upsert(batch.toDF()); ()
              })
              .option("checkpointLocation", ckptDir("graft-ckpt-"))
              .trigger(Trigger.AvailableNow())
              .start()
          } finally s.conf.set("spark.sql.shuffle.partitions", prev)
        q.awaitTermination()
        graft.QueryTelemetry.recordStream(q)
        t.snapshot()
          .select(col("event_id"), expr("unix_micros(ts)").as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props,
                 row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
                 count(*) OVER () AS n
          FROM events),
        chunked AS (
          SELECT *, CASE WHEN rn <= n // 4 THEN 0
                         WHEN rn <= (2 * n) // 4 THEN 1
                         WHEN rn <= (3 * n) // 4 THEN 2
                         ELSE 3 END AS chunk
          FROM ev),
        picked AS (
          SELECT event_id, ts_us, user_id, event_type, value, props,
                 row_number() OVER (PARTITION BY event_id
                   ORDER BY chunk DESC, ts_us DESC, user_id DESC,
                            event_type DESC, value DESC, props DESC) AS pick
          FROM chunked)
        SELECT event_id, ts_us, user_id, event_type, value, props
        FROM picked WHERE pick = 1 ORDER BY event_id
      """)),

    // ---- C5 streaming CHANGE-FEED source (round 10) -----------------------------
    // The read side of the CDC surface: an AcidTable consumed as a
    // Structured Streaming source of version-ordered row images (Delta
    // readChangeFeed semantics). This gate drives a 3-commit corpus
    // lifecycle — standing corpus, ingest+revision, takedown delete —
    // then drains the change feed one VERSION per micro-batch
    // (admission-control sizing) into a memory sink. The DuckDB oracle
    // recomputes every version's insert/delete row images from the same
    // modular slices, so a green row pins the stream's content, its
    // version attribution, AND the delete+insert pairing of revisions.
    Q(
      "q_acid_stream_cdc",
      (s, dir) => {
        import org.apache.spark.sql.types.{LongType, StringType => SStr, StructField, StructType}
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", SStr),
          StructField("text", SStr)))
        val t = graft.lake.AcidTable.create(s,
          Files.createTempDirectory("acid-cdc-").resolve("t").toString,
          schema, "doc_id", "lang", stablePartitions = true)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text"))
        t.upsert(docs.filter(col("doc_id") % 7 =!= 3))
        t.upsert(docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 11 === 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" delta")))
              .otherwise(concat(col("text"), lit(" rev2")))))
        t.delete(docs.filter(col("doc_id") % 13 === 5).select(col("doc_id")))
        val name = s"graft_cdc_${nameCounter.incrementAndGet()}"
        val q = graft.lake.AcidCdc.readStream(s, t.path, maxVersionsPerBatch = Some(1L))
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation", ckptDir("graft-ckpt-"))
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        graft.QueryTelemetry.recordStream(q)
        s.table(name)
          .orderBy(col("_commit_version"), col("_change_type"), col("doc_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, text FROM documents),
        v0 AS (SELECT doc_id, lang, text, 'insert' AS _change_type,
                      CAST(0 AS BIGINT) AS _commit_version
               FROM d WHERE doc_id % 7 <> 3),
        v1ins AS (SELECT doc_id, lang,
                         CASE WHEN doc_id % 7 = 3 THEN text || ' delta'
                              ELSE text || ' rev2' END AS text,
                         'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
                  FROM d WHERE doc_id % 7 = 3 OR doc_id % 11 = 0),
        v1del AS (SELECT doc_id, lang, text, 'delete' AS _change_type,
                         CAST(1 AS BIGINT) AS _commit_version
                  FROM d WHERE doc_id % 7 <> 3 AND doc_id % 11 = 0),
        v2del AS (SELECT doc_id, lang,
                         CASE WHEN doc_id % 7 = 3 THEN text || ' delta'
                              WHEN doc_id % 11 = 0 THEN text || ' rev2'
                              ELSE text END AS text,
                         'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
                  FROM d WHERE doc_id % 13 = 5)
        SELECT * FROM v0
        UNION ALL SELECT * FROM v1ins
        UNION ALL SELECT * FROM v1del
        UNION ALL SELECT * FROM v2del
        ORDER BY _commit_version, _change_type, doc_id
      """)),

    // ---- C5 native streaming SINK with exactly-once batch ledger (round 10) -----
    // The write side as a first-class format: the same chunked-events
    // replay as q_acid_stream_ingest, but through
    // writeStream.format("graft-acid") — one transactional upsert per
    // micro-batch with the (stream, batch) identity stamped INTO the
    // commit manifest (Delta txnAppId/txnVersion). The stream then runs a
    // SECOND time from the same checkpoint: nothing may re-commit, so a
    // green row additionally pins restart idempotence at the value level
    // (version-level skipping is pinned in AcidStreamSinkSpec).
    Q(
      "q_acid_stream_sink",
      (s, dir) => {
        val src = chunkedEventsDir(s, dir)
        val schema = s.read.parquet(src).schema
        val t = graft.lake.AcidTable.create(s,
          Files.createTempDirectory("acid-sink-").resolve("t").toString,
          schema, pkCol = "event_id", partitionCol = "event_type",
          precombineCol = Some("ts"), stablePartitions = true)
        val ckpt = ckptDir("acid-sink-ckpt-")
        def runOnce(): Unit = {
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
            .writeStream.format("graft-acid")
            .option("path", t.path)
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          graft.QueryTelemetry.recordStream(q)
        }
        runOnce()
        val vOnce = t.latestVersion()
        runOnce() // restart from the same checkpoint: no new commits
        require(t.latestVersion() == vOnce,
          "checkpoint restart re-committed a replayed batch")
        t.snapshot()
          .select(col("event_id"), expr("unix_micros(ts)").as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props,
                 row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
                 count(*) OVER () AS n
          FROM events),
        chunked AS (
          SELECT *, CASE WHEN rn <= n // 4 THEN 0
                         WHEN rn <= (2 * n) // 4 THEN 1
                         WHEN rn <= (3 * n) // 4 THEN 2
                         ELSE 3 END AS chunk
          FROM ev),
        picked AS (
          SELECT event_id, ts_us, user_id, event_type, value, props,
                 row_number() OVER (PARTITION BY event_id
                   ORDER BY chunk DESC, ts_us DESC, user_id DESC,
                            event_type DESC, value DESC, props DESC) AS pick
          FROM chunked)
        SELECT event_id, ts_us, user_id, event_type, value, props
        FROM picked WHERE pick = 1 ORDER BY event_id
      """)),

    // ---- C5 live table-to-table pipeline: CDC source → transform → ACID sink ----
    // The full lakehouse loop with NO foreachBatch glue: table A's change
    // feed streams version-by-version (maxVersionsPerBatch=1) through a
    // derived-column transform into table B via the graft-acid sink, each
    // micro-batch an exactly-once transactional upsert. Lifecycle is
    // inserts + revisions (the derived-table pattern; takedown deletes
    // need a merge-with-delete consumer, which is the batch CDC path).
    // The oracle computes B's final derived state straight from the
    // documents table.
    Q(
      "q_acid_pipeline_live",
      (s, dir) => {
        import org.apache.spark.sql.types.{LongType, StringType => SStr, StructField, StructType}
        val aSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", SStr),
          StructField("text", SStr)))
        val a = graft.lake.AcidTable.create(s,
          Files.createTempDirectory("pipe-a-").resolve("t").toString,
          aSchema, "doc_id", "lang", stablePartitions = true)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text"))
        a.upsert(docs.filter(col("doc_id") % 7 =!= 3))
        a.upsert(docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 11 === 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" delta")))
              .otherwise(concat(col("text"), lit(" rev2")))))
        val bSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", SStr),
          StructField("text_len", LongType)))
        val b = graft.lake.AcidTable.create(s,
          Files.createTempDirectory("pipe-b-").resolve("t").toString,
          bSchema, "doc_id", "lang", stablePartitions = true)
        val q = graft.lake.AcidCdc.readStream(s, a.path, maxVersionsPerBatch = Some(1L))
          .filter(col("_change_type") === "insert")
          .select(col("doc_id"), col("lang"),
            length(col("text")).cast("long").as("text_len"))
          .writeStream.format("graft-acid")
          .option("path", b.path)
          .option("checkpointLocation", ckptDir("pipe-ckpt-"))
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.QueryTelemetry.recordStream(q)
        b.snapshot().orderBy(col("doc_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, text FROM documents),
        final AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 7 = 3 THEN text || ' delta'
                      WHEN doc_id % 11 = 0 THEN text || ' rev2'
                      ELSE text END AS text
          FROM d)
        SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS text_len
        FROM final ORDER BY doc_id
      """)),

    // ---- C37 tumbling window aggregation with watermark -------------------------
    Q(
      "q_stream_tumbling",
      (s, dir) =>
        runStream(s, dir, OutputMode.Complete(), chunks = 2, noDataBatches = false) { ev =>
          ev.withWatermark("ts", "30 minutes")
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
        }.select(
            unix_timestamp(col("window.start")).as("ws"),
            col("event_type"), col("n"), col("sum_val"))
          .orderBy(col("ws"), col("event_type")),
      Some("""
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS ws,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        FROM events GROUP BY 1, 2 ORDER BY ws, event_type
      """)),

    // ---- C37 tumbling windows in APPEND mode (watermark-closed emission) --------
    // Append emits a window exactly once, when the watermark passes its
    // end — the production output mode for exactly-once sinks. With the
    // deterministic chunk replay the final watermark is max(ts) − 30 min,
    // so the emitted set is precisely the windows whose end ≤ that bound;
    // the oracle applies the same closure rule.
    Q(
      "q_stream_tumbling_append",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          ev.withWatermark("ts", "30 minutes")
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"))
        }.select(
            unix_timestamp(col("window.start")).as("ws"),
            col("event_type"), col("n"))
          .orderBy(col("ws"), col("event_type")),
      Some("""
        WITH wm AS (SELECT CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) AS BIGINT) - 1800 AS w
                    FROM events)
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS ws,
               event_type, COUNT(*) AS n
        FROM events, wm
        GROUP BY 1, 2, wm.w
        HAVING CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 * 3600 + 3600 <= wm.w
        ORDER BY ws, event_type
      """)),

    // ---- C37 sliding window aggregation -----------------------------------------
    Q(
      "q_stream_sliding",
      (s, dir) =>
        runStream(s, dir, OutputMode.Complete(), chunks = 2, noDataBatches = false) { ev =>
          ev.withWatermark("ts", "30 minutes")
            .groupBy(window(col("ts"), "1 hour", "30 minutes"))
            .agg(count(lit(1)).as("n"))
        }.select(unix_timestamp(col("window.start")).as("ws"), col("n"))
          .orderBy(col("ws")),
      Some("""
        WITH w AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 1800 * 1800 - k.k * 1800 AS ws
          FROM events, (SELECT unnest([0, 1]) AS k) k)
        SELECT ws, COUNT(*) AS n FROM w GROUP BY ws ORDER BY ws
      """)),

    // ---- C38 session windows (30-minute gap) per user ---------------------------
    Q(
      "q_stream_session",
      (s, dir) =>
        runStream(s, dir, OutputMode.Complete(), chunks = 2, noDataBatches = false) { ev =>
          ev.withWatermark("ts", "30 minutes")
            .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
            .agg(count(lit(1)).as("n"))
        }.select(
            col("user_id"),
            unix_timestamp(col("session_window.start")).as("session_start"),
            col("n"))
          .orderBy(col("user_id"), col("session_start")),
      Some("""
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM o)
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n
        FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_start
      """)),

    // ---- C39 stateful dedup with watermark --------------------------------------
    Q(
      "q_stream_dedup",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          ev.withWatermark("ts", "30 minutes")
            .dropDuplicates("user_id", "event_type")
        }.select(col("user_id"), col("event_type"), col("event_id"))
          .orderBy(col("user_id"), col("event_type")),
      Some("""
        SELECT user_id, event_type, event_id FROM
          (SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type
      """)),

    // ---- C39 state-bounded dedup: dropDuplicatesWithinWatermark (round 18c) -----
    // The production form of streaming dedup: unlike dropDuplicates
    // (whose per-key state lives FOREVER — unbounded on an endless
    // stream), WithinWatermark evicts a key's state once the watermark
    // passes its event time + delay, so state is bounded by the delay
    // window. Determinism contract for the oracle: the delay here
    // EXCEEDS the corpus's event-time span, so no state can expire
    // during the replay and the output is exactly first-occurrence
    // dedup — same oracle as q_stream_dedup, but executed by the
    // distinct bounded-state operator (StreamingDeduplicationWithin-
    // Watermark). The semantics the span hides — eviction and RE-EMISSION
    // of a key after its window passes, where dropDuplicates stays
    // silent forever — are pinned batch-by-batch in
    // DedupWithinWatermarkSpec, where crafted MemoryStream batches make
    // watermark progression explicit.
    Q(
      "q_stream_dedup_within_wm",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          ev.withWatermark("ts", "365 days")
            .dropDuplicatesWithinWatermark("user_id", "event_type")
        }.select(col("user_id"), col("event_type"), col("event_id"))
          .orderBy(col("user_id"), col("event_type")),
      Some("""
        SELECT user_id, event_type, event_id FROM
          (SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type
      """)),

    // ---- C39 watermark LATE-DATA semantics (the drop rule itself) ---------------
    // The in-order replay can never drop a row, so this gate runs the
    // late replay: the withheld slice arrives LAST, after the watermark
    // has advanced to max(ts) − 72 h. Through watermarked dropDuplicates
    // (accepted rows emit immediately in append mode — unlike a windowed
    // agg, whose never-emitted open windows would make acceptance
    // unobservable), a withheld row older than the watermark MUST vanish
    // and a recent one MUST appear. The oracle replays the exact rule:
    // on-time rows ∪ withheld rows with ts ≥ on-time-max − 72 h.
    Q(
      "q_stream_late_drop",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append(), lateReplay = true) { ev =>
          ev.withWatermark("ts", "72 hours")
            .dropDuplicates("event_id")
        }.select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_s"))
          .orderBy(col("event_id")),
      Some("""
        WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                          row_number() OVER (ORDER BY ts, event_id) AS rn,
                          count(*) OVER () AS n
                   FROM events),
        flagged AS (SELECT *, (event_id % 50 = 7 AND rn < n) AS is_late FROM e),
        mx AS (SELECT max(ts) AS m FROM flagged WHERE NOT is_late)
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM flagged, mx
        WHERE NOT is_late OR ts >= m - INTERVAL 72 HOUR
        ORDER BY event_id
      """)),

    // ---- C39 late data MERGING into an open windowed aggregate ------------------
    // The other side of the drop rule: an accepted late row must UPDATE
    // the aggregate state of its still-open window. Update mode makes
    // that observable — the memory sink collects every per-batch emission
    // of a changed window, so max(n) per window over all emissions IS the
    // final count including the late merges (counts only grow). The
    // aggregation drop rule keys on the WINDOW END (a late row whose
    // window closed is dropped; one whose 1-hour window end is still
    // above the watermark merges), which the oracle replays — including
    // the watermark-carrier repeat of the max row, which an aggregation
    // (unlike the dedup gate) genuinely counts twice.
    Q(
      "q_stream_late_window_update",
      (s, dir) =>
        runStream(s, dir, OutputMode.Update(), lateReplay = true) { ev =>
          ev.withWatermark("ts", "72 hours")
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"))
        }.groupBy(unix_timestamp(col("window.start")).as("ws"), col("event_type"))
          .agg(max(col("n")).as("n"))
          .orderBy(col("ws"), col("event_type")),
      Some("""
        WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                          row_number() OVER (ORDER BY ts, event_id) AS rn,
                          count(*) OVER () AS n,
                          event_id % 50 = 7 AS flag
                   FROM events),
        flagged AS (SELECT *, (flag AND rn < n) AS is_late FROM e),
        mx AS (SELECT max(ts) AS m FROM flagged WHERE NOT is_late),
        kept AS (SELECT event_type, ts FROM flagged, mx
                 WHERE NOT is_late
                    OR CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 + 3600
                       > CAST(floor(epoch(m)) AS BIGINT) - 259200
                 UNION ALL
                 SELECT event_type, ts FROM flagged WHERE rn = n)
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS ws,
               event_type, COUNT(*) AS n
        FROM kept GROUP BY 1, 2 ORDER BY ws, event_type
      """)),

    // ---- C40 stream-static broadcast join ---------------------------------------
    Q(
      "q_stream_static_join",
      (s, dir) => {
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        // stateless passthrough: no watermark, no state — output is the
        // union of all batches whatever the chunking
        runStream(s, dir, OutputMode.Append(), chunks = 2, noDataBatches = false) { ev =>
          ev.join(broadcast(dim), col("user_id") === col("c_custkey"))
            .select(col("event_id"), col("user_id"), col("event_type"), col("c_mktsegment"))
        }.orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type, c_mktsegment
        FROM events JOIN customer ON user_id = c_custkey
        ORDER BY event_id
      """)),

    // ---- stream-stream interval join: view → purchase within 1 hour -------------
    // Watermark (2h) exceeds the join window (1h) plus the batch skew, so no
    // match is ever evicted before its partner can arrive — append-mode
    // output equals the batch interval join the oracle computes.
    Q(
      "q_stream_stream_join",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          val views = ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
            .withWatermark("view_ts", "2 hours")
          val purchases = ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
            .withWatermark("purchase_ts", "2 hours")
          views.join(purchases,
            col("user_id") === col("p_user_id")
              && col("purchase_ts") >= col("view_ts")
              && col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
        }.select(col("user_id"), col("view_id"), col("purchase_id"))
          .orderBy(col("user_id"), col("view_id"), col("purchase_id")),
      Some("""
        SELECT v.user_id AS user_id, v.event_id AS view_id, p.event_id AS purchase_id
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY user_id, view_id, purchase_id
      """)),

    // ---- stream-stream LEFT OUTER interval join ---------------------------------
    // Unmatched views surface with purchase_id = -1 once the watermark
    // evicts their state: a view can emit null-side output only after the
    // join window (1 h) plus the watermark delay (2 h) have passed the
    // global watermark, i.e. views with view_ts < min(max view_ts,
    // max purchase_ts) − 3 h. The chunked replay advances the watermark
    // deterministically, and AvailableNow's trailing no-data batch runs
    // the final eviction, so the outer results are exactly reproducible —
    // the oracle mirrors the eviction rule in SQL.
    Q(
      "q_stream_stream_left_join",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          val views = ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
            .withWatermark("view_ts", "2 hours")
          val purchases = ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
            .withWatermark("purchase_ts", "2 hours")
          views.join(purchases,
            col("user_id") === col("p_user_id")
              && col("purchase_ts") >= col("view_ts")
              && col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
            "left_outer")
        }.select(col("user_id"), col("view_id"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
          .orderBy(col("user_id"), col("view_id"), col("purchase_id")),
      Some("""
        WITH v AS (SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS vts
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts
              FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(vts) FROM v), (SELECT max(pts) FROM p))
                      - INTERVAL 2 HOUR AS w),
        m AS (SELECT v.user_id, v.view_id, p.purchase_id
              FROM v JOIN p ON v.user_id = p.user_id
               AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR),
        um AS (SELECT v.user_id, v.view_id, CAST(-1 AS BIGINT) AS purchase_id
               FROM v, wm
               WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id
                 AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR)
                 AND v.vts + INTERVAL 1 HOUR < wm.w)
        SELECT user_id, view_id, purchase_id FROM m
        UNION ALL SELECT user_id, view_id, purchase_id FROM um
        ORDER BY user_id, view_id, purchase_id
      """)),

    // ---- C40+ stream-stream FULL OUTER interval join (round 18c) ----------------
    // Completes the stream-stream join matrix (inner, left, full): BOTH
    // sides' unmatched rows must emit exactly once, each when ITS state
    // can no longer match — a view when its 1-hour forward window falls
    // fully below the join watermark (vts + 1h < wm, the left gate's
    // rule), a purchase when no view can still arrive for it (views
    // match with vts ∈ [pts − 1h, pts] and late views are bounded below
    // by wm, so eviction is pts < wm). The oracle replays both eviction
    // rules against the final watermark min(max vts, max pts) − 2 h.
    Q(
      "q_stream_stream_full_join",
      (s, dir) =>
        runStream(s, dir, OutputMode.Append()) { ev =>
          val views = ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
            .withWatermark("view_ts", "2 hours")
          val purchases = ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
            .withWatermark("purchase_ts", "2 hours")
          views.join(purchases,
            col("user_id") === col("p_user_id")
              && col("purchase_ts") >= col("view_ts")
              && col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
            "full_outer")
        }.select(coalesce(col("user_id"), col("p_user_id")).as("uid"),
            coalesce(col("view_id"), lit(-1L)).as("view_id"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
          .orderBy(col("uid"), col("view_id"), col("purchase_id")),
      Some("""
        WITH v AS (SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS vts
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts
              FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT least((SELECT max(vts) FROM v), (SELECT max(pts) FROM p))
                      - INTERVAL 2 HOUR AS w),
        m AS (SELECT v.user_id AS uid, v.view_id, p.purchase_id
              FROM v JOIN p ON v.user_id = p.user_id
               AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR),
        um AS (SELECT v.user_id AS uid, v.view_id, CAST(-1 AS BIGINT) AS purchase_id
               FROM v, wm
               WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id
                 AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR)
                 AND v.vts + INTERVAL 1 HOUR < wm.w),
        up AS (SELECT p.user_id AS uid, CAST(-1 AS BIGINT) AS view_id, p.purchase_id
               FROM p, wm
               WHERE NOT EXISTS (SELECT 1 FROM v WHERE v.user_id = p.user_id
                 AND p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 1 HOUR)
                 AND p.pts < wm.w)
        SELECT uid, view_id, purchase_id FROM m
        UNION ALL SELECT uid, view_id, purchase_id FROM um
        UNION ALL SELECT uid, view_id, purchase_id FROM up
        ORDER BY uid, view_id, purchase_id
      """)),

    // ---- C41 (Spark 4 API): same counters via transformWithState ----------------
    Q(
      "q_stream_state_tws",
      (s, dir) => {
        import s.implicits._
        // transformWithState requires the RocksDB state store provider
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val updated =
          try runStream(s, dir, OutputMode.Update()) { ev =>
            ev.as[Event]
              .groupByKey(_.user_id)
              .transformWithState(
                new CounterProcessor, TimeMode.None(), OutputMode.Update())
              .toDF()
          } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        updated
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("n_events"), col("last_event_type"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH last AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT e.user_id AS user_id, COUNT(*) AS n_events,
               max(l.event_type) AS last_event_type
        FROM events e JOIN last l ON e.user_id = l.user_id AND l.rn = 1
        GROUP BY e.user_id ORDER BY e.user_id
      """)),

    // ---- C41 custom keyed state: per-user running counters ----------------------
    Q(
      "q_stream_state_counter",
      (s, dir) => {
        import s.implicits._
        val updated = runStream(s, dir, OutputMode.Update()) { ev =>
          ev.as[Event]
            .groupByKey(_.user_id)
            .flatMapGroupsWithState[UserCounter, UserCounter](
              OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
              (userId: Long, rows: Iterator[Event], state: GroupState[UserCounter]) =>
                val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
                if (sorted.isEmpty) Iterator.empty
                else {
                  val prev = state.getOption.getOrElse(UserCounter(userId, 0L, ""))
                  val next = UserCounter(
                    userId, prev.n_events + sorted.size, sorted.last.event_type)
                  state.update(next)
                  Iterator(next)
                }
            }.toDF()
        }
        // Update-mode sink holds one row per (user, batch); the final state
        // is the row with the greatest running count per user
        updated
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("n_events"), col("last_event_type"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH last AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT e.user_id AS user_id, COUNT(*) AS n_events,
               max(l.event_type) AS last_event_type
        FROM events e JOIN last l ON e.user_id = l.user_id AND l.rn = 1
        GROUP BY e.user_id ORDER BY e.user_id
      """))
  )
}
