package graft

import scala.collection.concurrent.TrieMap

/** Per-entry runtime decomposition the bench embeds in its JSON record so
  * a driver-side number is SELF-adjudicating (round-16 verdict #3): the
  * BENCH_r16 record carried `q_acid_stream_ingest` at 54.9 s against
  * 2.7-3.6 s idle on identical code, and nothing in the record itself
  * could separate micro-batch WAIT inflation (box load) from a real plan
  * regression. Entries whose wall time is dominated by per-micro-batch
  * machinery or by iteration counts now record that decomposition here;
  * the bench child reads it after the timed reps and emits it alongside
  * the medians, so one record alone shows e.g. "4 batches × 0.4 s
  * execution inside a 50 s wall" — wait-dominated, not work-dominated.
  */
object QueryTelemetry {

  /** Per-micro-batch `triggerExecution` seconds of the last timed rep
    * per entry name — APPENDED within one measurement window (an entry
    * may drain several streaming queries per rep: matview maintenance
    * runs two, the sink gate replays twice), reset when the bench opens
    * the next window via [[beginEntry]]. Σ of an entry's list is its
    * real per-batch execution; wall − Σ is harness wait. */
  val streamBatches: TrieMap[String, Seq[Double]] = TrieMap.empty

  /** Fixpoint hop counts of the last timed rep, keyed `entry/label` so an
    * entry that drains TWO different fixpoint helpers in one rep records
    * both (a bare entry key would clobber the first — round-17 advice).
    * Recording is a NO-OP outside a bench measurement window (same rule
    * as streams) — an unkeyed fallback label would collide across
    * entries and children in the merged record. */
  val fixpointHops: TrieMap[String, Int] = TrieMap.empty

  /** The entry the bench is currently timing — the key telemetry records
    * under. Query code is entry-agnostic (one helper serves many
    * entries), so the bench names the measurement window instead. Empty
    * outside a bench run. */
  val currentEntry = new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Open a measurement window: name the entry and drop its previous
    * rep's telemetry so appends within THIS rep start clean. */
  def beginEntry(name: String): Unit = {
    currentEntry.set(name)
    streamBatches.remove(name)
    fixpointHops.keys.filter(_.startsWith(s"$name/")).foreach(fixpointHops.remove)
    ()
  }

  def endEntry(): Unit = currentEntry.set("")

  /** Record a drained streaming query's per-micro-batch execution
    * seconds under the current entry (no-op outside a bench window). */
  def recordStream(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val entry = currentEntry.get()
    if (entry.nonEmpty) {
      val secs = q.recentProgress.toSeq.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toDouble / 1000.0))
      if (secs.nonEmpty) {
        streamBatches.put(entry, streamBatches.getOrElse(entry, Nil) ++ secs); ()
      }
    }
  }

  def recordFixpoint(label: String, hops: Int): Unit = {
    val entry = currentEntry.get()
    if (entry.nonEmpty) { fixpointHops.put(s"$entry/$label", hops); () }
  }

  def clear(): Unit = { streamBatches.clear(); fixpointHops.clear() }
}
