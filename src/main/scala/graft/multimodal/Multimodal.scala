package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing (SURVEY §2C C46 / north-star): media payloads
  * travel as opaque `BinaryType` columns with typed metadata, and
  * decode / feature-extraction runs as a per-partition typed transform —
  * the Scala analogue of `mapInPandas` batch processing: no driver
  * materialization, executor-side iteration, stable output schema derived
  * from the case-class encoder.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `decodeFrames` "decodes" a payload into fixed-size byte windows and
  * per-window byte statistics — a deterministic fake standing in for e.g.
  * JPEG macroblock decode or audio frame FFT. Everything around it
  * (encoders, schema, partition-wise batching, shuffle boundaries) is the
  * real production shape: swapping in a native codec changes only the body
  * of [[decodeFrames]].
  */
object Multimodal {

  /** Bytes per fake "frame" (a real decoder would use codec frame sizes). */
  val FrameSize = 32

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], kind: String)

  final case class FrameFeature(
      doc_id: Long,
      frame_idx: Int,
      frame_len: Int,
      frame_hash: Long,
      mean_byte: Double)

  /** Same polynomial-rolling-hash family as
    * [[graft.functions.TextHash.polyHash]], over raw bytes — keeps the
    * DuckDB oracle able to recompute frame hashes for ASCII payloads.
    */
  def byteHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** STUBBED media resize: deterministic byte-stride downsample standing in
    * for an image resize / audio resample — halving `stride`-of-2 keeps
    * every other byte. The plumbing contract (binary in → binary out,
    * narrow map, no shuffle) is the production shape.
    */
  def resize(media: Dataset[MediaRecord], stride: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = r.payload.zipWithIndex.collect { case (b, i) if i % stride == 0 => b }
        r.copy(payload = out, kind = s"${r.kind};stride=$stride")
      }
    }
  }

  /** STUBBED frame sampling: keep every `everyNth` frame's features — the
    * video frame-sample step of a media pipeline.
    */
  def sampleFrames(frames: Dataset[FrameFeature], everyNth: Int)(implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    frames.filter(_.frame_idx % everyNth == 0)
  }

  /** STUBBED media decode: payload → frame-level features, one output row
    * per frame. Runs as `mapPartitions` so a real codec could amortize
    * per-partition init (codec handles, model weights) exactly like a
    * Pandas-UDF batch would.
    */
  def decodeFrames(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec/context allocation)
      rows.flatMap { r =>
        r.payload.grouped(FrameSize).zipWithIndex.map { case (bytes, i) =>
          val mean = if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
          FrameFeature(r.doc_id, i, bytes.length, byteHash(bytes), mean)
        }
      }
    }
  }
}
