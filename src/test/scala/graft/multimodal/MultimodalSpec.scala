package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  private implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeFrames chunks payloads into FrameSize windows with stable features") {
    val payload = ("abcd" * 20).getBytes("UTF-8") // 80 bytes → frames of 32/32/16
    val media = Seq(MediaRecord(7L, payload, "text/plain")).toDS()
    val frames = decodeFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.frame_len)).toSeq
      == Seq((0, 32), (1, 32), (2, 16)))
    assert(frames.forall(_.doc_id == 7L))
    // frame 0 and 1 are byte-identical → identical features
    assert(frames(0).frame_hash == frames(1).frame_hash)
    assert(frames(0).mean_byte == frames(1).mean_byte)
    // hash matches the reference scalar implementation
    assert(frames(2).frame_hash == byteHash(payload.slice(64, 80)))
  }

  test("decodeFrames is distributed: runs per-partition without driver collect") {
    val media = spark.range(100)
      .select(col("id").as("doc_id"),
        encode(concat(lit("payload-"), col("id")), "utf-8").as("payload"),
        lit("text/plain").as("kind"))
      .repartition(8)
      .as[MediaRecord]
    val out = decodeFrames(media)
    assert(out.rdd.getNumPartitions == 8) // narrow transform, no shuffle
    assert(out.count() == 100)            // 1 frame per short payload
  }
}
