package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column surface (SURVEY §2C C46). Payloads here are the
  * documents' UTF-8 bytes (ASCII in the testdata), so even the stubbed
  * frame decode is exactly recomputable by the DuckDB oracle via substring
  * arithmetic — the binary plumbing is verified end-to-end, not just
  * smoke-tested.
  */
object MultimodalQueries {

  private def sqlPolyHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  def all: Seq[Q] = Seq(
    // ---- C46 binary round-trip: encode → base64 → decode, length, digest --------
    Q(
      "q_mm_binary_roundtrip",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            // Spark's base64 MIME-chunks with \r\n every 76 chars; strip to
            // the canonical unchunked form DuckDB emits
            regexp_replace(base64(encode(col("text"), "utf-8")), "[\\r\\n]", "").as("b64"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            md5(encode(col("text"), "utf-8")).as("digest"),
            (decode(unbase64(base64(encode(col("text"), "utf-8"))), "utf-8") === col("text"))
              .as("roundtrip_ok"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               base64(encode(text)) AS b64,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS digest,
               (decode(from_base64(base64(encode(text)))) = text) AS roundtrip_ok
        FROM documents ORDER BY doc_id
      """)),

    // ---- C46 stubbed resize + frame-sample pipeline -----------------------------
    // resize(stride=2) keeps every other byte of the payload; the sampled
    // frames' features are recomputable by the oracle from the equivalent
    // substring (every other ASCII char).
    Q(
      "q_mm_resize_sample",
      (s, dir) => {
        implicit val spark = s
        import s.implicits._
        val media = Tables.documents(s, dir)
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
            lit("text/plain").as("kind"))
          .as[Multimodal.MediaRecord]
        val frames = Multimodal.decodeFrames(Multimodal.resize(media, 2))
        Multimodal.sampleFrames(frames, 2)
          .toDF()
          .withColumn("mean_byte", round(col("mean_byte"), 4))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some(s"""
        WITH resized AS (
          SELECT doc_id,
                 array_to_string(list_transform(
                   range(1, length(text) + 1, 2), i -> substr(text, CAST(i AS BIGINT), 1)), '') AS rt
          FROM documents WHERE doc_id < 50),
        f AS (
          SELECT doc_id, CAST(t.i AS INT) AS frame_idx,
                 substr(rt, CAST(t.i * 32 + 1 AS BIGINT), 32) AS fr
          FROM resized, unnest(range(0, 64)) AS t(i)
          WHERE t.i * 32 < length(rt) AND t.i % 2 = 0)
        SELECT doc_id, frame_idx,
               CAST(length(fr) AS INT) AS frame_len,
               ${sqlPolyHash("fr")} AS frame_hash,
               round(CAST(list_sum(list_transform(string_split(fr, ''),
                       c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(fr), 4) AS mean_byte
        FROM f ORDER BY doc_id, frame_idx
      """)),

    // ---- C46 media near-dup via frame signatures --------------------------------
    // The perceptual-hash dedup shape for video/audio corpora: each media
    // payload becomes an ordered signature of its first 8 frame hashes;
    // two payloads are near-dups when ≥6 positions agree (tolerates
    // localized edits). Signature compare is the codegen'd
    // PositionalEqCount; at 100 TB the signature table is tiny next to
    // the media and the pair join shuffles only (doc_id, 8 longs).
    Q(
      "q_mm_frame_sig_dedup",
      (s, dir) => {
        implicit val spark = s
        import s.implicits._
        val media = Tables.documents(s, dir)
          .filter(col("doc_id") < 300)
          .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
            lit("text/plain").as("kind"))
          .as[Multimodal.MediaRecord]
        val sigs = Multimodal.decodeFrames(media).toDF()
          .filter(col("frame_idx") < 8)
          .groupBy(col("doc_id"))
          .agg(transform(
            array_sort(collect_list(struct(col("frame_idx"), col("frame_hash")))),
            f => f.getField("frame_hash")).as("sig"))
        val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
        val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
        a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("eq_frames",
            org.apache.spark.sql.graft.PositionalEqCount
              .eqCount(col("sig_a"), col("sig_b")).cast("long"))
          .filter(col("eq_frames") >= 6)
          .select(col("doc_a"), col("doc_b"), col("eq_frames"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id, CAST(t.i AS INT) AS frame_idx,
                 substr(text, CAST(t.i * 32 + 1 AS BIGINT), 32) AS fr
          FROM documents, unnest(range(0, 8)) AS t(i)
          WHERE doc_id < 300 AND t.i * 32 < length(text)),
        sigs AS (
          SELECT doc_id, list(${sqlPolyHash("fr")} ORDER BY frame_idx) AS sig
          FROM f GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(list_sum(list_transform(range(1, least(len(a.sig), len(b.sig)) + 1),
                   i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS BIGINT) AS eq_frames
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, eq_frames FROM pairs
        WHERE eq_frames >= 6 ORDER BY doc_a, doc_b
      """)),

    // ---- C46 stubbed frame decode via typed mapPartitions -----------------------
    Q(
      "q_mm_decode_frames",
      (s, dir) => {
        implicit val spark = s
        import s.implicits._
        val media = Tables.documents(s, dir)
          .filter(col("doc_id") < 50)
          .select(
            col("doc_id"),
            encode(col("text"), "utf-8").as("payload"),
            lit("text/plain").as("kind"))
          .as[Multimodal.MediaRecord]
        Multimodal.decodeFrames(media)
          .toDF()
          .withColumn("mean_byte", round(col("mean_byte"), 4))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id, CAST(t.i AS INT) AS frame_idx,
                 substr(text, CAST(t.i * 32 + 1 AS BIGINT), 32) AS fr
          FROM documents, unnest(range(0, 64)) AS t(i)
          WHERE doc_id < 50 AND t.i * 32 < length(text))
        SELECT doc_id, frame_idx,
               CAST(length(fr) AS INT) AS frame_len,
               ${sqlPolyHash("fr")} AS frame_hash,
               round(CAST(list_sum(list_transform(string_split(fr, ''),
                       c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(fr), 4) AS mean_byte
        FROM f ORDER BY doc_id, frame_idx
      """))
  )
}
