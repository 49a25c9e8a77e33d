package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import Qdsl._

/** SURVEY §2C C1-C4: scan/source/sink inventory. Roundtrip queries write to
  * a session-temp dir and read back through the public reader API, so the
  * full writer→parquet/csv/json→reader path is what's verified — the oracle
  * sees only the original table, so any encode/decode defect shows up as a
  * hash mismatch.
  */
object SourceQueries {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  def all: Seq[Q] = Seq(
    // ---- C1 parquet scan of every testdata table --------------------------
    Q(
      "q_scan_all_tables",
      (s, dir) => {
        val counts = Seq(
          "region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings")
          .map { t =>
            s.read.parquet(s"$dir/$t.parquet")
              .agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n"))
          }
        val ev = Tables.events(s, dir).agg(count(lit(1)).as("n"))
          .select(lit("events").as("tbl"), col("n"))
        (counts :+ ev).reduce(_ unionAll _).orderBy(col("tbl"))
      },
      Some("""
        SELECT tbl, n FROM (
          SELECT 'region' AS tbl, COUNT(*) AS n FROM region
          UNION ALL SELECT 'nation', COUNT(*) FROM nation
          UNION ALL SELECT 'customer', COUNT(*) FROM customer
          UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
          UNION ALL SELECT 'part', COUNT(*) FROM part
          UNION ALL SELECT 'orders', COUNT(*) FROM orders
          UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
          UNION ALL SELECT 'documents', COUNT(*) FROM documents
          UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
          UNION ALL SELECT 'events', COUNT(*) FROM events
        ) ORDER BY tbl
      """)),

    // ---- C2 CSV roundtrip with explicit schema ------------------------------
    Q(
      "q_src_csv",
      (s, dir) => {
        val out = tmpDir("graft_csv")
        Tables.nation(s, dir).write.mode("overwrite")
          .option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.schema(schema).option("header", "true").csv(out)
          .orderBy(col("n_nationkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // ---- C2 JSON-lines roundtrip with explicit schema ------------------------
    Q(
      "q_src_json",
      (s, dir) => {
        val out = tmpDir("graft_json")
        Tables.supplier(s, dir).write.mode("overwrite").json(out)
        val schema = StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType),
          StructField("s_acctbal", DoubleType)))
        s.read.schema(schema).json(out)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
      },
      Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey")),

    // ---- C2 XML roundtrip with explicit schema (built-in since Spark 4) -------
    Q(
      "q_src_xml",
      (s, dir) => {
        val out = tmpDir("graft_xml")
        Tables.nation(s, dir).write.mode("overwrite")
          .option("rootTag", "nations").option("rowTag", "nation")
          .format("xml").save(out)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.schema(schema).option("rowTag", "nation").format("xml").load(out)
          .orderBy(col("n_nationkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // ---- C2 binaryFile source (the raw-bytes ingest path multimodal sits on) --
    // One file per nation row, content = the row's name bytes — read back
    // through format("binaryFile") and digested (UTF-8 decode + polyHash +
    // length), so the gate pins path recovery, content bytes, and length
    // metadata against a pure SQL reconstruction.
    Q(
      "q_src_binaryfile",
      (s, dir) => {
        val out = tmpDir("graft_bin")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
          .collect().foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, f"n${r.getInt(0)}%03d.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        s.read.format("binaryFile").load(out)
          .select(
            regexp_extract(col("path"), "n(\\d+)\\.bin$", 1).cast("int").as("n_nationkey"),
            col("length").as("n_bytes"),
            graft.functions.TextHash.polyHash(decode(col("content"), "UTF-8"))
              .as("name_hash"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""
        SELECT n_nationkey, CAST(strlen(n_name) AS BIGINT) AS n_bytes,
               (${TextQueries.sqlPolyHash("n_name")}) AS name_hash
        FROM nation ORDER BY n_nationkey
      """)),

    // ---- C3 partitioned parquet sink + read-back -----------------------------
    Q(
      "q_sink_partitioned",
      (s, dir) => {
        val out = tmpDir("graft_sink")
        Tables.orders(s, dir).write.mode("overwrite")
          .partitionBy("o_orderstatus").parquet(out)
        // read-back goes through partition discovery; the filter below must
        // prune to a single partition directory (verified in PlanSpec)
        s.read.parquet(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """)),

    // ---- C4 in-memory typed source --------------------------------------------
    Q(
      "q_src_inmemory",
      (s, _) => {
        import s.implicits._
        val ds = Seq(
          ("alpha", 1L, 1.5), ("beta", 2L, 2.5), ("gamma", 3L, 3.5),
          ("delta", 4L, 4.5)).toDF("name", "id", "score")
        ds.filter($"id" >= 2L)
          .select($"id", $"name", ($"score" * 2).as("score2"))
          .orderBy($"id")
      },
      Some("""
        SELECT id, name, score * 2 AS score2
        FROM (VALUES ('alpha', CAST(1 AS BIGINT), 1.5),
                     ('beta', 2, 2.5), ('gamma', 3, 3.5), ('delta', 4, 4.5))
             t(name, id, score)
        WHERE id >= 2 ORDER BY id
      """))
  )
}
