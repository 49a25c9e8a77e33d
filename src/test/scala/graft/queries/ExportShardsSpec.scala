package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The shard-export writer's PHYSICAL contract — what the oracle gate
  * (`q_export_shards`, content digests) cannot see: the on-disk layout is
  * one `shard=N` directory per shard with one parquet file each, rows
  * inside every file are sorted by the deterministic stream order
  * (k, doc_id) ON DISK (a trainer streams a shard file without sorting),
  * and two runs over the same input produce identical row streams.
  */
class ExportShardsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val NS = 8

  /** Run the export, return the written root (the query's temp dir is
    * internal — replicate the exact write here from the gate's frame). */
  private def runExport(): String = {
    val out = java.nio.file.Files
      .createTempDirectory("export-spec-").resolve("shards").toString
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        size(split(trim(col("text")), " ")).cast("long").as("ntok"))
      .withColumn("k", graft.functions.TextHash.polyHash(concat(lit("shrd:"), col("text"))))
      .withColumn("shard", col("k") % NS)
      .repartition(NS, col("shard"))
      .sortWithinPartitions(col("shard"), col("k"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    out
  }

  test("layout: one directory per shard, one sorted file per shard") {
    val out = runExport()
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length === NS, s"expected $NS shard dirs, got ${dirs.toSeq}")
    dirs.foreach { d =>
      val files = new java.io.File(out, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"$d: expected one file, got ${files.length}")
      // physical order: the file's row stream is non-decreasing (k, doc_id)
      val rows = spark.read.parquet(files.head.getPath)
        .select("k", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == rows.toSeq.sorted,
        s"$d: rows not in (k, doc_id) order on disk")
      assert(rows.nonEmpty, s"$d: empty shard at this corpus size is a red flag")
    }
  }

  test("determinism: two runs produce identical per-shard row streams") {
    val a = runExport()
    val b = runExport()
    (0 until NS).foreach { sh =>
      def stream(root: String) =
        spark.read.parquet(s"$root/shard=$sh")
          .select("doc_id", "k", "ntok", "text").collect()
          .map(_.toSeq).toSeq
      assert(stream(a) == stream(b), s"shard $sh diverged between runs")
    }
  }

  test("written artifact covers the corpus exactly once (no loss, no dup)") {
    val out = runExport()
    val written = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val source = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(written == source)
  }

  test("gate digest equals a digest computed straight from the assignment") {
    // consistency between the written-artifact digest (what q_export_shards
    // returns) and the pure assignment (q_sample_shards' world): the write
    // must not perturb membership or token counts
    val fromGate = SparkEntry.queries("q_export_shards")(spark, sf)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("ntok"),
        (graft.functions.TextHash.polyHash(concat(lit("shrd:"), col("text"))) % NS).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("ntok").as("t"))
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fromGate == direct)
  }
}
