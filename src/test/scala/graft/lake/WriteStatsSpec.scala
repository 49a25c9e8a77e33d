package graft.lake

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Write-time file statistics: the `statsColumns` table property makes
  * every commit stamp min/max ranges onto its new files in the stats
  * sidecar clustered compaction feeds — so range pruning works on FRESH
  * data with no OPTIMIZE pass. These tests pin (1) that fresh commits'
  * files actually skip, (2) that the driver fast path keeps its
  * zero-Spark-jobs property while recording stats, (3) soundness under
  * rewrites (update/deleteWhere/compact refresh the rewritten files'
  * entries), and (4) the SQL catalog route end-to-end.
  */
class WriteStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("pk", StringType),
    StructField("part", StringType),
    StructField("x", LongType)))

  private def newTable() = {
    val t = AcidTable.create(
      spark, Files.createTempDirectory("write-stats-").resolve("t").toString,
      schema, "pk", "part", stablePartitions = true)
    t.setTableProperty("statsColumns", Some("x"))
    t
  }

  private def batch(rows: (String, String, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

  test("fresh commits' files skip on a range predicate with no OPTIMIZE") {
    val t = newTable()
    // the time-series append pattern: each commit lands in its own
    // partition with a disjoint x band (x correlates with ingest order).
    // Same-cell upserts would legitimately WIDEN file ranges — a COW
    // rewrite carries the cell's old rows into the new file — so the
    // skip story is per-commit-disjoint data, exactly how event data
    // arrives. The pruning predicate below is on x ONLY (no partition
    // conjunct): the file stats alone produce the skip.
    t.upsert(batch((1 to 20).map(i => (s"a$i", "P0", i.toLong)): _*))
    t.upsert(batch((1 to 20).map(i => (s"b$i", "P1", 1000L + i)): _*))
    t.upsert(batch((1 to 20).map(i => (s"c$i", "P2", 2000L + i)): _*))
    val all = t.rangePrunedFiles(Map.empty)
    val lowOnly = t.rangePrunedFiles(Map("x" -> (0L, 100L)))
    assert(lowOnly.nonEmpty && lowOnly.size < all.size,
      s"expected a strict file skip: ${lowOnly.size} of ${all.size}")
    // only commit 1's files can hold x <= 100 — no commit-2/3 file survives
    val midOnly = t.rangePrunedFiles(Map("x" -> (1000L, 1100L)))
    assert(midOnly.intersect(lowOnly).isEmpty,
      "disjoint-range commits must prune to disjoint file sets")
    // content through the pruned scan == plain filtered snapshot
    val got = t.snapshotRange(Map("x" -> (0L, 100L)))
      .filter(col("x").between(0, 100)).orderBy("pk")
      .collect().map(_.getString(0)).toSeq
    assert(got == (1 to 20).map(i => s"a$i").sorted)
  }

  test("driver fast-path commits record stats with zero Spark jobs") {
    val t = newTable()
    // warm codegen/writer init outside the counted window
    t.upsert(batch(("w1", "P0", 1L)), Some(Seq("P0")))
    val jobs = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      jobs.set(0)
      val v = t.upsert(batch(("k1", "P1", 500L), ("k2", "P1", 600L)), Some(Seq("P1")))
      Thread.sleep(500)
      assert(jobs.get() === 0, "stats recording broke the fast path's 0-job property")
      // and the stats genuinely landed: the new commit's files prune
      val newFiles = t.rangePrunedFiles(Map("x" -> (500L, 600L)), v)
      val none = t.rangePrunedFiles(Map("x" -> (10000L, 10001L)), v)
      assert(!none.exists(newFiles.contains),
        "fast-path files missing stats entries: nothing pruned")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("distributed commits record per-file stats over only the new files") {
    val t = newTable()
    AcidTable.localCommitEnabled = false
    try {
      t.upsert(batch((1 to 50).map(i => (s"a$i", "P0", i.toLong)): _*))
      t.upsert(batch((1 to 50).map(i => (s"b$i", "P0", 5000L + i)): _*))
    } finally AcidTable.localCommitEnabled = true
    val all = t.rangePrunedFiles(Map.empty)
    val low = t.rangePrunedFiles(Map("x" -> (0L, 100L)))
    assert(low.nonEmpty && low.size < all.size)
    val got = t.snapshotRange(Map("x" -> (0L, 100L)))
      .filter(col("x") <= 100).count()
    assert(got === 50)
  }

  test("rewrites refresh stats: update/deleteWhere/compact stay prunable and sound") {
    val t = newTable()
    t.upsert(batch((1 to 30).map(i => (s"a$i", s"P${i % 2}", i.toLong)): _*))
    t.upsert(batch((1 to 30).map(i => (s"b$i", s"P${i % 2}", 1000L + i)): _*))
    // shift the low band up: rewritten files must carry NEW ranges
    t.update(Seq("x" -> (col("x") + 5000L)), col("x") < 100L)
    def sound(lo: Long, hi: Long): Unit = {
      val viaStats = t.snapshotRange(Map("x" -> (lo, hi)))
        .filter(col("x").between(lo, hi)).orderBy("pk")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      val plain = t.snapshot().filter(col("x").between(lo, hi)).orderBy("pk")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      assert(viaStats == plain, s"range [$lo,$hi] diverged")
    }
    sound(0L, 100L)      // now empty — the old band moved
    sound(5000L, 5100L)  // the moved band
    sound(1000L, 1030L)  // untouched band
    t.deleteWhere(col("x") > 5015L && col("x") < 6000L)
    sound(5000L, 5100L)
    // a plain (non-clustered) compact rewrites file groups — the new
    // files must re-enter the sidecar via the same write-time hook.
    // Compaction INTERLEAVES the bands across bucket files, so a strict
    // skip is not expected here (that's what clusterBy is for) — assert
    // the entries exist and pruning stays sound.
    t.compact()
    val stats = t.readClusterStats()
    t.rangePrunedFiles(Map.empty).foreach { f =>
      assert(stats.get(f).exists(_.contains("x")),
        s"post-compact file $f lost its stats entry")
    }
    sound(1000L, 1030L)
    sound(0L, 10000L)
  }

  test("SQL catalog route: TBLPROPERTIES statsColumns prunes the DSv2 scan") {
    val wh = Files.createTempDirectory("write-stats-wh-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ws")
    spark.sql("""CREATE TABLE graft.ws.t (pk STRING, part STRING, x BIGINT)
      PARTITIONED BY (part)
      TBLPROPERTIES ('primaryKey' = 'pk', 'statsColumns' = 'x')""")
    spark.sql("INSERT INTO graft.ws.t SELECT CAST(id AS STRING), 'P0', id FROM range(0, 40)")
    spark.sql(
      "INSERT INTO graft.ws.t SELECT CAST(id AS STRING), 'P1', id FROM range(7000, 7040)")
    val t = AcidTable.open(spark, s"$wh/ws/t")
    val all = t.rangePrunedFiles(Map.empty)
    val low = t.rangePrunedFiles(Map("x" -> (0L, 50L)))
    assert(low.nonEmpty && low.size < all.size,
      "catalog-created table with statsColumns did not record write-time stats")
    val rows = spark.sql("SELECT pk FROM graft.ws.t WHERE x BETWEEN 0 AND 50")
      .collect().map(_.getString(0)).toSet
    assert(rows === (0 until 40).map(_.toString).toSet)
  }

  test("soundness property: random commits, random bounds, stats never change results") {
    val t = newTable()
    val rnd = new scala.util.Random(4242)
    (1 to 8).foreach { c =>
      val base = rnd.nextInt(5000).toLong
      val rows = (1 to 25).map { i =>
        (s"k${rnd.nextInt(120)}", s"P${rnd.nextInt(3)}", base + rnd.nextInt(400))
      }
      t.upsert(batch(rows: _*))
      if (c % 3 == 0) t.update(Seq("x" -> (col("x") + 17L)), col("x") % 7 === 0)
      if (c % 4 == 0) t.deleteWhere(col("x") % 11 === 3)
    }
    (1 to 10).foreach { _ =>
      val lo = rnd.nextInt(6000).toLong
      val hi = lo + rnd.nextInt(1500)
      val viaStats = t.snapshotRange(Map("x" -> (lo, hi)))
        .filter(col("x").between(lo, hi))
        .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_.toString).toSeq
      val plain = t.snapshot().filter(col("x").between(lo, hi))
        .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_.toString).toSeq
      assert(viaStats == plain, s"bounds [$lo,$hi] diverged")
    }
  }
}
