package graft.lake

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Metadata-scale proof harness (round-14, r11 verdict #4): measure the
  * table-metadata operations that must stay flat-or-sublinear in LIVE FILE
  * COUNT for the 100 TB posture — snapshot planning, incremental commit,
  * hinted point lookup, SHOW PARTITIONS, DESCRIBE HISTORY — at 1 k / 10 k /
  * 100 k live files on the segmented-manifest layout (r12) with bloom
  * segments (r14).
  *
  * Layout synthesis: the probe partition (P0) is seeded with REAL data via
  * ordinary upserts, so point lookups and commits exercise the genuine
  * read/write path; the remaining partitions' files are zero-byte
  * placeholders published through the real commit protocol (one bulk
  * commit), so every metadata structure — root listing, per-partition
  * segments, sizes, file-count headers — is exactly what a real bulk load
  * of that file count produces. Nothing reads the placeholder files:
  * planning and pruning consult manifests and segments only, which is the
  * property being measured.
  *
  * Run: `sbt "runMain graft.lake.MetaScale [maxFiles]"` (default 100000).
  * Prints one line per (scale, operation): cold first-touch and warm
  * median milliseconds.
  */
object MetaScale {

  private val FilesPerPartition = 50

  def main(args: Array[String]): Unit = {
    val maxFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.graft.warehouse",
        Files.createTempDirectory("metascale-wh-").toString)
      .config("spark.sql.catalog.graft", "graft.lake.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("files,partitions,op,cold_ms,warm_median_ms,detail")
    Seq(1000, 10000, 100000).filter(_ <= maxFiles).foreach(n => run(spark, n))
    spark.stop()
  }

  private def timedMs(body: => Any): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def run(spark: SparkSession, nFiles: Int): Unit = {
    val nParts = nFiles / FilesPerPartition
    val schema = StructType(Seq(
      StructField("pk", StringType, nullable = false),
      StructField("part", StringType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    val dir = s"$wh/msdb/t$nFiles"
    val t = AcidTable.create(spark, dir, schema, "pk", "part",
      stablePartitions = true, numBuckets = FilesPerPartition)
    t.setTableProperty("bloomColumns", Some("pk"))

    // real probe partition: one upsert of enough keys to populate every
    // bucket of P0 with a real parquet file
    val seedRows = (0 until FilesPerPartition * 10).map(i =>
      Row(s"k$i", "P0", i.toDouble))
    t.upsert(spark.createDataFrame(
      java.util.Arrays.asList(seedRows: _*), schema), Some(Seq("P0")))
    val realFiles = t.filesForPartitions(t.latestVersion(), Seq("P0"))

    // placeholder partitions P1..P(nParts-1), FilesPerPartition files each,
    // zero-byte on disk (stat probes see them; nothing reads them),
    // published through the REAL commit protocol in one bulk commit
    val dataRoot = java.nio.file.Paths.get(dir, "_data")
    val synth = (1 until nParts).flatMap { p =>
      val pd = s"part=P$p"
      Files.createDirectories(dataRoot.resolve(pd))
      (0 until FilesPerPartition).map { b =>
        val rel = f"$pd/b$b%03d-synth$p%05d.parquet"
        Files.createFile(dataRoot.resolve(rel))
        rel
      }
    }
    val allFiles = realFiles ++ synth
    val touched = (1 until nParts).map(p => FileCell(s"P$p", -1))
    val sizes = synth.map(_ -> 64L * 1024 * 1024).toMap
    val bulkMs = timedMs {
      t.publish(t.latestVersion() + 1, allFiles, touched, sizes, "BULKLOAD")
    }
    println(f"$nFiles,$nParts,bulk_publish,$bulkMs%.1f,,one commit touching ${nParts - 1} partitions")

    // fresh handle = cold per-table caches for the first-touch numbers
    // (segment/bloom caches are process-wide keyed by path+name, so the
    // cold row after a same-JVM build is "driver restarted" equivalent
    // only for the manifest root; note it as such)
    def emit(op: String, cold: Double, warm: Seq[Double], detail: String = ""): Unit =
      println(f"$nFiles,$nParts,$op,$cold%.1f,${median(warm)}%.1f,$detail")

    // 1. snapshot planning: build the scan DataFrame + physical plan
    //    (file-list resolution + pruning machinery, no execution)
    def planOnce(): Unit = {
      t.snapshot().queryExecution.executedPlan
      ()
    }
    val planCold = timedMs(planOnce())
    emit("snapshot_plan", planCold, (1 to 10).map(_ => timedMs(planOnce())))

    // 2. hinted point lookup: file resolution only (manifest + segment +
    //    bucket + bloom pruning)
    val probeKey = "k7"
    val resCold = timedMs(t.lookupFiles(Seq(probeKey), Some(Seq("P0"))))
    emit("lookup_files", resCold,
      (1 to 10).map(_ => timedMs(t.lookupFiles(Seq(probeKey), Some(Seq("P0"))))),
      s"resolved=${t.lookupFiles(Seq(probeKey), Some(Seq("P0"))).size} files")

    // 3. point lookup end-to-end (reads the real P0 file)
    val lkCold = timedMs(t.lookup(Seq(probeKey), Some(Seq("P0"))).collect())
    emit("lookup_e2e", lkCold,
      (1 to 10).map(_ => timedMs(t.lookup(Seq(probeKey), Some(Seq("P0"))).collect())))

    // 4. incremental commit: upsert one key into P0 (cell-scoped rewrite
    //    against the full-scale metadata), with the publish-phase share
    //    split out (AcidTable.publishNanos) to localize any growth
    val pubBefore = AcidTable.publishNanos.get()
    val commits = (1 to 10).map { i =>
      timedMs(t.upsert(spark.createDataFrame(
        java.util.Arrays.asList(Row("k7", "P0", -i.toDouble)), schema), Some(Seq("P0"))))
    }
    val pubMs = (AcidTable.publishNanos.get() - pubBefore) / 1e6 / commits.size
    emit("commit_upsert", commits.head, commits.tail,
      f"publish_phase_mean=$pubMs%.1f ms")

    // 4b. trickle CDC diff: changesBetween across the last 1-key commit —
    //     on segmented roots the diff drops identical partitions from the
    //     ROOT REFS without resolving their segments (round 14), so its
    //     metadata cost is O(changed partitions)
    val vHead = t.latestVersion()
    val cdcCold = timedMs(t.changesBetween(vHead - 1, vHead).count())
    emit("cdc_diff_trickle", cdcCold,
      (1 to 10).map(_ => timedMs(t.changesBetween(vHead - 1, vHead).count())))

    // 5. SHOW PARTITIONS through the catalog SQL front-end
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.msdb")
    val showCold = timedMs(spark.sql(s"SHOW PARTITIONS graft.msdb.t$nFiles").collect())
    emit("show_partitions", showCold,
      (1 to 10).map(_ => timedMs(
        spark.sql(s"SHOW PARTITIONS graft.msdb.t$nFiles").collect())),
      s"rows=${spark.sql(s"SHOW PARTITIONS graft.msdb.t$nFiles").count()}")

    // 6. DESCRIBE DETAIL: one-row summary (one root read on segments)
    val detCold = timedMs(t.detail().collect())
    emit("describe_detail", detCold, (1 to 10).map(_ => timedMs(t.detail().collect())))

    // 7. DESCRIBE HISTORY analog: full timeline header scan
    val histCold = timedMs(t.history().collect())
    emit("history", histCold, (1 to 10).map(_ => timedMs(t.history().collect())))
  }
}
