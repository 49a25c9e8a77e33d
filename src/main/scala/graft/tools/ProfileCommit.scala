package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.lake.AcidTable

/** Diagnostic main: break a serial upsert-commit stream into its cost
  * components so commit-path optimization targets measured time, not
  * guesses. Not part of the driver contract; run manually:
  * `sbt "runMain graft.tools.ProfileCommit"`.
  */
object ProfileCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("pk", StringType, nullable = false),
      StructField("part", StringType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val dir = Files.createTempDirectory("profile-acid-")
    val t = AcidTable.create(spark, dir.resolve("t").toString, schema,
      pkCol = "pk", partitionCol = "part", precombineCol = Some("v"),
      stablePartitions = true)

    val rnd = new scala.util.Random(7)
    def batch(): org.apache.spark.sql.DataFrame = {
      val rows = (1 to 3).map { _ =>
        val k = rnd.nextInt(100)
        (s"key-$k", s"p${k % 4}", s"val-${rnd.nextInt(100000)}")
      }
      rows.toDF("pk", "part", "v")
    }

    def timed[A](n: Int)(body: => A): Double = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      times(n / 2) // median: one GC pause must not skew a 3-row timing
    }

    // warm up: codegen + writer init
    (1 to 20).foreach { _ =>
      val b = batch()
      t.upsert(b, Some(b.select("part").distinct().as[String].collect().toSeq))
    }

    // job accounting: how many Spark jobs does one commit launch, and how
    // much of the wall time is inside them vs driver-side planning/IO
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); jobStarts.put(s.jobId, System.nanoTime())
        if (jobCount.get() <= 6) {
          val cs = Option(s.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
          System.err.println(s"[profile] job ${s.jobId} callsite=$cs stages=${s.stageInfos.map(_.name).mkString(" | ")}")
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStarts.remove(e.jobId)).foreach(t0 => jobNanos.addAndGet(System.nanoTime() - t0))
      }
    })

    val nTxn = 100
    jobCount.set(0); jobNanos.set(0)
    AcidTable.resetCommitTimers()
    // 1. end-to-end upsert with partition hint (harness shape)
    val upsertMs = timed(nTxn) {
      val rows = (1 to 3).map { _ =>
        val k = rnd.nextInt(100)
        (s"key-$k", s"p${k % 4}", s"val-${rnd.nextInt(100000)}")
      }
      val parts = rows.map(_._2).distinct
      t.upsert(rows.toDF("pk", "part", "v"), Some(parts))
    }

    // listener events are async; give the bus a beat before reading
    Thread.sleep(500)
    val upsertJobs = jobCount.get().toDouble / nTxn
    val upsertJobMs = jobNanos.get().toDouble / 1e6 / nTxn
    // phase split of the upsert loop (per commit): the .parquet write call
    // (plan analysis + committer setup + the job), post-job file moves,
    // and manifest publish (fsync + hard link)
    val upsertWriteMs = AcidTable.writeCallNanos.get.toDouble / 1e6 / nTxn
    val upsertMoveMs = AcidTable.moveNanos.get.toDouble / 1e6 / nTxn
    val upsertPublishMs = AcidTable.publishNanos.get.toDouble / 1e6 / nTxn

    // 2. floor: a bare 3-row noop write (Spark job scheduling + codegen floor)
    val noopMs = timed(nTxn) {
      batch().write.format("noop").mode("overwrite").save()
    }

    // 3. a 3-row parquet write with partitionBy to a temp dir (the physical
    //    write shape of writeTouched, minus snapshot merge)
    val pqMs = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-pq-")
      batch().repartition(2, org.apache.spark.sql.functions.col("part"))
        .write.partitionBy("part").mode("overwrite").parquet(tmp.resolve("x").toString)
    }

    // 4. snapshot read + precombine-shaped plan executed to noop (read side
    //    of a commit: scan touched files, window dedup)
    val snapMs = timed(nTxn) {
      t.snapshot().write.format("noop").mode("overwrite").save()
    }

    // 5. delete path
    jobCount.set(0); jobNanos.set(0)
    val delMs = timed(20) {
      val k = rnd.nextInt(100)
      t.delete(Seq((s"key-$k", s"p${k % 4}")).toDF("pk", "part"), Some(Seq(s"p${k % 4}")))
    }
    Thread.sleep(500)
    val deleteJobs = jobCount.get().toDouble / 20

    // 6. merge path (the harness Update transaction shape)
    jobCount.set(0); jobNanos.set(0)
    val mergeMs = timed(nTxn) {
      val rows = (1 to 3).map { _ =>
        val k = rnd.nextInt(100)
        (s"key-$k", s"p${k % 4}", s"val-${rnd.nextInt(100000)}")
      }
      val parts = rows.map(_._2).distinct
      t.merge(rows.toDF("pk", "part", "v"), updateCols = Seq("v"), Some(parts))
    }
    Thread.sleep(500)
    val mergeJobs = jobCount.get().toDouble / nTxn
    val mergeJobMs = jobNanos.get().toDouble / 1e6 / nTxn

    // 7. predicate UPDATE (SQL `UPDATE … SET … WHERE …` shape): with the
    //    driver kernel this is discovery + rewrite with zero Spark jobs at
    //    metadata scale; the round-8 gap was ~10× an upsert here
    jobCount.set(0); jobNanos.set(0)
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val updMs = timed(nTxn) {
      val k = rnd.nextInt(100)
      t.update(
        Seq("v" -> concat_ws("-", lit("upd"), col("v"))),
        condition = col("pk") === s"key-$k")
    }
    Thread.sleep(500)
    val updJobs = jobCount.get().toDouble / nTxn
    val updJobMs = jobNanos.get().toDouble / 1e6 / nTxn

    // --- write-path variants: what inside the 3-row partitioned parquet
    //     write costs what ---
    val flatMs = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-flat-")
      batch().repartition(2, org.apache.spark.sql.functions.col("part"))
        .write.mode("overwrite").parquet(tmp.resolve("x").toString)
    }
    val oneTaskMs = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-one-")
      batch().coalesce(1)
        .write.partitionBy("part").mode("overwrite").parquet(tmp.resolve("x").toString)
    }
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    val v2Ms = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-v2-")
      batch().repartition(2, org.apache.spark.sql.functions.col("part"))
        .write.partitionBy("part").mode("overwrite").parquet(tmp.resolve("x").toString)
    }
    val csvMs = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-csv-")
      batch().repartition(2, org.apache.spark.sql.functions.col("part"))
        .write.partitionBy("part").mode("overwrite").csv(tmp.resolve("x").toString)
    }
    // shuffle floor: repartition + noop (no file write, no committer)
    val shufNoopMs = timed(nTxn) {
      batch().repartition(2, org.apache.spark.sql.functions.col("part"))
        .write.format("noop").mode("overwrite").save()
    }
    // file-write floor: parquet with NO repartition, NO partitionBy
    val bareParquetMs = timed(nTxn) {
      val tmp = Files.createTempDirectory("profile-bare-")
      batch().coalesce(1).write.mode("overwrite").parquet(tmp.resolve("x").toString)
    }

    println(f"""{"upsert_ms":$upsertMs%.1f,"upsert_jobs":$upsertJobs%.2f,"upsert_job_ms":$upsertJobMs%.1f,"upsert_write_ms":$upsertWriteMs%.1f,"upsert_move_ms":$upsertMoveMs%.1f,"upsert_publish_ms":$upsertPublishMs%.1f,"merge_ms":$mergeMs%.1f,"merge_jobs":$mergeJobs%.2f,"merge_job_ms":$mergeJobMs%.1f,"update_ms":$updMs%.1f,"update_jobs":$updJobs%.2f,"update_job_ms":$updJobMs%.1f,"delete_jobs":$deleteJobs%.2f,"noop3row_ms":$noopMs%.1f,"parquet3row_ms":$pqMs%.1f,"snapshot_ms":$snapMs%.1f,"delete_ms":$delMs%.1f,"flat_ms":$flatMs%.1f,"onetask_ms":$oneTaskMs%.1f,"committer_v2_ms":$v2Ms%.1f,"csv_part_ms":$csvMs%.1f,"shuffle_noop_ms":$shufNoopMs%.1f,"bare_parquet_ms":$bareParquetMs%.1f}""")
    spark.stop()
  }
}
