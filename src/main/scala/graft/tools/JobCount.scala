package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main (guide §1/§7): per-entry job/stage/task accounting for
  * named bench entries — wall seconds next to Spark job count, stage
  * count, task count and summed task time, so fixed-overhead-dominated
  * entries (many tiny jobs, wall >> task time) separate from
  * compute-dominated ones (task time ≈ wall × cores) without the UI.
  * Not part of the driver contract. Usage:
  * `scripts/run_main.sh graft.tools.JobCount <sfDir> <entry> [entry...]`.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass at least one entry name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[org.apache.spark.sql.graft.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k=v": session-conf overrides for quick A/Bs
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })

    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val taskNanos = new AtomicLong
    // SPARK_GRAFT_JOBTRACE=1: print every job's callsite + wall, to name
    // which operation each of an entry's jobs belongs to
    val trace = sys.env.get("SPARK_GRAFT_JOBTRACE").contains("1")
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) {
          val prop = Option(e.properties)
            .map(_.getProperty("callSite.short", "")).getOrElse("")
          // the SQL-execution property is usually unset; the result
          // stage's name carries the materializing RDD's callsite
          val named = e.stageInfos.map(_.name)
            .filterNot(_.contains("CompletableFuture.java"))
          val cs = if (prop.nonEmpty) prop
            else if (named.nonEmpty) named.mkString(" | ")
            else e.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobT0.put(e.jobId, (System.nanoTime(), cs)); ()
        }
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (trace) Option(jobT0.remove(e.jobId)).foreach { case (t0, cs) =>
          println(f"[jobtrace] job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1fms  $cs")
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskNanos.addAndGet(e.taskInfo.duration * 1000000L)
        ()
      }
    })

    if (trace) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val head = qe.logical.toString.linesIterator.take(2).mkString(" ~ ").take(180)
          println(f"[exectrace] $funcName%-12s ${durationNs / 1e6}%8.1fms  $head")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            error: Exception): Unit = ()
      })

    // same warm protocol as Bench: one untimed run absorbs codegen/JIT
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      graft.queries.TextQueries.clearShingleCache()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[jobcount] warm $name: $e") }
      (1 to 2).foreach { rep =>
        spark.catalog.clearCache()
        graft.queries.TextQueries.clearShingleCache()
        Thread.sleep(300) // let async listener drain before zeroing
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[jobcount] $name rep$rep wall=$wall%.2fs jobs=${jobs.get()} " +
          f"stages=${stages.get()} tasks=${tasks.get()} taskTime=${taskNanos.get() / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
