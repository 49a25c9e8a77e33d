package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{AcidTable, MatView, MvAgg}

/** Diagnostic-only: phase split of one matview refresh over a replicated
  * orders source — where does the wall time go as the SOURCE grows while
  * the DELTA stays fixed? Prints per-phase seconds for: the source delta
  * upsert (context, not part of refresh), the CDC diff materialization,
  * the fold evaluation, and the state commit. Usage:
  * `runMain graft.tools.ProfileMvRefresh [sfDir] [replicas]`.
  */
object ProfileMvRefresh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // records read from storage during each timed section (task metrics,
    // async listener — a short settle sleep keeps the attribution honest)
    val recordsIn = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          recordsIn.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    })
    def time[A](label: String)(body: => A): A = {
      Thread.sleep(300)
      val in0 = recordsIn.get()
      val t0 = System.nanoTime(); val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[mvprof] $label%-28s $sec%.3f s   rows_read=${recordsIn.get() - in0}")
      r
    }
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("part", StringType),
      StructField("grp", StringType),
      StructField("price", DecimalType(18, 2)), StructField("ck", LongType)))
    val t = AcidTable.create(spark,
      Files.createTempDirectory("mvprof-").resolve("t").toString,
      schema, "pk", "part", stablePartitions = true)
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(
        (col("o_orderkey") * replicas + col("rep")).cast("long").as("pk"),
        concat_ws("", lit("p"), (col("o_orderkey") % 16).cast("string")).as("part"),
        col("o_orderpriority").as("grp"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_custkey").cast("long").as("ck"))
    time("initial upsert")(t.upsert(base))
    // the bulk load coarsens to partition-scope files; compaction folds
    // them back into per-bucket file groups so later small upserts (and
    // the CDC diff reading their cells) stay cell-scoped
    time("compact re-bucket")(t.compact(0))
    val mv = time("matview create")(MatView.create(spark, t,
      Files.createTempDirectory("mvprof-v-").resolve("v").toString,
      Seq("grp"), Seq(MvAgg("cnt", "count", "*"), MvAgg("rev", "sum", "price"),
        MvAgg("avgck", "avg", "ck"))))
    (0 until 3).foreach { i =>
      val fromV = t.latestVersion()
      time(s"delta upsert $i")(
        t.upsert(base.filter(col("pk") % (18701L * replicas) === i)
          .withColumn("price", (col("price") * lit(2)).cast("decimal(18,2)"))))
      val srcV = t.latestVersion()
      val delta = time(s"diff materialize $i") {
        val d = t.changesBetween(fromV, srcV)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[mvprof]   diff rows: ${d.count()}")
        d
      }
      delta.unpersist()
      val hist = t.history().orderBy(col("version").desc).limit(2).collect()
      hist.foreach(r => println(s"[mvprof]   v${r.getLong(0)} op=${r.getString(1)} " +
        s"files=${r.getLong(3)} touched=${r.getLong(4)}"))
      time(s"full snapshot count $i")(println(s"[mvprof]   rows: ${t.snapshot().count()}"))
      time(s"refresh $i")(mv.refresh())
      time(s"stock recompute $i")(
        t.snapshot().groupBy(col("grp"))
          .agg(count(lit(1)).as("cnt"), sum(col("price")).as("rev"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
