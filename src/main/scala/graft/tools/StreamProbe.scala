package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run one streaming entry and print every micro-batch's
  * full StreamingQueryProgress JSON (durationMs split, state operator
  * commit/removal times, rows/s) so per-batch fixed cost can be named.
  * Usage: `scripts/run_main.sh graft.tools.StreamProbe <sfDir> <entry>`.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.drop(1).headOption.getOrElse("q_stream_stream_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[org.apache.spark.sql.graft.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[progress] ${e.progress.json}")
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    graft.streaming.StreamingQueries.warm(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
