package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry point for local iteration: times one named
  * query end-to-end (noop sink) with per-stage wall breakdown left to the
  * caller's prints. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to sys.env.getOrElse("PROFILE_REPS", "2").toInt).foreach { rep =>
      val t0 = System.nanoTime()
      if (name == "harness") {
        val path = java.nio.file.Files.createTempDirectory("prof-acid-").resolve("t").toString
        val r = new graft.harness.TransactionManager(spark, graft.harness.HarnessConfig(
          tablePath = path, numberOfWriterThreads = 2, numberOfReaderThreads = 2,
          totalNumberOfTransactions = 60, maximumNumberOfRecords = 100)).run()
        require(r.failedVerifications == 0 && !r.hasFailedWriters && !r.hasFailedReaders, r.toString)
      } else {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[profile] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
