package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.harness.{HarnessConfig, TransactionManager}

/** Driver-run benchmark: every declared query end-to-end at the given SF,
  * plus the concurrent ACID harness. Results go through the `noop` sink so
  * the FULL plan executes (a bare `count()` lets Spark skip projections and
  * under-reports query cost). One JSON line on stdout per the driver
  * contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Optional comma-separated name-prefix filter for local iteration; the
    // driver leaves it unset → full run including the ACID harness.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    def selected(name: String): Boolean = only.forall(_.exists(name.startsWith))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).filter(t => selected(t._1)).foreach { case (name, fn) =>
      var failed = false
      val sec = time {
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); failed = true
        }
      }
      results(name) = if (failed) -1.0 else sec
    }

    // ACID harness throughput: 60 txns, 2 writers / 2 verifying readers
    // (BASELINE.md workload shape at reduced txn budget)
    if (selected("acid_harness_60txn")) results("acid_harness_60txn") = time {
      val path = Files.createTempDirectory("bench-acid-").resolve("t").toString
      val r = new TransactionManager(spark, HarnessConfig(
        tablePath = path, numberOfWriterThreads = 2, numberOfReaderThreads = 2,
        totalNumberOfTransactions = 60, maximumNumberOfRecords = 100)).run()
      require(r.failedVerifications == 0 && !r.hasFailedWriters && !r.hasFailedReaders,
        s"harness failed during bench: $r")
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    spark.stop()
    // Last line of stdout by contract: the driver parses this JSON line.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
