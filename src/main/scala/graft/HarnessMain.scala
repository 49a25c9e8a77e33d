package graft

import java.nio.file.Files

import graft.harness.{HarnessConfig, TransactionManager}

/** Standalone entry point for the full concurrent ACID verification run —
  * the rebuild of the reference's `TransactionManagerTest` workload at
  * configurable scale:
  *
  * {{{
  * sbt "runMain graft.HarnessMain [txns] [writers] [readers]"
  * }}}
  *
  * Defaults mirror the reference test override (1000 txns / 2 writers /
  * 2 readers, seed 1234 — `TransactionManagerTest.java:27-30`). Prints one
  * JSON result line; exits non-zero if any verification failed or a thread
  * died (the reference's run could not detect either, SURVEY §8-B2/B7).
  */
object HarnessMain {
  def main(args: Array[String]): Unit = {
    val txns = args.headOption.map(_.toInt).getOrElse(1000)
    val writers = args.lift(1).map(_.toInt).getOrElse(2)
    val readers = args.lift(2).map(_.toInt).getOrElse(2)
    val partitions = args.lift(3).map(_.toInt).getOrElse(4)
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, appName = "graft-harness")
    val path = Files.createTempDirectory("graft-harness-").resolve("t").toString
    val t0 = System.nanoTime()
    val r = new TransactionManager(spark, HarnessConfig(
      tablePath = path,
      numberOfWriterThreads = writers,
      numberOfReaderThreads = readers,
      totalNumberOfTransactions = txns,
      maximumNumberOfPartitions = partitions)).run()
    val sec = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"txns":$txns,"writers":$writers,"readers":$readers,"seconds":$sec%.1f,""" +
      f""""txnPerSec":${txns / sec}%.2f,"failedVerifications":${r.failedVerifications},""" +
      s""""failedWriters":${r.hasFailedWriters},"failedReaders":${r.hasFailedReaders},""" +
      s""""finalRows":${r.finalRowCount},"modelRows":${r.modelRowCount},""" +
      s""""firstFailure":"${r.firstFailure.getOrElse("").replace("\"", "'")}"}""")
    spark.stop()
    val ok = r.failedVerifications == 0 && !r.hasFailedWriters && !r.hasFailedReaders &&
      r.finalRowCount == r.modelRowCount
    if (!ok) sys.exit(1)
  }
}
