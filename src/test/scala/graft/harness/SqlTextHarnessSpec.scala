package graft.harness

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The concurrent harness driven through the reference's literal SQL-text
  * path — writers emit MERGE INTO / DELETE FROM and readers emit
  * `SELECT * FROM concurrencytestdb.records` (ReaderThread.java:77-78), all
  * as statement text via AcidSql — same invariants as the API path: no
  * failed verifications, snapshot == serial model.
  */
class SqlTextHarnessSpec extends AnyFunSuite {

  test("40-txn concurrent run through SQL text keeps all invariants") {
    val path = Files.createTempDirectory("sql-harness-").resolve("t").toString
    val r = new TransactionManager(TestSpark.spark, HarnessConfig(
      tablePath = path,
      numberOfWriterThreads = 2,
      numberOfReaderThreads = 1,
      totalNumberOfTransactions = 40,
      useSqlText = true)).run()
    assert(r.failedVerifications == 0, r.toString)
    assert(!r.hasFailedWriters && !r.hasFailedReaders, r.toString)
    assert(r.finalRowCount == r.modelRowCount, r.toString)
    assert(r.committedTransactions == 40)
  }

  test("4 writer threads round-robin over 2 shared sessions; A24 perf lines emitted") {
    // M < N session pools are the reference's distinct concurrency shape
    // (Configuration.java:14-15): threads share a SQL conf and temp-view
    // namespace. Reads AND writes both go through statement text here.
    val path = Files.createTempDirectory("sql-harness-pool-").resolve("t").toString
    val captured = new java.io.ByteArrayOutputStream()
    val orig = System.err
    val r = try {
      System.setErr(new java.io.PrintStream(
        new java.io.OutputStream {
          override def write(b: Int): Unit = { captured.write(b); orig.write(b) }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            captured.write(b, off, len); orig.write(b, off, len)
          }
        }, true))
      new TransactionManager(TestSpark.spark, HarnessConfig(
        tablePath = path,
        numberOfWriterThreads = 4,
        numberOfWriterSessions = 2,
        numberOfReaderThreads = 2,
        numberOfReaderSessions = 1,
        totalNumberOfTransactions = 40,
        useSqlText = true)).run()
    } finally System.setErr(orig)
    assert(r.failedVerifications == 0, r.toString)
    assert(!r.hasFailedWriters && !r.hasFailedReaders, r.toString)
    assert(r.finalRowCount == r.modelRowCount, r.toString)
    assert(r.committedTransactions == 40)
    val err = captured.toString
    assert(err.contains("[perf] writer txn="), "missing writer perf telemetry")
    assert(err.contains("[perf] reader durationMs="), "missing reader perf telemetry")
    assert(err.contains("logWindow=") && err.contains("resultSize="), "incomplete reader telemetry")
  }
}
