package graft.harness

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The concurrent harness driven through the reference's literal SQL-text
  * writer path (MERGE INTO / DELETE FROM via AcidSql) — same invariants as
  * the API path: no failed verifications, snapshot == serial model.
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
}
