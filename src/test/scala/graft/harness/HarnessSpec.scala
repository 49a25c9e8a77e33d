package graft.harness

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SURVEY §7 M4: the end-to-end concurrent ACID verification run — the
  * reference's `TransactionManagerTest.java:38-50` with working failure
  * flags (§8-B7) and working readers (§8-B2). The reference's own run lost
  * writes (3-9 surviving rows of ~25 expected, README.md:69-75); this run
  * must converge exactly to the serial model.
  */
class HarnessSpec extends AnyFunSuite {

  test("concurrent writers+readers: zero failed verifications, snapshot == model") {
    val path = Files.createTempDirectory("harness-spec-").resolve("t").toString
    val config = HarnessConfig(
      tablePath = path,
      numberOfWriterThreads = 2,
      numberOfReaderThreads = 2,
      totalNumberOfTransactions = 24,
      maximumNumberOfRecords = 30,
      recordsPerTransaction = 3,
      randomSeed = 1234L)
    val result = new TransactionManager(TestSpark.spark, config).run()
    assert(result.failedVerifications == 0, s"verification failures: $result")
    assert(!result.hasFailedWriters, s"writer died: $result")
    assert(!result.hasFailedReaders, s"reader died: $result")
    assert(result.committedTransactions == 24, s"not all txns committed: $result")
    assert(result.finalRowCount == result.modelRowCount,
      s"snapshot diverged from serial model: $result")
  }

  test("writer retry is typed: transient failures retry, logic errors fail fast") {
    // transient (injected commit conflict): retried until success
    var conflictsLeft = 2
    var calls = 0
    TransactionManager.retryTransient(maxRetries = 3, onRetry = _ => ()) {
      calls += 1
      if (conflictsLeft > 0) {
        conflictsLeft -= 1
        throw new graft.lake.CommitConflictException("injected")
      }
    }
    assert(calls == 3, s"expected 2 retries then success, saw $calls calls")

    // non-transient (a logic error): must fail on attempt 1, no retries —
    // the reference A10 intent (TransactionWriter.java:22-28,189-195)
    var attempts = 0
    val e = intercept[IllegalStateException] {
      TransactionManager.retryTransient(maxRetries = 3, onRetry = _ => ()) {
        attempts += 1
        throw new IllegalStateException("logic bug")
      }
    }
    assert(e.getMessage == "logic bug")
    assert(attempts == 1, s"logic error was retried: $attempts attempts")

    // the retry budget is finite even for transients
    var transientAttempts = 0
    intercept[graft.lake.CommitConflictException] {
      TransactionManager.retryTransient(maxRetries = 3, onRetry = _ => ()) {
        transientAttempts += 1
        throw new graft.lake.CommitConflictException("always conflicts")
      }
    }
    assert(transientAttempts == 4)
  }

  test("isTransient inspects the cause chain of a SparkException") {
    import org.apache.spark.SparkException
    // execution-level transience (fetch/stage failure shapes): no
    // deterministic root cause in the chain → transient
    assert(TransactionManager.isTransient(
      new SparkException("task failed", new java.io.IOException("connection reset"))))
    assert(TransactionManager.isTransient(new SparkException("stage cancelled")))
    // a deterministic executor-side logic error surfaces wrapped in
    // SparkException too — re-applying it 3 times just repeats the
    // failure, so it must be classified non-transient
    assert(!TransactionManager.isTransient(
      new SparkException("task failed", new IllegalArgumentException("bad expression"))))
    assert(!TransactionManager.isTransient(
      new SparkException("task failed",
        new RuntimeException("wrapper", new IllegalStateException("data bug")))))
    assert(!TransactionManager.isTransient(
      new SparkException("task failed", new ClassCastException("bad cast"))))
    // plain (non-Spark) logic errors stay non-transient, conflicts transient
    assert(!TransactionManager.isTransient(new IllegalArgumentException("x")))
    assert(TransactionManager.isTransient(new graft.lake.CommitConflictException("c")))
  }
}
