package graft.harness

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-PROCESS OCC/vacuum proof (round-16 verdict #1), CI-sized: two
  * real writer JVMs (forked with this test JVM's classpath) run the
  * reference workload over disjoint key subspaces against ONE shared
  * table directory while this process vacuums it concurrently — so the
  * create-exclusive publish, the filesystem version probe, and the GC
  * quarantine-recheck heal are exercised across address spaces, where no
  * in-process lock or cache can mask a protocol hole.
  *
  * The full-volume run (2 × 500 txns — the reference's 1000) is
  * `sbt "runMain graft.harness.CrossProcess"`; this spec keeps the same
  * shape at 2 × 40.
  */
class CrossProcessSpec extends AnyFunSuite {

  test("two writer JVMs + concurrent vacuum: zero lost updates, clean fsck") {
    val dir = Files.createTempDirectory("xproc-spec-").resolve("records").toString
    val summary = CrossProcess.orchestrate(
      TestSpark.spark, dir,
      txnsPerWorker = 40,
      workers = 2,
      writersPerWorker = 2,
      readersPerWorker = 1,
      vacuumPeriodMs = 750,
      // retention contract: grace must exceed the longest in-flight
      // operation. Loaded CI ambience has shown 5-6 s writer stalls and
      // reads that outlive them — 20 s keeps the spec's slack honest
      // (the full-volume run exercises tighter windows on an idle box)
      vacuumGraceMs = 20000,
      workerTimeoutMinutes = 15)
    info(s"committed=${summary.committed} vacuumRuns=${summary.vacuumRuns} " +
      s"vacuumRemoved=${summary.vacuumRemoved} finalRows=${summary.finalRows}")
    assert(summary.workerFailures.isEmpty, s"worker failures: $summary")
    assert(summary.failedVerifications == 0,
      s"snapshot verification failures: $summary")
    assert(summary.committed == 80, s"not all txns committed: $summary")
    assert(summary.lostUpdates.isEmpty,
      s"LOST UPDATES (model rows missing from table): ${summary.lostUpdates}")
    assert(summary.extraRows.isEmpty,
      s"unexplained table rows (resurrection/duplicate): ${summary.extraRows}")
    assert(summary.fsckFindings.isEmpty, s"fsck not clean: ${summary.fsckFindings}")
    assert(summary.vacuumErrors.isEmpty, s"vacuum threw: ${summary.vacuumErrors}")
    // the race window was real: the GC loop ran against live foreign-JVM
    // writers (file removal depends on timing and is logged, not asserted)
    assert(summary.vacuumRuns >= 3, s"vacuum loop barely ran: $summary")
  }
}
