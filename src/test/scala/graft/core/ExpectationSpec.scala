package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `ExpectationTest.java:25-117` cases plus
  * producer coverage of the uncertainty window (SURVEY §5.2-1), including
  * the corrected DELETE semantics (§8-B1).
  */
class ExpectationSpec extends AnyFunSuite {

  private val r1 = Record("Record1", "Partition1", "v1")
  private val r1b = Record("Record1", "Partition1", "v1-changed")
  private val r2 = Record("Record2", "Partition2", "v2")

  test("presence satisfied iff exactly that record is present") {
    assert(ExpectRecordPresence(r1).isSatisfied(new ResultSet(Seq(r1, r2))))
    assert(!ExpectRecordPresence(r1).isSatisfied(new ResultSet(Seq(r1b, r2))))
    assert(!ExpectRecordPresence(r1).isSatisfied(new ResultSet(Seq(r2))))
  }

  test("absence satisfied iff no record with that PK is present") {
    assert(ExpectRecordAbsence(r1).isSatisfied(new ResultSet(Seq(r2))))
    assert(!ExpectRecordAbsence(r1).isSatisfied(new ResultSet(Seq(r1))))
    // a different payload under the same PK still violates absence
    assert(!ExpectRecordAbsence(r1).isSatisfied(new ResultSet(Seq(r1b))))
  }

  test("duplicate PK in a snapshot throws InconsistentResultSetException") {
    val rs = new ResultSet(Seq(r1, r1b))
    assertThrows[InconsistentResultSetException] {
      ExpectRecordPresence(r1).isSatisfied(rs)
    }
  }

  test("or combinator") {
    val rs = new ResultSet(Seq(r1))
    assert(ExpectRecordPresence(r1).or(ExpectRecordAbsence(r1)).isSatisfied(rs))
    assert(ExpectRecordAbsence(r1).or(ExpectRecordPresence(r1)).isSatisfied(rs))
    assert(!ExpectRecordAbsence(r1).or(ExpectRecordPresence(r1b)).isSatisfied(rs))
  }

  test("expectation set flags unexpected primary keys") {
    val exp = new ResultSetExpectations
    exp.setRecordExpectation(r1.primaryKeyValue, ExpectRecordPresence(r1))
    assert(exp.isSatisfied(new ResultSet(Seq(r1))))
    assert(!exp.isSatisfied(new ResultSet(Seq(r1, r2))))
    assert(exp.lastFailures.exists(_.contains("Unexpected primary key")))
  }

  private def dm(r: Record) = DataManipulation(r.primaryKeyValue, r.partitionKeyValue, r.dataValue)

  test("certainly-committed insert expects exact presence") {
    val log = new TransactionLog
    val tx = Transaction(ManipulationType.Insert, List(dm(r1)))
    log.logIntent(tx); log.logCommit(tx)
    val exp = new ResultSetExpectationProducer(log).createResultSetExpectations(2, 2)
    assert(exp.isSatisfied(new ResultSet(Seq(r1))))
    assert(!exp.isSatisfied(new ResultSet(Seq.empty)))
  }

  test("uncertain insert tolerates either absence or presence") {
    val log = new TransactionLog
    val tx = Transaction(ManipulationType.Insert, List(dm(r1)))
    log.logIntent(tx); log.logCommit(tx)
    // commit fell after the reader's pre-read prefix (before=1)
    val exp = new ResultSetExpectationProducer(log).createResultSetExpectations(1, 2)
    assert(exp.isSatisfied(new ResultSet(Seq(r1))))
    assert(exp.isSatisfied(new ResultSet(Seq.empty)))
    assert(!exp.isSatisfied(new ResultSet(Seq(r1b))))
  }

  test("uncertain update chains onto the previous expectation") {
    val log = new TransactionLog
    val ins = Transaction(ManipulationType.Insert, List(dm(r1)))
    val upd = Transaction(ManipulationType.Update, List(dm(r1b)))
    log.logIntent(ins); log.logCommit(ins); log.logIntent(upd); log.logCommit(upd)
    // insert certain (within before=2), update uncertain
    val exp = new ResultSetExpectationProducer(log).createResultSetExpectations(2, 4)
    assert(exp.isSatisfied(new ResultSet(Seq(r1))))   // update not applied yet
    assert(exp.isSatisfied(new ResultSet(Seq(r1b))))  // update applied
    assert(!exp.isSatisfied(new ResultSet(Seq.empty)))
  }

  test("committed delete expects ABSENCE (reference bug B1 corrected)") {
    val log = new TransactionLog
    val ins = Transaction(ManipulationType.Insert, List(dm(r1)))
    val del = Transaction(ManipulationType.Delete, List(dm(r1b)))
    log.logIntent(ins); log.logCommit(ins); log.logIntent(del); log.logCommit(del)
    val exp = new ResultSetExpectationProducer(log).createResultSetExpectations(4, 4)
    assert(exp.isSatisfied(new ResultSet(Seq.empty)))
    assert(!exp.isSatisfied(new ResultSet(Seq(r1))))
  }

  test("uncertain delete tolerates previous state or absence") {
    val log = new TransactionLog
    val ins = Transaction(ManipulationType.Insert, List(dm(r1)))
    val del = Transaction(ManipulationType.Delete, List(dm(r1b)))
    log.logIntent(ins); log.logCommit(ins); log.logIntent(del); log.logCommit(del)
    val exp = new ResultSetExpectationProducer(log).createResultSetExpectations(2, 4)
    assert(exp.isSatisfied(new ResultSet(Seq(r1))))   // delete not applied yet
    assert(exp.isSatisfied(new ResultSet(Seq.empty))) // delete applied
    assert(!exp.isSatisfied(new ResultSet(Seq(r2))))
  }
}
