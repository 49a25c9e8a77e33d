package graft.core

import scala.collection.mutable

/** Expectation algebra over snapshot result sets (reference
  * `resultexpectations/` package). A reader takes the log length before and
  * after its scan; transactions committed inside that window are *uncertain*
  * — the snapshot may legitimately reflect either their old or new state —
  * so their expectations are OR-chains of both states.
  */
sealed trait Expectation {
  def isSatisfied(rs: ResultSet): Boolean
  def or(other: Expectation): Expectation = Or(this, other)
}

/** Exactly this record present under its PK
  * (`ExpectRecordPresence.java:16-24`). */
final case class ExpectRecordPresence(record: Record) extends Expectation {
  override def isSatisfied(rs: ResultSet): Boolean =
    rs.recordByPrimaryKey(record.primaryKeyValue).contains(record)
}

/** No record with this PK present (`ExpectRecordAbsence.java:13-21`). */
final case class ExpectRecordAbsence(record: Record) extends Expectation {
  override def isSatisfied(rs: ResultSet): Boolean =
    rs.recordByPrimaryKey(record.primaryKeyValue).isEmpty
}

final case class Or(left: Expectation, right: Expectation) extends Expectation {
  override def isSatisfied(rs: ResultSet): Boolean =
    left.isSatisfied(rs) || right.isSatisfied(rs)
}

/** Per-PK expectation map + unexpected-PK sweep
  * (`ResultSetExpectations.java:20-41`). */
final class ResultSetExpectations {
  private val byPk = mutable.HashMap.empty[String, Expectation]
  private val failures = mutable.ArrayBuffer.empty[String]

  def setRecordExpectation(pk: String, e: Expectation): Unit = byPk(pk) = e
  def getRecordExpectation(pk: String): Option[Expectation] = byPk.get(pk)

  def lastFailures: Seq[String] = failures.toSeq

  def isSatisfied(rs: ResultSet): Boolean = {
    failures.clear()
    var satisfied = true
    byPk.foreach { case (pk, e) =>
      if (!e.isSatisfied(rs)) { failures += s"Expectation not satisfied for $pk: $e"; satisfied = false }
    }
    rs.records.foreach { r =>
      if (!byPk.contains(r.primaryKeyValue)) {
        failures += s"Unexpected primary key in the result set: ${r.primaryKeyValue}"
        satisfied = false
      }
    }
    satisfied
  }
}

/** Builds the expectation set for a read that observed the log at prefix
  * lengths (before, after) — reference
  * `ResultSetExpectationProducer.java:22-97`, with one deliberate fix
  * (SURVEY §8-B1): a DELETE known committed before the read expects the
  * record ABSENT (the reference expected it present, with a fresh random
  * payload that could never match — README.md:36-37 states the intended
  * semantics this port implements).
  */
final class ResultSetExpectationProducer(log: TransactionLog) {

  def createResultSetExpectations(before: Int, after: Int): ResultSetExpectations = {
    val events = log.firstN(after)
    val intended = events.filter(_.eventType == EventType.TransactionIntended)
    val committedBeforeRead: Set[java.util.UUID] = events
      .take(before)
      .collect { case TransactionLogEvent(EventType.TransactionCommitted, tx) => tx.transactionId }
      .toSet

    val expectations = new ResultSetExpectations
    intended.foreach { event =>
      val tx = event.transaction
      val certain = committedBeforeRead.contains(tx.transactionId)
      tx.dataManipulations.foreach { dm =>
        val record = Record(dm.primaryKeyValue, dm.partitionKeyValue, dm.dataValue)
        val prev = expectations.getRecordExpectation(dm.primaryKeyValue)
        val e = tx.manipulationType match {
          case ManipulationType.Insert =>
            val present = ExpectRecordPresence(record)
            if (certain) present
            else prev.getOrElse(ExpectRecordAbsence(record)).or(present)
          case ManipulationType.Update =>
            val present = ExpectRecordPresence(record)
            if (certain) present
            else prev.getOrElse(throw new IllegalStateException(
              s"update of ${dm.primaryKeyValue} without prior expectation")).or(present)
          case ManipulationType.Delete =>
            val absent = ExpectRecordAbsence(record)
            if (certain) absent
            else prev.getOrElse(throw new IllegalStateException(
              s"delete of ${dm.primaryKeyValue} without prior expectation")).or(absent)
        }
        expectations.setRecordExpectation(dm.primaryKeyValue, e)
      }
    }
    expectations
  }
}
