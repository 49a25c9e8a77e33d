package graft.core

import java.util.UUID
import scala.collection.mutable.ArrayBuffer

/** Transaction-log oracle model — driver-side Scala, deliberately
  * independent of the table implementation (reference `transactionlog/`
  * package, README.md:12-15). The log is the source of truth the readers
  * verify snapshots against.
  */
sealed trait ManipulationType
object ManipulationType {
  case object Insert extends ManipulationType
  case object Update extends ManipulationType
  case object Delete extends ManipulationType
}

sealed trait EventType
object EventType {
  /** Logged BEFORE the write is attempted (2-phase intent/commit,
    * `transactionlog/EventType.java:3-5`). */
  case object TransactionIntended extends EventType
  case object TransactionCommitted extends EventType
}

final case class DataManipulation(
    primaryKeyValue: String,
    partitionKeyValue: String,
    dataValue: String)

final case class Transaction(
    manipulationType: ManipulationType,
    dataManipulations: List[DataManipulation],
    transactionId: UUID = UUID.randomUUID())

final case class TransactionLogEvent(eventType: EventType, transaction: Transaction)

/** Append-only synchronized event log with prefix reads
  * (`transactionlog/TransactionLog.java:8-37`). Readers take a prefix
  * length before and after their table scan; the gap is the uncertainty
  * window the expectation algebra tolerates.
  */
final class TransactionLog {
  private val events = ArrayBuffer.empty[TransactionLogEvent]

  def add(event: TransactionLogEvent): Unit = synchronized { events += event }

  def logIntent(tx: Transaction): Unit =
    add(TransactionLogEvent(EventType.TransactionIntended, tx))

  def logCommit(tx: Transaction): Unit =
    add(TransactionLogEvent(EventType.TransactionCommitted, tx))

  def firstN(n: Int): List[TransactionLogEvent] = synchronized { events.take(n).toList }

  def eventCount: Int = synchronized { events.size }
}
