package graft.harness

import java.util.Random

import scala.collection.mutable.ArrayBuffer

import graft.core._

/** Harness configuration — defaults are value-for-value the reference's
  * (`writer/Configuration.java:12-22`), including the 1234 seed that is the
  * reference's de-facto golden corpus (SURVEY §5.1).
  */
final case class HarnessConfig(
    tablePath: String,
    numberOfWriterThreads: Int = 4,
    numberOfReaderThreads: Int = 2,
    totalNumberOfTransactions: Int = 1000,
    maximumNumberOfRecords: Int = 100,
    maximumNumberOfPartitions: Int = 4,
    recordsPerTransaction: Int = 3,
    preferenceToInsertOverOtherManipulations: Float = 0.25f,
    preferenceToUpdateOverDelete: Float = 0.75f,
    randomSeed: Long = 1234L,
    // drive UPDATE/DELETE (and reads) through the reference's literal SQL
    // text (MERGE INTO / DELETE FROM / SELECT via AcidSql) instead of the
    // DataFrame API — the reference's writer path
    // (TransactionWriter.java:153-175) and reader path
    // (ReaderThread.java:77-78)
    useSqlText: Boolean = false,
    // session pools DECOUPLED from thread counts: the reference
    // round-robins N threads over M cloned sessions
    // (writer/Configuration.java:14-15, TransactionManager.java:95-109) —
    // M < N is a distinct concurrency shape (shared SQL conf and temp-view
    // namespace). 0 keeps the thread-per-session default.
    numberOfWriterSessions: Int = 0,
    numberOfReaderSessions: Int = 0,
    // cross-process key-subspace partitioning (round 16, graft.harness
    // .CrossProcess): worker P of K draws only `Record{n}` with
    // n % keyStride == keyOffset, so each JVM's in-memory oracle fully
    // covers ITS keys while every partition (hashCode % 4 spreads each
    // subspace over all of them) still sees contending commits from the
    // other process — OCC cell conflicts without shared-log coordination.
    // Defaults (1, 0) keep the single-process pool byte-identical.
    keyStride: Int = 1,
    keyOffset: Int = 0,
    // open the table an orchestrator already created instead of
    // (re)creating it — required when several worker JVMs share one dir
    openExistingTable: Boolean = false)

/** Seeded random workload generator — a draw-order-faithful port of
  * `writer/TransactionGenerator.java:14-133`: one shared `java.util.Random`;
  * decision floats drawn before per-record polls; each record drawn as
  * (pool index `nextInt`, payload `nextLong`) interleaved (the reference's
  * lazy IntStream pipeline); identifier pools behave like `LinkedList`
  * random-index removal. `String.hashCode` is identical in Scala, so
  * partition assignment (`hashCode % maxPartitions`, :76) ports exactly.
  */
final class TransactionGenerator(config: HarnessConfig) {

  private val rnd = new Random(config.randomSeed)
  private val existing = ArrayBuffer.empty[String]
  private val nonExisting = ArrayBuffer.from(
    (0 until config.maximumNumberOfRecords)
      .filter(n => n % config.keyStride == config.keyOffset)
      .map(n => s"Record$n"))

  def getNextTransaction(): Transaction = synchronized {
    val enoughForUpdateOrDelete = existing.size >= config.recordsPerTransaction
    val enoughForInsert = nonExisting.size >= config.recordsPerTransaction
    val manipulationType =
      if (enoughForInsert && (!enoughForUpdateOrDelete || randomInsertDecision()))
        ManipulationType.Insert
      else if (enoughForUpdateOrDelete)
        (if (randomUpdateDecision()) ManipulationType.Update else ManipulationType.Delete)
      else
        throw new IllegalStateException(
          "Not enough record identifiers available to create the next transaction.")
    createTransaction(manipulationType)
  }

  /** Post-commit pool transfer (`TransactionGenerator.java:49-57`). */
  def transactionCommitted(tx: Transaction): Unit = synchronized {
    tx.manipulationType match {
      case ManipulationType.Delete =>
        tx.dataManipulations.foreach(dm => nonExisting += dm.primaryKeyValue)
      case _ =>
        tx.dataManipulations.foreach(dm => existing += dm.primaryKeyValue)
    }
  }

  private def randomInsertDecision(): Boolean =
    rnd.nextFloat() < config.preferenceToInsertOverOtherManipulations

  private def randomUpdateDecision(): Boolean =
    rnd.nextFloat() < config.preferenceToUpdateOverDelete

  private def createTransaction(t: ManipulationType): Transaction = {
    val manipulations = List.tabulate(config.recordsPerTransaction) { _ =>
      val id = poll(t)
      createDataManipulation(id)
    }
    Transaction(t, manipulations)
  }

  private def createDataManipulation(id: String): DataManipulation = {
    val partitionNumber = id.hashCode % config.maximumNumberOfPartitions
    val dataValue = "Some random value: " + rnd.nextLong()
    DataManipulation(id, "Partition" + partitionNumber, dataValue)
  }

  private def poll(t: ManipulationType): String = {
    val pool = if (t == ManipulationType.Insert) nonExisting else existing
    // reference returns null on empty pool (`TransactionGenerator.java:117-119`);
    // unreachable given the availability checks above
    val idx = rnd.nextInt(pool.size)
    pool.remove(idx)
  }
}
