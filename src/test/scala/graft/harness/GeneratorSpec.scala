package graft.harness

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class GeneratorSpec extends AnyFunSuite {

  private def config = HarnessConfig(tablePath = "/tmp/unused",
    totalNumberOfTransactions = 50, randomSeed = 1234L)

  test("generator is deterministic under a fixed seed") {
    val g1 = new TransactionGenerator(config)
    val g2 = new TransactionGenerator(config)
    (1 to 30).foreach { _ =>
      val t1 = g1.getNextTransaction(); val t2 = g2.getNextTransaction()
      assert(t1.manipulationType == t2.manipulationType)
      assert(t1.dataManipulations == t2.dataManipulations)
      g1.transactionCommitted(t1); g2.transactionCommitted(t2)
    }
  }

  test("first transactions must be inserts (empty table)") {
    val g = new TransactionGenerator(config)
    val t = g.getNextTransaction()
    assert(t.manipulationType == ManipulationType.Insert)
    assert(t.dataManipulations.size == 3)
  }

  test("partition assignment is hashCode % maxPartitions (reference :76)") {
    val g = new TransactionGenerator(config)
    val t = g.getNextTransaction()
    t.dataManipulations.foreach { dm =>
      assert(dm.partitionKeyValue ==
        "Partition" + (dm.primaryKeyValue.hashCode % 4))
    }
  }

  test("identifiers are polled exclusively — no overlap between in-flight txns") {
    val g = new TransactionGenerator(config)
    val t1 = g.getNextTransaction()
    val t2 = g.getNextTransaction() // t1 not yet committed
    val k1 = t1.dataManipulations.map(_.primaryKeyValue).toSet
    val k2 = t2.dataManipulations.map(_.primaryKeyValue).toSet
    assert(k1.intersect(k2).isEmpty)
  }

  test("update/delete only touch previously inserted identifiers") {
    val g = new TransactionGenerator(config)
    var live = Set.empty[String]
    (1 to 40).foreach { _ =>
      val t = g.getNextTransaction()
      val keys = t.dataManipulations.map(_.primaryKeyValue).toSet
      t.manipulationType match {
        case ManipulationType.Insert => assert(keys.intersect(live).isEmpty)
        case _ => assert(keys.subsetOf(live))
      }
      g.transactionCommitted(t)
      t.manipulationType match {
        case ManipulationType.Delete => live = live -- keys
        case _ => live = live ++ keys
      }
    }
  }
}
