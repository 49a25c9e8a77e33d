package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement-trust gate (round-5 verdict #1/#6): a query BUILDER
  * runs inside every timed bench rep, so builders must not create catalog
  * tables per invocation — round 5's `q_join_bucketed` wrote two bucketed
  * tables per rep and the catalog/FS churn inflated NEIGHBOR join entries
  * 3–12× versus isolated runs. Infrastructure a query needs (bucketed
  * layouts, signature stores) must be memoized so only the FIRST,
  * untimed-warm invocation pays it.
  *
  * The gate: invoke every declared builder once (warm — memoized
  * infrastructure may build here), snapshot the persistent-table catalog,
  * invoke every builder AGAIN, and require the catalog unchanged and no
  * new `graft-bucketed-*` temp dirs. Eager builders (ACID lifecycle
  * queries) do their DML against temp-dir AcidTables, not the catalog, so
  * they pass on their own semantics.
  */
class BenchHygieneSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def persistentTables = {
    val s = TestSpark.spark
    s.catalog.listTables().collect().filterNot(_.isTemporary).map(_.name).toSet
  }

  private def bucketedTmpDirs = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("graft-bucketed-")).toSet
  }

  test("repeated builder invocations create no catalog tables or bucketed dirs") {
    val s = TestSpark.spark
    val builders = SparkEntry.queries.toSeq.sortBy(_._1)
    builders.foreach { case (_, fn) => fn(s, sf) } // warm: memoized infra builds here
    val tables0 = persistentTables
    val dirs0 = bucketedTmpDirs
    builders.foreach { case (name, fn) =>
      fn(s, sf)
      assert(persistentTables == tables0,
        s"builder $name created/dropped a persistent catalog table on re-invocation")
      assert(bucketedTmpDirs == dirs0,
        s"builder $name created a new graft-bucketed-* temp dir on re-invocation")
    }
  }
}
