package graft

import org.scalatest.BeforeAndAfterAll
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
  * new bucketed-layout dirs. Dirs are read from ExtraQueries' own registry
  * (not a tmpdir scan — a concurrent bench/verify process creating its own
  * `graft-bucketed-*` dirs must not flake this test). Eager builders (ACID
  * lifecycle queries) do their DML against temp-dir AcidTables, not the
  * catalog, so they pass on their own semantics. afterAll drops the
  * bucketed tables and signature stores this suite's warm pass created.
  */
class BenchHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private def persistentTables = {
    val s = TestSpark.spark
    s.catalog.listTables().collect().filterNot(_.isTemporary).map(_.name).toSet
  }

  override def afterAll(): Unit = {
    // this suite's warm pass is the only bucketed/signature infrastructure
    // builder in the test JVM — drop the temp dirs it created
    graft.queries.ExtraQueries.cleanupBucketedTables()
    graft.queries.TextQueries.cleanupSignatureStores()
  }

  test("repeated builder invocations create no catalog tables or bucketed dirs") {
    val s = TestSpark.spark
    val builders = SparkEntry.queries.toSeq.sortBy(_._1)
    builders.foreach { case (_, fn) => fn(s, sf) } // warm: memoized infra builds here
    val tables0 = persistentTables
    val dirs0 = graft.queries.ExtraQueries.registeredBucketedDirs
    builders.foreach { case (name, fn) =>
      fn(s, sf)
      assert(persistentTables == tables0,
        s"builder $name created/dropped a persistent catalog table on re-invocation")
      assert(graft.queries.ExtraQueries.registeredBucketedDirs == dirs0,
        s"builder $name created a new bucketed-layout temp dir on re-invocation")
    }
  }
}
