package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graft.AcidBatchScan

/** Runtime (dynamic) file pruning through the catalog scan — round-11
  * verdict #2. A selective filter on a small dimension joined to the ACID
  * fact table on the partition column must prune the fact scan's FILE
  * LIST at execution, not just its rows: `AcidBatchScan` implements
  * `SupportsRuntimeFiltering`, Spark's `PartitionPruning` injects the DPP
  * subquery, and `BatchScanExec` re-plans input partitions after the
  * runtime `In(part, …)` arrives. Also pinned: the equivalent runtime
  * prune through the PK (bucket pruning from a join on pk), and that the
  * V1 fallback still serves DV/rename snapshots correctly.
  */
class AcidDppSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): String = {
    val wh = Files.createTempDirectory("graft-dpp-").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.graft.warehouse", wh)
    wh
  }

  test("a selective dim filter runtime-prunes the ACID fact scan's file list") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp")
    spark.sql("""CREATE TABLE graft.dpp.fact (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    // 8 partitions, each with its own files
    (0 until 256).map(i => (s"k$i", s"p${i % 8}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp_fact_src")
    spark.sql("INSERT INTO graft.dpp.fact SELECT * FROM dpp_fact_src")
    // small dim AS A FILE SOURCE (a LocalRelation dim doesn't qualify for
    // DPP's selective-predicate check); half the regions map to p0..p3
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    (0 until 8).map(i => (s"p$i", s"region${i / 4}"))
      .toDF("part", "region").write.mode("overwrite").parquet(s"$wh/dpp_dim")
    spark.read.parquet(s"$wh/dpp_dim").createOrReplaceTempView("dpp_dim")

    val totalFiles = {
      spark.sql("SELECT count(*) FROM graft.dpp.fact").collect()
      AcidBatchScan.lastPlannedFiles.get()
    }
    assert(totalFiles > 0, "batch scan route must be taken for a clean snapshot")

    AcidBatchScan.runtimeFilterCalls.set(0)
    AcidBatchScan.lastRuntimePrunedTo.set(-1)
    // the filter is on a NON-join dim column: the matching partitions are
    // only discoverable at runtime by evaluating the dim side — the shape
    // static pushdown cannot serve and DPP exists for
    val joined = spark.sql(
      """SELECT f.pk, f.v FROM graft.dpp.fact f
        |JOIN dpp_dim d ON f.part = d.part
        |WHERE d.region = 'region0'""".stripMargin)
    val rows = joined.collect()
    assert(rows.length == 128)
    assert(rows.forall(r => r.getString(0).stripPrefix("k").toInt % 8 < 4))
    assert(AcidBatchScan.runtimeFilterCalls.get() > 0,
      "runtime filter never reached the scan — DPP not injected")
    val pruned = AcidBatchScan.lastRuntimePrunedTo.get()
    assert(pruned >= 0 && pruned < totalFiles,
      s"runtime prune must shrink the file list ($pruned vs $totalFiles total)")
  }

  test("a join on the PK runtime-prunes to the probe keys' buckets") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp2")
    spark.sql("""CREATE TABLE graft.dpp2.fact (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 256).map(i => (s"k$i", s"p${i % 4}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp2_src")
    spark.sql("INSERT INTO graft.dpp2.fact SELECT * FROM dpp2_src")
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    Seq(("k7", 1), ("k9", 1), ("k12", 2)).toDF("pk", "w")
      .write.mode("overwrite").parquet(s"$wh/dpp2_probe")
    spark.read.parquet(s"$wh/dpp2_probe").createOrReplaceTempView("dpp2_probe")

    val totalFiles = {
      spark.sql("SELECT count(*) FROM graft.dpp2.fact").collect()
      AcidBatchScan.lastPlannedFiles.get()
    }
    AcidBatchScan.runtimeFilterCalls.set(0)
    AcidBatchScan.lastRuntimePrunedTo.set(-1)
    val joined = spark.sql(
      """SELECT f.pk, f.v, d.w FROM graft.dpp2.fact f
        |JOIN dpp2_probe d ON f.pk = d.pk WHERE d.w = 1""".stripMargin)
    val rows = joined.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq("k7" -> 7.0, "k9" -> 9.0))
    assert(AcidBatchScan.runtimeFilterCalls.get() > 0,
      "runtime pk filter never reached the scan")
    val pruned = AcidBatchScan.lastRuntimePrunedTo.get()
    assert(pruned >= 0 && pruned < totalFiles,
      s"pk runtime filter must bucket-prune the file list ($pruned vs $totalFiles)")
  }

  test("live DVs fall back to the V1 route and stay correct through the catalog") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp3")
    spark.sql("""CREATE TABLE graft.dpp3.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 16).map(i => (s"k$i", s"p${i % 2}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp3_src")
    spark.sql("INSERT INTO graft.dpp3.t SELECT * FROM dpp3_src")
    // vectored delete leaves a LIVE deletion-vector entry (no rewrite)
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    val t = AcidTable.open(spark, s"$wh/dpp3/t")
    t.deleteVectored(Seq("k3"))
    val before = AcidBatchScan.lastPlannedFiles.get()
    val rows = spark.sql("SELECT pk FROM graft.dpp3.t ORDER BY pk").collect().map(_.getString(0))
    assert(!rows.contains("k3") && rows.length == 15,
      "DV-hidden row must not resurface through the catalog read")
    assert(AcidBatchScan.lastPlannedFiles.get() == before,
      "a DV-carrying snapshot must NOT take the batch route")
  }
}
