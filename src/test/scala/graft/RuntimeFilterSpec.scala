package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two runtime scan-reduction mechanisms a 100 TB deployment leans on,
  * pinned as plan gates so a conf or plan-shape regression fails by name:
  *
  *  - DYNAMIC PARTITION PRUNING: a selective dimension filter must reach a
  *    partitioned fact scan as a runtime partition filter (the fact side
  *    reads only the partitions the dim side survives — without DPP a
  *    partitioned 100 TB fact table is scanned in full despite the join).
  *  - RUNTIME BLOOM FILTER: on a non-broadcast (shuffle) join, the
  *    selective side must inject a bloom-filter predicate into the big
  *    side's scan stage (row-group/page skipping at the source at scale).
  *    Thresholds here are lowered to make sf-local data eligible — the
  *    gate pins that the MECHANISM engages, not production sizing.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dynamic partition pruning reaches the partitioned fact scan") {
    val root = Files.createTempDirectory("dpp-")
    val out = root.resolve("orders").toString
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    // the dim must be file-backed with its OWN selective filter — that
    // filter is what DPP turns into a runtime partition filter on the fact
    val dimPath = root.resolve("dim").toString
    locally {
      import spark.implicits._
      Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
        .toDF("status", "label").write.parquet(dimPath)
    }
    val dim = spark.read.parquet(dimPath).filter(col("label") === "finished")
    val fact = spark.read.parquet(out)
    val joined = fact.join(dim, fact("o_orderstatus") === dim("status"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the partitioned fact scan:\n$plan")
    // the pruned read must return exactly the F partition's rows
    val n = joined.collect().map(_.getLong(1)).sum
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(n === expect)
  }

  test("runtime bloom filter injects into the big side of a shuffle join") {
    val s = org.apache.spark.sql.graft.PlanShim.cloneSession(spark)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val sel = s.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"))
    val joined = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("bloomfilter"),
      s"no runtime bloom filter injected on the fact side:\n$plan")
    // and it must not change results vs the plain join
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = s.read.parquet(s"$sf/lineitem.parquet")
      .join(s.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 300000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }
}
