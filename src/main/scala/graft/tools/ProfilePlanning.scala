package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.AcidTable

/** Diagnostic main: split the COMMIT-SHAPED plan's driver-side cost into
  * Catalyst (analysis+optimization+physical planning) vs execution vs the
  * parquet write machinery, to aim the round-8 plan-overhead work. Run:
  * `sbt "runMain graft.tools.ProfilePlanning"`.
  */
object ProfilePlanning {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("pk", StringType, nullable = false),
      StructField("part", StringType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val dir = Files.createTempDirectory("profile-plan-")
    val t = AcidTable.create(spark, dir.resolve("t").toString, schema,
      pkCol = "pk", partitionCol = "part", precombineCol = Some("v"),
      stablePartitions = true)
    // seed some file groups
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val rows = (1 to 3).map { _ =>
        val k = rnd.nextInt(100)
        (s"key-$k", s"p${k % 4}", s"val-${rnd.nextInt(100000)}")
      }
      t.upsert(rows.toDF("pk", "part", "v"), Some(rows.map(_._2).distinct))
    }

    def timed(n: Int)(body: => Any): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(n / 2)
    }

    // the commit plan shape: snapshot scan + InSet carry filter + union of
    // a 3-row local batch + bucket column + coalesce(1)
    def commitShaped() = {
      val keys = Set[Any]("key-1", "key-2", "key-3")
        .map(s => org.apache.spark.unsafe.types.UTF8String.fromString(s.toString): Any)
      val snap = t.snapshot()
      val carry = snap.filter(col("pk").isNull ||
        !org.apache.spark.sql.graft.PlanShim.inSet(col("pk"), keys))
      val batch = Seq(("key-1", "p1", "x"), ("key-2", "p2", "y"), ("key-3", "p3", "z"))
        .toDF("pk", "part", "v")
      carry.unionByName(batch)
        .withColumn("__b", lit(0))
        .coalesce(1)
    }

    // warm everything
    (1 to 10).foreach { _ =>
      commitShaped().write.format("noop").mode("overwrite").save()
      val tmp = Files.createTempDirectory("pp-")
      commitShaped().write
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("part", "__b").mode("overwrite").parquet(tmp.resolve("x").toString)
    }

    val n = 60
    val buildMs = timed(n) { commitShaped() }
    val planMs = timed(n) { commitShaped().queryExecution.executedPlan }
    val noopMs = timed(n) {
      commitShaped().write.format("noop").mode("overwrite").save()
    }
    val pqFlatMs = timed(n) {
      val tmp = Files.createTempDirectory("pp-")
      commitShaped().write.mode("overwrite").parquet(tmp.resolve("x").toString)
    }
    val pqDynMs = timed(n) {
      val tmp = Files.createTempDirectory("pp-")
      commitShaped().write
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .partitionBy("part", "__b").mode("overwrite").parquet(tmp.resolve("x").toString)
    }
    // how much of executedPlan is analysis vs optimization
    val analyzedMs = timed(n) { commitShaped().queryExecution.analyzed }
    val optimizedMs = timed(n) { commitShaped().queryExecution.optimizedPlan }

    println(f"""{"build_ms":$buildMs%.1f,"analyzed_ms":$analyzedMs%.1f,"optimized_ms":$optimizedMs%.1f,"executedplan_ms":$planMs%.1f,"noop_exec_ms":$noopMs%.1f,"parquet_flat_ms":$pqFlatMs%.1f,"parquet_dynpart_ms":$pqDynMs%.1f}""")
    spark.stop()
  }
}
