package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen FloatDotProduct is bit-identical to the HOF formulation") {
    val df = Seq.tabulate(200)(i =>
      (i.toLong, Array.tabulate(64)(k => ((i * 31 + k * 7) % 97 - 48) / 49.0f)))
      .toDF("id", "v")
    val cmp = df.select(
      VectorOps.dot(col("v"), col("v")).as("fast"),
      VectorOps.dotHof(col("v"), col("v")).as("hof"))
    // exact bit equality, not approximate: same IEEE op sequence
    assert(cmp.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("dot handles empty and mismatched-length arrays") {
    val df = Seq(
      (Array.empty[Float], Array.empty[Float]),
      (Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b")).as("d")).as[Double].collect()
    assert(out.toSeq == Seq(0.0, 3.0))
  }
}
