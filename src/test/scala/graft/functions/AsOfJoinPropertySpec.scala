package graft.functions

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based check for the native as-of exec: on random tables the
  * distributed merge must equal a driver-side reference model (for every
  * left row: the right row of equal key with the greatest (ts, tie) among
  * those with ts ≤ left ts). Seeded generator per repo convention
  * (AcidTablePropertySpec) — deterministic across runs.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("native as-of join equals the in-memory reference model on random tables") {
    val rnd = new Random(4242)
    (1 to 8).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(40)
      val left = List.fill(50 + rnd.nextInt(300))(
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(500).toLong), rnd.nextLong()))
      val right = List.fill(rnd.nextInt(400))(
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(500).toLong), rnd.nextLong()))

      val expected = left.map { case (k, lt, lid) =>
        val candidates = right.filter { case (rk, rt, _) => rk == k && !rt.after(lt) }
        val best = if (candidates.isEmpty) -1L
          else candidates.maxBy { case (_, rt, rid) => (rt.getTime, rid) }._3
        (lid, best)
      }.sortBy(_._1)

      val lDf = left.toDF("k", "lts", "lid")
      val rDf = right.toDF("rk", "rts", "rid")
      val got = AsOfJoin.join(lDf, rDf,
          lDf("k"), rDf("rk"), lDf("lts"), rDf("rts"), rDf("rid"))
        .select(col("lid"), coalesce(col("rid"), lit(-1L)).as("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

      assert(got == expected, s"trial $trial (nKeys=$nKeys) diverged from model")
    }
  }

  test("tolerance-bounded as-of equals the model with the staleness filter applied") {
    val rnd = new Random(777)
    (1 to 8).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(30)
      // tolerance in seconds over a 0..500 s timeline — tight enough that
      // it regularly nulls matches the unbounded join would keep
      val tolSec = 1L + rnd.nextInt(60)
      val left = List.fill(50 + rnd.nextInt(200))(
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(500).toLong), rnd.nextLong()))
      val right = List.fill(rnd.nextInt(300))(
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(500).toLong), rnd.nextLong()))

      val expected = left.map { case (k, lt, lid) =>
        val candidates = right.filter { case (rk, rt, _) =>
          rk == k && !rt.after(lt) && lt.getTime - rt.getTime <= tolSec * 1000L }
        val best = if (candidates.isEmpty) -1L
          else candidates.maxBy { case (_, rt, rid) => (rt.getTime, rid) }._3
        (lid, best)
      }.sortBy(_._1)

      val lDf = left.toDF("k", "lts", "lid")
      val rDf = right.toDF("rk", "rts", "rid")
      val got = AsOfJoin.join(lDf, rDf,
          lDf("k"), rDf("rk"), lDf("lts"), rDf("rts"), rDf("rid"),
          toleranceMicros = Some(tolSec * 1000000L))
        .select(col("lid"), coalesce(col("rid"), lit(-1L)).as("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

      assert(got == expected,
        s"trial $trial (nKeys=$nKeys, tol=${tolSec}s) diverged from model")
    }
  }
}
