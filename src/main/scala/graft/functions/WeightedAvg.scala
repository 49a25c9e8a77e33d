package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SURVEY §2C C20/C48: typed custom aggregate — quantity-weighted average
  * price, computed EXACTLY by accumulating integer cents (inputs carry 2-dp
  * values), so the result is independent of partial-aggregation order and
  * matches the DuckDB decimal oracle bit-for-bit.
  *
  * Buffer is a pair of Longs → tiny, map-side combinable, safe at 100 TB
  * (max |sumWX| here ≈ rows × 5e10 ≪ 2^63).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {

  /** (weight, value) → buffer (sum(w*x) in 1e-4 units, sum(w) in 1e-2 units) */
  override def zero: (Long, Long) = (0L, 0L)

  private def cents(d: Double): Long = math.round(d * 100.0)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) =
    (b._1 + cents(in._1) * cents(in._2), b._2 + cents(in._1))

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double = {
    if (b._2 == 0L) return Double.NaN
    // exact decimal → double conversions, then one IEEE division: identical
    // to DuckDB's CAST(SUM(dec4) AS DOUBLE) / CAST(SUM(dec2) AS DOUBLE)
    val num = new java.math.BigDecimal(b._1).movePointLeft(4).doubleValue()
    val den = new java.math.BigDecimal(b._2).movePointLeft(2).doubleValue()
    num / den
  }

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form for DataFrame use: weighted_avg(weight, value). */
  def column(weight: Column, value: Column): Column =
    udaf(this).apply(weight, value)
}
