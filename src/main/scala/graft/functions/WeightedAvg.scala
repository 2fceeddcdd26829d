package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo (SURVEY §2.6 "UDF/UDAF" gap): quantity-weighted
  * average as an `Aggregator[IN, BUF, OUT]`.
  *
  * Determinism contract matches [[ChFunctions.dsum]]: each term is the
  * double product cast to DECIMAL(25,6) with HALF_UP (the same rounding
  * Spark's `cast(double as decimal)` applies, and empirically DuckDB's),
  * accumulated exactly in BigDecimal — so the merge order across
  * partitions cannot change the result — and the final ratio is one
  * double÷double division.
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def dec(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  /** value-weighted accumulation: (Σ vᵢ·wᵢ, Σ wᵢ) */
  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double))
      : (JBigDecimal, JBigDecimal) = {
    val (v, w) = in
    (b._1.add(dec(v * w)), b._2.add(dec(w)))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal))
      : (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) 0.0 else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
