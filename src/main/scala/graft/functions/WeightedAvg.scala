package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` showcase (SURVEY §2.4):
  * discount-weighted average price, exact-decimal partial aggregation.
  *
  * The buffer is a pair of exact decimals, so merge order across
  * partitions/executors cannot perturb the result (same discipline as
  * `graft.operators.dec`). Presentation: one IEEE double division,
  * rounded HALF_UP to scale 6 — mirroring the oracle SQL
  * CAST(CAST(sum(p*w) AS DOUBLE)/CAST(sum(w) AS DOUBLE) AS DECIMAL(18,6)).
  */
object WeightedAvg
    extends Aggregator[(JBigDecimal, JBigDecimal), (JBigDecimal, JBigDecimal), JBigDecimal] {

  private val ZERO = JBigDecimal.ZERO

  override def zero: (JBigDecimal, JBigDecimal) = (ZERO, ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) = {
    val (p, w) = in
    if (p == null || w == null) b else (b._1.add(p.multiply(w)), b._2.add(w))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): JBigDecimal =
    if (b._2.signum == 0) null
    else JBigDecimal.valueOf(b._1.doubleValue() / b._2.doubleValue())
      .setScale(6, RoundingMode.HALF_UP)

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
}
