package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed custom aggregate (UDAF coverage — SURVEY §2.C "custom aggregates
  * via Aggregator[IN,BUF,OUT]"): geometric mean as exp(mean(ln x)).
  *
  * The buffer is (Σ ln x, n) — associative and commutative, so Spark runs
  * it with map-side partial aggregation and merges buffers across
  * partitions like any built-in agg. Inputs ≤ 0 are ignored (the domain of
  * ln), mirroring SQL aggregate null-skipping.
  *
  * Built-ins can express this exact value (`exp(avg(ln(x)))` — the oracle
  * form); the Aggregator exists to pin the custom-UDAF machinery with a
  * result we can still verify externally.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0.0) (b._1 + math.log(x), b._2 + 1L) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
