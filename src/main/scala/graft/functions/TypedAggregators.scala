package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface (SURVEY.md §2.10 U1): custom aggregates as
  * merge-able (partial-aggregation-friendly) typed folds. An Aggregator
  * shuffles one constant-size buffer per group per partition — the same
  * scale shape as a built-in declarative aggregate, at the cost of not
  * being codegen-fused; prefer built-ins when one exists. */
object TypedAggregators {

  /** Geometric mean over positive values: exp(mean(ln x)), accumulated as
    * (Σ ln x, n) so partials merge exactly. Non-positive inputs are
    * skipped, mirroring how SQL AVG skips NULLs. */
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

  /** GeoMean as a Column function. */
  val geoMean: Column => Column = udaf(GeoMean).apply(_)
}
