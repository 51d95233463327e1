package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted arithmetic mean as a typed [[Aggregator]] — the repo's demo of
  * Spark's custom-aggregate extension point (the reference's equivalent
  * would be a new aggregate variant in `ballista.proto:121-132` plus a
  * planner case in `planner.rs:149-171`). Input is a (value, weight) pair;
  * the buffer is (Σ value·weight, Σ weight). Both `reduce` and `merge` are
  * associative and commutative, so Spark executes it Partial→Final exactly
  * like a built-in aggregate — partial buffers combine map-side before the
  * single key shuffle, and nothing funnels through one reducer.
  *
  * Prefer a native expression when one exists (for weighted mean the
  * closed form `sum(v*w)/sum(w)` is codegen'd); this class is the
  * documented pattern for when one doesn't.
  */
object WeightedMeanAgg
    extends Aggregator[(Double, Double), (Double, Double), Double] {
  def zero: (Double, Double) = (0.0, 0.0)
  def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
