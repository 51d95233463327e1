package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]` — the SURVEY.md §7.2
  * custom-aggregation path; the reference has no UDAF surface at all, its
  * `Expr::AggregateUDF` hits `unimplemented!()` at the wire,
  * rust/core/src/serde/logical_plan/to_proto.rs:1013-1014).
  *
  * Keeps the k largest doubles per group in a k-bounded ascending buffer:
  * map-side partials are at most k values, so the shuffle carries
  * k·partitions values instead of the whole group — the scalable form of
  * "top prices per segment" (a full sort-per-group is Θ(n log n) and
  * shuffles everything). finish() returns the values descending.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {

  def zero: Array[Double] = Array.emptyDoubleArray

  def reduce(b: Array[Double], x: Double): Array[Double] = insert(b, x)

  def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  def finish(b: Array[Double]): Array[Double] = b.reverse

  // buffer invariant: ascending, length ≤ k (min at index 0). NaN is
  // dropped on entry: `x <= b(0)` is false for NaN, so an un-guarded NaN
  // would always enter a full buffer and (Arrays.sort ordering NaN
  // greatest) permanently squat on top-1 — divergent from SQL row_number
  // ordering, which this aggregator must match.
  private def insert(b: Array[Double], x: Double): Array[Double] =
    if (x.isNaN) b
    else if (b.length < k) (b :+ x).sorted
    else if (x <= b(0)) b
    else {
      val nb = b.clone(); nb(0) = x; java.util.Arrays.sort(nb); nb
    }

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
