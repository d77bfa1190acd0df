package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's `Reduce(key, values) -> value` plugin surface
  * (/root/reference/mrapps/wc.go:37-40, loaded via
  * /root/reference/main/mrworker.go:46) re-expressed as a Spark
  * `Aggregator` — the UDAF form. Unlike the reference (which materializes
  * every value of a key in one slice before reducing,
  * /root/reference/mr/worker.go:139-155), an Aggregator folds
  * incrementally with map-side partial aggregation: the shuffle carries
  * one buffer per key per partition instead of every raw value.
  *
  * Use when the reduction is associative+commutative (count, sum, max...).
  * For order-sensitive or whole-group logic, `MapReduce.mapReduce` keeps
  * the exact reference semantics.
  */
object ReduceAggregator {

  /** Build an Aggregator from a fold. */
  def apply[IN, B: Encoder, OUT: Encoder](z: B)(
      fold: (B, IN) => B, combine: (B, B) => B, present: B => OUT): Aggregator[IN, B, OUT] =
    new Aggregator[IN, B, OUT] {
      override def zero: B = z
      override def reduce(b: B, a: IN): B = fold(b, a)
      override def merge(b1: B, b2: B): B = combine(b1, b2)
      override def finish(b: B): OUT = present(b)
      override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      override def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }

  /** The word-count reducer (`len(values)` in the reference) as an
    * incremental count.
    */
  val countValues: Aggregator[Any, Long, Long] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    apply[Any, Long, Long](0L)((b, _) => b + 1, _ + _, identity)
  }
}
