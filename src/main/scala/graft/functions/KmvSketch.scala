package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV (k-minimum-values) sketch buffer: the k = 64 smallest
  * DISTINCT hash values seen so far. */
final case class KmvBuf(hs: Seq[Long])

/** Typed KMV sketch aggregator — the distributed distinct-cardinality
  * sketch q_agg_kmv derives relationally, packaged as a reusable
  * `Aggregator` so STREAMING aggregation can maintain it with bounded
  * state: the buffer never exceeds k longs per group whatever the
  * input volume, and both reduce and merge are commutative/associative
  * and duplicate-absorbing (set semantics), so micro-batch arrival
  * order cannot perturb the settled sketch. Pure integer selection —
  * no float arithmetic anywhere, deterministic on any partitioning
  * (the SecondMax discipline from q_udaf_typed). */
object KmvSketch extends Aggregator[Long, KmvBuf, Seq[Long]] {
  val k = 64

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf =
    if (b.hs.contains(h)) b
    else if (b.hs.length < k) KmvBuf(b.hs :+ h)
    else {
      val mx = b.hs.max
      if (h >= mx) b else KmvBuf(b.hs.filterNot(_ == mx) :+ h)
    }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))

  override def finish(r: KmvBuf): Seq[Long] = r.hs.sorted

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
