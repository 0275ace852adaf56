package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeSet

/** A keyed hash observation for the KMV sketch. */
final case class KmvObs(key: String, h: Long)

/** The k smallest DISTINCT values as a typed Aggregator — the KMV
  * sketch state expressed as the monoid it is (the k smallest of a
  * union are among the union of the k smallest), so the same buffer
  * serves map-side partials in batch and complete-mode streaming
  * aggregation state across micro-batches: O(k) per key either way,
  * and any arrival order or partitioning drains to the identical
  * sketch. Duplicate hashes collapse (KMV is a DISTINCT sketch);
  * values above the current k-th minimum are dropped on sight. */
final class BottomKDistinctAggregator(k: Int)
    extends Aggregator[KmvObs, TreeSet[Long], Seq[Long]] {

  // fail at plan-build time on the driver: k ≤ 0 would otherwise reach
  // `b.max` on an empty buffer inside an executor task
  require(k > 0, s"BottomKDistinctAggregator: k must be positive, got $k")

  override def zero: TreeSet[Long] = TreeSet.empty[Long]

  private def add(b: TreeSet[Long], h: Long): TreeSet[Long] =
    if (b.contains(h)) b
    else if (b.size < k) b + h
    else if (h < b.max) (b + h) - b.max
    else b

  override def reduce(b: TreeSet[Long], o: KmvObs): TreeSet[Long] =
    add(b, o.h)

  override def merge(a: TreeSet[Long], b: TreeSet[Long]): TreeSet[Long] =
    b.foldLeft(a)(add)

  override def finish(b: TreeSet[Long]): Seq[Long] = b.toSeq // ascending

  override def bufferEncoder: Encoder[TreeSet[Long]] =
    Encoders.kryo[TreeSet[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
