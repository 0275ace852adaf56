package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeSet

/** One observation of the exact-k sample stream: the stratum, the
  * deterministic draw priority `u` (Curation.samplePriority), and the
  * row id. */
final case class PairObs(key: String, u: Long, id: Long)

/** The k smallest (priority, id) PAIRS as a typed Aggregator — the
  * exact-k per-stratum sample expressed as the bottom-k monoid (the k
  * smallest of a union are among the union of the k smallest), so the
  * same buffer serves map-side partials in batch and complete-mode
  * streaming aggregation state across micro-batches: O(k) per stratum
  * either way, and ANY arrival order or partitioning drains to the
  * identical sample — the streaming-maintained holdout
  * (`sample_exact_k_stream`) equals the batch rank-window draw row for
  * row. Duplicate (u, id) pairs collapse in the TreeSet, so a broker
  * REDELIVERY cannot occupy two sample slots. Ties on u break by id,
  * the batch window's exact order. */
final class BottomKPairsAggregator(k: Int)
    extends Aggregator[PairObs, TreeSet[(Long, Long)], Seq[(Long, Long)]] {

  require(k > 0, s"BottomKPairsAggregator: k must be positive, got $k")

  override def zero: TreeSet[(Long, Long)] = TreeSet.empty[(Long, Long)]

  private def add(b: TreeSet[(Long, Long)],
      p: (Long, Long)): TreeSet[(Long, Long)] =
    if (b.contains(p)) b
    else if (b.size < k) b + p
    else if (implicitly[Ordering[(Long, Long)]].lt(p, b.max)) (b + p) - b.max
    else b

  override def reduce(b: TreeSet[(Long, Long)],
      o: PairObs): TreeSet[(Long, Long)] = add(b, (o.u, o.id))

  override def merge(a: TreeSet[(Long, Long)],
      b: TreeSet[(Long, Long)]): TreeSet[(Long, Long)] =
    b.foldLeft(a)(add)

  override def finish(b: TreeSet[(Long, Long)]): Seq[(Long, Long)] =
    b.toSeq // ascending (u, id) = the batch window's rank order

  override def bufferEncoder: Encoder[TreeSet[(Long, Long)]] =
    Encoders.kryo[TreeSet[(Long, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
