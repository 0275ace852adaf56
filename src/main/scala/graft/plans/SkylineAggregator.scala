package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A 2-D point competing for the Pareto front. */
final case class FrontPoint(id: Long, x: Long, y: Long)

/** The 2-D Pareto front as a typed Aggregator — the skyline expressed
  * as a commutative MONOID (buffer = current front; reduce = insert
  * with dominance prune; merge = union + prune), which is what makes it
  * both shuffle-minimal in batch (map-side partials ship only their
  * front, the [[graft.operators.Pareto]] shard-merge theorem run inside
  * the aggregation machinery) and STREAMABLE (a complete-mode streaming
  * aggregation re-merges partials per micro-batch; dominance filtering
  * is confluent, so ANY arrival order yields the same final front).
  *
  * Equal duplicate points both survive (neither dominates), matching
  * Pareto.skyline2d and the NOT-EXISTS oracle exactly. Buffer size is
  * the front size — O(√n) expected on random data, never the corpus.
  *
  * Aggregator (ladder (b)) over a custom plan node deliberately, as
  * with [[TopKAggregator]]: partial aggregation already gives the
  * map-side-combine + single-shuffle shape. */
final class SkylineAggregator
    extends Aggregator[FrontPoint, List[FrontPoint], Seq[FrontPoint]] {

  override def zero: List[FrontPoint] = Nil

  private def dominates(a: FrontPoint, b: FrontPoint): Boolean =
    a.x >= b.x && a.y >= b.y && (a.x > b.x || a.y > b.y)

  private def insert(front: List[FrontPoint], p: FrontPoint): List[FrontPoint] =
    if (front.exists(q => dominates(q, p))) front
    else p :: front.filterNot(q => dominates(p, q))

  override def reduce(b: List[FrontPoint], p: FrontPoint): List[FrontPoint] =
    insert(b, p)

  override def merge(a: List[FrontPoint], b: List[FrontPoint]): List[FrontPoint] =
    b.foldLeft(a)(insert)

  override def finish(b: List[FrontPoint]): Seq[FrontPoint] =
    b.sortBy(p => (-p.x, p.y, p.id))

  override def bufferEncoder: Encoder[List[FrontPoint]] =
    Encoders.kryo[List[FrontPoint]]

  override def outputEncoder: Encoder[Seq[FrontPoint]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FrontPoint]]()
}

/** A 3-D point competing for the Pareto front. */
final case class FrontPoint3(id: Long, x: Long, y: Long, z: Long)

/** The 3-D sibling of [[SkylineAggregator]] — the dimensionality where
  * the 2-D staircase decomposition stops existing (no total order on x
  * makes the y-max a sufficient statistic once z joins), so the
  * monoid-insert-with-prune buffer IS the scalable algorithm, not just
  * the streaming spelling of one: map-side partials ship only their
  * front, merge is union+prune, confluent under any order. */
final class Skyline3Aggregator
    extends Aggregator[FrontPoint3, List[FrontPoint3], Seq[FrontPoint3]] {

  override def zero: List[FrontPoint3] = Nil

  private def dominates(a: FrontPoint3, b: FrontPoint3): Boolean =
    a.x >= b.x && a.y >= b.y && a.z >= b.z &&
      (a.x > b.x || a.y > b.y || a.z > b.z)

  private def insert(front: List[FrontPoint3],
      p: FrontPoint3): List[FrontPoint3] =
    if (front.exists(q => dominates(q, p))) front
    else p :: front.filterNot(q => dominates(p, q))

  override def reduce(b: List[FrontPoint3], p: FrontPoint3): List[FrontPoint3] =
    insert(b, p)

  override def merge(a: List[FrontPoint3],
      b: List[FrontPoint3]): List[FrontPoint3] =
    b.foldLeft(a)(insert)

  override def finish(b: List[FrontPoint3]): Seq[FrontPoint3] =
    b.sortBy(p => (-p.x, p.y, p.z, p.id))

  override def bufferEncoder: Encoder[List[FrontPoint3]] =
    Encoders.kryo[List[FrontPoint3]]

  override def outputEncoder: Encoder[Seq[FrontPoint3]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FrontPoint3]]()
}
