package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One message's ack observation: its per-topic arrival rank and
  * whether the consumer acked it. */
final case class AckObs(topic: String, seq: Long, acked: Int)

/** The ledger summary: total messages seen, the mark-delete position
  * (contiguous acked prefix), and the acked holes stranded above it. */
final case class AckLedger(n_msgs: Long, mark_delete: Long, n_holes: Long)

private[plans] final case class AckBuf(n: Long, ivs: List[(Long, Long)],
    pend: Int)

/** A Pulsar-cursor-style ack tracker as a typed Aggregator: the acked
  * seq set compressed to DISJOINT SORTED INTERVALS — the same range
  * compression a broker's individually-deleted-messages state keeps —
  * so the buffer is O(holes), never O(messages), and merging two
  * partial ledgers is interval-set union (a commutative monoid: any
  * partitioning or micro-batch arrival order yields the same final
  * ledger). finish() reads the ledger off the intervals: mark-delete =
  * the end of the interval anchored at seq 1 (0 if none), holes =
  * acked messages in every interval above it.
  */
final class AckLedgerAggregator
    extends Aggregator[AckObs, AckBuf, AckLedger] {

  override def zero: AckBuf = AckBuf(0L, Nil, 0)

  private def coalesce(ivs: List[(Long, Long)]): List[(Long, Long)] = {
    val sorted = ivs.sortBy(_._1)
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((a, b) :: acc, (c, d)) if c <= b + 1 =>
        (a, math.max(b, d)) :: acc
      case (acc, iv) => iv :: acc
    }.reverse
  }

  // reduce only PREPENDS a singleton and coalesces every 4096 inserts:
  // re-sorting the interval list per element made the streamed ledger
  // O(n·holes) — measured superlinear (15 s at sf0.1, slope 8.4 at
  // data ×10) before the amortization; finish/merge always coalesce,
  // so the monoid semantics are unchanged and the buffer stays bounded
  // by max(4096, holes) entries.
  override def reduce(b: AckBuf, o: AckObs): AckBuf =
    if (o.acked != 1) AckBuf(b.n + 1, b.ivs, b.pend)
    else {
      val ivs = (o.seq, o.seq) :: b.ivs
      if (b.pend >= 4095) AckBuf(b.n + 1, coalesce(ivs), 0)
      else AckBuf(b.n + 1, ivs, b.pend + 1)
    }

  override def merge(a: AckBuf, b: AckBuf): AckBuf =
    AckBuf(a.n + b.n, coalesce(a.ivs ::: b.ivs), 0)

  override def finish(b: AckBuf): AckLedger = {
    val sorted = coalesce(b.ivs)
    val markDelete = sorted.headOption match {
      case Some((1L, e)) => e
      case _ => 0L
    }
    val holes = sorted.map { case (s, e) => e - s + 1 }.sum -
      (if (markDelete > 0) markDelete else 0L)
    AckLedger(b.n, markDelete, holes)
  }

  override def bufferEncoder: Encoder[AckBuf] = Encoders.kryo[AckBuf]
  override def outputEncoder: Encoder[AckLedger] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[AckLedger]()
}
