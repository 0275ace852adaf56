package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SIZE-based index rollover AT INGEST — the streaming sibling of the
  * batch rollover cumsum (queries/ABlock.rolloverGens; reference
  * lifecycle es.rs:203-248): per topic, the generation an arriving
  * message lands in is decided the moment it arrives, from a single
  * cumulative-bytes counter carried in state — exactly how a live sink
  * decides "this bulk write opens index {topic}-g{N+1}".
  *
  * In-order arrival reproduces the batch relation exactly: the counter
  * equals the batch window's running sum at every message, so
  * gen = (max(cum, 1) − 1) div capBytes matches the batch assignment
  * and the aggregated generations land on sync_rollover's own oracle.
  *
  * Scale: ONE shuffle on the topic key per micro-batch; state is a
  * single long per topic — O(topics) total, the smallest state of any
  * operator here. Within a micro-batch, messages process in msg_id
  * order (deterministic replay; the source delivers batches in
  * arrival order). Byte size = CHARACTER length of the payload,
  * matching the batch `length(data)` (ASCII payloads here). */
object StreamingRollover {

  final case class Msg(msg_id: Long, topic: String, data: String)

  final case class GenAssigned(msg_id: Long, topic: String, gen: Long,
      bytes: Long)

  final case class Cum(bytes: Long)

  def assignGenerations(msgs: Dataset[Msg],
      capBytes: Long = 16384L): Dataset[GenAssigned] = {
    val s = msgs.sparkSession
    import s.implicits._
    msgs.groupByKey(_.topic)
      .flatMapGroupsWithState[Cum, GenAssigned](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (topic: String, it: Iterator[Msg], state: GroupState[Cum]) =>
          var cum = state.getOption.map(_.bytes).getOrElse(0L)
          val out = it.toArray.sortBy(_.msg_id).map { m =>
            val bytes = if (m.data == null) 0L else m.data.length.toLong
            cum += bytes
            GenAssigned(m.msg_id, topic,
              (math.max(cum, 1L) - 1L) / capBytes, bytes)
          }
          state.update(Cum(cum))
          out.iterator
      }
  }
}
