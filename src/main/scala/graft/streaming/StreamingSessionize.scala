package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Stateful streaming sessionization — the engine's
  * flatMapGroupsWithState showcase (SURVEY.md §6: custom state).
  *
  * Events are grouped by user; a session closes when no event arrives
  * within `gap` of the last one (event time). State per user is O(1)
  * (current session bounds + count); the watermark bounds state
  * retention, so state size is ~|active users| regardless of stream
  * length — the 100 TB-friendly formulation of B6's batch sessionize. */
object StreamingSessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
      n_events: Int, duration_sec: Long)

  def sessions(events: Dataset[Event], gapMinutes: Int)
      (implicit s: SparkSession): Dataset[Session] = {
    import s.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed start of the inactivity gap: close and emit
            val st = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(st.start), st.n,
              (st.last - st.start) / 1000))
          } else {
            val sorted = evs.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(st) if t - st.last <= gapMs =>
                  cur = Some(st.copy(last = math.max(st.last, t), n = st.n + 1))
                case Some(st) =>
                  closed ::= Session(user, new Timestamp(st.start), st.n,
                    (st.last - st.start) / 1000)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
