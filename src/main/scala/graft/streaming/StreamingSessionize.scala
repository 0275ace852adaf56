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
  // start/last in MICROSECONDS: gap comparisons must be µs-exact to
  // match the batch/oracle sessionization (`ts.getTime` is ms-truncated
  // and would mis-split a pair whose gap straddles 30min by <1ms)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
      n_events: Int, duration_sec: Long)

  /** Epoch micros of a Timestamp (getTime is ms-truncated; the nanos
    * field carries the rest). */
  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos.toLong / 1000L

  def sessions(events: Dataset[Event], gapMinutes: Int)
      (implicit s: SparkSession): Dataset[Session] = {
    import s.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(st: SessionState): Session =
            Session(user, new Timestamp(st.start / 1000L), st.n,
              (st.last - st.start) / 1000000L)
          if (state.hasTimedOut) {
            // watermark passed start of the inactivity gap: close and emit
            val st = state.get
            state.remove()
            Iterator(emit(st))
          } else {
            val sorted = evs.map(e => us(e.ts)).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(st) if t - st.last <= gapUs =>
                  cur = Some(st.copy(last = math.max(st.last, t), n = st.n + 1))
                case Some(st) =>
                  closed ::= emit(st)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // timeout clock is ms-granular; µs→ms truncation only
              // affects WHEN an idle session times out, never how
              // events group into sessions
              state.setTimeoutTimestamp((st.last + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
