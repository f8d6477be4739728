package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the per-key mutable-state primitive the
  * batch `g2_sessionize` window query cannot provide on an unbounded
  * stream. A session closes when the event-time watermark passes its
  * last event + gap (EventTimeTimeout), at which point it is emitted
  * exactly once in Append mode.
  *
  * State per key is O(1) (current open session only), so 10⁹ users ≈
  * a few GB of state store — the shape that scales.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)
  final case class ClosedSession(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  def sessions(events: Dataset[Ev], gapMinutes: Int): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.n)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = evs.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // a cross-batch late event can precede the open
                  // session's start — extend BOTH bounds, or the emitted
                  // session_start misreports the earliest event
                  cur = Some(s.copy(startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= close(userId, s)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // setTimeoutTimestamp rejects timestamps at or before the
              // current watermark (flatMapGroupsWithState does NOT drop
              // late rows for us): a key whose newest event lags the
              // watermark by more than the gap would otherwise crash the
              // query. Clamping means such a session times out on the
              // next watermark advance — the earliest legal moment.
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.reverse.iterator
          }
      }
  }
}
