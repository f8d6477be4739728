package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection: the stateful twin of the batch
  * `ts2_ewma` / `ts3_anomaly_mad` queries. Each user carries an O(1)
  * exponentially-weighted mean + variance (the EW form of Welford's
  * update), and an event is flagged the moment it lands more than
  * `k` EW-stddevs from the mean the stream had BEFORE absorbing it —
  * no lookback buffer, no per-key history, so 10⁹ keys is a few GB of
  * state store.
  *
  * Scale posture:
  *  - state is three doubles + a count per key (`EwState`), updated
  *    in event-time order within each batch;
  *  - idle keys are garbage-collected by event-time timeout once the
  *    watermark passes their last event + `idleGcMinutes` — without
  *    this, a churning key population grows state without bound;
  *  - a `warmup` floor suppresses flags until the estimate has seen
  *    enough events to mean something (the first events of a key are
  *    never "anomalous" relative to an empty estimate).
  *
  * Emission is Append-mode: an anomaly row is emitted exactly once, in
  * the batch whose events produced it.
  */
object StreamingAnomaly {

  final case class Ev(
      event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class EwState(ewma: Double, ewvar: Double, n: Long, lastMs: Long)
  final case class Anomaly(
      event_id: Long,
      user_id: Long,
      ts: java.sql.Timestamp,
      value: Double,
      ewma: Double,
      bound: Double)

  /** Output schema — lets callers read a not-yet-populated sink dir. */
  val anomalySchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Anomaly].schema

  /** Alpha is the decay weight of the newest observation; k the flag
    * threshold in EW-stddevs; warmup the minimum observations before
    * any flag; idleGcMinutes the state-GC horizon past the watermark. */
  def anomalies(
      events: Dataset[Ev],
      alpha: Double = 0.25,
      k: Double = 4.0,
      warmup: Int = 8,
      idleGcMinutes: Int = 60): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gcMs = idleGcMinutes.toLong * 60000L

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwState, Anomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[EwState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // (ts, event_id) is the ORDERING CONTRACT every batch twin
            // pins (ts2_ewma, g7_markov, a5_scd2) — same-timestamp ties
            // fold identically here and there, and the emitted event_id
            // joins a flag back to its exact source event.
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(EwState(0.0, 0.0, 0L, 0L))
            val out = Seq.newBuilder[Anomaly]
            sorted.foreach { e =>
              val x = e.value
              if (st.n >= warmup) {
                val bound = k * math.sqrt(st.ewvar)
                if (math.abs(x - st.ewma) > bound)
                  out += Anomaly(e.event_id, userId, e.ts, x, st.ewma, bound)
              }
              // EW Welford: the estimate absorbs every event, anomalous
              // or not — a level shift becomes the new normal instead of
              // flagging forever.
              if (st.n == 0L) {
                st = EwState(x, 0.0, 1L, e.ts.getTime)
              } else {
                val diff = x - st.ewma
                val incr = alpha * diff
                st = EwState(st.ewma + incr,
                  (1.0 - alpha) * (st.ewvar + diff * incr),
                  st.n + 1, math.max(st.lastMs, e.ts.getTime))
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + gcMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
