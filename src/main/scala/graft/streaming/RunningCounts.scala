package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Spark 4 `transformWithState` surface: an arbitrary-state processor
  * maintaining one running per-key event counter, emitting the updated
  * total on every micro-batch that touches the key.
  *
  * This is the modern replacement for `mapGroupsWithState`-style
  * operators: typed state handles (`ValueState`), explicit `TimeMode`,
  * and per-state TTL — the state-hygiene contract that matters when the
  * key space is unbounded (10⁹ users: expired keys are evicted by the
  * store itself instead of by hand-written timeout bookkeeping).
  * Requires the RocksDB state store provider.
  */
object RunningCounts {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class KeyCount(user_id: Long, n: Long)

  private class CounterProcessor
      extends StatefulProcessor[Long, Ev, KeyCount] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[KeyCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(KeyCount(key, n))
    }
  }

  /** Running per-user totals over an unbounded event stream. */
  def totals(events: Dataset[Ev]): Dataset[KeyCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new CounterProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
