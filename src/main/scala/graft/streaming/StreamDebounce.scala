package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming event debounce — the streaming face of
  * [[graft.operators.TimeSeries.debounce]]: per key, an arriving event
  * is emitted iff it is the key's first or arrived more than
  * `windowUs` after the immediately preceding event (double-submit
  * clicks, webhook retries, at-least-once ingest replays collapse to
  * their first row per quiet period).
  *
  * State per key is ONE microsecond timestamp (a `ValueState[Last]`) —
  * a key that has seen a billion events costs the same 8 bytes as one
  * that has seen two. No TTL: the debounce window is EVENT time while
  * a state TTL ticks in processing time, so eviction could resurrect
  * exactly the late replay (hours later on the wall clock, micro-
  * seconds later in `ts_us`) this operator exists to drop — bound
  * state by key cardinality, not by TTL. Within a micro-batch rows are
  * folded in (ts, id) order, so when events arrive in timestamp order
  * across batches the emitted set is exactly the batch operator's —
  * the parity StreamingSpec pins.
  *
  * Uses `transformWithState` (RocksDB provider), like
  * [[StreamQuantiles]] / [[StreamAnomaly]].
  */
object StreamDebounce {

  case class EvIn(key: String, ts_us: Long, id: Long)
  case class Last(tsUs: Long)

  def debounce(events: DataFrame, windowUs: Long): Dataset[EvIn] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "ts_us", "id").as[EvIn]
      .groupByKey(_.key)
      .transformWithState(new DebounceProcessor(windowUs),
        TimeMode.None(), OutputMode.Append())
  }

  class DebounceProcessor(windowUs: Long)
    extends StatefulProcessor[String, EvIn, EvIn] {

    @transient private var last: ValueState[Last] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Last]("last", Encoders.product[Last],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[EvIn],
                                 timers: TimerValues): Iterator[EvIn] = {
      var prev = Option(last.get()).map(_.tsUs)
      val kept = Vector.newBuilder[EvIn]
      // fold in event order; every row advances the predecessor window
      rows.toVector.sortBy(e => (e.ts_us, e.id)).foreach { e =>
        if (prev.forall(p => e.ts_us - p > windowUs)) kept += e
        prev = Some(e.ts_us)
      }
      prev.foreach(p => last.update(Last(p)))
      kept.result().iterator
    }
  }
}
