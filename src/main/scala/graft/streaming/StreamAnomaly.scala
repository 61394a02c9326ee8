package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key anomaly monitor — the real-time counterpart of
  * `TimeSeries.rollingZScore`: each arriving event is scored against
  * its key's trailing value history, then pushed into that history.
  *
  * State per key is ONE fixed-size ring of the last `lookback` values
  * (a `ValueState` rewrite of ≤ lookback doubles per event — bounded,
  * independent of stream length). Within a micro-batch the key's rows
  * are processed in event-time order, so a feed that arrives in order
  * (or any single ordered replay) reproduces the batch window result
  * EXACTLY — same linear summation order, same raw-moment arithmetic —
  * which is what the StreamingSpec parity test pins. Out-of-order
  * arrival across micro-batches degrades gracefully to arrival-order
  * history, the standard processing-time monitor semantic.
  *
  * Uses the v2 arbitrary-state API (`transformWithState`; requires the
  * RocksDB state-store provider, as with
  * [[StreamNearDup.candidatePairsTws]]).
  */
object StreamAnomaly {

  case class EventIn(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  case class Score(user_id: Long, event_id: Long, z: Double, is_anomaly: Boolean)
  case class Buf(values: Seq[Double])

  def scores(events: DataFrame, lookback: Int = 8, minObs: Int = 4,
             threshold: Double = 2.0): Dataset[Score] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("user_id", "event_id", "ts_us", "value").as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new RollingZProcessor(lookback, minObs, threshold),
        TimeMode.None(), OutputMode.Append())
  }

  class RollingZProcessor(lookback: Int, minObs: Int, threshold: Double)
    extends StatefulProcessor[Long, EventIn, Score] {

    @transient private var buf: ValueState[Buf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[Buf]("buf", Encoders.product[Buf],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timers: TimerValues): Iterator[Score] = {
      var values = Option(buf.get()).map(_.values.toVector)
        .getOrElse(Vector.empty[Double])
      val out = Vector.newBuilder[Score]
      for (e <- rows.toSeq.sortBy(r => (r.ts_us, r.event_id))) {
        if (values.length >= minObs) {
          // raw moments in buffer (= event-time) order: identical
          // arithmetic to the batch window formulation
          val n = values.length
          val m = values.sum / n
          val m2 = values.map(v => v * v).sum / n
          val variance = m2 - m * m
          if (variance > 0) {
            val z = (e.value - m) / math.sqrt(variance)
            out += Score(key, e.event_id, z, math.abs(z) > threshold)
          }
        }
        values = (values :+ e.value).takeRight(lookback)
      }
      buf.update(Buf(values))
      out.result().iterator
    }
  }
}
