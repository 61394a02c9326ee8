package graft.streaming

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key quantile monitor — the streaming face of the KLL
  * percentile cube ([[org.apache.spark.sql.graftx.KllSketch]]): each
  * key folds its arriving values into ONE KLL sketch held in v2 state,
  * and every micro-batch emits that key's refreshed quantile readout.
  *
  * This is how a latency/length/score monitor actually runs in
  * production: state per key is a fixed-size mergeable summary
  * (~O(k·log n) bytes — never the value history), so a key that has
  * seen a billion events costs the same as one that has seen a
  * thousand. The SAME serialized sketch bytes interoperate with the
  * batch cube — a streaming monitor's state can be unioned into the
  * lakehouse percentile rollup via `kll_union_agg`, no rescan.
  *
  * Below `k` retained values a KLL sketch is EXACT, which is what
  * StreamingSpec pins against the batch `percentile` oracle; past that
  * the rank error is the documented ≈1.65%·(200/k)^0.9.
  *
  * Uses `transformWithState` (RocksDB provider), like
  * [[StreamAnomaly]] / [[StreamNearDup.candidatePairsTws]].
  */
object StreamQuantiles {

  case class MetricIn(key: Long, value: Double)
  case class QOut(key: Long, n: Long, p50: Double, p95: Double)

  def quantiles(events: DataFrame, k: Int = 200): Dataset[QOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "value").as[MetricIn]
      .groupByKey(_.key)
      .transformWithState(new KllProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  class KllProcessor(k: Int) extends StatefulProcessor[Long, MetricIn, QOut] {

    @transient private var sk: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("kll", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MetricIn],
                                 timers: TimerValues): Iterator[QOut] = {
      val sketch = Option(sk.get())
        .map(b => KllDoublesSketch.heapify(Memory.wrap(b)))
        .getOrElse(KllDoublesSketch.newHeapInstance(k))
      rows.foreach(m => sketch.update(m.value))
      sk.update(sketch.toByteArray)
      if (sketch.isEmpty) Iterator.empty
      else Iterator(QOut(key, sketch.getN,
        sketch.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE),
        sketch.getQuantile(0.95, QuantileSearchCriteria.INCLUSIVE)))
    }
  }
}
