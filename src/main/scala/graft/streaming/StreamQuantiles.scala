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
  case class SketchOut(key: Long, n: Long, sketch: Array[Byte])

  def quantiles(events: DataFrame, k: Int = 200): Dataset[QOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "value").as[MetricIn]
      .groupByKey(_.key)
      .transformWithState(new KllProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** The state-EXPORT form of [[quantiles]]: each micro-batch emits the
    * key's refreshed serialized sketch instead of a quantile readout —
    * the checkpoint a streaming monitor publishes so the lakehouse
    * percentile cube can fold live state into a batch rollup
    * (`kll_union_agg` over stream bytes ∪ batch bytes, no rescan of
    * either side). The latest emission per key IS the key's full
    * streaming history, compressed to O(k·log n) bytes. */
  def quantileSketches(events: DataFrame, k: Int = 200): Dataset[SketchOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "value").as[MetricIn]
      .groupByKey(_.key)
      .transformWithState(new KllSketchExportProcessor(k),
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

  class KllSketchExportProcessor(k: Int)
      extends StatefulProcessor[Long, MetricIn, SketchOut] {

    @transient private var sk: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("kll", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MetricIn],
                                 timers: TimerValues): Iterator[SketchOut] = {
      val sketch = Option(sk.get())
        .map(b => KllDoublesSketch.heapify(Memory.wrap(b)))
        .getOrElse(KllDoublesSketch.newHeapInstance(k))
      rows.foreach(m => sketch.update(m.value))
      val bytes = sketch.toByteArray
      sk.update(bytes)
      if (sketch.isEmpty) Iterator.empty
      else Iterator(SketchOut(key, sketch.getN, bytes))
    }
  }
}
