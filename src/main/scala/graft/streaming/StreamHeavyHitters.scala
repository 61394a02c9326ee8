package graft.streaming

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key heavy-hitters monitor — the streaming face of the
  * frequent-items cube ([[org.apache.spark.sql.graftx.FreqSketch]]):
  * each key folds its arriving items into ONE Misra-Gries summary held
  * in v2 state, and every micro-batch emits the key's refreshed
  * heavy-hitter list (items whose frequency lower bound clears
  * `minFrac` of the key's stream so far — NO_FALSE_POSITIVES, same
  * read as the batch `freq_heavy_hitters`).
  *
  * This is the "trending items per partition" monitor: state per key
  * is a fixed-size map (`maxMapSize` counters), independent of stream
  * length, and the serialized bytes are the SAME wire format as the
  * batch cube — a monitor's state unions into the lakehouse rollup via
  * `freq_union_agg` with no rescan, exactly like [[StreamQuantiles]]'
  * KLL state.
  */
object StreamHeavyHitters {

  case class ItemIn(key: Long, item: String)
  case class HeavyOut(key: Long, n: Long, item: String, lowerBound: Long)

  private val serde = new ArrayOfStringsSerDe()

  def heavyHitters(events: DataFrame, maxMapSize: Int = 64,
                   minFrac: Double = 0.1): Dataset[HeavyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("key", "item").as[ItemIn]
      .groupByKey(_.key)
      .transformWithState(new FreqProcessor(maxMapSize, minFrac),
        TimeMode.None(), OutputMode.Append())
  }

  class FreqProcessor(maxMapSize: Int, minFrac: Double)
    extends StatefulProcessor[Long, ItemIn, HeavyOut] {

    @transient private var sk: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("freq", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ItemIn],
                                 timers: TimerValues): Iterator[HeavyOut] = {
      val sketch = Option(sk.get())
        .map(b => ItemsSketch.getInstance(Memory.wrap(b), serde))
        .getOrElse(new ItemsSketch[String](maxMapSize))
      rows.foreach(r => sketch.update(r.item))
      sk.update(sketch.toByteArray(serde))
      val n = sketch.getStreamLength
      if (n == 0) Iterator.empty
      else {
        val floor = math.floor(n * minFrac).toLong
        // same readout as the batch FreqHeavyHitters expression:
        // NO_FALSE_POSITIVES list filtered on the LOWER bound
        sketch.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
          .iterator.filter(_.getLowerBound >= floor)
          .map(r => HeavyOut(key, n, r.getItem, r.getLowerBound))
      }
    }
  }
}
