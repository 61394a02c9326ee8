package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-shaped event aggregation.
  *
  * The reference is batch-only (SURVEY §1.1: no streams); this is the
  * incremental-refresh path SURVEY §7.7 plans: the same transform runs
  * over `readStream` (with the watermark bounding state) or over a
  * batch frame (for the oracle gate). Streaming semantics are exercised
  * in StreamingSpec via a memory-sink query.
  */
object EventStream {

  /** Tumbling-window counts + sums per event type. `tsCol` must be a
    * TimestampType column. Works identically on batch and streaming
    * inputs; on streaming, callers add `.withWatermark("ts", ...)`
    * before to bound state. */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
