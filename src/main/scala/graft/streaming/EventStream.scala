package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming-shaped event aggregation.
  *
  * The reference is batch-only (SURVEY §1.1: no streams); this is the
  * incremental-refresh path SURVEY §7.7 plans: the same transforms run
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

  /** Session-window counts per key: consecutive events of one key merge
    * into a session while each arrives within `gap` of the previous
    * (Spark semantics: an event at t extends the session to t+gap; the
    * next joins iff its ts < that end). Batch-equivalent to the
    * gaps-and-islands formulation the oracle uses. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("w.start").as("session_start"), col("n"))

  /** Stream-stream interval join (event attribution): pair each `right`
    * row with every same-key `left` row whose timestamp precedes it by
    * at most `maxDelay` — "attribute each purchase to the clicks within
    * the lookback window". The join condition is exactly the shape
    * Structured Streaming's stream-stream join supports for state
    * cleanup: key equality plus a bounded time range, so with
    * watermarks on BOTH input streams Spark evicts buffered rows as the
    * watermark passes `leftTs + maxDelay` — state stays
    * O(window × rate), not unbounded. Batch inputs run the identical
    * plan (a range-predicate hash join), which is what the oracle gate
    * checks; at scale the equi-key keeps it a plain shuffled hash join,
    * never a cartesian.
    *
    * Column names must already be disjoint between the two sides except
    * for `key` (rename upstream); the output carries left columns, then
    * right columns minus its key. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, maxDelay: String): DataFrame = {
    val rKey = right.withColumnRenamed(key, "__rkey")
    left.join(rKey,
      col(key) === col("__rkey") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))
      .drop("__rkey")
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserStats(user_id: Long, n_events: Long, max_value: Double)

  case class KeyedEvent(event_id: Long, ts_us: Long, user_id: Long,
                        event_type: String)

  /** Streaming exact dedup: emit only the FIRST event per
    * (user_id, event_type) key, suppressing every later duplicate via
    * `GroupState` — the stateful form of `dropDuplicates` that keeps
    * working across micro-batches (state is the set of seen keys; add a
    * watermark + timeout to bound it in production). In one batch the
    * per-key iterator is unordered, so "first" is defined as min by
    * (ts_us, event_id) — deterministic and oracle-checkable; under
    * streaming, later micro-batches of a seen key emit nothing. */
  def firstSeen(events: DataFrame): Dataset[KeyedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts_us"), col("user_id"),
      col("event_type")).as[KeyedEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[KeyedEvent, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Long, String), it: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          if (state.exists) Iterator.empty
          else {
            val first = it.minBy(e => (e.ts_us, e.event_id))
            state.update(first)
            Iterator.single(first)
          }
      }
  }

  /** Custom per-key state via `flatMapGroupsWithState` — the arbitrary-
    * stateful-processing hook (KeyValueGroupedDataset). The fold is
    * order-insensitive (count + max), so batch output is deterministic
    * and oracle-checkable; under streaming the same function accumulates
    * across micro-batches through `GroupState`. */
  def statefulUserStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, Double.MinValue))
          val next = it.foldLeft(prev) { (acc, e) =>
            UserStats(uid, acc.n_events + 1, math.max(acc.max_value, e.value))
          }
          state.update(next)
          Iterator.single(next)
      }
  }
}
