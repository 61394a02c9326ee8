package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-series statistics over partitioned, ordered event
  * streams: trailing-window mean/deviation and z-score anomaly
  * flagging ("is this value surprising given this key's recent
  * history?").
  *
  * Scale shape: ONE window pass — a hash exchange on the partition key
  * plus an in-partition sort, then a bounded ROWS frame evaluated
  * streamingly (Spark keeps only `lookback` rows buffered per key, so
  * memory is O(lookback), independent of history length). No
  * self-joins, no per-key driver loops.
  *
  * The deviation is computed from raw moments (E[x²] − E[x]²) rather
  * than a `stddev` builtin, so the arithmetic graph is reproducible
  * across engines for differential testing; the trailing frame EXCLUDES
  * the current row, so a spike judges itself against history it isn't
  * part of.
  */
object TimeSeries {

  /** Reporting gaps in a per-key event stream — the missing-data audit
    * of time-series quality (sensor dropout, ingestion outage): one
    * `lag` window pass emits a row per consecutive-event pair whose
    * spacing exceeds `thresholdUs`, with the gap's bounds and width.
    * One shuffle on the key; the window frame is a single preceding
    * row, so state is O(1) per task regardless of key size. */
  def gaps(df: DataFrame, keyCol: Column, tsUsCol: Column,
           thresholdUs: Long): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts_us"))
    df.select(keyCol.as("key"), tsUsCol.as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull &&
        col("ts_us") - col("prev_us") > thresholdUs)
      .select(col("key"), col("prev_us").as("gap_start_us"),
        col("ts_us").as("gap_end_us"),
        (col("ts_us") - col("prev_us")).as("gap_us"))
  }

  /** Event debounce — drop a row when the SAME key fired within the
    * previous `windowUs` (double-submit clicks, retried webhooks,
    * at-least-once ingest replays). Lag-based: a row survives iff it
    * is its key's first event or arrived more than `windowUs` after
    * the immediately preceding one — the standard retrigger-window
    * rule (each event refreshes the window, so a burst collapses to
    * its first row per quiet period... strictly: rows closer than the
    * window to their PREDECESSOR drop, the scalable stateless form).
    * Same O(1)-per-task shape as [[gaps]]: one lag pass, one shuffle
    * on the key, `idCol` tiebreak for same-microsecond events. */
  def debounce(df: DataFrame, keyCols: Seq[Column], tsUsCol: Column,
               idCol: Column, windowUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(tsUsCol.asc, idCol.asc)
    df.withColumn("__prev_us", lag(tsUsCol, 1).over(w))
      .filter(col("__prev_us").isNull ||
        tsUsCol - col("__prev_us") > windowUs)
      .drop("__prev_us")
  }

  /** Adds `z` (trailing z-score) to rows with at least `minObs`
    * history rows and positive variance; rows without enough history
    * are dropped (a real monitor can't score them).
    *
    * @param lookback trailing frame size in rows (excludes current)
    * @param minObs   minimum history rows required to emit a score
    */
  def rollingZScore(df: DataFrame, partitionCols: Seq[Column],
                    orderCols: Seq[Column], valueCol: Column,
                    lookback: Int, minObs: Int): DataFrame = {
    val fr = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(-lookback.toLong, -1L)
    val scored = df
      .withColumn("__m", avg(valueCol).over(fr))
      .withColumn("__m2", avg(valueCol * valueCol).over(fr))
      .withColumn("__n", count(lit(1)).over(fr))
    scored
      .filter(col("__n") >= minObs &&
        (col("__m2") - col("__m") * col("__m")) > 0)
      .withColumn("z",
        (valueCol - col("__m")) / sqrt(col("__m2") - col("__m") * col("__m")))
      .drop("__m", "__m2", "__n")
  }

  /** Resample an irregular event stream onto a dense per-key calendar
    * (every `bucketUs` bucket between the key's first and last
    * observation) and forward-fill gaps with the last observed value —
    * the gap-filling step before any rolling-window computation that
    * assumes regular spacing.
    *
    * Scale shape: events collapse FIRST to one row per (key, bucket)
    * — a window pass picking the bucket's LAST observation (latest
    * (time, tie) wins) — so the dense calendar is built over the
    * bucketed frame, not the raw log: `sequence`+explode generates each
    * key's calendar inside the row, the observation join is key+bucket
    * keyed, and the forward fill is one more window over the calendar
    * frame. Memory is O(1) per key per window (running `last` with
    * ignoreNulls), and every exchange is on the same key family.
    *
    * Output: key, `bucket` (integer, epoch-micros div bucketUs),
    * `value` (observed or forward-filled), `is_observed`.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsUsCol: String,
                   valueCol: String, tieCol: String,
                   bucketUs: Long): DataFrame = {
    val bucketed = df.select(col(keyCol),
      expr(s"$tsUsCol div ${bucketUs}L").as("bucket"),
      col(tsUsCol), col(tieCol), col(valueCol))
    // last observation per (key, bucket), deterministic tie-break
    val wLast = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col(tsUsCol).desc, col(tieCol).desc)
    // obs feeds TWO consumers (the calendar bounds and the value join)
    // and Catalyst does not CSE across branches — without this
    // materialization the window-dedup pass over the raw log runs
    // twice. The frame is one row per observed (key, bucket).
    val obs = bucketed
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("bucket"), col(valueCol).as("__v"))
      .localCheckpoint()
    // dense calendar per key — bounded by (span / bucketUs) rows/key
    val cal = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // obs is corpus-sized (every observed key×bucket) — hinted so the
    // planner can't broadcast it off bad post-checkpoint stats.
    cal.join(obs.hint("shuffle_hash"), Seq(keyCol, "bucket"), "left")
      .withColumn("is_observed", col("__v").isNotNull)
      .withColumn("value", last(col("__v"), ignoreNulls = true).over(wFill))
      .drop("__v")
  }
}
