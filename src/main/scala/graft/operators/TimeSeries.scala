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
}
