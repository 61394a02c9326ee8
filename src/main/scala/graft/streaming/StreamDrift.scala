package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the streaming face of
  * [[graft.operators.Profiling.distributionDrift]] (the report a
  * recurring ingest runs before promoting a snapshot): per event-time
  * window, the arriving stream's per-bucket proportions against a
  * broadcast REFERENCE distribution, with the same pure-rational
  * chi-square terms as the batch report (engine-portable arithmetic —
  * see the batch scaladoc for why chi-square beats PSI's libm `ln`
  * here).
  *
  * Scale shape: the only corpus-sized state is the FIRST watermarked
  * windowed count, sharded by (window, bin) like any streaming agg;
  * the second aggregation re-keys the BUCKET-BOUNDED count rows by
  * window to fold the window total (chained stateful aggregations,
  * append mode — closed windows flow from stage 1 to stage 2 as the
  * watermark passes), and the reference join is stream-static against
  * a broadcast dim. Nothing row-sized crosses the second stage.
  *
  * `ref` must carry `(bin, p_ref)` — the reference proportions (sum to
  * 1). Buckets absent from the reference get a null `chi2_term`, same
  * as the batch report's empty-reference-bucket rule; reference
  * buckets absent from the window simply don't emit a row (a windowed
  * count can't see zero-count bins — feed the report through a
  * calendar/bin densifier downstream if absent-bin terms are needed).
  */
object StreamDrift {

  def drift(events: DataFrame, tsCol: String, binCol: Column,
            ref: DataFrame, windowDur: String,
            watermark: String): DataFrame = {
    val counts = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"), binCol.as("bin"))
      .agg(count(lit(1)).as("n_cur"))
    val perWin = counts
      .groupBy(col("win"))
      .agg(sum(col("n_cur")).as("n_win"),
        collect_list(struct(col("bin"), col("n_cur"))).as("bins"))
    val d = col("p_cur") - col("p_ref")
    perWin
      .select(col("win").getField("start").as("window_start"),
        col("n_win"), explode(col("bins")).as("b"))
      .select(col("window_start"), col("n_win"),
        col("b.bin").as("bin"), col("b.n_cur").as("n_cur"))
      .withColumn("p_cur", col("n_cur").cast("double") / col("n_win"))
      .join(broadcast(ref), Seq("bin"), "left")
      .select(col("window_start"), col("bin"), col("n_cur"),
        col("p_ref"), col("p_cur"),
        abs(d).as("abs_diff"),
        when(col("p_ref") > 0, d * d / col("p_ref")).as("chi2_term"))
  }
}
