package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL via the
  * Spark `hll_*` builtins) — the pre-aggregated-cube pattern that makes
  * "distinct users per X" answerable at 100 TB without rescanning raw
  * data: fine-grained buckets each keep a fixed-size (≈ 2^lgK bytes)
  * sketch, and ANY rollup is a cheap union of those sketches. Exact
  * count-distinct cannot do this (it must reshuffle raw keys per
  * grouping); sketches trade a bounded relative error (≈ 1.04/√2^lgK,
  * ~0.8% at lgK=14) for mergeability and constant state.
  *
  * Scale shape: sketch building is ONE partial-agg groupBy — partial
  * sketches combine map-side, so the shuffle carries one sketch per
  * (bucket × partition), never raw ids; rollups shuffle only
  * bucket-count × sketch-size bytes. No driver state, no collect.
  */
object Sketches {

  /** Per-bucket HLL sketches over `valueCol`: one row per bucket with a
    * `sketch` binary and its point `estimate` — the materialized base
    * cube a lakehouse would persist alongside the fact table. */
  def distinctSketch(df: DataFrame, bucketCols: Seq[Column],
                     valueCol: Column, lgK: Int): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /** Roll a sketch table up to a coarser grain: distinct estimates per
    * `rollupCols` from unions of the stored bucket sketches — the query
    * never touches raw data. */
  def rollupEstimate(sketches: DataFrame, rollupCols: Seq[Column]): DataFrame =
    sketches.groupBy(rollupCols: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("estimate"))

  /** Per-bucket KLL quantile sketches over `valueCol` — the percentile
    * counterpart of [[distinctSketch]]. Spark's own `percentile_approx`
    * state cannot be persisted or re-merged, so it can't back a
    * percentile cube; the serialized KLL `qsketch` can (DataSketches
    * KLL via [[org.apache.spark.sql.graftx.KllSketch]]; rank error
    * ≈ 1.65%·(200/k)^0.9 at 99% confidence). Same scale shape as the
    * HLL cube: one partial-agg groupBy, the shuffle carries sketches,
    * never raw values. */
  def quantileSketch(df: DataFrame, bucketCols: Seq[Column],
                     valueCol: Column, k: Int = 200): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(org.apache.spark.sql.graftx.KllSketch
        .sketchAgg(valueCol, k).as("qsketch"))

  /** Per-bucket frequent-items (heavy-hitters) sketches over a string
    * column — the third leg of the sketch cube next to HLL distinct and
    * KLL quantiles ([[org.apache.spark.sql.graftx.FreqSketch]],
    * DataSketches frequencies). `maxMapSize` (power of two) bounds both
    * state (fixed bytes per bucket) and error (≈3.5·n/maxMapSize). The
    * shuffle carries fixed-size summaries, never token streams. */
  def freqSketch(df: DataFrame, bucketCols: Seq[Column],
                 valueCol: Column, maxMapSize: Int = 64): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(org.apache.spark.sql.graftx.FreqSketch
        .sketchAgg(valueCol, maxMapSize).as("fsketch"))

  /** Heavy hitters at a coarser grain from unions of the stored bucket
    * sketches — never rescans raw data. Emits the sorted item array
    * whose frequency LOWER bound clears `minFraction` of the merged
    * stream (NO_FALSE_POSITIVES): every item truly above
    * minFraction + error is guaranteed present, everything truly below
    * minFraction guaranteed absent, so with separated hitters the set
    * is deterministic under any merge order. */
  def rollupHeavyHitters(sketches: DataFrame, rollupCols: Seq[Column],
                         minFraction: Double, maxMapSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftx.FreqSketch
    sketches.groupBy(rollupCols: _*)
      .agg(FreqSketch.unionAgg(col("fsketch"), maxMapSize).as("__merged"))
      .select(rollupCols ++ Seq(FreqSketch.heavyHitters(col("__merged"),
        floor(FreqSketch.streamLength(col("__merged")) * minFraction)
          .cast("long")).as("heavy")): _*)
  }

  /** Quantile estimates at a coarser grain from unions of the stored
    * bucket sketches — never rescans raw data. One `estimate` column
    * per requested quantile `p`, named `q<100p>` (q50, q95, ...). */
  def rollupQuantiles(sketches: DataFrame, rollupCols: Seq[Column],
                      ps: Seq[Double], k: Int = 200): DataFrame = {
    import org.apache.spark.sql.graftx.KllSketch
    sketches.groupBy(rollupCols: _*)
      .agg(KllSketch.unionAgg(col("qsketch"), k).as("__merged"))
      .select(rollupCols ++ ps.map(p =>
        KllSketch.quantile(col("__merged"), lit(p))
          .as(s"q${(p * 100).round}")): _*)
  }
}
