package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment-analysis primitives: deterministic assignment plus the
  * two-sample statistics an A/B readout needs.
  *
  * Scale shape: assignment is a narrow hash expression (no RNG state,
  * stable across runs/engines — the same md5-bucket construction as
  * `Sampling`); the whole readout is ONE groupBy over
  * (metric-key, arm) computing count/sum/sum-of-squares partials —
  * map-side combined, tiny reduce — then a per-key fold of the two
  * arms' moments into Welch's t. Nothing driver-side, no second scan.
  */
object Experiments {

  /** Deterministic 50/50 arm assignment from a unit id. */
  def armOf(unitId: Column): Column =
    when(Sampling.keepHash(unitId) < 5000, lit("A")).otherwise(lit("B"))

  /** Welch's t-statistic readout per key: one row per key with both
    * arms' n/mean and the t value (mean difference over the combined
    * standard error; sample variance via the moments identity
    * (Σx² − (Σx)²/n) / (n−1), computed from the SAME single-pass
    * partials in any engine). */
  def welchTTest(df: DataFrame, keyCol: Column, armCol: Column,
                 metricCol: Column): DataFrame = {
    val perArm = df
      .groupBy(keyCol.as("key"), armCol.as("__arm"))
      .agg(count(lit(1)).as("__n"), sum(metricCol).as("__s"),
        sum(metricCol * metricCol).as("__s2"))
    def armAgg(arm: String, c: String, as: String) =
      max(when(col("__arm") === arm, col(c))).as(as)
    val wide = perArm.groupBy(col("key"))
      .agg(armAgg("A", "__n", "n_a"), armAgg("A", "__s", "s_a"),
        armAgg("A", "__s2", "s2_a"),
        armAgg("B", "__n", "n_b"), armAgg("B", "__s", "s_b"),
        armAgg("B", "__s2", "s2_b"))
    def mean(s: Column, n: Column) = s / n
    def variance(s: Column, s2: Column, n: Column) =
      (s2 - s * s / n) / (n - 1)
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (ma, mb) = (mean(col("s_a"), na), mean(col("s_b"), nb))
    val (va, vb) = (variance(col("s_a"), col("s2_a"), na),
      variance(col("s_b"), col("s2_b"), nb))
    wide.select(col("key"), col("n_a"), col("n_b"),
      ma.as("mean_a"), mb.as("mean_b"),
      ((ma - mb) / sqrt(va / na + vb / nb)).as("t_stat"))
  }
}
