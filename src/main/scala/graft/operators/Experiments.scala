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

  /** Two-sample Kolmogorov–Smirnov statistic — the DISTRIBUTION-drift
    * companion to [[welchTTest]]'s mean test (a corpus whose mean
    * holds can still shift shape; KS is what drift gates quote for
    * "did this feature's distribution move"). D = max over the merged
    * value domain of |CDF_a − CDF_b|, computed EXACTLY: per-value
    * counts for both groups in one pass, cumulative counts over the
    * DISTINCT-value table (the score_percentile window shape — V
    * rows, explicit single-partition key, never corpus rows), and the
    * max taken on the INTEGER numerator |cumA·n_b − cumB·n_a| so no
    * float rounding touches the argmax; the closing ks division is
    * one fixed-shape IEEE op. Integer-exact while n_a·n_b < 2⁶³
    * (~3·10⁹ rows per side) — beyond that the Long numerator would
    * silently wrap (non-ANSI), so the plan carries a raise_error
    * guard on n_a·n_b and FAILS LOUDLY at the documented boundary
    * instead: sample or pre-bin and re-run. `overflowBound` is
    * injectable only so the guard is testable without 3·10⁹ rows.
    * Returns one row (n_a, n_b, d_num, ks). */
  def ksTest(df: DataFrame, groupCol: Column, valueCol: Column,
             groupA: String, groupB: String,
             overflowBound: Double = Relational.ExactIntegerBound): DataFrame = {
    val pv = df.select(groupCol.as("g"), valueCol.as("v"))
      .filter(col("v").isNotNull && col("g").isin(groupA, groupB))
      .groupBy(col("v")).agg(
        sum(when(col("g") === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === groupB, 1L).otherwise(0L)).as("cb"))
    // NOT fused like the per-group distinct-value ops: this window is
    // GLOBAL (single-partition), so a second unbounded-frame window
    // would buffer V rows again serially in the one window task, while
    // the checkpoint + 1-row cross join computes the totals in the
    // PARALLEL aggregation — measured 0.9 vs 1.3 s at sf0.1.
    val pvc = pv.localCheckpoint() // feeds the window AND the totals
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(Relational.singlePartitionKey())
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pvc.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    pvc.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
        .as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a").cast("double") * col("n_b").cast("double") >=
          lit(overflowBound),
          raise_error(concat(lit("ksTest: n_a*n_b = "),
            col("n_a"), lit("*"), col("n_b"),
            lit(" exceeds the exact-integer bound — the Long "),
            lit("numerator would wrap; sample or pre-bin first"))))
          .otherwise(col("d_num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks"))
  }

  /** Chi-square test of independence between two categorical columns
    * — "did these two labels decouple" for segment×behavior drift and
    * the categorical sibling of [[ksTest]]. One partial-agg counting
    * pass over (a, b); margins reduce from the cell table (domain-
    * sized, broadcast); expected = rowN·colN/n and the per-cell
    * contribution (obs − exp)²/exp are fixed-shape IEEE on exact
    * integer counts — bit-exact, no grid. Returns one row per
    * observed cell: (a, b, n_obs, expected, chi_contrib); the global
    * statistic is the caller's sum (kept per-cell here so the
    * differential gate compares the full decomposition). */
  def chi2Independence(df: DataFrame, aCol: Column,
                       bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("a"), bCol.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_obs"))
      .localCheckpoint() // feeds margins AND the output join
    val rowN = cells.groupBy(col("a")).agg(sum(col("n_obs")).as("an"))
    val colN = cells.groupBy(col("b")).agg(sum(col("n_obs")).as("bn"))
    val n = cells.agg(sum(col("n_obs")).as("n"))
    val exp = (col("an").cast("double") * col("bn").cast("double")) /
      col("n").cast("double")
    cells.join(broadcast(rowN), Seq("a"))
      .join(broadcast(colN), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("n_obs"), exp.as("expected"),
        (((col("n_obs").cast("double") - exp) *
          (col("n_obs").cast("double") - exp)) / exp).as("chi_contrib"))
  }

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
