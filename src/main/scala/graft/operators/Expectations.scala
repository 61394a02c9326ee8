package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ/Great-Expectations
  * style): a suite of named checks — completeness, uniqueness, bounds,
  * value-set conformance, size — evaluated against a frame, producing
  * one (check, metric, passed) verdict row per check.
  *
  * Scale shape: ALL metrics are computed in a SINGLE aggregation pass —
  * one `df.agg(...)` with every metric as a column — so a 50-check suite
  * over 100 TB costs exactly one scan + one partial-agg reduce to a
  * single row (count-distinct metrics expand to the standard two-phase
  * distinct aggregate; everything else is a map-side-combined scalar).
  * The verdict explode happens on that one-row frame, driver-trivial.
  */
object Expectations {

  /** One named check: an aggregate metric and a pass predicate over the
    * (double-cast) metric value. */
  final case class Expectation(name: String, metric: Column,
                               pass: Column => Column)

  /** Completeness: fraction of non-null values in a column. */
  def completeness(c: Column): Column =
    avg(c.isNotNull.cast("double"))

  /** Uniqueness: distinct-to-total ratio (1.0 = key candidate). */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast("double") / count(lit(1))

  /** Conformance: fraction of values inside the accepted set. */
  def inSet(c: Column, accepted: Seq[String]): Column =
    avg(c.isin(accepted: _*).cast("double"))

  /** Attach the suite as OBSERVED metrics: the checks piggyback on
    * whatever job next materializes `df` — zero additional scans, even
    * at 100 TB — and the metric row is delivered asynchronously to a
    * QueryExecutionListener (batch) or per micro-batch in
    * `StreamingQueryProgress.observedMetrics` (streaming). This is the
    * production instrumentation mode: [[run]] answers "audit this table
    * now" with its own pass; `observed` answers "measure every batch of
    * the pipeline I am already running" for free.
    *
    * Metric columns are named `<name>__metric`; read them back with
    * [[verdicts]]. Constraint inherited from `observe`: metrics must be
    * non-distinct aggregates (so [[uniqueness]] belongs to [[run]],
    * not the observed path). */
  def observed(df: DataFrame, observationName: String,
               checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val metricCols = observedMetricCols(checks)
    df.observe(observationName, metricCols.head, metricCols.tail: _*)
  }

  /** [[observed]] with a handle for synchronous batch readback
    * (`obs.get` blocks until the consuming action finishes). */
  def observed(df: DataFrame, obs: org.apache.spark.sql.Observation,
               checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val metricCols = observedMetricCols(checks)
    df.observe(obs, metricCols.head, metricCols.tail: _*)
  }

  private def observedMetricCols(checks: Seq[Expectation]): Seq[Column] =
    checks.map(c => c.metric.cast("double").as(s"${c.name}__metric"))

  /** Turn an observation's metric map (`Observation.get`, a streaming
    * progress's `observedMetrics` row via `getValuesMap`, or a
    * QueryExecutionListener row) into (check_name, metric, passed)
    * verdicts. */
  def verdicts(metrics: Map[String, Any],
               checks: Seq[Expectation]): Seq[(String, Double, Boolean)] =
    checks.map { c =>
      val m = metrics.get(s"${c.name}__metric") match {
        case Some(d: Double) => d
        case Some(n: Number) => n.doubleValue()
        case _ => Double.NaN
      }
      // evaluate the pass predicate on a literal via a 1-row local frame
      (c.name, m, m == m && passOnValue(c, m))
    }

  private def passOnValue(c: Expectation, m: Double): Boolean = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.range(1).select(c.pass(lit(m)).as("p")).head().getBoolean(0)
  }

  /** Evaluate the suite in one pass. Output columns:
    * check_name (string), metric (double), passed (boolean). */
  def run(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val metricCols = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("double").as(s"__m$i")
    }
    val oneRow = df.agg(metricCols.head, metricCols.tail: _*)
    val verdicts = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__m$i").as("metric"),
        c.pass(col(s"__m$i")).as("passed"))
    }
    oneRow.select(explode(array(verdicts: _*)).as("__v")).select(col("__v.*"))
  }

  /** Cross-table referential integrity — the expectation dimension the
    * single-table suite can't express: child rows whose key has no
    * parent (orphans), plus the coverage fraction. One left-anti-
    * shaped aggregation: the child shuffles on the key once, the
    * parent reduces to its distinct keys first (partial-agg), and a
    * dimension-sized parent broadcasts. Null child keys count as
    * orphans only when `nullIsOrphan` (SQL FK semantics say no). */
  def referential(child: DataFrame, parent: DataFrame,
                  childKey: Column, parentKey: Column,
                  nullIsOrphan: Boolean = false): DataFrame = {
    val p = Relational.broadcastIfSmall(
      parent.select(parentKey.as("__pk")).distinct()
        .withColumn("__hit", lit(true)))
    child.select(childKey.as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__hit").isNull &&
          (lit(nullIsOrphan) || col("__ck").isNotNull), 1L).otherwise(0L))
          .as("n_orphans"))
      .select(col("n_child"), col("n_orphans"),
        (floor((col("n_child") - col("n_orphans")).cast("double")
          / col("n_child") * 10000 + lit(0.5)) / 10000).as("coverage"))
  }

  /** Benford first-digit law expectation — organic multi-scale
    * magnitudes follow P(d) = log10(1 + 1/d); fabricated or
    * synthetically generated numeric columns usually don't, which
    * makes the per-digit chi-square decomposition a cheap
    * machine-generated-table screen for a data-curation pipeline.
    * `centsOf` must map the value to a POSITIVE integer magnitude
    * (e.g. `floor(x*100 + 0.5)` for 2-decimal money); the first digit
    * comes from the INTEGER's decimal rendering — never from float
    * formatting, which differs across engines. Returns one row per
    * digit 1..9: (digit, n_obs, expected, chi_contrib) where expected
    * = n·P(d) and chi_contrib = (n_obs − expected)²/expected — all
    * fixed-shape IEEE on exact integer counts and shared decimal
    * literals, so the oracle compares bit-for-bit. One partial-agg
    * groupBy over 9 keys; the digit domain frame is literal-sized. */
  def benford(df: DataFrame, centsOf: Column): DataFrame = {
    val digits = BenfordP.zipWithIndex
      .map { case (p, i) => (i + 1, p) }
    val spark = df.sparkSession
    import spark.implicits._
    val dom = digits.toDF("digit", "p")
    val obs = df.select(centsOf.cast("long").as("__m"))
      .filter(col("__m") > 0)
      .select(substring(col("__m").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .localCheckpoint() // feeds the total AND the per-digit join
    val total = obs.agg(sum(col("n_obs")).as("__n"))
    dom.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        (col("__n").cast("double") * col("p")).as("expected"),
        (((coalesce(col("n_obs"), lit(0L)).cast("double") -
          col("__n").cast("double") * col("p")) *
          (coalesce(col("n_obs"), lit(0L)).cast("double") -
            col("__n").cast("double") * col("p"))) /
          (col("__n").cast("double") * col("p"))).as("chi_contrib"))
  }

  /** log10(1 + 1/d), d = 1..9 — the digit-law masses; the oracle SQL
    * embeds the SAME decimal literals so both engines compute from
    * identical doubles. */
  private[graft] val BenfordP: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
}
