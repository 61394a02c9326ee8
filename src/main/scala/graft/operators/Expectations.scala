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
}
