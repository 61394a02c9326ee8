package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (corpus mixing,
  * per-source quotas). All hash-threshold based: a row is kept iff
  * `hash(id) mod D < rate·D` — reproducible across runs, engines, and
  * cluster sizes (no RNG state, no partition sensitivity), and a pure
  * narrow filter at any scale. The hash is the md5-prefix construction
  * shared with the minhash family so the SQL oracle replays it exactly.
  */
object Sampling {

  private val Denominator = 10000L

  /** Uniform keep-hash in [0, 10000) from the row id. */
  def keepHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") % Denominator

  /** Deterministic uniform sample: keep ~`rate` of rows. */
  def uniformSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(keepHash(col(idCol)) < (rate * Denominator).toLong)

  /** Deterministic stratified sample: per-stratum keep rates (corpus
    * mixing weights), default rate for unlisted strata. One narrow
    * filter — no shuffle, no driver round-trip, any scale. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Denominator).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * Denominator).toLong)).otherwise(acc)
    }
    df.filter(keepHash(col(idCol)) < threshold)
  }
}
