package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus profiling — the "data card" numbers every training-data
  * pipeline reports before a corpus ships: per-group document / token /
  * character counts, exact length quantiles, and the exact-duplicate
  * rate.
  *
  * Scale shape: ONE partial-agg groupBy. The map side reduces every
  * document to a handful of scalars (token count, char count, content
  * hash) inside the scan's projection, so the exchange carries per-group
  * partial states only. The exact quantiles use Spark's counts-map
  * `percentile` — memory is bounded by the number of DISTINCT lengths
  * per group (thousands), not the number of documents (billions), so
  * exactness survives 100 TB. The duplicate rate is a count-distinct on
  * the 16-byte content hash — the one genuinely corpus-sized state, and
  * the same two-phase distinct aggregation every engine pays for it.
  */
object Profiling {

  def corpusProfile(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(groupCol), TextAnalysis.tokenCount(t).as("__ntok"),
        length(t).as("__nchars"), md5(t).as("__h"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__ntok")).cast("bigint").as("n_tokens"),
        sum(col("__nchars")).cast("bigint").as("n_chars"),
        min(col("__nchars")).as("len_min"),
        percentile(col("__nchars"), lit(0.25)).as("len_p25"),
        percentile(col("__nchars"), lit(0.5)).as("len_p50"),
        percentile(col("__nchars"), lit(0.75)).as("len_p75"),
        max(col("__nchars")).as("len_max"),
        countDistinct(col("__h")).as("n_distinct"),
        ((count(lit(1)) - countDistinct(col("__h"))).cast("double") /
          count(lit(1)).cast("double")).as("dup_rate"))
  }
}
