package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus substring search via a character-trigram posting index — the
  * code-search pattern (find every document containing an arbitrary
  * literal string) that backs contamination hunts, PII audits and
  * canary lookups over a training corpus.
  *
  * Exactness: a document containing the pattern necessarily contains
  * EVERY trigram of the pattern, so requiring all pattern trigrams in
  * a doc's posting rows is a lossless candidate filter; the final
  * `contains` verification removes coincidental co-occurrence. Results
  * are therefore EXACTLY `filter(contains(text, pattern))` — the index
  * only changes the cost.
  *
  * Scale shape: the index build is one explode + distinct (hash
  * shuffle on trigram); a search touches the posting rows of the
  * pattern's trigrams only — never the corpus — and the verify join
  * fetches candidate docs by id. Hot trigrams ("th ", "he ") have long
  * posting lists, but a search intersects ALL its trigrams, so the
  * candidate count is bounded by the pattern's RAREST trigram; the
  * groupBy(doc) that counts matched trigrams shuffles candidate-sized
  * data, not corpus-sized.
  */
object GrepIndex {

  /** Distinct character trigrams of `text` as an array column
    * (positions 1..len-2; empty for texts shorter than 3). */
  def trigramsOf(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(
        sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** (id, trigram) posting table over the corpus. The explode fans a
    * ~300× row expansion out of the scan — rebalance first when the
    * scan is under-parallel ([[Relational.computeRebalance]] gates it). */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Relational.computeRebalance(df)
      .select(col(idCol), explode(trigramsOf(col(textCol))).as("trigram"))

  /** Exact substring search: all ids whose text contains `pattern`,
    * resolved through the posting index + a verify fetch. Patterns
    * shorter than 3 chars cannot use the index — they fall back to the
    * direct scan (still exact, documented cost). */
  def search(index: DataFrame, docs: DataFrame, idCol: String,
             textCol: String, pattern: String): DataFrame = {
    require(pattern.nonEmpty, "empty pattern")
    if (pattern.length < 3)
      return docs.filter(col(textCol).contains(pattern)).select(col(idCol))
    val pats = pattern.sliding(3).toSeq.distinct
    val candidates = index
      .filter(col("trigram").isin(pats: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("trigram")).as("__hit"))
      .filter(col("__hit") === pats.size)
      .select(col(idCol))
    candidates.join(docs, Seq(idCol))
      .filter(col(textCol).contains(pattern))
      .select(col(idCol))
  }
}
