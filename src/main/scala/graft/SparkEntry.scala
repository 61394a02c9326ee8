package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2), one entry per
  * operator, each paired with DuckDB oracle SQL in `oracleSql` (same
  * column names both sides; computed doubles rounded identically).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multiway star join + grouped aggregation (SURVEY J4/A3). */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.queries("j4_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++
      JoinQueries.queries ++
      AggQueries.queries ++
      WindowSetQueries.queries ++
      ScalarQueries.queries ++
      ServeQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      CleaningQueries.queries ++
      VectorQueries.queries ++
      IngestQueries.queries ++
      OntologyQueries.queries ++
      MLQueries.queries ++
      MergeQueries.queries ++
      TableQueries.queries ++
      AnalyticsQueries.queries ++
      GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++
      JoinQueries.oracles ++
      AggQueries.oracles ++
      WindowSetQueries.oracles ++
      ScalarQueries.oracles ++
      ServeQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      CleaningQueries.oracles ++
      VectorQueries.oracles ++
      IngestQueries.oracles ++
      OntologyQueries.oracles ++
      MLQueries.oracles ++
      MergeQueries.oracles ++
      TableQueries.oracles ++
      AnalyticsQueries.oracles ++
      GraphQueries.oracles
}
