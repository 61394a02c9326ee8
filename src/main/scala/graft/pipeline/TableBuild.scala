package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Stage 5 — final table generation (reference:
  * berdl/berdl/tables/datalake_table.py + ontology tables
  * KBDatalakeUtils.py:2169-2740). Everything here is pure dataframe
  * work; each output table writes as Parquet partitioned by clade so
  * the serving layer's clade-equality scans prune partitions.
  */
object TableBuild {

  /** ANI table from several JSON-derived sources with the reference's
    * first-wins conflict policy, source order = priority
    * (datalake_table.py:216-257: kepangenomes → fitness → phenotypes →
    * members). */
  def aniMerge(sources: Seq[DataFrame]): DataFrame =
    Relational.firstWinsMerge(sources, Seq("genome1_id", "genome2_id"),
      tieBreak = Seq(col("ani")))

  /** Ontology long→wide pivot: one `ontology_<TERM>` column per term
    * discovered in the data, cells = sorted `'; '`-joined values
    * (reference two-pass term scan + per-row dict build:
    * datalake_table.py:310-366). */
  def ontologyPivot(annotations: DataFrame, maxTerms: Int = 1000): DataFrame = {
    val prefixed = annotations.withColumn("__term",
      concat(lit("ontology_"), col("term")))
    Relational.dynamicPivot(prefixed, Seq("feature_id"), "__term",
      concat_ws("; ", array_sort(collect_set(col("value")))), maxTerms)
  }

  /** RDF statements → term dimension tables (reference:
    * KBDatalakeUtils.py:2367-2552): filter the triple store to the
    * wanted subjects/predicates, pivot predicate → column. */
  def ontologyTerms(statements: DataFrame, predicates: Seq[String],
                    maxSubjects: Int = 100000): DataFrame = {
    val filtered = statements.filter(col("predicate").isin(predicates: _*))
    Relational.dynamicPivot(filtered, Seq("subject"), "predicate",
      concat_ws("; ", array_sort(collect_set(col("value")))), maxSubjects)
  }

  /** Render array-typed multi-value columns to the reference's
    * `'; '`-joined serving format at the very edge (SURVEY §1.2). */
  def renderMultiValue(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, concat_ws("; ", array_sort(col(c))))
    }

  /** Clade-partitioned Parquet sink: the physical layout that turns the
    * serving layer's clade-equality filters (SURVEY F1) into partition
    * pruning at 100 TB. */
  def writeCladePartitioned(df: DataFrame, path: String,
                            cladeCol: String = "clade_id"): Unit =
    df.write.mode("overwrite").partitionBy(cladeCol).parquet(path)
}
