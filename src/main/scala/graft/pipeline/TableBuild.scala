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

  /** Static ontology-prefix descriptions (reference:
    * KBDatalakeUtils.py:2663-2672 — a hardcoded dictionary). */
  val ontologyPrefixDescriptions: Seq[(String, String)] = Seq(
    "GO" -> "Gene Ontology - standardized vocabulary for gene and protein functions",
    "EC" -> "Enzyme Commission numbers - classification of enzymes by reaction type",
    "SO" -> "Sequence Ontology - vocabulary for sequence features",
    "PFAM" -> "Protein Families database - protein domain families",
    "KEGG" -> "KEGG Orthologs - ortholog groups linking genes across species",
    "COG" -> "Clusters of Orthologous Groups - protein functional categories",
    "seed.role" -> "SEED Role Ontology - functional roles from RAST annotation",
    "seed.reaction" -> "SEED Reaction Ontology - biochemical reactions from ModelSEED")

  /** `ontology_relationships` dimension table from the RDF triple store
    * (reference: KBDatalakeUtils.py:2466-2520): keep only the relevant
    * predicates on known term subjects, drop self-referential edges and
    * blank-node objects, drop the EC/SO subClassOf parent hierarchy,
    * relabel predicates to their short names, dedup.
    *
    * `termIds` is the (small) known-term dimension — broadcast semi
    * join, so the triple store side never shuffles. */
  def ontologyRelationships(statements: DataFrame, termIds: DataFrame): DataFrame = {
    val predicateLabels = Map(
      "rdfs:subClassOf" -> "is_a",
      "<https://modelseed.org/ontology/enables_reaction>" -> "enables_reaction")
    val labelExpr = predicateLabels.foldLeft(col("predicate")) {
      case (acc, (raw, short)) => when(col("predicate") === raw, short).otherwise(acc)
    }
    statements
      .filter(col("predicate").isin(predicateLabels.keys.toSeq: _*))
      .join(broadcast(termIds.select(col(termIds.columns.head).as("__tid"))),
        col("subject") === col("__tid"), "left_semi")
      .filter(col("subject") =!= col("object"))
      .filter(!col("object").startsWith("_:"))
      .filter(!(col("predicate") === "rdfs:subClassOf" &&
        (col("subject").startsWith("EC:") || col("subject").startsWith("SO:"))))
      .select(col("subject"), labelExpr.as("predicate"), col("object"))
      .distinct()
  }

  /** `ontology_definitions` dimension table: the static prefix
    * descriptions restricted to prefixes actually present in the term
    * table (reference: KBDatalakeUtils.py:2674-2690). */
  def ontologyDefinitions(terms: DataFrame, prefixCol: String = "ontology_prefix"): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val defs = ontologyPrefixDescriptions.toDF("ontology_prefix", "definition")
    defs.join(broadcast(terms.select(col(prefixCol).as("ontology_prefix")).distinct()),
      Seq("ontology_prefix"), "left_semi")
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
