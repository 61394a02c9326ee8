package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Stage 4 — phenotype / model table assembly (reference:
  * lib/KBDatalakeApps/KBDatalakeUtils.py:349-1288). The FBA/phenosim
  * numeric compute is external; these are the dataframe assemblies that
  * follow it.
  */
object PhenotypeTables {

  /** Per-genome confusion-matrix summary (reference: KBDatalakeUtils.py:
    * 579-623): CP/CN/FP/FN counts and accuracy = (cp+cn)/total. */
  def confusionSummary(phenosim: DataFrame): DataFrame = {
    def n(cls: String) = sum(when(col("class") === cls, 1).otherwise(0))
    phenosim.groupBy(col("genome_id"))
      .agg(n("CP").as("cp"), n("CN").as("cn"), n("FP").as("fp"), n("FN").as("fn"),
        count(lit(1)).as("total"))
      .withColumn("accuracy",
        (col("cp") + col("cn")).cast("double") / col("total").cast("double"))
  }

  /** Most-constrained FVA class per gene over its reactions (reference:
    * KBDatalakeUtils.py:1113-1147): essential > variable > blocked. */
  def geneFvaClass(rxnClasses: DataFrame): DataFrame =
    Relational.priorityMax(rxnClasses, Seq("gene_id"), "fva_class",
      Seq("blocked" -> 1, "variable" -> 2, "essential" -> 3), as = "gene_class")

  /** Gene flux = max(|flux|) over its reactions (reference:
    * KBDatalakeUtils.py:1106-1146). */
  def geneFlux(rxnFluxes: DataFrame): DataFrame =
    rxnFluxes.groupBy(col("gene_id")).agg(max(abs(col("flux"))).as("gene_flux"))

  /** Gene-phenotype accumulation from several evidence sources
    * (reference gene_pheno_map merge: KBDatalakeUtils.py:648-801):
    * union with provenance, then per (gene, compound) collect the
    * source set (sorted, ';'-joined at the edge) and flux stats. */
  def genePhenotypes(sources: Seq[(DataFrame, String)]): DataFrame = {
    val tagged = sources.map { case (df, src) =>
      df.select(col("gene_id"), col("compound"), col("flux"),
        lit(src).as("source"))
    }
    tagged.reduce(_.unionByName(_))
      .groupBy(col("gene_id"), col("compound"))
      .agg(Relational.sortedSetJoin(col("source"), ";").as("sources"),
        max(abs(col("flux"))).as("max_abs_flux"), count(lit(1)).as("n"))
  }

  /** Reaction directionality from bounds (reference: KBDatalakeUtils.py:
    * 1063-1072). */
  def directionality(df: DataFrame, lb: String, ub: String): DataFrame =
    df.withColumn("direction",
      when(col(lb) < 0 && col(ub) > 0, lit("reversible"))
        .when(col(ub) > 0, lit("forward"))
        .when(col(lb) < 0, lit("reverse"))
        .otherwise(lit("blocked")))
}
