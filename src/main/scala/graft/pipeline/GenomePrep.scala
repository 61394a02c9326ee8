package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Stage 1 — genome prep (reference: berdl/berdl/prep_genome_set.py).
  *
  * Consumes the ANI search tool's typed TSV output (the external
  * `skani` run is a pipeline boundary; SURVEY §2.9) and produces the
  * clade assignment the rest of the pipeline fans out on.
  */
object GenomePrep {

  /** Reshape raw ANI tool output into the pipeline's pair table
    * (reference ani_transform: prep_genome_set.py:101-126): file paths
    * → genome ids (basename, extension stripped), typed float columns
    * kept, self-pairs dropped. */
  def aniTransform(skaniOut: DataFrame): DataFrame = {
    def pathToId(c: String) =
      regexp_replace(element_at(split(col(c), "/"), -1), "\\.(fna|fa|fasta)$", "")
    skaniOut.select(
      pathToId("query_file").as("query_genome"),
      pathToId("ref_file").as("ref_genome"),
      col("ani").cast("double").as("ani"),
      col("align_fraction_ref").cast("double").as("af_ref"),
      col("align_fraction_query").cast("double").as("af_query"))
      .filter(col("query_genome") =!= col("ref_genome"))
  }

  /** GTDB accession normalization (reference: prep_genome_set.py:92-98):
    * `GCA_*` → `GB_GCA_*`, `GCF_*` → `RS_GCF_*`, others unchanged. */
  def gtdbAccession(df: DataFrame, idCol: String, as: String): DataFrame =
    df.withColumn(as,
      when(col(idCol).startsWith("GCA_"), concat(lit("GB_"), col(idCol)))
        .when(col(idCol).startsWith("GCF_"), concat(lit("RS_"), col(idCol)))
        .otherwise(col(idCol)))

  /** Arg-max clade assignment (reference match_top_clade:
    * prep_genome_set.py:160-169): per query genome keep the highest-ANI
    * reference hit (ties break on ref id for determinism), then attach
    * its clade. The clade map is a small dimension — broadcast. */
  def matchTopClade(aniPairs: DataFrame, cladeMap: DataFrame): DataFrame = {
    val top = Relational.topKPerGroup(aniPairs, Seq("query_genome"),
      Seq(col("ani").desc, col("ref_genome").asc), k = 1)
    top.join(broadcast(cladeMap), top("ref_genome") === cladeMap("genome_id"), "left")
      .select(top("query_genome"), top("ref_genome"), top("ani"),
        cladeMap("clade_id"))
  }
}
