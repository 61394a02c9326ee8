package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Stage 3 — pangenome assembly (reference:
  * berdl/berdl/pangenome/pangenome.py). The MMseqs2 clustering run is a
  * pipeline boundary; its member TSV is the input here.
  */
object Pangenome {

  /** Core/accessory split (reference: build_berdl_db.py:553-556): a
    * cluster is core iff it contains every genome. */
  def coreGenes(members: DataFrame): DataFrame =
    Relational.coreFlag(members, "cluster_id", "genome_id")

  /** Extend reference clusters to user features by protein-hash
    * identity, then vote-count per feature and keep the majority
    * cluster (reference extend + vote: pangenome.py:303-332 — a user
    * gene hitting several clusters is assigned by argmax votes, ties on
    * cluster id). */
  def extendClusters(userFeatures: DataFrame, clusterMembers: DataFrame): DataFrame = {
    val votes = userFeatures.join(clusterMembers,
        userFeatures("protein_hash") === clusterMembers("member_hash"))
      .groupBy(userFeatures("feature_id"), clusterMembers("cluster_id"))
      .agg(count(lit(1)).as("votes"))
    Relational.topKPerGroup(votes, Seq("feature_id"),
      Seq(col("votes").desc, col("cluster_id").asc), k = 1)
  }

  /** Per-(feature, condition) fitness stats after attaching condition
    * metadata (reference: fitness.py:33-80 + KBDatalakeUtils.py:713-731
    * — inner merge on the composite key then max/min/mean/count). The
    * mapping is a small dimension: broadcast. */
  def fitnessStats(fitness: DataFrame, conditionMap: DataFrame): DataFrame =
    fitness.join(broadcast(conditionMap), Seq("fitness_genome_id", "set_id"))
      .groupBy(col("feature_id"), col("msid"))
      .agg(max(col("fit")).as("fit_max"), min(col("fit")).as("fit_min"),
        avg(col("fit")).as("fit_mean"), count(lit(1)).as("n"))

  /** Member ANI matrix slice for one genome (reference disjunctive
    * filter: query_pangenome_local.py:52-56). */
  def aniSlice(ani: DataFrame, genome: String): DataFrame =
    ani.filter(col("genome1_id") === genome || col("genome2_id") === genome)
}
