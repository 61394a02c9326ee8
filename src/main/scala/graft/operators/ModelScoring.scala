package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Batch ML model scoring (SURVEY §2.9): the reference applies two
  * trained models row-at-a-time — a sklearn KNN genome classifier
  * (lib/KBDatalakeApps/utils.py:147-161) and a CatBoost phenotype
  * predictor (berdl/berdl/prediction/phenotype.py:20-32). Both
  * surfaces re-expressed as broadcast-model batch operators:
  *
  *  - `knnPredict`: the training set (model "parameters" of a KNN) is
  *    a small DataFrame, broadcast; prediction is one broadcast join +
  *    per-row top-k window + majority vote. Nothing about the 100 TB
  *    scoring side ever shuffles on a model key — the only wide op is
  *    the per-query window, partitioned by the scored row's own id.
  *  - `linearScore`: a parametric model (weights, bias) inlined as a
  *    literal array — the plan is pure codegen (dot product + sigmoid),
  *    no UDF, no per-row Python. A gradient-boosted model would ship
  *    its trees the same way (broadcast handle + mapPartitions, see
  *    Multimodal.extractFeatures for that shape); the linear stub keeps
  *    the oracle able to reproduce scores exactly.
  */
object ModelScoring {

  /** k-NN classification of `data` against a broadcast labeled
    * training set: cosine similarity, top-k neighbors, majority vote
    * (ties → smallest label, matching sklearn's deterministic
    * tie-break by training order when labels sort that way). */
  def knnPredict(data: DataFrame, train: DataFrame, idCol: String,
                 vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = data.select(col(idCol), col(vecCol).as("__qv"))
      .withColumn("__qn", VectorOps.norm(col("__qv")))
    val t = train.select(col(vecCol).as("__tv"), col(labelCol).as("__label"))
      .withColumn("__tn", VectorOps.norm(col("__tv")))
    val scored = q.join(broadcast(t))
      .withColumn("__cos",
        VectorOps.dot(col("__qv"), col("__tv")) / (col("__qn") * col("__tn")))
    val wTop = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("__label").asc)
    val topK = scored.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= k)
    val votes = topK.groupBy(col(idCol), col("__label"))
      .agg(count(lit(1)).as("__votes"))
    val wVote = Window.partitionBy(col(idCol))
      .orderBy(col("__votes").desc, col("__label").asc)
    votes.withColumn("__vr", row_number().over(wVote))
      .filter(col("__vr") === 1)
      .select(col(idCol), col("__label").as("predicted_label"))
  }

  /** Logistic-linear scoring with literal weights: sigmoid(w·x + b).
    * The whole scorer lives inside whole-stage codegen. */
  def linearScore(vec: Column, weights: Seq[Double], bias: Double): Column = {
    val w = array(weights.map(lit): _*)
    val z = VectorOps.dot(vec, w) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
