package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling utilities.
  *
  * A grouping key with a handful of dominant values defeats naive
  * hash-partitioned aggregation at scale: the partition owning the hot
  * key does all the work while the rest of the cluster idles (and
  * spills). The standard fixes are (1) two-phase salted aggregation for
  * algebraic aggregates and (2) measuring the skew before it bites.
  *
  * Note Spark already map-side-combines algebraic aggregates (partial
  * HashAggregate before the exchange), which handles MOST skew for
  * plain counts/sums; explicit salting remains the tool for the cases
  * partial-agg can't save: high-cardinality-input aggregates
  * (collect_*, count-distinct partials, percentile state) where the
  * per-group partial state is itself huge, and skewed JOIN sides
  * (handled at runtime by AQE skew-join, or manually by replicating the
  * dim side per salt). `saltedAggregate` exists for exactly those
  * shapes, with an oracle query pinning that the two-phase rewrite is
  * semantics-preserving.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 groups by (key, salt) so a
    * hot key's rows spread over `salts` reducers; phase 2 merges the
    * per-salt partials. The caller supplies the salt derivation and
    * per-phase aggregate columns — phase-2 must be the merge of
    * phase-1's outputs (e.g. phase 1 `count -> n`, phase 2 `sum(n)`),
    * which is exactly the algebraic-merge property that makes salting
    * legal. For count-distinct, salt by `pmod(hash(distinctCol), s)`:
    * each distinct value then lands in exactly ONE salt bucket, so the
    * per-bucket distinct counts sum exactly — the scalable exact
    * count-distinct for hot groups.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltCol: Column,
                      phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val partial = df.withColumn("__salt", saltCol)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Key-skew diagnosis for a prospective join/group key: top-`k` keys
    * by frequency with their corpus share, plus the mean-share multiple
    * (`x_mean` = how many times an average key's row count this key
    * carries — the number that predicts the straggler). One groupBy +
    * a tiny global-stats pass over the per-key frame.
    */
  def report(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    // Materialize the per-key frame once: the top-k branch and the
    // totals branch both consume it, and Catalyst does not CSE across
    // plan branches — without this the full input is scanned and
    // aggregated TWICE (the same defect class as the round-4 TfIdf
    // double-tokenize).
    val perKey = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // Global top-k compiles to TakeOrderedAndProject (per-partition
    // heaps + driver merge of k rows), NOT a single-partition sort of
    // the whole key frame — billions of distinct keys stay distributed.
    val topk = perKey.orderBy(col("n").desc, col("key")).limit(k)
    // 1-row totals frame, broadcast onto the k winners.
    val totals = perKey.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__nkeys"))
    topk.crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        graft.queries.round4(col("n").cast("double") / col("__total")).as("share"),
        graft.queries.round4(
          col("n").cast("double") * col("__nkeys") / col("__total")).as("x_mean"))
  }
}
