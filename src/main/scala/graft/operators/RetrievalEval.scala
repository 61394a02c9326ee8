package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine ranked-retrieval evaluation — recall / MRR / average
  * precision of a candidate system (an ANN index, a hybrid retriever)
  * against exact ground truth, per query. The harness a pipeline runs
  * after every index rebuild to decide whether the approximate path is
  * still good enough to serve — here it grades the engine's own ANN
  * tier against its own brute-force baseline, both already
  * differentially gated.
  *
  * Cross-engine-exact without libm: the metrics deliberately avoid
  * log-discounted gains (NDCG's log2 would ride engine-specific libm
  * bits) — each precision-at-hit and reciprocal-rank term is a single
  * IEEE division quantized to the 2⁻³⁰ grid, so the ≤k per-query terms
  * are exact binary rationals whose sum is exactly representable and
  * order-independent; the closing divisions are fixed-shape IEEE on
  * identical inputs. Bit-identical across Spark partial aggregates and
  * the DuckDB oracle.
  *
  * Scale shape: one shuffle join of system against truth on
  * (query, doc), one qid-window whose partitions are bounded by the
  * system's own top-k (never corpus-sized), one per-query partial-agg,
  * and one query-set-sized left join to carry queries the system
  * returned nothing for (hits/mrr/ap = 0). Nothing collects.
  */
object RetrievalEval {

  private val Q = 1073741824.0 // 2^30
  private def q30(c: org.apache.spark.sql.Column) =
    floor(c * Q + lit(0.5)) / Q

  /** Per-query metrics of ranked `system` (query, doc, rank) against
    * `truth` (query, doc): (query_id, n_rel, hits, recall, mrr, ap)
    * with recall = hits/n_rel, mrr = q(1/first-hit-rank), ap =
    * Σ_hits q(cum-hits/rank) / n_rel. Truth queries missing from the
    * system score 0; system queries missing from truth are dropped
    * (no relevance set — nothing to grade against). */
  def rankMetrics(system: DataFrame, truth: DataFrame, queryCol: String,
                  docCol: String, rankCol: String): DataFrame = {
    val sys = system.select(col(queryCol).as("query_id"),
      col(docCol).as("doc"), col(rankCol).as("rank"))
    val tru = truth.select(col(queryCol).as("query_id"),
        col(docCol).as("doc")).distinct()
      .localCheckpoint() // feeds the relevance join AND the n_rel agg
    val nRel = tru.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val marked = sys
      .join(tru.withColumn("__rel", lit(1L)), Seq("query_id", "doc"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("__rel"), lit(0L)).as("rel"))
    // per-query window: partitions bounded by the system's top-k.
    // The ROWS frame is pinned explicitly — Spark's default for an
    // ordered window is RANGE, which treats tied ranks as peers and
    // would diverge from the oracle's ROWS spelling if a caller ever
    // feeds rank()-style ties (ranks are expected unique per query).
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = marked.withColumn("cum", sum(col("rel")).over(w))
      .groupBy(col("query_id")).agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1L, col("rank"))).as("first_hit"),
        sum(when(col("rel") === 1L,
          q30(col("cum").cast("double") / col("rank").cast("double")))
          .otherwise(lit(0.0))).as("ap_num"))
    nRel.join(per, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("recall"),
        coalesce(q30(lit(1.0) / col("first_hit").cast("double")), lit(0.0))
          .as("mrr"),
        (coalesce(col("ap_num"), lit(0.0)) / col("n_rel").cast("double"))
          .as("ap"))
  }
}
