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
  * Cross-engine-exact without runtime libm: [[rankMetrics]] uses only
  * division-based terms (precision-at-hit, reciprocal rank), and
  * [[ndcgAtK]] gets its log2 discounts from a k-row constant table
  * computed once in Scala and interpolated verbatim into the oracle —
  * no query-time log in either engine. Every fractional term is
  * quantized to the 2⁻³⁰ grid, so the ≤k per-query terms are exact
  * binary rationals whose sum is exactly representable and
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
  /** The 2⁻³⁰-grid log2 discount table for ranks 1..k, and its prefix
    * sums (the ideal-DCG ladder). Computed ONCE in Scala and
    * interpolated verbatim into the oracle SQL (shortest-round-trip
    * toString parses back to the identical double), so no libm call
    * happens in either engine's query — the usual cross-engine log2
    * hazard is removed by construction, and the grid terms are exact
    * binary rationals whose sums are order-independent. */
  private[graft] def ndcgDiscounts(k: Int): (Seq[Double], Seq[Double]) = {
    val qd = (1 to k).map { r =>
      val d = 1.0 / (math.log(r + 1.0) / math.log(2.0))
      math.floor(d * Q + 0.5) / Q
    }
    (qd, qd.scanLeft(0.0)(_ + _).tail)
  }

  /** NDCG@k of ranked `system` against binary-relevance `truth`:
    * (query_id, n_rel, dcg, idcg, ndcg) per query, dcg =
    * Σ_hits disc(rank), idcg = Σ_{i≤min(k, n_rel)} disc(i), ndcg
    * their single-division ratio — a PERFECT ranking scores exactly
    * 1.0 (dcg and idcg are the same exact sum). Same shapes and
    * missing-query semantics as [[rankMetrics]]; the discount join is
    * a broadcast k-row table. */
  def ndcgAtK(system: DataFrame, truth: DataFrame, queryCol: String,
              docCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64)
    val (qd, ladder) = ndcgDiscounts(k)
    val spark = system.sparkSession
    import spark.implicits._
    val discDf = (1 to k).map(r => (r, qd(r - 1))).toDF("rank", "disc")
    val idcgDf = (1 to k).map(j => (j.toLong, ladder(j - 1)))
      .toDF("n_eff", "idcg")
    val sys = system.select(col(queryCol).as("query_id"),
        col(docCol).as("doc"), col(rankCol).as("rank"))
      .filter(col("rank") <= k)
    val tru = truth.select(col(queryCol).as("query_id"),
        col(docCol).as("doc")).distinct()
      .localCheckpoint() // feeds the relevance join AND the n_rel agg
    val dcg = sys
      .join(tru.withColumn("__rel", lit(1L)), Seq("query_id", "doc"),
        "left_semi")
      .join(broadcast(discDf), Seq("rank"))
      .groupBy(col("query_id")).agg(sum(col("disc")).as("dcg"))
    tru.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
      .withColumn("n_eff", least(col("n_rel"), lit(k.toLong)))
      .join(broadcast(idcgDf), Seq("n_eff"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"), col("idcg"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

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
