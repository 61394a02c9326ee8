package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining — pairwise A ⇒ B rules with
  * support / confidence / lift over co-occurrence baskets. In a
  * training-data pipeline this is the "docs containing X also contain
  * Y" co-occurrence miner (tag co-assignment, source co-membership,
  * entity co-mention) that backs data cards and mixture design; over
  * the fixture it reads classic co-purchase structure. A pipeline
  * addition beyond the reference surface (like the dedup/ANN tier).
  *
  * Scale shape — GUARD, then PRUNE, then PAIR. The `maxBasketItems`
  * guard drops degenerate mega-baskets FIRST, as a corpus
  * restriction (a basket holding half the catalog would otherwise
  * emit a quadratic pair burst — same role as the dedup tier's
  * hot-bucket caps), so every statistic downstream — pair counts,
  * item supports, the basket total N — is computed over the SAME
  * guarded basket universe and confidence/lift stay internally
  * consistent (scores are exact for the guarded corpus, not deflated
  * lower bounds of it). Then single-item supports are one partial-agg
  * groupBy over the guarded set, and only items meeting `minSupport`
  * re-enter the basket (semi join), so the per-basket pair fan-out is
  * C(frequent-items-in-basket, 2), not C(basket, 2) — the a-priori
  * downward-closure bound (an infrequent item cannot be in a frequent
  * pair, so pruning loses nothing). Pair supports are another
  * partial-agg groupBy; attaching the two single-item supports is a
  * pair of item-vocabulary-sized joins; the final top-k is
  * TakeOrdered (per-partition heaps), never a global sort.
  *
  * Cross-engine-exact: supports are integers; confidence and lift are
  * FIXED-SHAPE IEEE expressions on those integers (one division;
  * products-then-division), so Spark and the DuckDB oracle agree
  * bit-for-bit with no grid rounding.
  */
object Association {

  /** Top-`k` pair rules (ante ⇒ cons, both directions of each
    * frequent pair) by confidence: (ante, cons, pair_n, ante_n,
    * cons_n, conf, lift) with conf = pair_n/ante_n and
    * lift = (pair_n·N) / (ante_n·cons_n), N = total baskets.
    * `minSupport` applies to items AND pairs; ordering is
    * (conf desc, ante, cons) — unique, hence deterministic. All
    * counts (pair_n, ante_n, cons_n, N) are over the baskets
    * surviving the `maxBasketItems` guard. */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, k: Int,
                maxBasketItems: Int = 256): DataFrame = {
    require(minSupport >= 1 && k >= 1 && maxBasketItems >= 2)
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct().localCheckpoint() // feeds the size agg + guard join
    // mega-basket guard FIRST (corpus restriction): C(n,2) fan-out is
    // only safe for bounded n, and guarding before any support keeps
    // pair_n, item supports, and N on the same basket universe —
    // confidence/lift are exact for the guarded corpus
    val sized = b
      .join(b.groupBy(col("bk")).agg(count(lit(1)).as("bn")), Seq("bk"))
      .filter(col("bn") <= maxBasketItems)
      .select(col("bk"), col("it"))
      .localCheckpoint() // feeds N, item supports, pair gen
    val nB = sized.select(col("bk")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    // item supports = basket counts (sized is distinct per (bk, it))
    val itemN = sized.groupBy(col("it")).agg(count(lit(1)).as("item_n"))
      .localCheckpoint() // feeds the prune and both support joins
    val frequent = itemN.filter(col("item_n") >= minSupport)
    // downward closure: only frequent items can form frequent pairs
    val pruned = sized
      .join(frequent.select(col("it")), Seq("it"), "left_semi")
      .localCheckpoint() // both sides of the pair self-join
    val pairs = pruned
      .join(pruned.select(col("bk"), col("it").as("it2")), Seq("bk"))
      .filter(col("it") < col("it2"))
      .groupBy(col("it"), col("it2")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    // each frequent pair yields both rule directions
    val rules = pairs.select(col("it").as("ante"), col("it2").as("cons"),
        col("pair_n"))
      .unionByName(pairs.select(col("it2").as("ante"), col("it").as("cons"),
        col("pair_n")))
      .join(itemN.select(col("it").as("ante"), col("item_n").as("ante_n")),
        Seq("ante"))
      .join(itemN.select(col("it").as("cons"), col("item_n").as("cons_n")),
        Seq("cons"))
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("pair_n"), col("ante_n"),
        col("cons_n"),
        (col("pair_n").cast("double") / col("ante_n").cast("double"))
          .as("conf"),
        ((col("pair_n").cast("double") * col("n_baskets").cast("double")) /
          (col("ante_n").cast("double") * col("cons_n").cast("double")))
          .as("lift"))
    rules.orderBy(col("conf").desc, col("ante").asc, col("cons").asc)
      .limit(k)
  }
}
