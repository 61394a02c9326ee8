package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * groupBy over the guarded set, and — when a tiny occurrence-weighted
  * probe of that support table says it pays — only items meeting
  * `minSupport` re-enter the basket (semi join), so the per-basket
  * pair fan-out is C(frequent-items-in-basket, 2), not C(basket, 2) —
  * the a-priori downward-closure bound (an infrequent item cannot be
  * in a frequent pair, so pruning loses nothing; and because the
  * pair-support filter enforces the same bound exactly, SKIPPING the
  * prune when it would remove almost nothing is equally lossless —
  * see the adaptive split in the body). Pair supports are another
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

  /** Occurrence fraction the a-priori prune must remove from the pair
    * explode's input stream to pay for its own exchange + basket
    * re-assembly (see [[pairRules]]'s adaptive split). */
  private[graft] val PruneMinOccFraction = 0.05

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
    // Guard BEFORE assembling arrays: dedup (basket, item) — per-group
    // state is the pair key itself, bounded — then the basket size as
    // a whole-partition window COUNT over `bk` and a filter on it,
    // before any collect_set. A degenerate mega-basket (half the
    // catalog in one basket — the exact case the guard exists for) is
    // dropped by its COUNT and never materializes as a single-buffer
    // array: WindowExec buffers one basket's rows in a spillable array
    // (disk-bounded), never an agg heap buffer. The window's hash
    // exchange on `bk` is REUSED by the collect_set groupBy (same
    // key), so the whole guard+assembly costs the distinct exchange
    // plus ONE basket exchange — no checkpoint, no count table, no
    // semi join. Every downstream statistic — pair counts, item
    // supports, N — is computed over this same guarded basket
    // universe, so confidence/lift are exact for the guarded corpus.
    val dedup = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    // the basket total N RIDES the checkpoint materialization as an
    // observe metric (CollectMetrics folds it while the rows stream
    // into blocks) — no separate count subtree in the final plan
    val obs = org.apache.spark.sql.Observation()
    val sized = dedup
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("bk"))))
      .filter(col("bn") <= maxBasketItems)
      .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
      .observe(obs, count(lit(1)).as("n_baskets"))
      .localCheckpoint() // feeds item supports, prune, pair gen
    val nBaskets = obs.get("n_baskets").asInstanceOf[Long]
    // item supports = basket counts (items is a set per basket);
    // map-side combine reduces the exploded stream to vocabulary
    // size. The prune-pricing occurrence sums RIDE this checkpoint's
    // materialization as observe metrics — no separate driver job.
    val occObs = org.apache.spark.sql.Observation()
    val itemN = sized.select(explode(col("items")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("item_n"))
      .observe(occObs,
        sum(col("item_n")).as("tot"),
        sum(when(col("item_n") < minSupport, col("item_n"))
          .otherwise(0L)).as("cut"))
      .localCheckpoint() // feeds the prune and both support joins
    // Downward closure: only frequent items can form frequent pairs —
    // but the pair-support filter below already ENFORCES that
    // (pair_n ≤ min(ante_n, cons_n), so pair_n ≥ minSupport implies
    // both endpoints frequent): the a-priori prune is purely a
    // PERFORMANCE device, shrinking the quadratic per-basket pair
    // fan-out. It also isn't free — a second exploded-stream exchange
    // plus a basket re-assembly — so apply it ADAPTIVELY: one tiny
    // aggregate over the (checkpointed, vocabulary-sized) item-support
    // frame prices what it would remove, occurrence-weighted (an
    // infrequent item's cost is its occurrences entering the pair
    // explode, not its vocabulary slot). Corpora with long infrequent
    // tails (high minSupport, the 100-TB shape) prune; corpora where
    // nearly everything is frequent (the bench fixture: minSupport 2
    // over items averaging ~30 baskets each) skip the two dead
    // exchanges. Either path computes the identical rule set.
    val occ = occObs.get
    val pruneWorthIt = occ("tot") == null ||
      occ("cut").asInstanceOf[Long].toDouble >=
        PruneMinOccFraction * occ("tot").asInstanceOf[Long]
    val basketsForPairs = if (!pruneWorthIt) sized else {
      // the semi join against the frequent vocabulary — AQE sees the
      // frequent side's runtime size and broadcasts it when it fits,
      // without pinning a hint that a 10⁸-item vocabulary would OOM;
      // the basket then re-assembles in one more exchange
      val frequent = itemN.filter(col("item_n") >= minSupport)
      sized.select(col("bk"), explode(col("items")).as("it"))
        .join(frequent.select(col("it")), Seq("it"), "left_semi")
        .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
    }
    // the a<b pair expansion is a shuffle-free double explode,
    // bounded by the basket guard
    val pairs = basketsForPairs
      .select(explode(col("items")).as("it"), col("items"))
      .select(col("it"), explode(col("items")).as("it2"))
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
      .select(col("ante"), col("cons"), col("pair_n"), col("ante_n"),
        col("cons_n"),
        (col("pair_n").cast("double") / col("ante_n").cast("double"))
          .as("conf"),
        ((col("pair_n").cast("double") * lit(nBaskets).cast("double")) /
          (col("ante_n").cast("double") * col("cons_n").cast("double")))
          .as("lift"))
    rules.orderBy(col("conf").desc, col("ante").asc, col("cons").asc)
      .limit(k)
  }
}
