package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the crawl-curation signal a
  * web-scale training-data pipeline ranks domains/URLs with before
  * assigning crawl budgets or per-source mixing weights (the
  * CommonCrawl-derived corpora weight URLs by exactly this family of
  * centralities).
  *
  * Both operators are POWER ITERATIONS expressed as a fixed number of
  * relational passes: ranks live in a node-sized frame, each step is
  * (ranks ⋈ edges on src) → groupBy(dst) → node-sized update — the
  * edge table is the only corpus-scale input and it is scanned once
  * per iteration with no driver collect anywhere (the dangling-mass
  * scalar rides a broadcast 1-row frame). Lineage is truncated per
  * iteration (localCheckpoint), so the plan stays iteration-sized.
  *
  * Cross-engine-exact (the dyadic trick the round-8 trainers use):
  * every per-edge contribution quantizes to the 2⁻³⁰ grid before
  * summation, so the sums are exactly representable and
  * order-independent — Spark's partial aggregates and a sequential
  * engine produce identical bits; the scalar rank-update expression is
  * then a fixed-shape IEEE computation on identical inputs. The
  * damping factor defaults to 7/8 (dyadic) rather than the customary
  * 0.85 for the same reason.
  */
object Graph {

  /** 2⁻³⁰ dyadic grid: exact, order-independent summation. */
  private val Q = 1073741824.0 // 2^30
  private def q30(c: org.apache.spark.sql.Column) =
    floor(c * Q + lit(0.5)) / Q

  /** PageRank with uniform teleport and dangling-mass redistribution:
    * r'(v) = (1−d)/N + d·(Σ_{u→v} q(r(u)/deg(u)) + D/N), where D is
    * the summed rank of out-degree-0 nodes and q the 2⁻³⁰ grid.
    * `edges` rows are directed (src, dst) pairs; duplicates are
    * collapsed. Returns (id, rank) on the quantized grid. */
  /** @param assumeDistinct the caller vouches `edges` carries no
    *   duplicate (src, dst) rows AND is cheap to re-evaluate (a
    *   projection/union over its own checkpoint — every gated caller's
    *   doubled edge build), so the multigraph-collapsing `distinct`
    *   (a full edge-table exchange + hash agg) and the re-checkpoint
    *   of the already-materialized rows are both skipped. Same
    *   contract as [[labelPropagation]]'s flag. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.875,
               assumeDistinct: Boolean = false): DataFrame =
    pageRankFrom(edges, srcCol, dstCol, init = None, iters, damping,
      assumeDistinct)

  /** [[pageRank]] with a WARM START — the incremental-update path: on
    * a steady-state graph, yesterday's converged ranks are an
    * excellent initial vector for today's slightly-grown edge set, so
    * the fixpoint is re-reached in 1-3 iterations instead of a cold
    * power iteration's 10-20 (GraphSpec pins the iteration cut). Ids
    * in `init` but no longer in the graph drop out; NEW ids (nodes
    * the fresh edges introduced) start at the uniform teleport value.
    * Note the fixed-iteration results differ bit-wise from a cold run
    * of the same length (different start vector) — both converge to
    * the same fixpoint; the gated oracle query stays the cold form. */
  def pageRankWarm(edges: DataFrame, srcCol: String, dstCol: String,
                   prevRanks: DataFrame, iters: Int,
                   damping: Double = 0.875): DataFrame =
    pageRankFrom(edges, srcCol, dstCol, init = Some(prevRanks), iters, damping)

  private def pageRankFrom(edges: DataFrame, srcCol: String, dstCol: String,
                           init: Option[DataFrame], iters: Int,
                           damping: Double,
                           assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val eSel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (assumeDistinct) eSel else eSel.distinct().localCheckpoint()
    // nodes stays LAZY: its two consumers (the 1-row count under
    // broadcast and base's main branch) sit inside base's single
    // checkpoint action, where the distinct's exchange is unified by
    // ReuseExchange — a separate checkpoint was one pure extra job.
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val n = nodes.select(count(lit(1)).cast("double").as("n"))
    // base carries each node's per-iteration constants (here: n);
    // its row count rides the checkpoint for the sink-free probe
    val baseObs = org.apache.spark.sql.Observation()
    val base = nodes.crossJoin(broadcast(n))
      .observe(baseObs, count(lit(1)).as("cnt")).localCheckpoint()
    val ranks0 = init match {
      case None =>
        // trivial projection of the checkpointed base — each first-
        // iteration consumer re-projects cached blocks; a checkpoint
        // here was another whole job to avoid two cheap projections
        base.select(col("id"), q30(lit(1.0) / col("n")).as("rank"))
      case Some(prev) =>
        // the warm join is NOT trivial to recompute per consumer —
        // materialize it once
        base.join(prev.select(col("id"), col("rank").as("__prev")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__prev"), q30(lit(1.0) / col("n"))).as("rank"))
          .localCheckpoint()
    }
    // uniform teleport: r' = q((1−d)/n + d·(s + dm/n))
    val degObs = org.apache.spark.sql.Observation()
    val outdeg = countDeg(e, degObs)
    powerIterate(e, outdeg, base, ranks0, iters,
      q30(col("rank") / col("deg")),
      q30(lit(1.0 - damping) / col("n") +
        lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") / col("n"))),
      noSinks = obsCount(degObs) == obsCount(baseObs))
  }

  /** The shared rank-update loop of [[pageRank]] / [[pageRankWarm]] /
    * [[personalizedPageRank]] / [[pageRankWeighted]]: per iteration,
    * the dangling mass (grid-exact sum over sink nodes, 1-row
    * broadcast frame) and the per-dst contribution sums (`contrib`,
    * evaluated over the edge row joined with (rank, deg)), then
    * `rankExpr` — evaluated over `base`'s per-node constant columns
    * plus (s, dm) — becomes the new rank. Only the teleport and
    * contribution terms differ between the variants, and they MUST
    * stay verbatim in the passed expressions: each form is bit-pinned
    * to its own unrolled-CTE oracle ((1−d)/n is NOT the same bits as
    * (1−d)·q30(1/n)). `outdeg` is the (id, deg) frame the
    * contributions divide by — edge count for the uniform forms,
    * total out-weight for the weighted one. */
  private def powerIterate(e: DataFrame, outdeg: DataFrame, base: DataFrame,
                           init: DataFrame, iters: Int, contrib: Column,
                           rankExpr: Column, noSinks: Boolean): DataFrame = {
    // Sink-free short-circuit (r16): on a graph where every node has
    // out-degree ≥ 1 — any doubled/undirected projection, i.e. every
    // gated caller — the per-iteration dangling sum is PROVABLY +0.0
    // (the deg-is-null set is empty, and coalesce(sum(..), 0.0) of an
    // empty group is exactly +0.0, so rankExpr sees identical bits).
    // `noSinks` ⇔ |outdeg| == |base| (outdeg's ids are distinct
    // sources ⊆ base's node set, so equal counts mean every node HAS
    // out-degree) — both counts ride the frames' own checkpoint
    // materializations as observe metrics in the callers, so the
    // former node-sized anti-join probe job is gone (r16, second
    // pass). Sink-free graphs ride a constant 1-row LocalRelation
    // (broadcasts job-free) instead of paying an aggregation sub-job
    // per iteration; graphs WITH sinks keep the per-iteration
    // aggregate unchanged.
    val zeroDm = e.sparkSession.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(0.0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dm",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    var ranks = init
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outdeg, Seq("id"), "left")
      // dangling mass: grid-exact sum over sink nodes (1-row frame)
      val dm = if (noSinks) zeroDm else withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contribs = e.join(withDeg.filter(col("deg").isNotNull)
          .select(col("id").as("src"), col("rank"), col("deg")), Seq("src"))
        .select(col("dst"), contrib.as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = base
        .join(contribs.select(col("dst").as("id"), col("s")), Seq("id"), "left")
        .crossJoin(broadcast(dm))
        .select(col("id"), rankExpr.as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** (id, deg) out-degree frame: the divisor of the uniform forms.
    * Its row count rides the checkpoint materialization as an observe
    * metric (`cnt`) for the callers' sink-free probe. */
  private def countDeg(e: DataFrame,
                       obs: org.apache.spark.sql.Observation): DataFrame =
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .observe(obs, count(lit(1)).as("cnt"))
      .localCheckpoint() // node-sized; joined into ranks every iteration

  /** Observed row count after the eager checkpoint that consumed the
    * observation (null metric = empty frame). */
  private def obsCount(obs: org.apache.spark.sql.Observation): Long =
    Option(obs.get("cnt")).fold(0L)(_.asInstanceOf[Long])

  /** WEIGHTED PageRank — real link graphs are multigraphs (a domain
    * linking another 500 times is not one edge): contributions split
    * proportionally to edge weight, r'(v) = (1−d)/N + d·(Σ_{u→v}
    * q(r(u)·w(u,v)/W(u)) + D/N) with W(u) the node's total out-weight.
    * Parallel (src,dst) rows pre-aggregate into one weighted edge (the
    * edge table stays one row per arc); weights quantize to integers
    * half-up so W is an exact integer sum. Same grid / iteration /
    * scale shape as [[pageRank]] — the weighted contribution is the
    * only change, and it rides the same powerIterate loop via a
    * weight-aware contribution column.
    *
    * @param assumeCollapsed the caller vouches `edges` is already one
    *   row per (src, dst) arc with a positive integral weight (e.g. a
    *   grouped count doubled over disjoint id ranges, reading the
    *   caller's own checkpoint) — the operator then skips its
    *   quantize + filter + collapse pass and the checkpoint of it,
    *   exactly the [[pageRank]] `assumeDistinct` pattern. On such
    *   input the collapse is the identity (one row per key ⇒
    *   sum(w) = w, and floor(w + 0.5) = w for integral w), so the
    *   resulting bits are unchanged. */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int,
                       damping: Double = 0.875,
                       assumeCollapsed: Boolean = false): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val eSel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    val e = if (assumeCollapsed) eSel
    else edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        floor(col(weightCol).cast("double") + lit(0.5)).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint()
    // lazy nodes / lazy init: same single-action exchange-reuse
    // argument as pageRankFrom (base's checkpoint is the one
    // materialization both need)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val n = nodes.select(count(lit(1)).cast("double").as("n"))
    val baseObs = org.apache.spark.sql.Observation()
    val base = nodes.crossJoin(broadcast(n))
      .observe(baseObs, count(lit(1)).as("cnt")).localCheckpoint()
    val init = base.select(col("id"), q30(lit(1.0) / col("n")).as("rank"))
    // out-weight takes the degree slot: contribution = q(r·w/W); its
    // row count rides the checkpoint for the sink-free probe
    val outwObs = org.apache.spark.sql.Observation()
    val outw = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("deg"))
      .observe(outwObs, count(lit(1)).as("cnt"))
      .localCheckpoint()
    powerIterate(e, outw, base, init, iters,
      q30(col("rank") * col("w") / col("deg")),
      q30(lit(1.0 - damping) / col("n") +
        lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") / col("n"))),
      noSinks = obsCount(outwObs) == obsCount(baseObs))
  }

  /** PERSONALIZED PageRank: teleport mass concentrates uniformly on a
    * seed set instead of all nodes — the "expand a trusted seed set"
    * curation primitive (seed quality domains, rank the rest of the
    * crawl by random-walk proximity to them). r'(v) = (1−d)·t(v) +
    * d·(Σ_{u→v} q(r(u)/deg(u)) + D·t(v)) with t uniform on the seeds
    * (dangling mass D also re-enters through the seeds, keeping total
    * mass on the seed-reachable subgraph). Seeds outside the graph are
    * ignored; ranks start AT the teleport vector. Same 2⁻³⁰-grid
    * quantization and iteration shape as [[pageRank]]; the extra state
    * is one node-sized teleport frame built once. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String, iters: Int,
                           damping: Double = 0.875,
                           assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val eSel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (assumeDistinct) eSel else eSel.distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val seedIds = seeds.select(col(seedCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
    val sc = seedIds.select(count(lit(1)).cast("double").as("s"))
    val teleObs = org.apache.spark.sql.Observation()
    val tele = nodes
      .join(seedIds.withColumn("__seed", lit(1)), Seq("id"), "left")
      .crossJoin(broadcast(sc))
      .select(col("id"), when(col("__seed").isNotNull,
        q30(lit(1.0) / col("s"))).otherwise(lit(0.0)).as("t"))
      .observe(teleObs, count(lit(1)).as("cnt"))
      .localCheckpoint()
    // seeded teleport: r' = q((1−d)·t + d·(s + dm·t))
    val degObs = org.apache.spark.sql.Observation()
    val outdeg = countDeg(e, degObs)
    powerIterate(e, outdeg, tele,
      tele.select(col("id"), col("t").as("rank")), iters,
      q30(col("rank") / col("deg")),
      q30(lit(1.0 - damping) * col("t") +
        lit(damping) * (coalesce(col("s"), lit(0.0)) + col("dm") * col("t"))),
      noSinks = obsCount(degObs) == obsCount(teleObs))
  }

  /** Per-node triangle counts over an UNDIRECTED edge list — the
    * local-density signal link-graph curation reads as "is this node
    * embedded in a real community or a spam farm" (clustering
    * coefficient's numerator), and the building block of cohesion
    * metrics over co-occurrence projections.
    *
    * Scale shape — DEGREE-ORDERED ORIENTATION: every undirected edge
    * is directed from its (degree, id)-smaller endpoint to the larger
    * one, which makes the orientation acyclic and bounds every node's
    * OUT-degree by O(√m) (a node of degree d > √m can only point at
    * nodes of degree ≥ d, and there are < 2√m of those). Wedges are
    * then pairs of out-neighbors of a shared source — Σ C(outdeg, 2) =
    * O(m^1.5) candidates TOTAL regardless of skew, vs the unoriented
    * form's Σ C(deg, 2), which a single celebrity node makes
    * quadratic. Each stage is a plain shuffle join (wedge self-join on
    * src; closing check a join against the oriented edge set on
    * (v, w)); nothing is collected and no global sort runs. Counts are
    * exact integers, so the DuckDB oracle (same orientation spelled in
    * SQL) compares bit-for-bit.
    *
    * Returns (id, tri) for every node on ≥1 triangle; each triangle
    * counts once at each of its three corners.
    */
  /** Canonical undirected edge form shared by [[triangleCounts]] /
    * [[kCore]] (and their oracles' `canon` CTE): (lo, hi) with
    * lo < hi, self-loops and null endpoints dropped, duplicates
    * collapsed. Callers checkpoint per their own fan-in. */
  private[graft] def canonicalUndirected(edges: DataFrame, aCol: String,
                                         bCol: String): DataFrame =
    edges.select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo").isNotNull && col("lo") < col("hi"))
      .distinct()

  /** (id, deg) undirected degrees of a canonical edge frame —
    * endpoint union (union = UNION ALL) + partial-agg count. */
  private[graft] def undirectedDegrees(canon: DataFrame): DataFrame =
    canon.select(col("lo").as("id")).union(canon.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

  /** Degree-ordered orientation of a canonical edge frame: each edge
    * directed at its (deg, id)-larger endpoint, dst's degree kept as
    * `ddeg` so downstream wedge joins can order out-neighbors without
    * re-joining. THE orientation [[triangleCounts]] runs and the tri9
    * probe prices — one definition, no drift. */
  private[graft] def orientByDegree(canon: DataFrame): DataFrame =
    orientByDegree(canon, undirectedDegrees(canon))

  /** [[orientByDegree]] with the degree frame supplied — so a caller
    * that also needs degrees ([[clusteringCoefficient]]) aggregates
    * them ONCE, matching the oracle's single materialized deg CTE. */
  private[graft] def orientByDegree(canon: DataFrame,
                                    deg: DataFrame): DataFrame = {
    val toLo = canon
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), Seq("hi"))
    val fwd = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    toLo.select(
      when(fwd, col("lo")).otherwise(col("hi")).as("src"),
      when(fwd, col("hi")).otherwise(col("lo")).as("dst"),
      when(fwd, col("dhi")).otherwise(col("dlo")).as("ddeg"))
  }

  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = canonicalUndirected(edges, aCol, bCol)
      .localCheckpoint() // feeds degree + both orientation joins
    triangleCountsFromOriented(orientByDegree(canon).localCheckpoint())
  }

  /** The wedge-join + corner-count tail of [[triangleCounts]], over an
    * already-checkpointed oriented frame (it feeds three consumers).
    *
    * CLOSING-EDGE BLOOM SCREEN: the O(m^1.5) wedge stream is the
    * dominant exchange of the whole pipeline — at the measured 10×
    * point, 413 M wedge rows shuffled+sorted into the closing join
    * while only 4.6 % of them close into triangles (headroom13,
    * SCALE.md). A Bloom filter over the oriented edge set — built in
    * one edge-sized partial agg, probed as a codegen'd bit test on
    * each wedge BEFORE it reaches the exchange — drops ~95 % of that
    * shuffle at the cost of one hash per wedge. No false negatives,
    * so the exact closing join downstream sees every true triangle
    * and result bits are untouched; false positives only ride the
    * (now small) exchange and fall out of the join. The sketch is
    * size-CAPPED ([[WedgeBloomMaxBits]]): past ~100 M edges the fp
    * rate degrades gracefully toward pass-through — never wrong,
    * just less selective — which is the right failure mode for a
    * broadcast-shaped structure at 100-TB edge counts. */
  private def triangleCountsFromOriented(oriented: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftx.{BloomScreen, SessionScope}
    val m = oriented.count() // cheap: one pass over checkpoint blocks
    // Zero valid edges (empty input, or only self-loops/nulls — all
    // canonicalized away): no triangles, and nothing downstream to
    // build — skip the Bloom job and the wedge plan entirely
    // (BloomFilterAggregate also rejects an item estimate of 0).
    if (m == 0) return oriented
      .select(col("src").as("id"), lit(0L).as("tri")).limit(0)
    val bits = math.min(math.max(m * 10L, 1L << 20), WedgeBloomMaxBits)
    // BloomFilterAggregate silently Math.min's BOTH its arguments
    // against session caps that default far below this pipeline's
    // sizing (maxNumItems 4M, maxNumBits 2^26) — under the defaults a
    // 12M-edge build would get a filter calibrated for 4M items and
    // 67M bits (fp ~20%, not the designed ~1%) with no error. Build
    // under raised caps scoped to this one action (cloned session).
    val bf = SessionScope.headUnderConf(
      oriented.agg(BloomScreen.bloomAgg(struct(col("src"), col("dst")),
        m, bits)),
      Map("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" ->
        m.toString,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
          bits.toString)).getAs[Array[Byte]](0)
    // shuffle_hash only pays once the edge frame is past broadcast
    // size: below it the unhinted planner broadcasts the edge side
    // and the wedge stream never exchanges at all — the better plan,
    // which an unconditional hint would forbid
    val tris = closedWedges(oriented, bf, hintShuffleHash = m > WedgeHintMinEdges)
      .localCheckpoint() // triangle list feeds three corner projections
    tris.select(col("u").as("id"))
      .union(tris.select(col("v").as("id")))
      .union(tris.select(col("w").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
  }

  /** The wedge stream + exact closing join — the (u, v, w) triangle
    * list [[triangleCountsFromOriented]] checkpoints. Split out so
    * PlanGuardSpec can pin the PRE-checkpoint shape (the checkpoint
    * truncates lineage, hiding it from the final plan): wedges
    * (u; v, w) with ord(v) < ord(w), whose closing edge — if it
    * exists — is oriented exactly v → w; the Bloom probe (`bf` from
    * the edge set, no false negatives) runs in the SAME codegen stage
    * that generates the wedge, so non-closing wedges die before the
    * exchange. When `hintShuffleHash` (edge frame past broadcast
    * size, see [[WedgeHintMinEdges]]) both joins hint shuffle_hash:
    * sort-merge would SORT the edge frame twice and — far worse — the
    * wedge stream once, and a wedge stream is pure fan-out that only
    * needs hashing, never ordering (per-partition build sides stay
    * edge-sized/N, well inside task memory; at real scale partition
    * count grows with the data). Unhinted, the planner broadcasts the
    * small edge side and the wedge stream never exchanges. */
  private[graft] def closedWedges(oriented: DataFrame, bf: Array[Byte],
                                  hintShuffleHash: Boolean): DataFrame = {
    import org.apache.spark.sql.graftx.BloomScreen
    def side(edgeFrame: DataFrame): DataFrame =
      if (hintShuffleHash) edgeFrame.hint("shuffle_hash") else edgeFrame
    val o1 = oriented.select(col("src").as("u"), col("dst").as("v"),
      col("ddeg").as("dv"))
    val o2 = oriented.select(col("src").as("u"), col("dst").as("w"),
      col("ddeg").as("dw"))
    o1.join(side(o2), Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .filter(BloomScreen.mightContain(bf, struct(col("v"), col("w"))))
      .join(side(oriented.select(col("src").as("v"), col("dst").as("w"))),
        Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
  }

  /** Edge count past which [[closedWedges]] hints its joins
    * shuffle_hash. Below it the edge frame is broadcast-sized and the
    * unhinted planner's BroadcastHashJoin is strictly better (the
    * wedge stream never exchanges); above it the choice is between
    * shuffle strategies, where hashing beats sort-merge because a
    * fan-out stream needs no order. The broadcast decision sees the
    * CHECKPOINTED frame's stats — the materialized (compressed) block
    * bytes, measured ~3.6 B/edge on the co-purchase fixture, so the
    * 10 MB autoBroadcastJoinThreshold covers well past this constant
    * (no unhinted-and-unbroadcastable gap: verified empirically, a
    * 116k-edge checkpointed frame reports 421 KB and plans
    * BroadcastHashJoin with zero SortMergeJoin). */
  private[graft] val WedgeHintMinEdges = 500000L

  /** Bit cap for the closing-edge Bloom screen — ~32 MB serialized,
    * ≈1 % fp at 10·bits-per-edge up to ~27 M edges, degrading
    * gracefully (toward an ineffective-but-harmless pass-through)
    * beyond it. The filter ships with the task binary like any plan
    * literal; capping it is what keeps the wedge pipeline legal when
    * the edge set is 1000× the local fixture. (The session's own
    * runtime-filter caps default BELOW this sizing and are raised,
    * scoped to the build action — see triangleCountsFromOriented.) */
  private[graft] val WedgeBloomMaxBits = 1L << 28

  /** Local clustering coefficient per node: coef = 2·tri / (deg·(deg−1))
    * — what fraction of a node's neighbor pairs are themselves linked,
    * the per-node community-density readout on top of
    * [[triangleCounts]] (same canonical frame and orientation, one
    * extra node-sized left join — the corpus-scale edge work is not
    * repeated). Nodes of degree < 2 have no neighbor pairs and are
    * omitted; triangle-less nodes report 0. deg/tri are exact
    * integers and coef is one fixed-shape IEEE expression on them, so
    * the oracle compares bit-for-bit. */
  def clusteringCoefficient(edges: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val canon = canonicalUndirected(edges, aCol, bCol)
      .localCheckpoint() // feeds degrees AND the triangle pipeline
    // degrees aggregate ONCE (node-sized, 3 consumers), mirroring the
    // oracle's single materialized deg CTE
    val deg = undirectedDegrees(canon).localCheckpoint()
    val tri = triangleCountsFromOriented(
      orientByDegree(canon, deg).localCheckpoint())
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        ((lit(2.0) * coalesce(col("tri"), lit(0L)).cast("double")) /
          (col("deg") * (col("deg") - 1)).cast("double")).as("coef"))
  }

  /** k-core peel over an UNDIRECTED edge list: iteratively remove
    * nodes of degree < k until (at most `rounds` rounds of) fixpoint —
    * the "dense collaborative core vs loosely-attached fringe"
    * decomposition link-graph curation separates durable communities
    * from drive-by spam with. Returns (id, core_deg): surviving nodes
    * with their degree inside the surviving subgraph.
    *
    * FIXED-ROUND contract (same as the fixed-iteration PageRank
    * family): the result after exactly `rounds` synchronous peels is
    * well-defined whether or not the peel has converged, which is what
    * lets the DuckDB oracle (the same rounds unrolled into chained
    * CTEs) compare bit-for-bit; production use sizes `rounds` at the
    * observed cascade depth (typically O(log n) — each round removes
    * every node currently below k simultaneously).
    *
    * Scale shape: per round, one degree aggregation (node-sized,
    * partial-agg) and two semi-joins of the edge list against the
    * surviving-node set — the edge table is touched once per round,
    * nothing is collected, and lineage truncates per round so the plan
    * stays round-sized. Integer degrees → engine-exact.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
            k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var canon = canonicalUndirected(edges, aCol, bCol).localCheckpoint()
    // Early exit at the fixed point: a peel that drops no node leaves
    // the edge set unchanged, so every remaining round is a no-op —
    // identical result, without paying rounds× job-scheduling latency
    // on already-converged graphs. [[peelRound]] signals the fixed
    // point by returning its input frame unchanged (its drop-count
    // collect is the detector — no extra pass here).
    //
    // ONE job per round: peelRound's capped drop collect IS the
    // round's only action (its local drop set broadcasts without a
    // job), and the returned anti-joined frame stays LAZY — the next
    // round's degree scan re-applies the accumulated broadcast anti
    // joins to the checkpointed base (a hash probe per edge, far
    // cheaper than re-materializing the edge frame every round). The
    // chain re-checkpoints every [[PeelCheckpointEvery]] rounds so a
    // deep peel neither grows an unbounded plan nor re-pays early
    // rounds forever; the shuffle-fallback path (huge drop set)
    // checkpoints immediately since a chained shuffle join would
    // re-shuffle the survivors each later round.
    var r = 0
    var sinceCkpt = 0
    var converged = false
    while (r < rounds && !converged) {
      val (next, wide) = peelRoundLazy(canon, k, BroadcastNodeLimit)
      if (next eq canon) converged = true
      else if (wide || sinceCkpt + 1 >= PeelCheckpointEvery) {
        canon = next.localCheckpoint(); sinceCkpt = 0
      } else { canon = next; sinceCkpt += 1 }
      r += 1
    }
    undirectedDegrees(canon).select(col("id"), col("deg").as("core_deg"))
  }

  /** Rounds of lazily-chained broadcast anti joins a [[kCore]] peel
    * accumulates before truncating the plan with a checkpoint. */
  private[graft] val PeelCheckpointEvery = 6

  /** Node-count ceiling for broadcasting a node-sized frame into an
    * edge-sized join. Budgeted for the WIDEST frame it gates: label
    * propagation ships two-column (id, lab) frames, so the worst case
    * is 4M × 2 longs ≈ 64 MB serialized plus row overhead — still a
    * small fraction of executor broadcast budgets (a single-column id
    * frame is half that). Below it, the per-round joins of the
    * iterative operators run broadcast-side (the edge table is never
    * shuffled); above it they fall back to shuffle joins — the 100-TB
    * shape, where a node frame is itself distributed. */
  private[graft] val BroadcastNodeLimit = 4000000L

  /** One synchronous [[kCore]] peel ([[peelRoundLazy]] without the
    * path flag). Exposed so PlanGuardSpec can pin the pre-checkpoint
    * join shape — the full kCore plan truncates per round and would
    * make the guard vacuous; `broadcastLimit` is injectable only so
    * the guard can force the shuffle fallback on a small fixture. */
  private[graft] def peelRound(canon: DataFrame, k: Long,
                               broadcastLimit: Long = BroadcastNodeLimit): DataFrame =
    peelRoundLazy(canon, k, broadcastLimit)._1

  /** One peel round as (next frame, took-the-wide-path). The round's
    * ONLY action is a `broadcastLimit`-capped collect of the drop set
    * (the nodes that just fell under k): the same node-sized rows a
    * broadcast join would pull to the driver anyway, fetched once and
    * reused for the fixed-point signal, the path choice, AND the two
    * anti-join build sides (as a LocalRelation, which broadcasts
    * job-free). Only when the collect hits the cap — a huge first cut
    * on a sparse graph — does it fall back to shuffle SEMI joins
    * against the survivor set, the distributed shape where the drop
    * set must never sit on one driver; that branch re-aggregates
    * degrees on purpose (see its comment — checkpointing `deg` for
    * reuse taxed every happy round, measured). */
  private[graft] def peelRoundLazy(canon: DataFrame, k: Long,
                                   broadcastLimit: Long): (DataFrame, Boolean) = {
    val deg = undirectedDegrees(canon)
    val cap = math.min(broadcastLimit, Int.MaxValue - 2L).toInt + 1
    val spark = canon.sparkSession
    val idType = canon.schema("lo").dataType
    // isNotNull belt-and-braces: canonicalUndirected null-filters
    // endpoints so no null group key exists today, but the Long fast
    // path below would THROW on one (Encoders.scalaLong), where the
    // generic Row path passed it through harmlessly — don't let a
    // future caller with a nullable id column trip it.
    val drop = deg.filter(col("deg") < k && col("id").isNotNull)
      .select(col("id")).limit(cap)
    // Driver-heap budget at the cap: long graph ids collect as a
    // PRIMITIVE Array[Long] — 8 B/id ≈ 32 MB at the 4M cap — and the
    // LocalRelation build is the only per-id object cost (the former
    // Row collect held ~50–80 B/id ≈ 200–300 MB of boxed Rows before
    // the same build). Non-long ids keep the generic Row path.
    val (nDrop, dropDf) = idType match {
      case org.apache.spark.sql.types.LongType =>
        val ids = drop.as(org.apache.spark.sql.Encoders.scalaLong).collect()
        (ids.length, () => spark.createDataset(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(ids))(
          org.apache.spark.sql.Encoders.scalaLong).toDF("id"))
      case _ =>
        val rows = drop.collect()
        (rows.length, () => spark.createDataFrame(
          java.util.Arrays.asList(rows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", idType)))))
    }
    if (nDrop == 0) (canon, false)
    else if (nDrop < cap) {
      val dropped = dropDf()
      (canon
        .join(broadcast(dropped.select(col("id").as("lo"))), Seq("lo"), "left_anti")
        .join(broadcast(dropped.select(col("id").as("hi"))), Seq("hi"), "left_anti"),
        false)
    } else {
      // Deliberate re-aggregation, adjudicated by a round-13 A/B: a
      // spelling that localCheckpoints `deg` so this branch could
      // reuse it taxed EVERY happy-path round with a block-write
      // job (kcore +5% at sf0.1) to save one re-agg on a branch hit
      // only by a giant first cut — and the capped collect above
      // short-circuits its reduce tasks at `cap` rows, so the work
      // "thrown away" here is bounded, not a full pass.
      val keep = undirectedDegrees(canon).filter(col("deg") >= k)
        .select(col("id"))
        .localCheckpoint() // node-sized, feeds 2 joins
      (canon
        .join(keep.select(col("id").as("lo")), Seq("lo"), "left_semi")
        .join(keep.select(col("id").as("hi")), Seq("hi"), "left_semi"),
        true)
    }
  }

  /** Degree assortativity (Newman's r): the Pearson correlation of
    * endpoint degrees over the undirected edge list — assortative
    * (r > 0) graphs are peer-linked communities, disassortative
    * (r < 0) ones hub-and-spoke/spam-farm shaped; the one-number
    * structural fingerprint next to [[clusteringCoefficient]]'s
    * per-node view. With per-edge endpoint degrees (j, k) and integer
    * sums S1 = Σ(j+k), S2 = Σ(j²+k²), Sp = Σ jk over the M canonical
    * edges: r = (Sp/M − (S1/2M)²) / (S2/2M − (S1/2M)²).
    *
    * Scale shape: degrees once (node-sized partial agg), two joins to
    * attach them to edges, ONE global partial-agg producing four
    * numbers. All four sums are exact integer aggregates
    * (order-independent by construction), and r is one fixed-shape
    * IEEE expression on them — bit-exact, no grid. Returns the single
    * row (n_edges, s_sum, s_sq, s_prod, r); degenerate graphs where
    * all endpoint degrees are equal (zero variance) report null r —
    * guarded explicitly, since an IEEE NaN would not hash-compare. */
  def degreeAssortativity(edges: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    // Single-action operator: canon's distinct exchange and deg's
    // aggregation exchange are each shared by their consumers through
    // ReuseExchange inside the one final aggregation job —
    // checkpointing either artifact paid an extra job for work the
    // stage cache already unifies (assort13 A/B). That lazy shape
    // leans on DETERMINISTIC recomputation — canon appears 3× and deg
    // 2× in the final plan, and ReuseExchange is best-effort — so a
    // nondeterministic edges plan (rand()-sampled, uuid()-keyed)
    // could feed INCONSISTENT rows to the two deg joins and the sums
    // base, silently skewing r. Such inputs get the one cheap
    // snapshot pin back; deterministic plans (every gated caller)
    // keep the job-free shape.
    val canonRaw = canonicalUndirected(edges, aCol, bCol)
    val inputDeterministic = edges.queryExecution.analyzed
      .find(_.expressions.exists(!_.deterministic)).isEmpty
    val canon = if (inputDeterministic) canonRaw
                else canonRaw.localCheckpoint()
    val deg = undirectedDegrees(canon) // feeds 2 joins
    val sums = canon
      .join(deg.select(col("id").as("lo"), col("deg").as("dj")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dk")), Seq("hi"))
      .agg(count(lit(1)).as("n_edges"),
        sum(col("dj") + col("dk")).as("s_sum"),
        sum(col("dj") * col("dj") + col("dk") * col("dk")).as("s_sq"),
        sum(col("dj") * col("dk")).as("s_prod"))
    val m = col("n_edges").cast("double")
    val mu = col("s_sum").cast("double") / (lit(2.0) * m)
    val variance = col("s_sq").cast("double") / (lit(2.0) * m) - mu * mu
    sums.select(col("n_edges"), col("s_sum"), col("s_sq"), col("s_prod"),
      when(variance =!= 0.0,
        (col("s_prod").cast("double") / m - mu * mu) / variance).as("r"))
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community, then per round simultaneously adopts
    * the most frequent label among its in-neighbors (ties → smallest
    * label; no in-edges → keep the current label). The cheap
    * communities pass link-graph curation runs when components are too
    * coarse (everything connected) and modularity methods too heavy —
    * callers double the edge list for undirected semantics, as with
    * [[pageRank]].
    *
    * FIXED-ROUND, FULLY DETERMINISTIC contract: synchronous update +
    * integer counts + min-label tie-break make round r a pure function
    * of the graph, so the unrolled-CTE DuckDB oracle compares
    * bit-for-bit (classic async LPA is run-order-dependent — useless
    * under a differential gate).
    *
    * Scale shape: per round, (labels ⋈ edges) → the winning label in
    * ONE aggregation over the neighbor-label stream —
    * mode(lab, deterministic) counts multiplicities and breaks ties
    * to the lowest label inside a single order-independent partial
    * AGGREGATE (map-side combine on the hot nodes; one exchange per
    * round, where the count-then-argmax spelling pays two), not a
    * per-node window — then a node-sized left join to carry isolated
    * nodes. Lineage truncates per round.
    */
  /** The LPA round's winner pick over the raw (id, lab) neighbor-label
    * multiset: the (count desc, lab asc) label in ONE aggregation —
    * `mode(lab, deterministic = true)` counts label multiplicities
    * per node AND resolves ties to the LOWEST label inside a single
    * ORDER-INDEPENDENT PARTIAL AGGREGATE (map-side combine on hot
    * nodes; the per-group state is one lab→count map, bounded by the
    * node's distinct in-labels). The former two-level spelling —
    * groupBy(id, lab).count then min(struct(-n, lab)) — paid a second
    * node-sized exchange per round for the same row; a per-node
    * row_number window would additionally lose map-side combine (the
    * oracle spells it as a window; the engine must not —
    * PlanGuardSpec pins this plan shape). */
  private[graft] def winningLabels(neighborLabels: DataFrame): DataFrame =
    neighborLabels.groupBy(col("id"))
      .agg(mode(col("lab"), deterministic = true).as("__new"))

  /** @param assumeDistinct the caller vouches `edges` carries no
    *   duplicate (src, dst) rows, so the multigraph-collapsing
    *   `distinct` (a full corpus shuffle — a dup edge would otherwise
    *   double-count its vote) is skipped. The doubled projection the
    *   bench queries walk is distinct by construction. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int, assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1)
    // mode()'s ObjectHashAggregate falls back to sort-based agg after
    // a (default 128) per-partition key budget — far below a node
    // frame, so the map-side combine the mode-pick exists for never
    // runs. Raise it for the rounds, but ONLY to a memory-budgeted
    // cap: each in-map group holds a label→count OpenHashMap with
    // ~1 KB of fixed overhead, so the per-task worst case is
    // threshold × ~1 KB (32k ≈ 32 MB/task) — a 4M raise measured
    // faster at bench scale but OOM'd an 8 GiB heap at 10× data,
    // because the threshold IS the spill guard. Past the cap the
    // sort-based fallback aggregates spill-safely — the 100-TB path.
    // The raise is scoped to a CLONED session ([[SessionScope]]): the
    // rounds' actions all run inside the body and the returned frame
    // is the last round's checkpoint (a lineage-truncated block scan
    // that never re-executes the mode agg), so no other query — not
    // even one running concurrently on the caller's session — ever
    // sees a 256× in-memory key budget on ITS ObjectHashAggregates,
    // which the former shared-conf save/set/restore guard leaked for
    // the whole duration of the rounds.
    org.apache.spark.sql.graftx.SessionScope.withConf(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")),
      Map("spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
        "32768")) { e0 =>
    val e = (if (assumeDistinct) e0 else e0.distinct()).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // Broadcast decision, made ONCE: the label frame's size is the
    // node count, constant across rounds. Under [[BroadcastNodeLimit]]
    // the per-round label join runs broadcast-side and the edge table
    // never shuffles; above it (the 100-TB shape) both sides shuffle.
    // The count RIDES the initial checkpoint materialization as an
    // observe metric — no separate count job before the rounds.
    val obs0 = org.apache.spark.sql.Observation()
    var labels = nodes.select(col("id"), col("id").as("lab"))
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    val smallNodes = obs0.get("n").asInstanceOf[Long] <= BroadcastNodeLimit
    def side(nodeFrame: DataFrame): DataFrame =
      if (smallNodes) broadcast(nodeFrame) else nodeFrame
    // Early exit at the fixed point: synchronous LPA's round r+1 is a
    // pure function of labels_r, so labels_r == labels_{r-1} pins every
    // later round to the same frame — stop instead of paying dead
    // rounds. The changed-label count RIDES the checkpoint
    // materialization as an `observe` metric (CollectMetrics folds it
    // while the rows stream into checkpoint blocks), so each round is
    // ONE action — no separate convergence probe job.
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val picked = winningLabels(e
        .join(side(labels.select(col("id").as("src"), col("lab"))), Seq("src"))
        .select(col("dst").as("id"), col("lab")))
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(side(picked), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__new"), col("lab")).as("lab"),
          (col("lab") =!= coalesce(col("__new"), col("lab"))).as("__chg"))
        .observe(obs, sum(when(col("__chg"), 1L).otherwise(0L)).as("changed"))
        .select(col("id"), col("lab"))
        .localCheckpoint()
      // sum over an empty node frame is null — an empty graph is
      // trivially converged
      converged = obs.get.get("changed").forall(c => c == null || c == 0L)
      labels = next
      it += 1
    }
    labels
    }
  }

  /** Neighborhood link prediction over an undirected graph: for the
    * top-`k` NON-adjacent node pairs, the CAPPED-CENTER
    * common-neighbor count `cn` (common neighbors whose own degree is
    * ≤ `maxCenterDeg` — hub centers are excluded everywhere, see the
    * scale paragraph), the Resource-Allocation index over the same
    * capped centers (Zhou/Lü/Zhang 2009: Σ over common neighbors w of
    * 1/deg(w) — Adamic–Adar's log replaced by the plain reciprocal,
    * which both outperforms it in the paper's benchmarks and keeps
    * the score libm-free), and the neighborhood Jaccard
    * cn/(deg_a + deg_b − cn) — capped cn over UNCAPPED endpoint
    * degrees, so pairs adjacent to hubs score conservatively low. The "which sources co-occur
    * with my trusted sources but aren't linked yet" crawl-frontier
    * expansion signal, and the graph sibling of the dedup tier's
    * candidate generation.
    *
    * Scale shape — WEDGES THROUGH CENTERS, capped: candidate pairs
    * are generated only through shared neighbors (per center w, its
    * C(deg_w, 2) neighbor pairs), never by node × node. A center's
    * fan-out is quadratic in ITS degree, so hubs above `maxCenterDeg`
    * are excluded from centering (documented truncation, same family
    * as the sparse-cosine df cap — and principled here: a hub
    * contributes only 1/deg ≈ 0 Resource-Allocation mass and
    * certifies no meaningful similarity, exactly the stop-gram
    * argument). Scoring is one partial-agg groupBy over wedge tuples;
    * adjacency removal is an anti join against the canonical edge
    * set; the final top-k is TakeOrdered, never a global sort.
    *
    * Cross-engine-exact: cn and degrees are integers; each 1/deg(w)
    * term quantizes to the 2⁻³⁰ grid so the RA sum is exact and
    * order-independent; Jaccard is one fixed-shape IEEE division.
    * Ordering (ra desc, cn desc, a, b) is unique per pair — ties
    * break on the pair itself. Returns (a, b, cn, ra, jaccard) with
    * cn/ra/jaccard all on the capped-center contract above. */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
                     k: Int, maxCenterDeg: Long = 10000L): DataFrame = {
    require(k >= 1 && maxCenterDeg >= 2)
    val canon = canonicalUndirected(edges, aCol, bCol)
      .localCheckpoint() // feeds degrees, adjacency, the closing anti join
    val deg = undirectedDegrees(canon)
      .localCheckpoint() // node-sized; feeds the center cap + endpoint joins
    val adj = canon.select(col("lo").as("w"), col("hi").as("n"))
      .union(canon.select(col("hi").as("w"), col("lo").as("n")))
    val aw = adj
      .join(deg.select(col("id").as("w"), col("deg").as("dw")), Seq("w"))
      .filter(col("dw") <= maxCenterDeg)
      .localCheckpoint() // both sides of the wedge self-join
    val scored = aw.select(col("w"), col("dw"), col("n").as("lo"))
      .join(aw.select(col("w"), col("n").as("hi")), Seq("w"))
      .filter(col("lo") < col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("cn"), sum(q30(lit(1.0) / col("dw"))).as("ra"))
    // TakeOrdered FIRST: the sort key (ra, cn, lo, hi) is complete
    // before the degree joins, which are lossless (every endpoint is
    // in deg) — so attach degrees and the Jaccard projection to the k
    // survivors only, not the candidate-scale open-pair set.
    val top = scored
      .join(canon, Seq("lo", "hi"), "left_anti") // keep OPEN pairs only
      .orderBy(col("ra").desc, col("cn").desc, col("lo").asc, col("hi").asc)
      .limit(k)
    top
      .join(deg.select(col("id").as("lo"), col("deg").as("da")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("db")), Seq("hi"))
      .select(col("lo").as("a"), col("hi").as("b"), col("cn"), col("ra"),
        (col("cn").cast("double") /
          (col("da") + col("db") - col("cn")).cast("double")).as("jaccard"))
      .orderBy(col("ra").desc, col("cn").desc, col("a").asc, col("b").asc)
  }

  /** Bounded-hop weighted shortest distances (synchronous
    * Bellman–Ford): min total edge cost from the nearest seed over
    * paths of at most `rounds` edges — [[bfsDistances]]'s weighted
    * sibling, for graphs where links carry a traversal cost rather
    * than unit hops. Directed edges; callers double for undirected;
    * parallel edges collapse to their MIN cost (only the cheapest
    * matters to any shortest path). Seeds outside the node set are
    * ignored. Costs must be non-negative integers (exact min-plus
    * arithmetic → the unrolled-CTE oracle compares bit-for-bit; a
    * negative cost would also break the ≤r-hop-minimum semantics).
    *
    * Scale shape: per round, one join of the node-sized distance
    * frame against the edge list and a min-reduce — the edge table is
    * scanned once per round, lineage truncates per round
    * (localCheckpoint), no driver collect. Early exit at the fixed
    * point: min-plus updates are monotone, so a round that improves
    * no distance pins every later round — identical result, fewer
    * jobs. Returns (id, dist) for every node reachable in ≤ rounds
    * hops. */
  /** @param assumeMinCollapsed the caller vouches `edges` already
    *   carries ONE row per (src, dst) arc (parallel edges pre-collapsed
    *   to their min cost) and is cheap to re-evaluate (a union over
    *   its own checkpoint — the gated caller's doubled build), so the
    *   collapse's exchange + re-checkpoint are skipped; the
    *   null/negative-cost filter still applies. */
  def weightedSssp(edges: DataFrame, srcCol: String, dstCol: String,
                   costCol: String, seeds: DataFrame, seedCol: String,
                   rounds: Int, assumeMinCollapsed: Boolean = false): DataFrame = {
    require(rounds >= 1)
    val eSel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(costCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull && col("w") >= 0)
    val e = if (assumeMinCollapsed) eSel
      else eSel.groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .localCheckpoint() // scanned once per round
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
      .select(col("id"), lit(0L).as("dist"))
      .localCheckpoint()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val relaxed = dist
        .join(e.select(col("src").as("id"), col("dst"), col("w")), Seq("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      // fixed point: every (id, dist) unchanged — min-plus is
      // monotone, so no later round can differ either. The change
      // count RIDES the round checkpoint's materialization as an
      // observe metric over a node-sized join with the previous
      // frame (min-plus never loses an id, so "no new id and no
      // changed dist" ⇔ the former anti-join probe's emptiness) —
      // the probe job per non-final round disappears (r16; the
      // LPA / duplicateClusters convergence pattern).
      val obs = org.apache.spark.sql.Observation()
      val next = dist.unionByName(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .join(dist.select(col("id"), col("dist").as("__old")), Seq("id"), "left")
        .observe(obs, sum(when(col("__old").isNull ||
          col("__old") =!= col("dist"), 1L).otherwise(0L)).as("changed"))
        .select(col("id"), col("dist"))
        .localCheckpoint()
      r += 1
      // sum over an empty frame is null — trivially converged
      converged = Option(obs.get("changed")).forall(_.asInstanceOf[Long] == 0L)
      dist = next
    }
    dist
  }

  /** Multi-source BFS distances: hop distance from the nearest seed,
    * bounded at `maxDepth` — the "link distance from trusted sources"
    * signal crawl curation budgets depth by (and the discrete
    * companion to [[personalizedPageRank]]'s continuous proximity).
    * Directed edges; callers double for undirected. Seeds outside the
    * graph's node set are ignored; returns (id, dist) for every
    * reached node, dist ∈ [0, maxDepth], exact integers → the
    * unrolled-CTE oracle compares bit-for-bit.
    *
    * Scale shape: classic frontier expansion — per hop, one join of
    * the (shrinking) frontier against the edge list, a distinct, and
    * an anti-join against the reached set; the reached frame is
    * node-sized and each hop's lineage truncates. No collect, no
    * global sort, and the edge list is touched once per hop. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   maxDepth: Int, assumeDistinct: Boolean = false): DataFrame = {
    require(maxDepth >= 1)
    val eSel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (assumeDistinct) eSel else eSel.distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var reached = seeds.select(col(seedCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
      .select(col("id"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = reached.select(col("id"))
    for (r <- 1 to maxDepth) {
      frontier = frontier
        .join(e.select(col("src").as("id"), col("dst")), Seq("id"))
        .select(col("dst").as("id")).distinct()
        .join(reached, Seq("id"), "left_anti")
        .localCheckpoint() // feeds the reached union AND the next hop
      // reached stays a LAZY union of the checkpointed levels: every
      // leg is already materialized, so the per-hop anti-join (and the
      // final result) just reads their cached blocks — checkpointing
      // the union again was one pure extra job per hop (bfs13 A/B).
      reached = reached
        .unionByName(frontier.select(col("id"), lit(r).as("dist")))
    }
    reached
  }

  /** HITS hubs-and-authorities with L∞ (max) normalization — max is
    * order-independent, so unlike the customary L2 norm it needs no
    * exact-sum-of-squares gymnastics: a'(v) = q(Σ_{u→v} h(u)) / max,
    * h'(u) = q(Σ_{u→v} a(v)) / max, each re-quantized to the grid.
    * Returns (id, kind 'hub'|'auth', score); a node that is both a
    * source and a target carries two rows. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    // one checkpoint for the initial hub frame (the former srcs
    // checkpoint + hubs checkpoint chained two jobs for one frame);
    // the initial auth frame is NEVER consumed when iters ≥ 1 (the
    // loop reassigns `auths` before its first read), so it stays a
    // LAZY projection — its former eager checkpoint was a dead job
    var hubs = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1.0).as("h")).localCheckpoint()
    var auths = e.select(col("dst").as("id")).distinct()
      .select(col("id"), lit(1.0).as("a"))
    // Per half-step only the RAW-sum frame is checkpointed: the
    // all-lazy spelling (raw frame re-derived under both the max
    // branch and the normalized projection) measured SLOWER in the
    // round-13 subset A/B (+1.6 s — the e⋈ranks join recomputes under
    // the max branch; ReuseExchange does not recover it), the same
    // negative result as sparse13b's all-lazy form. The max itself
    // RIDES that checkpoint's materialization as an observe metric
    // (max is order-independent, so the streamed fold sees the same
    // value as the former separate aggregation job — bit-identical),
    // and the normalization becomes a trivial projection of the
    // checkpointed blocks against a driver literal: the former
    // per-half-step max-broadcast build and normalized-frame
    // checkpoint jobs (6 + 6 per query at 3 iters) disappear (r16).
    for (_ <- 1 to iters) {
      val aObs = org.apache.spark.sql.Observation()
      val aRaw = e.join(hubs.select(col("id").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(q30(col("h"))).as("raw"))
        .observe(aObs, max(col("raw")).as("mx"))
        .localCheckpoint()
      // null metric ⇔ empty raw frame: the projection below is then
      // empty regardless of the literal — NaN only keeps lit() typed
      val aMx = Option(aObs.get("mx")).fold(Double.NaN)(_.asInstanceOf[Double])
      auths = aRaw.select(col("id"), q30(col("raw") / lit(aMx)).as("a"))
      val hObs = org.apache.spark.sql.Observation()
      val hRaw = e.join(auths.select(col("id").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum(q30(col("a"))).as("raw"))
        .observe(hObs, max(col("raw")).as("mx"))
        .localCheckpoint()
      val hMx = Option(hObs.get("mx")).fold(Double.NaN)(_.asInstanceOf[Double])
      hubs = hRaw.select(col("id"), q30(col("raw") / lit(hMx)).as("h"))
    }
    hubs.select(col("id"), lit("hub").as("kind"), col("h").as("score"))
      .unionByName(auths.select(col("id"), lit("auth").as("kind"),
        col("a").as("score")))
  }
}
