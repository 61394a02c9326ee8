package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: hub of a star outranks leaves; mass conserved; teleport floor") {
    // star: every leaf links to the center, center links back to leaf 1
    val edges = ((1L to 20L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 21)
    val center = ranks(0L)
    assert((2L to 20L).forall(i => center > ranks(i)),
      s"center must outrank plain leaves: $ranks")
    assert(ranks(1L) > ranks(2L), "the center's sole link target ranks above peers")
    // total mass stays 1 within quantization (21 nodes x 2^-30 per step)
    val mass = ranks.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted: $mass")
    // teleport floor: every node holds at least (1-d)/N
    assert(ranks.values.forall(_ >= 0.125 / 21 - 1e-9))
  }

  test("pageRank: dangling sink's mass redistributes instead of leaking") {
    // chain into a sink: 1 -> 2 -> 3 (3 has no out-edges)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mass = ranks.values.sum
    assert(math.abs(mass - 1.0) < 1e-6,
      s"dangling mass must be redistributed, not dropped: $mass")
    assert(ranks(3L) > ranks(2L) && ranks(2L) > ranks(1L),
      s"rank must accumulate down the chain: $ranks")
  }

  test("hits: the authority everyone cites and the hub citing both top their sides") {
    // hubs 10,11,12 -> auths 1,2; hub 10 cites both, auth 1 cited by all
    val edges = Seq((10L, 1L), (10L, 2L), (11L, 1L), (12L, 1L))
      .toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out((1L, "auth")) == 1.0, "most-cited node is the max-normalized auth")
    assert(out((1L, "auth")) > out((2L, "auth")))
    assert(out((10L, "hub")) == 1.0, "the hub citing both auths normalizes to 1")
    assert(out((11L, "hub")) == out((12L, "hub")))
    assert(out((10L, "hub")) > out((11L, "hub")))
  }

  test("personalized pageRank: mass localizes around the seed set") {
    // two 4-cycles bridged by one edge; seed sits in the left cycle
    val left = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val right = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val edges = (left ++ right :+ (3L, 10L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("seed")
    val ranks = Graph.personalizedPageRank(edges, "src", "dst", seeds, "seed",
      iters = 30).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 8)
    val leftMass = Seq(0L, 1L, 2L, 3L).map(ranks).sum
    val rightMass = Seq(10L, 11L, 12L, 13L).map(ranks).sum
    // the bridge is one-way (3 -> 10, no return), so the right cycle
    // drains a sizable share — but the seeded side must still hold more
    assert(leftMass > rightMass,
      s"seeded cycle must hold most of the walk mass: $ranks")
    assert(ranks(0L) == ranks.values.max, "the seed itself ranks highest")
    // rank decays with distance from the seed along the bridge
    assert(ranks(10L) > ranks(12L), s"bridge head outranks the far side: $ranks")
    val mass = ranks.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"walk mass drifted: $mass")
    // a seed not present in the graph contributes nothing (and the
    // in-graph seed still normalizes over the INTERSECTED set)
    val ranks2 = Graph.personalizedPageRank(edges, "src", "dst",
      Seq(0L, 999L).toDF("seed"), "seed", iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks2 == ranks, "off-graph seeds must be ignored, not dilute")
  }

  test("weighted pageRank: contributions split by weight; unit weights == unweighted") {
    // node 0 links 1 with weight 9 and 2 with weight 1; 1,2 link back
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val ranks = Graph.pageRankWeighted(edges, "src", "dst", "w", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(1L) > ranks(2L),
      s"the 9x-weighted target must outrank the 1x one: $ranks")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6, "mass conserved")
    // degenerate weights: all-1 weighted run is BIT-IDENTICAL to the
    // unweighted operator (rank*1/W == rank/deg exactly)
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val unit = ring.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val a = Graph.pageRankWeighted(unit, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(ring, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, s"unit-weight run must equal the unweighted one: $a vs $b")
    // parallel edges pre-aggregate: duplicating an edge row with w=1
    // twice equals one w=2 row
    val dup = Seq((0L, 1L, 1L), (0L, 1L, 1L), (1L, 0L, 1L))
      .toDF("src", "dst", "w")
    val agg = Seq((0L, 1L, 2L), (1L, 0L, 1L)).toDF("src", "dst", "w")
    val ra = Graph.pageRankWeighted(dup, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rb = Graph.pageRankWeighted(agg, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ra == rb, "parallel edges must fold into their weight sum")
    // assumeCollapsed on already-collapsed positive-integral edges is
    // BIT-IDENTICAL to the default path (the skipped collapse is the
    // identity there) — the r16 caller-side pre-collapse contract
    val rc = Graph.pageRankWeighted(agg, "src", "dst", "w", iters = 3,
        assumeCollapsed = true)
      .collect().map(r => r.getLong(0) -> java.lang.Double
        .doubleToRawLongBits(r.getDouble(1))).toMap
    val rd = rb.map { case (k, v) =>
      k -> java.lang.Double.doubleToRawLongBits(v) }
    assert(rc == rd, "assumeCollapsed must not change a single bit")
  }

  test("warm-start pageRank re-converges in a fraction of the cold iterations") {
    // steady-state HUB-HEAVY graph (fixpoint far from the uniform cold
    // start): 40 leaves each cite one of 5 hubs, hubs cycle among
    // themselves; "today" adds 3 leaf edges
    val leaves = (10L until 50L).map(i => (i, i % 5))
    val hubs = (0L until 5L).map(i => (i, (i + 1) % 5))
    val old = (leaves ++ hubs).toDF("src", "dst")
    val grown = (leaves ++ hubs ++ Seq((17L, 23L), (31L, 4L), (44L, 12L)))
      .toDF("src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def linf(a: Map[Long, Double], b: Map[Long, Double]): Double =
      a.keys.map(k => math.abs(a(k) - b(k))).max
    val prev = Graph.pageRank(old, "src", "dst", iters = 25)
    val truth = toMap(Graph.pageRank(grown, "src", "dst", iters = 40))
    val warm2 = toMap(Graph.pageRankWarm(grown, "src", "dst", prev, iters = 2))
    val cold2 = toMap(Graph.pageRank(grown, "src", "dst", iters = 2))
    val cold8 = toMap(Graph.pageRank(grown, "src", "dst", iters = 8))
    assert(linf(warm2, truth) < linf(cold2, truth) / 4,
      s"warm start must be far closer than a cold run of the same length: " +
        s"warm2=${linf(warm2, truth)} cold2=${linf(cold2, truth)}")
    assert(linf(warm2, truth) <= linf(cold8, truth) * 1.2,
      s"2 warm iterations must match ~8 cold ones: " +
        s"warm2=${linf(warm2, truth)} cold8=${linf(cold8, truth)}")
  }

  test("triangles: K4 corners, pendant/self-loop/duplicate/reversal immunity") {
    // K4 on 1..4 (4 triangles, each node on 3), a pendant 4-5, an
    // isolated edge 10-11; edges arrive messy: reversed, duplicated,
    // with a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L), (10L, 11L), (7L, 7L))
      .toDF("a", "b")
    val tri = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 must yield 3 triangles per corner and nothing else: $tri")
    // a skew-shaped star (hub 0 to 50 leaves + one leaf-leaf edge):
    // exactly one triangle, and the orientation keeps the hub's
    // out-degree at 0 (everything points AT the high-degree node)
    val star = ((1L to 50L).map(i => (0L, i)) :+ (1L, 2L)).toDF("a", "b")
    val striX = Graph.triangleCounts(star, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(striX == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
      s"star + chord = one triangle: $striX")
    // a graph with ZERO valid edges (only self-loops/nulls, all
    // dropped by canonicalization) must return the empty frame, not
    // throw — the closing-edge Bloom build clamps its item estimate
    // to 1 because BloomFilterAggregate rejects 0
    val degenerate = Seq((7L, 7L), (8L, 8L)).toDF("a", "b")
    assert(Graph.triangleCounts(degenerate, "a", "b").count() == 0L,
      "self-loop-only graph must yield zero triangle rows")
    assert(Graph.clusteringCoefficient(degenerate, "a", "b").count() == 0L,
      "self-loop-only graph must yield zero coefficient rows")
  }

  test("kCore: cascade peels the chain off a clique, fixed rounds truncate") {
    // K4 on 1..4 with a pendant chain 4-5-6: the 2-core is exactly the
    // clique — node 6 (deg 1) falls round 1, which drops 5 to deg 1 so
    // it falls round 2: a genuine cascade, not a one-shot filter
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    def run(rounds: Int) = Graph.kCore(edges, "a", "b", k = 2L, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"2 rounds must fully peel the chain: ${run(2)}")
    // one round is NOT enough: 5 still holds degree 2 (edges to 4, 6)
    // when 6 falls, so the fixed-round contract is observable
    val r1 = run(1)
    assert(r1.contains(5L) && r1(5L) == 1L,
      s"round 1 keeps 5 with its post-peel degree: $r1")
    // k above the clique degree empties the graph
    assert(Graph.kCore(edges, "a", "b", k = 4L, rounds = 3).count() == 0L)
  }

  test("clusteringCoefficient: clique 1.0, chord-carrier 0.5, chain 0, deg-1 dropped") {
    // K4 on 1..4 plus a pendant chain 4-5-6 (the kCore fixture):
    // clique-only nodes are fully clustered; 4 carries an unlinked
    // neighbor; 5's two neighbors are unlinked; 6 has no neighbor pair
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val c = Graph.clusteringCoefficient(edges, "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(c == Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)), 3L -> ((3L, 3L, 1.0)),
      4L -> ((4L, 3L, 0.5)), 5L -> ((2L, 0L, 0.0))),
      s"unexpected coefficients: $c")
  }

  test("degreeAssortativity: path r = -0.5; regular graph degenerates to null") {
    // path 1-2-3-4: endpoint-degree pairs (1,2),(2,2),(2,1) -> the
    // textbook r = -1/2 (ends drag the correlation negative)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val row = Graph.degreeAssortativity(path, "a", "b").collect().head
    assert(row.getLong(0) == 3L && row.getLong(1) == 10L &&
      row.getLong(2) == 18L && row.getLong(3) == 8L,
      s"integer sums: $row")
    // -1/2 in exact arithmetic; the fixed-shape IEEE evaluation lands
    // within ulps of it (the gate needs bit-STABILITY across engines,
    // not rational exactness)
    assert(math.abs(row.getDouble(4) + 0.5) < 1e-12,
      s"path assortativity: $row")
    // a triangle is 2-regular: zero degree variance -> guarded null,
    // never an IEEE NaN (which would not hash-compare)
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    assert(Graph.degreeAssortativity(tri, "a", "b").collect().head.isNullAt(4))
  }

  test("degreeAssortativity: nondeterministic edges take the snapshot-pin branch") {
    // a rand()-filtered edge list would feed INCONSISTENT rows to the
    // two deg joins under lazy recomputation; the operator must pin one
    // snapshot. Sampling at p=1.0 keeps the plan nondeterministic (the
    // rand() predicate is still there) while making the EXPECTED result
    // exact — the full path fixture, r = -0.5.
    val nd = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
      .filter(rand(7L) <= 1.0)
    val row = Graph.degreeAssortativity(nd, "a", "b").collect().head
    assert(row.getLong(0) == 3L && math.abs(row.getDouble(4) + 0.5) < 1e-12,
      s"pinned nondeterministic input: $row")
  }

  test("bfsDistances: nearest-seed hops, depth bound, off-graph seeds ignored") {
    // chain 1->2->3->4->5 plus a second seed 10 -> 4: node 4 is 3 hops
    // from seed 1 but 1 hop from seed 10 — min wins; 5 sits at depth 2
    // via 10; depth bound 2 leaves nothing unreached here except via
    // the bound itself
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 10L, 999L).toDF("seed") // 999 off-graph
    val d2 = Graph.bfsDistances(edges, "src", "dst", seeds, "seed", 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d2 == Map(1L -> 0, 10L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2),
      s"2-hop distances: $d2")
    // depth 1 truncates the far chain
    val d1 = Graph.bfsDistances(edges, "src", "dst", seeds, "seed", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(1L -> 0, 10L -> 0, 2L -> 1, 4L -> 1),
      s"1-hop distances: $d1")
  }

  test("labelPropagation: bridged cliques resolve to two communities") {
    // triangles {1,2,3} and {10,11,12} bridged by 3-10; undirected via
    // doubling. Hand-run of the synchronous min-tie-break dynamics:
    // round 1 all-distinct ties, round 2 left clique locks to 1, round
    // 3 the right side unifies on label 3 (imported over the bridge).
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labs = Graph.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L),
      s"two communities expected: $labs")
    // an in-degree-0 node keeps its own label (directed edge only out)
    val withSink = (und ++ und.map(_.swap) :+ (99L, 1L)).toDF("src", "dst")
    val labs2 = Graph.labelPropagation(withSink, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs2(99L) == 99L, s"isolated-in node must self-label: $labs2")
  }

  test("linkPrediction: CN/RA/Jaccard hand-check, adjacency excluded, hub cap") {
    // square 1-2-3-4-1 plus chord 1-3: open pairs are only (2,4)
    // (common neighbors 1 and 3, both deg 3 → RA = 2·q(1/3)), since
    // (1,3) is closed by the chord. deg(2) = deg(4) = 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = Graph.linkPrediction(edges, "a", "b", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val q3 = math.floor((1.0 / 3) * 1073741824.0 + 0.5) / 1073741824.0
    assert(got.toSeq == Seq((2L, 4L, 2L, 2 * q3, 2.0 / (2 + 2 - 2))),
      s"unexpected predictions: ${got.mkString(";")}")
    // hub cap: with maxCenterDeg = 2 the deg-3 centers 1 and 3 are
    // excluded; centers 2 and 4 each generate only the wedge (1, 3),
    // which is CLOSED by the chord — nothing survives the anti join
    val cappedPairs = Graph.linkPrediction(edges, "a", "b", k = 10,
      maxCenterDeg = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cappedPairs.isEmpty, s"cap must drop deg-3 centers: $cappedPairs")
    // k truncates deterministically: star 0-{1..5} has C(5,2)=10 open
    // leaf pairs, all identical scores — top-3 is the (a, b) smallest
    val star = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val top3 = Graph.linkPrediction(star, "a", "b", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top3 == Seq((1L, 2L), (1L, 3L), (1L, 4L)), s"tie order: $top3")
  }

  test("weightedSssp: min-cost paths, hop bound, min-collapse, early exit") {
    // 1 →(1) 2 →(1) 3, plus a direct 1 →(5) 3 and a parallel 1 →(9) 3:
    // dist(3) should be 2 via the two-hop path once rounds ≥ 2, and 5
    // after round 1 (the parallel 9 collapses to the min 5 first).
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (1L, 3L, 9L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("seed")
    def distsAt(rounds: Int) =
      Graph.weightedSssp(edges, "src", "dst", "w", seeds, "seed", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distsAt(1) == Map(1L -> 0L, 2L -> 1L, 3L -> 5L),
      s"1 round: ${distsAt(1)}")
    assert(distsAt(3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"3 rounds: ${distsAt(3)}")
    // early exit: 10 rounds returns the 3-round fixed point (graph
    // diameter 3), identical map — and unreached nodes stay absent
    assert(distsAt(10) == distsAt(3), "fixed point must be stable")
    // off-graph seeds are ignored; an empty seed set reaches nothing
    val off = Graph.weightedSssp(edges, "src", "dst", "w",
      Seq(42L).toDF("seed"), "seed", 2)
    assert(off.count() == 0L, "off-graph seed must reach nothing")
  }

  test("pageRank plan: ranks stay distributed — no collect, iteration-sized lineage") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 2)
    // localCheckpoint truncation: the final plan must not contain the
    // full 2-iteration join cascade (checkpointed scans instead)
    val plan = ranks.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      s"iterations must be lineage-truncated:\n$plan")
  }
}
