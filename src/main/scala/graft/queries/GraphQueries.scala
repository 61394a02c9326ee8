package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Link-graph authority queries (crawl-curation signals): PageRank and
  * HITS over the customer↔supplier purchase graph (orders ⋈ lineitem —
  * the repo fixture's stand-in for a URL/domain link graph). Both are
  * fixed-iteration power iterations with 2⁻³⁰-grid contributions, so
  * the DuckDB oracles (iterations unrolled into chained CTEs) compare
  * bit-for-bit — see [[graft.operators.Graph]].
  */
object GraphQueries {

  private val Iters = 3
  private val Q = "1073741824.0" // 2^30, the dyadic contribution grid

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** The DOUBLED (both-direction) customer↔supplier purchase graph —
    * the one edge set graph_pagerank / graph_ppr / graph_lpa all walk
    * (mirrors the shared `pairsCte` on the oracle side; one
    * definition, no Spark/SQL drift across the three queries). */
  private def doubledPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val o = tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = tbl(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    // The downstream `assumeDistinct = true` vouches the doubled union
    // cannot collide, which holds ONLY while cust ids stay strictly
    // below the supp offset (TPC-H custkey reaches 1e6 at sf≈6.7 —
    // past that, forward and reverse edges could alias and silently
    // double-count votes). Guard IN-PLAN: one codegen'd comparison
    // per row, failing loudly instead of corrupting counts.
    val SuppOffset = 1000000L
    val custGuarded = when(col("o_custkey") >= SuppOffset,
      raise_error(concat(lit(s"custkey overlaps the supp id offset $SuppOffset" +
        " — doubled edges would alias: "), col("o_custkey").cast("string"))))
      .otherwise(col("o_custkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(custGuarded.as("cust"),
        (col("l_suppkey") + SuppOffset).as("supp"))
      .distinct()
      .localCheckpoint() // feeds BOTH branches of the doubled union
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** The part CO-PURCHASE projection (parts sharing an order are
    * adjacent) — the undirected graph graph_triangles / graph_kcore
    * decompose (mirrors `coPurchaseCte`). TPC-H baskets are ≤7 lines,
    * so the projection's fan-out is bounded by construction — the
    * general basket guard lives in Association.pairRules. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // ONE shuffle: collect_set dedups (order, part) AND groups the
    // basket in the same exchange, then the ≤7-item basket expands to
    // its a<b pairs by a shuffle-free double explode — same pair
    // multiset as the former distinct + self-join spelling, minus a
    // corpus reshuffle (the old li.distinct hash-partitioned on
    // (ok, pk), so the ok-keyed self-join repartitioned BOTH sides).
    // null keys drop explicitly: the old self-join spelling (and the
    // oracle's) never equi-joined a NULL orderkey, but groupBy would
    // happily collect all null-key rows into one phantom basket
    tbl(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("ok").isNotNull && col("pk").isNotNull)
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
  }

  /** SQL spelling of [[coPurchaseEdges]] + canonicalization, shared by
    * the triangles and k-core oracles. MATERIALIZED pins linear (not
    * re-inlined) evaluation under the multi-referencing round CTEs. */
  private val coPurchaseCte =
    """li AS MATERIALIZED (
         SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       canon AS MATERIALIZED (
         SELECT DISTINCT a.pk AS lo, b.pk AS hi
         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk)"""

  val queries: Map[String, QueryFn] = Map(

    // Damped PageRank over the DOUBLED (both-direction) purchase graph
    // — supplier/customer authority from purchase structure, the
    // centrality a crawl pipeline budgets sources by.
    "graph_pagerank" -> ((s, d) =>
      // doubled distinct pairs with disjoint cust/supp id ranges are
      // distinct by construction, and the union reads the caller's own
      // checkpoint — skip the operator's multigraph collapse (r16)
      Graph.pageRank(doubledPurchaseEdges(s, d), "src", "dst", iters = Iters,
        assumeDistinct = true)),

    // WEIGHTED PageRank: the purchase multigraph keeps its edge
    // multiplicities (one weight unit per order linking the pair) and
    // contributions split proportionally — the authority signal real
    // link graphs (domains linking 500× vs once) actually need.
    "graph_pagerank_w" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      // same in-plan id-range guard as doubledPurchaseEdges: the
      // downstream `assumeCollapsed = true` vouches the doubled union
      // is one row per arc, which holds ONLY while cust ids stay
      // strictly below the supp offset — fail loudly, not silently
      val SuppOffset = 1000000L
      val custGuarded = when(col("o_custkey") >= SuppOffset,
        raise_error(concat(lit(s"custkey overlaps the supp id offset " +
          s"$SuppOffset — doubled edges would alias: "),
          col("o_custkey").cast("string"))))
        .otherwise(col("o_custkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(custGuarded.as("cust"),
          (col("l_suppkey") + SuppOffset).as("supp"), col("o_orderkey"))
        .distinct() // one row per (cust, supp, order) = one weight unit
        .groupBy(col("cust"), col("supp")).agg(count(lit(1)).as("w"))
        .localCheckpoint() // feeds BOTH branches of the doubled union
      val edges = pairs
        .select(col("cust").as("src"), col("supp").as("dst"), col("w"))
        .unionByName(pairs
          .select(col("supp").as("src"), col("cust").as("dst"), col("w")))
      // grouped pairs doubled over disjoint id ranges are one row per
      // arc by construction, over the caller's own checkpoint — skip
      // the operator's collapse exchange + checkpoint (r16)
      Graph.pageRankWeighted(edges, "src", "dst", "w", iters = Iters,
        assumeCollapsed = true)
    }),

    // HITS on the DIRECTED bipartite graph (cust → supp): customers are
    // hubs, suppliers authorities — the two-sided quality signal for
    // linker-vs-linked curation.
    "graph_hits" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      // no caller-side distinct: hits() collapses the multigraph
      // itself — the former spelling paid that exchange twice (r16)
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      Graph.hits(edges, "src", "dst", iters = Iters)
    }),

    // Personalized PageRank from a trusted seed set (BUILDING-segment
    // customers): teleport mass re-enters only through the seeds, so
    // rank = random-walk proximity to them — the seed-expansion
    // primitive crawl curation ranks unlabeled sources with.
    "graph_ppr" -> ((s, d) => {
      val seeds = tbl(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("seed"))
      Graph.personalizedPageRank(doubledPurchaseEdges(s, d), "src", "dst",
        seeds, "seed", iters = Iters, assumeDistinct = true)
    }),

    // Per-node triangle counts over the part CO-PURCHASE projection
    // (parts sharing an order are adjacent; TPC-H baskets are ≤7
    // lines, so the projection's fan-out is bounded by construction —
    // the general basket guard lives in Association.pairRules). The
    // operator's degree-ordered orientation bounds the wedge space at
    // O(m^1.5) regardless of part popularity skew; counts are exact
    // integers, so the SQL spelling of the same orientation compares
    // bit-for-bit. The local-density / community-vs-spam-farm signal
    // of link-graph curation.
    "graph_triangles" -> ((s, d) =>
      Graph.triangleCounts(coPurchaseEdges(s, d), "a", "b")),

    // Local clustering coefficient (2·tri / deg·(deg−1)) on the same
    // projection: the per-node fraction of linked neighbor pairs —
    // community density vs spam-farm sparsity, read per node. Exact
    // integer inputs, one fixed-shape IEEE expression → bit-exact.
    "graph_clustering" -> ((s, d) =>
      Graph.clusteringCoefficient(coPurchaseEdges(s, d), "a", "b")),

    // Multi-source BFS: hop distance from the BUILDING-segment seed
    // set over the doubled purchase graph, bounded at 3 — the
    // discrete link-distance companion to graph_ppr's random-walk
    // proximity (crawl pipelines budget fetch depth by exactly this).
    "graph_bfs_dist" -> ((s, d) => {
      val seeds = tbl(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("seed"))
      Graph.bfsDistances(doubledPurchaseEdges(s, d), "src", "dst",
        seeds, "seed", maxDepth = 3, assumeDistinct = true)
    }),

    // Link prediction over the bipartite purchase graph: supplier (and
    // customer) pairs sharing many counterparties but not yet linked,
    // scored by common neighbors / Resource-Allocation / Jaccard —
    // the crawl-frontier "sources co-cited with my trusted sources"
    // expansion signal. Wedge centers cap at degree 500, which here
    // excludes the supplier hubs (each serving hundreds of customers,
    // whose wedge fan-out is quadratic and whose 1/deg RA mass ≈ 0)
    // and keeps the customer centers — the oracle mirrors the cap.
    "graph_linkpred" -> ((s, d) => {
      val pairs = tbl(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(tbl(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + 1000000L).as("b"))
      Graph.linkPrediction(pairs, "a", "b", k = 100, maxCenterDeg = 500L)
    }),

    // Bounded-hop WEIGHTED shortest distances (3 synchronous
    // Bellman-Ford rounds) from the BUILDING seed set, edge cost =
    // the pair's minimum purchase quantity — graph_bfs_dist's
    // weighted sibling (nearest trusted source by traversal COST, not
    // hops). Exact min-plus integers → the unrolled-CTE oracle
    // compares bit-for-bit.
    "graph_sssp" -> ((s, d) => {
      val o = tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, d, "lineitem").select(col("l_orderkey"),
        col("l_suppkey"), col("l_quantity"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("cust"),
          (col("l_suppkey") + 1000000L).as("supp"))
        .agg(min(floor(col("l_quantity").cast("double") + lit(0.5))
          .cast("long")).as("w"))
        .localCheckpoint() // feeds BOTH branches of the doubled union
      val edges = pairs
        .select(col("cust").as("src"), col("supp").as("dst"), col("w"))
        .unionByName(pairs
          .select(col("supp").as("src"), col("cust").as("dst"), col("w")))
      val seeds = tbl(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("seed"))
      // one row per arc by construction (grouped pairs, disjoint
      // doubled directions) over the caller's own checkpoint — skip
      // the operator's min-collapse exchange (r16)
      Graph.weightedSssp(edges, "src", "dst", "w", seeds, "seed", rounds = 3,
        assumeMinCollapsed = true)
    }),

    // Degree assortativity of the co-purchase projection: the
    // one-number peer-community-vs-hub-and-spoke fingerprint. Four
    // exact integer sums in one partial-agg pass; r is fixed-shape
    // IEEE on them — bit-exact, no grid.
    "graph_assortativity" -> ((s, d) =>
      Graph.degreeAssortativity(coPurchaseEdges(s, d), "a", "b")),

    // Synchronous label-propagation communities over the DOUBLED
    // purchase graph: finer than graph_components (which fuses
    // everything reachable), far cheaper than modularity methods —
    // the deterministic min-label tie-break + fixed rounds make the
    // classic run-order-dependent algorithm differentially gateable.
    "graph_lpa" -> ((s, d) =>
      // doubled distinct pairs with disjoint cust/supp id ranges are
      // distinct by construction — skip the multigraph collapse
      Graph.labelPropagation(doubledPurchaseEdges(s, d), "src", "dst",
        iters = Iters, assumeDistinct = true)),

    // k-core peel (k=70, 4 synchronous rounds) of the same
    // co-purchase projection: each round simultaneously drops every
    // node currently under 70 neighbors — at sf0.001 the peel
    // cascades 185 → 177 → 169 → 153 across all four rounds (the
    // dense-community-vs-fringe cut curation budgets crawl depth by);
    // k sits below the sf0.001 core so the smoke fixture keeps rows.
    // Fixed-round contract keeps the unrolled-CTE oracle bit-exact
    // (integer degrees).
    "graph_kcore" -> ((s, d) =>
      Graph.kCore(coPurchaseEdges(s, d), "a", "b", k = 70L, rounds = 4)),

    // Connected components of a SPARSE purchase subgraph (urgent
    // orders, near-full-quantity lines): exact min-label fixpoint via
    // the pointer-jumping propagation the dedup tier already runs —
    // integer labels, so the DuckDB recursive-CTE closure compares
    // bit-for-bit (Dedup.duplicateClusters).
    "graph_components" -> ((s, d) => {
      val o = tbl(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = tbl(s, d, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("id_a"),
          (col("l_suppkey") + 1000000L).as("id_b"))
        .distinct()
      graft.operators.Dedup.duplicateClusters(pairs, "id_a", "id_b",
        maxIters = 30)
    }))

  /** The shared edge CTEs of both oracles. */
  private val pairsCte =
    """pairs AS (
         SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey)"""

  private def pagerankSql: String = {
    val iterCtes = (1 to Iters).map { k =>
      val p = k - 1
      s"""dm$k AS (
            SELECT coalesce(sum(rank), 0.0) AS dm
            FROM r$p r LEFT JOIN outdeg o ON r.id = o.id WHERE o.id IS NULL),
          c$k AS (
            SELECT e.dst, sum(floor(r.rank / o.deg * $Q + 0.5) / $Q) AS s
            FROM edges e JOIN r$p r ON e.src = r.id
            JOIN outdeg o ON o.id = e.src
            GROUP BY e.dst),
          r$k AS (
            SELECT nodes.id,
              floor((0.125 / n + 0.875 * (coalesce(c.s, 0.0) + dm / n))
                * $Q + 0.5) / $Q AS rank
            FROM nodes CROSS JOIN nn CROSS JOIN dm$k
            LEFT JOIN c$k c ON c.dst = nodes.id)"""
    }.mkString(",\n")
    s"""WITH $pairsCte,
        edges AS (
          SELECT cust AS src, supp AS dst FROM pairs
          UNION
          SELECT supp AS src, cust AS dst FROM pairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        outdeg AS (SELECT src AS id, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (
          SELECT id, floor(1.0 / n * $Q + 0.5) / $Q AS rank
          FROM nodes CROSS JOIN nn),
        $iterCtes
        SELECT id, rank FROM r$Iters"""
  }

  private def hitsSql: String = {
    val iterCtes = (1 to Iters).map { k =>
      val p = k - 1
      s"""ar$k AS (
            SELECT e.dst AS id, sum(floor(h.h * $Q + 0.5) / $Q) AS raw
            FROM edges e JOIN h$p h ON e.src = h.id GROUP BY 1),
          am$k AS (SELECT max(raw) AS mx FROM ar$k),
          a$k AS (
            SELECT id, floor(raw / mx * $Q + 0.5) / $Q AS a
            FROM ar$k CROSS JOIN am$k),
          hr$k AS (
            SELECT e.src AS id, sum(floor(a.a * $Q + 0.5) / $Q) AS raw
            FROM edges e JOIN a$k a ON e.dst = a.id GROUP BY 1),
          hm$k AS (SELECT max(raw) AS mx FROM hr$k),
          h$k AS (
            SELECT id, floor(raw / mx * $Q + 0.5) / $Q AS h
            FROM hr$k CROSS JOIN hm$k)"""
    }.mkString(",\n")
    s"""WITH $pairsCte,
        edges AS (SELECT cust AS src, supp AS dst FROM pairs),
        h0 AS (SELECT DISTINCT src AS id, 1.0 AS h FROM edges),
        $iterCtes
        SELECT id, 'hub' AS kind, h AS score FROM h$Iters
        UNION ALL
        SELECT id, 'auth' AS kind, a AS score FROM a$Iters"""
  }

  private def pprSql: String = {
    val iterCtes = (1 to Iters).map { k =>
      val p = k - 1
      s"""dm$k AS (
            SELECT coalesce(sum(rank), 0.0) AS dm
            FROM r$p r LEFT JOIN outdeg o ON r.id = o.id WHERE o.id IS NULL),
          c$k AS (
            SELECT e.dst, sum(floor(r.rank / o.deg * $Q + 0.5) / $Q) AS s
            FROM edges e JOIN r$p r ON e.src = r.id
            JOIN outdeg o ON o.id = e.src
            GROUP BY e.dst),
          r$k AS (
            SELECT tele.id,
              floor((0.125 * t + 0.875 * (coalesce(c.s, 0.0) + dm * t))
                * $Q + 0.5) / $Q AS rank
            FROM tele CROSS JOIN dm$k
            LEFT JOIN c$k c ON c.dst = tele.id)"""
    }.mkString(",\n")
    s"""WITH $pairsCte,
        edges AS (
          SELECT cust AS src, supp AS dst FROM pairs
          UNION
          SELECT supp AS src, cust AS dst FROM pairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        outdeg AS (SELECT src AS id, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
        sv AS (
          SELECT DISTINCT c_custkey AS id FROM customer
          WHERE c_mktsegment = 'BUILDING'
          INTERSECT SELECT id FROM nodes),
        scnt AS (SELECT count(*)::DOUBLE AS sn FROM sv),
        tele AS (
          SELECT n.id, CASE WHEN v.id IS NOT NULL
            THEN floor(1.0 / sn * $Q + 0.5) / $Q ELSE 0.0 END AS t
          FROM nodes n CROSS JOIN scnt LEFT JOIN sv v ON v.id = n.id),
        r0 AS (SELECT id, t AS rank FROM tele),
        $iterCtes
        SELECT id, rank FROM r$Iters"""
  }

  private def pagerankWeightedSql: String = {
    val iterCtes = (1 to Iters).map { k =>
      val p = k - 1
      s"""dm$k AS (
            SELECT coalesce(sum(rank), 0.0) AS dm
            FROM r$p r LEFT JOIN outw o ON r.id = o.id WHERE o.id IS NULL),
          c$k AS (
            SELECT e.dst, sum(floor(r.rank * e.w / o.deg * $Q + 0.5) / $Q) AS s
            FROM edges e JOIN r$p r ON e.src = r.id
            JOIN outw o ON o.id = e.src
            GROUP BY e.dst),
          r$k AS (
            SELECT nodes.id,
              floor((0.125 / n + 0.875 * (coalesce(c.s, 0.0) + dm / n))
                * $Q + 0.5) / $Q AS rank
            FROM nodes CROSS JOIN nn CROSS JOIN dm$k
            LEFT JOIN c$k c ON c.dst = nodes.id)"""
    }.mkString(",\n")
    s"""WITH wpairs AS (
          SELECT cust, supp, count(*)::BIGINT AS w FROM (
            SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp,
              o_orderkey
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
          GROUP BY 1, 2),
        edges AS (
          SELECT cust AS src, supp AS dst, w FROM wpairs
          UNION ALL
          SELECT supp AS src, cust AS dst, w FROM wpairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        outw AS (SELECT src AS id, sum(w)::BIGINT AS deg FROM edges GROUP BY 1),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (
          SELECT id, floor(1.0 / n * $Q + 0.5) / $Q AS rank
          FROM nodes CROSS JOIN nn),
        $iterCtes
        SELECT id, rank FROM r$Iters"""
  }

  private val componentsSql =
    """WITH RECURSIVE pairs AS (
         SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderpriority = '1-URGENT' AND l_quantity >= 45),
       edges AS (
         SELECT a AS src, b AS dst FROM pairs
         UNION SELECT b, a FROM pairs),
       reach(id, r) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT rc.id, e.dst FROM reach rc JOIN edges e ON rc.r = e.src)
       SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id"""

  /** Same degree-ordered orientation as [[Graph.triangleCounts]],
    * spelled in SQL: lo<hi holds in canon, so the (deg, id) tie-break
    * reduces to deg(lo) <= deg(hi). */
  /** The degree/orientation/triangle CTE chain both the triangles and
    * clustering-coefficient oracles share (one SQL spelling of
    * [[Graph.orientByDegree]] + the wedge-close join). */
  private val triangleCtes =
    """deg AS MATERIALIZED (
         SELECT id, count(*)::BIGINT AS deg FROM (
           SELECT lo AS id FROM canon
           UNION ALL SELECT hi AS id FROM canon) GROUP BY 1),
       o AS MATERIALIZED (
         SELECT CASE WHEN dl.deg <= dh.deg THEN c.lo ELSE c.hi END AS src,
                CASE WHEN dl.deg <= dh.deg THEN c.hi ELSE c.lo END AS dst,
                CASE WHEN dl.deg <= dh.deg THEN dh.deg ELSE dl.deg END AS ddeg
         FROM canon c
         JOIN deg dl ON dl.id = c.lo
         JOIN deg dh ON dh.id = c.hi),
       tri AS MATERIALIZED (
         SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
         FROM o o1
         JOIN o o2 ON o1.src = o2.src
           AND (o1.ddeg < o2.ddeg
                OR (o1.ddeg = o2.ddeg AND o1.dst < o2.dst))
         JOIN o e ON e.src = o1.dst AND e.dst = o2.dst),
       tcnt AS MATERIALIZED (
         SELECT id, count(*)::BIGINT AS tri FROM (
           SELECT u AS id FROM tri
           UNION ALL SELECT v AS id FROM tri
           UNION ALL SELECT w AS id FROM tri)
         GROUP BY 1)"""

  private def trianglesSql =
    s"""WITH $coPurchaseCte,
       $triangleCtes
       SELECT id, tri FROM tcnt"""

  private def clusteringSql =
    s"""WITH $coPurchaseCte,
       $triangleCtes
       SELECT d.id, d.deg, coalesce(t.tri, 0)::BIGINT AS tri,
         (2.0 * coalesce(t.tri, 0)::DOUBLE)
           / (d.deg * (d.deg - 1))::DOUBLE AS coef
       FROM deg d LEFT JOIN tcnt t ON t.id = d.id
       WHERE d.deg >= 2"""

  /** [[Graph.kCore]]'s synchronous peel rounds unrolled into chained
    * CTEs; MATERIALIZED pins linear (not re-inlined) evaluation of the
    * multi-referenced round frames. */
  private def kcoreSql: String = {
    val k = 70
    val rounds = (1 to 4).map { r =>
      val prev = if (r == 1) "canon" else s"g${r - 1}"
      s"""d$r AS MATERIALIZED (
            SELECT id, count(*)::BIGINT AS deg FROM (
              SELECT lo AS id FROM $prev
              UNION ALL SELECT hi AS id FROM $prev) GROUP BY 1),
          k$r AS MATERIALIZED (SELECT id FROM d$r WHERE deg >= $k),
          g$r AS MATERIALIZED (
            SELECT c.lo, c.hi FROM $prev c
            JOIN k$r a ON a.id = c.lo
            JOIN k$r b ON b.id = c.hi)"""
    }.mkString(",\n")
    s"""WITH $coPurchaseCte,
        $rounds
        SELECT id, count(*)::BIGINT AS core_deg FROM (
          SELECT lo AS id FROM g4
          UNION ALL SELECT hi AS id FROM g4) GROUP BY 1"""
  }

  /** [[Graph.labelPropagation]] unrolled: per round, neighbor-label
    * counts, the (n desc, lab asc) winner via row_number (the Spark
    * side's min(struct(-n, lab)) picks the identical row), and a
    * node-sized carry join for in-degree-0 nodes. */
  private def lpaSql: String = {
    val iterCtes = (1 to Iters).map { k =>
      val p = k - 1
      s"""c$k AS MATERIALIZED (
            SELECT e.dst AS id, l.lab, count(*)::BIGINT AS n
            FROM edges e JOIN l$p l ON l.id = e.src GROUP BY 1, 2),
          p$k AS MATERIALIZED (
            SELECT id, lab FROM (
              SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY n DESC, lab ASC) AS rn
              FROM c$k) WHERE rn = 1),
          l$k AS MATERIALIZED (
            SELECT l.id, coalesce(p.lab, l.lab) AS lab
            FROM l$p l LEFT JOIN p$k p ON p.id = l.id)"""
    }.mkString(",\n")
    s"""WITH $pairsCte,
        edges AS MATERIALIZED (
          SELECT cust AS src, supp AS dst FROM pairs
          UNION
          SELECT supp AS src, cust AS dst FROM pairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        l0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes),
        $iterCtes
        SELECT id, lab FROM l$Iters"""
  }

  /** [[Graph.degreeAssortativity]]'s four integer sums + the closing
    * Pearson expression, with the same zero-variance null guard. */
  private def assortativitySql =
    s"""WITH $coPurchaseCte,
       deg AS MATERIALIZED (
         SELECT id, count(*)::BIGINT AS deg FROM (
           SELECT lo AS id FROM canon
           UNION ALL SELECT hi AS id FROM canon) GROUP BY 1),
       sums AS (
         SELECT count(*)::BIGINT AS n_edges,
           sum(dj.deg + dk.deg)::BIGINT AS s_sum,
           sum(dj.deg * dj.deg + dk.deg * dk.deg)::BIGINT AS s_sq,
           sum(dj.deg * dk.deg)::BIGINT AS s_prod
         FROM canon c
         JOIN deg dj ON dj.id = c.lo
         JOIN deg dk ON dk.id = c.hi)
       SELECT n_edges, s_sum, s_sq, s_prod,
         CASE WHEN s_sq::DOUBLE / (2.0 * n_edges::DOUBLE)
                - (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE))
                  * (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE)) <> 0.0
           THEN (s_prod::DOUBLE / n_edges::DOUBLE
                  - (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE))
                    * (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE)))
                / (s_sq::DOUBLE / (2.0 * n_edges::DOUBLE)
                  - (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE))
                    * (s_sum::DOUBLE / (2.0 * n_edges::DOUBLE)))
         END AS r
       FROM sums"""

  /** [[Graph.bfsDistances]]'s hop expansions unrolled: per hop, the
    * frontier's out-neighbors minus everything already reached. */
  private def bfsSql: String = {
    val hops = (1 to 3).map { r =>
      val p = r - 1
      s"""f$r AS MATERIALIZED (
            SELECT DISTINCT e.dst AS id
            FROM edges e JOIN f$p f ON f.id = e.src
            WHERE e.dst NOT IN (SELECT id FROM l$p)),
          l$r AS MATERIALIZED (
            SELECT id, dist FROM l$p
            UNION ALL
            SELECT id, $r AS dist FROM f$r)"""
    }.mkString(",\n")
    s"""WITH $pairsCte,
        edges AS MATERIALIZED (
          SELECT cust AS src, supp AS dst FROM pairs
          UNION
          SELECT supp AS src, cust AS dst FROM pairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        l0 AS MATERIALIZED (
          SELECT DISTINCT c_custkey AS id, 0 AS dist FROM customer
          WHERE c_mktsegment = 'BUILDING'
            AND c_custkey IN (SELECT id FROM nodes)),
        f0 AS MATERIALIZED (SELECT id FROM l0),
        $hops
        SELECT id, dist FROM l3"""
  }

  /** Mirrors Graph.linkPrediction over the bipartite purchase graph:
    * wedges through degree-≤500 centers, RA terms on the 2⁻³⁰ grid
    * (1.0 pinned ::DOUBLE — DuckDB types a bare 1.0 DECIMAL, whose
    * division would diverge from Spark's IEEE bits). `pairs` is
    * already canonical (cust < 1000000 < supp) and distinct. */
  private def linkpredSql: String =
    s"""WITH $pairsCte,
        canon AS MATERIALIZED (SELECT cust AS lo, supp AS hi FROM pairs),
        deg AS MATERIALIZED (
          SELECT id, count(*)::BIGINT AS deg FROM (
            SELECT lo AS id FROM canon UNION ALL SELECT hi FROM canon)
          GROUP BY 1),
        adj AS MATERIALIZED (
          SELECT lo AS w, hi AS n FROM canon
          UNION ALL SELECT hi, lo FROM canon),
        aw AS MATERIALIZED (
          SELECT a.w, d.deg AS dw, a.n FROM adj a JOIN deg d ON d.id = a.w
          WHERE d.deg <= 500),
        scored AS MATERIALIZED (
          SELECT x.n AS lo, y.n AS hi, count(*)::BIGINT AS cn,
            sum(floor((1.0::DOUBLE / x.dw) * $Q + 0.5) / $Q)::DOUBLE AS ra
          FROM aw x JOIN aw y ON x.w = y.w AND x.n < y.n
          GROUP BY 1, 2)
        SELECT s.lo AS a, s.hi AS b, s.cn, s.ra,
          s.cn::DOUBLE / (da.deg + db.deg - s.cn)::DOUBLE AS jaccard
        FROM scored s
        JOIN deg da ON da.id = s.lo
        JOIN deg db ON db.id = s.hi
        WHERE NOT EXISTS (
          SELECT 1 FROM canon c WHERE c.lo = s.lo AND c.hi = s.hi)
        ORDER BY ra DESC, cn DESC, a, b
        LIMIT 100"""

  /** Mirrors Graph.weightedSssp: 3 unrolled min-plus rounds over the
    * doubled min-quantity-weighted purchase graph (quantity rounds
    * HALF-UP through DOUBLE on both engines — a bare DECIMAL→BIGINT
    * cast rounds in DuckDB but truncates in Spark). */
  private def ssspSql: String = {
    val hops = (1 to 3).map { r =>
      val p = r - 1
      s"""d$r AS MATERIALIZED (
            SELECT id, min(dist)::BIGINT AS dist FROM (
              SELECT id, dist FROM d$p
              UNION ALL
              SELECT e.dst AS id, x.dist + e.w AS dist
              FROM edges e JOIN d$p x ON x.id = e.src)
            GROUP BY id)"""
    }.mkString(",\n")
    s"""WITH wpairs AS MATERIALIZED (
          SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp,
            min(CAST(floor(l_quantity::DOUBLE + 0.5) AS BIGINT)) AS w
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2),
        edges AS MATERIALIZED (
          SELECT cust AS src, supp AS dst, w FROM wpairs
          UNION ALL
          SELECT supp AS src, cust AS dst, w FROM wpairs),
        nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        d0 AS MATERIALIZED (
          SELECT c_custkey AS id, 0::BIGINT AS dist FROM customer
          WHERE c_mktsegment = 'BUILDING'
            AND c_custkey IN (SELECT id FROM nodes)),
        $hops
        SELECT id, dist FROM d3"""
  }

  val oracles: Map[String, String] = Map(
    "graph_linkpred" -> linkpredSql,
    "graph_sssp" -> ssspSql,
    "graph_bfs_dist" -> bfsSql,
    "graph_assortativity" -> assortativitySql,
    "graph_lpa" -> lpaSql,
    "graph_kcore" -> kcoreSql,
    "graph_triangles" -> trianglesSql,
    "graph_clustering" -> clusteringSql,
    "graph_pagerank" -> pagerankSql,
    "graph_pagerank_w" -> pagerankWeightedSql,
    "graph_hits" -> hitsSql,
    "graph_ppr" -> pprSql,
    "graph_components" -> componentsSql)
}
