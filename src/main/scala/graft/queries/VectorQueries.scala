package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table: exact
  * brute-force cosine top-k (baseline) and random-hyperplane LSH
  * bucketed ANN (the scale path). The LSH hyperplanes are deterministic
  * (seed 42) and inlined into the oracle SQL as literal arrays, so both
  * engines bucket identically.
  */
object VectorQueries {

  private val K = 5
  private val RpShortlist = 20
  private val NPlanes = 6
  private val Dim = 64
  private val NCentroids = 8
  private val KmeansIters = 2
  // Quantizer trains on the deterministic 1-in-2 id sample; assignment
  // still covers the full corpus. At 100 TB the fit must be sample-based.
  private val TrainMod = 2
  private val CosThreshold = 0.45
  // Near-dup LSH uses fewer planes than top-k ANN: a 0.45-cosine pair
  // sits at ~63°, so per-plane agreement is only ~0.65 — at 6 planes
  // almost every true pair lands in different buckets (recall ~6%,
  // vacuously-empty results at small SF). 3 planes + Hamming-1
  // multi-probe covers pairs differing in ≤1 bit: recall ~0.7 with the
  // candidate space still bucket-bounded.
  private val NDedupPlanes = 3
  // OR-amplified near-dup LSH: L independent 4-plane tables, each
  // multi-probed at Hamming-1. Finer tables than the single-table
  // 3-plane config (16 buckets each, so the per-bucket candidate
  // space HALVES) while the union of two independent tables lifts
  // recall 1 − (1 − p)² — measured 1.00 vs the single table's 0.64
  // on the sf0.01 fixture (ScaleProbe recall12; RecallSpec gates
  // ≥ 0.8).
  private val NDedupTablePlanes = 4
  private val DedupTableSeeds = Seq(42L, 101L)
  // Product quantization: 8 subspaces x 8 dims, 32 centroids each
  // (finer quantization: the synthetic near-uniform vectors are the
  // adversarial case for PQ; recall measured in RecallSpec).
  private val PqM = 8
  private val PqSubDim = 8
  private val PqKsub = 32
  // Incremental IVF probe: seeds come from the INDEX (even ids), so a
  // 16-id seed window yields 8 effective cells — same cell count as
  // ann_ivf_topk's full-corpus seeding.
  private val ProbeCentroids = 16
  // The HEADLINE multi-probe IVF budget: 16 cells, 8 probed — the
  // finest grid measured (recall12 sweep) to clear recall@5 ≥ 0.8 on
  // the isotropic fixture (0.81; RecallSpec gates it). Half the
  // corpus scanned per query, with the probe ORDER (by centroid
  // cosine) choosing the half.
  private val MpCells = 16
  private val MpProbe = 8
  private lazy val planes: Seq[Seq[Double]] = Similarity.hyperplanes(NPlanes, Dim)
  private lazy val dedupPlanes: Seq[Seq[Double]] = Similarity.hyperplanes(NDedupPlanes, Dim)
  private lazy val dedupTables: Seq[Seq[Seq[Double]]] =
    DedupTableSeeds.map(Similarity.hyperplanes(NDedupTablePlanes, Dim, _))

  val queries: Map[String, QueryFn] = Map(
    // Symmetric per-vector int8 quantization (the 4x embedding-store
    // compression before ANN serving): scale + first/last codes +
    // worst-element reconstruction error, all engine-portable floor
    // arithmetic.
    "embed_quantize" -> ((s, d) => {
      import graft.functions.VectorOps
      val e = tbl(s, d, "embeddings")
        .withColumn("q", VectorOps.quantizeInt8(col("embedding")))
      e.select(col("vec_id"),
        round4(col("q.scale")).as("scale"),
        col("q.codes").getItem(0).as("code0"),
        col("q.codes").getItem(Dim - 1).as("code_last"),
        round4(aggregate(
          zip_with(VectorOps.dequantizeInt8(col("q")), col("embedding"),
            (dq, x) => abs(dq - x.cast("double"))),
          lit(0.0d), (acc, err) => greatest(acc, err))).as("max_err"))
    }),

    // Exact top-k for a small query set against the full corpus.
    "ann_bruteforce_topk" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", K)
    }),

    // In-engine retrieval evaluation: grade the LSH ANN's ranked
    // top-k against the exact brute-force baseline for the same query
    // set — per-query recall / MRR / average precision, the numbers
    // an index-rebuild gate alerts on. Deliberately log-free metrics
    // (NDCG's log2 would ride libm bits); every fractional term is a
    // 2⁻³⁰-grid single division, so the whole report is engine-exact
    // (RetrievalEval.rankMetrics).
    "eval_retrieval" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      val truth = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", K)
      val sys = Similarity.lshTopK(e, "vec_id", "embedding", K, planes)
        .filter(col("query_id") < 10)
      graft.operators.RetrievalEval.rankMetrics(sys, truth,
        "query_id", "neighbor_id", "rank")
    }),

    // NDCG@k companion: position-discounted grading of the same
    // LSH-vs-exact pair. The log2 discounts are a k-row constant
    // table interpolated verbatim into the oracle — no query-time
    // libm in either engine (RetrievalEval.ndcgAtK).
    "eval_ndcg" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      val truth = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e, "vec_id", "embedding", K)
      val sys = Similarity.lshTopK(e, "vec_id", "embedding", K, planes)
        .filter(col("query_id") < 10)
      graft.operators.RetrievalEval.ndcgAtK(sys, truth,
        "query_id", "neighbor_id", "rank", k = K)
    }),

    // LSH-bucketed ANN over the whole corpus (within-bucket top-k).
    "ann_lsh_topk" -> ((s, d) => {
      Similarity.lshTopK(tbl(s, d, "embeddings"), "vec_id", "embedding", K, planes)
    }),

    // Multi-probe LSH: query also probes Hamming-1 neighbor buckets.
    "ann_lsh_multiprobe" -> ((s, d) => {
      Similarity.lshTopKMultiProbe(tbl(s, d, "embeddings"), "vec_id",
        "embedding", K, planes)
    }),

    // Hard-negative mining for contrastive training: per anchor, the
    // top-3 most-similar DIFFERENT-label vectors from its LSH bucket
    // (3-plane buckets: rich candidate sets; filter precedes the
    // ranking window).
    "ml_hard_negatives" -> ((s, d) => {
      Similarity.hardNegativesLsh(tbl(s, d, "embeddings"), "vec_id",
        "embedding", "label", k = 3, dedupPlanes)
        .select(col("anchor_id"), col("rank"), col("negative_id"),
          round4(col("cosine")).as("cosine"))
    }),

    // IVF ANN: k-means-trained coarse quantizer, search within the cell.
    "ann_ivf_topk" -> ((s, d) => {
      Similarity.ivfTopK(tbl(s, d, "embeddings"), "vec_id", "embedding", K,
        nCentroids = NCentroids, kmeansIters = KmeansIters, trainSampleMod = TrainMod)
    }),

    // Multi-probe IVF at the headline recall budget (16 cells, 8
    // probed → recall@5 0.81 on the fixture): each query searches its
    // nprobe nearest cells by centroid cosine — the standard IVF
    // recall knob, differentially gated at the config RecallSpec
    // records ≥ 0.8 for (the probe-order selection is a custom
    // codegen'd expression, NearestCellsTopN — worth its own oracle).
    "ann_ivf_multiprobe" -> ((s, d) => {
      Similarity.ivfTopKMultiProbe(tbl(s, d, "embeddings"), "vec_id",
        "embedding", K, nCentroids = MpCells, nprobe = MpProbe,
        kmeansIters = KmeansIters)
    }),

    // Product-quantization codes: 8 subspace codebooks compress each
    // 64-dim vector to 8 small ints (the PQ index artifact).
    "pq_codes" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      val books = Similarity.pqFit(e, "vec_id", "embedding",
        m = PqM, subDim = PqSubDim, ksub = PqKsub, iters = KmeansIters,
        trainSampleMod = TrainMod)
      Similarity.pqEncode(e, "vec_id", "embedding", books, PqSubDim)
    }),

    // Hybrid-retrieval fusion: reciprocal-rank fusion of the LSH and
    // IVF rankers (different recall profiles) into one top-k —
    // rankings join on bounded top-k frames, contributions summed in
    // fixed order (Similarity.rrfFuse).
    "ann_hybrid_rrf" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.rrfFuse(Seq(
        Similarity.lshTopK(e, "vec_id", "embedding", K, planes),
        Similarity.ivfTopK(e, "vec_id", "embedding", K,
          nCentroids = NCentroids, kmeansIters = KmeansIters,
          trainSampleMod = TrainMod)), K)
    }),

    // Incremental IVF: the odd-id "new batch" probes the quantizer +
    // inverted cells built from the even-id "persisted index" — the
    // ingest-time ANN form (index never re-trains or self-joins).
    "ann_ivf_probe" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.ivfProbeTopK(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", K, nCentroids = ProbeCentroids,
        kmeansIters = KmeansIters, trainSampleMod = 1)
    }),

    // Amortized form: the IVF index (centroids + cell-inverted,
    // checkpointed frame) is built once per session (IndexCache) so
    // this times the PROBE alone — the steady-state ANN serving cost,
    // the vector sibling of sparse_probe_amortized. Same result by
    // construction; shares ann_ivf_probe's oracle.
    "ann_ivf_probe_amortized" -> ((s, d) => {
      import graft.operators.IndexCache
      val e = tbl(s, d, "embeddings")
      val ix = IndexCache.getOrBuild(s"ivf:$d") {
        Similarity.buildIvfIndex(e.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", nCentroids = ProbeCentroids,
          kmeansIters = KmeansIters, trainSampleMod = 1)
      }
      Similarity.probeIvfIndex(ix, e.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", K)
    }),

    // LSH-candidate + exact-verify near-dup pairs (scale path of
    // dedup_embed_cosine): TWO independent multi-probed hyperplane
    // tables, OR-amplified — any table may surface a pair, the exact
    // cosine verifies. Measured recall 1.00 vs brute force at sf0.01
    // (single 3-plane table: 0.64; RecallSpec gates ≥ 0.8).
    "dedup_embed_lsh" -> ((s, d) => {
      Similarity.lshCosineNearDupPairsMultiTable(tbl(s, d, "embeddings"),
        "vec_id", "embedding", CosThreshold, dedupTables)
    }),

    // Projected-space ANN with exact re-rank: the 16-dim JL shortlist
    // does the O(n·q) pair work at 1/4 the width, then exact 64-d
    // cosine re-scores only the 20-candidate shortlist — the
    // project-once / screen-cheap / verify-exact retrieval shape.
    "ann_rp_topk" -> ((s, d) => {
      import graft.functions.VectorOps
      val e = tbl(s, d, "embeddings")
      val pv = Similarity.randomProjectVec(e, "vec_id", "embedding", Dim, 16)
      val shortlist = Similarity.bruteForceTopK(
        pv.filter(col("vec_id") < 10), pv, "vec_id", "pvec", RpShortlist)
        .select(col("query_id"), col("neighbor_id"))
      val q = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      shortlist.join(q, Seq("query_id")).join(n, Seq("neighbor_id"))
        .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    // JL random projection 64 → 16 dims: plan-time md5-parity sign
    // matrix, dyadic-exact signed sums, map-side and shuffle-free —
    // the dimensionality cut that makes downstream distance passes
    // 4x cheaper (Similarity.randomProject).
    "embed_project_rp" -> ((s, d) => {
      Similarity.randomProject(tbl(s, d, "embeddings"),
        "vec_id", "embedding", dim = Dim, k = 16)
    }),

    // SemDeDup-style semantic dedup: quantizer cells shard the O(n²)
    // space, a vector drops iff a lower-id within-cell partner clears
    // the cosine threshold — keep-one-per-semantic-neighborhood
    // (Similarity.semanticDedupKeepSet).
    "dedup_semantic" -> ((s, d) => {
      Similarity.semanticDedupKeepSet(tbl(s, d, "embeddings"),
        "vec_id", "embedding", nCentroids = NCentroids,
        threshold = CosThreshold, kmeansIters = KmeansIters,
        trainSampleMod = TrainMod)
    }))

  private def dotSqlN(x: String, y: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  private def cosSqlN(a: String, b: String, dim: Int): String =
    s"${dotSqlN(a, b, dim)} / (sqrt(${dotSqlN(a, a, dim)}) * sqrt(${dotSqlN(b, b, dim)}))"

  private def dotSql(x: String, y: String): String = dotSqlN(x, y, Dim)

  private def cosSql(a: String, b: String): String = cosSqlN(a, b, Dim)

  private def planeLit(p: Seq[Double]): String = p.mkString("[", ", ", "]")

  /** bucket = concat of sign bits of dot(v, plane_j). */
  private def bucketSql(v: String, ps: Seq[Seq[Double]] = planes): String =
    ps.map { p =>
      s"(CASE WHEN ${dotSql(v, planeLit(p))} >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Shared by ann_ivf_probe and ann_ivf_probe_amortized (same result
    * by construction — buildIvfIndex runs ivfProbeTopK's exact build
    * protocol; the amortized entry exists to TIME the probe alone).
    * Mirrors ivfProbeTopK: quantizer seeded and trained on the even-id
    * INDEX only (same assign/mean protocol as ann_ivf_topk), then
    * index cells are searched by the odd-id batch's assignments. */
  private lazy val ivfProbeSql: String = {
    def assignCte(cIn: String, src: String): String =
      s"""SELECT vec_id, embedding, cell FROM (
            SELECT v.vec_id, v.embedding, c.cell,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${cosSql("v.embedding", "c.cv")} DESC, c.cell) AS rn
            FROM $src v CROSS JOIN $cIn c)
          WHERE rn = 1"""
    def meanCte(aIn: String): String =
      s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
            SELECT cell, i, floor(avg(embedding[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
            FROM $aIn CROSS JOIN generate_series(1, $Dim) AS g(i)
            GROUP BY cell, i)
          GROUP BY cell"""
    s"""WITH idx AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
        bat AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 <> 0),
        c0 AS (
          SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM idx WHERE vec_id < $ProbeCentroids),
        a0 AS (${assignCte("c0", "idx")}),
        c1 AS (${meanCte("a0")}),
        a1 AS (${assignCte("c1", "idx")}),
        c2 AS (${meanCte("a1")}),
        icells AS (${assignCte("c2", "idx")}),
        bcells AS (${assignCte("c2", "bat")})
        SELECT query_id, rank, neighbor_id FROM (
          SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosSql("q.embedding", "x.embedding")} DESC, x.vec_id) AS rank
          FROM bcells q JOIN icells x ON q.cell = x.cell)
        WHERE rank <= $K"""
  }

  val oracles: Map[String, String] = Map(
    "embed_quantize" ->
      s"""WITH q AS (
           SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
           FROM embeddings),
         c AS (
           SELECT vec_id, embedding, scale,
             list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
               ELSE greatest(-127, least(127, floor(x::DOUBLE / scale + 0.5)::INTEGER)) END) AS codes
           FROM q)
         SELECT vec_id,
           floor(scale * 10000 + 0.5) / 10000 AS scale,
           codes[1] AS code0,
           codes[$Dim] AS code_last,
           floor(list_max(list_transform(range(1, ${Dim + 1}),
             i -> abs(codes[i]::DOUBLE * scale - embedding[i]::DOUBLE))) * 10000 + 0.5) / 10000
             AS max_err
         FROM c""",
    "ann_bruteforce_topk" ->
      s"""SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < 10)
          WHERE rank <= $K""",
    "eval_retrieval" ->
      s"""WITH truth AS MATERIALIZED (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 10)
            WHERE rank <= $K),
          bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
          sys AS MATERIALIZED (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM bucketed a JOIN bucketed b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
            WHERE rank <= $K AND query_id < 10),
          nrel AS (
            SELECT query_id, count(*)::BIGINT AS n_rel FROM truth GROUP BY 1),
          marked AS (
            SELECT s.query_id, s.rank,
              CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
            FROM sys s LEFT JOIN truth t
              ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id),
          cum AS (
            SELECT query_id, rank, rel,
              sum(rel) OVER (PARTITION BY query_id ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM marked),
          per AS (
            SELECT query_id, sum(rel)::BIGINT AS hits,
              min(CASE WHEN rel = 1 THEN rank END) AS first_hit,
              coalesce(sum(CASE WHEN rel = 1 THEN
                floor(cum::DOUBLE / rank::DOUBLE * 1073741824.0 + 0.5)
                  / 1073741824.0 END), 0.0) AS ap_num
            FROM cum GROUP BY 1)
          SELECT n.query_id, n.n_rel,
            coalesce(p.hits, 0)::BIGINT AS hits,
            coalesce(p.hits, 0)::DOUBLE / n.n_rel::DOUBLE AS recall,
            coalesce(floor(1.0 / p.first_hit::DOUBLE * 1073741824.0 + 0.5)
              / 1073741824.0, 0.0) AS mrr,
            coalesce(p.ap_num, 0.0) / n.n_rel::DOUBLE AS ap
          FROM nrel n LEFT JOIN per p ON p.query_id = n.query_id""",
    "eval_ndcg" -> {
      val (qd, ladder) = graft.operators.RetrievalEval.ndcgDiscounts(K)
      val discVals = qd.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, $v::DOUBLE)" }.mkString(", ")
      val idcgVals = ladder.zipWithIndex
        .map { case (v, j) => s"(${j + 1}, $v::DOUBLE)" }.mkString(", ")
      s"""WITH truth AS MATERIALIZED (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 10)
            WHERE rank <= $K),
          bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
          sys AS MATERIALIZED (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM bucketed a JOIN bucketed b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
            WHERE rank <= $K AND query_id < 10),
          disc(rank, disc) AS (VALUES $discVals),
          ladder(n_eff, idcg) AS (VALUES $idcgVals),
          dcg AS (
            SELECT s.query_id, sum(d.disc) AS dcg
            FROM sys s
            JOIN truth t ON t.query_id = s.query_id
              AND t.neighbor_id = s.neighbor_id
            JOIN disc d ON d.rank = s.rank
            GROUP BY 1),
          nrel AS (
            SELECT query_id, count(*)::BIGINT AS n_rel FROM truth GROUP BY 1)
          SELECT n.query_id, n.n_rel,
            coalesce(g.dcg, 0.0) AS dcg, l.idcg,
            coalesce(g.dcg, 0.0) / l.idcg AS ndcg
          FROM nrel n
          JOIN ladder l ON l.n_eff = least(n.n_rel, $K)
          LEFT JOIN dcg g ON g.query_id = n.query_id"""
    },
    "ann_lsh_topk" ->
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings)
          SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
          WHERE rank <= $K""",
    "ml_hard_negatives" ->
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, label,
              ${bucketSql("embedding", dedupPlanes)} AS bucket FROM embeddings)
          SELECT anchor_id, rank, negative_id, cosine FROM (
            SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
              floor(${cosSql("a.embedding", "b.embedding")} * 10000 + 0.5) / 10000
                AS cosine,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM bucketed a JOIN bucketed b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
                 AND a.label <> b.label)
          WHERE rank <= 3""",
    "ann_lsh_multiprobe" -> {
      val flips = (1 to NPlanes).map { i =>
        s"substring(bucket, 1, ${i - 1}) || (CASE WHEN substring(bucket, $i, 1) = '1' THEN '0' ELSE '1' END) || substring(bucket, ${i + 1}, ${NPlanes - i})"
      }
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
          probes AS (
            SELECT vec_id, embedding, unnest([bucket, ${flips.mkString(", ")}]) AS pb
            FROM bucketed)
          SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM probes a JOIN bucketed b
              ON a.pb = b.bucket AND a.vec_id <> b.vec_id)
          WHERE rank <= $K"""
    },
    "ann_ivf_topk" -> {
      // Mirrors kmeansFit: c0 = seed centroids (id < k), then
      // KmeansIters rounds of (argmax-cosine assign, element-wise mean
      // rounded to 1e-6) over the 1-in-TrainMod training sample, then
      // the final FULL-corpus assignment + within-cell scan.
      def assignCte(cIn: String, src: String): String =
        s"""SELECT vec_id, embedding, cell FROM (
              SELECT v.vec_id, v.embedding, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY ${cosSql("v.embedding", "c.cv")} DESC, c.cell) AS rn
              FROM $src v CROSS JOIN $cIn c)
            WHERE rn = 1"""
      def meanCte(aIn: String): String =
        s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
              SELECT cell, i, floor(avg(embedding[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
              FROM $aIn CROSS JOIN generate_series(1, $Dim) AS g(i)
              GROUP BY cell, i)
            GROUP BY cell"""
      s"""WITH train AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id % $TrainMod = 0),
          c0 AS (
            SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
            FROM embeddings WHERE vec_id < $NCentroids),
          a0 AS (${assignCte("c0", "train")}),
          c1 AS (${meanCte("a0")}),
          a1 AS (${assignCte("c1", "train")}),
          c2 AS (${meanCte("a1")}),
          cells AS (${assignCte("c2", "embeddings")})
          SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM cells a JOIN cells b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id)
          WHERE rank <= $K"""
    },
    "ann_ivf_multiprobe" -> {
      // Mirrors ivfTopKMultiProbe at (MpCells, MpProbe) with a
      // full-corpus fit: the same kmeans chain as ann_ivf_topk, then
      // the corpus keeps its rn=1 cell while each QUERY keeps its
      // rn ≤ nprobe cells (row_number over cosine desc, cell asc —
      // the exact NearestCellsTopN tie-break). A neighbor lives in
      // exactly one cell, so no candidate dedup is needed.
      def rankCte(cIn: String, src: String): String =
        s"""SELECT v.vec_id, v.embedding, c.cell,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${cosSql("v.embedding", "c.cv")} DESC, c.cell) AS rn
            FROM $src v CROSS JOIN $cIn c"""
      def assignCte(cIn: String, src: String): String =
        s"SELECT vec_id, embedding, cell FROM (${rankCte(cIn, src)}) WHERE rn = 1"
      def meanCte(aIn: String): String =
        s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
              SELECT cell, i, floor(avg(embedding[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
              FROM $aIn CROSS JOIN generate_series(1, $Dim) AS g(i)
              GROUP BY cell, i)
            GROUP BY cell"""
      s"""WITH c0 AS (
            SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
            FROM embeddings WHERE vec_id < $MpCells),
          a0 AS (${assignCte("c0", "embeddings")}),
          c1 AS (${meanCte("a0")}),
          a1 AS (${assignCte("c1", "embeddings")}),
          c2 AS (${meanCte("a1")}),
          cells AS (${assignCte("c2", "embeddings")}),
          probes AS (
            SELECT vec_id, embedding, cell FROM (${rankCte("c2", "embeddings")})
            WHERE rn <= $MpProbe)
          SELECT query_id, rank, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
            FROM probes a JOIN cells b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id)
          WHERE rank <= $K"""
    },
    "ann_rp_topk" ->
      s"""WITH signs AS (
            SELECT i, j, CASE WHEN ('0x' || substring(
                md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1))::BIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
            FROM generate_series(0, ${Dim - 1}) AS gi(i)
            CROSS JOIN generate_series(0, 15) AS gj(j)),
          vq AS (
            SELECT vec_id, gi.i,
              floor(embedding[gi.i + 1]::DOUBLE * 1024 + 0.5) / 1024 AS v
            FROM embeddings CROSS JOIN generate_series(0, ${Dim - 1}) AS gi(i)),
          proj AS (
            SELECT vec_id, j, sum(v * s) * 0.25 AS p
            FROM vq JOIN signs USING (i) GROUP BY vec_id, j),
          pv AS (SELECT vec_id, list(p ORDER BY j) AS pvec FROM proj GROUP BY vec_id),
          shortlist AS (
            SELECT query_id, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSqlN("a.pvec", "b.pvec", 16)} DESC, b.vec_id) AS rp
              FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 10)
            WHERE rp <= $RpShortlist)
          SELECT query_id, rank, neighbor_id FROM (
            SELECT sl.query_id, sl.neighbor_id,
              row_number() OVER (PARTITION BY sl.query_id
                ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, sl.neighbor_id) AS rank
            FROM shortlist sl
            JOIN embeddings q ON q.vec_id = sl.query_id
            JOIN embeddings n ON n.vec_id = sl.neighbor_id)
          WHERE rank <= $K""",

    "embed_project_rp" ->
      s"""WITH signs AS (
            SELECT i, j, CASE WHEN ('0x' || substring(
                md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1))::BIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
            FROM generate_series(0, ${Dim - 1}) AS gi(i)
            CROSS JOIN generate_series(0, 15) AS gj(j)),
          vq AS (
            SELECT vec_id, gi.i,
              floor(embedding[gi.i + 1]::DOUBLE * 1024 + 0.5) / 1024 AS v
            FROM embeddings CROSS JOIN generate_series(0, ${Dim - 1}) AS gi(i))
          SELECT vec_id, j, sum(v * s) * 0.25 AS p
          FROM vq JOIN signs USING (i)
          GROUP BY vec_id, j""",

    "dedup_semantic" -> {
      // same kmeans chain as ann_ivf_topk, then the keep-set anti-join
      def assignCte(cIn: String, src: String): String =
        s"""SELECT vec_id, embedding, cell FROM (
              SELECT v.vec_id, v.embedding, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY ${cosSql("v.embedding", "c.cv")} DESC, c.cell) AS rn
              FROM $src v CROSS JOIN $cIn c)
            WHERE rn = 1"""
      def meanCte(aIn: String): String =
        s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
              SELECT cell, i, floor(avg(embedding[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
              FROM $aIn CROSS JOIN generate_series(1, $Dim) AS g(i)
              GROUP BY cell, i)
            GROUP BY cell"""
      s"""WITH train AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id % $TrainMod = 0),
          c0 AS (
            SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
            FROM embeddings WHERE vec_id < $NCentroids),
          a0 AS (${assignCte("c0", "train")}),
          c1 AS (${meanCte("a0")}),
          a1 AS (${assignCte("c1", "train")}),
          c2 AS (${meanCte("a1")}),
          cells AS (${assignCte("c2", "embeddings")}),
          drops AS (
            SELECT DISTINCT b.vec_id AS id
            FROM cells a JOIN cells b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosThreshold)
          SELECT vec_id FROM embeddings
          WHERE vec_id NOT IN (SELECT id FROM drops)"""
    },
    "ann_hybrid_rrf" -> {
      // lshr = the ann_lsh_topk chain; ivfr = the ann_ivf_topk chain;
      // fusion is a full-outer join of the two bounded top-k lists with
      // fixed-order coalesced contributions.
      def assignCte(cIn: String, src: String): String =
        s"""SELECT vec_id, embedding, cell FROM (
              SELECT v.vec_id, v.embedding, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY ${cosSql("v.embedding", "c.cv")} DESC, c.cell) AS rn
              FROM $src v CROSS JOIN $cIn c)
            WHERE rn = 1"""
      def meanCte(aIn: String): String =
        s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
              SELECT cell, i, floor(avg(embedding[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
              FROM $aIn CROSS JOIN generate_series(1, $Dim) AS g(i)
              GROUP BY cell, i)
            GROUP BY cell"""
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
          lshr AS (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM bucketed a JOIN bucketed b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
            WHERE rank <= $K),
          train AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id % $TrainMod = 0),
          c0 AS (
            SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
            FROM embeddings WHERE vec_id < $NCentroids),
          a0 AS (${assignCte("c0", "train")}),
          c1 AS (${meanCte("a0")}),
          a1 AS (${assignCte("c1", "train")}),
          c2 AS (${meanCte("a1")}),
          cells AS (${assignCte("c2", "embeddings")}),
          ivfr AS (
            SELECT query_id, rank, neighbor_id FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
              FROM cells a JOIN cells b
                ON a.cell = b.cell AND a.vec_id <> b.vec_id)
            WHERE rank <= $K),
          fused AS (
            SELECT coalesce(a.query_id, b.query_id) AS query_id,
              coalesce(a.neighbor_id, b.neighbor_id) AS neighbor_id,
              coalesce(1.0 / (a.rank + 60), 0) + coalesce(1.0 / (b.rank + 60), 0)
                AS rrf
            FROM lshr a FULL OUTER JOIN ivfr b
              ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
          SELECT query_id, rank, neighbor_id,
            floor(rrf * 1000000 + 0.5) / 1000000 AS rrf
          FROM (
            SELECT query_id, neighbor_id, rrf,
              row_number() OVER (PARTITION BY query_id
                ORDER BY rrf DESC, neighbor_id) AS rank
            FROM fused)
          WHERE rank <= $K"""
    },
    "ann_ivf_probe" -> ivfProbeSql,

    // Amortized form: the IVF index (centroids + cell-inverted frame)
    // is built once per session, so this times the PROBE alone — the
    // steady-state ANN serving cost. Same result by construction
    // (buildIvfIndex runs ivfProbeTopK's exact build protocol);
    // shares ann_ivf_probe's oracle.
    "ann_ivf_probe_amortized" -> ivfProbeSql,

    "pq_codes" -> {
      // Mirrors pqFit/pqEncode: per subspace j, the same seeded k-means
      // chain as ann_ivf_topk but over embedding[j*16+1 : (j+1)*16],
      // trained on the 1-in-TrainMod sample, then a full-corpus
      // assignment; codes joined on vec_id.
      def assignCte(j: Int, cIn: String, src: String): String =
        s"""SELECT vec_id, sub, cell FROM (
              SELECT v.vec_id, v.sub, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY ${cosSqlN("v.sub", "c.cv", PqSubDim)} DESC, c.cell) AS rn
              FROM $src v CROSS JOIN $cIn c)
            WHERE rn = 1"""
      def meanCte(aIn: String): String =
        s"""SELECT cell, list(m ORDER BY i) AS cv FROM (
              SELECT cell, i, floor(avg(sub[i]::DOUBLE) * 1000000 + 0.5) / 1000000 AS m
              FROM $aIn CROSS JOIN generate_series(1, $PqSubDim) AS g(i)
              GROUP BY cell, i)
            GROUP BY cell"""
      val perSub = (0 until PqM).map { j =>
        val lo = j * PqSubDim + 1
        val hi = (j + 1) * PqSubDim
        s"""sub${j}all AS (SELECT vec_id, embedding[$lo:$hi] AS sub FROM embeddings),
            sub${j}tr AS (SELECT vec_id, sub FROM sub${j}all WHERE vec_id % $TrainMod = 0),
            s${j}c0 AS (SELECT vec_id AS cell, list_transform(sub, x -> x::DOUBLE) AS cv
                        FROM sub${j}all WHERE vec_id < $PqKsub),
            s${j}a0 AS (${assignCte(j, s"s${j}c0", s"sub${j}tr")}),
            s${j}c1 AS (${meanCte(s"s${j}a0")}),
            s${j}a1 AS (${assignCte(j, s"s${j}c1", s"sub${j}tr")}),
            s${j}c2 AS (${meanCte(s"s${j}a1")}),
            s${j}cells AS (${assignCte(j, s"s${j}c2", s"sub${j}all")})"""
      }.mkString(",\n")
      val joins = (1 until PqM)
        .map(j => s"JOIN s${j}cells USING (vec_id)").mkString(" ")
      val codeCols = (0 until PqM).map(j => s"s${j}cells.cell AS c$j").mkString(", ")
      s"""WITH $perSub
          SELECT vec_id, $codeCols
          FROM s0cells $joins"""
    },
    "dedup_embed_lsh" -> {
      // Mirrors lshCosineNearDupPairsMultiTable: per table t, the
      // prefixed key 't|bits'; the probe side unnests each table key
      // plus its Hamming-1 flips (bit i sits at string offset i+2,
      // after the 2-char 't|' prefix); candidates from ANY table
      // OR-union through one DISTINCT after the exact-cosine verify.
      val nP = NDedupTablePlanes
      def flipsOf(b: String) = (1 to nP).map { i =>
        s"substring($b, 1, ${i + 1}) || (CASE WHEN substring($b, ${i + 2}, 1) = '1' THEN '0' ELSE '1' END) || substring($b, ${i + 3}, ${nP - i})"
      }
      val bucketExprs = dedupTables.zipWithIndex.map { case (ps, t) =>
        s"'$t|' || ${bucketSql("embedding", ps)} AS b$t"
      }
      val bcols = dedupTables.indices.map(t => s"b$t")
      val probeList = bcols.flatMap(b => b +: flipsOf(b))
      s"""WITH bucketed AS (
            SELECT vec_id, embedding, ${bucketExprs.mkString(", ")} FROM embeddings),
          corpus AS (
            SELECT vec_id, embedding, unnest([${bcols.mkString(", ")}]) AS bucket
            FROM bucketed),
          probes AS (
            SELECT vec_id, embedding, unnest([${probeList.mkString(", ")}]) AS pb
            FROM bucketed)
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM probes a JOIN corpus b
            ON a.pb = b.bucket AND a.vec_id < b.vec_id
          WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosThreshold"""
    })
}
