package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity}

/** Deduplication pipeline queries over `documents` / `embeddings`:
  * exact hash dedup, n-gram Jaccard, MinHash+LSH candidates, SimHash
  * signatures + banded candidates, embedding-cosine near-dups. Oracle
  * SQL for the hash pipelines is generated from the same parameters
  * (shingle n, seed count, band layout) as the Spark operators.
  */
object DedupQueries {

  private val ShingleN = 5
  private val MinhashK = 16
  private val Bands = 4
  private val SimhashBits = 32
  private val CosineThreshold = 0.45
  private val WinnowK = 20
  private val WinnowW = 10
  // Winnowing rolling-hash protocol (graftx.WinnowFingerprints): the
  // oracle recomputes each window hash directly as Σ code·Bʲ mod M —
  // sum-of-20 BIGINT-safe terms, no rolling state needed in SQL. The
  // power tables are emitted as literal lists indexed by the lambda.
  private val WinnowM = org.apache.spark.sql.graftx.WinnowFingerprints.M
  private def winnowPows(b: Long): String =
    (0 until WinnowK).map(i => org.apache.spark.sql.graftx.WinnowFingerprints
      .modPow(b, WinnowK - 1 - i)).mkString("[", ",", "]")
  private val winnowPow1 = winnowPows(org.apache.spark.sql.graftx.WinnowFingerprints.B1)
  private val winnowPow2 = winnowPows(org.apache.spark.sql.graftx.WinnowFingerprints.B2)

  /** Shared winnowing-fingerprint CTE chain ending in
    * `fps(doc_id, fp)` — used by both substring-duplication oracles. */
  private lazy val winnowFpsCte: String =
    s"""pos AS (
            SELECT doc_id, text,
              greatest(len(text) - ${WinnowK - 1}, 1) AS n1,
              unnest(generate_series(1, greatest(len(text) - ${WinnowK - 1}, 1))) AS pos
            FROM documents),
          h AS (
            SELECT doc_id, pos, n1,
              (list_sum(list_transform(range(0, $WinnowK), i ->
                 greatest(unicode(substring(text, pos + i, 1)), 0) * ($winnowPow1)[i + 1]))
               % $WinnowM) * 2147483648
              + (list_sum(list_transform(range(0, $WinnowK), i ->
                 greatest(unicode(substring(text, pos + i, 1)), 0) * ($winnowPow2)[i + 1]))
               % $WinnowM) AS hh
            FROM pos),
          mins AS (
            SELECT doc_id, pos, n1,
              min(hh) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp
            FROM h),
          fps AS (
            SELECT DISTINCT doc_id, fp FROM mins
            WHERE pos <= greatest(n1 - ${WinnowW - 1}, 1))"""

  val queries: Map[String, QueryFn] = Map(
    "dedup_exact" -> ((s, d) => {
      Dedup.exact(tbl(s, d, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("content_hash"))
    }),

    "dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(tbl(s, d, "documents"), "doc_id", "text",
        blockCol = "lang", n = ShingleN, threshold = 0.5)
    }),

    "dedup_minhash_lsh" -> ((s, d) => {
      Dedup.lshCandidatePairs(tbl(s, d, "documents"), "doc_id", "text",
        n = ShingleN, k = MinhashK, bands = Bands)
    }),

    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashBits(tbl(s, d, "documents"), "doc_id",
        TextAnalysis.wsTokens(col("text")), bits = SimhashBits)
    }),

    "dedup_simhash_pairs" -> ((s, d) => {
      val sig = Dedup.simhashBits(tbl(s, d, "documents"), "doc_id",
        TextAnalysis.wsTokens(col("text")), bits = SimhashBits)
      Dedup.simhashCandidates(sig, "doc_id", bits = SimhashBits, bands = Bands)
    }),

    // Incremental ingest screening: odd docs (the "new batch") probe
    // the band index built from even docs (the "persisted corpus").
    "dedup_lsh_probe" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val index = Dedup.lshIndexBands(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = ShingleN, k = MinhashK, bands = Bands)
      Dedup.lshProbePairs(docs.filter(col("doc_id") % 2 === 1), index,
        "doc_id", "text", n = ShingleN, k = MinhashK, bands = Bands)
    }),

    // Substring-level (copy-paste) duplication via winnowing
    // fingerprints: pairs sharing any verbatim run of >= k+w-1 chars.
    "dedup_substring" -> ((s, d) => {
      Dedup.substringDupPairs(tbl(s, d, "documents"), "doc_id", "text",
        k = WinnowK, w = WinnowW)
    }),

    // Containment direction of the same fingerprints: id_inner's every
    // fingerprint occurs in id_outer — the quote-inclusion/doc-within-
    // concatenation duplication Jaccard can't see (Broder 1997).
    "dedup_containment" -> ((s, d) => {
      Dedup.containmentPairs(tbl(s, d, "documents"), "doc_id", "text",
        k = WinnowK, w = WinnowW)
    }),

    "dedup_embed_cosine" -> ((s, d) => {
      Similarity.cosineNearDupPairs(tbl(s, d, "embeddings"), "vec_id",
        "embedding", CosineThreshold)
    }),

    // Deterministic stratified sampling (corpus-mixing weights):
    // hash-threshold keep, reproducible across engines and runs.
    // Per-source quota ("at most N docs per domain", the crawl-curation
    // cap): deterministic hash-ranked keep, two-phase salted window so
    // a hot domain never lands in one task (Sampling.perKeyCap).
    "sample_source_cap" -> ((s, d) => {
      graft.operators.Sampling.perKeyCap(
        tbl(s, d, "documents"), "source", "doc_id", cap = 15)
        .select(col("doc_id"), col("source"))
    }),

    "sample_stratified" -> ((s, d) => {
      graft.operators.Sampling.stratifiedSample(
        tbl(s, d, "documents"), "doc_id", "lang",
        rates = Map("en" -> 0.3, "zh" -> 0.8), defaultRate = 0.5)
        .select(col("doc_id"), col("lang"))
    }),

    // Deterministic length-proportional sample: each doc kept with
    // probability expected·n_chars/Σn_chars — all-integer hash
    // threshold (no pow/ln, whose libm rounding differs across
    // engines), so the oracle replays the keep set bit-for-bit.
    "sample_weighted" -> ((s, d) => {
      graft.operators.Sampling.weightedSample(
        tbl(s, d, "documents"), "doc_id", "n_chars", expected = 500L)
        .select(col("doc_id"), col("n_chars"))
    }),

    // Temperature-DERIVED mixing weights — the multilingual sampling
    // rule p_s ∝ n_s^α that upweights low-resource corpora (corpus_mix
    // takes a target mixture as GIVEN; this computes one). α = 0.5:
    // sqrt is exactly rounded under IEEE-754 so both engines agree
    // bit-for-bit, where pow(x, 0.7) is libm-dependent. The per-corpus
    // sqrt is scaled to an integer BEFORE the normalizing sum so the
    // reduction is associative — no FP-order sensitivity at any
    // partition count. One corpus-sized groupBy; everything after runs
    // on the language-count-sized frame.
    "sample_temperature" -> ((s, d) => {
      val counts = tbl(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val scaled = counts.withColumn("__s",
        floor(sqrt(col("n_docs")) * 1000000 + lit(0.5)).cast("long"))
      val z = scaled.agg(sum(col("__s")).as("__z"))
      scaled.crossJoin(broadcast(z))
        .select(col("lang"), col("n_docs"),
          round4(col("__s").cast("double") / col("__z")).as("weight"),
          floor(col("__s").cast("double") / col("__z") * 100000 + lit(0.5))
            .cast("long").as("expected_per_100k"))
    }),

    // Weighted corpus mixing: three language corpora mixed to a
    // 0.5/0.3/0.2 target — the bottleneck corpus (de) used in full,
    // the others hash-sampled down to the exact mixture.
    "corpus_mix" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      def corpus(lang: String) = docs.filter(col("lang") === lang)
      graft.operators.Sampling.weightedMix(
        Seq(("en", corpus("en"), 0.5), ("de", corpus("de"), 0.3),
          ("fr", corpus("fr"), 0.2)), "doc_id")
        .select(col("mix_source"), col("doc_id"))
    }),

    // Connected components over the cosine near-dup pair graph: each
    // involved vector labeled with its cluster (min member id).
    "dedup_clusters" -> ((s, d) => {
      val pairs = Similarity.cosineNearDupPairs(tbl(s, d, "embeddings"),
        "vec_id", "embedding", CosineThreshold)
      Dedup.duplicateClusters(pairs)
    }),

    // Duplication-structure report: how many clusters of each size the
    // near-dup graph contains (+ implied removable-row count downstream
    // of any keep-1 policy). Two tiny aggs on top of the CC output.
    "cluster_size_hist" -> ((s, d) => {
      val pairs = Similarity.cosineNearDupPairs(tbl(s, d, "embeddings"),
        "vec_id", "embedding", CosineThreshold)
      Dedup.duplicateClusters(pairs)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"),
          sum(col("size") - 1).as("n_removable"))
    }),

    // The final keep-set: cluster representatives + rows never paired.
    "dedup_keep_set" -> ((s, d) => {
      val emb = tbl(s, d, "embeddings")
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        CosineThreshold)
      Dedup.keepSet(emb, "vec_id", pairs)
    }),

    // Leakage-proof train/val/test split: near-dup cluster members
    // share a group key (cluster id; singletons their own id), and the
    // split is a deterministic hash of THAT key — so no near-duplicate
    // of a training row can ever reach val/test. 80/10/10 cuts.
    "split_leakproof" -> ((s, d) => {
      val emb = tbl(s, d, "embeddings")
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        CosineThreshold)
      val clusters = Dedup.duplicateClusters(pairs)
        .withColumnRenamed("id", "vec_id")
      emb.select(col("vec_id"))
        .join(clusters, Seq("vec_id"), "left")
        .select(col("vec_id"),
          graft.operators.Sampling.groupedSplit(
            coalesce(col("cluster_id"), col("vec_id")),
            Seq(("train", 8000L), ("val", 9000L), ("test", 10000L))).as("split"))
    }),

    // Quality-aware keep-set over the minhash-LSH pair graph: each
    // cluster keeps its LONGEST member (ties: lowest id), the policy
    // when near-duplicates differ in quality.
    "dedup_keep_best" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text",
        n = ShingleN, k = MinhashK, bands = Bands)
      Dedup.keepSetBy(docs.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", pairs)
    }),

    // Signature-space Jaccard estimate for the LSH candidate pairs:
    // matching-component fraction of the k minhashes — candidates are
    // ranked WITHOUT re-reading any document text (the exact verify
    // only runs on survivors at scale).
    "dedup_minhash_estimate" -> ((s, d) => {
      Dedup.minhashEstimatePairs(tbl(s, d, "documents"), "doc_id", "text",
        n = ShingleN, k = MinhashK, bands = Bands)
    }),

    // Sparse tf-idf cosine similarity join over character-5-gram
    // postings: pair generation bounded by the df-cap (stop-gram head
    // dropped), weights 2^-10-quantized so the pair sums are exact
    // cross-engine (TfIdf.sparseCosinePairs).
    "sparse_cosine_pairs" -> ((s, d) => {
      graft.operators.TfIdf.sparseCosinePairs(tbl(s, d, "documents"),
        "doc_id", "text", n = ShingleN, maxDfFrac = 0.02, threshold = 0.6)
    }),

    // The 100-TB form of the sparse similarity join: absolute df
    // ceiling (min(frac·n, 100k) — corpus-size-independent fan-out)
    // plus the exact AllPairs prefix filter (only each doc's
    // rarest-term head generates candidates; full dots verify).
    // Identical pair set and bit-identical cosines by construction —
    // shares sparse_cosine_pairs' oracle.
    "sparse_pairs_scalable" -> ((s, d) => {
      graft.operators.TfIdf.sparseCosinePairsScalable(tbl(s, d, "documents"),
        "doc_id", "text", n = ShingleN, maxDfFrac = 0.02,
        maxDfAbs = 100000L, threshold = 0.6)
    }),

    // Incremental sparse screen: the odd-id "new batch" weighted with
    // the even-id index's persisted idf model probes its posting lists
    // (TfIdf.sparseCosineProbe) — the sparse sibling of dedup_lsh_probe
    // and ann_ivf_probe.
    "sparse_probe" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      graft.operators.TfIdf.sparseCosineProbe(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", n = ShingleN, maxDfFrac = 0.02, threshold = 0.6)
    }),

    // Amortized form: the sparse index (idf + postings + norms) is
    // built once per session (IndexCache) so this times the PROBE
    // alone — the steady-state serving cost. Same result by
    // construction; shares sparse_probe's oracle.
    "sparse_probe_amortized" -> ((s, d) => {
      import graft.operators.{IndexCache, TfIdf}
      val docs = tbl(s, d, "documents")
      val ix = IndexCache.getOrBuild(s"sparse:$d") {
        TfIdf.buildSparseIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", n = ShingleN, maxDfFrac = 0.02)
      }
      TfIdf.probeSparseIndex(ix, docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", n = ShingleN, threshold = 0.6)
    }),

    // Cross-source duplication matrix: which sources duplicate each
    // other (Jaccard + directional containments over 60-bit shingle
    // fingerprints) — the report a curation pass reads BEFORE setting
    // per-source mixing weights.
    "source_overlap" -> ((s, d) => {
      Dedup.sourceOverlap(tbl(s, d, "documents"), "source", "text", ShingleN)
        .select(col("source_a"), col("source_b"), col("n_common"),
          round4(col("jaccard")).as("jaccard"),
          round4(col("containment_a")).as("containment_a"),
          round4(col("containment_b")).as("containment_b"))
    }))

  /** Shared SQL fragment: distinct character shingles of `text`. */
  private val shinglesSql =
    s"list_distinct(list_transform(generate_series(1, greatest(length(text) - ${ShingleN - 1}, 1)), " +
      s"i -> substring(text, i, $ShingleN)))"

  /** Mirrors Dedup.shingleBaseHash/seedHash: one 60-bit md5-prefix
    * base hash mod 2^31-1, then k affine mixes (same a_s/b_s seeds). */
  private val P = graft.operators.Dedup.MinhashPrime
  private val baseHashSql =
    s"(('0x' || substring(md5(shingle), 1, 15))::BIGINT % $P)"
  private val minhashAggs = (0 until MinhashK).map { s =>
    val a = graft.operators.Dedup.minhashSeedA(s)
    val b = graft.operators.Dedup.minhashSeedB(s)
    s"min((hm * $a + $b) % $P) AS mh$s"
  }.mkString(", ")

  private val rowsPerBand = MinhashK / Bands
  private val bandSelects = (0 until Bands).map { b =>
    val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"mh$i::VARCHAR")
    s"SELECT doc_id, $b AS band, md5(${cols.mkString(" || ',' || ")}) AS band_sig FROM mh"
  }.mkString(" UNION ALL ")

  private val lowNibbles = "('1','3','5','7','9','b','d','f')"
  private val simhashVotes = (0 until SimhashBits)
    .map(i => s"sum(CASE WHEN substring(h, ${i + 1}, 1) IN $lowNibbles THEN 1 ELSE -1 END) AS b$i")
    .mkString(", ")
  private val simhashConcat = (0 until SimhashBits)
    .map(i => s"(CASE WHEN b$i > 0 THEN '1' ELSE '0' END)").mkString(" || ")
  private val simhashSigSql =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
        h AS (SELECT doc_id, md5(t) AS h FROM tok),
        votes AS (SELECT doc_id, $simhashVotes FROM h GROUP BY doc_id)
        SELECT doc_id, $simhashConcat AS simhash FROM votes"""

  private val simhashChunk = SimhashBits / Bands
  private val simhashBandSelects = (0 until Bands).map { b =>
    s"SELECT doc_id, $b AS band, substring(simhash, ${b * simhashChunk + 1}, $simhashChunk) AS chunk FROM sig"
  }.mkString(" UNION ALL ")

  /** Portable double cosine over DuckDB FLOAT[] lists. */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** Shared by sparse_probe and sparse_probe_amortized (same result by
    * construction — the amortized path only skips rebuilding the
    * index artifacts). */
  private lazy val sparseProbeSql: String =
    s"""WITH gi AS (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(length(text) - ${ShingleN - 1}, 1)),
              i -> substring(text, i, $ShingleN))) AS term
          FROM documents WHERE doc_id % 2 = 0),
        gb AS (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(length(text) - ${ShingleN - 1}, 1)),
              i -> substring(text, i, $ShingleN))) AS term
          FROM documents WHERE doc_id % 2 <> 0),
        tfi AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM gi GROUP BY 1, 2),
        tfb AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM gb GROUP BY 1, 2),
        dfq AS (SELECT term, count(*)::BIGINT AS df FROM tfi GROUP BY term),
        nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tfi),
        idf AS (
          SELECT term, ln((n_docs + 1)::DOUBLE / (df + 1)) + 1 AS idf
          FROM dfq CROSS JOIN nd WHERE df <= n_docs::DOUBLE * 0.02),
        wi AS (
          SELECT doc_id, term, floor(tf * idf * 1024 + 0.5) / 1024 AS w
          FROM tfi JOIN idf USING (term)),
        wb AS (
          SELECT doc_id, term, floor(tf * idf * 1024 + 0.5) / 1024 AS w
          FROM tfb JOIN idf USING (term)),
        ni AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wi GROUP BY doc_id),
        nb AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wb GROUP BY doc_id),
        dots AS (
          SELECT b.doc_id AS id_batch, i.doc_id AS id_index,
            sum(b.w * i.w) AS dot
          FROM wb b JOIN wi i ON b.term = i.term
          GROUP BY 1, 2)
        SELECT id_batch, id_index,
          floor(dot / (nb.nrm * ni.nrm) * 10000 + 0.5) / 10000 AS cosine
        FROM dots
        JOIN nb ON id_batch = nb.doc_id
        JOIN ni ON id_index = ni.doc_id
        WHERE dot / (nb.nrm * ni.nrm) >= 0.6"""

  /** Shared by sparse_cosine_pairs and sparse_pairs_scalable: the
    * scalable form (absolute df ceiling + exact prefix filter) returns
    * the identical pair set with bit-identical cosines by
    * construction, so both compare against this one exact-form SQL. */
  private lazy val sparsePairsSql: String =
    s"""WITH g AS (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(length(text) - ${ShingleN - 1}, 1)),
              i -> substring(text, i, $ShingleN))) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM g GROUP BY 1, 2),
        dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
        idf AS (
          SELECT term, ln((n_docs + 1)::DOUBLE / (df + 1)) + 1 AS idf
          FROM dfq CROSS JOIN nd WHERE df <= n_docs::DOUBLE * 0.02),
        wts AS (
          SELECT doc_id, term, floor(tf * idf * 1024 + 0.5) / 1024 AS w
          FROM tf JOIN idf USING (term)),
        nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wts GROUP BY doc_id),
        dots AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
          FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          floor(dot / (na.nrm * nb.nrm) * 10000 + 0.5) / 10000 AS cosine
        FROM dots
        JOIN nrm na ON id_a = na.doc_id
        JOIN nrm nb ON id_b = nb.doc_id
        WHERE dot / (na.nrm * nb.nrm) >= 0.6"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, content_hash FROM (
           SELECT doc_id, md5(text) AS content_hash,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1""",
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, lang, $shinglesSql AS s FROM documents)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE AS jaccard
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE >= 0.5""",
    "dedup_minhash_lsh" ->
      s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM documents),
          shh AS (SELECT doc_id, $baseHashSql AS hm FROM sh),
          mh AS (SELECT doc_id, $minhashAggs FROM shh GROUP BY doc_id),
          bands AS ($bandSelects)
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id""",
    "dedup_simhash" -> simhashSigSql,
    "dedup_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t FROM documents),
          h AS (SELECT doc_id, md5(t) AS h FROM tok),
          votes AS (SELECT doc_id, $simhashVotes FROM h GROUP BY doc_id),
          sig AS (SELECT doc_id, $simhashConcat AS simhash FROM votes),
          banded AS ($simhashBandSelects)
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id""",
    "dedup_lsh_probe" ->
      s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM documents),
          shh AS (SELECT doc_id, $baseHashSql AS hm FROM sh),
          mh AS (SELECT doc_id, $minhashAggs FROM shh GROUP BY doc_id),
          bands AS ($bandSelects)
          SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_idx
          FROM bands n JOIN bands o
            ON n.band = o.band AND n.band_sig = o.band_sig
          WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0""",
    "dedup_substring" ->
      s"""WITH $winnowFpsCte
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id""",
    "dedup_containment" ->
      s"""WITH $winnowFpsCte,
          cnt AS (SELECT doc_id, count(*)::BIGINT AS nfp FROM fps GROUP BY doc_id),
          shared AS (
            SELECT a.doc_id AS id_inner, b.doc_id AS id_outer, count(*)::BIGINT AS sh
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id <> b.doc_id
            GROUP BY 1, 2)
          SELECT id_inner, id_outer
          FROM shared JOIN cnt ON cnt.doc_id = shared.id_inner AND sh = nfp""",
    "dedup_embed_cosine" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold""",
    "sample_source_cap" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, row_number() OVER (PARTITION BY source
             ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000,
                      doc_id) AS r
           FROM documents) t
         WHERE r <= 15""",
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE (('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)
           < (CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 8000 ELSE 5000 END)""",
    "sample_weighted" ->
      """WITH t AS (SELECT sum(n_chars)::BIGINT AS w_total FROM documents)
         SELECT doc_id, n_chars FROM documents CROSS JOIN t
         WHERE (('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)
             * w_total < 500 * n_chars * 10000""",
    "sample_temperature" ->
      """WITH c AS (
           SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
         s AS (
           SELECT lang, n_docs,
             CAST(floor(sqrt(n_docs) * 1000000 + 0.5) AS BIGINT) AS sc
           FROM c),
         z AS (SELECT sum(sc)::BIGINT AS z FROM s)
         SELECT lang, n_docs,
           floor(sc::DOUBLE / z * 10000 + 0.5) / 10000 AS weight,
           CAST(floor(sc::DOUBLE / z * 100000 + 0.5) AS BIGINT) AS expected_per_100k
         FROM s CROSS JOIN z""",
    "corpus_mix" ->
      """WITH n AS (
           SELECT lang, count(*)::BIGINT AS n,
             (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3 ELSE 0.2 END)::DOUBLE AS w
           FROM documents WHERE lang IN ('en', 'de', 'fr') GROUP BY lang),
         t AS (SELECT min(n / w) AS total FROM n),
         thr AS (
           SELECT lang, CAST(floor(total * w / n * 10000) AS BIGINT) AS threshold
           FROM n CROSS JOIN t)
         SELECT d.lang AS mix_source, d.doc_id
         FROM documents d JOIN thr ON d.lang = thr.lang
         WHERE (('0x' || substring(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000)
           < thr.threshold""",
    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(id, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)
          SELECT id, min(label) AS cluster_id FROM reach GROUP BY id""",
    "cluster_size_hist" ->
      s"""WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(id, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
          clusters AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
          sizes AS (SELECT cluster_id, count(*)::BIGINT AS size
                    FROM clusters GROUP BY cluster_id)
          SELECT size, count(*)::BIGINT AS n_clusters,
            CAST(sum(size - 1) AS BIGINT) AS n_removable
          FROM sizes GROUP BY size""",
    "dedup_keep_set" ->
      s"""WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(id, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
          clusters AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
          SELECT id FROM clusters WHERE id = cluster_id
          UNION ALL
          SELECT vec_id AS id FROM embeddings
          WHERE vec_id NOT IN (SELECT id FROM clusters)""",
    "split_leakproof" ->
      s"""WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} >= $CosineThreshold),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(id, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
          clusters AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
          g AS (SELECT e.vec_id, coalesce(c.cluster_id, e.vec_id) AS gk
                FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.id),
          b AS (SELECT vec_id,
                  (('0x' || substring(md5(gk::VARCHAR), 1, 15))::BIGINT % 10000) AS bk
                FROM g)
          SELECT vec_id,
            CASE WHEN bk < 8000 THEN 'train'
                 WHEN bk < 9000 THEN 'val'
                 ELSE 'test' END AS split
          FROM b""",
    "dedup_keep_best" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM documents),
          shh AS (SELECT doc_id, $baseHashSql AS hm FROM sh),
          mh AS (SELECT doc_id, $minhashAggs FROM shh GROUP BY doc_id),
          bands AS ($bandSelects),
          pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(id, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
          clusters AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
          reps AS (
            SELECT id FROM (
              SELECT c.id,
                row_number() OVER (PARTITION BY c.cluster_id
                  ORDER BY d.n_chars DESC, c.id ASC) AS rn
              FROM clusters c JOIN documents d ON d.doc_id = c.id)
            WHERE rn = 1)
          SELECT id FROM reps
          UNION ALL
          SELECT doc_id AS id FROM documents
          WHERE doc_id NOT IN (SELECT id FROM clusters)""",
    "sparse_probe" -> sparseProbeSql,
    // identical result by construction: the amortized path only skips
    // rebuilding the index artifacts
    "sparse_probe_amortized" -> sparseProbeSql,
    "sparse_cosine_pairs" -> sparsePairsSql,
    // identical pair set + bit-identical cosines by construction: the
    // scalable form only changes HOW candidates are generated (absolute
    // df ceiling is above frac·n on this corpus; the prefix filter is
    // exact), never which pairs survive or their sums
    "sparse_pairs_scalable" -> sparsePairsSql,
    "dedup_minhash_estimate" -> {
      val matchSum = (0 until MinhashK)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM documents),
          shh AS (SELECT doc_id, $baseHashSql AS hm FROM sh),
          mh AS (SELECT doc_id, $minhashAggs FROM shh GROUP BY doc_id),
          bands AS ($bandSelects),
          pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id)
          SELECT p.id_a, p.id_b,
            ($matchSum)::DOUBLE / $MinhashK AS est_jaccard
          FROM pairs p
          JOIN mh a ON p.id_a = a.doc_id
          JOIN mh b ON p.id_b = b.doc_id"""
    },
    "source_overlap" ->
      s"""WITH sh0 AS (
            SELECT source, unnest($shinglesSql) AS shingle FROM documents),
          sh AS (SELECT DISTINCT source,
            ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS fp FROM sh0),
          sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
          ov AS (
            SELECT a.source AS source_a, b.source AS source_b,
              CAST(count(*) AS BIGINT) AS n_common
            FROM sh a JOIN sh b ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2)
          SELECT source_a, source_b, n_common,
            floor(n_common::DOUBLE / (sa.n + sb.n - n_common)::DOUBLE
              * 10000 + 0.5) / 10000 AS jaccard,
            floor(n_common::DOUBLE / sa.n::DOUBLE * 10000 + 0.5) / 10000
              AS containment_a,
            floor(n_common::DOUBLE / sb.n::DOUBLE * 10000 + 0.5) / 10000
              AS containment_b
          FROM ov
          JOIN sz sa ON ov.source_a = sa.source
          JOIN sz sb ON ov.source_b = sb.source""")
}
