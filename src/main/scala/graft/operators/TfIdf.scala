package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction (the classic corpus salience
  * score: smoothed idf = ln((N+1)/(df+1)) + 1).
  *
  * Scale shape: term counts are ONE partial-agg groupBy over exploded
  * tokens; document frequencies reduce the (doc, term) table to a
  * vocabulary-sized frame joined back BY SHUFFLE on `term` — a
  * web-scale corpus has billions of distinct tokens, so the idf side
  * must never broadcast (only the 1-row doc count does); the final
  * top-k is a per-doc window. Ranking uses the ROUNDED score
  * (4 places) with the term as tie-break, so the order is deterministic
  * across engines and float-combine orders.
  */
object TfIdf {

  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = Dedup.spread(df).select(col(idCol),
      explode_outer(split(trim(col(textCol)), "\\s+")).as("term"))
    // tf feeds THREE consumers (the score join, dfreq, n_docs) and
    // Spark's exchange reuse does not unify them — without a
    // materialization the corpus would be scanned and tokenized once
    // per consumer, and tokenization dominates at corpus scale.
    // localCheckpoint stores the post-agg (doc, term, tf) frame —
    // vocabulary-sized per doc, far smaller than the raw text — at
    // MEMORY_AND_DISK, so it spills rather than OOMs.
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // explode_outer keeps every doc (null/empty text included) in tf,
    // so distinct doc ids over tf == count(*) over df — no third scan.
    val nDocs = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(nDocs)).select(col("term"),
      (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))
    // Vocabulary-sized side: shuffle-hash join on term (hinted so the
    // planner can't "helpfully" broadcast a billions-of-tokens frame).
    val scored = tf.join(idf.hint("shuffle_hash"), Seq("term"))
      .withColumn("score",
        floor(col("tf") * col("idf") * 10000 + lit(0.5)) / 10000)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** Corpus vocabulary head: global token frequencies (lowercased
    * whitespace tokens), `minCount` floor, top-`n` by (freq desc, token
    * asc) — the first pass of tokenizer/vocab training over a corpus.
    *
    * Scale shape: explode + ONE partial-agg groupBy(token); the top-n is
    * `orderBy.limit` — Spark plans TakeOrderedAndProject (per-partition
    * heaps + driver merge of n rows), never a global sort of the
    * vocabulary. The rank window runs on the n surviving rows only.
    */
  def vocab(df: DataFrame, textCol: String, minCount: Long, n: Int): DataFrame = {
    val toks = Dedup.spread(df).select(
      explode_outer(split(trim(lower(col(textCol))), "\\s+")).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .orderBy(col("freq").desc, col("token").asc)
      .limit(n)
    // deliberate single-partition window over the n surviving rows —
    // keyed so the optimizer can't strip the spec (see
    // Relational.singlePartitionKey)
    freq.withColumn("rank",
      row_number().over(Window.partitionBy(Relational.singlePartitionKey())
        .orderBy(col("freq").desc, col("token").asc)))
      .select(col("rank"), col("token"), col("freq"))
  }

  /** Inverted-index build (the search-engine core structure): one row
    * per surviving term with document frequency, corpus term frequency,
    * and the posting list serialized as "doc:tf" pairs in ascending doc
    * order.
    *
    * Scale shape: two partial-agg groupBys — (term, doc) collapses the
    * exploded tokens to per-doc tf, then (term) folds postings; both
    * shuffle on keys that only shrink. The `minDf`/`maxDfFrac` band is
    * the scale guard: the fractional cap drops stop-words whose posting
    * lists would otherwise approach corpus size (a list nobody queries
    * but every executor would have to materialize) AT ANY corpus size —
    * an absolute cap would need retuning per scale factor — and `minDf`
    * drops the hapax tail. The doc count is a 1-row frame (column-pruned
    * id scan), broadcast into the band filter.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxDfFrac: Double): DataFrame = {
    val toks = Dedup.spread(df).select(col(idCol).as("doc"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val nDocs = df.select(countDistinct(col(idCol)).as("__n_docs"))
    val perDoc = toks.groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))
    perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("corpus_tf"),
        array_join(
          transform(sort_array(collect_list(struct(col("doc"), col("tf")))),
            p => concat(p("doc").cast("string"), lit(":"),
              p("tf").cast("string"))), " ").as("postings"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("df") <= col("__n_docs") * maxDfFrac)
      .drop("__n_docs")
  }

  /** Incremental form of [[sparseCosinePairs]] — the ingest-time
    * screen (the sparse sibling of `Dedup.lshProbePairs` /
    * `Similarity.ivfProbeTopK`): the NEW batch is weighted with the
    * PERSISTED index's idf model (df/n from the index corpus only —
    * the statistics don't shift under the batch) and probes the
    * index's posting lists; batch terms unseen in the index carry no
    * weight, exactly as querying any inverted index. The batch side is
    * ingest-sized and broadcasts into the term join when stats allow —
    * the index postings never reshuffle. Emits (batch id, index id,
    * cosine) above `threshold`, cosine over each side's capped feature
    * space, same 2⁻¹⁰ exact-sum quantization as the batch form. */
  def sparseCosineProbe(index: DataFrame, batch: DataFrame, idCol: String,
                        textCol: String, n: Int, maxDfFrac: Double,
                        threshold: Double): DataFrame =
    // One-shot form: build + probe are consumed by a SINGLE action, so
    // the derived artifacts (idxW, idxNorms) stay LAZY — their shared
    // parents are checkpointed, so each consumer re-runs only a cheap
    // cached-block projection/agg, and the per-artifact checkpoint
    // jobs the persisted form pays are skipped. idxTf and idf keep
    // their checkpoints even here: the sparse13b A/B measured the
    // ALL-lazy spelling SLOWER than this mixed one (the weigh joins
    // below the reused tf exchange recompute per consumer, and lazy
    // stats degrade the probe-side join choice) — med ~2.9 s mixed vs
    // ~3.1 all-lazy vs ~3.5 all-checkpointed. The fully persisted form
    // remains the right call when the index outlives one action
    // (IndexCache / serving).
    probeSparseIndex(
      buildSparseIndex(index, idCol, textCol, n, maxDfFrac,
        persist = false),
      batch, idCol, textCol, n, threshold)

  /** The persisted artifacts of a sparse similarity index: the idf
    * model, the weighted postings, and the per-doc norms — all
    * checkpointed (in production: written tables). */
  final case class SparseIndex(idf: DataFrame, weights: DataFrame,
                               norms: DataFrame)

  /** (id, term, tf) over codepoint n-grams — counted IN-ROW by
    * [[org.apache.spark.sql.graftx.ShingleTf]] and exploded at
    * distinct-gram size, where the former spelling exploded one row
    * per gram OCCURRENCE (≈ the corpus's character volume) and
    * hash-aggregated that stream back down. The groupBy stays — an
    * input carrying the same id on several rows (un-deduped ingest)
    * must still merge to one (id, term) row, as the old spelling
    * guaranteed — but both its map-side combine and its exchange now
    * run at distinct-gram size, and the null-text row survives it
    * (explode_outer + sum-of-null), so doc counts see every
    * document. */
  private def tfOf(d: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame =
    Dedup.spread(d).select(col(idCol),
      explode_outer(org.apache.spark.sql.graftx.ShingleTf
        .shingleTf(col(textCol), n)).as(Seq("term", "__tf")))
      .groupBy(col(idCol), col("term")).agg(sum(col("__tf")).as("tf"))

  /** Attach idf weights by an UNHINTED term join: the idf side is the
    * DF-CAPPED vocabulary, whose size is corpus-dependent — a test
    * corpus caps to a few thousand terms (broadcast territory), a
    * 100-TB corpus still holds billions of rare terms (must shuffle).
    * Leaving the choice to the planner + AQE picks broadcast from the
    * RUNTIME size when it fits under the broadcast threshold and the
    * skew-safe shuffle join when it doesn't — a static hint would pin
    * the wrong plan at one end or the other. (topTerms' idf is
    * UNCAPPED true-vocabulary-sized and keeps its shuffle pin.) */
  private def weigh(tf: DataFrame, idf: DataFrame, idCol: String): DataFrame =
    tf.join(idf, Seq("term"))
      .select(col(idCol), col("term"),
        (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))

  /** Build-once half of [[sparseCosineProbe]] (amortized across every
    * later batch — route through `IndexCache` on a serving path).
    *
    * `persist` (default true) materializes EVERY artifact with
    * `localCheckpoint` — required whenever the index outlives the
    * action that builds it (IndexCache, serving), and what "persisted
    * tables" stand in for in production. Pass false ONLY when the
    * returned frames are consumed by a single action (the one-shot
    * [[sparseCosineProbe]]): the tokenization aggregate (idxTf) and
    * the idf model still checkpoint — they are corpus-priced and feed
    * consumers in SEPARATE actions — but the derived weights/norms
    * stay lazy, each consumer re-deriving them from the checkpointed
    * parents (cheap cached-block work; the sparse13b A/B measured
    * both the all-lazy and the all-checkpointed spellings slower). */
  def buildSparseIndex(index: DataFrame, idCol: String, textCol: String,
                       n: Int, maxDfFrac: Double,
                       persist: Boolean = true): SparseIndex = {
    def ckpt(df: DataFrame): DataFrame =
      if (persist) df.localCheckpoint() else df
    val idxTf = tfOf(index, idCol, textCol, n).localCheckpoint()
    val dfreq = idxTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = idxTf.select(countDistinct(col(idCol)).as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs").cast("double") * maxDfFrac)
      .select(col("term"),
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
          .as("idf"))
      .localCheckpoint() // the persisted model: weighs BOTH sides
    val idxW = ckpt(weigh(idxTf, idf, idCol))
    val idxNorms = ckpt(idxW.groupBy(col(idCol))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm")))
    SparseIndex(idf, idxW, idxNorms)
  }

  /** Probe-only half: weigh the batch with the index's idf (unseen
    * terms weigh zero) and join its posting lists — the steady-state
    * serving cost. */
  def probeSparseIndex(ix: SparseIndex, batch: DataFrame, idCol: String,
                       textCol: String, n: Int, threshold: Double,
                       persistBatch: Boolean = true): DataFrame = {
    // batW feeds two consumers (norms + the probe join) and tfOf now
    // carries the distinct-gram aggregation exchange — materialize
    // once so the batch's shuffle doesn't run per consumer (the old
    // "recompute tokenization" trade predates tfOf containing a
    // shuffle; exchange reuse does not unify separate actions).
    // `persistBatch = false` keeps batW lazy for callers whose batch
    // weighting is trivially cheap to re-derive; the default stays
    // true — the sparse13b A/B kept it checkpointed even on the
    // one-shot path (the mixed spelling that measured fastest).
    val batW0 = weigh(tfOf(batch, idCol, textCol, n), ix.idf, idCol)
    val batW = if (persistBatch) batW0.localCheckpoint() else batW0
    val batNorms = batW.groupBy(col(idCol))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = Relational.broadcastIfSmall(
        batW.select(col("term"), col(idCol).as("id_batch"), col("w").as("wb")))
      .join(ix.weights.select(col("term"), col(idCol).as("id_index"),
        col("w").as("wi")), Seq("term"))
      .groupBy(col("id_batch"), col("id_index"))
      .agg(sum(col("wb") * col("wi")).as("dot"))
    dots
      .join(batNorms.select(col(idCol).as("id_batch"), col("nrm").as("nb")),
        Seq("id_batch"))
      .join(ix.norms.select(col(idCol).as("id_index"), col("nrm").as("ni")),
        Seq("id_index"))
      .withColumn("cosine", col("dot") / (col("nb") * col("ni")))
      .filter(col("cosine") >= threshold)
      .select(col("id_batch"), col("id_index"),
        (floor(col("cosine") * 10000 + lit(0.5)) / 10000).as("cosine"))
  }

  /** Sparse TF-IDF cosine document-pair similarity — the inverted-
    * index similarity join (the sparse sibling of the dense
    * `Similarity.lshCosineNearDupPairs`): documents become tf-idf
    * vectors over character `n`-gram terms, pairs are generated ONLY
    * through shared posting lists, and the df-cap (`maxDfFrac`) drops
    * the stop-gram head (which carries no signal). Cosine is computed
    * over the CAPPED feature space.
    *
    * Cross-engine-exact: weights quantize to 2⁻¹⁰ dyadic rationals, so
    * every dot/norm term is an exact double and the per-pair sums are
    * order-independent — the threshold filter sees identical bits in
    * Spark's partial aggs and a sequential engine (the `ln` of idf is
    * pre-quantization, its ulp variation absorbed like logreg's exp).
    * One tokenize pass; (doc, term, w) is checkpointed and feeds the
    * norms AND both posting sides.
    *
    * SCALE WARNING: a FRACTIONAL df cap is not a fan-out bound — the
    * allowed df grows with the corpus, so a near-cap term emits
    * C(frac·n, 2) pair tuples, quadratic in corpus size. This form is
    * the small-corpus ORACLE; the 100-TB path is
    * [[sparseCosinePairsScalable]] (absolute df ceiling + exact
    * AllPairs prefix filter), which returns the identical pair set. */
  def sparseCosinePairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, maxDfFrac: Double,
                        threshold: Double): DataFrame = {
    val tf = tfOf(df, idCol, textCol, n).localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs").cast("double") * maxDfFrac)
      .select(col("term"),
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))
    // the shared [[weigh]] helper: unhinted idf join + the 2^-10 grid
    val wts = weigh(tf, idf, idCol)
      .localCheckpoint() // feeds norms + both posting sides
    val norms = wts.groupBy(col(idCol)).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val a = wts.select(col("term"), col(idCol).as("id_a"), col("w").as("wa"))
    val b = wts.select(col("term"), col(idCol).as("id_b"), col("w").as("wb"))
    val dots = a.join(b, Seq("term")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("nrm").as("na")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cosine", col("dot") / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        (floor(col("cosine") * 10000 + lit(0.5)) / 10000).as("cosine"))
  }

  /** The 100-TB form of [[sparseCosinePairs]] — identical output,
    * corpus-size-independent fan-out. Two guards replace the
    * fractional df cap as the bound:
    *
    *  1. '''Absolute df ceiling''': the feature space keeps terms with
    *     `df ≤ min(maxDfFrac·n, maxDfAbs)`, so per-term candidate
    *     fan-out is ≤ prefixOcc(term)·maxDfAbs at ANY corpus size
    *     (pass `maxDfAbs ≥ maxDfFrac·n` to reproduce the oracle's
    *     feature space exactly on a test corpus).
    *  2. '''Exact AllPairs prefix filter''' (Bayardo et al., WWW'07
    *     adapted to normalized cosine): order each doc's terms by
    *     (df asc, term asc) — rarest first — and call a term a PREFIX
    *     term iff the normalized squared-weight mass strictly before
    *     it is ≤ 1 − t². If a pair shares no prefix term of either
    *     side, every shared term sits in a suffix whose norm is < t,
    *     so cos(x,y) ≤ ‖x̂_suffix‖·‖ŷ‖ < t — hence generating
    *     candidates from (prefix terms of the smaller id) × (full
    *     postings) is EXACT, and only the rare-term head of each doc
    *     probes the index. The boundary test widens by 1e−12 so a
    *     0.5-ulp rounding of (1−t²)·‖x‖² can only ADD candidates,
    *     never drop one.
    *
    * Candidates then verify by an exact dot over the FULL capped
    * vectors (candidate-pair join back to the weight table), so every
    * surviving pair carries the same order-independent dyadic-exact
    * sum as [[sparseCosinePairs]] — bit-identical cosines. */
  def sparseCosinePairsScalable(df: DataFrame, idCol: String, textCol: String,
                                n: Int, maxDfFrac: Double, maxDfAbs: Long,
                                threshold: Double): DataFrame = {
    val tf = tfOf(df, idCol, textCol, n).localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(nDocs))
      .filter(col("df") <= least(col("n_docs").cast("double") * maxDfFrac,
        lit(maxDfAbs.toDouble)))
      .select(col("term"), col("df"),
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))
    // carries df so the per-doc prefix ordering needs no second join
    // (unhinted idf join: see [[weigh]])
    val wts = tf.join(idf, Seq("term"))
      .select(col(idCol).as("id"), col("term"), col("df"),
        (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))
      .localCheckpoint() // feeds prefix flags, norms, and both verify sides
    // doc-vector-bounded window: per-doc cumulative w² strictly before
    // the current term in (df asc, term asc) order. The full-vector
    // ‖x‖² RIDES THE SAME WINDOW EXCHANGE as an unbounded-frame sum
    // over the identical partitionBy — no nrm2 join on the probe path
    // (w² terms are 2⁻²⁰-grid dyadic rationals, so the window's
    // in-order sum and the groupBy's partial-agg sum are bit-equal).
    val wOrd = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val probe = wts
      .withColumn("__nrm_sq",
        sum(col("w") * col("w")).over(Window.partitionBy(col("id"))))
      .withColumn("__before",
        coalesce(sum(col("w") * col("w")).over(wOrd), lit(0.0)))
      .filter(col("__before") <=
        lit(1.0 - threshold * threshold) * col("__nrm_sq") * (1 + 1e-12) + 1e-12)
      .select(col("term"), col("id").as("id_a"))
    val post = wts.select(col("term"), col("id").as("id_b"))
    val cand = probe.join(post, Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // Verify by VECTOR LOOKUP, the AllPairs shape: one agg folds each
    // doc's capped vector into a term→w map (bounded by doc length)
    // alongside its norm, then each candidate pair joins its two
    // vectors and the dot is an in-row map-merge — no posting
    // re-explosion, no per-(pair, term) shuffle, no separate norm
    // joins. The merge is `map_zip_with` + a sum over its values:
    // MapZipWith unions the key sets through ONE hash map, so the
    // per-pair cost is O(|va| + |vb|) — NOT the O(|va|·|vb|) a per-key
    // `element_at` lookup would pay (element_at on a map is a linear
    // scan of ArrayBasedMapData; at 100-TB doc lengths that constant
    // is the verify stage). Each w_a·w_b product is a 2⁻²⁰-grid dyadic
    // rational, so the in-row fold order is exact — bit-identical to
    // the oracle's join-and-sum spelling (absent keys contribute an
    // exact 0.0).
    val vecs = wts.groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("w"))))
          .as("vec"),
        sqrt(sum(col("w") * col("w"))).as("nrm"))
      .localCheckpoint() // doc-sized; feeds both sides of the verify join
    val dot = aggregate(
      map_values(map_zip_with(col("va"), col("vb"),
        (_, a, b) => coalesce(a, lit(0.0d)) * coalesce(b, lit(0.0d)))),
      lit(0.0d), (acc, x) => acc + x)
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cosine", dot / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        (floor(col("cosine") * 10000 + lit(0.5)) / 10000).as("cosine"))
  }
}
