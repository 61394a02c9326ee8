package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language model for unsupervised quality
  * filtering — the perplexity signal of the CCNet/CC-100 pipeline
  * (score web documents under an LM trained on a trusted corpus; keep
  * the low-perplexity head). Public prior art: Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"
  * (2019); add-k smoothing per Chen & Goodman (1996).
  *
  * Scale shape: training is ONE partial-agg `groupBy` over exploded
  * bigrams (map-side combine carries (gram, partial-count), never
  * text); the model is vocabulary-sized, so scoring joins it by
  * SHUFFLE-HASH (hinted, like TfIdf's idf side — a model over a real
  * corpus outgrows a broadcast), and the per-doc average is a second
  * partial agg keyed by doc. Nothing driver-side anywhere.
  */
object LangModel {

  /** Lowercased whitespace tokens of `textCol`. */
  private def toks(textCol: Column): Column =
    split(trim(lower(textCol)), "\\s+")

  /** (doc, w1, w2) bigram rows for docs with >= 2 tokens. The token
    * split is materialized in its own projection first (a lambda must
    * capture an attribute, not the split expression — see
    * `Cleaning.wordGramsOf`). */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__toks", toks(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train: bigram counts `n`, left-context totals `n_w1`, and the
    * vocabulary size `v` (distinct successor tokens), as three frames.
    * All partial-agg shuffles on gram keys; the corpus text never
    * moves. */
  def bigramModel(corpus: DataFrame, idCol: String, textCol: String)
    : (DataFrame, DataFrame, DataFrame) = {
    val bg = bigrams(corpus, idCol, textCol)
    val counts = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val context = counts.groupBy(col("w1")).agg(sum(col("n")).as("n_w1"))
    val vocab = bg.agg(count_distinct(col("w2")).as("v"))
    (counts, context, vocab)
  }

  /** Score: average negative log2 probability per document under the
    * add-k smoothed bigram model — `ppx = avg(-log2((n+k)/(n_w1+k·v)))`
    * (perplexity is `2^ppx`; the average is monotone in it and
    * numerically tamer). Bigrams unseen in training back off to the
    * smoothing mass via the left join's coalesce; an unseen left
    * context contributes `-log2(1/v)`. Model sides join by shuffle-hash
    * (never convention-broadcast). */
  def scoreAvgLog2(docs: DataFrame, idCol: String, textCol: String,
                   counts: DataFrame, context: DataFrame, vocab: DataFrame,
                   k: Double = 0.5): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    bg.join(counts.hint("shuffle_hash"), Seq("w1", "w2"), "left")
      .join(context.hint("shuffle_hash"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (-log2((coalesce(col("n"), lit(0L)) + lit(k)) /
          (coalesce(col("n_w1"), lit(0L)) + lit(k) * col("v")))).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("nll")).as("avg_nll"))
  }

  /** Self-scored corpus (train == score): every bigram is observed, so
    * this is the in-distribution perplexity used to set the keep
    * threshold before scoring fresh crawl batches against the same
    * model. */
  def selfScore(corpus: DataFrame, idCol: String, textCol: String,
                k: Double = 0.5): DataFrame = {
    val (counts, context, vocab) = bigramModel(corpus, idCol, textCol)
    scoreAvgLog2(corpus, idCol, textCol, counts, context, vocab, k)
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every corpus document by its average log2 likelihood-ratio under
    * a target-domain unigram LM vs the raw-corpus unigram LM —
    * `avg_lr = avg(log2 p_target(w) - log2 p_raw(w)))` over the doc's
    * token instances, add-k smoothing over the raw vocabulary on both
    * sides. High `avg_lr` = "looks like the target domain"; sampling
    * proportional to the exponentiated ratio is the DSIR recipe for
    * tilting a web crawl toward a trusted corpus.
    *
    * `targetPred` marks the target-domain rows (e.g. `lang === "en"`
    * or a trusted-source predicate) — a predicate, not a second
    * corpus, so the tokenize happens ONCE.
    *
    * Scale shape: one exploded token pass (localCheckpoint'ed — it
    * feeds both count tables and the scoring join, replacing three
    * scan+explode lineages), two vocabulary-sized partial-agg
    * groupBys, and a scoring join by SHUFFLE-HASH on the token (a
    * real corpus vocabulary outgrows a broadcast); scalar totals ride
    * a 1-row broadcast. The per-doc average is a final partial agg
    * keyed by doc. */
  def dsirWeights(corpus: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, k: Double = 0.5): DataFrame = {
    val tok = corpus
      .select(col(idCol), targetPred.as("__tgt"),
        explode(toks(col(textCol))).as("w"))
      .localCheckpoint()
    // vocab-sized count tables, checkpointed: each feeds BOTH its
    // scalar-totals aggregate and the scoring join without re-counting
    // the token table
    val raw = tok.groupBy(col("w")).agg(count(lit(1)).as("nr"))
      .localCheckpoint()
    val tgt = tok.filter(col("__tgt")).groupBy(col("w"))
      .agg(count(lit(1)).as("nt"))
      .localCheckpoint()
    val totals = raw.agg(
      sum(col("nr")).cast("double").as("n_raw"),
      count(lit(1)).cast("double").as("v"))
    // coalesce: an empty target domain must yield the smoothing-only
    // numerator, not a null that blanks every score
    val tgtTotal = tgt.agg(
      coalesce(sum(col("nt")).cast("double"), lit(0.0)).as("n_tgt"))
    tok.join(raw.hint("shuffle_hash"), Seq("w"))
      .join(tgt.hint("shuffle_hash"), Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(tgtTotal))
      .select(col(idCol),
        (log2((coalesce(col("nt"), lit(0L)) + lit(k)) /
            (col("n_tgt") + lit(k) * col("v"))) -
          log2((col("nr") + lit(k)) /
            (col("n_raw") + lit(k) * col("v")))).as("lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("lr")).as("avg_lr"))
  }
}
