package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Text-analysis pipeline queries over the `documents` table: token
  * counting, quality scoring, language ID, fingerprinting. Oracle SQL
  * is generated from the same marker-word tables so both sides stay in
  * lock-step.
  */
object TextQueries {

  val queries: Map[String, QueryFn] = Map(
    // Corpus "data card" profile: one partial-agg groupBy reducing
    // every doc to scalars map-side; exact quantiles over the bounded
    // distinct-length domain (see operators.Profiling).
    "corpus_profile" -> ((s, d) => {
      graft.operators.Profiling.corpusProfile(
        tbl(s, d, "documents"), "lang", "text")
    }),

    // Snapshot drift report: even doc_ids stand in for the reference
    // snapshot, odd for the current; n_chars bucketed in 64-char bins.
    // Chi-square contributions instead of PSI's log-ratio so the
    // report is bit-exact across engines (see Profiling.scala).
    "drift_report" -> ((s, d) => {
      graft.operators.Profiling.distributionDrift(
        tbl(s, d, "documents"),
        expr("n_chars div 64"), pmod(col("doc_id"), lit(2)))
    }),

    "text_tokens" -> ((s, d) => {
      tbl(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        size(TextAnalysis.bpeishTokens(col("text"))).as("n_bpe"),
        TextAnalysis.punctCount(col("text")).as("n_punct"))
    }),

    "text_quality" -> ((s, d) => {
      tblSpread(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    }),

    // Corpus grep: exact substring search through a trigram posting
    // index (candidates = docs holding ALL pattern trigrams, then a
    // verify fetch) — identical result set to a full-scan contains(),
    // which is exactly what the oracle runs.
    "grep_search" -> ((s, d) => {
      import graft.operators.GrepIndex
      val docs = tbl(s, d, "documents")
      val index = GrepIndex.build(docs, "doc_id", "text")
      GrepIndex.search(index, docs, "doc_id", "text", "the customer")
    }),

    // The amortized form of grep_search: the posting index is built
    // once per input (IndexCache, localCheckpoint'ed) and reused, so
    // this query's steady-state timing is the PROBE alone — the
    // serving-path cost an index exists to deliver. Same exact-search
    // semantics, same full-scan oracle.
    "grep_probe" -> ((s, d) => {
      import graft.operators.{GrepIndex, IndexCache}
      val docs = tbl(s, d, "documents")
      val index = IndexCache.getOrBuild(s"grep:$d") {
        GrepIndex.build(docs, "doc_id", "text").localCheckpoint()
      }
      GrepIndex.search(index, docs, "doc_id", "text", "customer query")
    }),

    // Lexical repetition metrics — the within-document counterpart of
    // the Gopher battery (its repetition rules are the single biggest
    // web-crawl killer): type-token ratio and the top word's share of
    // the document. One explode + two doc-keyed partial-agg groupBys;
    // state is bounded by distinct words per document, never corpus
    // vocabulary. The flag thresholds the ROUNDED share so both
    // engines decide identically at the boundary.
    "quality_repetition" -> ((s, d) => {
      val toks = tblSpread(s, d, "documents").select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      val perWord = toks.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("c"))
      perWord.groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_words"),
          count(lit(1)).as("n_distinct"),
          round4(count(lit(1)).cast("double") / sum(col("c"))).as("ttr"),
          round4(max(col("c")).cast("double") / sum(col("c"))).as("top_share"))
        .withColumn("repetitive", col("top_share") > 0.1)
    }),

    // Gopher-style rule battery (document-level subset, exact counts).
    "quality_gopher" -> ((s, d) => {
      tblSpread(s, d, "documents").select(col("doc_id"),
        TextAnalysis.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.word_count_ok"), col("g.mean_word_len_ok"),
          col("g.hash_ratio_ok"), col("g.ellipsis_ratio_ok"),
          col("g.alpha_word_ratio_ok"), col("g.stop_word_ok"), col("g.keep"))
    }),

    "text_langid" -> ((s, d) => {
      tblSpread(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
    }),

    // Sequence packing: carve per-language token streams into
    // fixed-capacity training sequences (bin + offset per doc).
    "pack_sequences" -> ((s, d) => {
      graft.operators.Packing.packBins(
        tbl(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        groupCol = "lang", orderCol = "doc_id", sizeCol = "n_chars",
        capacity = 2048L)
        .select(col("doc_id"), col("lang"), col("bin"), col("bin_offset"))
    }),

    // GPT-style context-window packing: docs concatenated in a
    // deterministic hash-shuffled GLOBAL order, cut into fixed
    // 256-token windows; each doc's global token offset + the window
    // span it lands in. The global running total is
    // Relational.orderedPrefixSum — range-partitioned, never a
    // single-partition window.
    "pack_context_windows" -> ((s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("__ord"))
      graft.operators.Relational.orderedPrefixSum(docs,
        Seq(col("__ord"), col("doc_id")), col("n_tok"), "cum_tok")
        .select(col("doc_id"), col("n_tok"),
          (col("cum_tok") - col("n_tok")).as("tok_start"),
          floor((col("cum_tok") - col("n_tok")).cast("double") / 256)
            .as("win_start"),
          floor((col("cum_tok") - 1).cast("double") / 256).as("win_end"))
    }),

    // Deterministic global training-order shuffle: hash-mod shard +
    // dense in-shard position, reproducible across engines/clusters.
    "train_order" -> ((s, d) => {
      graft.operators.Packing.trainingOrder(
        tbl(s, d, "documents").select(col("doc_id")),
        idCol = "doc_id", seed = "s42", nShards = 8)
        .select(col("doc_id"), col("shard"), col("shard_pos"))
    }),

    // Dataset-export shard manifest: rows/bytes/order-independent
    // content checksum per hash shard — the delivery audit artifact.
    // Seeded with train_order's seed so the manifest's shard ids line
    // up with that export layout (the alignment the operator
    // documents).
    "shard_manifest" -> ((s, d) => {
      graft.operators.Packing.shardManifest(
        tbl(s, d, "documents"), "doc_id", "text", nShards = 8,
        seed = "s42")
    }),

    // Per-doc TF-IDF top terms (corpus keyword extraction).
    "tfidf_topk" -> ((s, d) => {
      graft.operators.TfIdf.topTerms(tbl(s, d, "documents"),
        "doc_id", "text", k = 3)
    }),

    // Tokenizer-vocab head: top-50 corpus tokens with a min-count floor.
    "vocab_topk" -> ((s, d) => {
      graft.operators.TfIdf.vocab(tbl(s, d, "documents"),
        "text", minCount = 5L, n = 50)
    }),

    "text_fingerprint" -> ((s, d) => {
      tbl(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    "text_repetition" -> ((s, d) => {
      tbl(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.distinctTokenRatio(col("text")).as("distinct_ratio"),
        TextAnalysis.topTokenShare(col("text")).as("top_share"),
        TextAnalysis.meanTokenLength(col("text")).as("mean_tok_len"))
    }),

    // Distributed BPE merge learning: corpus -> word-frequency table
    // (one pass) -> 6 argmax-merge rounds over the vocab table. The
    // oracle replays the same rounds in SQL via the terminator-string
    // formulation (see operators.Bpe).
    "bpe_merges" -> ((s, d) => {
      graft.operators.Bpe.learnMerges(s,
        tbl(s, d, "documents").select(col("text")), "text", nMerges = BpeRounds)
    }),

    // BPE ENCODE with the learned merges: vocab words (encode each
    // distinct word once — the tokenize-once scale shape) fold through
    // the 6 merges as literal sentinel-delimited replaces, a map-side
    // projection. The 6-row merge table is the only driver collect.
    "bpe_encode" -> ((s, d) => {
      val docs = tbl(s, d, "documents").select(col("text"))
      val merges = graft.operators.Bpe.learnMerges(s, docs, "text",
          nMerges = BpeRounds)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val vocab = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "").distinct()
      graft.operators.Bpe.encode(vocab, "w", merges)
        .select(col("word"), array_join(col("symbols"), " ").as("pieces"))
    }),

    // Unsupervised LM quality signal (CCNet-style): train an add-k
    // smoothed bigram model on the corpus in one partial-agg pass,
    // score each doc's average negative log2 probability under it.
    "lm_perplexity" -> ((s, d) => {
      graft.operators.LangModel.selfScore(
        tbl(s, d, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round4(col("avg_nll")).as("avg_nll"))
    }),

    // Context-window chunking: 128-char windows, stride 96 (32-char
    // overlap) — the corpus -> training-sample / RAG-chunk carve,
    // map-side only.
    "chunk_docs" -> ((s, d) => {
      graft.operators.Chunking.fixedWindows(
        tbl(s, d, "documents"), "doc_id", "text", size = 128, stride = 96)
    }),

    // Collocation mining: top-50 bigrams by PMI (min count 5) — the
    // phrase-detection pass of tokenizer-vocab construction.
    "ngram_pmi" -> ((s, d) => {
      graft.operators.Collocations.bigramPmi(
        tbl(s, d, "documents"), "text", minCount = 5L, k = 50)
    }),

    // Inverted-index build: term -> "doc:tf" posting list, df-banded
    // (df >= 3, df <= 79% of docs) to drop the hapax tail and
    // stop-word lists at any corpus scale.
    "invert_index" -> ((s, d) => {
      graft.operators.TfIdf.invertedIndex(
        tbl(s, d, "documents"), "doc_id", "text",
        minDf = 3L, maxDfFrac = 0.79)
    }),

    // DSIR importance weights (Xie et al. 2023): avg log2 unigram-LM
    // likelihood-ratio of the English target domain vs the raw corpus
    // per doc — the tilt-toward-trusted-data selection signal.
    "dsir_weights" -> ((s, d) => {
      graft.operators.LangModel.dsirWeights(
        tbl(s, d, "documents").select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "text", col("lang") === "en")
        .select(col("doc_id"), col("n_tokens"),
          round4(col("avg_lr")).as("avg_lr"))
    }),

    // Token-budget curation: greedily keep the best-quality docs until
    // 25% of the corpus's tokens are spent. Hierarchical cumsum — see
    // Sampling.tokenBudgetSelect for why this never runs a global
    // row-level window.
    "select_token_budget" -> ((s, d) => {
      val scored = tbl(s, d, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
      graft.operators.Sampling.tokenBudgetSelect(
        scored, "doc_id", "quality", "tokens", frac = 0.25)
    }),

    // Tokenizer-fertility profile per language: BPE-ish pieces and
    // characters per whitespace word — the "how expensive is this
    // language under the tokenizer" planning table. One partial agg.
    "token_fertility" -> ((s, d) => {
      tbl(s, d, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws"),
          size(TextAnalysis.bpeishTokens(col("text"))).cast("long").as("bpe"),
          length(col("text")).cast("long").as("chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).as("n_ws"),
          sum(col("bpe")).as("n_bpe"),
          sum(col("chars")).as("n_chars"),
          round4(sum(col("bpe")).cast("double") /
            sum(col("ws")).cast("double")).as("bpe_per_ws"),
          round4(sum(col("chars")).cast("double") /
            sum(col("ws")).cast("double")).as("chars_per_ws"))
    }),

    // Tokenizer-coverage audit: per-doc OOV rate against the corpus
    // frequency vocabulary (count >= 5, the vocab_topk band without
    // the top-k cap). The vocab is vocabulary-sized -> shuffle-hash
    // join, same pin as tfidf/lm/dsir.
    "vocab_oov" -> ((s, d) => {
      val tok = tbl(s, d, "documents")
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .localCheckpoint() // feeds the vocab count AND the coverage join
      val voc = tok.groupBy(col("w")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= 5)
        .select(col("w"), lit(true).as("__in"))
      tok.join(voc.hint("shuffle_hash"), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round4(avg(when(col("__in").isNull, 1.0).otherwise(0.0)))
            .as("oov_rate"))
    }),

    // N-gram novelty: fraction of each doc's distinct word trigrams
    // that occur in NO other doc — near-1 means genuinely new text,
    // near-0 means assembled from corpus-common phrasing. Same
    // vocabulary-join shape as PMI (trigram df can't broadcast).
    "novelty_ngram" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val tris = docs
        .withColumn("__toks", split(trim(lower(col("text"))), "\\s+"))
        .filter(size(col("__toks")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("__toks")) - 2),
          i => concat_ws(" ", element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1),
            element_at(col("__toks"), i + 2)))).as("tri"))
        .distinct()
        .localCheckpoint() // feeds the df agg AND the per-doc average
      val dfreq = tris.groupBy(col("tri"))
        .agg(count(lit(1)).as("__df"))
      tris.join(dfreq.hint("shuffle_hash"), Seq("tri"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tri"),
          round4(avg(when(col("__df") === 1, 1.0).otherwise(0.0)))
            .as("novelty"))
    }))

  private def listLit(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** stopword-ratio SQL for one marker set, over alias `toks`. */
  private def ratioSql(words: Seq[String]): String =
    s"len(list_filter(toks, t -> list_contains(${listLit(words)}, t)))::DOUBLE" +
      " / greatest(len(toks), 1)::DOUBLE"

  private val langCases: String = TextAnalysis.langMarkers.map { case (lang, _) =>
    s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
  }.mkString(" ")

  private val langScores: String = TextAnalysis.langMarkers.map { case (lang, ws) =>
    s"${ratioSql(ws)} AS s_$lang"
  }.mkString(", ")

  private val BpeRounds = 6

  /** DuckDB replay of the BPE rounds: same two-marker `•sym¶` symbol
    * encoding (start marker pins the match to a symbol start, the
    * terminator pins its end — see operators.Bpe), same
    * leftmost-non-overlapping `replace`, same (weight DESC, lhs, rhs)
    * argmax — generated per round so both engines run the identical
    * algorithm. */
  /** The shared learn-chain CTEs (w0 → t1..tN): word-freq table plus
    * one argmax-merge round per rank — the prefix of BOTH bpe oracles. */
  private val bpeCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
            SELECT substr(sy[i], 2) AS lhs, substr(sy[i + 1], 2) AS rhs,
              CAST(sum(freq) AS BIGINT) AS weight
            FROM (SELECT freq, string_split(s, '¶') AS sy,
                    unnest(generate_series(1, len(string_split(s, '¶')) - 2)) AS i
                  FROM w${r - 1})
            GROUP BY 1, 2),
          t$r AS (SELECT lhs, rhs, weight FROM p$r
                  ORDER BY weight DESC, lhs ASC, rhs ASC LIMIT 1),
          w$r AS (SELECT freq, replace(s, '•' || lhs || '¶•' || rhs || '¶',
                    '•' || lhs || rhs || '¶') AS s
                  FROM w${r - 1} CROSS JOIN t$r)"""
    }.mkString(",\n          ")
    s"""w0 AS (
          SELECT word, CAST(count(*) AS BIGINT) AS freq,
            regexp_replace(word, '(.)', '•\\1¶', 'g') AS s
          FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents)
          WHERE word <> '' GROUP BY word),
          $rounds"""
  }

  private val bpeOracle: String = {
    val unions = (1 to BpeRounds)
      .map(r => s"SELECT CAST($r AS INTEGER) AS rank, lhs, rhs, weight FROM t$r")
      .mkString(" UNION ALL ")
    s"""WITH $bpeCtes
        $unions"""
  }

  /** Encode oracle: the learned t1..tN merges fold over each vocab
    * word as nested replaces — identical non-overlapping left-to-right
    * semantics to the Spark fold because every symbol carries its own
    * •/¶ sentinels (a match consumes whole symbol spans, so no two
    * occurrences can share a boundary). */
  private val bpeEncodeOracle: String = {
    // Each scalar subquery is coalesce-guarded: on a degenerate corpus
    // with fewer than BpeRounds learnable merges, t$r is empty and an
    // unguarded replace(acc, NULL, NULL) would null every word —
    // '•¶' (an empty symbol) can never occur in s, so the guarded
    // round is a no-op, matching the Spark fold that simply has fewer
    // merges to apply.
    val folded = (1 to BpeRounds).foldLeft("s") { (acc, r) =>
      s"""replace($acc,
                  coalesce((SELECT '•' || lhs || '¶•' || rhs || '¶' FROM t$r), '•¶'),
                  coalesce((SELECT '•' || lhs || rhs || '¶' FROM t$r), ''))"""
    }
    s"""WITH $bpeCtes,
        enc AS (SELECT word, $folded AS es FROM w0)
        SELECT word,
          array_to_string(list_transform(
            list_filter(string_split(es, '¶'), x -> x <> ''),
            x -> substr(x, 2)), ' ') AS pieces
        FROM enc"""
  }

  val oracles: Map[String, String] = Map(
    "chunk_docs" ->
      """WITH starts AS (
           SELECT doc_id, text, unnest(range(0, length(text), 96)) AS s
           FROM documents WHERE length(text) > 0)
         SELECT doc_id, s // 96 AS chunk_idx, s AS chunk_start,
           substring(text, CAST(s + 1 AS INT), 128) AS chunk_text,
           length(substring(text, CAST(s + 1 AS INT), 128)) AS chunk_len
         FROM starts""",
    "ngram_pmi" ->
      """WITH tok AS (
           SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             t -> t <> '') AS w
           FROM documents),
         uni AS (SELECT t AS w, count(*) AS n_w
                 FROM (SELECT unnest(w) AS t FROM tok) GROUP BY 1),
         bi0 AS (SELECT w[i] AS w1, w[i + 1] AS w2
                 FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                       FROM tok)),
         bi AS (SELECT w1, w2, count(*) AS n_ab FROM bi0 GROUP BY 1, 2),
         tot AS (SELECT (SELECT sum(n_w)::DOUBLE FROM uni) AS n_uni,
                        (SELECT sum(n_ab)::DOUBLE FROM bi) AS n_bi),
         sc AS (SELECT b.w1, b.w2, b.n_ab, u1.n_w AS n_w1, u2.n_w AS n_w2
                FROM bi b JOIN uni u1 ON b.w1 = u1.w
                          JOIN uni u2 ON b.w2 = u2.w
                WHERE b.n_ab >= 5)
         SELECT w1, w2, n_ab,
           floor(ln((n_ab::DOUBLE * n_uni * n_uni) /
                    (n_bi * n_w1::DOUBLE * n_w2)) * 10000 + 0.5) / 10000 AS pmi
         FROM sc CROSS JOIN tot
         ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 50""",
    "invert_index" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           FROM documents),
         pd AS (SELECT term, doc_id AS doc, count(*) AS tf
                FROM tok WHERE term <> '' GROUP BY 1, 2)
         SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS corpus_tf,
           string_agg(doc::VARCHAR || ':' || tf::VARCHAR, ' ' ORDER BY doc)
             AS postings
         FROM pd GROUP BY term
         HAVING count(*) >= 3 AND count(*) <=
           (SELECT count(DISTINCT doc_id) FROM documents) * 0.79""",
    "bpe_merges" -> bpeOracle,
    "bpe_encode" -> bpeEncodeOracle,
    "lm_perplexity" ->
      """WITH tok AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
         ok AS (SELECT doc_id, w FROM tok WHERE len(w) >= 2),
         idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM ok),
         bg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM idx),
         cnt AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1 FROM cnt GROUP BY 1),
         voc AS (SELECT count(DISTINCT w2) AS v FROM bg)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(avg(-log2((n + 0.5) / (n_w1 + 0.5 * v))) * 10000 + 0.5) / 10000 AS avg_nll
         FROM bg JOIN cnt USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN voc
         GROUP BY doc_id""",
    "vocab_topk" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
           FROM documents),
         freq AS (
           SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok
           GROUP BY token HAVING count(*) >= 5
           ORDER BY freq DESC, token ASC LIMIT 50)
         SELECT row_number() OVER (ORDER BY freq DESC, token ASC) AS rank,
           token, freq
         FROM freq""",
    "pack_sequences" ->
      """WITH c AS (
           SELECT doc_id, lang,
             sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_chars AS cum_before
           FROM documents)
         SELECT doc_id, lang,
           CAST(floor(cum_before / 2048) AS BIGINT) AS bin,
           CAST(cum_before % 2048 AS BIGINT) AS bin_offset
         FROM c""",
    "pack_context_windows" ->
      """WITH t AS (
           SELECT doc_id,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok,
             md5(doc_id::VARCHAR) AS ord
           FROM documents),
         c AS (
           SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
           FROM t)
         SELECT doc_id, n_tok, (cum_tok - n_tok)::BIGINT AS tok_start,
           floor((cum_tok - n_tok)::DOUBLE / 256)::BIGINT AS win_start,
           floor((cum_tok - 1)::DOUBLE / 256)::BIGINT AS win_end
         FROM c""",
    "train_order" ->
      """WITH h AS (
           SELECT doc_id,
             (('0x' || substring(md5('s42:' || doc_id::VARCHAR), 1, 15))::BIGINT) AS hh
           FROM documents)
         SELECT doc_id, hh % 8 AS shard,
           row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS shard_pos
         FROM h""",
    "corpus_profile" ->
      """SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           CAST(min(len(text)) AS INTEGER) AS len_min,
           quantile_cont(len(text), 0.25) AS len_p25,
           quantile_cont(len(text), 0.5) AS len_p50,
           quantile_cont(len(text), 0.75) AS len_p75,
           CAST(max(len(text)) AS INTEGER) AS len_max,
           count(DISTINCT md5(text)) AS n_distinct,
           (count(*) - count(DISTINCT md5(text)))::DOUBLE / count(*) AS dup_rate
         FROM documents GROUP BY lang""",
    "grep_search" ->
      "SELECT doc_id FROM documents WHERE contains(text, 'the customer')",
    "grep_probe" ->
      "SELECT doc_id FROM documents WHERE contains(text, 'customer query')",
    "quality_repetition" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
           FROM documents),
         pw AS (
           SELECT doc_id, word, count(*)::BIGINT AS c
           FROM toks GROUP BY doc_id, word)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           count(*)::BIGINT AS n_distinct,
           floor(count(*)::DOUBLE / sum(c) * 10000 + 0.5) / 10000 AS ttr,
           floor(max(c)::DOUBLE / sum(c) * 10000 + 0.5) / 10000 AS top_share,
           floor(max(c)::DOUBLE / sum(c) * 10000 + 0.5) / 10000 > 0.1 AS repetitive
         FROM pw GROUP BY doc_id""",
    "shard_manifest" ->
      """SELECT ('0x' || substring(md5('s42:' || doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard,
           count(*) AS n_rows,
           sum(len(text))::BIGINT AS n_bytes,
           (sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 15))::BIGINT
               % 1000000000) % 1000000000)::BIGINT AS content_hash
         FROM documents GROUP BY 1""",
    "quality_gopher" ->
      """WITH t AS (
           SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         m AS (
           SELECT doc_id, text, toks, len(toks) AS n,
             list_sum(list_transform(toks, x -> len(x)))::DOUBLE
               / greatest(len(toks), 1) AS mean_len,
             (len(text) - len(replace(text, '#', '')))::DOUBLE AS n_hash,
             ((len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE AS n_ellipsis,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE AS n_alpha,
             len(list_intersect(list_distinct(toks),
               ['the', 'a', 'and', 'of', 'to', 'is'])) AS n_stops
           FROM t)
         SELECT doc_id,
           n >= 50 AND n <= 100000 AS word_count_ok,
           mean_len >= 3.0 AND mean_len <= 10.0 AS mean_word_len_ok,
           n_hash <= n * 0.1 AS hash_ratio_ok,
           n_ellipsis <= n * 0.1 AS ellipsis_ratio_ok,
           n_alpha >= n * 0.8 AS alpha_word_ratio_ok,
           n_stops >= 2 AS stop_word_ok,
           (n >= 50 AND n <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
             AND n_hash <= n * 0.1 AND n_ellipsis <= n * 0.1
             AND n_alpha >= n * 0.8 AND n_stops >= 2 AS keep
         FROM m""",
    "drift_report" ->
      """WITH b AS (
           SELECT n_chars // 64 AS bin, doc_id % 2 AS grp FROM documents),
         agg AS (
           SELECT bin,
             sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
             sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS n_cur
           FROM b GROUP BY bin),
         p AS (
           SELECT bin, n_ref, n_cur,
             n_ref::DOUBLE / sum(n_ref) OVER () AS p_ref,
             n_cur::DOUBLE / sum(n_cur) OVER () AS p_cur
           FROM agg)
         SELECT bin, n_ref, n_cur, p_ref, p_cur,
           abs(p_cur - p_ref) AS abs_diff,
           CASE WHEN p_ref > 0
             THEN (p_cur - p_ref) * (p_cur - p_ref) / p_ref END AS chi2_term
         FROM p""",
    "text_tokens" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_ws,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe,
           len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
         FROM documents""",
    "text_quality" ->
      s"""SELECT doc_id,
            (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END
           + CASE WHEN pc / greatest(chars, 1) <= 0.2 THEN 1.0 ELSE 0.0 END
           + CASE WHEN sw >= 0.01 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
          FROM (SELECT doc_id,
              len(toks)::DOUBLE AS n,
              len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE AS pc,
              length(text)::DOUBLE AS chars,
              ${ratioSql(TextAnalysis.langMarkers.toMap.apply("en"))} AS sw
            FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents))""",
    "text_langid" ->
      s"""SELECT doc_id, CASE $langCases ELSE 'und' END AS lang_pred
          FROM (SELECT doc_id, ${TextAnalysis.langMarkers.map("s_" + _._1).mkString(", ")},
              greatest(${TextAnalysis.langMarkers.map("s_" + _._1).mkString(", ")}) AS best
            FROM (SELECT doc_id, $langScores
              FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)))""",
    "tfidf_topk" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, term,
             floor(tf * (ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) + 1) * 10000 + 0.5) / 10000 AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         SELECT doc_id, rank, term, score FROM (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
           FROM scored)
         WHERE rank <= 3""",
    "text_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
         FROM documents""",
    "text_repetition" ->
      """SELECT doc_id,
           len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1)::DOUBLE AS distinct_ratio,
           list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t))))::DOUBLE
             / greatest(len(toks), 1)::DOUBLE AS top_share,
           list_sum(list_transform(toks, t -> length(t)))::DOUBLE
             / greatest(len(toks), 1)::DOUBLE AS mean_tok_len
         FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)""",
    "dsir_weights" ->
      """WITH tok AS (
           SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           FROM documents),
         raw AS (SELECT w, count(*)::BIGINT AS nr FROM tok GROUP BY w),
         tgt AS (SELECT w, count(*)::BIGINT AS nt FROM tok WHERE lang = 'en' GROUP BY w),
         tot AS (SELECT sum(nr)::DOUBLE AS n_raw, count(*)::DOUBLE AS v FROM raw),
         ttot AS (SELECT coalesce(sum(nt)::DOUBLE, 0.0) AS n_tgt FROM tgt),
         sc AS (SELECT doc_id,
             log2((coalesce(nt, 0) + 0.5) / (n_tgt + 0.5 * v))
           - log2((nr + 0.5) / (n_raw + 0.5 * v)) AS lr
           FROM tok JOIN raw USING (w) LEFT JOIN tgt USING (w)
           CROSS JOIN tot CROSS JOIN ttot)
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
           floor(avg(lr) * 10000 + 0.5) / 10000 AS avg_lr
         FROM sc GROUP BY doc_id""",
    "select_token_budget" ->
      s"""WITH base AS (
            SELECT doc_id,
              (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END
             + CASE WHEN pc / greatest(chars, 1) <= 0.2 THEN 1.0 ELSE 0.0 END
             + CASE WHEN sw >= 0.01 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality,
              CAST(nt AS BIGINT) AS tokens,
              ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS jit
            FROM (SELECT doc_id, len(toks) AS nt,
                len(toks)::DOUBLE AS n,
                len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE AS pc,
                length(text)::DOUBLE AS chars,
                ${ratioSql(TextAnalysis.langMarkers.toMap.apply("en"))} AS sw
              FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
                    FROM documents))),
          tot AS (SELECT CAST(floor(sum(tokens) * 0.25) AS BIGINT) AS budget FROM base),
          c AS (SELECT doc_id, quality, tokens,
              CAST(sum(tokens) OVER (ORDER BY quality DESC, jit, doc_id) AS BIGINT)
                AS cum_tokens
            FROM base)
          SELECT doc_id, quality, tokens, cum_tokens
          FROM c CROSS JOIN tot WHERE cum_tokens <= budget""",
    "token_fertility" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
           CAST(sum(ws) AS BIGINT) AS n_ws,
           CAST(sum(bpe) AS BIGINT) AS n_bpe,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           floor(sum(bpe)::DOUBLE / sum(ws)::DOUBLE * 10000 + 0.5) / 10000 AS bpe_per_ws,
           floor(sum(chars)::DOUBLE / sum(ws)::DOUBLE * 10000 + 0.5) / 10000 AS chars_per_ws
         FROM (SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS ws,
             len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe,
             length(text) AS chars
           FROM documents)
         GROUP BY lang""",
    "vocab_oov" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
           FROM documents),
         voc AS (SELECT w FROM tok GROUP BY w HAVING count(*) >= 5)
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
           floor(avg(CASE WHEN v.w IS NULL THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) / 10000
             AS oov_rate
         FROM tok LEFT JOIN voc v ON tok.w = v.w
         GROUP BY doc_id""",
    "novelty_ngram" ->
      """WITH tok AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
           FROM documents),
         ok AS (SELECT doc_id, w FROM tok WHERE len(w) >= 3),
         idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM ok),
         tr AS (SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri FROM idx),
         dfreq AS (SELECT tri, count(*)::BIGINT AS df FROM tr GROUP BY tri)
         SELECT doc_id, count(*)::BIGINT AS n_tri,
           floor(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) / 10000
             AS novelty
         FROM tr JOIN dfreq USING (tri)
         GROUP BY doc_id""")
}
