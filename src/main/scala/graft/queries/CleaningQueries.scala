package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Dedup, Similarity}

/** Corpus-hygiene queries over `documents`: eval-set decontamination
  * (word-n-gram collision against the held-out benchmark split) and
  * boilerplate-line removal (global frequent-line filter). The fixture
  * corpus has no newlines, so the boilerplate query runs at word
  * granularity (sep = " ") — the plan is identical to newline-separated
  * lines; CleaningSpec covers the multi-line case on a constructed
  * fixture.
  */
object CleaningQueries {

  private val GramN = 8
  // Held-out "benchmark" split: every 10th doc plays the eval suite.
  private val EvalMod = 10
  private val BoilerplateFrac = 0.8
  // corpus_pipeline quality-head parameters (mirror ml_quality_filter).
  private val PipeBuckets = 1 << 20
  private val PipeScale = 8.0
  private val PipeBias = 0.0
  private val PipeKeep = 0.45
  // Embedding-level decontamination: same cosine bar as the embed
  // near-dup dedup family (a paraphrase that would be deduped within
  // train is equally a leak when it straddles the eval split).
  private val EmbedCos = 0.45
  private val EmbedDim = 64
  // curation_decisions rule thresholds
  private val CurMinChars = 60
  private val CurMaxChars = 520
  private val CurTopShare = 0.1

  val queries: Map[String, QueryFn] = Map(
    // Train docs sharing >= 1 word 8-gram with the eval split — the
    // planted near-duplicates surface here (contamination screen).
    "decontaminate" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      Cleaning.contamination(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "doc_id", "text", n = GramN)
    }),

    // Same screen through the Bloom scale path (sketch-prefiltered
    // exact join instead of broadcast) — identical output by
    // construction, so it shares decontaminate's oracle.
    "decontaminate_bloom" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      Cleaning.contaminationBloom(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "doc_id", "text", n = GramN)
    }),

    // Span-level audit of the same screen: WHERE each contaminated
    // window sits (1-based inclusive token coords), for surgical
    // removal instead of whole-document drops.
    "decontaminate_spans" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      Cleaning.contaminationSpans(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "doc_id", "text", n = GramN)
    }),

    // The cut applied: contaminated windows excised token-wise, the
    // rest of each document reassembled (single-space normalized).
    "decontaminate_cut" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val train = docs.filter(col("doc_id") % EvalMod =!= 0)
      val spans = Cleaning.contaminationSpans(train,
        docs.filter(col("doc_id") % EvalMod === 0), "doc_id", "text", n = GramN)
      Cleaning.cutSpans(train, spans, "doc_id", "text")
    }),

    // Drop tokens present in >= 80% of all docs, reassemble in order.
    "strip_boilerplate" -> ((s, d) => {
      Cleaning.stripBoilerplate(tbl(s, d, "documents"), "doc_id", "text",
        sep = " ", minDocFrac = BoilerplateFrac)
    }),

    // PII scrub: the synthetic corpus carries no PII, so a deterministic
    // contact line is planted on every 3rd doc (mirrored verbatim by the
    // oracle) and then redacted — counts from the original, text after
    // the replace chain. The operator itself is generic.
    "clean_pii" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val aug = when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit(" contact doc"), col("doc_id").cast("string"),
          lit("@example.com at 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7 tel 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")))
        .otherwise(col("text"))
      val counts = Cleaning.piiCounts(aug).map { case (n, c) => c.as(n) }
      docs.select(Seq(col("doc_id")) ++ counts :+
        Cleaning.redactPii(aug).as("text_redacted"): _*)
    }),

    // Corpus length-outlier band: keep docs inside the [2, 98] size
    // percentile band, thresholds from the broadcast size histogram.
    "filter_length_band" -> ((s, d) => {
      Cleaning.lengthBandFilter(
        tbl(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", loPct = 2, hiPct = 98)
    }),

    // Canonical normalization. The fixture corpus is already clean, so
    // every 4th doc gets a deterministic mess planted (tabs + doubled
    // spaces + a control char) that the pass must undo.
    "clean_normalize" -> ((s, d) => {
      val aug = when(col("doc_id") % 4 === 0,
        concat(lit("\t "), replace(col("text"), lit(" the "),
          lit("  the  ")), lit("  ")))
        .otherwise(col("text"))
      tbl(s, d, "documents").select(col("doc_id"),
        Cleaning.normalizeText(aug).as("text_norm"))
    }),

    // Intra-doc span dedup at word granularity (the corpus has no
    // newlines; CleaningSpec covers multi-line separators).
    "clean_intradoc_dedup" -> ((s, d) => {
      Cleaning.dedupLines(tbl(s, d, "documents"), "doc_id", "text",
        sep = " ")
    }),

    // End-to-end corpus pipeline — the independently-verified stages
    // COMPOSED: normalize -> length-band filter -> exact dedup ->
    // learned quality filter. Each stage's plan shape is unchanged by
    // composition (normalize/score stay map-side; band bounds and the
    // dedup window are the only wide ops), so this is the library's
    // "switch your prep job to one query" surface.
    "corpus_pipeline" -> ((s, d) => {
      // NOTE: deliberately NOT tblSpread — the pipeline's first wide op
      // (the dedup window) reshuffles anyway, so a scan rebalance here
      // just adds an exchange (measured +0.8 s at sf0.1).
      val normed = tbl(s, d, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"),
        Cleaning.normalizeText(col("text")).as("text_norm"))
      val banded = Cleaning.lengthBandFilter(normed, "n_chars", 2, 98)
      val deduped = graft.operators.Dedup.exact(banded, "text_norm", "doc_id")
      deduped.select(col("doc_id"), col("lang"),
        round4(graft.operators.ModelScoring.hashedTextScore(
          col("text_norm"), PipeBuckets, PipeScale, PipeBias)).as("score"))
        .filter(col("score") >= PipeKeep)
    }),

    // Semantic decontamination: train vectors within cosine 0.45 of ANY
    // eval vector (paraphrased leakage the n-gram screen misses). The
    // eval split is broadcast; train streams through one map-side pass
    // (Similarity.broadcastCosineScreen).
    "decontaminate_embed" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      Similarity.broadcastCosineScreen(
        e.filter(col("vec_id") % EvalMod =!= 0),
        e.filter(col("vec_id") % EvalMod === 0),
        "vec_id", "embedding", EmbedCos)
        .select(col("vec_id"),
          round4(col("max_eval_cos")).as("max_eval_cos"), col("n_hits"))
    }),

    // Explainable curation: every train doc with per-rule verdicts,
    // the decisive rule, and the final keep flag — exact-dup loser,
    // eval contamination, top-word repetition, then length bounds.
    "curation_decisions" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val train = docs.filter(col("doc_id") % EvalMod =!= 0)
      val dupLosers = train.join(
        Dedup.exact(train, "text", "doc_id").select("doc_id"),
        Seq("doc_id"), "left_anti").select("doc_id")
      val contaminated = Cleaning.contamination(train,
        docs.filter(col("doc_id") % EvalMod === 0), "doc_id", "text", GramN)
        .select("doc_id")
      val repetitive = tblSpread(s, d, "documents")
        .filter(col("doc_id") % EvalMod =!= 0)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg((max(col("c")).cast("double") / sum(col("c"))).as("__ts"))
        .filter(col("__ts") > CurTopShare).select("doc_id")
      Cleaning.curationDecisions(train, "doc_id",
        Seq("exact_dup" -> dupLosers, "contaminated" -> contaminated,
          "repetitive" -> repetitive),
        Seq("too_short" -> (col("n_chars") < CurMinChars),
          "too_long" -> (col("n_chars") > CurMaxChars)))
    }))

  private val gramsSql =
    s"list_distinct(list_transform(generate_series(1, greatest(len(w) - ${GramN - 1}, 1)), " +
      s"i -> array_to_string(w[i:i + ${GramN - 1}], ' ')))"

  val oracles: Map[String, String] = Map(
    "decontaminate" ->
      s"""WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
          g AS (SELECT doc_id, $gramsSql AS grams FROM tok),
          ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0),
          tr AS (SELECT doc_id, len(grams) AS total, unnest(grams) AS gram
                 FROM g WHERE doc_id % $EvalMod <> 0)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
            floor(count(*)::DOUBLE / total * 10000 + 0.5) / 10000 AS contamination
          FROM tr JOIN ev USING (gram)
          GROUP BY doc_id, total""",
    "decontaminate_spans" ->
      s"""WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
          g AS (SELECT doc_id,
                  list_transform(generate_series(1, greatest(len(w) - ${GramN - 1}, 1)),
                    i -> array_to_string(w[i:i + ${GramN - 1}], ' ')) AS grams
                FROM tok),
          ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0),
          tr AS (SELECT doc_id, unnest(grams) AS gram,
                   unnest(generate_series(1, len(grams))) AS p
                 FROM g WHERE doc_id % $EvalMod <> 0)
          SELECT doc_id, CAST(p AS BIGINT) AS tok_start,
            CAST(p + ${GramN - 1} AS BIGINT) AS tok_end, gram
          FROM tr JOIN ev USING (gram)""",
    "decontaminate_cut" ->
      s"""WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
          g AS (SELECT doc_id,
                  list_transform(generate_series(1, greatest(len(w) - ${GramN - 1}, 1)),
                    i -> array_to_string(w[i:i + ${GramN - 1}], ' ')) AS grams
                FROM tok),
          ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0),
          spans AS (
            SELECT tr.doc_id, tr.p AS tok_start, tr.p + ${GramN - 1} AS tok_end
            FROM (SELECT doc_id, unnest(grams) AS gram,
                    unnest(generate_series(1, len(grams))) AS p
                  FROM g WHERE doc_id % $EvalMod <> 0) tr
            JOIN ev USING (gram)),
          pos AS (
            SELECT doc_id, unnest(w) AS word,
              unnest(generate_series(1, len(w))) AS p
            FROM tok WHERE doc_id % $EvalMod <> 0),
          kept AS (
            SELECT p.doc_id, p.word, p.p FROM pos p
            WHERE NOT EXISTS (
              SELECT 1 FROM spans s
              WHERE s.doc_id = p.doc_id AND p.p BETWEEN s.tok_start AND s.tok_end)),
          agg AS (
            SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS text_clean,
              count(*)::BIGINT AS n_kept
            FROM kept GROUP BY doc_id)
          SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
            CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
          FROM tok t LEFT JOIN agg a USING (doc_id)
          WHERE t.doc_id % $EvalMod <> 0""",
    "curation_decisions" ->
      s"""WITH train AS (
            SELECT doc_id, text, n_chars FROM documents WHERE doc_id % $EvalMod <> 0),
          keepers AS (SELECT doc_id FROM (
              SELECT doc_id,
                row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM train) WHERE rn = 1),
          tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
          g AS (SELECT doc_id, $gramsSql AS grams FROM tok),
          ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                 WHERE doc_id % $EvalMod = 0),
          cont AS (SELECT DISTINCT doc_id FROM (
              SELECT doc_id, unnest(grams) AS gram FROM g
              WHERE doc_id % $EvalMod <> 0) tr JOIN ev USING (gram)),
          lt AS (SELECT doc_id,
              unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM train),
          pw AS (SELECT doc_id, word, count(*) AS c FROM lt GROUP BY 1, 2),
          repn AS (SELECT doc_id FROM (
              SELECT doc_id, max(c)::DOUBLE / sum(c) AS ts FROM pw GROUP BY doc_id)
            WHERE ts > $CurTopShare),
          flags AS (SELECT t.doc_id,
              t.doc_id NOT IN (SELECT doc_id FROM keepers) AS fail_exact_dup,
              t.doc_id IN (SELECT doc_id FROM cont) AS fail_contaminated,
              t.doc_id IN (SELECT doc_id FROM repn) AS fail_repetitive,
              t.n_chars < $CurMinChars AS fail_too_short,
              t.n_chars > $CurMaxChars AS fail_too_long
            FROM train t)
          SELECT doc_id, fail_exact_dup, fail_contaminated, fail_repetitive,
            fail_too_short, fail_too_long,
            CASE WHEN fail_exact_dup THEN 'exact_dup'
                 WHEN fail_contaminated THEN 'contaminated'
                 WHEN fail_repetitive THEN 'repetitive'
                 WHEN fail_too_short THEN 'too_short'
                 WHEN fail_too_long THEN 'too_long'
                 ELSE 'kept' END AS reason,
            NOT (fail_exact_dup OR fail_contaminated OR fail_repetitive
                 OR fail_too_short OR fail_too_long) AS kept
          FROM flags""",
    "decontaminate_embed" -> {
      def dotSql(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, $EmbedDim), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
      def cosSql(a: String, b: String) =
        s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
      s"""WITH ev AS (
            SELECT embedding AS e FROM embeddings WHERE vec_id % $EvalMod = 0),
          tr AS (
            SELECT vec_id, embedding AS t FROM embeddings WHERE vec_id % $EvalMod <> 0),
          p AS (
            SELECT vec_id, ${cosSql("t", "e")} AS c FROM tr CROSS JOIN ev)
          SELECT vec_id, floor(max(c) * 10000 + 0.5) / 10000 AS max_eval_cos,
            CAST(count(*) AS BIGINT) AS n_hits
          FROM p WHERE c >= $EmbedCos
          GROUP BY vec_id"""
    },
    // Bloom pre-screen changes the plan, not the result set.
    "decontaminate_bloom" ->
      s"""WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
          g AS (SELECT doc_id, $gramsSql AS grams FROM tok),
          ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0),
          tr AS (SELECT doc_id, len(grams) AS total, unnest(grams) AS gram
                 FROM g WHERE doc_id % $EvalMod <> 0)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
            floor(count(*)::DOUBLE / total * 10000 + 0.5) / 10000 AS contamination
          FROM tr JOIN ev USING (gram)
          GROUP BY doc_id, total""",
    "strip_boilerplate" ->
      s"""WITH lines AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS line,
              unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
            FROM documents),
          freq AS (SELECT line, count(DISTINCT doc_id) AS doc_freq FROM lines GROUP BY line),
          n AS (SELECT count(*) AS n_docs FROM documents),
          bp AS (SELECT line FROM freq CROSS JOIN n
                 WHERE doc_freq >= n_docs * $BoilerplateFrac)
          SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text_clean
          FROM lines ANTI JOIN bp USING (line)
          GROUP BY doc_id""",
    "clean_pii" -> {
      val Seq((_, email, emailR), (_, ip, ipR), (_, phone, phoneR)) =
        Cleaning.PiiPatterns
      s"""WITH aug AS (
            SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN
                text || ' contact doc' || doc_id || '@example.com at 10.0.'
                  || (doc_id % 256) || '.7 tel 555-01'
                  || lpad((doc_id % 100)::VARCHAR, 2, '0')
              ELSE text END AS t
            FROM documents)
          SELECT doc_id,
            len(regexp_extract_all(t, '$email')) AS n_email,
            len(regexp_extract_all(t, '$ip')) AS n_ip,
            len(regexp_extract_all(t, '$phone')) AS n_phone,
            regexp_replace(regexp_replace(regexp_replace(t,
              '$email', '$emailR', 'g'), '$ip', '$ipR', 'g'),
              '$phone', '$phoneR', 'g') AS text_redacted
          FROM aug"""
    },
    "clean_normalize" ->
      """WITH aug AS (
           SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
               THEN chr(9) || ' ' || replace(text, ' the ', '  the  ') || '  '
               ELSE text END AS t
           FROM documents)
         SELECT doc_id,
           trim(regexp_replace(regexp_replace(t, '[\x00-\x1F\x7F]', ' ', 'g'),
             '\s+', ' ', 'g')) AS text_norm
         FROM aug""",
    "clean_intradoc_dedup" ->
      """WITH lines AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS line,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
           FROM documents),
         fst AS (
           SELECT doc_id, line, pos,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
           FROM lines)
         SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text_dedup
         FROM fst WHERE rn = 1 GROUP BY doc_id""",
    "corpus_pipeline" ->
      s"""WITH norm AS (
            SELECT doc_id, lang, n_chars,
              trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F\\x7F]', ' ', 'g'),
                '\\s+', ' ', 'g')) AS t
            FROM documents),
          nn AS (SELECT count(*) AS n FROM norm),
          h AS (SELECT n_chars, count(*) AS c FROM norm GROUP BY n_chars),
          cum AS (SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum FROM h),
          b AS (SELECT min(CASE WHEN cum > floor(n * 2 / 100) THEN n_chars END) AS lo,
                       min(CASE WHEN cum >= ceil(n * 98 / 100) THEN n_chars END) AS hi
                FROM cum CROSS JOIN nn),
          banded AS (
            SELECT norm.* FROM norm CROSS JOIN b
            WHERE n_chars >= lo AND n_chars <= hi),
          dedup AS (
            SELECT doc_id, lang, t FROM (
              SELECT doc_id, lang, t,
                row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
              FROM banded) WHERE rn = 1),
          tokd AS (
            SELECT doc_id, lang,
              string_split_regex(trim(lower(t)), '\\s+') AS tok
            FROM dedup),
          f AS (
            SELECT doc_id, lang,
              list_concat(tok,
                list_transform(generate_series(1, len(tok) - 1),
                  i -> tok[i] || '_' || tok[i + 1])) AS feats
            FROM tokd),
          scored AS (
            SELECT doc_id, lang,
              floor((1.0 / (1.0 + exp(-(
                list_sum(list_transform(feats, g ->
                  ((('0x' || substring(md5(g), 1, 15))::BIGINT % $PipeBuckets)
                    * 2654435761 % 1009)::DOUBLE / 1009.0 - 0.5))
                / len(feats) * $PipeScale + $PipeBias)))) * 10000 + 0.5) / 10000 AS score
            FROM f)
          SELECT doc_id, lang, score FROM scored WHERE score >= $PipeKeep""",
    "filter_length_band" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
          h AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars),
          cum AS (SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum FROM h),
          b AS (SELECT min(CASE WHEN cum > floor(n * 2 / 100) THEN n_chars END) AS lo,
                       min(CASE WHEN cum >= ceil(n * 98 / 100) THEN n_chars END) AS hi
                FROM cum CROSS JOIN nn)
          SELECT doc_id, n_chars FROM documents CROSS JOIN b
          WHERE n_chars >= lo AND n_chars <= hi""")
}
