package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for LLM training-data pipelines:
  * eval-set decontamination (word-n-gram collision against a benchmark
  * suite, the GPT-3/PaLM data-prep step) and global boilerplate-line
  * removal (the C4/CCNet frequent-line filter).
  *
  * Scale design:
  *  - the eval/benchmark gram set is tiny relative to the corpus, so it
  *    is broadcast — the 100 TB training side never shuffles on grams,
  *    only on (doc, partial-count) with map-side partial agg;
  *  - line frequencies are one partial-agg groupBy over exploded lines;
  *    the resulting boilerplate set is vocabulary-sized and broadcast
  *    back for an anti join, so document reassembly is the only wide
  *    exchange that carries full text.
  */
object Cleaning {

  /** Distinct word n-grams over an already-materialized token column
    * (whitespace tokens, space-joined, clamped like a
    * `tokens[i : i+n-1]` slice when the doc is short). The lambda
    * captures `toks`, so the CALLER must pass a plain column reference,
    * not a computed expression — a captured computation re-evaluates
    * per gram (HOF lambdas get no subexpression elimination), which
    * turns the gram pass quadratic. See `contamination` for the
    * two-step projection that keeps the split per-row. */
  def wordGramsOf(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** `wordGramsOf` over raw text — only for one-shot/small inputs; hot
    * paths materialize the token split first. */
  def wordGrams(text: Column, n: Int): Column =
    wordGramsOf(split(trim(text), "\\s+"), n)

  /** Training documents that collide with the eval set on at least
    * `minHits` distinct word n-grams — the standard contamination
    * screen run before training so benchmark answers don't leak into
    * the corpus. Returns (id, hits, contamination) where contamination
    * = hits / total distinct grams of the doc, rounded to 4 places. */
  def contamination(train: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int, minHits: Long = 1L): DataFrame = {
    // explode_outer, not explode: the optimizer infers a `size(grams)>0`
    // filter under a plain explode, which re-evaluates the whole gram
    // expression a second time per row on the big side. Outer explode
    // skips that; the inner join below discards null rows identically
    // (grams are non-empty by construction anyway).
    // Materialize the token split in its own projection so the gram
    // lambda captures an attribute, not the split expression (Catalyst
    // keeps the projection split because the reference is non-cheap and
    // used more than once) — measured 1.37 s -> 0.89 s at sf0.1.
    val evalGrams = evalSet
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(explode_outer(wordGramsOf(col("__toks"), n)).as("gram")).distinct()
    val exploded = Dedup.spread(train)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), wordGramsOf(col("__toks"), n).as("grams"))
      .select(col(idCol), size(col("grams")).as("total"),
        explode_outer(col("grams")).as("gram"))
    exploded.join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col(idCol), col("total"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
      .select(col(idCol), col("hits"),
        (floor(col("hits") / col("total") * 10000 + lit(0.5)) / 10000)
          .as("contamination"))
  }

  /** Span-level contamination audit — the removal/review artifact
    * behind [[contamination]]'s doc-level counts: every (train doc,
    * token window) whose word n-gram appears in the eval set, as
    * 1-based inclusive token coordinates plus the matched gram. A
    * pipeline that SURGICALLY cuts contaminated windows (rather than
    * dropping whole documents) consumes exactly this frame.
    *
    * Same scale shape as the count form — eval grams broadcast (or see
    * [[contaminationBloom]] for the sketch screen), the corpus side is
    * one posexplode with no distinct (positions must survive), and the
    * join output is hit-sized. */
  def contaminationSpans(train: DataFrame, evalSet: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    val evalGrams = evalSet
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(explode_outer(wordGramsOf(col("__toks"), n)).as("gram")).distinct()
    val positioned = Dedup.spread(train)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), posexplode_outer(transform(
        sequence(lit(1), greatest(size(col("__toks")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))
        .as(Seq("__p", "gram")))
    positioned.join(broadcast(evalGrams), Seq("gram"))
      .select(col(idCol), (col("__p") + 1).cast("long").as("tok_start"),
        (col("__p") + n).cast("long").as("tok_end"), col("gram"))
  }

  /** Apply a [[contaminationSpans]] frame: cut every covered token
    * window out of the text and reassemble — surgical decontamination,
    * keeping the rest of a document a whole-doc drop would lose.
    *
    * Scale shape: the span frame aggregates to one row per CONTAMINATED
    * doc (hit-sized, usually a sliver of the corpus), left-joins back,
    * and the cut itself is a map-side higher-order `filter` over the
    * token array — coverage is tested per token with `exists`, so
    * overlapping spans need no merging and the span list's collect
    * order is irrelevant. Untouched docs pass through the left join
    * with their token stream intact. */
  def cutSpans(docs: DataFrame, spans: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val ranges = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("tok_start"), col("tok_end"))).as("__spans"))
    docs.join(ranges, Seq(idCol), "left")
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks")).otherwise(
          filter(col("__toks"), (_, i) => !exists(col("__spans"),
            s => i + 1 >= s("tok_start") && i + 1 <= s("tok_end")))))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as("text_clean"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** [[contamination]]'s scale path for when the eval-gram set outgrows
    * a broadcast hash table (a full benchmark suite at 8-grams runs to
    * billions of grams — far past `autoBroadcastJoinThreshold`, but a
    * few hundred MB as a Bloom sketch). Two-phase screen:
    *
    *  1. fold the eval grams into ONE serialized Bloom filter with an
    *     in-plan distributed aggregate (map-side partial sketches, one
    *     tiny merge; `numBits` caps the size on the driver at
    *     `numBits/8` bytes regardless of cardinality);
    *  2. probe every corpus gram against it map-side — a codegen'd bit
    *     test, no exchange — so only the ~hits (plus the fpp share of
    *     false positives) ever reach the exact gram join, which now
    *     shuffles a hit-sized frame instead of the whole corpus'
    *     grams. No broadcast hint on that join: its probe side is
    *     post-screen tiny, and AQE is free to pick broadcast at
    *     runtime from REAL sizes.
    *
    * Bloom filters have no false negatives and the exact join clears
    * the false positives, so output ≡ [[contamination]] for any
    * sizing; `numBits` only tunes how much of the corpus the screen
    * discards early. The collected sketch ships as a task-broadcast
    * literal (the same shape Spark's own runtime-filter injection
    * uses); at production scale pick `numBits` for ~1% fpp ≈
    * 10 bits/gram. */
  def contaminationBloom(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         minHits: Long = 1L,
                         expectedGrams: Long = 1L << 20,
                         numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.graftx.BloomScreen
    val evalGrams = evalSet
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(explode_outer(wordGramsOf(col("__toks"), n)).as("gram")).distinct()
    // Built under raised runtime-filter caps scoped to this one action:
    // BloomFilterAggregate silently Math.min's its sizing against
    // session caps defaulting to 4M items / 2^26 bits — the defaults
    // above fit, but the production sizing this doc recommends
    // (10 bits/gram at 10⁹+ eval grams) would be clamped to a ~100%-fp
    // pass-through with no error, and the screen would silently stop
    // screening (output still exact; the whole corpus gram stream
    // would just reach the join again).
    val bloomRow = org.apache.spark.sql.graftx.SessionScope.headUnderConf(
      evalGrams
        .agg(BloomScreen.bloomAgg(col("gram"), expectedGrams, numBits)
          .as("bf")),
      Map("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" ->
        math.max(expectedGrams, 1L).toString,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
          math.max(numBits, 1L).toString))
    val exploded = Dedup.spread(train)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), wordGramsOf(col("__toks"), n).as("grams"))
      .select(col(idCol), size(col("grams")).as("total"),
        explode_outer(col("grams")).as("gram"))
    if (bloomRow.isNullAt(0))
      // Empty eval set: no gram can collide. Keep the output schema.
      return exploded.limit(0)
        .select(col(idCol), lit(0L).as("hits"), lit(0.0).as("contamination"))
    val screened = exploded.filter(
      BloomScreen.mightContain(bloomRow.getAs[Array[Byte]](0), col("gram")))
    // Both sides can be big at scale (eval grams past broadcast size is
    // this path's premise; the screened side carries the fpp share of
    // the corpus), so hint shuffle-hash like TfIdf's idf join — the
    // planner must not "helpfully" broadcast either from tiny-SF stats.
    screened.join(evalGrams.hint("shuffle_hash"), Seq("gram"))
      .groupBy(col(idCol), col("total"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
      .select(col(idCol), col("hits"),
        (floor(col("hits") / col("total") * 10000 + lit(0.5)) / 10000)
          .as("contamination"))
  }

  /** Remove every line (segment of `textCol` split on the literal
    * `sep`) that occurs in at least `minDocFrac` of all documents —
    * headers, navigation chrome, license banners. Documents are
    * reassembled in original line order; a document whose every line is
    * boilerplate disappears from the output (nothing left to train on).
    * The doc-count threshold is computed in-plan (1-row broadcast), not
    * on the driver. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       sep: String, minDocFrac: Double): DataFrame = {
    val lines = Dedup.spread(df).select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val boilerplate = lines.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(nDocs))
      .filter(col("doc_freq") >= col("n_docs") * minDocFrac)
      .select(col("line"))
    lines.join(broadcast(boilerplate), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line"))).as("text_clean"))
  }

  /** Canonical text normalization (the pass run before any hashing or
    * dedup so trivially-different bytes don't defeat exact matching):
    * control chars → space, whitespace runs collapsed, ends trimmed.
    * Pure per-row regexp chain — map-side, codegen, no shuffle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))

  /** Remove repeated lines WITHIN a document (keep the first
    * occurrence, preserve order) — intra-doc span dedup, the C4-style
    * pass that strips a page's repeated nav/footer blocks before
    * corpus-level dedup sees them. One window keyed (doc, line) + one
    * reassembly groupBy — both partition by the document, so the corpus
    * shuffles on its natural key only. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String): DataFrame = {
    val lines = Dedup.spread(df).select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("line")).orderBy(col("pos"))
    lines.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line"))).as("text_dedup"))
  }

  /** PII scrub patterns: (name, regex, replacement). Kept to syntax
    * shared by Java regex (Spark) and RE2 (DuckDB's regexp_*) so the
    * differential oracle can mirror the scrub exactly. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Redact all PII patterns in order (emails before IPs so an address
    * inside a mailbox host is consumed by the email rule first). Pure
    * per-row regexp_replace chain: codegen, no shuffle — the standard
    * pre-training scrub (C4/Dolma style) runs map-side over the scan. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (t, (_, p, r)) => regexp_replace(t, p, r) }

  /** Per-pattern match count on the ORIGINAL text (metrics side of the
    * scrub: how much PII was present per document). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, p, _) => (s"n_$name", regexp_count(text, lit(p))) }

  /** Keep rows whose `sizeCol` lies inside the [loPct, hiPct] percentile
    * band — the corpus length-outlier filter (drop truncated fragments
    * and runaway concatenations before training).
    *
    * Scale shape: quantile VALUES come from a size histogram — one
    * partial-agg groupBy on the (bounded-cardinality) size column, a
    * window cumsum over that tiny frame, and a 1-row broadcast of the
    * bounds back onto the corpus. The 100 TB side is scanned twice but
    * never sorted and never shuffled on a row key. Threshold arithmetic
    * is integer counts + one double division, identical in the oracle.
    */
  def lengthBandFilter(df: DataFrame, sizeCol: String,
                       loPct: Int, hiPct: Int): DataFrame = {
    val n = df.agg(count(lit(1)).as("__n"))
    // Distinct sizes are few; the unpartitioned window runs on the
    // histogram, not the corpus.
    val hist = df.groupBy(col(sizeCol)).agg(count(lit(1)).as("__c"))
    // deliberate single-partition cumsum over the tiny histogram —
    // keyed so the optimizer can't strip the spec (see
    // Relational.singlePartitionKey)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(Relational.singlePartitionKey())
          .orderBy(col(sizeCol))))
      .crossJoin(broadcast(n))
    val bounds = cum.agg(
      min(when(col("__cum") > floor(col("__n") * loPct / 100), col(sizeCol))).as("__lo"),
      min(when(col("__cum") >= ceil(col("__n") * hiPct / 100), col(sizeCol))).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .filter(col(sizeCol) >= col("__lo") && col(sizeCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Explainable curation decision log — the audit artifact a governed
    * training-data pipeline emits INSTEAD of silently dropping rows:
    * every input doc appears with a per-rule verdict column, the
    * decisive (highest-priority failing) rule as `reason`, and the
    * final `kept` flag. Rule priority is declaration order, `setRules`
    * (structural verdicts — dup membership, contamination — given as
    * frames of FAILING ids) ahead of `scalarRules` (map-side
    * predicates over the doc's own columns; true = fail).
    *
    * Scale shape: scalar verdicts are pure projections; each set rule
    * is one left join on the id (broadcast while the failing set is
    * provably small, shuffle-hash past that — `broadcastIfSmall`).
    * The log adds no pass the underlying rule computations didn't
    * already need, and never aggregates. */
  def curationDecisions(docs: DataFrame, idCol: String,
                        setRules: Seq[(String, DataFrame)],
                        scalarRules: Seq[(String, Column)]): DataFrame = {
    val withSet = setRules.foldLeft(docs) { case (d, (name, fails)) =>
      d.join(
        Relational.broadcastIfSmall(fails.select(col(idCol)).distinct()
          .withColumn(s"fail_$name", lit(true))),
        Seq(idCol), "left")
    }
    val withAll = scalarRules.foldLeft(withSet) { case (d, (name, pred)) =>
      d.withColumn(s"fail_$name", coalesce(pred, lit(false)))
    }
    val names = setRules.map(_._1) ++ scalarRules.map(_._1)
    val flags = names.map(n => coalesce(col(s"fail_$n"), lit(false)))
    val reason = coalesce(
      names.zip(flags).map { case (n, f) => when(f, lit(n)) } :+ lit("kept"): _*)
    val outCols = col(idCol) +:
      names.zip(flags).map { case (n, f) => f.as(s"fail_$n") } :+
      reason.as("reason") :+ (reason === lit("kept")).as("kept")
    withAll.select(outCols: _*)
  }
}
