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

  /** Distinct word n-grams of `text` (whitespace tokens, space-joined,
    * clamped like a `tokens[i : i+n-1]` slice when the doc is short). */
  def wordGrams(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

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
    val evalGrams = evalSet
      .select(explode_outer(wordGrams(col(textCol), n)).as("gram")).distinct()
    val exploded = Dedup.spread(train)
      .select(col(idCol), wordGrams(col(textCol), n).as("grams"))
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
}
