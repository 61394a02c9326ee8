package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * 2016 — public prior art, including the word-frequency optimization).
  *
  * Scale shape: the corpus is touched ONCE to build the word-frequency
  * table (one partial-agg groupBy; the classic observation that pair
  * statistics only need distinct words weighted by frequency). Every
  * merge round then runs over that vocabulary-sized table: adjacent
  * pair counts are a small agg, the driver takes only the single argmax
  * row per round, and the merge applies map-side as a literal string
  * replace. `localCheckpoint` per round keeps the plan flat instead of
  * nesting one replace per learned merge.
  *
  * Symbol strings use a TWO-MARKER encoding — each symbol is wrapped
  * as `•sym¶` (start marker + terminator), `"ab" -> "•a¶•b¶"` — so the
  * merge of pair (lhs, rhs) is the literal replace of `•lhs¶•rhs¶`
  * with `•lhsrhs¶`. Both anchors matter: the marker pins the match to
  * a symbol START (a bare `lhs¶rhs¶` pattern also matched where `lhs`
  * was a proper SUFFIX of a longer symbol — e.g. symbols ["lo","w"]
  * with merge (o,w) produced "low" across the symbol boundary), and
  * the terminator pins the symbol END (rhs can't match a prefix of a
  * longer symbol). Because each occurrence of the pattern is fully
  * disjoint from the next (no shared boundary character), leftmost
  * non-overlapping `replace` still merges back-to-back pairs exactly
  * like BPE's left-to-right scan — and the same `replace` semantics
  * exist in any engine, which is what makes the learner
  * differentially testable in SQL.
  */
object Bpe {

  /** Symbol terminator: must not occur in corpus tokens. */
  val Term = "¶"

  /** Symbol start marker: must not occur in corpus tokens. */
  val Start = "•"

  /** Word-frequency table with two-marker-encoded symbol strings:
    * (word, freq, s) where s is the word split into single-character
    * symbols. One corpus pass; vocabulary-sized output. */
  def wordFreq(corpus: DataFrame, textCol: String): DataFrame =
    Dedup.spread(corpus)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s", regexp_replace(col("word"), "(.)", s"$Start$$1$Term"))

  /** Adjacent symbol pairs of `s` weighted by `freq`, aggregated —
    * the per-round pair statistics. Splitting on the terminator leaves
    * each element carrying its leading start marker (plus a trailing
    * "" element); `substring(_, 2)` strips it. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(col("s"), Term) // trailing "" element after the last terminator
    def symAt(i: Column): Column =
      substring(element_at(col("syms"), i), 2, Int.MaxValue)
    vocab
      .select(col("freq"), syms.as("syms"))
      .filter(size(col("syms")) >= 3) // at least two real symbols
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 2),
        i => struct(symAt(i).as("lhs"), symAt(i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("weight"))
  }

  /** Learn up to `nMerges` merges; returns (rank, lhs, rhs, weight)
    * rows in learning order. Ties break on (lhs, rhs) ascending so the
    * result is deterministic across engines and partitionings. */
  def learnMerges(spark: SparkSession, corpus: DataFrame, textCol: String,
                  nMerges: Int): DataFrame = {
    var vocab = wordFreq(corpus, textCol).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("weight"), asc("lhs"), asc("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (lhs, rhs, w) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r + 1, lhs, rhs, w))
        vocab = vocab.withColumn("s",
          replace(col("s"), lit(s"$Start$lhs$Term$Start$rhs$Term"),
            lit(s"$Start$lhs$rhs$Term")))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "lhs", "rhs", "weight")
  }

  /** Tokenize `textCol` with a learned merge list (driver-side, rank
    * order): whitespace words -> character symbols -> fold each merge
    * as a literal replace -> array of subword symbols per word. The
    * whole encode is a map-side projection. */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val word = explode(split(trim(col(textCol)), "\\s+")).as("word")
    val chars = regexp_replace(col("word"), "(.)", s"$Start$$1$Term")
    val folded = merges.foldLeft(chars) { case (c, (lhs, rhs)) =>
      replace(c, lit(s"$Start$lhs$Term$Start$rhs$Term"), lit(s"$Start$lhs$rhs$Term"))
    }
    df.select(col("*"), word)
      .filter(col("word") =!= "")
      .withColumn("symbols", transform(
        slice(split(folded, Term), lit(1), size(split(folded, Term)) - 1),
        x => substring(x, 2, Int.MaxValue)))
  }
}
