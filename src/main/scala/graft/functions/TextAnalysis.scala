package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column bank for the training-data pipeline: token
  * counting, quality scoring, language ID, fingerprinting. All pure
  * Catalyst expressions (codegen'd); at 100 TB these run as a single
  * projection pass over the text column with nothing shuffled.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish pre-tokenization: word pieces + isolated punctuation
    * (the GPT-2-style `\w+|[^\w\s]` split). */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0)))

  /** Fraction of tokens that are in `words` (stopword ratio et al). */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val toks = wsTokens(text)
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Marker-word sets per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast as literals into codegen. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "es", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Arg-max language by marker-word ratio; ties resolve to the
    * alphabetically-first language (deterministic). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ws) => lang -> wordSetRatio(text, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: length band + punctuation sanity +
    * stopword presence (the usual heuristic trio for corpus filtering). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthOk = when(n >= 10 && n <= 1000, lit(1.0)).otherwise(lit(0.0))
    val punctRatio = punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")
    val punctOk = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopRatio = wordSetRatio(text, langMarkers.toMap.apply("en"))
    val stopOk = when(stopRatio >= 0.01, lit(1.0)).otherwise(lit(0.0))
    (lengthOk + punctOk + stopOk) / 3.0
  }

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * lower-cased token set (catches shuffled near-copies). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(wsTokens(lower(text))))))

  /** Repetition metrics — the boilerplate/spam signals of corpus
    * filtering. All exact rational arithmetic (no transcendental
    * functions), so differential results are bit-stable:
    *  - distinct-token ratio (1.0 = no repetition),
    *  - top-token share (max token frequency / token count). */
  def distinctTokenRatio(text: Column): Column = {
    val toks = wsTokens(text)
    size(array_distinct(toks)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  def topTokenShare(text: Column): Column = {
    val toks = wsTokens(text)
    // ONE pass over the sorted tokens: the longest equal-run is the
    // modal frequency. The previous distinct×filter formulation
    // captured `toks` in its lambda — a captured computation
    // re-evaluates per element (no CSE inside HOF lambdas), making the
    // pass quadratic; this fold touches only (acc, t).
    val best = aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    best.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean token length in characters (exact int/int division). */
  def meanTokenLength(text: Column): Column = {
    val toks = wsTokens(text)
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Gopher-style rule battery (Rae et al. 2021, table A1 — the
    * document-level subset that needs no line structure): each rule a
    * boolean column, `keep` their conjunction. All exact rational
    * arithmetic on counts, so differential results are bit-stable.
    *  - word count within [minWords, maxWords]
    *  - mean word length within [3, 10] chars
    *  - '#' symbols ≤ 10% of words
    *  - '...' occurrences ≤ 10% of words
    *  - ≥ 80% of words contain at least one alphabetic character
    *  - ≥ 2 distinct English stop words present
    */
  def gopherRules(text: Column, minWords: Int = 50,
                  maxWords: Int = 100000): Column = {
    val toks = wsTokens(lower(text))
    val n = size(toks)
    val nd = n.cast("double")
    val meanLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
      .cast("double") / greatest(n, lit(1)).cast("double")
    def occurrences(needle: String, width: Int) =
      ((length(text) - length(regexp_replace(text,
        java.util.regex.Pattern.quote(needle), ""))) / width).cast("double")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]"))).cast("double")
    val stops = array(langMarkers.toMap.apply("en").map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(toks), stops))
    val rules = Seq(
      (n >= minWords && n <= maxWords).as("word_count_ok"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("mean_word_len_ok"),
      (occurrences("#", 1) <= nd * 0.1).as("hash_ratio_ok"),
      (occurrences("...", 3) <= nd * 0.1).as("ellipsis_ratio_ok"),
      (alphaWords >= nd * 0.8).as("alpha_word_ratio_ok"),
      (stopHits >= 2).as("stop_word_ok"))
    struct(rules :+ rules.map(r => r: Column).reduce(_ && _).as("keep"): _*)
  }
}
