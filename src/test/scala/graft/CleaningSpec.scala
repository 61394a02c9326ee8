package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleaning

/** Corpus-hygiene operators on constructed fixtures: newline-separated
  * boilerplate stripping (the fixture corpus has no newlines, so the
  * gated query runs at word granularity — this covers the real
  * multi-line case) and contamination precision.
  */
class CleaningSpec extends SparkTestBase {

  import spark.implicits._

  test("stripBoilerplate removes globally frequent lines, keeps order") {
    val docs = Seq(
      (1L, "COMMON HEADER\nalpha beta\nCOMMON FOOTER"),
      (2L, "COMMON HEADER\ngamma delta\nCOMMON FOOTER"),
      (3L, "COMMON HEADER\nepsilon\nzeta eta\nCOMMON FOOTER"),
      (4L, "unique one\nunique two")
    ).toDF("doc_id", "text")
    val out = Cleaning.stripBoilerplate(docs, "doc_id", "text",
      sep = "\n", minDocFrac = 0.75)
      .as[(Long, String)].collect().toMap
    // header+footer occur in 3/4 docs >= 0.75 -> stripped everywhere
    assert(out(1L) == "alpha beta")
    assert(out(2L) == "gamma delta")
    assert(out(3L) == "epsilon\nzeta eta")   // original order kept
    assert(out(4L) == "unique one\nunique two")
  }

  test("stripBoilerplate drops documents that were pure boilerplate") {
    val docs = Seq(
      (1L, "SAME\nkeep me"),
      (2L, "SAME"),
      (3L, "SAME\nother text")
    ).toDF("doc_id", "text")
    val out = Cleaning.stripBoilerplate(docs, "doc_id", "text",
      sep = "\n", minDocFrac = 1.0)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "keep me", 3L -> "other text"))
  }

  test("contamination flags only docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "a b c d e f g h i j"),      // contains eval gram a..h
      (2L, "z y x w v u t s r q"),      // clean
      (3L, "m m m a b c d e f g h")     // contains eval gram a..h
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = Cleaning.contamination(train, evalSet, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("contamination ratio is hits over total distinct grams") {
    val train = Seq((1L, "a b c d e f g h extra")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val row = Cleaning.contamination(train, evalSet, "doc_id", "text", n = 8)
      .select("hits", "contamination").as[(Long, Double)].head()
    // doc grams: [a..h], [b..extra] -> 1 hit of 2 grams
    assert(row == ((1L, 0.5)))
  }

  test("contaminationBloom matches contamination exactly (no false negatives)") {
    val train = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z y x w v u t s r q"),
      (3L, "m m m a b c d e f g h"),
      (4L, "a b c d e f g h extra")
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b c d e f g h"), (101L, "p p p p p p p p"))
      .toDF("doc_id", "text")
    val exact = Cleaning.contamination(train, evalSet, "doc_id", "text", n = 8)
      .as[(Long, Long, Double)].collect().toSet
    // Deliberately undersized sketch (64 items / 512 bits): false
    // positives likely, result still identical — the exact join clears
    // them and Bloom filters cannot produce false negatives.
    val bloom = Cleaning.contaminationBloom(train, evalSet, "doc_id", "text",
      n = 8, expectedGrams = 64L, numBits = 512L)
      .as[(Long, Long, Double)].collect().toSet
    assert(bloom == exact)
  }

  test("contaminationBloom on an empty eval set returns no rows") {
    val train = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val evalSet = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Cleaning.contaminationBloom(train, evalSet, "doc_id", "text", n = 8)
    assert(out.columns.toSeq == Seq("doc_id", "hits", "contamination"))
    assert(out.count() == 0)
  }

  test("dedupLines keeps first occurrence per line, preserves order") {
    val docs = Seq(
      (1L, "header\nbody one\nheader\nbody two\nheader"),
      (2L, "only\nunique\nlines")).toDF("doc_id", "text")
    val out = Cleaning.dedupLines(docs, "doc_id", "text", sep = "\n")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "header\nbody one\nbody two")
    assert(out(2L) == "only\nunique\nlines")
  }

  test("normalizeText collapses whitespace and strips control chars") {
    val df = Seq((1L, "\ta  b\u0007c\r\n d  ")).toDF("id", "t")
    val out = df.select(Cleaning.normalizeText(col("t"))).as[String].head()
    assert(out == "a b c d")
  }

  test("curationDecisions: first failing rule wins, every doc appears") {
    val docs = Seq(
      (1L, "clean doc", 9L),   // passes everything
      (2L, "dup text", 8L),    // rep of the dup pair → kept
      (3L, "dup text", 4L),    // dup loser AND short → reason = exact_dup
      (4L, "tiny", 4L),        // short only
      (5L, "long doc", 999L)   // long only
    ).toDF("doc_id", "text", "n_chars")
    val losers = Seq(3L).toDF("doc_id")
    val got = Cleaning.curationDecisions(docs, "doc_id",
      Seq("exact_dup" -> losers),
      Seq("too_short" -> (col("n_chars") < 5),
        "too_long" -> (col("n_chars") > 100)))
      .select("doc_id", "reason", "kept")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> (("kept", true)), 2L -> (("kept", true)),
      3L -> (("exact_dup", false)), 4L -> (("too_short", false)),
      5L -> (("too_long", false))))
  }
}
