package graft

import org.apache.spark.sql.functions._

import graft.operators.GrepIndex

/** Trigram corpus-grep: the index+verify result must equal the direct
  * contains() scan for every pattern shape — long, overlapping-trigram,
  * absent, shorter-than-trigram (fallback), and coincidental
  * co-occurrence (all trigrams present, substring absent).
  */
class GrepIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "a brown cow and a quick dog"),
    (3L, "thequickmix"),                 // "quick" present, "the quick" absent
    (4L, "foxes and boxes"),
    (5L, "aaaa"),                        // overlapping identical trigrams
    (6L, "qu ick the brow n")            // all trigrams of "the quick"? no — verify guards
  ).toDF("doc_id", "text")

  private val index = GrepIndex.build(docs, "doc_id", "text")

  private def grep(pattern: String): Set[Long] =
    GrepIndex.search(index, docs, "doc_id", "text", pattern)
      .as[Long].collect().toSet

  private def direct(pattern: String): Set[Long] =
    docs.filter(col("text").contains(pattern)).select("doc_id")
      .as[Long].collect().toSet

  test("index search equals direct contains() for every pattern shape") {
    for (p <- Seq("the quick", "quick", "brown", "aaa", "aa", "zebra",
      "fox", "ick", "a q")) {
      assert(grep(p) == direct(p), s"pattern '$p'")
    }
  }

  test("coincidental trigram co-occurrence is removed by the verify step") {
    // craft a doc holding every trigram of "abcdef" but not the string
    val tricky = Seq(
      (10L, "abcd xx bcde xx cdef"),     // trigrams abc,bcd,cde,def all present
      (11L, "abcdef")
    ).toDF("doc_id", "text")
    val idx = GrepIndex.build(tricky, "doc_id", "text")
    val got = GrepIndex.search(idx, tricky, "doc_id", "text", "abcdef")
      .as[Long].collect().toSet
    assert(got == Set(11L))
  }

  test("overlapping trigrams dedupe in the postings; sub-trigram texts yield none") {
    // "aaaa" has windows "aaa","aaa" → ONE distinct posting row
    assert(index.filter(col("doc_id") === 5L).count() == 1)
    val tiny = Seq((20L, "ab")).toDF("doc_id", "text")
    assert(GrepIndex.build(tiny, "doc_id", "text").count() == 0)
    // sub-trigram patterns still answered exactly via the scan fallback
    val got = GrepIndex.search(index, docs, "doc_id", "text", "qu")
      .as[Long].collect().toSet
    assert(got == direct("qu"))
  }
}
