package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collocations, TfIdf, TimeSeries}

/** Unit coverage for the round-5 text-index / series operators (their
  * oracle queries pin engine parity; these pin the semantics on
  * hand-checkable fixtures). */
class IndexingSpec extends SparkTestBase {

  import spark.implicits._

  test("invertedIndex: exact content on a toy corpus (df band applied)") {
    // a: df 4 — dropped by the 0.7 cap (3.5); c/zz: df 1 — below minDf 2
    val docs = Seq(
      (1L, "a b a"), (2L, "a b"), (3L, "a c"), (4L, "a"), (5L, "zz"))
      .toDF("doc_id", "text")
    val idx = TfIdf.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxDfFrac = 0.7)
      .select("term", "df", "corpus_tf", "postings")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(idx == Map("b" -> ((2L, 2L, "1:1 2:1"))))
  }

  test("bigramPmi: a bigram that always co-occurs outranks independent pairs") {
    // "x y" always adjacent; "a" pairs with many different successors.
    val docs = Seq.tabulate(8)(i => s"x y a w$i").toDF("text")
    val top = Collocations.bigramPmi(docs, "text", minCount = 2L, k = 5)
      .select("w1", "w2", "n_ab", "pmi")
      .as[(String, String, Long, Double)].collect()
    assert(top.head._1 == "x" && top.head._2 == "y" && top.head._3 == 8L)
    // PMI of the perfect collocation strictly beats the frequent-but-
    // independent "y a" pair (y precedes a always, but both are common)
    val ya = top.find(t => t._1 == "y" && t._2 == "a").get
    assert(top.head._4 >= ya._4)
  }

  test("resampleFill: gaps take the last observed value; bounds are per key") {
    val events = Seq(
      // key 1: buckets 0 and 3 observed -> 1,2 forward-filled from b0
      (1L, 1L, 0L * 86400L, 10.0), (2L, 1L, 3L * 86400L, 40.0),
      // bucket 0 has two rows; later ts wins
      (3L, 1L, 100L, 11.0),
      // key 2: single bucket, no fill needed
      (4L, 2L, 5L * 86400L, 99.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts_us", col("ts_s") * 1000000L)
    val out = TimeSeries.resampleFill(events, "user_id", "ts_us",
      "value", "event_id", bucketUs = 86400000000L)
      .select("user_id", "bucket", "value", "is_observed")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 11.0, true), (1L, 1L, 11.0, false), (1L, 2L, 11.0, false),
      (1L, 3L, 40.0, true), (2L, 5L, 99.0, true)))
  }
}
