package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

class ChunkingSpec extends SparkTestBase {

  import spark.implicits._

  test("fixedWindows: sliding windows cover the text with the stride overlap") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "text")
    val chunks = Chunking.fixedWindows(docs, "doc_id", "text",
      size = 4, stride = 3)
    val byDoc = chunks
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: starts 0,3,6,9 — final window truncated
    assert(byDoc(1L).map(c => (c._3, c._4)) ==
      Seq((0L, "abcd"), (3L, "defg"), (6L, "ghij"), (9L, "j")))
    // doc 2 shorter than one window: single truncated chunk
    assert(byDoc(2L).map(_._4) == Seq("xy"))
    // empty docs emit nothing
    assert(!byDoc.contains(3L))
    // chunk_len matches the emitted text
    assert(chunks.filter(length(col("chunk_text")) =!= col("chunk_len"))
      .isEmpty)
  }

  test("fixedWindows: disjoint blocks when stride == size; plan is shuffle-free") {
    val docs = Seq((1L, "a" * 10)).toDF("doc_id", "text")
    val chunks = Chunking.fixedWindows(docs, "doc_id", "text",
      size = 5, stride = 5)
    assert(chunks.select("chunk_text").as[String].collect().toSeq ==
      Seq("aaaaa", "aaaaa"))
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must stay map-side (no shuffle):\n$plan")
  }
}
