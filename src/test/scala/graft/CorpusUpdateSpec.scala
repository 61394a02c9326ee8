package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.pipeline.CorpusUpdate

/** The composed incremental corpus-update cycle: each stage's effect is
  * asserted on a constructed batch where the expected survivors are
  * known exactly (corpus-dup, batch-dup, rule-fail, over-quota, clean).
  * Distinct docs get pseudo-random token sets (near-zero shingle
  * overlap); duplicates reuse a text VERBATIM so their LSH collision is
  * certain.
  */
class CorpusUpdateSpec extends SparkTestBase {
  import spark.implicits._

  /** ~60 unique-ish words + stop words: passes the Gopher battery, and
    * two different ids share almost no character shingles. */
  private def freshText(id: Long): String = {
    def tok(i: Int) = java.lang.Long.toString(
      math.abs(id * 1000003L + i * 7919L) * 2654435761L % 78364164096L, 36)
    "the and of to is " + (1 to 60).map(tok).mkString(" ")
  }

  test("ingestBatch drops corpus dups, batch dups, rule failures, over-quota rows") {
    def doc(id: Long, text: String, source: String) =
      (id, text, source, text.length)
    val corpusText = freshText(1L)
    val existing = Seq(doc(1L, corpusText, "src_a"))
      .toDF("doc_id", "text", "source", "n_chars")
    val index = Dedup.lshIndexBands(existing, "doc_id", "text")

    val batch = Seq(
      doc(10L, corpusText, "src_a"),          // verbatim dup of corpus doc 1
      doc(11L, freshText(11L), "src_a"),
      doc(12L, freshText(11L), "src_a"),      // verbatim dup of 11
      doc(13L, "short junk", "src_a"),        // fails word count
      doc(14L, freshText(14L), "src_b"),
      doc(15L, freshText(15L), "src_b"),
      doc(16L, freshText(16L), "src_b"))
      .toDF("doc_id", "text", "source", "n_chars")

    val adm = CorpusUpdate.ingestBatch(existing, index, batch,
      "doc_id", "text", "source", sourceCap = 2)

    assert(adm.stats("batch") == 7L)
    assert(adm.stats("after_dedup") == 5L)   // 10 (corpus dup) and 12 (batch dup) gone
    assert(adm.stats("after_rules") == 4L)   // 13 fails the battery
    assert(adm.stats("admitted") == 3L)      // src_b capped 3 -> 2
    val ids = adm.admitted.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(11L) && !ids.contains(10L) && !ids.contains(12L) &&
      !ids.contains(13L))
    assert(ids.count(Set(14L, 15L, 16L)) == 2)

    // the index delta covers exactly the admitted rows
    val idxIds = adm.newIndexRows.select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds == ids)

    // drift report: bins over existing(ref) vs admitted(cur), proportions sum to 1
    val sums = adm.drift.agg(sum("p_ref"), sum("p_cur")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-9)
  }

  test("a second cycle probes the EXTENDED index and rejects re-submissions") {
    val existing = Seq((1L, freshText(1L), "src_a", freshText(1L).length))
      .toDF("doc_id", "text", "source", "n_chars")
    val index0 = Dedup.lshIndexBands(existing, "doc_id", "text")

    val batch1 = Seq((20L, freshText(20L), "src_a", freshText(20L).length))
      .toDF("doc_id", "text", "source", "n_chars")
    val adm1 = CorpusUpdate.ingestBatch(existing, index0, batch1,
      "doc_id", "text", "source")
    assert(adm1.stats("admitted") == 1L)
    val index1 = index0.unionByName(adm1.newIndexRows)

    // resubmitting the same content (new id) must now be screened out
    val batch2 = Seq((30L, freshText(20L), "src_a", freshText(20L).length))
      .toDF("doc_id", "text", "source", "n_chars")
    val adm2 = CorpusUpdate.ingestBatch(
      existing.unionByName(adm1.admitted), index1, batch2,
      "doc_id", "text", "source")
    assert(adm2.stats("admitted") == 0L)
  }
}
