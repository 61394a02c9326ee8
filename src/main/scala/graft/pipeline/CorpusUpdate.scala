package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Profiling, Sampling}

/** The incremental corpus-update cycle — the production loop a
  * training-data lakehouse runs on every ingest, composed from the
  * library's independently-verified pieces:
  *
  *   1. near-dup screen: the new batch's LSH band signatures probe the
  *      PERSISTED band index of the existing corpus
  *      ([[Dedup.lshProbePairs]] — batch side broadcasts, the index
  *      never shuffles) and the batch self-screens
  *      ([[Dedup.lshCandidatePairs]] on the batch alone);
  *   2. quality gate: the Gopher rule battery
  *      ([[TextAnalysis.gopherRules]]), map-side;
  *   3. per-source quota ([[Sampling.perKeyCap]], skew-proof two-phase);
  *   4. the surviving rows land via dynamic-partition upsert (only
  *      touched partitions rewrite — streaming form in
  *      [[graft.streaming.IncrementalRefresh]]);
  *   5. the band index is extended with the admitted rows' signatures
  *      (append — never a full-corpus re-LSH);
  *   6. a drift report vs the existing corpus
  *      ([[Profiling.distributionDrift]]).
  *
  * Nothing here re-scans the existing corpus except the bucket-count-
  * sized band index and the drift aggregate — the cycle's cost scales
  * with the BATCH, which is what makes a daily ingest against a 100 TB
  * corpus viable.
  */
object CorpusUpdate {

  case class Admission(admitted: DataFrame, newIndexRows: DataFrame,
                       drift: DataFrame, stats: Map[String, Long])

  /** Run one cycle. `existing` must carry (idCol, textCol, sourceCol,
    * n_chars); `index` is the persisted band index over the existing
    * corpus (`Dedup.lshIndexBands` output). Rows of `batch` survive iff
    * they are not near-dups of the corpus or of an earlier-id batch
    * row, pass the rule battery, and fit their source's quota. */
  def ingestBatch(existing: DataFrame, index: DataFrame, batch: DataFrame,
                  idCol: String, textCol: String, sourceCol: String,
                  sourceCap: Int = 1000): Admission = {
    val nBatch = batch.count()

    // 1a: batch-vs-corpus near-dups — drop every batch row that collides
    val vsCorpus = Dedup.lshProbePairs(batch, index, idCol, textCol)
      .select(col("id_new").as("__dup")).distinct()
    // 1b: batch-vs-batch — keep the lowest id of each colliding pair
    val vsSelf = Dedup.lshCandidatePairs(batch, idCol, textCol)
      .select(greatest(col("id_a"), col("id_b")).as("__dup")).distinct()
    val dups = vsCorpus.unionByName(vsSelf).distinct()
    // Checkpoint here: the LSH probe/self-join is the expensive lineage,
    // and the three downstream counts would each re-execute it otherwise.
    // After this, nRuled/nAdmitted recompute only map-side stages over
    // batch-sized checkpointed data.
    val deduped = batch.join(dups, batch(idCol) === dups("__dup"), "left_anti")
      .localCheckpoint()
    val nDeduped = deduped.count()

    // 2: rule battery (map-side)
    val ruled = deduped
      .withColumn("__g", TextAnalysis.gopherRules(col(textCol)))
      .filter(col("__g.keep")).drop("__g")
    val nRuled = ruled.count()

    // 3: per-source quota
    val admitted = Sampling.perKeyCap(ruled, sourceCol, idCol, sourceCap)
      .localCheckpoint() // feeds index build + drift + caller's upsert
    val nAdmitted = admitted.count()

    // 5: index delta for the admitted rows only
    val newIndexRows = Dedup.lshIndexBands(admitted, idCol, textCol)

    // 6: drift of the admitted batch vs the existing corpus (64-char
    // length bins — the same binning drift_report pins differentially)
    val drift = Profiling.distributionDrift(
      existing.select(col("n_chars"), lit(0).as("__g"))
        .unionByName(admitted.select(col("n_chars"), lit(1).as("__g"))),
      expr("n_chars div 64"), col("__g"))

    Admission(admitted, newIndexRows, drift, Map(
      "batch" -> nBatch,
      "after_dedup" -> nDeduped,
      "after_rules" -> nRuled,
      "admitted" -> nAdmitted))
  }
}
