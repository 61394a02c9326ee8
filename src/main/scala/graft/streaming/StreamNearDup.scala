package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming-native near-dup screening: as documents ARRIVE, each is
  * minhash-signed and banded map-side (`Dedup.minhashSignatureRowwise`
  * — array HOFs, no pre-state shuffle, which Structured Streaming
  * would reject before a stateful operator), then every band bucket
  * keeps its member ids in `GroupState`; a new arrival emits candidate
  * pairs against everything previously seen in its bucket. This is the
  * LSH analogue of `EventStream.firstSeen`: the corpus-level dedup
  * index, maintained incrementally by the stream itself.
  *
  * State is the band index (~bands rows per doc, ids only) — the same
  * artifact `Dedup.lshIndexBands` persists for batch ingest; production
  * adds a state TTL/watermark to bound it.
  */
object StreamNearDup {

  case class BandRow(doc_id: Long, band: Int, band_sig: String)
  case class CandPair(id_new: Long, id_seen: Long)

  /** Map-side signature + banding for a (streaming or batch) document
    * frame with (idCol, textCol). */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 5, k: Int = 16, bands: Int = 4): DataFrame =
    Dedup.lshBandsRowwise(
      Dedup.minhashSignatureRowwise(docs, idCol, textCol, n, k),
      idCol, bands, k / bands)

  /** Stateful bucket screen over band rows (from `bandRows`, with the
    * id column named doc_id). Emits (id_new, id_seen) candidate pairs;
    * a pair matching in several bands can surface once per band —
    * downstream `distinct` (or the verify join) absorbs it, exactly as
    * in the batch banded join. */
  def candidatePairs(bands: DataFrame): Dataset[CandPair] = {
    val spark = bands.sparkSession
    import spark.implicits._
    bands.select("doc_id", "band", "band_sig").as[BandRow]
      .groupByKey(b => (b.band, b.band_sig))
      .flatMapGroupsWithState[Seq[Long], CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), it: Iterator[BandRow], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val fresh = it.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(seen.contains)
          val cross = for { n <- fresh; s <- seen } yield CandPair(n, s)
          val intra = for { i <- fresh.indices; j <- 0 until i }
            yield CandPair(fresh(i), fresh(j))
          state.update(seen ++ fresh)
          (cross ++ intra).iterator
      }
  }
}
