package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

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
  * artifact `Dedup.lshIndexBands` persists for batch ingest. Per-bucket
  * membership is a Set (O(1) probe — a hot boilerplate bucket with a
  * linear `contains` would make each micro-batch O(|seen|·|fresh|)),
  * and `ttlMs` bounds state lifetime: a bucket idle past the TTL is
  * dropped, the production knob for an unbounded corpus.
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
    * in the batch banded join.
    *
    * `ttlMs > 0` drops a bucket's membership after that much
    * processing-time idleness — bounded state for an unbounded stream
    * (docs farther apart than the TTL stop pairing, the usual
    * recency-window trade). */
  def candidatePairs(bands: DataFrame, ttlMs: Long = 0L): Dataset[CandPair] = {
    val spark = bands.sparkSession
    import spark.implicits._
    val timeout = if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    bands.select("doc_id", "band", "band_sig").as[BandRow]
      .groupByKey(b => (b.band, b.band_sig))
      .flatMapGroupsWithState[Set[Long], CandPair](
        OutputMode.Append(), timeout) {
        (_: (Int, String), it: Iterator[BandRow], state: GroupState[Set[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Set.empty[Long])
            val fresh = it.map(_.doc_id).toSeq.distinct.sorted
              .filterNot(seen)
            val cross = for { n <- fresh; s <- seen.toSeq.sorted }
              yield CandPair(n, s)
            val intra = for { i <- fresh.indices; j <- 0 until i }
              yield CandPair(fresh(i), fresh(j))
            state.update(seen ++ fresh)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            (cross ++ intra).iterator
          }
      }
  }

  /** [[candidatePairs]] on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): same emitted pairs, but the
    * bucket membership lives in a [[org.apache.spark.sql.streaming.ListState]]
    * the store maintains NATIVELY — appends write only the fresh ids
    * (the classic `GroupState[Set[Long]]` rewrites the whole set every
    * micro-batch, an O(|bucket|) serialize per arrival that the v2
    * list column family avoids), and expiry is declarative
    * ([[org.apache.spark.sql.streaming.TTLConfig]]) instead of
    * hand-rolled timeout bookkeeping. Requires the RocksDB state-store
    * provider (the v2 API contract) — callers set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` before starting the query.
    *
    * The in-batch screen is identical to [[candidatePairs]]: a pair
    * found in several bands surfaces once per band; downstream
    * `distinct` absorbs it. */
  def candidatePairsTws(bands: DataFrame, ttl: java.time.Duration = null): Dataset[CandPair] = {
    val spark = bands.sparkSession
    import spark.implicits._
    val timeMode = if (ttl != null) TimeMode.ProcessingTime() else TimeMode.None()
    bands.select("doc_id", "band", "band_sig").as[BandRow]
      .groupByKey(b => (b.band, b.band_sig))
      .transformWithState(new BucketScreenProcessor(ttl),
        timeMode, OutputMode.Append())
  }

  /** The per-bucket screen as a v2 [[StatefulProcessor]]: state is the
    * bucket's member-id list (append-only here; uniqueness is enforced
    * on read, exactly like the Set in the classic path). */
  class BucketScreenProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[(Int, String), BandRow, CandPair] {

    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConf = if (ttl != null) TTLConfig(ttl) else TTLConfig.NONE
      seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, ttlConf)
    }

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[CandPair] = {
      val seenIds = seen.get().toSet
      val fresh = rows.map(_.doc_id).toSeq.distinct.sorted
        .filterNot(seenIds)
      val cross = for { n <- fresh; s <- seenIds.toSeq.sorted }
        yield CandPair(n, s)
      val intra = for { i <- fresh.indices; j <- 0 until i }
        yield CandPair(fresh(i), fresh(j))
      if (fresh.nonEmpty) seen.appendList(fresh.toArray)
      (cross ++ intra).iterator
    }
  }
}
