package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Lakehouse
import graft.operators.Multimodal
import graft.sources.{DirtyJson, Fasta}
import graft.streaming.EventStream

/** Ingest / format / streaming queries: FASTA round-trip, dirty-JSON
  * repair, multimodal binary plumbing, and the streaming-shaped
  * windowed aggregation (verified batch-side here; streaming semantics
  * in StreamingSpec).
  */
object IngestQueries {

  val queries: Map[String, QueryFn] = Map(
    // S7: FASTA reader — documents rendered to FASTA text, read back
    // with the '>'-delimited record reader, compared field-for-field.
    "fasta_roundtrip" -> ((s, d) => {
      val docs = tbl(s, d, "documents")
      val fasta = docs.select(
        concat(lit("doc_"), col("doc_id")).as("id"),
        concat(lit("lang="), col("lang")).as("description"),
        upper(regexp_replace(col("text"), " ", "")).as("seq"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_fasta_${math.abs(d.hashCode)}"
      Fasta.write(fasta.coalesce(1), path)
      Fasta.read(s, path)
    }),

    // S8: dirty-JSON repair — log-prefixed/suffixed JSON repaired by a
    // column pre-pass, then parsed (reference: build_berdl_db.py:149-170).
    "dirty_json_repair" -> ((s, d) => {
      tbl(s, d, "events").select(
        col("event_id"),
        DirtyJson.repairedField(
          concat(lit("2026-08-12T00:00:00Z stdout: "), col("props"), lit(" [eof]")),
          "$.k").cast("bigint").as("k"))
    }),

    // Multimodal: opaque binary payload + partition-batched decode
    // (stub codec; real Spark plumbing — see Multimodal.scala).
    "multimodal_meta" -> ((s, d) => {
      val withPayload = tbl(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.withMediaMeta(withPayload, "payload")
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"))
    }),

    // Multimodal: frame-sampling explode plumbing for video payloads.
    "multimodal_frames" -> ((s, d) => {
      val withPayload = tbl(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(withPayload, "payload", everyNth = 3)
        .select(col("doc_id"), col("frame_idx"))
    }),

    // Streaming-shaped tumbling-window aggregation (batch equivalence;
    // the readStream path is exercised in StreamingSpec).
    "stream_window_counts" -> ((s, d) => {
      val ev = tbl(s, d, "events")
        .withColumn("ts", Lakehouse.eventTime(col("ts_us")))
      EventStream.windowedCounts(ev, "ts", "1 hour")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), round2(col("sum_value")).as("sum_value"))
    }))

  val oracles: Map[String, String] = Map(
    "fasta_roundtrip" ->
      """SELECT 'doc_' || doc_id AS id, 'lang=' || lang AS description,
           upper(replace(text, ' ', '')) AS seq
         FROM documents""",
    "dirty_json_repair" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
           CAST(octet_length(encode(text)) * 3 % 640 + 16 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) * 7 % 480 + 16 AS INTEGER) AS height,
           3 AS channels
         FROM documents""",
    "multimodal_frames" ->
      """SELECT doc_id, unnest(generate_series(0, octet_length(encode(text)) // 100, 3)) AS frame_idx
         FROM documents""",
    "stream_window_counts" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
         FROM events GROUP BY 1, 2""")
}
