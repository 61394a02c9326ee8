package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.core.Lakehouse
import graft.operators.{Multimodal, PipeTool}
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

    // S9: paged-source read — every remote page is an InputPartition
    // fetched in parallel with per-page retry; failEvery=7 injects
    // transient failures so the retry path actually runs (reference
    // pagination client: query_pangenome_berdl.py:92-211).
    "s9_paged_source" -> ((s, d) => {
      s.read.format("graft.sources.PagedSource")
        .option("rows", 10000).option("pageSize", 1000).option("failEvery", 7)
        .load()
    }),

    // S2/S3/S6/S12: typed TSV round-trip — written with the TSV sink,
    // read back with an explicit schema (the reference's typed reader
    // forcing float columns: prep_genome_set.py:10-34).
    "tsv_typed_roundtrip" -> ((s, d) => {
      val sup = tbl(s, d, "supplier")
      val path = s"${sys.props("java.io.tmpdir")}/graft_tsv_${math.abs(d.hashCode)}"
      sup.coalesce(1).write.mode("overwrite")
        .option("sep", "\t").option("header", "true").csv(path)
      s.read.option("sep", "\t").option("header", "true")
        .schema(sup.schema).csv(path)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          round2(col("s_acctbal")).as("bal"))
    }),

    // Multimodal: partition-batched feature extraction (stub model) —
    // the bytes → embedding step of a multimodal pipeline. Output is
    // exploded to (doc_id, i, value) scalars so the differential gate
    // can sort/hash it (array columns are unhashable driver-side).
    "multimodal_features" -> ((s, d) => {
      val withPayload = tbl(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(withPayload, "payload", dim = 4)
        .select(col("doc_id"), posexplode(col("features")))
        .select(col("doc_id"), col("pos").cast("bigint").as("i"), col("col").as("value"))
    }),

    // Multimodal: REAL image path — a genuine 24-bit BMP is built per
    // row (dims derived from doc_id), decoded with javax.imageio,
    // resampled to half size with Graphics2D, re-encoded; the oracle
    // pins the decoded dims, band count, and the exact BMP byte
    // lengths (54-byte header + 4-byte-padded rows), so the codec
    // round-trip — not a stub — is what's differentially checked.
    "multimodal_resize" -> ((s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"),
        (col("doc_id") % 40 + 8).cast("int").as("w"),
        (col("doc_id") % 30 + 8).cast("int").as("h"),
        col("doc_id").as("seed"))
      val withBmp = Multimodal.withSyntheticBmp(docs, "w", "h", "seed")
      Multimodal.resizeImage(withBmp, "payload", denom = 2)
        .select(col("doc_id"),
          length(col("payload")).cast("bigint").as("orig_len"),
          col("width"), col("height"), col("channels"),
          col("resized_width"), col("resized_height"), col("resized_len"))
    }),

    // S11-adjacent: columnar sink/source parity beyond parquet — the
    // same typed frame round-trips through ORC (predicate pushdown and
    // column pruning work the same way; an engine swap of the storage
    // format must not change results).
    "orc_roundtrip" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val path = s"${sys.props("java.io.tmpdir")}/graft_orc_${math.abs(d.hashCode)}"
      part.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .filter(col("p_size") <= 20)
        .select(col("p_partkey"), col("p_name"), col("p_size"),
          round2(col("p_retailprice")).as("price"))
    }),

    // Multimodal: REAL audio path — a genuine 16-bit mono PCM WAV is
    // built per row (length/seed from doc_id), decoded with
    // javax.sound.sampled, decimated 4:1, re-encoded; the oracle
    // recomputes sample count, byte lengths, peak amplitude and energy
    // from the synthesis formula, so the codec round trip — not a
    // stub — is what's differentially checked.
    "multimodal_audio" -> ((s, d) => {
      val docs = tbl(s, d, "documents").select(col("doc_id"),
        (col("doc_id") % 400 + 50).cast("int").as("n"),
        lit(8000).as("rate"), col("doc_id").as("seed"))
      val withWav = Multimodal.withSyntheticWav(docs, "n", "rate", "seed")
      Multimodal.downsampleAudio(withWav, "payload", factor = 4)
        .select(col("doc_id"),
          length(col("payload")).cast("bigint").as("orig_len"),
          col("sample_rate"), col("n_samples"), col("peak_abs"),
          col("sum_sq"), col("ds_samples"), col("ds_len"))
    }),

    // External-tool pipe boundary (reference: skani/MMseqs2 subprocess
    // over FASTA, berdl/berdl/tools/skani.py:5-32, pangenome.py:116-152):
    // each partition streams as FASTA through a subprocess whose TSV
    // stdout parses back to typed rows — one tool instance PER
    // PARTITION, so 1000 executors run 1000 tool copies with no driver
    // funnel. The stand-in tool is awk computing per-record sequence
    // length + GC count (deterministic, so DuckDB can oracle it); a
    // real deployment swaps argv for the skani/mmseqs binary.
    "pipe_tool" -> ((s, d) => {
      val docs = tbl(s, d, "documents").select(
        concat(lit("doc_"), col("doc_id")).as("id"),
        upper(regexp_replace(col("text"), "[^A-Za-z]", "")).as("seq"))
      val out = StructType(Seq(
        StructField("id", StringType),
        StructField("seq_len", LongType),
        StructField("gc", LongType)))
      PipeTool.pipeFasta(docs, "id", "seq", Seq("awk", GcToolScript), out)
    }),

    // Streaming-shaped tumbling-window aggregation (batch equivalence;
    // the readStream path is exercised in StreamingSpec).
    "stream_window_counts" -> ((s, d) => {
      val ev = tbl(s, d, "events")
        .withColumn("ts", Lakehouse.eventTime(col("ts_us")))
      EventStream.windowedCounts(ev, "ts", "1 hour")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), round2(col("sum_value")).as("sum_value"))
    }),

    // Session windows per user (gaps-and-islands batch equivalent).
    "stream_sessionize" -> ((s, d) => {
      val ev = tbl(s, d, "events")
        .withColumn("ts", Lakehouse.eventTime(col("ts_us")))
      EventStream.sessionCounts(ev, "ts", "user_id", "30 minutes")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"))
    }),

    // Arbitrary stateful processing (flatMapGroupsWithState) — order-
    // insensitive per-key fold so the batch result is oracle-checkable.
    "stream_stateful_stats" -> ((s, d) => {
      EventStream.statefulUserStats(tbl(s, d, "events"))
        .toDF().select(col("user_id"), col("n_events"),
          round2(col("max_value")).as("max_value"))
    }),

    // Stream-stream interval join: attribute each purchase to every
    // click by the same user within the 12-hour lookback (the
    // watermark-evictable join shape; StreamingSpec runs the same
    // function over two memory streams with watermarks).
    "stream_attribution" -> ((s, d) => {
      val ev = tbl(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"),
        Lakehouse.eventTime(col("ts_us")).as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_us"),
        Lakehouse.eventTime(col("ts_us")).as("purchase_ts"))
      EventStream.intervalJoin(clicks, purchases, "user_id",
        "click_ts", "purchase_ts", "12 hours")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          expr("(purchase_us - click_us) div 1000000").as("lag_s"))
    }),

    // Stateful streaming dedup: first event per (user, type), later
    // duplicates suppressed by GroupState (StreamingSpec runs the same
    // function over a file-source stream).
    "stream_dedup" -> ((s, d) => {
      EventStream.firstSeen(tbl(s, d, "events"))
        .toDF().select(col("user_id"), col("event_type"),
          col("event_id"), col("ts_us"))
    }))

  /** The deterministic FASTA→TSV stand-in tool: per record, emit
    * `id<TAB>len(seq)<TAB>count(G|C)` (classic GC content). */
  private[queries] val GcToolScript: String =
    """function emit() { if (id != "") { l = length(s); n = gsub(/[GC]/, "", s); print id "\t" l "\t" n } }
      |/^>/ { emit(); id = substr($0, 2); s = ""; next }
      |{ s = s $0 }
      |END { emit() }""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_tool" ->
      """SELECT 'doc_' || doc_id AS id,
           length(seq) AS seq_len,
           length(seq) - length(regexp_replace(seq, '[GC]', '', 'g')) AS gc
         FROM (SELECT doc_id, upper(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS seq
               FROM documents) t""",
    "fasta_roundtrip" ->
      """SELECT 'doc_' || doc_id AS id, 'lang=' || lang AS description,
           upper(replace(text, ' ', '')) AS seq
         FROM documents""",
    "dirty_json_repair" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",
    "stream_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
         SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
                (p.us - c.us) // 1000000 AS lag_s
         FROM (SELECT * FROM e WHERE event_type = 'click') c
         JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND p.us >= c.us AND p.us <= c.us + 12::BIGINT * 3600000000""",
    "multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
           CAST(octet_length(encode(text)) * 3 % 640 + 16 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) * 7 % 480 + 16 AS INTEGER) AS height,
           3 AS channels
         FROM documents""",
    "multimodal_frames" ->
      """SELECT doc_id, unnest(generate_series(0, octet_length(encode(text)) // 100, 3)) AS frame_idx
         FROM documents""",
    "orc_roundtrip" ->
      """SELECT p_partkey, p_name, p_size,
           floor((p_retailprice) * 100 + 0.5) / 100 AS price
         FROM part WHERE p_size <= 20""",
    "multimodal_audio" ->
      """WITH s AS (
           SELECT doc_id, doc_id % 400 + 50 AS n FROM documents),
         idx AS (
           SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM s),
         v AS (
           SELECT doc_id, n, ((31 * i + doc_id) % 65536) - 32768 AS v FROM idx)
         SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT) AS orig_len,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS INTEGER) AS peak_abs,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST((n + 3) // 4 AS BIGINT) AS ds_samples,
           CAST(44 + 2 * ((n + 3) // 4) AS BIGINT) AS ds_len
         FROM v GROUP BY doc_id, n""",
    "s9_paged_source" ->
      """SELECT i AS id, CAST(i // 1000 AS INTEGER) AS page, md5(i::VARCHAR) AS payload
         FROM generate_series(0, 9999) t(i)""",
    "tsv_typed_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
           floor((s_acctbal) * 100 + 0.5) / 100 AS bal FROM supplier""",
    "multimodal_features" ->
      """SELECT doc_id, i,
           (('0x' || substring(md5(text || '#' || i), 1, 8))::BIGINT % 1000)::DOUBLE / 1000.0 AS value
         FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) t""",
    "multimodal_resize" ->
      """SELECT doc_id,
           CAST(54 + ((doc_id % 40 + 8) * 3 + 3) // 4 * 4 * (doc_id % 30 + 8) AS BIGINT) AS orig_len,
           CAST(doc_id % 40 + 8 AS INTEGER) AS width,
           CAST(doc_id % 30 + 8 AS INTEGER) AS height,
           3 AS channels,
           CAST((doc_id % 40 + 8) // 2 AS INTEGER) AS resized_width,
           CAST((doc_id % 30 + 8) // 2 AS INTEGER) AS resized_height,
           CAST(54 + (((doc_id % 40 + 8) // 2) * 3 + 3) // 4 * 4 * ((doc_id % 30 + 8) // 2) AS BIGINT) AS resized_len
         FROM documents""",
    "stream_window_counts" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
         FROM events GROUP BY 1, 2""",
    "stream_sessionize" ->
      """WITH m AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL '30 minutes' THEN 1 ELSE 0 END AS ns
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM m)
         SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, count(*) AS n
         FROM sess GROUP BY user_id, sid""",
    "stream_stateful_stats" ->
      """SELECT user_id, count(*) AS n_events,
           floor((max(value)) * 100 + 0.5) / 100 AS max_value
         FROM events GROUP BY user_id""",
    "stream_dedup" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
         FROM (
           SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS rn
           FROM events)
         WHERE rn = 1""")
}
