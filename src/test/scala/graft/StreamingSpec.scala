package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Streaming semantics of EventStream: the same transforms that pass
  * the batch oracle run here over an actual `readStream` (MemoryStream
  * source → memory sink), including watermark-bounded state and
  * incremental arrival across micro-batches.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates incrementally over readStream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "2 hours")

    val q = EventStream.windowedCounts(input, "ts", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.0),
        (ts("2024-01-01 00:40:00"), "click", 2.0),
        (ts("2024-01-01 01:10:00"), "click", 4.0))
      q.processAllAvailable()
      // late-but-in-watermark event lands in the first window
      mem.addData((ts("2024-01-01 00:50:00"), "click", 8.0))
      q.processAllAvailable()

      val rows = spark.table("win_counts")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"), col("sum_value"))
        .as[(String, Long, Double)].collect()
        .map { case (w, n, s) => w -> ((n, s)) }.toMap
      assert(rows("00:00") == ((3L, 11.0)))
      assert(rows("01:00") == ((1L, 4.0)))
    } finally q.stop()
  }

  test("intervalJoin pairs purchases with in-window clicks over two streams") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val l = clicks.toDF().toDF("user_id", "click_id", "click_ts")
      .withWatermark("click_ts", "1 hour")
    val r = purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts")
      .withWatermark("purchase_ts", "1 hour")

    val q = EventStream.intervalJoin(l, r, "user_id",
      "click_ts", "purchase_ts", "30 minutes")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, 10L, ts("2024-01-01 00:00:00")),
        (1L, 11L, ts("2024-01-01 00:20:00")),
        (2L, 12L, ts("2024-01-01 00:00:00")))
      purchases.addData((1L, 100L, ts("2024-01-01 00:25:00")))
      q.processAllAvailable()
      // second micro-batch: in-window for click 11 only; user 2 never buys
      purchases.addData((1L, 101L, ts("2024-01-01 00:45:00")))
      q.processAllAvailable()

      val got = spark.table("attrib").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 100L), (11L, 100L), (11L, 101L)))
    } finally q.stop()
  }

  test("sessionCounts merges events within the gap across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val input = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")

    val q = EventStream.sessionCounts(input, "ts", "user_id", "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData((ts("2024-01-01 09:00:00"), 7L), (ts("2024-01-01 09:20:00"), 7L))
      q.processAllAvailable()
      // 09:20 + 30min gap covers 09:45 → same session; 11:00 starts a new one
      mem.addData((ts("2024-01-01 09:45:00"), 7L), (ts("2024-01-01 11:00:00"), 7L))
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .select(date_format(col("session_start"), "HH:mm").as("s"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(rows == Map("09:00" -> 3L, "11:00" -> 1L))
    } finally q.stop()
  }

  test("statefulUserStats carries GroupState across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val input = mem.toDF().toDF("user_id", "value")

    val q = EventStream.statefulUserStats(input)
      .writeStream.format("memory").queryName("user_stats")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, 5.0), (1L, 9.0), (2L, 3.0))
      q.processAllAvailable()
      mem.addData((1L, 7.0)) // state must remember n=2, max=9.0
      q.processAllAvailable()

      val latest = spark.table("user_stats")
        .groupBy("user_id").agg(max("n_events").as("n"), max("max_value").as("mx"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(latest(1L) == ((3L, 9.0)))
      assert(latest(2L) == ((1L, 3.0)))
    } finally q.stop()
  }

  test("firstSeen suppresses duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val input = mem.toDF().toDF("event_id", "ts_us", "user_id", "event_type")

    val q = EventStream.firstSeen(input)
      .writeStream.format("memory").queryName("first_seen")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((10L, 100L, 1L, "click"), (11L, 50L, 1L, "click"),
        (12L, 200L, 2L, "view"))
      q.processAllAvailable()
      // same keys again, earlier ts: state already holds the winners, so
      // nothing new is emitted (streaming dedup = first ARRIVAL wins)
      mem.addData((13L, 10L, 1L, "click"), (14L, 20L, 2L, "view"),
        (15L, 30L, 3L, "click"))
      q.processAllAvailable()

      val rows = spark.table("first_seen")
        .as[(Long, Long, Long, String)].collect()
        .map(r => (r._3, r._4) -> r._1).toMap
      // batch 1: min (ts_us, event_id) per key; batch 2: only the new key
      assert(rows == Map((1L, "click") -> 11L, (2L, "view") -> 12L,
        (3L, "click") -> 15L))
    } finally q.stop()
  }

  test("streaming LSH screen matches the batch banded self-join") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Lakehouse.table(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"))
    val batchPairs = graft.operators.Dedup
      .lshCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, String)]
    val input = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamNearDup.candidatePairs(
      graft.streaming.StreamNearDup.bandRows(input, "doc_id", "text"))
      .writeStream.format("memory").queryName("stream_lsh")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String)].collect()
      val (evens, odds) = rows.partition(_._1 % 2 == 0)
      mem.addData(evens.toSeq: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("stream_lsh").count()
      mem.addData(odds.toSeq: _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_lsh")
        .as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      assert(streamed == batchPairs, "streamed candidates must equal batch")
      // cross-batch: the odd half found pairs against state from batch 1
      assert(afterFirst > 0 && streamed.size > afterFirst)
    } finally q.stop()
  }

  test("transformWithState LSH screen (RocksDB, v2 state) matches classic and batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Lakehouse.table(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"))
    val batchPairs = graft.operators.Dedup
      .lshCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String)]
    val input = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamNearDup.candidatePairsTws(
      graft.streaming.StreamNearDup.bandRows(input, "doc_id", "text"))
      .writeStream.format("memory").queryName("stream_lsh_tws")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = docs.as[(Long, String)].collect()
      val (evens, odds) = rows.partition(_._1 % 2 == 0)
      mem.addData(evens.toSeq: _*)
      q.processAllAvailable()
      val afterFirst = spark.table("stream_lsh_tws").count()
      mem.addData(odds.toSeq: _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_lsh_tws")
        .as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      assert(streamed == batchPairs,
        "v2-state streamed candidates must equal the batch banded join")
      // cross-batch pairing proves ListState persisted across batches
      assert(afterFirst > 0 && streamed.size > afterFirst)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("file-source stream (Trigger.AvailableNow) matches the batch result") {
    // The incremental-ingest shape at scale: the same windowedCounts
    // plan runs over a parquet directory as a bounded stream — several
    // micro-batches (maxFilesPerTrigger=1), then self-termination.
    import org.apache.spark.sql.streaming.Trigger
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Lakehouse.table(spark, sf, "events")
      .withColumn("ts", graft.core.Lakehouse.eventTime(col("ts_us")))
      .select(col("ts"), col("event_type"), col("value"))
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_files"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))
    ev.repartition(4).write.parquet(s"$base/in")

    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      .withWatermark("ts", "2 hours")
    val q = EventStream.windowedCounts(stream, "ts", "1 hour")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(180000), "AvailableNow must self-terminate")
      // round the double sum: incremental state accumulates in
      // micro-batch arrival order, so the last float bits may differ
      // from the batch plan's combine order
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window_start"), col("event_type"), col("n"),
          graft.queries.round2(col("sum_value")).as("sum_value"))
        .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2))
      val streamed = shape(spark.table("file_win"))
      val batch = shape(EventStream.windowedCounts(ev, "ts", "1 hour"))
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
      // genuinely incremental: more than one micro-batch carried rows
      assert(q.recentProgress.count(_.numInputRows > 0) > 1)
    } finally q.stop()
  }

  test("IncrementalRefresh rewrites only the touched partitions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val input = mem.toDF().toDF("clade_id", "genome_id")
    val base = s"${sys.props("java.io.tmpdir")}/graft_incr_refresh"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(base))

    val q = graft.streaming.IncrementalRefresh.partitionedUpsert(
      input, s"$base/table", "clade_id", s"$base/ckpt")
    try {
      mem.addData(("cA", "g1"), ("cB", "g2"))
      q.processAllAvailable()
      // second batch touches ONLY cA: cB's partition must survive as-is
      mem.addData(("cA", "g9"))
      q.processAllAvailable()

      val out = spark.read.parquet(s"$base/table")
        .as[(String, String)].collect().toSet
      assert(out == Set(("g9", "cA"), ("g2", "cB")))
    } finally q.stop()
  }

  test("transformWithState rolling z-score matches the batch window on an ordered feed") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Lakehouse.table(spark, sfSmoke, "events")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
    val batch = graft.operators.TimeSeries.rollingZScore(ev,
        Seq(col("user_id")), Seq(col("ts_us"), col("event_id")),
        col("value"), lookback = 8, minObs = 4)
      .select(col("event_id"), col("z")).as[(Long, Double)].collect().toMap

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val input = mem.toDF().toDF("user_id", "event_id", "ts_us", "value")
    val q = graft.streaming.StreamAnomaly.scores(input)
      .writeStream.format("memory").queryName("stream_z")
      .outputMode(OutputMode.Append()).start()
    try {
      // ordered replay, split across two micro-batches: per key, every
      // batch-1 event precedes every batch-2 event in event time
      val rows = ev.as[(Long, Long, Long, Double)].collect()
        .sortBy(r => (r._3, r._2))
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toSeq: _*); q.processAllAvailable()
      val afterFirst = spark.table("stream_z").count()
      mem.addData(h2.toSeq: _*); q.processAllAvailable()

      val streamed = spark.table("stream_z").select(col("event_id"), col("z"))
        .as[(Long, Double)].collect().toMap
      assert(streamed.keySet == batch.keySet,
        "streamed monitor must score exactly the batch-scorable events")
      val maxDiff = streamed.map { case (k, z) => math.abs(z - batch(k)) }.max
      assert(maxDiff < 1e-9, s"z-scores diverged from batch: $maxDiff")
      // ring state persisted across the micro-batch boundary
      assert(afterFirst > 0 && streamed.size > afterFirst)
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming KLL quantile monitor: exact below k, state survives batches") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 2 keys × 60 values each — far below k=200, so the per-key sketch
    // retains every value and the readout is EXACT (inclusive-rank
    // definition), comparable 1:1 against a local sort.
    val rows = (0 until 120).map(i => (i.toLong % 2, (i * 37 % 120).toDouble))
    def exactQ(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      s(math.ceil(q * s.length).toInt - 1)
    }
    val mem = MemoryStream[(Long, Double)]
    val q = graft.streaming.StreamQuantiles.quantiles(
      mem.toDF().toDF("key", "value"))
      .writeStream.format("memory").queryName("stream_kll")
      .outputMode(OutputMode.Append()).start()
    try {
      val (h1, h2) = rows.splitAt(60)
      mem.addData(h1: _*); q.processAllAvailable()
      val firstN = spark.table("stream_kll")
        .groupBy("key").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toMap
      mem.addData(h2: _*); q.processAllAvailable()
      // latest emission per key = the one with the largest n
      val last = spark.table("stream_kll")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("key")).orderBy(col("n").desc)))
        .filter(col("rk") === 1)
        .select("key", "n", "p50", "p95")
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      for ((key, vs) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
        val (n, p50, p95) = last(key)
        assert(n == vs.length, s"key $key must have folded all ${vs.length} values")
        assert(firstN(key) < n, "sketch state must carry across micro-batches")
        assert(p50 == exactQ(vs, 0.5), s"key $key p50 exact below k")
        assert(p95 == exactQ(vs, 0.95), s"key $key p95 exact below k")
      }
      // the streamed state interoperates with the batch cube contract:
      // same (key → quantile) answers as kll_sketch_agg over the same data
      org.apache.spark.sql.graftx.GraftExtensions.install(spark)
      val batch = rows.toDF("key", "value")
        .groupBy("key")
        .agg(expr("kll_quantile(kll_sketch_agg(value), 0.5)").as("p50"))
        .as[(Long, Double)].collect().toMap
      for ((key, (_, p50, _)) <- last)
        assert(batch(key) == p50, s"key $key: stream p50 must equal batch cube p50")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming KLL state unions into the batch sketch cube losslessly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graftx.KllSketch
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 3 keys × 80 values, half "historical batch", half "live stream";
    // total per key < k=200, so every sketch retains all values and the
    // unioned cube's quantiles are EXACT — comparable 1:1 to a sort.
    val rows = (0 until 240).map(i => (i.toLong % 3, (i * 53 % 240).toDouble))
    val (hist, live) = rows.splitAt(120)
    val mem = MemoryStream[(Long, Double)]
    val q = graft.streaming.StreamQuantiles.quantileSketches(
      mem.toDF().toDF("key", "value"))
      .writeStream.format("memory").queryName("stream_kll_export")
      .outputMode(OutputMode.Append()).start()
    try {
      val (l1, l2) = live.splitAt(60)
      mem.addData(l1: _*); q.processAllAvailable()
      mem.addData(l2: _*); q.processAllAvailable()
      // latest exported state per key = that key's full stream history
      val streamState = spark.table("stream_kll_export")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("key")).orderBy(col("n").desc)))
        .filter(col("rk") === 1).select("key", "sketch")
      val batchCube = hist.toDF("key", "value")
        .groupBy("key").agg(KllSketch.sketchAgg(col("value"), 200).as("sketch"))
      // the interop contract: stream bytes ∪ batch bytes rolls up by
      // kll_union_agg with NO rescan of either side
      val fused = batchCube.unionByName(streamState)
        .groupBy("key").agg(
          KllSketch.quantile(
            KllSketch.unionAgg(col("sketch"), 200), lit(0.5)).as("p50"),
          KllSketch.quantile(
            KllSketch.unionAgg(col("sketch"), 200), lit(0.95)).as("p95"))
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      def exactQ(vs: Seq[Double], p: Double): Double = {
        val s = vs.sorted; s(math.ceil(p * s.length).toInt - 1)
      }
      for ((key, kv) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
        assert(fused(key) == ((exactQ(kv, 0.5), exactQ(kv, 0.95))),
          s"key $key: unioned stream+batch cube must equal the exact readout")
      }
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming heavy hitters match the batch freq cube and carry state") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // key 1: 'hot' is 40% of the stream (clears the 12.5% floor by far
    // more than the sketch error), tail items are ~1% each; key 2: all
    // unique, no hitters. Well-separated -> deterministic output set.
    val rnd = new scala.util.Random(3)
    val k1 = (0 until 200).map(i =>
      (1L, if (i % 5 < 2) "hot" else s"tail${rnd.nextInt(60)}"))
    val k2 = (0 until 100).map(i => (2L, s"uniq$i"))
    val all = rnd.shuffle(k1 ++ k2)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamHeavyHitters.heavyHitters(
      mem.toDF().toDF("key", "item"), maxMapSize = 64, minFrac = 0.125)
      .writeStream.format("memory").queryName("stream_hh")
      .outputMode(OutputMode.Append()).start()
    try {
      val (h1, h2) = all.splitAt(all.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
      // final emission per key = rows carrying the largest n
      val last = spark.table("stream_hh")
        .withColumn("mx", max("n").over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("key"))))
        .filter(col("n") === col("mx"))
        .select("key", "item").as[(Long, String)].collect().toSet
      // batch reference: the SQL-registered cube on the same rows
      val batch = all.toDF("key", "item")
      batch.createOrReplaceTempView("hh_in")
      val want = spark.sql(
        """SELECT key, explode(freq_heavy_hitters(s,
             CAST(floor(freq_stream_length(s) * 0.125) AS BIGINT))) AS item
           FROM (SELECT key, freq_sketch_agg(item, 64) AS s
                 FROM hh_in GROUP BY key)""")
        .as[(Long, String)].collect().toSet
      assert(want.contains((1L, "hot")) && !want.exists(_._1 == 2L))
      assert(last == want,
        s"stream/batch heavy hitters diverged: stream=$last batch=$want")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming debounce == batch debounce on in-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val windowUs = 1000000L // 1 s
    // bursts: key a fires every 300 ms (collapses), key b every 1.5 s
    // (all survive); a same-timestamp pair exercises the id tiebreak
    val events = (0 until 20).map(i => ("a", i * 300000L, i.toLong)) ++
      (0 until 6).map(i => ("b", i * 1500000L, (100 + i).toLong)) ++
      Seq(("c", 0L, 200L), ("c", 0L, 201L), ("c", 2000000L, 202L))
    val batchKept = graft.operators.TimeSeries.debounce(
      events.toDF("key", "ts_us", "id"),
      Seq(col("key")), col("ts_us"), col("id"), windowUs)
      .select("id").as[Long].collect().toSet
    val mem = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StreamDebounce.debounce(
      mem.toDF().toDF("key", "ts_us", "id"), windowUs)
      .writeStream.format("memory").queryName("stream_debounce")
      .outputMode(OutputMode.Append()).start()
    try {
      // in ts order, split mid-burst so state must carry across batches
      val ordered = events.sortBy(e => (e._2, e._3))
      val (h1, h2) = ordered.splitAt(ordered.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      val afterFirst = spark.table("stream_debounce").count()
      mem.addData(h2: _*); q.processAllAvailable()
      val streamKept = spark.table("stream_debounce")
        .select("id").as[Long].collect().toSet
      assert(afterFirst > 0 && afterFirst < streamKept.size,
        "emission must span both micro-batches")
      assert(streamKept == batchKept,
        s"stream/batch debounce diverged: stream=$streamKept batch=$batchKept")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("observed expectations surface per micro-batch on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Expectations
    import graft.operators.Expectations.Expectation
    // the SAME suite the batch path runs (AnalyticsSpec) rides a
    // stream's micro-batch jobs and reads back via
    // StreamingQueryProgress.observedMetrics — zero-extra-scan DQ at
    // ingest time
    val checks = Seq(
      Expectation("text_complete", Expectations.completeness(col("text")),
        m => m >= 0.99),
      Expectation("rows", count(lit(1)).cast("double"), m => m > 0.0))
    val mem = MemoryStream[(Long, String)]
    val q = Expectations.observed(
      mem.toDF().toDF("doc_id", "text"), "stream_dq", checks)
      .writeStream.format("memory").queryName("stream_dq_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      mem.addData((3L, null.asInstanceOf[String])); q.processAllAvailable()
      val batches = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("stream_dq")))
        .map(row => Expectations.verdicts(
          row.getValuesMap[Any](row.schema.fieldNames), checks)
          .map { case (k, m, pass) => k -> ((m, pass)) }.toMap)
      assert(batches.size >= 2, "each micro-batch must carry its metrics")
      val clean = batches.find(_.apply("rows")._1 == 2.0).get
      val dirty = batches.find(_.apply("rows")._1 == 1.0).get
      assert(clean("text_complete") === ((1.0, true)))
      assert(dirty("text_complete") === ((0.0, false)),
        "the null-text batch must fail completeness IN ITS OWN BATCH")
    } finally q.stop()
  }

  test("StreamContamination matches the batch screen per arriving doc") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Lakehouse.table(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"))
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = graft.operators.Cleaning
      .contamination(train, eval, "doc_id", "text", n = 8)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.nonEmpty, "fixture must contain planted contamination")

    val rows = train.as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamContamination.screen(
      mem.toDF().toDF("doc_id", "text"), eval, "doc_id", "text", n = 8)
      .writeStream.format("memory").queryName("stream_contam")
      .outputMode(OutputMode.Update()).start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      val afterFirst = spark.table("stream_contam").count()
      mem.addData(h2: _*); q.processAllAvailable()
      val streamed = spark.table("stream_contam")
        .select("doc_id", "hits", "contamination")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(afterFirst > 0 && afterFirst < streamed.size,
        "verdicts must land in the arrival micro-batch of each half")
      assert(streamed == batch,
        s"stream/batch contamination diverged: stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("StreamDrift matches the batch chi-square report per closed window") {
    implicit val sqlCtx = spark.sqlContext
    // Reference: 50/30/20 over bins x/y/z.
    val ref = Seq(("x", 0.5), ("y", 0.3), ("z", 0.2)).toDF("bin", "p_ref")
    // Window 1 (10:00): 8 rows → x:4 y:2 z:2. Window 2 (11:00): 5 rows
    // → x:1 y:4 (z absent → no row, batch-report parity not asserted
    // for absent bins).
    val w1 = Seq.fill(4)("x") ++ Seq.fill(2)("y") ++ Seq.fill(2)("z")
    val w2 = Seq.fill(1)("x") ++ Seq.fill(4)("y")
    val rows =
      w1.zipWithIndex.map { case (b, i) => (ts(s"2024-01-01 10:00:${10 + i}"), b) } ++
      w2.zipWithIndex.map { case (b, i) => (ts(s"2024-01-01 11:00:${10 + i}"), b) }

    val mem = MemoryStream[(Timestamp, String)]
    val q = graft.streaming.StreamDrift.drift(
      mem.toDF().toDF("ts", "bin"), "ts", col("bin"), ref,
      windowDur = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("stream_drift")
      .outputMode(OutputMode.Append()).start()
    try {
      val (h1, h2) = rows.splitAt(6) // split inside window 1
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
      // sentinel far ahead: pushes the watermark past both windows so
      // append mode closes them (its own window never emits)
      mem.addData((ts("2024-01-02 09:00:00"), "x")); q.processAllAvailable()

      val got = spark.table("stream_drift")
        .select(col("window_start"), col("bin"), col("n_cur"),
          col("p_cur"), col("chi2_term"))
        .as[(Timestamp, String, Long, Double, Double)].collect()
        .map(r => (r._1.toString.take(13), r._2) -> ((r._3, r._4, r._5))).toMap
      // both windows closed, bucket rows correct
      assert(got.keySet === Set(
        ("2024-01-01 10", "x"), ("2024-01-01 10", "y"), ("2024-01-01 10", "z"),
        ("2024-01-01 11", "x"), ("2024-01-01 11", "y")))
      assert(got(("2024-01-01 10", "x")) === ((4L, 0.5, 0.0)))
      assert(got(("2024-01-01 11", "y")) ===
        ((4L, 0.8, (0.8 - 0.3) * (0.8 - 0.3) / 0.3)))
      // same terms as the batch report over the same window-1 slice
      val batch = graft.operators.Profiling.distributionDrift(
        (w1.map(b => (b, 1)) ++
         Seq("x", "x", "x", "x", "x", "y", "y", "y", "z", "z")
           .map(b => (b, 0))).toDF("b", "grp"),
        col("b"), col("grp"))
        .select(col("bin"), col("p_cur"), col("chi2_term"))
        .as[(String, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      for (b <- Seq("x", "y", "z"))
        assert(got(("2024-01-01 10", b))._2 === batch(b)._1,
          s"stream/batch p_cur diverged on $b")
    } finally q.stop()
  }
}
