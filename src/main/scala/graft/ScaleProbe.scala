package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Skew-headroom probe behind SCALE.md: a duplicate-heavy corpus (many
  * IDENTICAL documents) collapses every band of the dup set into ONE
  * LSH bucket, so the candidate self-join's pair space for that bucket
  * is O(hot²). Unsalted, that bucket's pair generation lands in a
  * single task; salted, it fans out over `salts` tasks. Total
  * wall-clock hides this behind the (already-parallel) downstream
  * distinct, so the probe reports the MAX TASK DURATION — the straggler
  * that determines stage latency on a real cluster.
  *
  * Run: sbt 'runMain graft.ScaleProbe [nDocs] [nHot]'
  */
object ScaleProbe {

  private object MaxTask extends SparkListener {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = t.taskInfo.duration
      var cur = max.get()
      while (d > cur && !max.compareAndSet(cur, d)) cur = max.get()
    }
    def reset(): Unit = max.set(0)
  }

  /** Per-STAGE task stats — MaxTask tells you a straggler exists,
    * this tells you WHICH exchange owns it (stage name + task
    * count/mean/max), which is the difference between salting the
    * right join key and guessing. */
  private object StageStats extends SparkListener {
    import org.apache.spark.scheduler.SparkListenerStageCompleted
    private val stats =
      scala.collection.concurrent.TrieMap[Int, (Long, Long, Long)]()
    private val names = scala.collection.concurrent.TrieMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = t.taskInfo.duration
      stats.updateWith(t.stageId) {
        case Some((n, tot, mx)) => Some((n + 1, tot + d, math.max(mx, d)))
        case None => Some((1L, d, d))
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      names.put(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'))
    def reset(): Unit = { stats.clear(); names.clear() }
    /** Listener events are delivered ASYNC — the timed action can
      * return while the longest task's end event is still queued,
      * which would understate exactly the straggler this listener
      * measures. The bus isn't publicly flushable, so wait until two
      * consecutive snapshots agree (settle ≤ ~2 s). */
    def quiesce(): Unit = {
      // best-effort: three consecutive stable 200 ms snapshots. A GC
      // pause longer than the window could still hide a tail event —
      // acceptable for a probe (the headline sec comes from the timer,
      // not the listener), noted so readers treat max_task as a floor.
      var prev = (stats.toMap, names.toMap)
      var stable = 0
      var i = 0
      while (i < 20 && stable < 3) {
        Thread.sleep(200)
        val cur = (stats.toMap, names.toMap)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        i += 1
      }
    }
    /** Top `top` stages by max task ms, one JSON line each. */
    def report(label: String, top: Int): Unit =
      stats.toSeq.sortBy(-_._2._3).take(top).foreach {
        case (sid, (n, tot, mx)) =>
          val nm = names.getOrElse(sid, "?").replace("\"", "'")
          println(f"""{"probe":"$label stage","stage":$sid,"name":"$nm","tasks":$n,"mean_ms":${tot / n},"max_ms":$mx}""")
      }
  }

  /** Per-JOB wall clock with job group/description — the round-16
    * optimization probe: multi-job operators (refined medians, power
    * iterations) hide their cost structure from a single end-to-end
    * timer; this says which JOB owns the seconds. Async-safe the same
    * way StageStats is (quiesce by stable snapshots). */
  private object JobTimes extends SparkListener {
    import org.apache.spark.scheduler.{SparkListenerJobStart, SparkListenerJobEnd}
    private val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    private val done =
      scala.collection.concurrent.TrieMap[Int, (Long, String, Int)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      starts.put(j.jobId, (System.nanoTime(), desc))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      starts.remove(j.jobId).foreach { case (t0, desc) =>
        done.put(j.jobId, ((System.nanoTime() - t0) / 1000000, desc, 0))
      }
    def reset(): Unit = { starts.clear(); done.clear() }
    def quiesce(): Unit = {
      var prev = done.toMap; var stable = 0; var i = 0
      while (i < 20 && stable < 3) {
        Thread.sleep(200)
        val cur = done.toMap
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        i += 1
      }
    }
    def report(label: String): Unit = {
      val js = done.toSeq.sortBy(_._1)
      js.foreach { case (id, (ms, desc, _)) =>
        val d = desc.replace("\"", "'").take(80)
        println(s"""{"probe":"$label job","job":$id,"ms":$ms,"desc":"$d"}""")
      }
      println(s"""{"probe":"$label jobs_total","n":${js.size},"sum_ms":${js.map(_._2._1).sum}}""")
    }
  }

  /** `runMain graft.ScaleProbe jobs16 <query> [query...]` — run each
    * named SparkEntry query on SPARK_GRAFT_SF_DIR (default sf0.1),
    * once untimed (JIT/codegen warm), then once timed with the per-job
    * and per-stage listeners, reporting where the wall clock goes. */
  private def jobs16(spark: SparkSession, names: Seq[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sparkContext.addSparkListener(JobTimes)
    spark.sparkContext.addSparkListener(StageStats)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm
      JobTimes.reset(); StageStats.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      JobTimes.quiesce(); StageStats.quiesce()
      println(f"""{"probe":"$name total","sec":$sec%.3f}""")
      JobTimes.report(name)
      StageStats.report(name, 12)
    }
  }

  /** `runMain graft.ScaleProbe replay3` — replicated-data headroom for
    * the round-3 operators (SCALE.md): sf0.1 documents x1 vs x4 with
    * shifted ids, min-of-2 warm timings per op. */
  private def replay3(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val x4 = (0 until 4).map(i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text")))
      .reduce(_ unionAll _).cache()
    x4.count()
    def time(label: String)(f: DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"$label","sec":${secs.min}%.2f}""")
    }
    for ((tag, d) <- Seq(("x1", docs), ("x4", x4))) {
      time(s"decontaminate $tag")(graft.operators.Cleaning.contamination(
        d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 8))
      time(s"strip_boilerplate $tag")(graft.operators.Cleaning.stripBoilerplate(
        d, "doc_id", "text", sep = " ", minDocFrac = 0.8))
      time(s"train_order $tag")(graft.operators.Packing.trainingOrder(
        d.select("doc_id"), "doc_id", "s42", 8))
      time(s"dedup_substring $tag")(
        Dedup.substringDupPairs(d, "doc_id", "text"))
      time(s"dedup_lsh_probe $tag")(Dedup.lshProbePairs(
        d.filter(col("doc_id") % 2 === 1),
        Dedup.lshIndexBands(d.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
        "doc_id", "text"))
      time(s"ml_quality_filter $tag")(d.select(col("doc_id"),
        graft.operators.ModelScoring.hashedTextScore(col("text")).as("s")))
    }
  }

  /** `runMain graft.ScaleProbe winnow5` — the rolling-hash winnowing
    * expression vs the md5 window-frame formulation it replaced
    * (SCALE.md round 5): sf0.1 documents x1 vs x4 (shifted ids),
    * min-of-2 warm, counting the (id, fp) output. The expression path
    * is a map-side projection (one O(len) scan per doc, no shuffle);
    * the md5 path pays O(len) digests per doc plus a full corpus
    * exchange for the per-doc sliding-min window. */
  private def winnow5(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val x4 = (0 until 4).map(i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text")))
      .reduce(_ unionAll _).cache()
    x4.count()
    def time(label: String)(f: DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"$label","sec":${secs.min}%.2f}""")
    }
    for ((tag, d) <- Seq(("x1", docs), ("x4", x4))) {
      time(s"winnow rolling-expr $tag")(
        Dedup.winnowFingerprints(d, "doc_id", "text", 20, 10))
      time(s"winnow md5-window $tag")(
        Dedup.winnowFingerprintsMd5(d, "doc_id", "text", 20, 10))
    }
  }

  /** `runMain graft.ScaleProbe bloom5` — the Bloom decontamination
    * screen (SCALE.md round 5): sf0.1 documents x4, eval split = every
    * 10th doc. Reports the screen's selectivity (corpus grams in vs
    * grams surviving into the exact join) and wall time of the
    * broadcast-exact path vs the Bloom path, at two sketch sizes. The
    * local corpus is small enough that broadcast wins on wall clock —
    * the point here is the measured row reduction into the wide join,
    * which is what survives when the eval side outgrows a broadcast. */
  private def bloom5(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import graft.operators.Cleaning
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val x4 = (0 until 4).map(i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text")))
      .reduce(_ unionAll _).cache()
    x4.count()
    val train = x4.filter(col("doc_id") % 10 =!= 0)
    val evalS = x4.filter(col("doc_id") % 10 === 0)
    val totalGrams = train
      .withColumn("__toks", split(trim(col("text")), "\\s+"))
      .select(explode(Cleaning.wordGramsOf(col("__toks"), 8)).as("gram"))
      .count()
    def time(label: String)(f: DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"$label","sec":${secs.min}%.2f}""")
    }
    println(s"""{"probe":"corpus grams into exact join (broadcast path)","rows":$totalGrams}""")
    for (bits <- Seq(1L << 20, 1L << 23)) {
      val evalGrams = evalS
        .withColumn("__toks", split(trim(col("text")), "\\s+"))
        .select(explode(Cleaning.wordGramsOf(col("__toks"), 8)).as("gram")).distinct()
      val bf = evalGrams.agg(org.apache.spark.sql.graftx.BloomScreen
        .bloomAgg(col("gram"), 1L << 20, bits).as("bf")).head.getAs[Array[Byte]](0)
      val screened = train
        .withColumn("__toks", split(trim(col("text")), "\\s+"))
        .select(explode(Cleaning.wordGramsOf(col("__toks"), 8)).as("gram"))
        .filter(org.apache.spark.sql.graftx.BloomScreen.mightContain(bf, col("gram")))
        .count()
      println(s"""{"probe":"grams surviving the ${bits / 8 / 1024}KiB screen","rows":$screened}""")
    }
    time("contamination broadcast-exact x4")(
      Cleaning.contamination(train, evalS, "doc_id", "text", n = 8))
    time("contamination bloom-screened x4")(
      Cleaning.contaminationBloom(train, evalS, "doc_id", "text", n = 8,
        expectedGrams = 1L << 20, numBits = 1L << 23))
  }

  /** `runMain graft.ScaleProbe linkage5` — blocking-key selectivity for
    * the fuzzy record-linkage join (SCALE.md round 5c): a synthetic
    * customer roster at 15k (sf0.1-sized) and 60k (x4), corrupted like
    * the `link_fuzzy` fixture, linked with (a) the selective last-4/
    * last-3 suffix keys and (b) the rejected prefix+last-char key.
    * Suffix blocks hold |corpus|/10^k rows, so candidates — and wall
    * time — grow LINEARLY with the roster; the prefix key's 10 giant
    * blocks make candidates quadratic, which is why it was cut. */
  private def linkage5(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import graft.operators.RecordLinkage
    def roster(n: Long): DataFrame =
      spark.range(n).select(col("id").as("c_custkey"),
        concat(lit("Customer#"),
          lpad(col("id").cast("string"), 9, "0")).as("c_name"))
    def dirtyOf(clean: DataFrame): DataFrame = clean.select(
      col("c_custkey").as("dirty_id"),
      when(col("c_custkey") % 3 === 0,
        concat(substring(col("c_name"), 1, 9), lit("X"),
          substring(col("c_name"), 11, 8)))
        .when(col("c_custkey") % 3 === 1,
          concat(substring(col("c_name"), 1, 10),
            substring(col("c_name"), 12, 7)))
        .otherwise(col("c_name")).as("dirty_name"))
    val suffixKeys = Seq(
      (substring(col("dirty_name"), -4, 4), substring(col("c_name"), -4, 4)),
      (substring(col("dirty_name"), -3, 3), substring(col("c_name"), -3, 3)))
    val prefixKey = Seq(
      (concat(substring(col("dirty_name"), 1, 9), substring(col("dirty_name"), -1, 1)),
        concat(substring(col("c_name"), 1, 9), substring(col("c_name"), -1, 1))))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f}""")
    }
    for ((tag, n) <- Seq(("x1", 6000L), ("x4", 24000L))) {
      val clean = roster(n).cache(); clean.count()
      val dirty = dirtyOf(clean).cache(); dirty.count()
      time(s"suffix-blocked resolve $tag") {
        RecordLinkage.bestMatch(
          RecordLinkage.candidates(dirty, clean, col("dirty_name"),
            col("c_name"), suffixKeys, maxDist = 1),
          col("dirty_id"), Seq(col("c_custkey"))).count()
      }
      time(s"prefix-blocked candidates $tag") {
        RecordLinkage.candidates(dirty, clean, col("dirty_name"),
          col("c_name"), prefixKey, maxDist = 1).count()
      }
      clean.unpersist(); dirty.unpersist()
    }
  }

  /** `runMain graft.ScaleProbe sketch5` — the mergeable-cube contract
    * (SCALE.md round 5): 20M rows / 5M distinct users over 365 day
    * buckets. Answering a coarser grain (monthly distinct) EXACTLY
    * reshuffles the raw ids every time; the persisted daily sketch cube
    * answers the same question from 365 fixed-size sketch rows. Prints
    * build/query wall times and the worst relative error. */
  private def sketch5(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import graft.operators.Sketches
    val rows = spark.range(0, 20000000L)
      .select((col("id") % 5000000L).as("user"),
        pmod(hash(col("id")), lit(365)).as("day"))
      .withColumn("month", col("day") % 12)
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f}""")
    }
    var cube: DataFrame = null
    time("build daily sketch cube (one pass, sketches combine map-side)") {
      cube = Sketches.distinctSketch(rows,
        Seq(col("month"), col("day")), col("user"), 14).localCheckpoint()
      cube.count()
    }
    time("exact monthly distinct from raw (reshuffles 20M ids)") {
      rows.groupBy(col("month"))
        .agg(countDistinct(col("user")).as("n")).count()
    }
    time("monthly distinct from cube (365 sketch rows, no raw rescan)") {
      Sketches.rollupEstimate(cube, Seq(col("month"))).count()
    }
    val worst = Sketches.rollupEstimate(cube, Seq(col("month")))
      .join(rows.groupBy(col("month"))
        .agg(countDistinct(col("user")).as("n_exact")), Seq("month"))
      .select(max(abs(col("estimate") - col("n_exact")) /
        col("n_exact").cast("double")).as("err"))
      .head.getDouble(0)
    println(f"""{"probe":"worst monthly relative error","err":$worst%.4f}""")
  }

  /** `runMain graft.ScaleProbe ivf6` — the production-shaped quantizer
    * (SCALE.md round 6): 500k synthetic 64-dim vectors, a 256-cell IVF
    * coarse quantizer and an 8×256-code PQ fit/encode. The r5
    * literal/field codebook form shipped O(k·dim) doubles in every task
    * binary ("Broadcasting large task binary" warnings at 8 cells
    * already — ~130 KiB per task at 256×64, 2 MiB at 4096×64); the
    * broadcast [[org.apache.spark.sql.graftx.CentroidBook]] ships the
    * matrix once per executor. The probe captures Spark WARNs and fails
    * loudly if any task-binary or codegen-fallback warning fires. */
  private def ivf6(spark: SparkSession): Unit = {
    import graft.operators.Similarity
    // WARN capture: appender attached AFTER Spark initialized the
    // log4j2 config (initializing log4j first would install a default
    // config that suppresses Spark's WARNs everywhere).
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "ivf6Capture", null, null, false, Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("large task binary") || m.toLowerCase.contains("codegen") ||
          m.contains("64 KB") || m.contains("JIT"))
          captured.add(s"${e.getLevel} $m")
      }
    }
    app.start()
    org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].addAppender(app)

    val dim = 64
    val vecs = spark.range(500000L).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        (pmod(hash(col("id") * 31 + lit(i)), lit(997)).cast("double") / 499.0
          - 1.0)): _*).as("embedding"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f}""")
    }
    var centroids: Seq[(Long, Seq[Double])] = null
    time("kmeans fit k=256 dim=64 (1-in-50 sample, 1 iter)") {
      centroids = Similarity.kmeansFit(vecs, "vec_id", "embedding",
        k = 256, iters = 1, trainSampleMod = 50)
      centroids.size.toLong
    }
    time("assign 500k rows to 256 cells (broadcast codebook projection)") {
      val bc = spark.sparkContext.broadcast(
        org.apache.spark.sql.graftx.CentroidBook(centroids))
      vecs.select(org.apache.spark.sql.graftx.ArrayNumeric
        .nearestCentroid(col("embedding"), bc, l2 = false).as("cell"))
        .groupBy("cell").count().count()
    }
    time("pq fit+encode m=8 ksub=256 (1-in-50 sample, 1 iter)") {
      val books = Similarity.pqFit(vecs, "vec_id", "embedding",
        m = 8, subDim = 8, ksub = 256, iters = 1, trainSampleMod = 50)
      Similarity.pqEncode(vecs, "vec_id", "embedding", books, 8).count()
    }
    val warns = captured.toArray(Array.empty[String])
    println(s"""{"probe":"task-binary / codegen warnings","count":${warns.length}}""")
    warns.take(5).foreach(w => println(s"  WARN-CAPTURED: $w"))
    require(warns.isEmpty,
      s"production-shaped quantizer fired ${warns.length} task-binary/codegen warnings")
  }

  /** `runMain graft.ScaleProbe merge4` — the size-gated MERGE feed
    * (SCALE.md round 4): a change-feed-sized update broadcasts, a
    * backfill-sized one must degrade to a shuffle join and still
    * complete. Prints the plan's build strategy + wall time per case. */
  private def merge4(spark: SparkSession): Unit = {
    // 20M-row synthetic base: only the feed's KEY projection is ever
    // broadcast, so the gate trips only when the key set itself is
    // big — a 10M-key backfill (~80 MB estimate), not a 20k-key
    // change feed (~160 KB).
    val base = spark.range(20000000L).select(col("id").as("k"),
      (col("id") % 97).cast("double").as("v"))
    def probe(label: String, mod: Int): Unit = {
      // round-trip the feed through parquet: it arrives as its own
      // source with REAL file-size stats, like a genuine change feed
      // (a filter of the base would inherit the base's estimate — no
      // CBO — and a localCheckpoint RDD reports the default size;
      // both would always trip the gate)
      val path = s"${sys.props("java.io.tmpdir")}/graft_merge4_feed_$mod"
      base.filter(col("k") % mod === 0)
        .withColumn("v", col("v") * 1.1)
        .write.mode("overwrite").parquet(path)
      val feed = spark.read.parquet(path)
      val merged = graft.operators.Merge.upsert(base, feed, Seq("k"))
      val broadcast = merged.queryExecution.executedPlan.toString
        .contains("BroadcastExchange")
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        merged.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"probe":"$label","broadcast":$broadcast,"sec":${secs.min}%.2f}""")
    }
    probe("upsert feed 1/1000 (change feed)", 1000)
    probe("upsert feed 1/2 (backfill)", 2)
  }

  /** `runMain graft.ScaleProbe quota7` — perKeyCap skew defense
    * (SCALE.md round 7): 20M rows where ONE key holds 50% of the
    * corpus (the hot-domain worst case of "cap docs per domain").
    * Reported: wall + max single task for the salted two-phase vs the
    * single-window plan, and set equality between the two. */
  private def quota7(spark: SparkSession): Unit = {
    import graft.operators.Sampling
    spark.sparkContext.addSparkListener(MaxTask)
    val rows = spark.range(0, 20000000L).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, lit("hot.example.com"))
        .otherwise(concat(lit("d"), pmod(col("id"), lit(100000)).cast("string")))
        .as("domain"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    time("perKeyCap cap=50 salts=1 (single window: hot key on one task)") {
      Sampling.perKeyCap(rows, "domain", "doc_id", 50, salts = 1).count()
    }
    time("perKeyCap cap=50 salts=32 (two-phase: hot key bounded at cap*salts)") {
      Sampling.perKeyCap(rows, "domain", "doc_id", 50, salts = 32).count()
    }
    val a = Sampling.perKeyCap(rows, "domain", "doc_id", 50, salts = 1)
    val b = Sampling.perKeyCap(rows, "domain", "doc_id", 50, salts = 32)
    println(s"""{"probe":"salted == unsalted set","equal":${
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty}}""")
  }

  /** `runMain graft.ScaleProbe pipe7` — external-tool pipe throughput
    * (SCALE.md round 7): 200k FASTA records through one awk process per
    * partition. The per-partition process count and rows/sec show the
    * boundary's scaling shape: spawn cost amortizes over the partition,
    * throughput scales with partitions (≈ executor slots at 100 TB). */
  private def pipe7(spark: SparkSession): Unit = {
    import graft.operators.PipeTool
    import org.apache.spark.sql.types._
    val docs = spark.range(0, 200000L).select(
      concat(lit("s"), col("id").cast("string")).as("id"),
      concat_ws("", (0 until 8).map(i =>
        md5(concat(col("id").cast("string"), lit(s"#$i")))): _*).as("seq"))
      .localCheckpoint()
    val out = StructType(Seq(StructField("id", StringType),
      StructField("seq_len", LongType), StructField("gc", LongType)))
    val tool = Seq("awk",
      """function emit() { if (id != "") { l = length(s); n = gsub(/[GC]/, "", s); print id "\t" l "\t" n } }
        |/^>/ { emit(); id = substr($0, 2); s = ""; next }
        |{ s = s $0 }
        |END { emit() }""".stripMargin)
    for (parts <- Seq(1, 8, 32)) {
      val in = docs.repartition(parts)
      val t0 = System.nanoTime()
      val n = PipeTool.pipeFasta(in, "id", "seq", tool, out)
        .queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"pipeFasta 200k recs, $parts process(es)","rows":$n,"sec":$s%.2f,"rows_per_sec":${n / s}%.0f}""")
    }
  }

  /** `runMain graft.ScaleProbe freq7` — frequent-items cube (SCALE.md
    * round 7): 20M skewed tokens, 256 buckets; per-bucket fixed-size
    * summaries vs the exact groupBy. The cube's shuffle carries one
    * summary per bucket×partition; the exact path reshuffles 20M
    * tokens for every grain asked. */
  private def freq7(spark: SparkSession): Unit = {
    import graft.operators.Sketches
    import org.apache.spark.sql.DataFrame
    val rows = spark.range(0, 20000000L).select(
      pmod(hash(col("id")), lit(256)).as("bucket"),
      when(pmod(col("id"), lit(5)) < 2,
        concat(lit("hot_"), pmod(col("id"), lit(4)).cast("string")))
        .otherwise(concat(lit("c"), pmod(col("id"), lit(1000003)).cast("string")))
        .as("item"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f}""")
    }
    var cube: DataFrame = null
    time("build per-bucket freq sketches (one pass, fixed-size summaries)") {
      cube = Sketches.freqSketch(rows, Seq(col("bucket")), col("item"), 256)
        .localCheckpoint()
      cube.count()
    }
    time("exact global heavy hitters from raw (reshuffles 20M tokens)") {
      val t = rows.count()
      rows.groupBy(col("item")).count()
        .filter(col("count") >= (t * 0.07).toLong).count()
    }
    time("global heavy hitters from cube (256 sketch rows, no rescan)") {
      Sketches.rollupHeavyHitters(cube, Seq.empty, minFraction = 0.07, 256)
        .select(explode(col("heavy"))).count()
    }
    val got = Sketches.rollupHeavyHitters(cube, Seq.empty, minFraction = 0.07, 256)
      .select(explode(col("heavy")).as("item"))
      .collect().map(_.getString(0)).toSeq
    println(s"""{"probe":"heavy set","items":"${got.mkString(",")}"}""")
  }

  /** `runMain graft.ScaleProbe serve8` — serving-layer skew headroom
    * (SCALE.md round 8): the TableScanner DSL driven on a 90%-hot
    * grouping column and a global search, sf0.1 lineitem/documents
    * replicated ×4. The DSL compiles to a partial-agg groupBy (the hot
    * key combines map-side — the exchange carries one partial state per
    * partition, not 90% of the rows) and a map-side OR-filter scan, so
    * the MAX TASK should grow with partition size, never with key
    * popularity. That max task is the stage-latency number a 1000-
    * executor serving tier cares about. */
  private def serve8(spark: SparkSession): Unit = {
    import graft.serve.{Aggregation, ScanRequest, TableScanner}
    spark.sparkContext.addSparkListener(MaxTask)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("grp",
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit("hot"))
          .otherwise(concat(lit("g"), pmod(col("l_orderkey"), lit(100000)).cast("string"))))
      .localCheckpoint()
    val nLi = li.count()
    val li4 = (0 until 4).map(i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10L * nLi)))
      .reduce(_ unionAll _).localCheckpoint()
    li4.count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint()
    val nDocs = docs.count()
    val docs4 = (0 until 4).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * nDocs)))
      .reduce(_ unionAll _).localCheckpoint()
    docs4.count()
    def time(label: String)(f: => Long): Unit = {
      val secs = (1 to 2).map { _ =>
        MaxTask.reset()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, MaxTask.max.get() / 1000.0, n)
      }
      val best = secs.minBy(_._1)
      println(f"""{"probe":"$label","rows":${best._3},"sec":${best._1}%.2f,"max_task_sec":${best._2}%.2f}""")
    }
    val groupReq = ScanRequest(table = "lineitem",
      groupBy = Seq("grp"),
      aggregations = Seq(
        Aggregation("count", "l_orderkey", "n"),
        Aggregation("sum", "l_extendedprice", "rev"),
        Aggregation("avg", "l_quantity", "avg_qty")))
    for ((tag, d) <- Seq(("x1", li), ("x4", li4)))
      time(s"DSL group_by on 90%-hot key $tag") {
        TableScanner.scan(d, groupReq).queryExecution.toRdd.count()
      }
    val searchReq = ScanRequest(table = "documents",
      searchValue = Some("customer query"))
    for ((tag, d) <- Seq(("x1", docs), ("x4", docs4)))
      time(s"DSL global search (all-column contains) $tag") {
        TableScanner.scan(d, searchReq).queryExecution.toRdd.count()
      }
  }

  /** `runMain graft.ScaleProbe outlier8` — the robust-outlier report's
    * exact vs sketch path (SCALE.md rounds 8/10) on a HIGH-CARDINALITY
    * continuous column (every value distinct — the worst case for any
    * per-group value map or sort): 20M rows, 8 groups. Round 8's exact
    * path (counts-map percentile) OOM'd the 8g heap on the 20M input;
    * round 10's adaptive exact path (HLL stats pass picks histogram
    * refinement above the distinct budget — bounded bin state, no
    * per-group value map) survives it — the `exact20` flag that used
    * to reproduce the crash now records that survival. The sketch
    * path is one scan
    * carrying a fixed-size KLL per group. Reported: wall, max task,
    * and the sketch's relative error on each group's median/MAD. */
  private def outlier8(spark: SparkSession, exact20: Boolean): Unit = {
    import graft.operators.Profiling
    spark.sparkContext.addSparkListener(MaxTask)
    // skewed lognormal-ish continuous values, all distinct
    val rows = spark.range(0, 20000000L).select(
      col("id"),
      pmod(col("id"), lit(8)).as("grp"),
      (exp((pmod(hash(col("id")), lit(1000000)).cast("double") / 250000.0))
        * (col("id").cast("double") / 1e12 + 1.0)).as("v"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    // Round 8's counts-map exact path did NOT survive this input at
    // the default 8g heap (2.5M distinct per group × per-task partial
    // counts-maps → JVM OOM, sbt runner exit 52). The round-10
    // adaptive exact path routes the same input through histogram
    // refinement (bounded bin state, no per-group value map) and
    // completes — `exact20` records that survival where it used to
    // reproduce the crash.
    if (exact20) {
      time("exact robustOutliers 20M distinct (r8 counts-map OOM'd; adaptive refined path survives)") {
        Profiling.robustOutliers(rows, col("grp"), col("v")).count()
      }
      return
    }
    time("sketch robustOutliersSketch 20M distinct (1 scan, KLL per group)") {
      Profiling.robustOutliersSketch(rows, col("grp"), col("v")).count()
    }
    val small = rows.filter(col("id") % 10 === 0).localCheckpoint()
    time("exact robustOutliers 2M distinct (counts-map percentile path)") {
      Profiling.robustOutliers(small, col("grp"), col("v")).count()
    }
    time("sketch robustOutliersSketch 2M distinct") {
      Profiling.robustOutliersSketch(small, col("grp"), col("v")).count()
    }
    val e = Profiling.robustOutliers(small, col("grp"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val a = Profiling.robustOutliersSketch(small, col("grp"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val medErr = e.keys.map(g => math.abs(a(g)._1 - e(g)._1) / e(g)._1).max
    val madErr = e.keys.map(g => math.abs(a(g)._2 - e(g)._2) / e(g)._2).max
    println(f"""{"probe":"sketch relative error at 2M","max_med_err":$medErr%.4f,"max_mad_err":$madErr%.4f}""")
  }

  /** `runMain graft.ScaleProbe budget8` — token-budget selection's
    * hierarchical cumsum vs the naive global window (SCALE.md round
    * 8) on 20M scored rows with 4 quality levels. The naive form
    * funnels every row through ONE window task; the hierarchical form
    * bounds the per-task frame at the largest (score, jitter) bin
    * (~n / 4·10⁴). Both produce the identical kept set (pinned by
    * PropertySpec); this probe pins the max-task gap. */
  private def budget8(spark: SparkSession): Unit = {
    import graft.operators.{Relational, Sampling}
    import org.apache.spark.sql.expressions.Window
    spark.sparkContext.addSparkListener(MaxTask)
    val rows = spark.range(0, 20000000L).select(
      col("id"),
      (pmod(hash(col("id")), lit(4)).cast("double") / 3.0).as("score"),
      (pmod(hash(col("id") + 7), lit(50)) + 1).cast("long").as("tok"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    time("token budget hierarchical cumsum 20M") {
      Sampling.tokenBudgetSelect(rows, "id", "score", "tok", 0.25)
        .queryExecution.toRdd.count()
    }
    time("token budget naive global window 20M") {
      val budget = rows.agg(floor(sum(col("tok")) * 0.25).cast("long"))
        .head.getLong(0)
      val w = Window.partitionBy(Relational.singlePartitionKey())
        .orderBy(col("score").desc, Sampling.keepHash(col("id")).asc,
          col("id").asc)
      rows.withColumn("cum", sum(col("tok")).over(w))
        .filter(col("cum") <= budget)
        .queryExecution.toRdd.count()
    }
  }

  /** `runMain graft.ScaleProbe ids8` — contiguous-id assignment at 20M
    * rows: the range-partition + local-index decomposition
    * (Relational.contiguousIds) vs the naive global `row_number()`
    * window. Total wall-clock AND max task duration: the naive form's
    * single-partition window concentrates ALL rows in one task, which
    * is the number that explodes on a cluster. */
  private def ids8(spark: SparkSession): Unit = {
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    spark.sparkContext.addSparkListener(MaxTask)
    // scrambled layout: ids are assigned by a hashed sort key
    val rows = spark.range(0, 20000000L).select(
      col("id"), hash(col("id")).as("k"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    time("contiguous ids range+local-index 20M") {
      Relational.contiguousIds(rows, Seq(col("k"), col("id")), "seq")
        .queryExecution.toRdd.count()
    }
    time("contiguous ids naive global window 20M") {
      val w = Window.partitionBy(Relational.singlePartitionKey())
        .orderBy(col("k"), col("id"))
      rows.withColumn("seq", row_number().over(w).cast("long") - 1)
        .queryExecution.toRdd.count()
    }
  }

  /** `runMain graft.ScaleProbe aqe8` — the §7.4 "1B-row junction join"
    * rule demonstrated: a 90%-one-key fact joined to a dim by
    * sort-merge, with AQE skew-join OFF vs ON. The skewed partition is
    * one task without AQE; with it, AQE splits the oversized partition
    * at runtime (plan shows `skew=true`) and the max task drops. */
  private def aqe8(spark: SparkSession): Unit = {
    spark.sparkContext.addSparkListener(MaxTask)
    // thresholds scaled down so the local fixture trips the same code
    // path a 256MB-partition cluster job would
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val fact = spark.range(0, 20000000L).select(
      // 90% of rows on key 0; the rest spread over 1000 keys
      when(col("id") % 10 === 0, pmod(col("id"), lit(1000))).otherwise(0L).as("k"),
      col("id").as("v")).localCheckpoint()
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("w")).localCheckpoint()
    def time(label: String, skewOn: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      MaxTask.reset()
      // no agg on the join key downstream: a same-key consumer would
      // force AQE to keep the join's partitioning and suppress the
      // skew split (the real junction join feeds key-free writes)
      val j = fact.join(dim.hint("merge"), Seq("k"))
        .select((col("v") + col("w")).as("o"))
      val t0 = System.nanoTime()
      val n = j.queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      val skewed = j.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f,"skew_split":$skewed}""")
    }
    time("junction join skewJoin OFF 20M (90% one key)", skewOn = false)
    time("junction join skewJoin ON 20M", skewOn = true)
  }

  /** `runMain graft.ScaleProbe prefix8` — weighted ordered prefix sum
    * (the pack_context_windows backbone) at 20M rows vs the naive
    * global running-sum window. Unlike ids8's pure projection, the
    * running sum needs the per-partition window (one pid-hash
    * exchange) — the probe shows that still beats the global window's
    * single task by an order of magnitude. */
  private def prefix8(spark: SparkSession): Unit = {
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    spark.sparkContext.addSparkListener(MaxTask)
    val rows = spark.range(0, 20000000L).select(
      col("id"), hash(col("id")).as("k"),
      (pmod(col("id") * 7, lit(50)) + 1).as("w"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    time("ordered prefix sum range+pid-window 20M") {
      Relational.orderedPrefixSum(rows, Seq(col("k"), col("id")), col("w"), "cum")
        .queryExecution.toRdd.count()
    }
    time("ordered prefix sum naive global window 20M") {
      val wn = Window.partitionBy(Relational.singlePartitionKey())
        .orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rows.withColumn("cum", sum(col("w")).over(wn))
        .queryExecution.toRdd.count()
    }
  }

  private object ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      bytes.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
    def reset(): Unit = bytes.set(0)
  }

  /** `runMain graft.ScaleProbe rtfilter8` — runtime (bloom) row-filter
    * demonstration: a 20M fact joined to a 1%-selective dim by
    * sort-merge; with the injected bloom filter the fact side is
    * pre-filtered BEFORE its shuffle, so shuffle-read bytes collapse.
    * This is the optimizer feature that replaces hand-written semi-join
    * reductions at 100 TB. */
  private def rtfilter8(spark: SparkSession): Unit = {
    spark.sparkContext.addSparkListener(ShuffleBytes)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val fact = spark.range(0, 20000000L).select(
      pmod(col("id"), lit(1000000L)).as("k"),
      (col("id") * 3).as("v")).localCheckpoint()
    val dim = spark.range(0, 1000000L).select(col("id").as("k"),
      pmod(hash(col("id")), lit(100)).as("tag")).localCheckpoint()
    def time(label: String, bloomOn: Boolean): Unit = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        bloomOn.toString)
      ShuffleBytes.reset()
      val j = fact.join(dim.filter(col("tag") === 0), Seq("k"))
        .select((col("v") + col("tag")).as("o"))
      val t0 = System.nanoTime()
      val n = j.queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      val hasBloom = j.queryExecution.executedPlan.toString
        .contains("might_contain")
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"shuffle_mb":${ShuffleBytes.bytes.get() / 1048576.0}%.1f,"bloom":$hasBloom}""")
    }
    time("runtime filter OFF 20M fact, 1-pct dim", bloomOn = false)
    time("runtime filter ON 20M fact, 1-pct dim", bloomOn = true)
  }

  /** `runMain graft.ScaleProbe sparse9` — the sparse-similarity-join
    * fan-out probe behind the round-9 df-cap fix. A 100k-doc corpus
    * where every doc is 30 unique hex chars (df≈1 grams) plus one of
    * 64 shared 5-char motifs (df≈1560 — just under the 2% fractional
    * cap, the pathological "allowed stop-gram"): the frac-cap form's
    * posting self-join emits C(df,2) tuples PER MOTIF (~78M here, and
    * growing QUADRATICALLY with corpus size since the cap is a
    * fraction), while the scalable form's prefix filter sees the motif
    * as each doc's highest-df (last-ordered) term — outside every
    * prefix — so its candidate set collapses to the df≈1 head and is
    * bounded regardless of corpus size. Reports candidate-tuple
    * counts, wall-clock, and max task for both full queries. */
  private def sparse9(spark: SparkSession): Unit = {
    import graft.operators.TfIdf
    import org.apache.spark.sql.DataFrame
    spark.sparkContext.addSparkListener(MaxTask)
    val nDocs = 100000L
    val motifs = 64
    // text = md5-derived 30-char unique run + shared 5-char motif
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat(substring(md5(col("id").cast("string")), 1, 30),
        substring(md5(pmod(col("id"), lit(motifs)).cast("string")), 1, 5))
        .as("text"))
      .localCheckpoint()
    // candidate-tuple counts: the same (doc, term, w) construction as
    // TfIdf.sparseCosinePairs / sparseCosinePairsScalable, counting the
    // posting join's output instead of reducing it
    val tf = docs.select(col("doc_id"),
      explode(transform(
        sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
        i => col("text").substr(i, lit(5)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= nDocs * 0.02).localCheckpoint()
    val wts = tf.join(dfreq, Seq("term")).localCheckpoint()
    val fracCand = wts.select(col("term"), col("doc_id").as("a"))
      .join(wts.select(col("term"), col("doc_id").as("b")), Seq("term"))
      .filter(col("a") < col("b")).count()
    // prefix flag mirrors sparseCosinePairsScalable (idf-weighted mass)
    val idf = dfreq.select(col("term"), col("df"),
      (log((lit(nDocs) + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))
    val w2 = tf.join(idf, Seq("term")).select(col("doc_id"), col("term"),
      col("df"), (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))
      .localCheckpoint()
    val nrm2 = w2.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
    val wo = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("term").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefix = w2.join(nrm2, Seq("doc_id"))
      .withColumn("__b", coalesce(sum(col("w") * col("w")).over(wo), lit(0.0)))
      .filter(col("__b") <= lit(0.64) * col("n2") * (1 + 1e-12) + 1e-12)
    val prefCand = prefix.select(col("term"), col("doc_id").as("a"))
      .join(w2.select(col("term"), col("doc_id").as("b")), Seq("term"))
      .filter(col("a") < col("b")).count()
    println(s"""{"probe":"sparse9 candidate tuples 100k docs","frac_cap":$fracCand,"prefix_filter":$prefCand}""")
    def time(label: String)(f: => DataFrame): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    time("sparse pairs frac-cap 100k docs") {
      TfIdf.sparseCosinePairs(docs, "doc_id", "text", n = 5,
        maxDfFrac = 0.02, threshold = 0.6)
    }
    time("sparse pairs prefix+abs-cap 100k docs") {
      TfIdf.sparseCosinePairsScalable(docs, "doc_id", "text", n = 5,
        maxDfFrac = 0.02, maxDfAbs = 100000L, threshold = 0.6)
    }
  }

  /** `runMain graft.ScaleProbe interop9` — streaming↔batch sketch
    * interop at 20M events: 18M "historical" events fold into the
    * batch KLL cube (`kll_sketch_agg`, one partial-agg pass), 2M
    * "live" events run through the actual `transformWithState`
    * RocksDB monitor ([[graft.streaming.StreamQuantiles
    * .quantileSketches]]), and the monitor's exported state unions
    * into the cube with `kll_union_agg` — NO rescan of either side.
    * Pins wall-clock, max task, total exported state bytes, and the
    * fused p50's worst-key rank error vs the exact readout. */
  private def interop9(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graftx.KllSketch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.sparkContext.addSparkListener(MaxTask)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val keys = 64
    // skewed long-tailed values: v = (id*2654435761 mod 100003)^1.3
    def valueCol = pow(pmod(col("id") * 2654435761L, lit(100003L))
      .cast("double"), lit(1.3))
    val hist = spark.range(0, 18000000L).select(
      pmod(col("id"), lit(keys)).as("key"), valueCol.as("value"))
      .localCheckpoint()
    val live = spark.range(18000000L, 20000000L).select(
      pmod(col("id"), lit(keys)).as("key"), valueCol.as("value"))
      .localCheckpoint()
    // batch cube
    MaxTask.reset()
    var t0 = System.nanoTime()
    val cube = hist.groupBy("key")
      .agg(KllSketch.sketchAgg(col("value"), 400).as("sketch"))
      .localCheckpoint()
    println(f"""{"probe":"interop9 batch cube 18M","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    // live monitor: the real streaming operator, RocksDB v2 state
    MaxTask.reset(); t0 = System.nanoTime()
    val mem = MemoryStream[(Long, Double)]
    val q = graft.streaming.StreamQuantiles.quantileSketches(
      mem.toDF().toDF("key", "value"), k = 400)
      .writeStream.format("memory").queryName("interop9_live")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    val liveRows = live.as[(Long, Double)].collect()
    liveRows.grouped(500000).foreach { chunk =>
      mem.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    val streamState = spark.table("interop9_live")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("n").desc)))
      .filter(col("rk") === 1).select("key", "sketch")
      .localCheckpoint()
    q.stop()
    val stateBytes = streamState.select(sum(length(col("sketch"))))
      .as[Long].head()
    println(f"""{"probe":"interop9 stream monitor 2M (4 micro-batches)","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f,"state_bytes":$stateBytes}""")
    // fuse: union stream state into the cube, no rescan
    MaxTask.reset(); t0 = System.nanoTime()
    val fused = cube.unionByName(streamState)
      .groupBy("key").agg(KllSketch.quantile(
        KllSketch.unionAgg(col("sketch"), 400), lit(0.5)).as("p50"))
      .as[(Long, Double)].collect().toMap
    val fuseSec = (System.nanoTime() - t0) / 1e9
    // worst-key true rank of the fused p50 vs the exact 0.5
    val all = hist.unionByName(live)
    val fusedDf = fused.toSeq.toDF("key", "p50")
    val worst = all.join(broadcast(fusedDf), Seq("key"))
      .groupBy("key").agg(
        (sum(when(col("value") <= col("p50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("r"))
      .agg(max(abs(col("r") - 0.5))).as[Double].head()
    println(f"""{"probe":"interop9 fuse + readout","sec":$fuseSec%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f,"worst_key_rank_err":$worst%.4f}""")
  }

  /** `runMain graft.ScaleProbe graph9` — link-graph power iterations at
    * 20M edges / 2M nodes with a hot-target skew (30% of edges land on
    * 100 "celebrity" nodes) and a ~5% dangling tail (ids ≥1.9M never
    * appear as src). Pins the two claims the Graph scaladoc makes:
    * wall time is LINEAR in iteration count (localCheckpoint truncates
    * lineage — x3 must cost < 3.5x the x1 run including the shared
    * edge-dedup setup), and the celebrity in-degree never creates a
    * straggler (max task stays bounded: the per-dst contribution sum is
    * a partial aggregate, so the hot key is combined map-side before
    * the shuffle). */
  private def graph9(spark: SparkSession): Unit = {
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val edges = spark.range(0, 20000000L).select(
      pmod(hash(col("id")), lit(1900000)).cast("long").as("src"),
      when(pmod(col("id"), lit(10)) < 3, pmod(col("id"), lit(100)))
        .otherwise(pmod(hash(col("id") * 31), lit(2000000)))
        .cast("long").as("dst"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Double = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
      s
    }
    val s1 = time("graph9 pagerank 20M edges x1 iter") {
      Graph.pageRank(edges, "src", "dst", iters = 1)
        .queryExecution.toRdd.count()
    }
    val s3 = time("graph9 pagerank 20M edges x3 iters") {
      Graph.pageRank(edges, "src", "dst", iters = 3)
        .queryExecution.toRdd.count()
    }
    val s6 = time("graph9 pagerank 20M edges x6 iters") {
      Graph.pageRank(edges, "src", "dst", iters = 6)
        .queryExecution.toRdd.count()
    }
    time("graph9 hits 20M edges x3 iters") {
      Graph.hits(edges, "src", "dst", iters = 3)
        .queryExecution.toRdd.count()
    }
    // the x1 run carries the one-time edge-dedup/checkpoint setup AND
    // JIT warm-up; the x6−x3 delta isolates the true per-iteration cost
    println(f"""{"probe":"graph9 marginal sec/iter (x6-x3)/3","sec":${(s6 - s3) / 3}%.2f,"x3_over_x1":${s3 / s1}%.2f}""")
  }

  /** `runMain graft.ScaleProbe bucket9` — bucketed-table co-location
    * at 20M ⋈ 20M: both facts written once bucketed by the join key
    * (32 buckets, bucket-sorted), then joined + aggregated on that
    * key. The bucketing metadata satisfies the join's AND the agg's
    * distribution requirement, so the consuming job runs with ZERO
    * shuffle — the write paid the partitioning once, instead of every
    * consuming job re-paying it. The unbucketed twin (same data, plain
    * parquet) shows the per-job shuffle this avoids. */
  private def bucket9(spark: SparkSession): Unit = {
    import graft.operators.Layout
    spark.sparkContext.addSparkListener(ShuffleBytes)
    spark.sparkContext.addSparkListener(MaxTask)
    val fact1 = spark.range(0, 20000000L).select(
      pmod(hash(col("id")), lit(5000000)).cast("long").as("k"),
      (col("id") % 97).as("v1"))
    val fact2 = spark.range(0, 20000000L).select(
      pmod(hash(col("id") * 13), lit(5000000)).cast("long").as("k"),
      (col("id") % 89).as("v2"))
    Seq("bp_f1", "bp_f2", "bp_f1_plain", "bp_f2_plain")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Layout.writeBucketed(fact1, "bp_f1", "k", 32, sortCols = Seq("k"))
    Layout.writeBucketed(fact2, "bp_f2", "k", 32, sortCols = Seq("k"))
    fact1.write.mode("overwrite").format("parquet").saveAsTable("bp_f1_plain")
    fact2.write.mode("overwrite").format("parquet").saveAsTable("bp_f2_plain")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def time(label: String)(f: => Long): Unit = {
      ShuffleBytes.reset(); MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f,"shuffle_mb":${ShuffleBytes.bytes.get() / 1048576.0}%.1f}""")
    }
    def joinAgg(a: String, b: String): Long =
      spark.table(a).join(spark.table(b), Seq("k"))
        .groupBy(col("k")).agg(sum(col("v1") + col("v2")).as("s"))
        .queryExecution.toRdd.count()
    time("bucket9 unbucketed join+agg 20Mx20M")(joinAgg("bp_f1_plain", "bp_f2_plain"))
    time("bucket9 bucketed join+agg 20Mx20M")(joinAgg("bp_f1", "bp_f2"))
    Seq("bp_f1", "bp_f2", "bp_f1_plain", "bp_f2_plain")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** `runMain graft.ScaleProbe semdedup9` — SemDeDup cost model at
    * 200k synthetic 16-dim vectors: the quantizer cells shard the
    * O(n²) cosine space, so the pair pass costs Σ_cells C(occ, 2) —
    * QUADRATIC IN OCCUPANCY, linear in corpus at fixed occupancy. The
    * probe runs the same corpus at 128 vs 512 cells: 4× more cells →
    * ~16× fewer within-cell pairs → the pair stage collapses, which is
    * exactly the knob that keeps semantic dedup linear at 100 TB
    * (cells grow with the corpus; occupancy stays constant). */
  private def semdedup9(spark: SparkSession): Unit = {
    import graft.operators.Similarity
    spark.sparkContext.addSparkListener(MaxTask)
    val vecs = spark.range(0, 200000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => ((pmod(hash(col("id") * 131 + i), lit(2000)) - 1000)
          .cast("double") / 1000.0).cast("float")).as("v"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","rows":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    for (cells <- Seq(128, 512)) {
      time(s"semdedup9 200k vecs, $cells cells (occ ~${200000 / cells})") {
        Similarity.semanticDedupKeepSet(vecs, "vec_id", "v",
          nCentroids = cells, threshold = 0.995, kmeansIters = 1,
          trainSampleMod = 50)
          .queryExecution.toRdd.count()
      }
    }
  }

  /** `runMain graft.ScaleProbe tri9` — triangle-counting candidate
    * space under skew: 10M random edges over 2M nodes PLUS a celebrity
    * hub (500k draws ⇒ ~442k DISTINCT neighbors after collisions).
    * The probe sizes both orientations' wedge spaces (Σ C(outdeg, 2) —
    * the exact candidate-pair count the closing join must process)
    * using the OPERATOR'S OWN canonicalization/orientation
    * ([[graft.operators.Graph.orientByDegree]] — the probe cannot
    * drift from what ships): naive id-order orientation hands the hub
    * its full adjacency as out-edges → C(442k, 2) ≈ 9.8e10 candidates
    * from ONE node (the job that never finishes); the degree-ordered
    * orientation points every hub edge AT the hub (out-degree 0) and
    * bounds the total near Σ C(avg-out, 2). Only the bounded form then
    * actually runs, with max-task reported — the naive form is priced,
    * not executed. */
  private def tri9(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val rand = spark.range(0, 10000000L).select(
      pmod(hash(col("id")), lit(2000000)).cast("long").as("a"),
      pmod(hash(col("id") * 31), lit(2000000)).cast("long").as("b"))
    val hub = spark.range(0, 500000L).select(lit(0L).as("a"),
      (pmod(hash(col("id") * 7), lit(1999999)) + 1).cast("long").as("b"))
    val edges = rand.unionByName(hub).filter(col("a") =!= col("b"))
      .localCheckpoint()
    val canon = Graph.canonicalUndirected(edges, "a", "b").localCheckpoint()
    def wedges(outdeg: org.apache.spark.sql.DataFrame): Long =
      outdeg.agg((sum(col("o") * (col("o") - 1)) / 2).cast("long"))
        .as[Long].head()
    val naive = wedges(canon.groupBy(col("lo"))
      .agg(count(lit(1)).as("o")))
    val ordered = wedges(Graph.orientByDegree(canon)
      .groupBy(col("src")).agg(count(lit(1)).as("o")))
    println(f"""{"probe":"tri9 wedge space, naive id-order","candidates":$naive}""")
    println(f"""{"probe":"tri9 wedge space, degree-ordered","candidates":$ordered,"collapse_x":${naive.toDouble / ordered}%.1f}""")
    MaxTask.reset()
    val t0 = System.nanoTime()
    val n = Graph.triangleCounts(edges, "a", "b")
      .queryExecution.toRdd.count()
    println(f"""{"probe":"tri9 degree-ordered full count (10M+hub edges)","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
  }

  /** `runMain graft.ScaleProbe kcore9` — k-core peel cost at 20M
    * random edges / 2M nodes (Poisson degree ≈ 20): each round is one
    * node-sized degree partial-agg + two edge semi-joins, so per-round
    * cost should stay FLAT in the round index (lineage truncates) and
    * the max task bounded by edge-partition size, while the k=18 peel
    * cascades a real survivor shrink. Prints per-round survivors /
    * wall / max-task. */
  private def kcore9(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val edges = spark.range(0, 20000000L).select(
      pmod(hash(col("id")), lit(2000000)).cast("long").as("a"),
      pmod(hash(col("id") * 31), lit(2000000)).cast("long").as("b"))
    var canon = Graph.canonicalUndirected(edges, "a", "b").localCheckpoint()
    val m0 = canon.count()
    println(f"""{"probe":"kcore9 canonical edges","rows":$m0}""")
    for (round <- 1 to 5) {
      MaxTask.reset()
      val t0 = System.nanoTime()
      canon = Graph.peelRound(canon, k = 18L).localCheckpoint()
      val m = canon.count()
      println(f"""{"probe":"kcore9 round $round (k=18)","rows":$m,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
  }

  /** `runMain graft.ScaleProbe linkpred10` — link prediction's wedge
    * space under a hub, priced with the operator's own degree frame
    * (so the priced cap cannot drift from the shipped one): the same
    * 10M-random-edges + 500k-degree-hub graph as tri9. Unlike
    * triangles, link prediction needs FULL wedges (both neighbors of
    * every center — orientation can't halve the center's fan-out), so
    * the only defense against the hub is the center cap. Prints the
    * uncapped vs capped candidate space, then times the full capped
    * operator. */
  private def linkpred10(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val rand = spark.range(0, 10000000L).select(
      pmod(hash(col("id")), lit(2000000)).cast("long").as("a"),
      pmod(hash(col("id") * 31), lit(2000000)).cast("long").as("b"))
    val hub = spark.range(0, 500000L).select(lit(0L).as("a"),
      (pmod(hash(col("id") * 7), lit(1999999)) + 1).cast("long").as("b"))
    val edges = rand.unionByName(hub).filter(col("a") =!= col("b"))
      .localCheckpoint()
    val canon = Graph.canonicalUndirected(edges, "a", "b").localCheckpoint()
    val deg = Graph.undirectedDegrees(canon)
    def wedges(d: org.apache.spark.sql.DataFrame): Long =
      d.agg((sum(col("deg") * (col("deg") - 1)) / 2).cast("long"))
        .as[Long].head()
    val uncapped = wedges(deg)
    val capped = wedges(deg.filter(col("deg") <= 10000))
    println(f"""{"probe":"linkpred10 wedge space, uncapped centers","candidates":$uncapped}""")
    println(f"""{"probe":"linkpred10 wedge space, deg<=10000 centers","candidates":$capped,"collapse_x":${uncapped.toDouble / capped}%.1f}""")
    MaxTask.reset()
    val t0 = System.nanoTime()
    val n = Graph.linkPrediction(edges, "a", "b", k = 1000)
      .queryExecution.toRdd.count()
    println(f"""{"probe":"linkpred10 capped top-1000 (10M+hub edges)","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
  }

  /** `runMain graft.ScaleProbe lpa11` — phase decomposition of the
    * graph_lpa bench query at sf0.1: setup (edge build) vs per-round
    * cost, to aim the per-round-overhead work. */
  private def lpa11(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"probe":"lpa11 $label","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    def tbl(n: String): DataFrame = spark.read.parquet(s"$d/$n.parquet")
    for (rep <- 1 to 2) {
      val pairs = t(s"r$rep pairs build+ckpt") {
        tbl("orders").select(col("o_orderkey"), col("o_custkey"))
          .join(tbl("lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"),
            (col("l_suppkey") + 1000000L).as("supp"))
          .distinct().localCheckpoint()
      }
      val e0 = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      val e = t(s"r$rep lpa distinct+ckpt") {
        e0.select(col("src"), col("dst")).distinct().localCheckpoint()
      }
      println(s"""{"probe":"lpa11 edges","rows":${e.count()}}""")
      var labels = t(s"r$rep labels init") {
        val nodes = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        nodes.select(col("id"), col("id").as("lab")).localCheckpoint()
      }
      t(s"r$rep smallNodes count")(labels.count())
      for (it <- 1 to 3) {
        labels = t(s"r$rep round $it") {
          val counts = e
            .join(org.apache.spark.sql.functions.broadcast(
              labels.select(col("id").as("src"), col("lab"))), Seq("src"))
            .groupBy(col("dst").as("id"), col("lab"))
            .agg(count(lit(1)).as("n"))
          val winning = counts.groupBy(col("id"))
            .agg(min(struct((-col("n")).as("nn"), col("lab").as("lab"))).as("m"))
            .select(col("id"), col("m.lab").as("__new"))
          labels.join(org.apache.spark.sql.functions.broadcast(winning),
              Seq("id"), "left")
            .select(col("id"), coalesce(col("__new"), col("lab")).as("lab"))
            .localCheckpoint()
        }
      }
      t(s"r$rep final scan")(labels.queryExecution.toRdd.count())
    }
  }

  /** `runMain graft.ScaleProbe sparse11` — phase decomposition of
    * sparse_cosine_pairs at sf0.1. */
  private def sparse11(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"""{"probe":"sparse11 $label","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val n = 5
    for (rep <- 1 to 2) {
      val grams = graft.operators.Relational.computeRebalance(docs).select(col("doc_id"),
        explode_outer(org.apache.spark.sql.functions.transform(
          sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))),
          i => col("text").substr(i, lit(n)))).as("term"))
      val tf = t(s"r$rep tf ckpt") {
        grams.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf")).localCheckpoint()
      }
      println(s"""{"probe":"sparse11 tf rows","rows":${tf.count()}}""")
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
      val idf = dfreq.crossJoin(org.apache.spark.sql.functions.broadcast(nDocs))
        .filter(col("df") <= col("n_docs").cast("double") * 0.02)
        .select(col("term"),
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1).as("idf"))
      val wts = t(s"r$rep wts ckpt") {
        tf.join(idf.hint("shuffle_hash"), Seq("term"))
          .select(col("doc_id"), col("term"),
            (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))
          .localCheckpoint()
      }
      println(s"""{"probe":"sparse11 wts rows","rows":${wts.count()}}""")
      val norms = wts.groupBy(col("doc_id")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val a = wts.select(col("term"), col("doc_id").as("id_a"), col("w").as("wa"))
      val b = wts.select(col("term"), col("doc_id").as("id_b"), col("w").as("wb"))
      val dots = a.join(b, Seq("term")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(sum(col("wa") * col("wb")).as("dot"))
      t(s"r$rep dots only") {
        dots.queryExecution.toRdd.count()
      }
      val out = dots
        .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), Seq("id_a"))
        .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), Seq("id_b"))
        .withColumn("cosine", col("dot") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.6)
      t(s"r$rep full tail")(out.queryExecution.toRdd.count())
    }
  }

  /** `runMain graft.ScaleProbe lpa12` — A/B of the LPA round spelling
    * at sf0.1: the former two-exchange count+argmax rounds (inline)
    * vs the shipped single-exchange deterministic-mode rounds
    * (Graph.labelPropagation), interleaved in one warm JVM. */
  private def lpa12(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val d = "/root/testdata/sf0.1"
    def tbl(n: String): DataFrame = spark.read.parquet(s"$d/$n.parquet")
    val pairs = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(tbl("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct().localCheckpoint()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    def oldLpa(): Long = {
      val e = edges.select(col("src"), col("dst")).localCheckpoint()
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      var labels = nodes.select(col("id"), col("id").as("lab")).localCheckpoint()
      labels.count()
      for (_ <- 1 to 3) {
        val counts = e
          .join(org.apache.spark.sql.functions.broadcast(
            labels.select(col("id").as("src"), col("lab"))), Seq("src"))
          .groupBy(col("dst").as("id"), col("lab"))
          .agg(count(lit(1)).as("n"))
        val winning = counts.groupBy(col("id"))
          .agg(min(struct((-col("n")).as("nn"), col("lab").as("lab"))).as("m"))
          .select(col("id"), col("m.lab").as("__new"))
        labels = labels.join(org.apache.spark.sql.functions.broadcast(winning),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("__new"), col("lab")).as("lab"))
          .localCheckpoint()
      }
      labels.queryExecution.toRdd.count()
    }
    def newLpa(): Long =
      graft.operators.Graph.labelPropagation(edges, "src", "dst", iters = 3,
        assumeDistinct = true).queryExecution.toRdd.count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime(); val nOld = oldLpa()
      val t1 = System.nanoTime(); val nNew = newLpa()
      val t2 = System.nanoTime()
      println(f"""{"probe":"lpa12 r$rep","old_sec":${(t1 - t0) / 1e9}%.2f,"mode_sec":${(t2 - t1) / 1e9}%.2f,"rows_old":$nOld,"rows_new":$nNew}""")
    }
  }

  /** `runMain graft.ScaleProbe crossover12 [replicas]` — the
    * graph_lpa / graph_kcore scale-crossover measurement, Spark side.
    * Replicates the sf0.1 purchase-pair and co-purchase edge sets
    * `replicas`× (default 10) with disjoint id ranges (structure
    * preserved, scale grown), writes both under
    * /tmp/graft_crossover/, and times the shipped operators
    * reading those files — the SAME inputs tools/crossover12.py then
    * times DuckDB's unrolled-CTE oracle spelling on. Records where
    * the relational per-round plans overtake the single-process
    * engine as data grows past the fixed-overhead regime. */
  private def crossover12(spark: SparkSession, replicas: Int): Unit = {
    import org.apache.spark.sql.DataFrame
    val d = "/root/testdata/sf0.1"
    val out = "/tmp/graft_crossover"
    def tbl(n: String): DataFrame = spark.read.parquet(s"$d/$n.parquet")
    def replicate(df: DataFrame, cols: Seq[String]): DataFrame =
      (0 until replicas).map { r =>
        val off = r * 10000000L
        df.select(cols.map(c => (col(c) + off).as(c)): _*)
      }.reduce(_ unionByName _)
    val pairs1 = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(tbl("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    replicate(pairs1, Seq("cust", "supp"))
      .write.mode("overwrite").parquet(s"$out/pairs.parquet")
    val canon1 = tbl("lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("ok").isNotNull && col("pk").isNotNull)
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    replicate(canon1, Seq("a", "b"))
      .write.mode("overwrite").parquet(s"$out/canon.parquet")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = spark.read.parquet(s"$out/pairs.parquet")
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      val nLpa = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        iters = 3, assumeDistinct = true).queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      val nCore = graft.operators.Graph.kCore(
        spark.read.parquet(s"$out/canon.parquet"), "a", "b",
        k = 70L, rounds = 4).queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"""{"probe":"crossover12 spark r$rep","replicas":$replicas,"lpa_sec":${(t1 - t0) / 1e9}%.2f,"lpa_rows":$nLpa,"kcore_sec":${(t2 - t1) / 1e9}%.2f,"kcore_rows":$nCore}""")
    }
  }

  /** `runMain graft.ScaleProbe headroom12` — one measured 10× point
    * for the five heaviest bench graph queries (triangles,
    * clustering, weighted pagerank, link prediction, k-core), on the
    * replicated edge sets `crossover12` writes (run it first). Turns
    * the 20M-row shape arguments into bench-query-shaped sf1-scale
    * measurements. */
  private def headroom12(spark: SparkSession): Unit = {
    spark.sparkContext.addSparkListener(MaxTask)
    val out = "/tmp/graft_crossover"
    val d = "/root/testdata/sf0.1"
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val wp1 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"), col("o_orderkey"))
      .distinct().groupBy(col("cust"), col("supp")).agg(count(lit(1)).as("w"))
    val wpairs = (0 until 10).map { r =>
      val off = r * 10000000L
      wp1.select((col("cust") + off).as("cust"),
        (col("supp") + off).as("supp"), col("w"))
    }.reduce(_ unionByName _).localCheckpoint()
    val canon = spark.read.parquet(s"$out/canon.parquet")
    val pairs = spark.read.parquet(s"$out/pairs.parquet")
    def t(label: String)(f: => Long): Unit = {
      MaxTask.reset(); val t0 = System.nanoTime(); val n = f
      println(f"""{"probe":"headroom12 $label","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    // ONE rep: five heavy operators' checkpoint blocks accumulate in
    // the single local JVM (a second rep OOMs the 8 GiB heap — blocks
    // from completed operators are not reclaimed until GC); on a
    // cluster each would run in its own executors.
    for (rep <- 1 to 1) {
      t(s"r$rep triangles 10x") {
        graft.operators.Graph.triangleCounts(canon, "a", "b")
          .queryExecution.toRdd.count()
      }
      t(s"r$rep clustering 10x") {
        graft.operators.Graph.clusteringCoefficient(canon, "a", "b")
          .queryExecution.toRdd.count()
      }
      t(s"r$rep pagerank_w 10x") {
        val edges = wpairs
          .select(col("cust").as("src"), col("supp").as("dst"), col("w"))
          .unionByName(wpairs
            .select(col("supp").as("src"), col("cust").as("dst"), col("w")))
        graft.operators.Graph.pageRankWeighted(edges, "src", "dst", "w",
          iters = 3).queryExecution.toRdd.count()
      }
      t(s"r$rep linkpred 10x") {
        graft.operators.Graph.linkPrediction(
          pairs.select(col("cust").as("a"), col("supp").as("b")), "a", "b",
          k = 100, maxCenterDeg = 500L).queryExecution.toRdd.count()
      }
      t(s"r$rep kcore 10x") {
        graft.operators.Graph.kCore(canon, "a", "b", k = 70L, rounds = 4)
          .queryExecution.toRdd.count()
      }
    }
  }

  /** `runMain graft.ScaleProbe headroom13` — the round-13 wedge-skew
    * A/B: triangles + clustering on the crossover12 10× edge set
    * (run `crossover12` first), with PER-STAGE task stats so the
    * straggler exchange is named, not guessed. Same shape as
    * headroom12's two wedge rows plus the stage breakdown. */
  private def headroom13(spark: SparkSession): Unit = {
    spark.sparkContext.addSparkListener(MaxTask)
    spark.sparkContext.addSparkListener(StageStats)
    val canon = spark.read.parquet("/tmp/graft_crossover/canon.parquet")
    def t(label: String)(f: => Long): Unit = {
      MaxTask.reset(); StageStats.reset()
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      StageStats.quiesce() // async listener bus: let tail events land
      println(f"""{"probe":"headroom13 $label","rows":$n,"sec":$sec%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
      StageStats.report(s"headroom13 $label", 6)
    }
    t("triangles 10x") {
      graft.operators.Graph.triangleCounts(canon, "a", "b")
        .queryExecution.toRdd.count()
    }
    t("clustering 10x") {
      graft.operators.Graph.clusteringCoefficient(canon, "a", "b")
        .queryExecution.toRdd.count()
    }
    // linkpred: headroom12 measured a 7.6 s max task of 14.3 s total;
    // name the stage that owns it (capped-center scoring vs top-k vs
    // adjacency build) before deciding whether a center salt pays
    val pairs = spark.read.parquet("/tmp/graft_crossover/pairs.parquet")
    t("linkpred 10x") {
      graft.operators.Graph.linkPrediction(
        pairs.select(col("cust").as("a"), col("supp").as("b")), "a", "b",
        k = 100, maxCenterDeg = 500L).queryExecution.toRdd.count()
    }
  }

  /** `runMain graft.ScaleProbe sparse12 [replicas]` — sparse-pairs
    * scale-crossover, Spark side. Replicates the sf0.1 documents
    * `replicas`× with per-replica consonant rotation (term spaces
    * become mostly disjoint across replicas, so the candidate space
    * grows LINEARLY — the production shape of a growing corpus, not a
    * clone-pair explosion), writes /tmp/graft_crossover/docs.parquet,
    * and times the shipped exact + scalable operators on it;
    * tools/sparse_crossover12.py times DuckDB's oracle spelling on
    * the same file. */
  private def sparse12(spark: SparkSession, replicas: Int): Unit = {
    val out = "/tmp/graft_crossover"
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // Disjoint letter alphabet per replica (a distinct 26-char unicode
    // block): replica r's shingles share (almost) no terms with
    // replica r', so the corpus grows the way a real one does — new
    // documents about new things, per-term df roughly constant — and
    // the pair space grows LINEARLY. (A first cut that merely ROTATED
    // the consonants left replica-shared grams whose df grew 10×
    // under the 2% frac cap, exploding the posting self-join ~100× —
    // both engines spilled out; that regime is what the scalable
    // form's maxDfAbs ceiling exists for, not a growth crossover.)
    val src = "abcdefghijklmnopqrstuvwxyz"
    (0 until replicas).map { r =>
      val dst = if (r == 0) src
        else (0 until 26).map(i => (0x400 + r * 32 + i).toChar).mkString
      docs.select((col("doc_id") + r * 10000000L).as("doc_id"),
        translate(col("text"), src, dst).as("text"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/docs.parquet")
    val d10 = spark.read.parquet(s"$out/docs.parquet")
    // Hold the ABSOLUTE df head-cut constant as the corpus grows —
    // the production semantics (a stop-gram is a stop-gram no matter
    // how big the corpus gets), and precisely what the scalable
    // form's maxDfAbs ceiling encodes. A frac-only cap loosens 10×
    // with the corpus (2% of 50k keeps df≤1000 grams the 1× run
    // dropped at df≤100) and quadratically explodes the posting join
    // in BOTH engines — measured: >60 GB of spill before this probe
    // pinned the cut. Exact form gets the equivalent scaled fraction;
    // the scalable form exercises its absolute ceiling directly.
    val cap = (0.02 * 5000).toLong // the 1× head cut, held absolute
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val nE = graft.operators.TfIdf.sparseCosinePairs(d10, "doc_id", "text",
        n = 5, maxDfFrac = 0.02 / replicas, threshold = 0.6)
        .queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      val nS = graft.operators.TfIdf.sparseCosinePairsScalable(d10, "doc_id",
        "text", n = 5, maxDfFrac = 0.02, maxDfAbs = cap, threshold = 0.6)
        .queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"""{"probe":"sparse12 spark r$rep","replicas":$replicas,"exact_sec":${(t1 - t0) / 1e9}%.2f,"exact_rows":$nE,"scalable_sec":${(t2 - t1) / 1e9}%.2f,"scalable_rows":$nS}""")
    }
  }

  /** `runMain graft.ScaleProbe assoc12` — A/B of the basket-guard
    * spelling inside assoc_rules' guard+assembly prefix at sf0.1:
    * (w) the shipped whole-partition window count over the distinct
    * exchange, (c) checkpoint + groupBy-count + semi join (the r11
    * spelling), (g) a twice-computed distinct with count agg +
    * broadcast semi join, no checkpoint. Times ONLY through the
    * guarded collect_set assembly (the downstream rule mining is
    * identical across spellings). */
  /** `runMain graft.ScaleProbe madsort15` — the round-14 ADVICE #2
    * measurement: is the boxed tuple sort in MadOutliersAgg's eval
    * material at the 2 M-distinct budget ceiling? Times (a) the shipped
    * boxed sort vs a primitive-key sort A/B at 2 M entries (see
    * [[org.apache.spark.sql.graftx.MadSortProbe]]), and (b) the fused
    * robustOutliers end-to-end on 8 groups × 1.8 M distinct values —
    * the densest per-group distribution the adaptive split routes to
    * the counts-map path (approx_count_distinct overshoot kept clear
    * of the 2 M budget). The decision rule: replace the sort only if
    * (boxed − primitive) × 2 sorts is a material share of the
    * end-to-end seconds. */
  private def madsort15(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graftx.MadSortProbe
    val (boxedSec, primSec) = MadSortProbe.ab(nd = 2000000, reps = 5)
    println(f"""{"probe":"madsort15 sort A/B 2M entries","boxed_sec":$boxedSec%.3f,"primitive_sec":$primSec%.3f}""")
    // end-to-end: the counts-map fused pass at the ceiling. 8 groups x
    // 1.8M distinct doubles (14.4M rows, every value distinct in its
    // group) -- each final-reducer eval sorts 1.8M value pairs + ~1.8M
    // deviation pairs.
    val rows = spark.range(0, 14400000L).select(
      pmod(col("id"), lit(8)).as("grp"),
      (exp((col("id").cast("double") / 3600000.0)) +
        col("id").cast("double") / 7.0).as("v"))
      .localCheckpoint()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Profiling.robustOutliers(rows, col("grp"), col("v"))
        .queryExecution.toRdd.count()
      println(f"""{"probe":"madsort15 robustOutliers 8x1.8M r$rep","groups":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
  }

  private def assoc12(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def dedup0(): DataFrame = li
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
    def viaWindow(): Long = dedup0()
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("bk"))))
      .filter(col("bn") <= 256)
      .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
      .queryExecution.toRdd.count()
    def viaCkptSemi(): Long = {
      val dedup = dedup0().localCheckpoint()
      val ok = dedup.groupBy(col("bk")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 256).select(col("bk"))
      dedup.join(ok, Seq("bk"), "left_semi")
        .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
        .queryExecution.toRdd.count()
    }
    def viaLazySemi(): Long = {
      val dedup = dedup0()
      val ok = dedup.groupBy(col("bk")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 256).select(col("bk"))
      dedup.join(broadcast(ok), Seq("bk"), "left_semi")
        .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
        .queryExecution.toRdd.count()
    }
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime(); val nw = viaWindow()
      val t1 = System.nanoTime(); val nc = viaCkptSemi()
      val t2 = System.nanoTime(); val ng = viaLazySemi()
      val t3 = System.nanoTime()
      println(f"""{"probe":"assoc12 r$rep","window_sec":${(t1 - t0) / 1e9}%.2f,"ckpt_semi_sec":${(t2 - t1) / 1e9}%.2f,"lazy_bcast_sec":${(t3 - t2) / 1e9}%.2f,"rows":[$nw,$nc,$ng]}""")
    }
  }

  /** `runMain graft.ScaleProbe assoc13` — the round-13 mining-tail
    * A/B: the SHIPPED adaptive pairRules (which skips the a-priori
    * semi-join + basket re-assembly when an occurrence-weighted probe
    * of the item-support table says it removes <5% of the pair
    * stream, and folds the basket total into the checkpoint's observe
    * metric) vs the r12 spelling with the prune + count subtree
    * always on, reconstructed inline. Both over the bench query's
    * exact parameters (lineitem sf0.1, minSupport 2, k 100); warm,
    * 3 reps, identical top-100 asserted. */
  private def assoc13(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def shipped(): Array[org.apache.spark.sql.Row] =
      graft.operators.Association.pairRules(li, "l_orderkey", "l_partkey",
        minSupport = 2L, k = 100).collect()
    def r12Spelling(): Array[org.apache.spark.sql.Row] = {
      val minSupport = 2L
      val dedup = li.select(col("l_orderkey").as("bk"),
          col("l_partkey").as("it"))
        .filter(col("bk").isNotNull && col("it").isNotNull).distinct()
      val sized = dedup
        .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("bk"))))
        .filter(col("bn") <= 256)
        .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
        .localCheckpoint()
      val nB = sized.agg(count(lit(1)).as("n_baskets"))
      val itemN = sized.select(explode(col("items")).as("it"))
        .groupBy(col("it")).agg(count(lit(1)).as("item_n"))
        .localCheckpoint()
      val frequent = itemN.filter(col("item_n") >= minSupport)
      val pruned = sized.select(col("bk"), explode(col("items")).as("it"))
        .join(frequent.select(col("it")), Seq("it"), "left_semi")
        .groupBy(col("bk")).agg(collect_set(col("it")).as("items"))
      val pairs = pruned
        .select(explode(col("items")).as("it"), col("items"))
        .select(col("it"), explode(col("items")).as("it2"))
        .filter(col("it") < col("it2"))
        .groupBy(col("it"), col("it2")).agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= minSupport)
      val rules = pairs.select(col("it").as("ante"), col("it2").as("cons"),
          col("pair_n"))
        .unionByName(pairs.select(col("it2").as("ante"),
          col("it").as("cons"), col("pair_n")))
        .join(itemN.select(col("it").as("ante"), col("item_n").as("ante_n")),
          Seq("ante"))
        .join(itemN.select(col("it").as("cons"), col("item_n").as("cons_n")),
          Seq("cons"))
        .crossJoin(broadcast(nB))
        .select(col("ante"), col("cons"), col("pair_n"), col("ante_n"),
          col("cons_n"),
          (col("pair_n").cast("double") / col("ante_n").cast("double"))
            .as("conf"),
          ((col("pair_n").cast("double") * col("n_baskets").cast("double")) /
            (col("ante_n").cast("double") * col("cons_n").cast("double")))
            .as("lift"))
      rules.orderBy(col("conf").desc, col("ante").asc, col("cons").asc)
        .limit(100).collect()
    }
    // warm both once, then assert identical results
    val a = shipped(); val b = r12Spelling()
    require(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "adaptive and r12 spellings must produce identical rules")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime(); shipped()
      val t1 = System.nanoTime(); r12Spelling()
      val t2 = System.nanoTime()
      println(f"""{"probe":"assoc13 r$rep","adaptive_sec":${(t1 - t0) / 1e9}%.2f,"r12_prune_sec":${(t2 - t1) / 1e9}%.2f}""")
    }
  }

  /** `runMain graft.ScaleProbe sparse13` — does keying the sparse
    * pipeline's term exchanges on 64-bit gram HASHES (instead of the
    * gram strings) pay? The experiment the r12 verdict asked for:
    * every exchange/join downstream of tokenization (doc-term agg, df
    * agg, idf join, posting self-join) compares 8-byte longs instead
    * of UTF8Strings. Probe-only variant (xxhash64 applied to the
    * exploded gram stream); identical pair output ASSERTED at this
    * scale — note a 64-bit key is NOT shippable as-is at 10¹⁰+ grams
    * (birthday collisions would silently merge terms and shift idf),
    * so this measures the CEILING of the win first. */
  private def sparse13(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    def pairsOf(longKeys: Boolean): Array[(Long, Long, Double)] = {
      import spark.implicits._
      val grams = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode_outer(org.apache.spark.sql.graftx.ShingleTf
            .shingleTf(col("text"), 5)).as(Seq("g", "__tf")))
      val keyed =
        if (longKeys) grams.select(col("doc_id"),
          xxhash64(col("g")).as("term"), col("__tf"))
        else grams.select(col("doc_id"), col("g").as("term"), col("__tf"))
      val tf = keyed.groupBy(col("doc_id"), col("term"))
        .agg(sum(col("__tf")).as("tf")).localCheckpoint()
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = tf.select(countDistinct(col("doc_id")).as("n_docs"))
      val idf = dfreq.crossJoin(broadcast(nDocs))
        .filter(col("df") <= col("n_docs").cast("double") * 0.02)
        .select(col("term"),
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
            .as("idf"))
      val wts = tf.join(idf, Seq("term"))
        .select(col("term"), col("doc_id"),
          (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))
        .localCheckpoint()
      val norms = wts.groupBy(col("doc_id"))
        .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val a = wts.select(col("term"), col("doc_id").as("id_a"),
        col("w").as("wa"))
      val b = wts.select(col("term"), col("doc_id").as("id_b"),
        col("w").as("wb"))
      val dots = a.join(b, Seq("term")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("wa") * col("wb")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")),
          Seq("id_a"))
        .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")),
          Seq("id_b"))
        .withColumn("cosine", col("dot") / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.6)
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 10000 + lit(0.5)) / 10000).as("cosine"))
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    }
    val s0 = pairsOf(longKeys = false); val l0 = pairsOf(longKeys = true)
    require(s0.toSeq == l0.toSeq,
      s"long-key and string-key pair sets differ: ${s0.length} vs ${l0.length}")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime(); pairsOf(longKeys = false)
      val t1 = System.nanoTime(); pairsOf(longKeys = true)
      val t2 = System.nanoTime()
      println(f"""{"probe":"sparse13 r$rep","string_sec":${(t1 - t0) / 1e9}%.2f,"long_sec":${(t2 - t1) / 1e9}%.2f,"pairs":${s0.length}}""")
    }
  }

  /** `runMain graft.ScaleProbe sparse13b` — the one-shot sparse-probe
    * job-count A/B (round 13): the shipped lazy spelling of
    * [[graft.operators.TfIdf.sparseCosineProbe]] (persist = false —
    * build + probe fuse into one action, shared subtrees unified by
    * ReuseExchange) vs the persisted-index spelling (per-artifact
    * localCheckpoints, the IndexCache/serving form) on the sf0.1
    * documents split the bench query uses. Identical pair sets
    * asserted; the delta is pure job-scheduling overhead. */
  private def sparse13b(spark: SparkSession): Unit = {
    import graft.operators.TfIdf
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val idx = docs.filter(col("doc_id") % 2 === 0)
    val bat = docs.filter(col("doc_id") % 2 =!= 0)
    def collectPairs(df: org.apache.spark.sql.DataFrame) = {
      import spark.implicits._
      df.as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    }
    def lazyForm() = collectPairs(TfIdf.sparseCosineProbe(
      idx, bat, "doc_id", "text", n = 5, maxDfFrac = 0.02, threshold = 0.6))
    def ckptForm() = collectPairs(TfIdf.probeSparseIndex(
      TfIdf.buildSparseIndex(idx, "doc_id", "text", n = 5, maxDfFrac = 0.02),
      bat, "doc_id", "text", n = 5, threshold = 0.6))
    // mixed form: checkpoint ONLY the tokenization aggregates (idxTf,
    // batW — the frames whose recomputation is corpus-priced) plus the
    // idf model both sides weigh with; leave the cheap single-action
    // artifacts (idxW, idxNorms) lazy
    def mixedForm() = {
      import graft.operators.TfIdf.SparseIndex
      val idxTf = {
        val t = org.apache.spark.sql.graftx.ShingleTf
          .shingleTf(col("text"), 5)
        idx.repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
          explode_outer(t).as(Seq("term", "__tf")))
          .groupBy(col("doc_id"), col("term"))
          .agg(sum(col("__tf")).as("tf")).localCheckpoint()
      }
      val dfreq = idxTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = idxTf.select(countDistinct(col("doc_id")).as("n_docs"))
      val idf = dfreq.crossJoin(broadcast(nDocs))
        .filter(col("df") <= col("n_docs").cast("double") * 0.02)
        .select(col("term"),
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
            .as("idf")).localCheckpoint()
      def w(tf: org.apache.spark.sql.DataFrame) = tf.join(idf, Seq("term"))
        .select(col("doc_id"), col("term"),
          (floor(col("tf") * col("idf") * 1024 + lit(0.5)) / 1024).as("w"))
      val idxW = w(idxTf)
      val idxNorms = idxW.groupBy(col("doc_id"))
        .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      collectPairs(graft.operators.TfIdf.probeSparseIndex(
        SparseIndex(idf, idxW, idxNorms), bat, "doc_id", "text", n = 5,
        threshold = 0.6, persistBatch = true))
    }
    val a = lazyForm(); val b = ckptForm(); val c = mixedForm()
    require(a.toSeq == b.toSeq && a.toSeq == c.toSeq,
      s"probe spellings differ: ${a.length} / ${b.length} / ${c.length}")
    for (rep <- 1 to 4) {
      val t0 = System.nanoTime(); lazyForm()
      val t1 = System.nanoTime(); ckptForm()
      val t2 = System.nanoTime(); mixedForm()
      val t3 = System.nanoTime()
      println(f"""{"probe":"sparse13b r$rep","lazy_sec":${(t1 - t0) / 1e9}%.2f,"ckpt_sec":${(t2 - t1) / 1e9}%.2f,"mixed_sec":${(t3 - t2) / 1e9}%.2f,"pairs":${a.length}}""")
    }
  }

  /** `runMain graft.ScaleProbe ckpt13x` — 10× validation of the round-13
    * checkpoint reductions (pagerank / pagerank_w / bfs / sssp /
    * assortativity): replicates the sf0.1 purchase and co-purchase
    * graphs 10× with disjoint id ranges (the crossover12 construction)
    * and times each touched operator end-to-end with the max-task
    * straggler stat — the guard that a prep frame left lazy does not
    * recompute corpus-priced work at scale. */
  private def ckpt13x(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    spark.sparkContext.addSparkListener(MaxTask)
    val d = "/root/testdata/sf0.1"
    def tbl(n: String): DataFrame = spark.read.parquet(s"$d/$n.parquet")
    def replicate(df: DataFrame, cols: Seq[String], extra: Seq[String] = Nil): DataFrame =
      (0 until 10).map { r =>
        val off = r * 10000000L
        df.select(cols.map(c => (col(c) + off).as(c)) ++ extra.map(col): _*)
      }.reduce(_ unionByName _)
    val o = tbl("orders").select(col("o_orderkey"), col("o_custkey"))
    val l = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"),
      col("l_quantity"))
    val wp1 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .agg(count(lit(1)).as("w"),
        min(floor(col("l_quantity").cast("double") + lit(0.5))
          .cast("long")).as("q"))
    val pairs = replicate(wp1, Seq("cust", "supp"), Seq("w", "q"))
      .localCheckpoint()
    val canon1 = tbl("lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("ok").isNotNull && col("pk").isNotNull)
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    val canon = replicate(canon1, Seq("a", "b")).localCheckpoint()
    val seeds = replicate(tbl("customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("seed")), Seq("seed")).localCheckpoint()
    def doubled(w: String): DataFrame = pairs
      .select(col("cust").as("src"), col("supp").as("dst"), col(w))
      .unionByName(pairs
        .select(col("supp").as("src"), col("cust").as("dst"), col(w)))
    def t(label: String)(f: => Long): Unit = {
      MaxTask.reset(); val t0 = System.nanoTime(); val n = f
      println(f"""{"probe":"ckpt13x $label","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    for (rep <- 1 to 2) {
      t(s"r$rep pagerank 10x") {
        graft.operators.Graph.pageRank(doubled("w").drop("w"), "src", "dst",
          iters = 3).queryExecution.toRdd.count()
      }
      t(s"r$rep pagerank_w 10x") {
        graft.operators.Graph.pageRankWeighted(doubled("w"), "src", "dst",
          "w", iters = 3).queryExecution.toRdd.count()
      }
      t(s"r$rep bfs 10x") {
        graft.operators.Graph.bfsDistances(doubled("w").drop("w"),
          "src", "dst", seeds, "seed", maxDepth = 3)
          .queryExecution.toRdd.count()
      }
      t(s"r$rep sssp 10x") {
        graft.operators.Graph.weightedSssp(doubled("q"), "src", "dst", "q",
          seeds, "seed", rounds = 3).queryExecution.toRdd.count()
      }
      t(s"r$rep assortativity 10x") {
        graft.operators.Graph.degreeAssortativity(canon, "a", "b")
          .queryExecution.toRdd.count()
      }
    }
  }

  /** `runMain graft.ScaleProbe recall12` — recall-vs-cost sweep of the
    * ANN paths on the sf0.01 embeddings fixture, against the exact
    * brute-force top-5 / exact near-dup pairs. Cost = candidate rows
    * entering the verify/score stage (the number that scales with the
    * corpus). Aims the ≥0.8 recall configs. */
  private def recall12(spark: SparkSession): Unit = {
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 64
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .localCheckpoint()
    val nVec = emb.count()
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(s"""{"probe":"recall12 corpus","vectors":$nVec,"bf_pairs":${bf.size}}""")
    // IVF grid: recall@5 + per-query scanned fraction
    for ((c, np) <- Seq((8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 6),
      (16, 2), (16, 4), (16, 6), (16, 8), (32, 4), (32, 8), (32, 12))) {
      val got = Similarity.ivfTopKMultiProbe(emb, "vec_id", "embedding", 5,
        nCentroids = c, nprobe = np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r = (bf & got).size.toDouble / bf.size
      println(f"""{"probe":"recall12 ivf","cells":$c,"nprobe":$np,"recall5":$r%.3f,"scan_frac":${np.toDouble / c}%.3f}""")
    }
    // IVF-PQ + exact rerank at the sharper grids
    for ((c, np, sl) <- Seq((8, 4, 50), (16, 6, 50), (16, 8, 50), (32, 12, 50))) {
      val got = Similarity.ivfPqRerankTopK(emb, "vec_id", "embedding", 5,
        nCentroids = c, nprobe = np, m = 8, subDim = 8, ksub = 32,
        shortlist = sl, trainSampleMod = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val r = (bf & got).size.toDouble / bf.size
      println(f"""{"probe":"recall12 ivfpq_rerank","cells":$c,"nprobe":$np,"recall5":$r%.3f}""")
    }
    // Near-dup LSH: single-table multi-probe vs OR-amplified tables
    val thr = 0.45
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", thr)
      .as[(Long, Long)].collect().toSet
    println(s"""{"probe":"recall12 neardup exact","pairs":${exact.size}}""")
    val seeds = Seq(42L, 101L, 977L, 5323L)
    for (np <- Seq(2, 3, 4)) {
      val got = Similarity.lshCosineNearDupPairsMultiProbe(emb, "vec_id",
        "embedding", thr, Similarity.hyperplanes(np, dim))
        .as[(Long, Long)].collect().toSet
      val r = (exact & got).size.toDouble / exact.size
      println(f"""{"probe":"recall12 neardup 1table","planes":$np,"recall":$r%.3f}""")
    }
    for (l <- Seq(2, 3, 4); np <- Seq(3, 4)) {
      val tables = seeds.take(l).map(Similarity.hyperplanes(np, dim, _))
      val got = Similarity.lshCosineNearDupPairsMultiTable(emb, "vec_id",
        "embedding", thr, tables)
        .as[(Long, Long)].collect().toSet
      val r = (exact & got).size.toDouble / exact.size
      println(f"""{"probe":"recall12 neardup ${l}tables","planes":$np,"recall":$r%.3f}""")
    }
  }

  /** `runMain graft.ScaleProbe bloom14 [replicas]` — empirical record
    * of the wedge Bloom screen's behavior AT its size cap
    * ([[graft.operators.Graph.WedgeBloomMaxBits]], 2²⁸ bits ≈ 32 MB).
    * The r13 record pinned the fp rate at the design point; the
    * degradation PAST the cap ("toward pass-through, never wrong")
    * was reasoned, not measured. Two parts:
    *
    * Part A — the fp curve of the SHIPPED sizing (bits =
    * min(10·m, 2²⁸), built through the same SessionScope-raised-caps
    * + struct-key + XxHash64 path the wedge screen runs) at m = 10 M
    * (design point, uncapped) through 216 M inserted edges, probed
    * with 10 M definite non-members (disjoint negative id range).
    * Expected shape if the failure mode is the designed one: ~1 % up
    * to the ~27 M-edge cap crossing, then smooth growth toward 1.0 as
    * bits-per-edge shrink — no error, no cliff.
    *
    * Part B — one real wedge pipeline past the cap: the co-purchase
    * canon replicated `replicas`× (default 30, m ≈ 23 M oriented
    * edges → 10·m just past 2²⁸). ONE wedge-generation pass counts
    * the raw wedge stream and the survivors under the capped and the
    * uncapped-ideal filters simultaneously; the closing join then
    * runs end-to-end under BOTH filters with identical triangle
    * totals asserted (no false negatives ⇒ the cap can only ever
    * cost shuffle volume, never rows). */
  private def bloom14(spark: SparkSession, replicas: Int): Unit = {
    import org.apache.spark.sql.graftx.{BloomScreen, SessionScope}
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val caps = (m: Long, bits: Long) => Map(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> m.toString,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits.toString)
    // ---- Part A: fp of the shipped sizing formula vs build-side m
    for (m <- Seq(10000000L, 27000000L, 54000000L, 108000000L, 216000000L)) {
      val bits = math.min(math.max(m * 10L, 1L << 20), Graph.WedgeBloomMaxBits)
      val members = spark.range(m)
        .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      val t0 = System.nanoTime()
      val bf = SessionScope.headUnderConf(
        members.agg(BloomScreen.bloomAgg(struct(col("src"), col("dst")),
          m, bits)), caps(m, bits)).getAs[Array[Byte]](0)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val probes = 10000000L
      val fp = spark.range(probes)
        .select((-col("id") - 2L).as("src"), (col("id") + 1L).as("dst"))
        .filter(BloomScreen.mightContain(bf, struct(col("src"), col("dst"))))
        .count()
      println(f"""{"probe":"bloom14 fp","edges":$m,"bits":$bits,"bits_per_edge":${bits.toDouble / m}%.2f,"fp":${fp.toDouble / probes}%.4f,"build_sec":$buildSec%.1f,"filter_mb":${bf.length / 1048576.0}%.1f}""")
    }
    // ---- Part B: real wedge pipeline just past the cap
    val d = "/root/testdata/sf0.1"
    val canon1 = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .filter(col("ok").isNotNull && col("pk").isNotNull)
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a") < col("b"))
    (0 until replicas).map { r =>
      val off = r * 10000000L
      canon1.select((col("a") + off).as("a"), (col("b") + off).as("b"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet("/tmp/graft_bloom14/canon.parquet")
    val raw = spark.read.parquet("/tmp/graft_bloom14/canon.parquet")
    val canon = Graph.canonicalUndirected(raw, "a", "b").localCheckpoint()
    val oriented = Graph.orientByDegree(canon).localCheckpoint()
    val m = oriented.count()
    val bitsCapped = math.min(math.max(m * 10L, 1L << 20), Graph.WedgeBloomMaxBits)
    val bitsIdeal = m * 10L
    def build(bits: Long): Array[Byte] = SessionScope.headUnderConf(
      oriented.agg(BloomScreen.bloomAgg(struct(col("src"), col("dst")),
        m, bits)), caps(m, bits)).getAs[Array[Byte]](0)
    val bfCapped = build(bitsCapped)
    val bfIdeal = build(bitsIdeal)
    // one wedge-generation pass, all three counts
    val o1 = oriented.select(col("src").as("u"), col("dst").as("v"),
      col("ddeg").as("dv"))
    val o2 = oriented.select(col("src").as("u"), col("dst").as("w"),
      col("ddeg").as("dw"))
    val skey = struct(col("v"), col("w"))
    val counts = o1.join(o2.hint("shuffle_hash"), Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .agg(count(lit(1)).as("w_total"),
        sum(when(BloomScreen.mightContain(bfCapped, skey), 1L)
          .otherwise(0L)).as("w_capped"),
        sum(when(BloomScreen.mightContain(bfIdeal, skey), 1L)
          .otherwise(0L)).as("w_ideal"))
      .head()
    val (wTotal, wCapped, wIdeal) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    def closing(bf: Array[Byte], label: String): Long = {
      MaxTask.reset()
      val t0 = System.nanoTime()
      val tri = Graph.closedWedges(oriented, bf, hintShuffleHash = true)
        .queryExecution.toRdd.count()
      println(f"""{"probe":"bloom14 close $label","edges":$m,"triangles":$tri,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
      tri
    }
    val triCapped = closing(bfCapped, "capped")
    val triIdeal = closing(bfIdeal, "ideal")
    require(triCapped == triIdeal,
      s"cap changed RESULTS ($triCapped vs $triIdeal) — must never happen")
    val fpCap = (wCapped - triCapped).toDouble / math.max(wTotal - triCapped, 1L)
    val fpIde = (wIdeal - triIdeal).toDouble / math.max(wTotal - triIdeal, 1L)
    println(f"""{"probe":"bloom14 wedges","replicas":$replicas,"edges":$m,"bits_capped":$bitsCapped,"bits_ideal":$bitsIdeal,"w_total":$wTotal,"w_capped":$wCapped,"w_ideal":$wIdeal,"fp_capped":$fpCap%.4f,"fp_ideal":$fpIde%.4f,"triangles":$triCapped}""")
  }

  /** `runMain graft.ScaleProbe bloom15 [replicas]` — the bloom14
    * mitigation claim, measured. bloom14 recorded the capped screen's
    * cost at 30× (closing join 54.9 vs 31.6 s, max task 46.2 s) and
    * ASSERTED the mitigation: "fp volume divides by executors; the max
    * task is a local[32] artifact of partition count". This probe runs
    * the SAME capped closing join at 30× under 32 (control), 64 and
    * 128 shuffle partitions — if the claim holds, max-task drops
    * roughly with partition count while the total stays bounded (same
    * 32 cores, more waves). Rebuilds the bloom14 fixture if the canon
    * parquet is absent. */
  private def bloom15(spark: SparkSession, replicas: Int): Unit = {
    import org.apache.spark.sql.graftx.{BloomScreen, SessionScope}
    import graft.operators.Graph
    spark.sparkContext.addSparkListener(MaxTask)
    val canonPath = "/tmp/graft_bloom14/canon.parquet"
    if (!new java.io.File(canonPath).exists()) {
      val d = "/root/testdata/sf0.1"
      val canon1 = spark.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .filter(col("ok").isNotNull && col("pk").isNotNull)
        .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
        .select(explode(col("ps")).as("a"), col("ps"))
        .select(col("a"), explode(col("ps")).as("b"))
        .filter(col("a") < col("b"))
      (0 until replicas).map { r =>
        val off = r * 10000000L
        canon1.select((col("a") + off).as("a"), (col("b") + off).as("b"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(canonPath)
    }
    val raw = spark.read.parquet(canonPath)
    val canon = Graph.canonicalUndirected(raw, "a", "b").localCheckpoint()
    val oriented = Graph.orientByDegree(canon).localCheckpoint()
    val m = oriented.count()
    val bitsCapped = math.min(math.max(m * 10L, 1L << 20), Graph.WedgeBloomMaxBits)
    val bfCapped = SessionScope.headUnderConf(
      oriented.agg(BloomScreen.bloomAgg(struct(col("src"), col("dst")),
        m, bitsCapped)),
      Map("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> m.toString,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bitsCapped.toString))
      .getAs[Array[Byte]](0)
    // AQE's partition coalescing would fold 64/128 partitions of a
    // ~2 GB wedge shuffle back toward the 64 MB advisory size and
    // erase the lever under test; pin it off for control AND variants
    // so the comparison isolates partition count (a real cluster's
    // equivalent lever is executor count, which AQE never coalesces
    // below).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    for (parts <- Seq(32, 64, 128); rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      MaxTask.reset()
      val t0 = System.nanoTime()
      val tri = Graph.closedWedges(oriented, bfCapped, hintShuffleHash = true)
        .queryExecution.toRdd.count()
      println(f"""{"probe":"bloom15 close capped","parts":$parts,"rep":$rep,"edges":$m,"triangles":$tri,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.exists(Set("quota7", "pipe7", "freq7", "serve8",
        "outlier8", "budget8", "ids8", "aqe8", "rtfilter8", "prefix8",
        "sparse9", "interop9", "graph9", "bucket9", "semdedup9", "tri9",
        "kcore9", "linkpred10", "lpa11", "sparse11", "recall12",
        "lpa12", "crossover12", "headroom12", "sparse12", "assoc12",
        "headroom13", "assoc13", "sparse13", "sparse13b", "ckpt13x",
        "bloom14", "madsort15", "bloom15", "jobs16"))) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      args.head match {
        case "quota7" => quota7(spark)
        case "pipe7"  => pipe7(spark)
        case "freq7"  => freq7(spark)
        case "serve8" => serve8(spark)
        case "outlier8" => outlier8(spark, args.lift(1).contains("exact20"))
        case "budget8" => budget8(spark)
        case "ids8" => ids8(spark)
        case "aqe8" => aqe8(spark)
        case "rtfilter8" => rtfilter8(spark)
        case "prefix8" => prefix8(spark)
        case "sparse9" => sparse9(spark)
        case "interop9" => interop9(spark)
        case "graph9" => graph9(spark)
        case "bucket9" => bucket9(spark)
        case "semdedup9" => semdedup9(spark)
        case "tri9" => tri9(spark)
        case "kcore9" => kcore9(spark)
        case "linkpred10" => linkpred10(spark)
        case "lpa11" => lpa11(spark)
        case "sparse11" => sparse11(spark)
        case "recall12" => recall12(spark)
        case "lpa12" => lpa12(spark)
        case "crossover12" => crossover12(spark, args.lift(1).map(_.toInt).getOrElse(10))
        case "headroom12" => headroom12(spark)
        case "headroom13" => headroom13(spark)
        case "assoc13" => assoc13(spark)
        case "sparse13" => sparse13(spark)
        case "sparse13b" => sparse13b(spark)
        case "ckpt13x" => ckpt13x(spark)
        case "bloom14" => bloom14(spark, args.lift(1).map(_.toInt).getOrElse(30))
        case "bloom15" => bloom15(spark, args.lift(1).map(_.toInt).getOrElse(30))
        case "sparse12" => sparse12(spark, args.lift(1).map(_.toInt).getOrElse(10))
        case "assoc12" => assoc12(spark)
        case "madsort15" => madsort15(spark)
        case "jobs16" => jobs16(spark, args.drop(1).toSeq)
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("winnow5")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      winnow5(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("bloom5")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      bloom5(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("linkage5")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      linkage5(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("sketch5")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      sketch5(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("ivf6")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      ivf6(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("merge4")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      merge4(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("replay3")) {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      replay3(spark)
      spark.stop()
      return
    }
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val nHot = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    // "shuffle" simulates the at-scale regime: a banded table too big to
    // broadcast joins by exchange on the bucket key, so a hot bucket
    // collapses into one reducer task unless salted. (When the banded
    // side fits the broadcast threshold — the local default — the probe
    // side stays on its even upstream partitioning and skew never
    // forms; salting is then redundant but harmless.) AQE skew-join is
    // disabled so the probe isolates the salt itself; at real scale
    // salting and AQE compose.
    val shuffleRegime = args.contains("shuffle")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        if (shuffleRegime) "-1" else "10485760")
      .config("spark.sql.adaptive.skewJoin.enabled", (!shuffleRegime).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(MaxTask)

    // nHot identical docs (one hot bucket per band) + genuinely unique
    // tail (every token distinct across docs, so tail docs share no
    // minhash bands and no simhash chunks)
    val uniqTokens = (0 until 8).map(i => md5(concat(col("id").cast("string"), lit(s"#$i"))))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") < nHot,
        lit("the quick brown fox jumps over the lazy dog again and again"))
        .otherwise(concat_ws(" ", uniqTokens: _*)).as("text"))
      .cache()
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      MaxTask.reset()
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","pairs":$n,"sec":$s%.2f,"max_task_sec":${MaxTask.max.get() / 1000.0}%.2f}""")
    }

    for (salts <- Seq(1, 8)) {
      time(s"minhash_lsh_candidates salts=$salts") {
        Dedup.lshCandidatePairs(docs, "doc_id", "text", salts = salts).count()
      }
      time(s"simhash_candidates salts=$salts") {
        Dedup.simhashCandidates(
          Dedup.simhashBits(docs, "doc_id", split(col("text"), " ")),
          "doc_id", salts = salts).count()
      }
    }
    spark.stop()
  }
}
