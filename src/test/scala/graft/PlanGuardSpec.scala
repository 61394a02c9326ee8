package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale properties the engine is
  * designed around, asserted against the actual physical plans so a
  * refactor can't silently trade them away. (PLANS.md shows the full
  * curated plans; these tests pin the load-bearing markers.)
  */
class PlanGuardSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfSmoke)
      .queryExecution.executedPlan.toString

  test("s1 scan: filter pushed down, columns pruned") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"filter must reach the scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_shipdate:timestamp_ntz>"),
      s"scan must read only the 4 needed columns:\n$p")
  }

  test("star join: all dims broadcast, no sort-merge on the fact") {
    val p = plan("j4_star")
    assert(!p.contains("SortMergeJoin"), s"fact must not sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
  }

  test("incremental LSH probe: batch side broadcasts, index never shuffles") {
    val p = plan("dedup_lsh_probe")
    assert(p.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$p")
    assert(p.contains("BuildLeft"), s"the batch (left) side must build:\n$p")
  }

  test("default similarity paths have no cartesian shape") {
    for (q <- Seq("ann_lsh_topk", "ann_lsh_multiprobe", "ann_ivf_topk",
      "dedup_minhash_lsh", "dedup_simhash_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degraded to cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q degraded to nested-loop:\n$p")
    }
  }

  test("grep search: postings filtered before the candidate agg, no cartesian") {
    val p = plan("grep_search")
    // the pattern's trigram IN-filter must sit on the posting build
    // side (candidates bounded by the pattern's postings, never the
    // corpus), and the verify fetch is an equi-join
    assert(p.contains("trigram") && (p.contains(" IN ") || p.contains("INSET")),
      s"trigram filter must prune the postings:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"verify fetch must stay an equi-join:\n$p")
  }

  test("tbl_ani merge: broadcast-free window on the pair key, no cartesian") {
    val p = plan("tbl_ani")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"4-source merge must stay a union + window:\n$p")
    assert(p.contains("row_number"), s"first-wins rank must be a window:\n$p")
  }

  test("ml_calibration: map-side binning, no window, one agg exchange") {
    val p = plan("ml_calibration")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"fixed-width bins must not need a sort/ntile window:\n$p")
    assert(p.contains("HashAggregate"), s"report must be a hash aggregate:\n$p")
  }

  test("sample_temperature: normalizer broadcasts back, corpus scanned once") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastExchange"),
      s"the 1-row normalizer must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"language-count frame must never sort-merge:\n$p")
  }

  test("quality_repetition: doc-keyed partial aggs, no corpus-global window") {
    val p = plan("quality_repetition")
    assert(!p.contains("WindowExec"), s"repetition metrics need no window:\n$p")
    assert(p.contains("partial_"), s"both stages must map-side combine:\n$p")
  }

  test("int8 quantization is map-side only (no keyed exchange)") {
    val p = plan("embed_quantize")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"quantization must not shuffle on a key:\n$p")
  }

  test("shard manifest is one partial-agg pass") {
    val p = plan("shard_manifest")
    // exactly one hash exchange (the shard groupBy), with a partial
    // aggregate below it so the map side combines
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"manifest must shuffle once:\n$p")
    assert(p.contains("partial_"), s"map-side combine required:\n$p")
  }

  test("interval join keeps pushed event-type filters and an equi-key join") {
    val p = plan("stream_attribution")
    assert(p.contains("EqualTo(event_type,click)") &&
      p.contains("EqualTo(event_type,purchase)"),
      s"event filters must reach both scans:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the range condition must ride the equi-key hash join:\n$p")
  }

  test("hashed quality scorer is map-side only (no keyed exchange)") {
    val p = plan("ml_quality_filter")
    // The scoring itself must never shuffle: no hash/range exchange.
    // A single ROUND-ROBIN exchange is permitted — that's the gated
    // scan rebalance (Relational.computeRebalance) decoupling scan
    // from compute parallelism on the single-row-group fixture; at
    // production partition counts it's a no-op and the plan is pure.
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"scorer must not shuffle on a key:\n$p")
  }

  test("z-order key needs only the 1-row bounds exchange") {
    val p = plan("layout_zorder")
    // one SinglePartition exchange under the bounds agg; the fact side
    // itself is never exchanged to compute zval
    assert(p.contains("Exchange SinglePartition"),
      s"bounds agg must merge on one partition:\n$p")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"the fact side must not shuffle to compute zval:\n$p")
    assert(p.contains("BroadcastExchange"), s"bounds must broadcast:\n$p")
  }

  test("tfidf: the vocabulary-sized idf side joins by shuffle, never broadcast") {
    val p = plan("tfidf_topk")
    assert(!p.contains("BroadcastHashJoin"),
      s"idf must not broadcast-join (vocabulary-sized at scale):\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"the term join must be a shuffle-hash join:\n$p")
  }

  test("spread: already-parallel sources are NOT round-robined") {
    import org.apache.spark.sql.functions._
    def corpus(parts: Int): DataFrame =
      spark.range(0, 256, 1, parts)
        .select(col("id").cast("string").as("doc_id"),
          concat(lit("some text body "), col("id")).as("text"))
    // >= numShufflePartitions (4 in tests): the gate must skip the exchange
    val p = graft.operators.Dedup.shingleTable(corpus(8), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("RoundRobinPartitioning"),
      s"a parallel source must keep its partitioning (no full-corpus exchange):\n$p")
    // single-partition fixture shape: the exchange must still fire
    val p2 = graft.operators.Dedup.shingleTable(corpus(1), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(p2.contains("RoundRobinPartitioning"),
      s"a single-partition source must spread across the session parallelism:\n$p2")
  }

  test("tfidf: corpus is tokenized once (single explode subtree in the plan)") {
    val p = plan("tfidf_topk")
    val explodes = "Generate explode".r.findAllIn(p).length
    assert(explodes <= 1,
      s"expected at most one tokenize (explode) subtree, found $explodes:\n$p")
  }

  test("winnow fingerprints run shuffle-free (no Window, no Exchange)") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(0, 64, 1, 8)
      .select(col("id").cast("string").as("doc_id"),
        concat(lit("body text for winnowing "), col("id")).as("text"))
    val p = graft.operators.Dedup.winnowFingerprints(corpus, "doc_id", "text", 20, 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"winnowing is doc-local and must stay map-side:\n$p")
  }

  test("lm scoring joins the vocabulary-sized model by shuffle, never broadcast") {
    val p = plan("lm_perplexity")
    assert(!p.contains("BroadcastHashJoin"),
      s"bigram/context model sides must not broadcast (vocabulary-sized at scale):\n$p")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 2,
      s"both model joins must be shuffle-hash:\n$p")
  }

  test("bloom decontamination screens map-side before the exact join") {
    val p = plan("decontaminate_bloom")
    assert(p.contains("might_contain"),
      s"the Bloom probe must appear as a filter:\n$p")
    // The sketch screen means the exact gram join must NOT be fed by an
    // unconditional broadcast (eval grams past broadcast size is the
    // path's premise; the screened side carries the fpp share of the
    // corpus) — the operator hints shuffle-hash, like TfIdf's idf join.
    assert(!p.contains("BroadcastHashJoin"),
      s"neither gram side may convention-broadcast:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"exact gram join must be a shuffle-hash join:\n$p")
  }

  test("serving DSL filters compile to pushed-down scan predicates") {
    val p = plan("dsl_page_filter")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"DSL predicates must reach the parquet scan:\n$p")
  }

  test("pmi: counts computed once, vocab joins by shuffle, never broadcast") {
    val p = plan("ngram_pmi")
    // unigram/bigram count frames are checkpointed — the final plan must
    // not re-explode the corpus per consumer...
    assert(!p.contains("Generate explode"),
      s"corpus must not re-tokenize per count consumer:\n$p")
    // ...and the vocabulary-sized count joins must never broadcast
    // (bigram vocab is 100M+ at web scale; only scalar totals may).
    assert(!p.contains("BroadcastHashJoin"),
      s"vocab-sized sides must not broadcast-join:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"the unigram joins must be shuffle-hash joins:\n$p")
  }

  test("resample: bucket-dedup runs once and the value side never broadcasts") {
    val p = plan("ts_resample")
    // the per-(key,bucket) dedup is checkpointed — the raw log must not
    // be re-windowed per consumer (only the forward-fill window remains)
    assert(!p.contains("row_number()"),
      s"the bucket-dedup window must run once (behind the checkpoint):\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the corpus-sized observation side must not broadcast:\n$p")
  }

  test("dsir: vocabulary-sized count sides join by shuffle, never broadcast") {
    val p = plan("dsir_weights")
    // raw + target unigram tables are vocab-sized: like the lm/tfidf/pmi
    // pins, they must come in via ShuffledHashJoin; the only broadcasts
    // are the 1-row totals
    assert(p.contains("ShuffledHashJoin"),
      s"count tables must shuffle-hash join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("containment dedup: pairs stay inside fingerprint buckets") {
    val p = plan("dedup_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join on (fp, salt):\n$p")
  }

  test("token budget: bin table broadcasts back, no row-level global window") {
    val p = plan("select_token_budget")
    assert(p.contains("BroadcastHashJoin"),
      s"the bin-domain cumsum table must broadcast onto the rows:\n$p")
    // the partition-less-window sweep below proves no global row window
  }

  test("ids_contiguous: final pass is a pure projection (no window, no exchange)") {
    val p = plan("ids_contiguous")
    assert(!p.contains("Window") && !p.contains("Exchange"),
      s"global id assignment must not re-shuffle or window after the range sort:\n$p")
    assert(p.contains("monotonically_increasing_id"),
      s"ids must derive from the partition-local record index:\n$p")
  }

  test("score_percentile: one corpus scan, value table broadcasts back") {
    val p = plan("score_percentile")
    assert(p.contains("BroadcastHashJoin"),
      s"the V-row percentile table must broadcast onto the corpus:\n$p")
    assert("FileScan".r.findAllIn(p).size === 1,
      s"the corpus must be scanned exactly once (counts ride the checkpoint):\n$p")
  }

  test("decontaminate_embed: eval broadcasts, screen aggregates map-side") {
    val p = plan("decontaminate_embed")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"),
      s"the eval split must broadcast under the streaming train scan:\n$p")
    assert(p.contains("partial_max"),
      s"per-id max must partial-agg before the exchange:\n$p")
  }

  test("source_overlap: no cartesian; per-source sizes broadcast") {
    val p = plan("source_overlap")
    assert(!p.contains("CartesianProduct"), s"pair join degraded:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"size dims must broadcast:\n$p")
  }

  test("ann_ivf_probe: batch side broadcasts into the index cells") {
    val p = plan("ann_ivf_probe")
    assert(p.contains("BroadcastHashJoin"),
      s"the ingest batch must broadcast; the index never shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell search degraded to a cartesian shape:\n$p")
  }

  test("dedup_minhash_estimate: stays in signature space, no cartesian") {
    val p = plan("dedup_minhash_estimate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"estimate join degraded:\n$p")
    // both estimate sides read the checkpointed signature table, not text
    assert(!p.contains("FileScan"),
      s"estimate must not re-scan the corpus (signatures are pinned):\n$p")
  }

  test("sparse_cosine_pairs: pairs stay inside posting lists, no cartesian") {
    // (the vocabulary-sized idf join sits behind the wts checkpoint —
    // its shuffle_hash pin is the same as tfidf's, asserted there)
    val p = plan("sparse_cosine_pairs")
    assert(p.contains("Join [term"), // equi-join keyed on the term
      s"pair generation must be the posting-list equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation degraded to a cartesian shape:\n$p")
  }

  test("w6 keyset page: cursor predicate reaches the scan, TakeOrdered limit") {
    val p = plan("w6_keyset_page")
    assert(p.contains("GreaterThan(o_orderdate"),
      s"the cursor predicate must push to the parquet scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the page must come from per-partition heaps, not a global sort:\n$p")
  }

  test("score_quantile_norm: rank lookup is a bucketed equi join, never a nested loop") {
    // the 1-row total (crossJoin(broadcast(nTot))) legitimately
    // compiles to a BroadcastNestedLoopJoin, so pin the SHAPE of the
    // range lookup instead: it must be a hash join KEYED on the rank
    // bucket, with the [lo, hi] range as a post-join condition
    val p = plan("score_quantile_norm")
    assert(!p.contains("CartesianProduct"),
      s"score_quantile_norm contains a cartesian:\n$p")
    assert(p.contains("HashJoin [__bkt"),
      s"the t∈[lo,hi] lookup must be an equi hash join on the bucket:\n$p")
  }

  test("graph_linkpred: wedge joins stay equi-keyed, top-k is TakeOrdered") {
    val p = plan("graph_linkpred")
    // candidate pairs come ONLY through shared centers (equi-keyed
    // wedge self-join) — never a pair-exploding cartesian/nested-loop
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"linkpred degraded to a pair-exploding join:\n$p")
    // existing edges are removed by an anti join, not a driver filter
    assert(p.contains("LeftAnti"),
      s"adjacency removal must be an anti join:\n$p")
    // k rows come from per-partition heaps, not a global sort
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered:\n$p")
  }

  test("graph tier: triangles/kcore stay shuffle-join-shaped, LPA picks without a window") {
    // triangleCounts' wedge + closing joins must never degrade to a
    // pair-exploding cartesian/nested-loop
    val pt = plan("graph_triangles")
    assert(!pt.contains("CartesianProduct"),
      s"graph_triangles degraded to cartesian:\n$pt")
    assert(!pt.contains("BroadcastNestedLoopJoin"),
      s"graph_triangles degraded to nested-loop:\n$pt")
    // The triangle list is checkpointed (lineage truncated), so pin
    // the PRE-checkpoint wedge/closing sub-plan directly: the
    // closing-edge Bloom screen must probe the wedge stream map-side,
    // BEFORE its exchange into the closing join — at the 10× point it
    // drops ~95% of a 413M-row shuffle (headroom13, SCALE.md) — and
    // neither wedge-shaped join pays a sort (a wedge stream is pure
    // fan-out: hashed, never ordered).
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, struct}
      val canon = graft.operators.Graph.canonicalUndirected(
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b"), "a", "b")
      val oriented = graft.operators.Graph.orientByDegree(canon)
      val bf = oriented.agg(org.apache.spark.sql.graftx.BloomScreen
        .bloomAgg(struct(col("src"), col("dst")), 4L, 1L << 16))
        .head().getAs[Array[Byte]](0)
      // scale shape (edge frame past broadcast size): hash-joined,
      // never sorted
      val pw = graft.operators.Graph
        .closedWedges(oriented, bf, hintShuffleHash = true)
        .queryExecution.executedPlan.toString
      assert(pw.contains("might_contain"),
        s"wedge stream lost the closing-edge bloom screen:\n$pw")
      assert(pw.contains("ShuffledHashJoin"),
        s"wedge joins must hash, not sort-merge:\n$pw")
      assert(!pw.contains("SortMergeJoin"),
        s"a wedge stream must never be sorted into its joins:\n$pw")
      // small shape (edge frame broadcast-sized): the unhinted planner
      // must broadcast — the wedge stream then never exchanges at all,
      // which an unconditional shuffle_hash hint would forbid
      val ps = graft.operators.Graph
        .closedWedges(oriented, bf, hintShuffleHash = false)
        .queryExecution.executedPlan.toString
      assert(ps.contains("might_contain") &&
        ps.contains("BroadcastHashJoin"),
        s"small-graph wedge joins must broadcast the edge side:\n$ps")
    }
    // kCore's full plan truncates per round (localCheckpoint), so pin
    // ONE peel round's pre-checkpoint sub-plan in each of its three
    // adaptive shapes: fixed point → input frame returned untouched;
    // small drop set → broadcast LeftAnti (edges never shuffle); huge
    // drop set (forced via broadcastLimit = 0) → shuffle LeftSemi
    // against the survivors — the distributed fallback.
    locally {
      import spark.implicits._
      // triangle (all deg 2) + pendant 3-4: k=2 drops exactly node 4
      val canon = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
        .toDF("lo", "hi")
      val stable = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("lo", "hi")
      assert(graft.operators.Graph.peelRound(stable, k = 2L) eq stable,
        "a dropless peel must return its input frame (fixed-point signal)")
      val peel = graft.operators.Graph.peelRound(canon, k = 2L)
      val pp = peel.queryExecution.executedPlan.toString
      assert(pp.contains("LeftAnti") && pp.contains("BroadcastHashJoin"),
        s"small-drop peel must broadcast-anti-join the drop set:\n$pp")
      val peelWide = graft.operators.Graph.peelRound(canon, k = 2L,
        broadcastLimit = 0L)
      val pw = peelWide.queryExecution.executedPlan.toString
      assert(pw.contains("LeftSemi"),
        s"wide-drop peel must semi-join the survivor set:\n$pw")
      for (p <- Seq(pp, pw))
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"peel degraded to a pair-exploding join:\n$p")
      // and both paths peel identically on this fixture
      assert(peel.count() == 3L && peelWide.count() == 3L)
      assert(graft.operators.Graph.peelRound(canon, k = 3L).count() == 0L)
    }
    // LPA's winning-label pick is ONE order-independent PARTIAL
    // AGGREGATE over the raw neighbor-label stream — deterministic
    // mode() counts multiplicities AND breaks ties to the lowest
    // label in a single exchange (the former count-then-argmax
    // spelling paid two; a per-node row_number window would
    // additionally lose map-side combine — the oracle spells it as a
    // window; the engine must not). The full LPA plan truncates per
    // round (localCheckpoint), so the guard pins the pick sub-plan
    // itself.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // neighbor-label multiset: node 1 sees lab 1 x2 / lab 2 x2 (tie ->
    // lowest wins), node 2 sees lab 1 once
    val nbrLabs = Seq((1L, 1L), (1L, 2L), (1L, 1L), (1L, 2L), (2L, 1L))
      .toDF("id", "lab")
    val pick = graft.operators.Graph.winningLabels(nbrLabs)
    val pp = pick.queryExecution.executedPlan.toString
    assert(!pp.contains("Window"),
      s"LPA must pick via aggregate, not window:\n$pp")
    assert(pp.contains("partial_mode") || pp.contains("mode(lab"),
      s"LPA pick must be a single deterministic-mode partial aggregate:\n$pp")
    assert(pp.split('\n').count(_.contains("Aggregate")) <= 2,
      s"LPA pick must be ONE two-phase aggregate, not a count+argmax pair:\n$pp")
    // and the pick itself resolves the documented tie-break
    assert(pick.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("no query plans a partition-less WindowExec") {
    import org.apache.spark.sql.execution.window.WindowExec
    // A window with an empty partition spec funnels ALL rows into one
    // task ("No Partition Defined" warning). Bounded frames are given
    // partitionBy(lit(0)) instead — same single partition, but an
    // explicit, greppable declaration that the frame is driver-small.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // collect() does not descend into AdaptiveSparkPlanExec (a leaf to
    // the tree API) — unwrap it or the sweep sees nothing under AQE
    def globalWindows(p: SparkPlan): Seq[String] = p.collect {
      case a: AdaptiveSparkPlanExec => globalWindows(a.inputPlan)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(w.windowExpression.mkString(","))
    }.flatten
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        globalWindows(fn(spark, sfSmoke).queryExecution.executedPlan)
          .map(h => s"$name: $h")
    }
    assert(offenders.isEmpty,
      s"global windows found (add partitionBy(lit(0)) or a real key):\n${offenders.mkString("\n")}")
  }
}
