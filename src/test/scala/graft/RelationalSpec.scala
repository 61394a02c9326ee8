package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("topKPerGroup picks deterministic top-1 with tie-break") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 5.0), ("b", 4, 1.0))
      .toDF("g", "id", "score")
    val got = Relational.topKPerGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), 1)
      .select("g", "id").as[(String, Int)].collect().toMap
    assert(got === Map("a" -> 1, "b" -> 4))
  }

  test("firstWinsMerge keeps earliest source per key") {
    val s1 = Seq((1, "one-a")).toDF("k", "v")
    val s2 = Seq((1, "two-a"), (2, "two-b")).toDF("k", "v")
    val got = Relational.firstWinsMerge(Seq(s1, s2), Seq("k"))
      .as[(Int, String)].collect().toMap
    assert(got === Map(1 -> "one-a", 2 -> "two-b"))
  }

  test("coreFlag marks clusters spanning all members") {
    val df = Seq(("c1", "g1"), ("c1", "g2"), ("c2", "g1")).toDF("cluster", "genome")
    val got = Relational.coreFlag(df, "cluster", "genome")
      .select("cluster", "is_core").as[(String, Boolean)].collect().toMap
    assert(got === Map("c1" -> true, "c2" -> false))
  }

  test("priorityMax folds to the most-constrained class") {
    val df = Seq(("g1", "blocked"), ("g1", "essential"), ("g2", "variable"))
      .toDF("gene", "cls")
    val got = Relational.priorityMax(df, Seq("gene"), "cls",
      Seq("blocked" -> 1, "variable" -> 2, "essential" -> 3), "worst")
      .select("gene", "worst").as[(String, String)].collect().toMap
    assert(got === Map("g1" -> "essential", "g2" -> "variable"))
  }

  test("dynamicPivot discovers sorted bounded values") {
    val df = Seq(("u1", "x"), ("u1", "y"), ("u2", "x")).toDF("u", "t")
    val got = Relational.dynamicPivot(df, Seq("u"), "t", count(lit(1))).na.fill(0)
    assert(got.columns.toSeq === Seq("u", "x", "y"))
    assert(got.filter($"u" === "u2").select("y").as[Long].head() === 0L)
  }

  test("strandCoords handles both strands (reference datalake_table.py:16-23)") {
    val df = Seq(("+", 100L, 10L), ("-", 100L, 10L)).toDF("strand", "p0", "len")
    val (s, e) = Relational.strandCoords(col("p0"), col("strand"), col("len"))
    val got = df.select(col("strand"), s.as("s"), e.as("e"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("+", 100L, 109L), ("-", 91L, 100L)))
  }

  test("contiguousIds matches the global row_number, zero post-shuffle exchanges") {
    import org.apache.spark.sql.expressions.Window
    // Scrambled layout + duplicate keys: the (k, payload) pair is the
    // total order; ids must equal the single-partition window's.
    val df = spark.range(0, 500)
      .select((col("id") * 2654435761L % 97).as("k"), col("id").as("payload"))
      .repartition(7)
    val got = Relational.contiguousIds(df, Seq(col("k"), col("payload")), "seq")
    val want = df.withColumn("seq",
      row_number().over(Window.orderBy(col("k"), col("payload"))).cast("long") - 1)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // The final pass is a pure projection over the pinned sorted runs:
    // no window, no exchange beyond the one range shuffle (which sits
    // behind the localCheckpoint).
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"final pass must be exchange- and window-free:\n$p")
  }

  test("orderedPrefixSum matches the global running-sum window") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 300)
      .select((col("id") * 2654435761L % 37).as("k"), col("id").as("tiebreak"),
        (pmod(col("id") * 7, lit(50)) + 1).as("w"))
      .repartition(5)
    val got = Relational.orderedPrefixSum(df,
      Seq(col("k"), col("tiebreak")), col("w"), "cum")
    val want = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("k"), col("tiebreak"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(!got.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "prefix sum must never plan a single-partition stage")
  }

  test("logregTrainGD weights are bit-identical across partitionings") {
    import graft.operators.ModelScoring
    def base(parts: Int) = spark.range(0, 400)
      .select(lit(1.0).as("x0"),
        (pmod(col("id") * 31, lit(512)).cast("double") / 512).as("x1"),
        (pmod(col("id") * 17, lit(128)).cast("double") / 128).as("x2"),
        when(pmod(col("id"), lit(3)) === 0, 1.0).otherwise(0.0).as("y"))
      .repartition(parts).localCheckpoint()
    val w1 = ModelScoring.logregTrainGD(base(1), k = 3, iters = 3)
    val w7 = ModelScoring.logregTrainGD(base(7), k = 3, iters = 3)
    // order-independent EXACT gradient sums: not approximately equal —
    // the same bits regardless of how partial aggregation splits
    assert(w1.map(java.lang.Double.doubleToLongBits) ===
      w7.map(java.lang.Double.doubleToLongBits))
    assert(w1.exists(_ != 0.0), "training must move the weights")
  }

  test("percentileRank matches percent_rank over duplicated values") {
    val df = Seq(5, 1, 3, 3, 9, 1, 7).toDF("s")
    val got = Relational.percentileRank(df, "s")
      .select("s", "pct_rank").as[(Int, Double)].collect().toMap
    // sorted: 1,1,3,3,5,7,9 → strictly-below counts 0,2,4,5,6 over n−1=6
    assert(got === Map(1 -> 0.0, 3 -> 2.0 / 6, 5 -> 4.0 / 6,
      7 -> 5.0 / 6, 9 -> 1.0))
    val p = Relational.percentileRank(df, "s")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"value-table join-back must broadcast:\n$p")
  }
}

/** Cross-source fingerprint overlap on a hand fixture. */
class SourceOverlapSpec extends SparkTestBase {
  import spark.implicits._

  test("sourceOverlap reports jaccard + containments, omits zero-overlap pairs") {
    val docs = Seq(
      (1L, "A", "abcdef"), // shingles(3): abc bcd cde def
      (2L, "B", "abcdef"), // identical set
      (3L, "B", "xyzabc"), // adds xyz yza zab + abc
      (4L, "C", "qqqqqq")  // qqq only — disjoint from A and B
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.Dedup.sourceOverlap(docs, "source", "text", 3)
      .select("source_a", "source_b", "n_common", "jaccard",
        "containment_a", "containment_b")
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.length === 1) // (A,C) and (B,C) share nothing → absent
    val (a, b, common, jac, ca, cb) = got.head
    assert((a, b) === ("A", "B"))
    assert(common === 4L)           // A's 4 shingles all appear in B
    assert(jac === 4.0 / 7)         // |A∪B| = 4 + 7 − 4
    assert(ca === 1.0)              // A fully contained in B
    assert(cb === 4.0 / 7)
  }
}

/** Embedding-level decontamination screen on a hand fixture. */
class EmbedScreenSpec extends SparkTestBase {
  import spark.implicits._

  test("broadcastCosineScreen flags train vectors near any eval vector") {
    val train = Seq(
      (1L, Array(1f, 0f)),     // cos vs eval = 1.0
      (2L, Array(0f, 1f)),     // cos = 0 → clean
      (3L, Array(0.8f, 0.6f)), // cos = 0.8
      (4L, Array(-1f, 0f))     // cos = −1 → clean
    ).toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .broadcastCosineScreen(train, eval, "vec_id", "embedding", 0.7)
      .as[(Long, Double, Long)].collect()
      .map { case (id, c, n) => id -> ((math.rint(c * 1e6) / 1e6, n)) }.toMap
    assert(got === Map(1L -> ((1.0, 1L)), 3L -> ((0.8, 1L))))
  }

  test("the eval side broadcasts; the aggregation is partial map-side") {
    val train = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val eval = Seq((2L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val p = graft.operators.Similarity
      .broadcastCosineScreen(train, eval, "vec_id", "embedding", 0.5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"),
      s"eval must broadcast under the train stream:\n$p")
    assert(p.contains("partial_max"),
      s"per-id max must partial-agg before the exchange:\n$p")
  }
}

/** Connected-components dedup clustering on hand fixtures. */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("duplicateClusters merges chains and keeps islands separate") {
    // chain 1-2-3 (one cluster), island 7-8, singleton via no pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = graft.operators.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    val reps = graft.operators.Dedup.representatives(
      graft.operators.Dedup.duplicateClusters(pairs))
      .as[Long].collect().toSet
    assert(reps == Set(1L, 7L))
  }

  test("duplicateClusters handles a long path within iteration budget") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.operators.Dedup.duplicateClusters(pairs)
      .agg(countDistinct(col("cluster_id"))).collect().head.getLong(0)
    assert(out == 1L)
  }

  test("pointer jumping collapses a 100-node chain in the default budget") {
    // plain neighbor-min propagation needs ~99 rounds for this graph;
    // path halving must converge within maxIters=20 (O(log diameter))
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.operators.Dedup.duplicateClusters(pairs, maxIters = 20)
      .as[(Long, Long)].collect()
    assert(out.length == 100 && out.forall(_._2 == 0L))
  }
}

/** As-of join semantics on hand fixtures. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("asofJoin picks latest right <= left.ts, null when none precedes") {
    val left = Seq((100L, "k", 10L), (101L, "k", 25L), (102L, "k", 5L))
      .toDF("event_id", "key", "ts")
    val right = Seq((900L, "k", 10L), (901L, "k", 20L), (902L, "z", 1L))
      .toDF("event_id", "key", "ts")
    val out = graft.operators.Relational
      .asofJoin(left, right, "key", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      100L -> Some(900L), // tie at ts=10: right sorts first (<= semantics)
      101L -> Some(901L), // latest preceding
      102L -> None))      // nothing at or before ts=5
  }
}

/** Banded range join semantics on hand fixtures. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("rangeJoin matches exactly the in-window pairs, each once") {
    val left = Seq((1L, "k", 100L), (2L, "k", 250L), (3L, "z", 100L))
      .toDF("lid", "key", "ts")
    val right = Seq((10L, "k", 95L), (11L, "k", 160L), (12L, "k", 400L))
      .toDF("rid", "key", "ts")
    val out = graft.operators.Relational
      .rangeJoin(left, right, "key", "ts", window = 60L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    // in-window: |100-95|=5, |100-160|=60 (boundary, inclusive);
    // out: |250-160|=90, |250-400|=150, and key z has no partners
    assert(out == Set((1L, 10L), (1L, 11L)))
  }
}

/** The remaining small operators: TSV-variant strand swap, deterministic
  * sampling, and the dedup keep-set composition. */
class SmallOpsSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("strandSwap swaps coordinates only on the minus strand") {
    val df = Seq((10L, 20L, "+"), (10L, 20L, "-")).toDF("s", "e", "strand")
    val (s2, e2) = graft.operators.Relational.strandSwap(col("s"), col("e"), col("strand"))
    val out = df.select(col("strand"), s2.as("s2"), e2.as("e2"))
      .as[(String, Long, Long)].collect()
      .map { case (st, a, b) => st -> ((a, b)) }.toMap
    assert(out("+") == ((10L, 20L)) && out("-") == ((20L, 10L)))
  }

  test("packBins carves the per-group token stream into capacity bins") {
    val docs = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1500L), ("a", 3L, 100L), ("a", 4L, 5000L),
      ("b", 1L, 2048L), ("b", 2L, 1L))
      .toDF("grp", "id", "n")
    val out = graft.operators.Packing.packBins(docs, "grp", "id", "n", 2048L)
      .select("grp", "id", "bin", "bin_offset")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", 1L)) == ((0L, 0L)))    // starts at 0
    assert(out(("a", 2L)) == ((0L, 1000L))) // straddles into bin 1
    assert(out(("a", 3L)) == ((1L, 452L)))  // 2500 % 2048
    assert(out(("a", 4L)) == ((1L, 552L)))  // oversized doc still placed
    assert(out(("b", 1L)) == ((0L, 0L)))    // exact-capacity doc fills bin 0
    assert(out(("b", 2L)) == ((1L, 0L)))    // next doc opens bin 1
    val stats = graft.operators.Packing.binStats(
      graft.operators.Packing.packBins(docs, "grp", "id", "n", 2048L),
      "grp", "n", 2048L)
      .filter(col("grp") === "b").orderBy("bin")
      .select("n_docs", "tokens").as[(Long, Long)].collect().toSeq
    assert(stats == Seq((1L, 2048L), (1L, 1L)))
  }

  test("trainingOrder: stable hash shards with dense 1-based positions") {
    val docs = spark.range(200).select(col("id"))
    val out = graft.operators.Packing.trainingOrder(docs, "id", "seedX", 8)
      .select("id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are dense 1..n inside every shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: a re-run and a different input partitioning agree
    val out2 = graft.operators.Packing.trainingOrder(
      docs.repartition(7), "id", "seedX", 8)
      .select("id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // the seed actually changes the order
    val other = graft.operators.Packing.trainingOrder(docs, "id", "seedY", 8)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val same = out.count { case (id, s, _) => other(id) == s }
    assert(same < 200, "different seed must reshuffle")
  }

  test("weightedMix realizes the target mixture and uses the bottleneck fully") {
    // sources 1000/300/100 rows at weights 0.5/0.3/0.2:
    // T = min(2000, 1000, 500) = 500 -> keep 250/150/100
    def src(n: Long, off: Long) = spark.range(n)
      .select((col("id") + off).as("id"))
    val mixed = graft.operators.Sampling.weightedMix(
      Seq(("big", src(1000, 0), 0.5), ("mid", src(300, 10000), 0.3),
        ("small", src(100, 20000), 0.2)), "id")
    val counts = mixed.groupBy("mix_source").count()
      .as[(String, Long)].collect().toMap
    // the bottleneck source's threshold is exactly 10000 -> kept in full
    assert(counts("small") == 100L)
    // the others hash-sample to the exact-mixture expectation (±20%)
    assert(math.abs(counts("big") - 250L) < 50, s"big=${counts("big")}")
    assert(math.abs(counts("mid") - 150L) < 30, s"mid=${counts("mid")}")
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val sampled = graft.operators.Sampling.stratifiedSample(
      df, "id", "stratum", Map("a" -> 0.2), defaultRate = 0.8)
    val counts = sampled.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    // hash threshold: expected 200 of 1000 for a, 800 of 1000 for b (±10%)
    assert(math.abs(counts("a") - 200L) < 60, s"a=${counts("a")}")
    assert(math.abs(counts("b") - 800L) < 60, s"b=${counts("b")}")
    // deterministic: same call, same rows
    val again = graft.operators.Sampling.stratifiedSample(
      df, "id", "stratum", Map("a" -> 0.2), defaultRate = 0.8)
      .select("id").as[Long].collect().toSet
    assert(again == sampled.select("id").as[Long].collect().toSet)
  }

  test("keepSet = representatives + never-paired rows, covering the corpus") {
    val corpus = (1L to 10L).map(i => Tuple1(i)).toDF("vid")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val keep = graft.operators.Dedup.keepSet(corpus, "vid", pairs)
      .as[Long].collect().toSet
    // clusters {1,2,3}->1 and {7,8}->7; rows 4,5,6,9,10 untouched
    assert(keep == Set(1L, 4L, 5L, 6L, 7L, 9L, 10L))
  }

  test("quantileNormalize: hand-computed map, ties, identity, null drops, guard") {
    import graft.operators.Relational
    // A = {1,2,3,4}, B = {10,20}; global sorted {1,2,3,4,10,20}, N = 6.
    // t = ceil(r·N/ns): A → ranks 1..4 of 4 → t = 2,3,5,6 → norms
    // 2,3,10,20; B → ranks 1,2 of 2 → t = 3,6 → norms 3,20.
    val df = (Seq(("A", 1), ("A", 2), ("A", 3), ("A", 4),
      ("B", 10), ("B", 20)))
      .toDF("src", "v")
    val got = Relational.quantileNormalize(df, "src", "v", outCol = "nv")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set(("A", 1, 2), ("A", 2, 3), ("A", 3, 10), ("A", 4, 20),
      ("B", 10, 3), ("B", 20, 20)), s"map mismatch: $got")
    // ties rank by their LAST occurrence: A = {5,5,7} → r(5)=2 of 3
    // → t = ceil(2·3/3) = 2 (global {5,5,7}: 5 spans [1,2]) → 5
    val tied = Seq(("A", 5), ("A", 5), ("A", 7)).toDF("src", "v")
    val gotTied = Relational.quantileNormalize(tied, "src", "v", outCol = "nv")
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(gotTied == Set((5, 5), (7, 7)), s"tie handling: $gotTied")
    // a tiny rank bucket exercises multi-bucket spans, same answer
    val gotB1 = Relational.quantileNormalize(df, "src", "v", outCol = "nv",
      rankBucket = 1L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(gotB1 == got, "bucket size must not change the map")
    // null source / score rows drop
    val withNulls = df.unionByName(
      Seq((null.asInstanceOf[String], 1), ("A", 99)).toDF("src", "v")
        .withColumn("v", when(col("v") === 99, lit(null)).otherwise(col("v"))
          .cast("int")))
    assert(Relational.quantileNormalize(withNulls, "src", "v").count() == 6L)
    // single source: the map is the identity (t lands on v's own range)
    val solo = Seq.tabulate(20)(i => ("only", i % 7)).toDF("src", "v")
    val idm = Relational.quantileNormalize(solo, "src", "v", outCol = "nv")
      .filter(col("v") =!= col("nv")).count()
    assert(idm == 0L, "single-source normalization must be the identity")
    // past the exact-integer bound the plan fails loudly
    val ex = intercept[Exception] {
      Relational.quantileNormalize(df, "src", "v", overflowBound = 4.0)
        .collect()
    }
    assert(ex.getMessage.contains("exact-integer bound") ||
      Option(ex.getCause).exists(_.getMessage.contains("exact-integer bound")),
      s"expected the overflow guard, got: $ex")
  }
}
