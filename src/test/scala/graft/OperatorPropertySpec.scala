package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Cohorts, Experiments, Funnel, Packing, RecordLinkage, Sampling}

/** Brute-force property pins for the operators that had only their
  * oracle-gated fixture query: randomized inputs (fixed ScalaCheck
  * seed), a from-first-principles Scala reference, exact comparison.
  * Numeric fixtures use integer-valued metrics so both sides' sums are
  * exact and the closing IEEE expressions see identical inputs —
  * bit-equality, no tolerance. */
class OperatorPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(1313L + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  private def round2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  private def md5Prefix(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  // ---------------------------------------------------------------- Funnel

  test("Funnel.steps == per-user strict-ordered scan (with and without window)") {
    val stepTypes = Seq("view", "click", "buy")
    val evGen = Gen.zip(Gen.chooseNum(0L, 19L),
      Gen.oneOf(stepTypes ++ Seq("noise")), Gen.chooseNum(0L, 4000000L))
    val events = sample(evGen, 400)
    val df = events.toDF("user", "etype", "ts_us")

    def brute(windowUs: Option[Long]): Seq[(String, Int, Long, Double)] = {
      val byUser = events.groupBy(_._1)
      // per user: earliest completion time of each step, strictly ordered
      val reached: Map[Long, Seq[(Long, Long)]] = byUser.flatMap {
        case (u, evs) =>
          val t0s = evs.filter(_._2 == stepTypes.head).map(_._3)
          if (t0s.isEmpty) None
          else {
            val t0 = t0s.min
            val times = stepTypes.tail.scanLeft(Option(t0)) {
              case (Some(prev), st) =>
                val nexts = evs.filter(e => e._2 == st && e._3 > prev &&
                  windowUs.forall(w => e._3 < t0 + w)).map(_._3)
                if (nexts.isEmpty) None else Some(nexts.min)
              case (None, _) => None
            }
            Some(u -> times.takeWhile(_.isDefined).map(t => (t0, t.get)))
          }
      }
      stepTypes.zipWithIndex.map { case (st, i) =>
        val rows = reached.values.collect {
          case ts if ts.length > i => ts(i)
        }.toSeq
        val n = rows.length.toLong
        val avg = round2(rows.map { case (t0, t) => t - t0 }.sum.toDouble /
          n / 1000000)
        (st, i, n, avg)
      }
    }

    for (win <- Seq(None, Some(1500000L))) {
      val got = Funnel.steps(df, "user", "etype", "ts_us", stepTypes, win)
        .as[(String, Int, Long, Double)].collect().sortBy(_._2).toSeq
      assert(got == brute(win), s"window=$win")
      assert(got.head._3 > 0, "degenerate fixture: nobody entered the funnel")
    }
  }

  // --------------------------------------------------------------- Cohorts

  test("Cohorts.retention == per-user first-period scan") {
    val P = 1000000L
    val evGen = Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 9999999L),
      Gen.oneOf(0, 1))
    val events = sample(evGen, 500)
    val df = events.toDF("user", "ts_us", "act")

    val up = events.filter(_._3 == 1)
      .map { case (u, ts, _) => (u, ts / P) }.distinct
    val first = up.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).min }
    val sizes = first.values.groupBy(identity).map { case (c, xs) => c -> xs.size }
    val expect = up.map { case (u, p) => (first(u), p - first(u)) }
      .groupBy(identity).map { case ((c, off), xs) =>
        (c, off, xs.size.toLong, round4(xs.size.toDouble / sizes(c)))
      }.toSet

    val got = Cohorts.retention(df, "user", "ts_us", P, col("act") === 1)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
    assert(expect.exists(_._2 > 0), "degenerate fixture: no later-period activity")
  }

  // ----------------------------------------------------------- welchTTest

  test("Experiments.welchTTest == moments formula on integer metrics") {
    val rowGen = Gen.zip(Gen.oneOf("k1", "k2", "k3"), Gen.oneOf("A", "B"),
      Gen.chooseNum(0L, 100L))
    val rows = sample(rowGen, 600)
    val df = rows.toDF("key", "arm", "m")

    val expect = rows.groupBy(_._1).flatMap { case (k, xs) =>
      def side(arm: String) = {
        val vs = xs.filter(_._2 == arm).map(_._3)
        (vs.length.toLong, vs.sum, vs.map(v => v * v).sum)
      }
      val (na, sa, s2a) = side("A"); val (nb, sb, s2b) = side("B")
      if (na < 2 || nb < 2) None
      else {
        // the operator's exact arithmetic graph on exact integer sums
        val (nad, nbd) = (na.toDouble, nb.toDouble)
        val ma = sa / nad; val mb = sb / nbd
        val va = (s2a - sa.toDouble * sa / nad) / (nad - 1)
        val vb = (s2b - sb.toDouble * sb / nbd) / (nbd - 1)
        Some((k, na, nb, ma, mb, (ma - mb) / math.sqrt(va / nad + vb / nbd)))
      }
    }.toSet

    val got = Experiments.welchTTest(df, col("key"), col("arm"),
        col("m").cast("double"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  // -------------------------------------------------------- RecordLinkage

  test("RecordLinkage candidates/bestMatch == naive all-pairs within blocks") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val nameGen = Gen.listOfN(6, Gen.oneOf("abcde".toSeq)).map(_.mkString)
    val lefts = sample(nameGen, 60).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val rights = sample(nameGen.map(_.reverse), 60).zipWithIndex
      .map { case (s, i) => (i.toLong + 1000, s) }
    val maxDist = 2
    val lf = lefts.toDF("lid", "lname")
    val rf = rights.toDF("rid", "rname")
    val blocks = Seq(
      (substring(col("lname"), 1, 1), substring(col("rname"), 1, 1)),
      (substring(col("lname"), -1, 1), substring(col("rname"), -1, 1)))

    val expect = (for {
      (li, ln) <- lefts; (ri, rn) <- rights
      if ln.take(1) == rn.take(1) || ln.takeRight(1) == rn.takeRight(1)
      d = lev(ln, rn) if d <= maxDist
    } yield (li, ri, d)).toSet
    assert(expect.nonEmpty, "degenerate fixture: no candidate pairs")

    val cands = RecordLinkage.candidates(lf, rf, col("lname"), col("rname"),
      blocks, maxDist)
    val got = cands.select(col("lid"), col("rid"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expect)

    val bestExpect = expect.groupBy(_._1).map { case (li, xs) =>
      val best = xs.toSeq.minBy(p => (p._3, p._2))
      (li, best._2, best._3, xs.size.toLong)
    }.toSet
    val bestGot = RecordLinkage.bestMatch(cands, col("lid"), Seq(col("rid")))
      .select(col("lid"), col("rid"), col("dist"), col("n_candidates"))
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(bestGot == bestExpect)
  }

  // ------------------------------------------------------- negativeSample

  test("negativeSample: k per anchor when fillable, label-disjoint, self-free, replayable") {
    val n = 40
    val corpus = (0 until n).map(i => (i.toLong, s"lab${i % 4}")).toDF("id", "lab")
    val k = 3
    val out = Sampling.negativeSample(corpus, "id", "lab", k)
      .as[(Long, Int, Long)].collect().toSeq
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.size == n, "every anchor drew negatives")
    val labels = (0 until n).map(i => i.toLong -> s"lab${i % 4}").toMap
    for ((a, xs) <- byAnchor) {
      assert(xs.length == k, s"anchor $a: ${xs.length} != $k (overdraw covers this n)")
      assert(xs.map(_._2).sorted == (1 to k), s"anchor $a: ranks not dense")
      for ((_, _, neg) <- xs) {
        assert(neg != a, s"anchor $a drew itself")
        assert(labels(neg) != labels(a), s"anchor $a drew a positive")
      }
    }
    val replay = Sampling.negativeSample(corpus, "id", "lab", k)
      .as[(Long, Int, Long)].collect().toSeq
    assert(replay.sorted == out.sorted, "not replayable")
  }

  // -------------------------------------------------------- shardManifest

  test("shardManifest == per-row md5 recompute; seeded shards align with trainingOrder") {
    val docGen = Gen.zip(Gen.chooseNum(0L, 100000L),
      Gen.listOfN(12, Gen.alphaNumChar).map(_.mkString))
    val docs = sample(docGen, 200).distinctBy(_._1)
    val df = docs.toDF("id", "payload")
    val M = 1000000000L
    val nShards = 8

    def brute(seed: String) = docs
      .map { case (id, p) =>
        val key = if (seed.isEmpty) id.toString else s"$seed:$id"
        (md5Prefix(key) % nShards, p.length.toLong, md5Prefix(s"$id|$p") % M)
      }
      .groupBy(_._1).map { case (s, xs) =>
        (s, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum % M)
      }.toSet

    for (seed <- Seq("", "sX")) {
      val got = Packing.shardManifest(df, "id", "payload", nShards, seed)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute(seed), s"seed='$seed'")
    }

    // alignment contract: same seed => manifest shard sizes equal the
    // trainingOrder export's per-shard row counts
    val orderCounts = Packing.trainingOrder(df, "id", "sX", nShards)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val manifestCounts = Packing.shardManifest(df, "id", "payload", nShards, "sX")
      .select(col("shard"), col("n_rows")).as[(Long, Long)].collect().toMap
    assert(orderCounts == manifestCounts)

    // the r13-advice hole: an EMPTY seed must also align — both sides
    // hash the bare id (the old trainingOrder ":id" spelling matched
    // neither manifest form)
    val orderCountsUnseeded = Packing.trainingOrder(df, "id", "", nShards)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val manifestCountsDefault = Packing.shardManifest(df, "id", "payload", nShards)
      .select(col("shard"), col("n_rows")).as[(Long, Long)].collect().toMap
    assert(orderCountsUnseeded == manifestCountsDefault)
  }

  // ----------------------------------------------- corrupt media payloads

  test("corrupt-but-recognized image bytes decode to null rows, not task failures") {
    import graft.operators.Multimodal
    val good = Multimodal.syntheticBmp(8, 8, 3L)
    // a RECOGNIZED BMP header whose pixel data is cut off — ImageIO
    // throws here (it does not return null), the case the pass-through
    // contract must absorb
    val truncated = good.take(58)
    val garbage = Array.fill[Byte](40)(0x7f)
    assert(Multimodal.decodeImage(good).contains((8, 8, 3)))
    assert(Multimodal.decodeImage(truncated).isEmpty)
    assert(Multimodal.decodeImage(garbage).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty,
      "null payload is a corrupt row, not an NPE")
    val df = Seq((1L, good), (2L, truncated), (3L, garbage),
        (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.resizeImage(df, "payload", 2)
      .select(col("id"), col("resized_width")).as[(Long, Option[Int])]
      .collect().toMap
    assert(out(1L).contains(4) && out(2L).isEmpty && out(3L).isEmpty &&
      out(4L).isEmpty)
  }

  // -------------------------------------------------------- DirtyJson

  test("DirtyJson.repair spans lines and yields real null on no match") {
    import graft.sources.DirtyJson
    val rows = Seq(
      (1L, """2026-01-01T00:00:00Z stdout: {"k": 7} [eof]"""),
      (2L, "prefix {\"k\":\n  8,\n  \"x\": 1}\ntrailing"), // pretty-printed
      (3L, "no json here at all"))
    val df = rows.toDF("id", "raw")
    val got = df.select(col("id"),
        DirtyJson.repairedField(col("raw"), "$.k").cast("long").as("k"),
        DirtyJson.repair(col("raw")).isNull.as("no_span"))
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got(1L) == ((Some(7L), false)))
    assert(got(2L) == ((Some(8L), false)), "multi-line span must repair")
    assert(got(3L) == ((None, true)), "no-match must be null, not empty string")
  }

  // ------------------------------------------------------ Paths.transitions

  test("Paths.transitions == per-key ordered pair scan") {
    import graft.operators.Paths
    val evGen = Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 999L),
      Gen.oneOf("view", "click", "buy", "exit"))
    // unique (user, seq) so the event order is total — the operator's
    // window order must be deterministic for an exact pin
    val events = sample(evGen, 600).distinctBy(e => (e._1, e._2))
    val df = events.toDF("user", "seq", "state")
    val got = Paths.transitions(df, Seq(col("user")), Seq(col("seq")),
        col("state"))
      .as[(String, String, Long, Double)].collect().toSet

    val pairs = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(_._2).map(_._3)
      ordered.zip(ordered.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case ((s, d), xs) =>
      (s, d, xs.length.toLong) }
    val totals = counts.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._3).sum }
    val want = counts.map { case (s, d, n) =>
      (s, d, n, round4(n.toDouble / totals(s).toDouble)) }.toSet
    assert(got == want)
  }

  // ------------------------------------------------------------ Skew.report

  test("Skew.report == sorted frequency table with share / mean-multiple") {
    import graft.operators.Skew
    val keyGen = Gen.frequency(
      5 -> Gen.const("hot"), // a genuinely skewed key
      3 -> Gen.oneOf("a", "b", "c"),
      2 -> Gen.chooseNum(0, 40).map(i => s"k$i"))
    val keys = sample(keyGen, 800)
    val df = keys.toDF("key")
    val k = 7
    val got = Skew.report(df, col("key"), k)
      .as[(String, Long, Double, Double)].collect().toSet

    val perKey = keys.groupBy(identity).map { case (key, xs) =>
      (key, xs.length.toLong) }.toSeq
    val total = perKey.map(_._2).sum
    val nKeys = perKey.length.toLong
    val want = perKey.sortBy { case (key, n) => (-n, key) }.take(k)
      .map { case (key, n) =>
        (key, n, round4(n.toDouble / total.toDouble),
          round4(n.toDouble * nKeys.toDouble / total.toDouble)) }.toSet
    assert(got == want, s"got $got\nwant $want")
  }

  // -------------------------------------------------- RetrievalEval.ndcgAtK

  test("RetrievalEval.ndcgAtK == per-query discount-table recompute") {
    import graft.operators.RetrievalEval
    val k = 10
    val (qd, ladder) = RetrievalEval.ndcgDiscounts(k)
    // system: unique ranks 1..12 per query (ranks > k must be cut);
    // truth: random per-query relevance sets, one query system-less
    val rng = new scala.util.Random(31)
    val system = for (q <- 0L to 8L; r <- 1 to 12)
      yield (q, s"d${rng.nextInt(30)}_$q", r)
    val sysDedup = system.groupBy(e => (e._1, e._2))
      .map(_._2.minBy(_._3)).toSeq // one rank per (query, doc)
    val truth = (for (q <- 0L to 9L; d <- 0 until 30; if rng.nextInt(4) == 0)
      yield (q, s"d${d}_$q")) :+ ((9L, "d0_9")) // q9 absent from system
    val got = RetrievalEval.ndcgAtK(
        sysDedup.toDF("q", "doc", "rank"), truth.toDF("q", "doc"),
        "q", "doc", "rank", k)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val truSet = truth.toSet
    val want = truth.groupBy(_._1).map { case (q, ts) =>
      val nRel = ts.distinct.length.toLong
      // grid discounts are exact binary rationals: any summation
      // order is the same double, so a plain fold matches bit-for-bit
      val dcg = sysDedup
        .filter(e => e._1 == q && e._3 <= k && truSet.contains((q, e._2)))
        .map(e => qd(e._3 - 1)).sum
      val idcg = ladder(math.min(nRel, k.toLong).toInt - 1)
      q -> ((nRel, dcg, idcg, dcg / idcg))
    }
    assert(got.keySet == want.keySet)
    for ((q, w) <- want) assert(got(q) == w, s"query $q: ${got(q)} vs $w")
    assert(got(9L)._2 == 0.0, "system-less truth query scores dcg 0")
  }

  // ------------------------------------------- TimeSeries gaps + debounce

  test("TimeSeries.gaps and debounce == per-key lag scans") {
    import graft.operators.TimeSeries
    val evGen = Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 500000L))
    val events = sample(evGen, 500).distinct.zipWithIndex
      .map { case ((key, ts), id) => (key, ts, id.toLong) }
      .distinctBy(e => (e._1, e._2)) // unique (key, ts): total order
    val df = events.toDF("key", "ts_us", "id")
    val thr = 30000L

    val gotGaps = TimeSeries.gaps(df, col("key"), col("ts_us"), thr)
      .as[(Long, Long, Long, Long)].collect().toSet
    val wantGaps = events.groupBy(_._1).toSeq.flatMap { case (key, evs) =>
      val ts = evs.map(_._2).sorted
      ts.zip(ts.drop(1)).collect {
        case (a, b) if b - a > thr => (key, a, b, b - a) }
    }.toSet
    assert(gotGaps == wantGaps)

    val win = 20000L
    val gotKept = TimeSeries.debounce(df, Seq(col("key")), col("ts_us"),
        col("id"), win)
      .as[(Long, Long, Long)].collect().toSet
    // stateless retrigger rule: a row survives iff first for its key
    // or > win after its PREDECESSOR in the original stream (not the
    // surviving one)
    val wantKept = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(_._2)
      ordered.head +: ordered.zip(ordered.drop(1)).collect {
        case ((_, pa, _), e @ (_, pb, _)) if pb - pa > win => e }
    }.toSet
    assert(gotKept == wantKept)
  }

  // ------------------------------------------------ TimeSeries.resampleFill

  test("TimeSeries.resampleFill == bucketed last-obs + dense forward fill") {
    import graft.operators.TimeSeries
    val evGen = Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 80L),
      Gen.chooseNum(-50L, 50L))
    val events = sample(evGen, 300).zipWithIndex
      .map { case ((key, ts, v), id) => (key, ts, v, id.toLong) }
    val bucketUs = 10L
    val df = events.toDF("key", "ts_us", "v", "id")
    val got = TimeSeries.resampleFill(df, "key", "ts_us", "v", "id", bucketUs)
      .select(col("key"), col("bucket"), col("value"), col("is_observed"))
      .as[(Long, Long, Long, Boolean)].collect().toSet

    val want = events.groupBy(_._1).toSeq.flatMap { case (key, evs) =>
      val lastPerBucket = evs.groupBy(e => Math.floorDiv(e._2, bucketUs))
        .map { case (b, xs) => b -> xs.maxBy(e => (e._2, e._4))._3 }
      val (lo, hi) = (lastPerBucket.keys.min, lastPerBucket.keys.max)
      (lo to hi).scanLeft((0L, 0L, false)) { case ((_, prev, _), b) =>
        lastPerBucket.get(b) match {
          case Some(v) => (b, v, true)
          case None    => (b, prev, false)
        }
      }.drop(1).map { case (b, v, obs) => (key, b, v, obs) }
    }.toSet
    assert(got == want)
  }

  // ----------------------------------------------------------- Merge.scd2

  test("Merge.scd2 == latest-per-key close-and-open over the history") {
    import graft.operators.Merge
    val baseRows = Seq(
      // key, attr, valid_from, valid_to (null = current)
      ("a", 1L, 100L, Some(200L)), ("a", 2L, 200L, None),
      ("b", 7L, 50L, None),
      ("c", 3L, 10L, Some(20L)), ("c", 4L, 20L, None),
      ("d", 9L, 5L, None)) // untouched by the feed
    val updGen = Gen.zip(Gen.oneOf("a", "b", "c", "e"),
      Gen.chooseNum(10L, 99L), Gen.chooseNum(300L, 340L))
    val updates = sample(updGen, 40).distinctBy(u => (u._1, u._3, u._2))
    val base = baseRows.map { case (k, a, f, t) => (k, a, f, t) }
      .toDF("key", "attr", "valid_from", "valid_to")
    val upd = updates.toDF("key", "attr", "ts")
    val got = Merge.scd2(base, upd, Seq("key"), "ts")
      .as[(String, Long, Long, Option[Long])].collect().toSet

    // feed dedup: latest ts per key, remaining columns DESC tie-break
    val latest = updates.groupBy(_._1).map { case (k, us) =>
      us.maxBy(u => (u._3, u._2)) }.toSeq
    val latestKeys = latest.map(_._1).toSet
    val history = baseRows.collect {
      case (k, a, f, Some(t)) => (k, a, f, Some(t)) }
    val closed = baseRows.collect {
      case (k, a, f, None) =>
        (k, a, f, latest.find(_._1 == k).map(_._3)) }
    val opened = latest.map { case (k, a, ts) => (k, a, ts, None) }
    val want = (history ++ closed ++ opened).toSet
    assert(got == want)
    // invariant: one open row per live key
    val openPerKey = got.toSeq.filter(_._4.isEmpty).groupBy(_._1)
    assert(openPerKey.values.forall(_.size == 1))
    assert(openPerKey.keySet ==
      (baseRows.map(_._1).toSet ++ latestKeys))
  }

  // ------------------------------------------- Relational.percentileRank

  test("percentileRank == count-below over the non-null multiset") {
    import graft.operators.Relational
    val gen = Gen.zip(Gen.chooseNum(0L, 500L),
      Gen.option(Gen.chooseNum(-40L, 40L)))
    val rows = sample(gen, 400).distinctBy(_._1)
    val df = rows.toDF("id", "score")
    val got = Relational.percentileRank(df, "score", "p")
      .select(col("id"), col("score"), col("p"))
      .as[(Long, Long, Double)].collect().toSet

    val scores = rows.collect { case (_, Some(s)) => s }
    val n = scores.length.toLong
    val want = rows.collect { case (id, Some(s)) =>
      (id, s, scores.count(_ < s).toLong.toDouble / (n - 1).toDouble) }.toSet
    assert(got == want) // null-score rows drop, exactly as documented
  }

  // ---------------------------------------- Relational.quantileNormalize

  test("quantileNormalize == exact integer rank-to-global-CDF lookup") {
    import graft.operators.Relational
    val gen = Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.chooseNum(0L, 60L))
    val rows = sample(gen, 500)
    val df = rows.zipWithIndex.map { case ((src, v), i) => (i.toLong, src, v) }
      .toDF("id", "src", "v")
    val got = Relational.quantileNormalize(df, "src", "v", "norm")
      .select(col("id"), col("src"), col("v"), col("norm"))
      .as[(Long, String, Long, Long)].collect().toSet

    // global CDF over distinct values: value -> [lo, hi] 1-based rank span
    val gCounts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val spans = gCounts.scanLeft(("", 0L, 0L)) { case ((_, _, hi), (v, c)) =>
      (v.toString, hi + 1, hi + c) }.drop(1)
      .map { case (v, lo, hi) => (v.toLong, lo, hi) }
    val nTot = rows.size.toLong
    val bySrc = rows.groupBy(_._1)
    val want = rows.zipWithIndex.map { case ((src, v), i) =>
      val inSrc = bySrc(src).map(_._2)
      val ns = inSrc.size.toLong
      val r = inSrc.count(_ <= v).toLong // cum count at v within source
      val t = (r * nTot + ns - 1) / ns   // ceil(r·N / ns) in integers
      val norm = spans.find { case (_, lo, hi) => t >= lo && t <= hi }.get._1
      (i.toLong, src, v, norm)
    }.toSet
    assert(got == want)
  }

  // -------------------------------------------------- Profiling.trimmedMean

  test("trimmedMean == sort, drop trim each side, exact cent mean") {
    import graft.operators.Profiling
    val gen = Gen.zip(Gen.oneOf("a", "b", "c", "tiny"),
      Gen.chooseNum(-3000L, 3000L))
    val rows = sample(gen, 450).filterNot(r => r._1 == "tiny") ++
      Seq(("tiny", 100L), ("tiny", 200L)) // n=2: trim floors to 0, all kept
    for (trimPct <- Seq(5, 30)) {
      val df = rows.map { case (g, c) => (g, c.toDouble / 100.0) }
        .toDF("grp", "v")
      val got = Profiling.trimmedMean(df, col("grp"), col("v"), trimPct)
        .as[(String, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = rows.groupBy(_._1).map { case (g, xs) =>
        // the operator re-quantizes v·100 through floor(+0.5); for
        // negative cents that is floor, not trunc — replicate exactly
        val cents = xs.map(x =>
          math.floor(x._2.toDouble / 100.0 * 100 + 0.5).toLong).sorted
        val n = cents.length.toLong
        val trim = n * trimPct / 100 // floor of n·pct/100 in integers
        val kept = cents.slice(trim.toInt, (n - trim).toInt)
        val mean =
          if (kept.isEmpty) None
          else Some((kept.sum.toDouble / 100.0) / kept.length.toDouble)
        g -> ((n, kept.length.toLong, mean))
      }
      assert(got == want, s"trimPct=$trimPct: $got vs $want")
    }
  }

  // ------------------------------------------------------ Dedup.sourceOverlap

  test("sourceOverlap == distinct-shingle-set intersection per source pair") {
    import graft.operators.Dedup
    val word = Gen.listOfN(3, Gen.oneOf("ab", "ba", "ca", "bc", "abc"))
      .map(_.mkString)
    val gen = Gen.zip(Gen.oneOf("s1", "s2", "s3", "s4"), word)
    val rows = sample(gen, 120)
    val df = rows.toDF("source", "text")
    val n = 4
    val got = Dedup.sourceOverlap(df, "source", "text", n)
      .as[(String, String, Long, Double, Double, Double)].collect().toSet

    // per-source union of each text's distinct character n-gram set;
    // texts shorter than n contribute themselves whole (the operator's
    // sequence(1, greatest(len-n+1, 1)) + substr spelling)
    def shingleSet(t: String): Set[String] =
      if (t.length <= n) Set(t) else t.sliding(n).toSet
    val bySrc: Map[String, Set[String]] = rows.groupBy(_._1)
      .view.mapValues(_.flatMap(r => shingleSet(r._2)).toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (a, b) = (srcs(i), srcs(j))
      common = (bySrc(a) & bySrc(b)).size.toLong if common > 0
    } yield {
      val (na, nb) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
      (a, b, common, common.toDouble / (na + nb - common).toDouble,
        common.toDouble / na.toDouble, common.toDouble / nb.toDouble)
    }).toSet
    assert(got == want)
    assert(want.nonEmpty, "degenerate fixture: no overlapping source pair")
  }

  // ------------------------------------------- Cleaning.curationDecisions

  test("curationDecisions == first-failing-rule scan in declaration order") {
    import graft.operators.Cleaning
    val gen = Gen.zip(Gen.chooseNum(0L, 199L), Gen.chooseNum(-50L, 150L))
    val rows = sample(gen, 150).distinctBy(_._1)
    val docs = rows.toDF("doc_id", "n_chars")
    // set rules: membership lists with deliberate overlap so rule ORDER
    // is exercised (a doc failing both must report the FIRST)
    val setA = rows.map(_._1).filter(_ % 3 == 0)
    val setB = rows.map(_._1).filter(_ % 5 == 0)
    val got = Cleaning.curationDecisions(docs, "doc_id",
        Seq("rule_a" -> setA.toDF("doc_id"), "rule_b" -> setB.toDF("doc_id")),
        Seq("short" -> (col("n_chars") < 0L),
          "long" -> (col("n_chars") > 120L)))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String, Boolean)]
      .collect().toSet

    val (sa, sb) = (setA.toSet, setB.toSet)
    val want = rows.map { case (id, nc) =>
      val flags = Seq(
        "rule_a" -> sa(id), "rule_b" -> sb(id),
        "short" -> (nc < 0L), "long" -> (nc > 120L))
      val reason = flags.collectFirst { case (nm, true) => nm }.getOrElse("kept")
      (id, flags(0)._2, flags(1)._2, flags(2)._2, flags(3)._2,
        reason, reason == "kept")
    }.toSet
    assert(got == want)
    assert(want.exists(r => r._2 && r._3),
      "degenerate fixture: no doc fails two rules (order untested)")
  }

  // --------------------------------------------------- LangModel.dsirWeights

  test("dsirWeights == smoothed unigram likelihood-ratio recompute") {
    import graft.operators.LangModel
    val word = Gen.oneOf("the", "cell", "genome", "der", "zelle", "und",
      "of", "la", "gene", "protein")
    val gen = Gen.zip(Gen.oneOf("en", "de", "fr"),
      Gen.listOfN(6, word).map(_.mkString(" ")))
    val rows = sample(gen, 80).zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
    val df = rows.toDF("doc_id", "lang", "text")
    val k = 0.5
    val got = LangModel.dsirWeights(df, "doc_id", "text", col("lang") === "en", k)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val toks = rows.map { case (id, lang, text) =>
      (id, lang == "en", text.trim.toLowerCase.split("\\s+").toSeq) }
    val raw = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong)
    val tgt = toks.filter(_._2).flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong)
    val v = raw.size.toDouble
    val nRaw = raw.values.sum.toDouble
    val nTgt = tgt.values.sum.toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    for ((id, _, ws) <- toks) {
      val lrs = ws.map(w => log2((tgt.getOrElse(w, 0L) + k) / (nTgt + k * v)) -
        log2((raw(w) + k) / (nRaw + k * v)))
      val (n, avg) = got(id)
      assert(n == ws.length.toLong, s"doc $id token count")
      // avg over per-token doubles: Spark's group sum order is partition-
      // dependent, so this one comparison is tolerance- not bit-level
      assert(math.abs(avg - lrs.sum / lrs.length) < 1e-9, s"doc $id avg_lr")
    }
    assert(toks.exists(_._2) && toks.exists(!_._2),
      "degenerate fixture: target predicate never split the corpus")
  }

  // --------------------------------------------- TimeSeries.rollingZScore

  test("rollingZScore == trailing-ring raw-moment recompute") {
    import graft.operators.TimeSeries
    // integer-valued doubles: the sliding-window add/remove accumulator
    // and a fresh sum agree EXACTLY, so z compares bit-level
    val gen = Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 100000L),
      Gen.chooseNum(-20L, 20L))
    val rows = sample(gen, 400).distinctBy(r => (r._1, r._2))
      .zipWithIndex.map { case ((u, ts, v), i) => (i.toLong, u, ts, v.toDouble) }
    val df = rows.toDF("event_id", "user", "ts_us", "value")
    val (lookback, minObs) = (8, 4)
    val got = TimeSeries.rollingZScore(df, Seq(col("user")),
        Seq(col("ts_us"), col("event_id")), col("value"), lookback, minObs)
      .select(col("event_id"), col("z")).as[(Long, Double)].collect().toMap

    val want = rows.groupBy(_._2).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._3, e._1))
      ordered.indices.flatMap { i =>
        val frame = ordered.slice(math.max(0, i - lookback), i).map(_._4)
        val n = frame.length
        if (n < minObs) None
        else {
          val m = frame.sum / n
          val m2 = frame.map(x => x * x).sum / n
          if (m2 - m * m > 0)
            Some(ordered(i)._1 -> (ordered(i)._4 - m) / math.sqrt(m2 - m * m))
          else None
        }
      }
    }.toMap
    assert(got == want)
    assert(want.nonEmpty, "degenerate fixture: nothing scored")
  }

  // ----------------------- query-shape pins: vocab_oov / novelty / fertility
  //
  // These three are inline query plans (no separate operator object), so
  // the pin drives the SHIPPED SparkEntry closure against a randomized
  // documents.parquet fixture and recomputes from first principles.

  private def writeDocsFixture(rows: Seq[(Long, String, String)]): String = {
    val dir = s"/tmp/graft_propdocs_${rows.hashCode.toHexString}"
    rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def docsGen: Seq[(Long, String, String)] = {
    val word = Gen.oneOf((1 to 24).map(i => s"w$i"))
    val gen = Gen.zip(Gen.oneOf("en", "de", "fr"),
      Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word)))
    sample(gen, 60).zipWithIndex.map { case ((lang, ws), i) =>
      // every 4th doc carries a doc-unique token: corpus count 1 < 5,
      // so the vocab_oov pin always has a real OOV population
      val rare = if (i % 4 == 0) Seq(s"rare$i") else Nil
      (i.toLong, lang, (ws ++ rare).mkString(" ")) }
  }

  private def round4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  test("vocab_oov query == corpus-count>=5 vocabulary OOV recompute") {
    val rows = docsGen
    val dir = writeDocsFixture(rows)
    val got = SparkEntry.queries("vocab_oov")(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val counts = rows.flatMap(_._3.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size).toMap
    val vocab = counts.collect { case (w, c) if c >= 5 => w }.toSet
    for ((id, _, text) <- rows) {
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      val oov = ws.count(w => !vocab(w)).toDouble
      assert(got(id) == ((ws.length.toLong, round4d(oov / ws.length))), s"doc $id")
    }
    assert(rows.exists(_._3.split("\\s+").exists(w => !vocab(w))),
      "degenerate fixture: zero OOV tokens anywhere")
  }

  test("novelty_ngram query == distinct-trigram df==1 share recompute") {
    val rows = docsGen
    val dir = writeDocsFixture(rows)
    val got = SparkEntry.queries("novelty_ngram")(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val tris: Map[Long, Set[String]] = rows.map { case (id, _, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      id -> (if (ws.length < 3) Set.empty[String]
             else ws.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val dfreq = tris.values.flatten.groupBy(identity).view.mapValues(_.size)
    for ((id, ts) <- tris if ts.nonEmpty) {
      val novel = ts.count(t => dfreq(t) == 1).toDouble
      assert(got(id) == ((ts.size.toLong, round4d(novel / ts.size))), s"doc $id")
    }
    assert(got.keySet == tris.filter(_._2.nonEmpty).keySet,
      "docs under 3 tokens must be absent, all others present")
  }

  // -------------------------------------------- Dedup.winnowFingerprintsMd5

  test("winnowFingerprintsMd5 == per-doc sliding-window-min recompute") {
    import graft.operators.Dedup
    val (k, w) = (3, 4)
    val text = Gen.chooseNum(1, 15)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val rows = sample(text, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.winnowFingerprintsMd5(df, "doc_id", "text", k, w)
      .as[(Long, Long)].collect().toSet

    val want = rows.flatMap { case (id, t) =>
      val n1 = math.max(t.length - (k - 1), 1)
      // position hash: md5 prefix of the (possibly short near the end
      // or whole-short-text) k-substring, exactly substr(pos, k)
      val h = (1 to n1).map(p => md5Prefix(t.substring(p - 1,
        math.min(p - 1 + k, t.length))))
      val lastStart = math.max(n1 - (w - 1), 1)
      (1 to lastStart).map { p =>
        id -> h.slice(p - 1, math.min(p - 1 + w, n1)).min
      }
    }.toSet
    assert(got == want)
    assert(rows.exists(_._2.length > k + w),
      "degenerate fixture: no doc long enough to slide the window")
  }

  // ------------------------------------------------- ModelScoring.knnPredict

  test("knnPredict == brute-force cosine top-k majority vote") {
    import graft.operators.ModelScoring
    // integer-valued non-zero vectors: dot/norm/cos are the identical
    // IEEE expressions on both sides, so ranking doubles compare exact
    val vec = Gen.listOfN(4, Gen.chooseNum(-3, 3))
      .retryUntil(v => v.exists(_ != 0)).map(_.map(_.toDouble))
    val trainRows = sample(Gen.zip(vec, Gen.oneOf("a", "b", "c")), 24)
    val dataRows = sample(vec, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val train = trainRows.toDF("vec", "label")
    val data = dataRows.toDF("id", "vec")
    val k = 3
    val got = ModelScoring.knnPredict(data, train, "id", "vec", "label", k)
      .as[(Long, String)].collect().toMap

    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val want = dataRows.map { case (id, q) =>
      val qn = math.sqrt(dot(q, q))
      val scored = trainRows.map { case (t, lbl) =>
        (dot(q, t) / (qn * math.sqrt(dot(t, t))), lbl) }
      val top = scored.sortBy { case (c, lbl) => (-c, lbl) }.take(k)
      val vote = top.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (lbl, n) => (-n, lbl) }.head._1
      id -> vote
    }.toMap
    assert(got == want)
  }

  // ------------------------------------------ Cleaning.redactPii / piiCounts

  test("redactPii/piiCounts == ordered Java-regex fold on raw text") {
    import graft.operators.Cleaning
    val rows = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "host 10.0.255.3 and 1.2.3.4 up"),
      (3L, "call 555-1234 re a@b.io at 192.168.0.1"),
      (4L, "overlap a@10.0.0.1.com stays one email"),
      (5L, "nothing to scrub here"),
      (6L, "666-7777 666-7777 twice"))
    val df = rows.toDF("id", "text")
    val countCols = Cleaning.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    val got = df.select(col("id") +: Cleaning.redactPii(col("text")).as("red")
        +: countCols: _*)
      .as[(Long, String, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val want = rows.map { case (id, t) =>
      val red = Cleaning.PiiPatterns.foldLeft(t) { case (s, (_, p, r)) =>
        s.replaceAll(p, r) }
      val counts = Cleaning.PiiPatterns.map { case (_, p, _) =>
        val m = java.util.regex.Pattern.compile(p).matcher(t)
        var c = 0; while (m.find()) c += 1; c
      }
      id -> ((red, counts(0), counts(1), counts(2)))
    }.toMap
    assert(got == want)
    assert(want(4L)._1.contains("<EMAIL>") && !want(4L)._1.contains("<IP>"),
      "email-before-ip rule order must consume the in-mailbox address")
  }

  // ---------------------------------------------------------- Layout.zValue

  test("zValue == Morton interleave of range-normalized buckets") {
    import graft.operators.Layout
    val bits = 4
    val gen = Gen.zip(Gen.chooseNum(-50L, 150L), Gen.chooseNum(0L, 9999L))
    val rows = sample(gen, 300).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = rows.toDF("id", "x", "y")
    val got = Layout.zValue(df, Seq("x", "y"), bits)
      .select(col("id"), col("zval")).as[(Long, Long)].collect().toMap

    val (xs, ys) = (rows.map(_._2), rows.map(_._3))
    def bucket(v: Long, lo: Long, hi: Long): Long =
      math.floor((v - lo).toDouble / (hi - lo + 1).toDouble * (1L << bits)).toLong
    val want = rows.map { case (id, x, y) =>
      val bx = bucket(x, xs.min, xs.max)
      val by = bucket(y, ys.min, ys.max)
      val z = (0 until bits).map { b =>
        ((bx >> b) & 1L) * (1L << (b * 2)) + ((by >> b) & 1L) * (1L << (b * 2 + 1))
      }.sum
      id -> z
    }.toMap
    assert(got == want)
  }

  // --------------------------------- Cleaning.contaminationSpans / cutSpans

  test("contaminationSpans + cutSpans == window scan + covered-token filter") {
    import graft.operators.Cleaning
    val n = 3
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.chooseNum(1, 10).flatMap(m => Gen.listOfN(m, word))
      .map(_.mkString(" "))
    val trainRows = sample(docGen, 50).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val evalRows = sample(docGen, 8).zipWithIndex
      .map { case (t, i) => (1000L + i, t) }
    val train = trainRows.toDF("doc_id", "text")
    val evalSet = evalRows.toDF("doc_id", "text")

    def grams(t: String): Seq[(Int, String)] = {
      val toks = t.trim.split("\\s+").toSeq
      val n1 = math.max(toks.length - (n - 1), 1)
      // slice clamps at the end: a short doc's one gram is the whole doc
      (0 until n1).map(p => p -> toks.slice(p, p + n).mkString(" "))
    }
    val evalGrams = evalRows.flatMap(r => grams(r._2).map(_._2)).toSet

    val gotSpans = Cleaning.contaminationSpans(train, evalSet, "doc_id", "text", n)
      .as[(Long, Long, Long, String)].collect().toSet
    val wantSpans = trainRows.flatMap { case (id, t) =>
      grams(t).collect { case (p, g) if evalGrams(g) =>
        // 1-based inclusive token coords; tok_end may exceed a short
        // doc's length by the operator's fixed-width contract
        (id, (p + 1).toLong, (p + n).toLong, g) }
    }.toSet
    assert(gotSpans == wantSpans)
    assert(wantSpans.nonEmpty, "degenerate fixture: zero contaminated windows")

    val gotCut = Cleaning.cutSpans(train,
        Cleaning.contaminationSpans(train, evalSet, "doc_id", "text", n),
        "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val wantCut = trainRows.map { case (id, t) =>
      val toks = t.trim.split("\\s+").toSeq
      val spans = wantSpans.collect { case (i, s, e, _) if i == id => (s, e) }
      val kept = toks.zipWithIndex.collect { case (tok, i0)
        if !spans.exists { case (s, e) => i0 + 1 >= s && i0 + 1 <= e } => tok }
      id -> ((kept.mkString(" "), (toks.length - kept.length).toLong))
    }.toMap
    assert(gotCut == wantCut)
    assert(wantCut.values.exists(c => c._2 > 0 && c._1.nonEmpty),
      "degenerate fixture: no doc is PARTIALLY cut (surgical path untested)")
  }

  // ------------------------------------------------------ LangModel.selfScore

  test("selfScore == add-k smoothed bigram NLL recompute") {
    import graft.operators.LangModel
    val word = Gen.oneOf("the", "cell", "grows", "fast", "slow", "und", "la")
    val gen = Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, word))
    val rows = sample(gen, 70).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = rows.toDF("doc_id", "text")
    val k = 0.5
    val got = LangModel.selfScore(df, "doc_id", "text", k)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val bigrams = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq.sliding(2)
        .filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    }.filter(_._2.nonEmpty)
    val counts = bigrams.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val context = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val v = counts.keySet.map(_._2).size.toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    assert(got.keySet == bigrams.map(_._1).toSet,
      "single-token docs must be absent, all others present")
    for ((id, bgs) <- bigrams) {
      val nlls = bgs.map { case (w1, w2) =>
        -log2((counts((w1, w2)) + k) / (context(w1) + k * v)) }
      val (n, avg) = got(id)
      assert(n == bgs.length.toLong, s"doc $id bigram count")
      // FP-sum-order tolerance, same caveat as the dsirWeights pin
      assert(math.abs(avg - nlls.sum / nlls.length) < 1e-9, s"doc $id avg_nll")
    }
  }

  test("token_fertility query == per-lang integer-sum ratio recompute") {
    val rows = docsGen
    val dir = writeDocsFixture(rows)
    val got = SparkEntry.queries("token_fertility")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val bpeRe = java.util.regex.Pattern.compile("\\w+|[^\\w\\s]")
    def bpeCount(t: String): Long = {
      val m = bpeRe.matcher(t); var c = 0L; while (m.find()) c += 1; c
    }
    val want = rows.groupBy(_._2).map { case (lang, docs) =>
      val ws = docs.map(_._3.trim.split("\\s+").length.toLong).sum
      val bpe = docs.map(d => bpeCount(d._3)).sum
      val chars = docs.map(_._3.length.toLong).sum
      lang -> ((lang, docs.length.toLong, ws, bpe, chars,
        round4d(bpe.toDouble / ws.toDouble),
        round4d(chars.toDouble / ws.toDouble)))
    }
    assert(got == want)
  }

  // ---------------------------------------- Profiling.weightedMedian

  test("weightedMedian == cumulative-weight scan over sorted distinct values") {
    import graft.operators.Profiling
    // Complements PropertySpec's weight-expansion pin (integer weights
    // 1..5): fractional, zero, negative and null weights; null values —
    // the documented half-up-rounding and w<=0 exclusion rules, which
    // no other test reaches
    val gen = Gen.zip(Gen.oneOf("g1", "g2", "g3"),
      Gen.option(Gen.chooseNum(-30L, 30L).map(_.toDouble / 2)),
      Gen.option(Gen.chooseNum(-4L, 40L).map(_.toDouble / 10)))
    val rows = sample(gen, 600)
    val df = rows.toDF("grp", "v", "w")
    val got = Profiling.weightedMedian(df, col("grp"), col("v"), col("w"))
      .as[(String, Double, Long)].collect().toSet

    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      // HALF-UP integer weights, drop null v / null w / w<=0 — as documented
      val kept = rs.collect { case (_, Some(v), Some(w))
        if math.floor(w + 0.5).toLong > 0 => (v, math.floor(w + 0.5).toLong) }
      if (kept.isEmpty) None
      else {
        val perValue = kept.groupBy(_._1).view.mapValues(_.map(_._2).sum)
          .toSeq.sortBy(_._1)
        val tw = perValue.map(_._2).sum
        // smallest v whose 2*cumulative >= total (integer arithmetic)
        val med = perValue.scanLeft((0.0, 0L)) { case ((_, c), (v, vw)) =>
          (v, c + vw) }.tail.collectFirst { case (v, c) if 2 * c >= tw => v }.get
        Some((g, med, tw))
      }
    }.toSet
    assert(got == want)
  }

  // ---------------------------------------- Profiling.equiDepthHistogram

  test("equiDepthHistogram == integer floor-div bucket recompute") {
    import graft.operators.Profiling
    // Complements PropertySpec's naive-rank-window pin, which checks
    // the operator against another SPARK plan (a shared Spark bug
    // would pass both sides): this reference is pure Scala, and the
    // values are doubles where that pin casts to long
    val gen = Gen.option(Gen.chooseNum(-200L, 200L).map(_.toDouble / 4))
    val rows = sample(gen, 700)
    val df = rows.toDF("v")
    val buckets = 8
    val got = Profiling.equiDepthHistogram(df, col("v"), buckets)
      .as[(Long, Long, Double, Double)].collect().toSet

    val vals = rows.flatten
    val n = vals.size.toLong
    val perValue = vals.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    // below = rows strictly before this distinct value in sort order;
    // bucket = (below * B) div n — the operator's exact integer spelling
    val bucketed = perValue.scanLeft((0.0, 0L, 0L)) { case ((_, _, cum), (v, c)) =>
      (v, cum, cum + c) }.tail
      .map { case (v, below, _) => ((below * buckets) / n, v, perValue.toMap.apply(v)) }
    val want = bucketed.groupBy(_._1).map { case (b, vs) =>
      (b, vs.map(_._3).sum, vs.map(_._2).min, vs.map(_._2).max) }.toSet
    assert(got == want)
  }

  // ---------------------------------------- Relational.asofJoin

  test("asofJoin == per-key latest-preceding scan (ties take the right row)") {
    import graft.operators.Relational
    // Complements PropertySpec's asof pin, whose generator spreads
    // right timestamps (t*7+i%7) so left-right same-instant ties are
    // rare: here both sides draw from the same dense 0..100 domain, so
    // the <=-convention tie path is exercised constantly. Right stays
    // unique on (key, ts) — two right rows on the same instant have no
    // defined winner in ASOF semantics
    val rGen = Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 100L),
      Gen.chooseNum(1000L, 9999L))
    val right = sample(rGen, 150).distinctBy(r => (r._1, r._2))
    val lGen = Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 100L))
    val left = sample(lGen, 300).zipWithIndex
      .map { case ((k, ts), i) => (i.toLong, k, ts) }

    val ldf = left.toDF("id", "k", "ts")
    val rdf = right.toDF("k", "ts", "x")
    val got = Relational.asofJoin(ldf, rdf, "k", "ts", Seq("x"))
      .select(col("id"), col("asof_x"))
      .as[(Long, Option[Long])].collect().toMap

    val want = left.map { case (id, k, ts) =>
      val prior = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(_._2)._3)) // <= convention: same-ts right row wins
    }.toMap
    assert(got == want)
  }

  // ---------------------------------------- TfIdf.topTerms

  test("TfIdf.topTerms == naive per-doc smoothed tf-idf recompute") {
    import graft.operators.TfIdf
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.mkString(" "))
    val docs = sample(docGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val k = 3
    val got = TfIdf.topTerms(df, "id", "text", k)
      .as[(Long, Int, String, Double)].collect().toSet

    val tf = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").toSeq.groupBy(identity)
        .map { case (w, os) => (id, w, os.size.toLong) } }
    val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nDocs = docs.size.toLong
    val want = tf.groupBy(_._1).toSeq.flatMap { case (id, terms) =>
      val scored = terms.map { case (_, w, f) =>
        val idf = math.log((nDocs + 1).toDouble / (dfreq(w) + 1)) + 1
        // the operator's exact rounding spelling: floor(tf*idf*1e4 + .5)/1e4
        (w, math.floor(f * idf * 10000 + 0.5) / 10000) }
      scored.sortBy { case (w, s) => (-s, w) }.take(k).zipWithIndex
        .map { case ((w, s), r) => (id, r + 1, w, s) }
    }.toSet
    assert(got == want)
  }

  // ---------------------------------------- Collocations.bigramPmi

  test("bigramPmi == naive adjacent-pair count recompute") {
    import graft.operators.Collocations
    val words = Seq("Big", "data", "Spark", "scale", "join", "agg")
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.mkString(" "))
    val docs = sample(docGen, 60)
    val df = docs.toDF("text")
    // k larger than any possible qualifying bigram count: the limit
    // never cuts inside a rounded-PMI tie, so set equality is exact
    val got = Collocations.bigramPmi(df, "text", minCount = 2L, k = 1000)
      .as[(String, String, Long, Double)].collect().toSet

    val tokDocs = docs.map(_.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
    val uni = tokDocs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tokDocs.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = uni.values.sum.toDouble
    val nBi = bi.values.sum.toDouble
    val want = bi.collect { case ((w1, w2), nab) if nab >= 2L =>
      // the operator's exact association order:
      // ((nab·nUni)·nUni) / ((nBi·nW1)·nW2)
      val pmi = round4(math.log(
        nab.toDouble * nUni * nUni / (nBi * uni(w1).toDouble * uni(w2))))
      (w1, w2, nab, pmi)
    }.toSet
    assert(got == want)
  }

  // ---------------------------------------- Association.pairRules

  test("pairRules == naive guarded-basket support/confidence/lift recompute") {
    import graft.operators.Association
    // small catalog over many baskets: dense co-occurrence, plenty of
    // duplicate (basket, item) rows for the distinct step, nulls mixed in
    val gen = Gen.zip(Gen.option(Gen.chooseNum(0L, 39L)),
      Gen.option(Gen.chooseNum(100L, 109L)))
    val rows = sample(gen, 800)
    val df = rows.toDF("bk", "it")
    val minSupport = 3L
    val maxBasket = 6
    val got = Association.pairRules(df, "bk", "it",
        minSupport = minSupport, k = 10000, maxBasketItems = maxBasket)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq

    val baskets = rows.collect { case (Some(b), Some(i)) => (b, i) }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .filter(_._2.size <= maxBasket).toMap // the guard: stats over SURVIVORS only
    val n = baskets.size.toLong
    val itemN = baskets.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val pairN = baskets.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minSupport).toMap
    val want = pairN.toSeq.flatMap { case ((a, b), pn) =>
      Seq((a, b), (b, a)).map { case (ante, cons) =>
        (ante, cons, pn, itemN(ante), itemN(cons),
          pn.toDouble / itemN(ante).toDouble,
          pn.toDouble * n.toDouble / (itemN(ante).toDouble * itemN(cons).toDouble))
      }
    }.sortBy { case (a, c, _, _, _, conf, _) => (-conf, a, c) }
    assert(got == want)
  }

  // ---------------------------------------- Dedup.simhashBits

  test("simhashBits == per-token md5-nibble vote recompute") {
    import graft.operators.Dedup
    val words = Seq("red", "green", "blue", "cyan", "teal", "plum", "gold")
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(words))
    val docs = sample(docGen, 50).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    val df = docs.toDF("id", "toks")
    val bits = 32
    val got = Dedup.simhashBits(df, "id", col("toks"), bits)
      .as[(Long, String)].collect().toMap

    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val low = "13579bdf".toSet
    val want = docs.map { case (id, ts) =>
      // duplicate tokens vote multiply (the operator explodes, never
      // dedups); bit i reads hex char i of each token's md5
      val sig = (0 until bits).map { i =>
        val v = ts.map(t => if (low(md5hex(t)(i))) 1 else -1).sum
        if (v > 0) '1' else '0'
      }.mkString
      id -> sig
    }.toMap
    assert(got == want)
  }
}
