package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.ArrayNumeric
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Hashes
import graft.operators.Dedup
import graft.serve.{FilterParser, TableScanner}

/** Property tests (SURVEY §5 plan, item 4). Fixtures are generated
  * with ScalaCheck `Gen` under a fixed seed; each property is checked
  * as ONE Spark job over all generated cases (both formulations as
  * columns, zero mismatching rows expected) — distributed-friendly
  * property testing without a job per case.
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  private val seqGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("ACDEFGHIKLMNPQRSTVWY*acdefghikmnpqrstvwy".toSeq))
      .map(_.mkString)

  test("hash-join identity: joining on sha2(norm(seq)) == joining on norm(seq)") {
    val seqs = sample(seqGen, 120).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = seqs.toDF("id", "seq")
      .withColumn("h", Hashes.proteinHash(col("seq")))
      .withColumn("norm", upper(regexp_replace(col("seq"), "\\*$", "")))
    val byHash = df.as("a").join(df.as("b"), col("a.h") === col("b.h"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val bySeq = df.as("a").join(df.as("b"), col("a.norm") === col("b.norm"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(byHash == bySeq && byHash.nonEmpty)
  }

  test("sortedIntersectSize == size(array_intersect) on sorted distinct longs") {
    val arrGen = Gen.listOf(Gen.chooseNum(-50L, 50L))
    val pairs = sample(Gen.zip(arrGen, arrGen), 200)
      .map { case (a, b) => (a.distinct.sorted, b.distinct.sorted) }
    val df = pairs.toDF("a", "b")
    val mismatches = df.withColumn("merge",
        ArrayNumeric.sortedIntersectSize(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .filter(col("merge") =!= col("builtin")).count()
    assert(mismatches == 0)
  }

  test("NumericArrayDot is bit-identical to the aggregate/zip_with fold") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    val pairs = sample(Gen.zip(vecGen, vecGen), 200)
    val df = pairs.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = df
      .withColumn("expr_dot", ArrayNumeric.dot(col("a"), col("b")))
      .withColumn("hof_dot", hof)
      .filter(col("expr_dot") =!= col("hof_dot")).count()
    assert(mismatches == 0)
  }

  test("Jaccard product-form threshold == division form") {
    val g = for {
      inter <- Gen.chooseNum(0, 300)
      extraA <- Gen.chooseNum(0, 300)
      extraB <- Gen.chooseNum(0, 300)
      t <- Gen.oneOf(0.3, 0.5, 0.8)
    } yield (inter, inter + extraA, inter + extraB, t)
    val rows = sample(g, 300).filter(r => r._2 > 0 && r._3 > 0)
    val df = rows.toDF("i", "sza", "szb", "t")
    val division = col("i").cast("double") /
      (col("sza") + col("szb") - col("i")).cast("double") >= col("t")
    val product = col("i").cast("double") * (lit(1.0) + col("t")) >=
      col("t") * (col("sza") + col("szb")).cast("double")
    assert(df.filter(division =!= product).count() == 0)
  }

  test("minhash signature values stay in [0, p) and respect containment") {
    // J(A,A∪B) bound: a superset's minhash agrees on >= the subset share.
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog and then naps"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(df, "doc_id", "text", n = 4, k = 8)
    val cols = (0 until 8).map(i => col(s"mh$i"))
    val outOfRange = sig.filter(cols.map(c =>
      c < 0 || c >= Dedup.MinhashPrime).reduce(_ || _)).count()
    assert(outOfRange == 0)
    val rows = sig.orderBy("doc_id").collect()
    val agree = (0 until 8).count(i => rows(0).getLong(i + 1) == rows(1).getLong(i + 1))
    assert(agree >= 2) // heavy overlap -> many agreeing minima
  }

  test("FilterParser numeric affinity matches programmatic predicates") {
    val df = sample(Gen.chooseNum(-1000L, 1000L), 300).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cases = Seq(
      (">= 10", (x: Long) => x >= 10), ("<-5", (x: Long) => x < -5),
      ("!= 0", (x: Long) => x != 0), ("= 42", (x: Long) => x == 42),
      ("-3..7", (x: Long) => x >= -3 && x <= 7),
      ("between 0 and 100", (x: Long) => x >= 0 && x <= 100),
      ("1,2,3", (x: Long) => Set(1L, 2L, 3L).contains(x)),
      ("!1,2", (x: Long) => !Set(1L, 2L).contains(x)))
    for ((text, pred) <- cases) {
      val parsed = FilterParser.parse(df.schema, "v", text)
      val got = df.filter(TableScanner.compileFilter(df.schema, parsed))
        .select("id").as[Long].collect().toSet
      val want = df.select("id", "v").as[(Long, Long)].collect()
        .filter { case (_, v) => pred(v) }.map(_._1).toSet
      assert(got == want, s"quick-filter '$text'")
    }
  }

  test("dynamic pivot round-trips through unpivot") {
    val g = Gen.zip(Gen.chooseNum(1, 20), Gen.oneOf("x", "y", "z"))
    val rows = sample(g, 200).map { case (k, t) => (k.toLong, t) }
    val df = rows.toDF("key", "term")
    val wide = graft.operators.Relational.dynamicPivot(
      df, Seq("key"), "term", count(lit(1)), maxValues = 10).na.fill(0L)
    val terms = wide.columns.filter(_ != "key")
    val back = wide.unpivot(Array(col("key")), terms.map(col),
      "term", "n").filter(col("n") > 0)
      .select("key", "term", "n").as[(Long, String, Long)].collect().toSet
    val want = rows.groupBy(identity).map { case ((k, t), xs) =>
      (k, t, xs.size.toLong) }.toSet
    assert(back == want)
  }

  test("rangeJoin equals the naive theta-join filter on random data") {
    val g = Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 2000L))
    val lrows = sample(g, 150).zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
    val rrows = sample(g, 150).zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, s"k$k", t) }
    val left = lrows.toDF("lid", "key", "ts")
    val right = rrows.toDF("rid", "key", "ts")
    val w = 100L
    val banded = graft.operators.Relational.rangeJoin(left, right, "key", "ts", w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (lid, lk, lt) <- lrows; (rid, rk, rt) <- rrows
      if lk == rk && math.abs(lt - rt) <= w
    } yield (lid, rid)).toSet
    assert(banded == naive)
  }

  test("asofJoin equals the per-row latest-predecessor scan on random data") {
    val g = Gen.zip(Gen.chooseNum(0L, 10L), Gen.chooseNum(0L, 5000L))
    val lrows = sample(g, 120).zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
    // distinct right timestamps per key so "latest" is unambiguous
    val rrows = sample(g, 120).zipWithIndex
      .map { case ((k, t), i) => (i.toLong + 1000, s"k$k", t * 7 + (i % 7)) }
    val left = lrows.toDF("event_id", "key", "ts")
    val right = rrows.toDF("event_id", "key", "ts")
    val got = graft.operators.Relational
      .asofJoin(left, right, "key", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    val want = lrows.map { case (lid, lk, lt) =>
      val preds = rrows.filter { case (_, rk, rt) => rk == lk && rt <= lt }
      lid -> (if (preds.isEmpty) None
              else Some(preds.maxBy(r => (r._3, r._1))._1))
    }.toMap
    assert(got == want)
  }

  test("multi-probe LSH recall >= single-probe recall against brute force") {
    import graft.operators.Similarity
    val e = graft.core.Lakehouse.table(spark, sfSmoke, "embeddings")
    val planes = Similarity.hyperplanes(6, 64)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5))
    val single = pairs(Similarity.lshTopK(e, "vec_id", "embedding", 5, planes))
    val multi = pairs(Similarity.lshTopKMultiProbe(e, "vec_id", "embedding", 5, planes))
    val recallSingle = (single intersect truth).size.toDouble / truth.size
    val recallMulti = (multi intersect truth).size.toDouble / truth.size
    assert(recallMulti >= recallSingle)
    assert(recallMulti > 0.0)
  }

  test("first-band-wins candidates == naive distinct over all matching bands") {
    // duplicate-heavy random corpus: clusters of identical docs force
    // pairs that match in EVERY band (the case first-band-wins dedups)
    val texts = sample(Gen.oneOf(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump today",
      "sphinx of black quartz judge my vow"), 160)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // naive reference formulation: every matching band, then distinct
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 16)
    val banded = Dedup.lshBands(sig, "doc_id", 4, 4)
    val a = banded.select(col("band"), col("band_sig"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("band_sig"), col("doc_id").as("id_b"))
    val naive = a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("row-wise HOF minhash signature == groupBy signature") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text"))
    val agg = Dedup.minhashSignature(docs, "doc_id", "text", 5, 16)
      .select(col("doc_id"),
        array((0 until 16).map(i => col(s"mh$i")): _*).as("sig"))
    val rowwise = Dedup.minhashSignatureRowwise(docs, "doc_id", "text", 5, 16)
    val diff = agg.join(rowwise.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count()
    assert(diff == 0L && agg.count() == rowwise.count())
  }

  test("winnow fingerprints: rolling-hash expression == direct per-window reference") {
    import org.apache.spark.sql.graftx.WinnowFingerprints.{B1, B2, M, modPow}
    val k = 7; val w = 4
    val txtGen: Gen[String] = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq(' ', 'é', '中'))).map(_.mkString))
    val cases = sample(txtGen, 80) ++ Seq("", "x", "x" * (k - 1), "x" * (k + w))
    // independent reference: direct (non-rolling) polynomial per window
    def ref(text: String): Seq[Long] = {
      val p1 = (0 until k).map(i => modPow(B1, k - 1 - i))
      val p2 = (0 until k).map(i => modPow(B2, k - 1 - i))
      val cps = text.codePoints.toArray
      val n1 = math.max(cps.length - (k - 1), 1)
      def code(i: Int) = if (i < cps.length) cps(i).toLong else 0L
      val hs = (0 until n1).map { pos =>
        val h1 = (0 until k).map(i => code(pos + i) * p1(i) % M).sum % M
        val h2 = (0 until k).map(i => code(pos + i) * p2(i) % M).sum % M
        h1 * 2147483648L + h2
      }
      (0 until math.max(n1 - (w - 1), 1))
        .map(pos => hs.slice(pos, math.min(pos + w, n1)).min).distinct.sorted
    }
    val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), ArrayNumeric.winnowFps(col("text"), k, w).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"mismatch for case $i: '$t'")
    }
  }

  test("image codec round-trip: synthetic BMP decodes to its declared shape") {
    import graft.operators.Multimodal
    for ((w, h) <- Seq((8, 8), (13, 9), (47, 37), (1, 1))) {
      val bytes = Multimodal.syntheticBmp(w, h, seed = w * 1000L + h)
      assert(bytes.length == 54 + (w * 3 + 3) / 4 * 4 * h,
        s"BMP length formula broke for ${w}x$h")
      assert(Multimodal.decodeImage(bytes).contains((w, h, 3)))
    }
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("audio codec round-trip: synthetic WAV decodes to its declared samples") {
    import graft.operators.Multimodal
    for ((n, rate, seed) <- Seq((50, 8000, 0L), (317, 16000, 7L), (1, 44100, 99L))) {
      val bytes = Multimodal.syntheticWav(n, rate, seed)
      assert(bytes.length == 44 + 2 * n, s"WAV length formula broke for n=$n")
      val Some((r, ch, samples)) = Multimodal.decodeAudio(bytes)
      assert(r == rate && ch == 1 && samples.length == n)
      // the codec must hand back the exact synthesis formula's values
      val expect = Array.tabulate(n)(i => (((31L * i + seed) % 65536L) - 32768L).toShort)
      assert(samples.sameElements(expect), "decoded PCM differs from synthesis")
    }
    assert(Multimodal.decodeAudio("not audio at all".getBytes).isEmpty)
    // truncated header must not throw, just decline
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(10, 8000, 0L).take(20)).isEmpty)
  }

  test("BPE learns the classic low/lower merges and encode applies them") {
    import graft.operators.Bpe
    val corpus = Seq("low low lower").toDF("text")
    val merges = Bpe.learnMerges(spark, corpus, "text", nMerges = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // round 1: (l,o) and (o,w) both weigh 3; lhs tiebreak picks (l,o).
    // round 2: (lo,w) weighs 3 — a merge built ON a merged symbol.
    assert(merges.map(m => (m._2, m._3, m._4)) ==
      Seq(("l", "o", 3L), ("lo", "w", 3L)))
    val enc = Bpe.encode(Seq("low lower").toDF("text"), "text",
      merges.map(m => (m._2, m._3)))
      .select("word", "symbols").as[(String, Seq[String])].collect().toMap
    assert(enc("low") == Seq("low"))
    assert(enc("lower") == Seq("low", "e", "r"))
  }

  test("BPE merge never crosses a symbol boundary (suffix-match regression)") {
    import graft.operators.Bpe
    // After (l,o) builds symbol "lo", applying (o,w) must NOT merge
    // ["lo","w"] into "low": the "o" there is the tail of symbol "lo",
    // not a symbol. The flat `lhs¶rhs¶` replace of the old single-
    // terminator encoding matched exactly that suffix; the two-marker
    // `•lhs¶•rhs¶` pattern can only match whole symbols.
    val enc = Bpe.encode(Seq("low").toDF("text"), "text",
      Seq(("l", "o"), ("o", "w")))
      .select("word", "symbols").as[(String, Seq[String])].collect().toMap
    assert(enc("low") == Seq("lo", "w"))
    // and back-to-back pairs still merge left-to-right, non-overlapping
    val runs = Bpe.encode(Seq("aaaa aaa").toDF("text"), "text",
      Seq(("a", "a")))
      .select("word", "symbols").as[(String, Seq[String])].collect().toMap
    assert(runs("aaaa") == Seq("aa", "aa"))
    assert(runs("aaa") == Seq("aa", "a"))
  }

  test("winnowing guarantee: docs sharing a >= k+w-1 char run pair up") {
    val sharedRun = "the exact same thirty-plus character passage here"
    val docs = Seq(
      (1L, "alpha beta gamma " + sharedRun),
      (2L, sharedRun + " delta epsilon zeta"),
      (3L, "completely unrelated wording with zero overlapping windows"))
      .toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(docs, "doc_id", "text", k = 20, w = 10)
      .as[(Long, Long)].collect().toSet
    // k + w - 1 = 29 <= sharedRun.length, so (1,2) is guaranteed;
    // doc 3 shares no 20-char window with either.
    assert(pairs == Set((1L, 2L)))
  }

  test("saltedAggregate == direct aggregate on random skewed data") {
    import graft.operators.Skew
    // zipf-ish skew: most rows land on key 0
    val rowGen = Gen.zip(Gen.frequency(8 -> Gen.const(0L), 2 -> Gen.chooseNum(1L, 20L)),
      Gen.chooseNum(0L, 500L))
    val df = sample(rowGen, 400).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(countDistinct(col("v")).as("nd"), sum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAggregate(df, Seq("k"),
        saltCol = pmod(hash(col("v")), lit(7)),
        phase1 = Seq(countDistinct(col("v")).as("__nd"), sum(col("v")).as("__s")),
        phase2 = Seq(sum(col("__nd")).as("nd"), sum(col("__s")).as("s")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct && direct.nonEmpty)
  }

  test("perKeyCap properties: subset of input, ≤cap per key, salt-invariant") {
    import graft.operators.Sampling
    val rows = sample(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0, 7)), 500)
      .distinct.map { case (id, k) => (id, s"k$k") }
    val df = rows.toDF("doc_id", "source")
    for (cap <- Seq(1, 7, 40)) {
      val out = Sampling.perKeyCap(df, "source", "doc_id", cap, salts = 4)
      assert(out.exceptAll(df).isEmpty, "output must be a subset of input")
      assert(out.groupBy("source").count().filter(col("count") > cap).count() == 0)
      val unsalted = Sampling.perKeyCap(df, "source", "doc_id", cap, salts = 1)
      assert(out.exceptAll(unsalted).isEmpty && unsalted.exceptAll(out).isEmpty,
        s"salted != unsalted at cap=$cap")
      // keys under their cap keep everything
      val small = df.groupBy("source").count().filter(col("count") <= cap)
        .select("source").as[String].collect().toSet
      val kept = out.groupBy("source").count()
        .as[(String, Long)].collect().toMap
      val full = df.groupBy("source").count().as[(String, Long)].collect().toMap
      small.foreach(k => assert(kept.getOrElse(k, 0L) == full(k)))
    }
  }

  test("quantizeInt8 properties: codes in [-127,127], error ≤ scale/2, sign-preserving") {
    import graft.functions.VectorOps
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e6f, 1e6f))
    val rows = sample(vecGen, 200).zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val df = rows.toDF("id", "v")
      .withColumn("q", VectorOps.quantizeInt8(col("v")))
    val checked = df.select(
      aggregate(col("q.codes"), lit(true),
        (acc, c) => acc && c >= -127 && c <= 127).as("in_range"),
      aggregate(zip_with(VectorOps.dequantizeInt8(col("q")), col("v"),
        (dq, x) => abs(dq - x.cast("double"))), lit(0.0d),
        (a, e) => greatest(a, e)).as("max_err"),
      col("q.scale").as("scale"),
      aggregate(zip_with(col("q.codes"), col("v"),
        (c, x) => (c === 0) || (c > 0) === (x > 0)), lit(true),
        (a, b) => a && b).as("signs_ok"))
    assert(checked.filter(!col("in_range")).count() == 0)
    assert(checked.filter(col("max_err") > col("scale") * 0.5 + 1e-9).count() == 0)
    assert(checked.filter(!col("signs_ok")).count() == 0)
  }

  test("trigramsOf matches the definitional sliding window") {
    import graft.operators.GrepIndex
    val txtGen = Gen.listOf(Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString)
    val rows = sample(txtGen, 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "text")
    val got = df.select(col("id"), GrepIndex.trigramsOf(col("text")).as("tg"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (id, t) =>
      val expect = if (t.length < 3) Seq.empty else t.sliding(3).toSeq.distinct
      assert(got(id).sorted == expect.sorted, s"text '$t'")
    }
  }

  test("groupedSplit: total, deterministic, and constant within a group") {
    import graft.operators.Sampling
    val gkGen = Gen.chooseNum(0L, 60L)
    val rows = sample(Gen.zip(Gen.chooseNum(0L, 10000L), gkGen), 300)
    val df = rows.toDF("id", "gk")
    val split = Sampling.groupedSplit(col("gk"),
      Seq(("train", 8000L), ("val", 9000L), ("test", 10000L)))
    val out = df.withColumn("split", split)
    // every row assigned, groups never straddle splits, re-evaluation identical
    assert(out.filter(col("split").isNull).count() == 0)
    val straddle = out.groupBy("gk")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(straddle == 0)
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
      df.withColumn("split", split).collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet)
  }

  test("tokenBudgetSelect == naive global-window greedy selection") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    // coarse 4-level scores (the quality-rubric shape the jitter exists
    // for) over random token counts
    val rowGen = Gen.zip(Gen.chooseNum(1L, 5000L),
      Gen.chooseNum(0, 3).map(_ / 3.0), Gen.chooseNum(1, 50))
    val rows = sample(rowGen, 350).distinctBy(_._1)
    val df = rows.toDF("id", "score", "tok")
    val frac = 0.3
    val got = Sampling.tokenBudgetSelect(df, "id", "score", "tok", frac)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val budget = df.agg(floor(sum(col("tok")) * frac).cast("long"))
      .head.getLong(0)
    val w = Window.partitionBy(lit(0)).orderBy(col("score").desc,
      Sampling.keepHash(col("id")).asc, col("id").asc)
    val naive = df
      .withColumn("cum", sum(col("tok").cast("long")).over(w))
      .filter(col("cum") <= budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == naive && got.nonEmpty,
      s"hierarchical cumsum diverged: got ${got.size}, naive ${naive.size}")
  }

  test("containmentPairs: substrings contained, exact dups mutual, disjoint absent") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(11)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val outer = randText(240)
    val inner = outer.substring(60, 180) // verbatim substring
    val stranger = randText(240)
    val dupA = randText(200)
    val docs = Seq((1L, outer), (2L, inner), (3L, stranger),
      (4L, dupA), (5L, dupA)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", k = 20, w = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1L)), s"substring doc must be contained: $pairs")
    assert(pairs.contains((4L, 5L)) && pairs.contains((5L, 4L)),
      s"exact dups must be mutually contained: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"disjoint doc must pair with nothing: $pairs")
    assert(!pairs.contains((1L, 2L)),
      s"the longer doc must not be 'contained' in its own substring: $pairs")
  }

  test("dsirWeights: target-vocab docs score above off-domain docs") {
    import graft.operators.LangModel
    // two disjoint vocabularies; target predicate marks vocab-A docs
    val aWords = Seq("alpha", "beta", "gamma", "delta")
    val bWords = Seq("omega", "sigma", "tau", "rho")
    val rnd = new scala.util.Random(5)
    def doc(ws: Seq[String]) = (1 to 30).map(_ => ws(rnd.nextInt(ws.size))).mkString(" ")
    val docs = ((1L to 10L).map(i => (i, "a", doc(aWords))) ++
      (11L to 20L).map(i => (i, "b", doc(bWords)))).toDF("id", "dom", "text")
    val scored = LangModel.dsirWeights(docs, "id", "text", col("dom") === "a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.length == 20 && scored.forall(_._2 == 30L))
    val aAvg = scored.filter(_._1 <= 10L).map(_._3).sum / 10
    val bAvg = scored.filter(_._1 > 10L).map(_._3).sum / 10
    assert(aAvg > 0 && bAvg < 0 && aAvg > bAvg,
      s"target-domain docs must carry positive log-ratio: a=$aAvg b=$bAvg")
  }

  // ---- distinct-value decomposition family ------------------------------
  // percentileRank, equiDepthHistogram, and tokenBudgetSelect all replace a
  // corpus-sized single-partition window with a distinct-value (or bin)
  // table + value-bounded window. The naive window formulation is the
  // specification; the decompositions must match it under nulls, heavy
  // ties, and empty input.

  private val noisyValsGen: Gen[Option[Long]] = Gen.frequency(
    3 -> Gen.const(None),                         // nulls
    10 -> Gen.chooseNum(0L, 12L).map(Some(_)),    // heavy ties
    5 -> Gen.chooseNum(0L, 100000L).map(Some(_))) // spread tail

  test("percentileRank == naive percent_rank under nulls and ties") {
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    val rows = sample(noisyValsGen, 400).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("long").as("v"))
    val got = Relational.percentileRank(df, "v", "pr")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val naive = df.filter(col("v").isNotNull)
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(lit(0)).orderBy(col("v"))))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(got == naive && got.nonEmpty,
      s"decomposed rank diverged: got ${got.size} naive ${naive.size}")
    // null scores must DROP, never sort into rank 0
    assert(!got.exists(_._2 < 0) &&
      got.size == rows.count(_._2.isDefined))
  }

  test("equiDepthHistogram == naive rank-window form under nulls and ties") {
    import graft.operators.Profiling
    import org.apache.spark.sql.expressions.Window
    val buckets = 8
    val rows = sample(noisyValsGen, 400).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("long").as("v"))
    val got = Profiling.equiDepthHistogram(df, col("v"), buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val nn = df.filter(col("v").isNotNull)
    val n = nn.count()
    val naive = nn
      .withColumn("below", rank().over(
        Window.partitionBy(lit(0)).orderBy(col("v"))) - 1)
      .withColumn("bucket", floor(col("below") * buckets / n.toDouble))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == naive && got.nonEmpty,
      s"equi-depth decomposition diverged:\n got   $got\n naive $naive")
    // depths re-assemble exactly the NON-NULL count (nulls excluded on
    // both the cumulative and total sides — the r8 oracle divergence)
    assert(got.toSeq.map(_._2).sum == n)
  }

  test("weightedMedian == explicit weight-expansion median under ties") {
    import graft.operators.Profiling
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(0L, 15L), Gen.chooseNum(1, 5))
    val rows = sample(rowGen, 300)
    val df = rows.toDF("g", "v", "w")
    val got = Profiling.weightedMedian(df, col("g"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // specification: replicate each row w times, lower median =
    // ceil(W/2)-th smallest
    for ((g, grp) <- rows.groupBy(_._1)) {
      val expanded = grp.flatMap { case (_, v, w) => Seq.fill(w)(v) }.sorted
      val want = expanded((expanded.size + 1) / 2 - 1)
      assert(got(g) == ((want, expanded.size.toLong)),
        s"group $g: got ${got(g)}, want ($want, ${expanded.size})")
    }
  }

  test("aqpGroupSum: rate=1 is the exact total with stderr 0; CI covers truth") {
    import graft.operators.Sampling
    val rowGen = Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(1, 100))
    val rows = sample(rowGen, 400).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("id", "g", "v")
    val exact = rows.groupBy(_._2).map { case (g, grp) =>
      g -> grp.map(_._3.toDouble).sum // ints on the 2^-20 grid: exact
    }
    val full = Sampling.aqpGroupSum(df, col("id"), col("g"), col("v"), 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    for ((g, t) <- exact) {
      assert(full(g)._1 == t, s"rate=1 must be exact for $g: ${full(g)._1} vs $t")
      assert(full(g)._2 == 0.0, s"rate=1 stderr must be 0: ${full(g)._2}")
    }
    // at 10%, the Horvitz-Thompson estimate sits inside a 4-stderr band
    // (deterministic given the fixed md5 sample — a pinned fact)
    val est = Sampling.aqpGroupSum(df, col("id"), col("g"), col("v"), 0.1)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    for ((g, t) <- exact; (e, se) <- est.get(g)) {
      assert(se > 0, s"subsampled stderr must be positive for $g")
      assert(math.abs(e - t) <= 4 * se,
        s"estimate out of band for $g: est=$e exact=$t stderr=$se")
    }
  }

  test("sparseCosinePairsScalable == sparseCosinePairs bit-for-bit") {
    import graft.operators.TfIdf
    // small alphabet → colliding n-grams → real candidate pressure on
    // the prefix filter; near-dup clones guarantee above-threshold pairs
    val rnd = new scala.util.Random(23)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val base = (1L to 40L).map(i => (i, randText(40 + rnd.nextInt(80))))
    val clones = base.take(10).map { case (i, t) =>
      (i + 100L, t.patch(rnd.nextInt(t.length - 3), "zz", 2)) }
    val docs = (base ++ clones).toDF("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    val exact = collectPairs(TfIdf.sparseCosinePairs(
      docs, "doc_id", "text", n = 3, maxDfFrac = 0.5, threshold = 0.6))
    val scalable = collectPairs(TfIdf.sparseCosinePairsScalable(
      docs, "doc_id", "text", n = 3, maxDfFrac = 0.5, maxDfAbs = 1000L,
      threshold = 0.6))
    assert(exact == scalable && exact.nonEmpty,
      s"prefix-filtered join diverged: exact ${exact.size}, scalable ${scalable.size}")
    // duplicate doc ids (un-deduped ingest) must MERGE per (id, term)
    // — the in-row ShingleTf counting still re-aggregates across rows
    // sharing an id, so both forms keep agreeing (and the scalable
    // form's per-doc term map never sees a duplicate key)
    val dupDocs = docs.unionByName(docs.limit(7))
    val exactDup = collectPairs(TfIdf.sparseCosinePairs(
      dupDocs, "doc_id", "text", n = 3, maxDfFrac = 0.5, threshold = 0.6))
    val scalableDup = collectPairs(TfIdf.sparseCosinePairsScalable(
      dupDocs, "doc_id", "text", n = 3, maxDfFrac = 0.5, maxDfAbs = 1000L,
      threshold = 0.6))
    assert(exactDup == scalableDup && exactDup.nonEmpty,
      s"dup-id corpus diverged: exact ${exactDup.size}, scalable ${scalableDup.size}")
  }

  test("distinct-value family: all-null and empty inputs yield empty results") {
    import graft.operators.{Profiling, Relational}
    val allNull = Seq.tabulate(20)(i => (i.toLong, Option.empty[java.lang.Long]))
      .toDF("id", "v").select(col("id"), col("v").cast("long").as("v"))
    assert(Relational.percentileRank(allNull, "v", "pr").count() == 0)
    assert(Profiling.equiDepthHistogram(allNull, col("v"), 8).count() == 0)
    val empty = allNull.filter(lit(false))
    assert(Relational.percentileRank(empty, "v", "pr").count() == 0)
    assert(Profiling.equiDepthHistogram(empty, col("v"), 8).count() == 0)
  }

  test("triangleCounts == brute-force enumeration on random multigraphs") {
    import graft.operators.Graph
    // random messy edge lists: duplicates, reversals, self-loops —
    // the degree-ordered oriented count must equal the O(n³) reference
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L)
    } yield (a, b)
    val graphs = (0 until 6).map(g => sample(edgeGen, 60 + 7 * g))
    for (edges <- graphs) {
      // reference: adjacency-set triangle scan over canonical edges
      val adj = edges.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        .withDefaultValue(Set.empty[Long])
      val nodes = adj.keys.toSeq.sorted
      val expected = (for {
        u <- nodes; v <- nodes if u < v && adj(u)(v)
        w <- nodes if v < w && adj(u)(w) && adj(v)(w)
      } yield Seq(u, v, w)).flatten
        .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
      val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        s"triangle mismatch on ${edges.size}-edge graph: $got vs $expected")
      // clustering coefficient consistency: tri column matches, coef
      // bounded in [0, 1]
      val coef = Graph.clusteringCoefficient(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      assert(coef.forall { case (id, tri, c) =>
        tri == expected.getOrElse(id, 0L) && c >= 0.0 && c <= 1.0 },
        s"coef inconsistency: ${coef.mkString(";")}")
    }
  }

  test("kCore and labelPropagation == reference synchronous dynamics") {
    import graft.operators.Graph
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L)
    } yield (a, b)
    for (g <- 0 until 4) {
      val edges = sample(edgeGen, 45 + 9 * g)
      var canon = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      // reference peel, synchronous: drop all sub-k nodes per round
      for (rounds <- 1 to 3; k <- Seq(2L, 3L)) {
        var ref = canon
        for (_ <- 1 to rounds) {
          val deg = ref.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
          val keep = deg.filter(_._2 >= k).keySet
          ref = ref.filter(e => keep(e._1) && keep(e._2))
        }
        val refDeg = ref.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        val got = Graph.kCore(edges.toDF("a", "b"), "a", "b", k, rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == refDeg,
          s"kCore mismatch (k=$k rounds=$rounds): $got vs $refDeg")
      }
      // reference synchronous LPA over the doubled edge list
      val dir = canon.toSeq.flatMap(e => Seq(e, e.swap))
      val inN = dir.groupBy(_._2).map { case (n, es) => n -> es.map(_._1) }
      val nodes = dir.flatMap(e => Seq(e._1, e._2)).distinct
      var lab = nodes.map(n => n -> n).toMap
      for (_ <- 1 to 3) {
        lab = nodes.map { n =>
          val nbrs = inN.getOrElse(n, Nil).map(lab)
          if (nbrs.isEmpty) n -> lab(n)
          else {
            val counts = nbrs.groupBy(identity)
              .map { case (l, xs) => l -> xs.size }
            val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
            n -> best
          }
        }.toMap
      }
      val gotLpa = Graph.labelPropagation(
          dir.toDF("src", "dst"), "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLpa == lab, s"LPA mismatch: $gotLpa vs $lab")
    }
  }

  test("bfsDistances == reference BFS; trimmedMean == sorted-slice reference") {
    import graft.operators.{Graph, Profiling}
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 17L); b <- Gen.choose(0L, 17L)
    } yield (a, b)
    for (g <- 0 until 4) {
      val edges = sample(edgeGen, 30 + 8 * g).filter { case (a, b) => a != b }
      val adj = edges.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }
        .withDefaultValue(Set.empty[Long])
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val seeds = Seq(0L, 5L, 99L) // 99 may be off-graph
      for (depth <- 1 to 3) {
        // reference: level-synchronous BFS from the in-graph seeds
        var dist = seeds.filter(nodes).map(_ -> 0).toMap
        var frontier = dist.keySet
        for (r <- 1 to depth) {
          val next = frontier.flatMap(adj).diff(dist.keySet)
          dist = dist ++ next.map(_ -> r)
          frontier = next
        }
        val got = Graph.bfsDistances(edges.toDF("src", "dst"), "src", "dst",
            seeds.toDF("seed"), "seed", depth)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == dist, s"BFS mismatch depth=$depth: $got vs $dist")
      }
    }
    // trimmed mean vs the sorted-slice reference, over random 2-decimal
    // values with ties, per trim percentage
    val valGen: Gen[Double] = Gen.choose(0, 2000).map(_ / 100.0)
    for (g <- 0 until 3; pct <- Seq(0, 5, 25)) {
      val vs = sample(valGen, 25 + 10 * g)
      val cents = vs.map(v => math.floor(v * 100 + 0.5).toLong).sorted
      val trim = math.floor(cents.size.toDouble * pct / 100.0).toLong.toInt
      val band = cents.slice(trim, cents.size - trim)
      val expected = (band.sum.toDouble / 100.0) / band.size.toDouble
      val got = Profiling.trimmedMean(
          vs.map(("g", _)).toDF("g", "v"), col("g"), col("v"), pct)
        .collect().head
      assert(got.getLong(2) == band.size.toLong &&
        got.getDouble(3) == expected,
        s"trimmedMean mismatch pct=$pct: $got vs ($expected, ${band.size})")
    }
  }

  test("pairRules == brute-force rule mining on random baskets") {
    import graft.operators.Association
    val rowGen: Gen[(Long, Long)] = for {
      bk <- Gen.choose(0L, 11L); it <- Gen.choose(0L, 7L)
    } yield (bk, it)
    // cap = 256 never fires (items 0..7); cap = 4 fires on random
    // baskets and must behave as a corpus restriction — every support
    // (pair, item, N) computed over the guarded basket set
    for (g <- 0 until 4; cap <- Seq(256, 4)) {
      val rows = sample(rowGen, 40 + 11 * g)
      val baskets = rows.toSet[(Long, Long)]
        .groupBy(_._1).filter(_._2.size <= cap).values.flatten.toSet
      val minSup = 2L
      val nB = baskets.groupBy(_._1).size
      val itemN = baskets.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
      val byBasket = baskets.groupBy(_._1).values.map(_.map(_._2))
      val pairN = byBasket.toSeq
        .flatMap(items => items.toSeq.sorted.combinations(2))
        .groupBy(identity).map { case (p, xs) => (p(0), p(1)) -> xs.size.toLong }
        .filter { case ((a, b), c) =>
          c >= minSup && itemN(a) >= minSup && itemN(b) >= minSup }
      val expected = pairN.toSeq.flatMap { case ((a, b), c) =>
        Seq((a, b, c), (b, a, c)) }
        .map { case (ante, cons, c) =>
          (ante, cons, c, itemN(ante), itemN(cons),
            c.toDouble / itemN(ante).toDouble,
            (c.toDouble * nB.toDouble) /
              (itemN(ante).toDouble * itemN(cons).toDouble)) }.toSet
      val got = Association.pairRules(rows.toDF("bk", "it"), "bk", "it",
          minSupport = minSup, k = 1000, maxBasketItems = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
      assert(got == expected,
        s"rule mismatch on ${rows.size} rows cap=$cap: " +
          s"${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("linkPrediction == brute-force CN/RA/Jaccard on random graphs") {
    import graft.operators.Graph
    val edgeGen: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 14L); b <- Gen.choose(0L, 14L)
    } yield (a, b)
    val Q = 1073741824.0
    def q30(x: Double) = math.floor(x * Q + 0.5) / Q
    for (g <- 0 until 3; cap <- Seq(10000L, 4L)) {
      val raw = sample(edgeGen, 35 + 9 * g)
      val canon = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      val adj = (canon ++ canon.map(_.swap))
        .groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      val deg = adj.map { case (k, ns) => k -> ns.size.toLong }
      // brute force: score every non-adjacent pair through capped
      // centers, exactly the operator's contract
      val expected = (for {
        (w, ns) <- adj.toSeq if deg(w) <= cap
        a <- ns; b <- ns if a < b && !canon((a, b))
      } yield ((a, b), w))
        .groupBy(_._1).map { case ((a, b), ws) =>
          val cn = ws.size.toLong
          val ra = ws.map(x => q30(1.0 / deg(x._2))).sum
          (a, b, cn, ra,
            cn.toDouble / (deg(a) + deg(b) - cn).toDouble)
        }.toSet
      val got = Graph.linkPrediction(raw.toDF("a", "b"), "a", "b",
          k = 1000, maxCenterDeg = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      assert(got == expected,
        s"linkpred mismatch g=$g cap=$cap: " +
          s"${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("weightedSssp == brute-force hop-bounded min-plus on random graphs") {
    import graft.operators.Graph
    val edgeGen: Gen[(Long, Long, Long)] = for {
      a <- Gen.choose(0L, 11L); b <- Gen.choose(0L, 11L)
      w <- Gen.choose(0L, 9L)
    } yield (a, b, w)
    for (g <- 0 until 3; rounds <- Seq(1, 3, 8)) {
      val raw = sample(edgeGen, 30 + 7 * g)
      // operator contract: parallel edges collapse to min cost
      val e = raw.groupBy(t => (t._1, t._2))
        .map { case ((a, b), es) => (a, b, es.map(_._3).min) }.toSeq
      val nodes = e.flatMap(t => Seq(t._1, t._2)).toSet
      val seeds = Seq(0L, 5L).filter(nodes)
      // brute force: r rounds of synchronous relaxation
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relaxed = e.flatMap { case (a, b, w) =>
          dist.get(a).map(d => b -> (d + w)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, ds) => k -> ds.map(_._2).min }
      }
      val got = Graph.weightedSssp(raw.toDF("src", "dst", "w"),
          "src", "dst", "w", Seq(0L, 5L).toDF("seed"), "seed", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist,
        s"sssp mismatch g=$g rounds=$rounds: $got vs $dist")
    }
  }

  test("quantileNormalize == brute-force rank mapping on random scores") {
    import graft.operators.Relational
    val rowGen: Gen[(String, Long)] = for {
      s <- Gen.oneOf("s1", "s2", "s3"); v <- Gen.choose(0L, 19L)
    } yield (s, v)
    for (g <- 0 until 3) {
      val rows = sample(rowGen, 60 + 13 * g)
      val all = rows.map(_._2).sorted
      val nTot = all.size.toLong
      def globalAtRank(t: Long): Long = all((t - 1).toInt)
      val expected = rows.map { case (s, v) =>
        val src = rows.filter(_._1 == s).map(_._2)
        val r = src.count(_ <= v).toLong
        val t = (r * nTot + src.size - 1) / src.size
        (s, v, globalAtRank(t))
      }
      val got = Relational.quantileNormalize(rows.toDF("src", "v"),
          "src", "v", outCol = "nv")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got.sorted == expected.sorted,
        s"qnorm mismatch g=$g: ${got.diff(expected)} / ${expected.diff(got)}")
    }
  }
}
