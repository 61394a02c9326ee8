package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{ModelScoring, Similarity}

/** Batch model-scoring queries (SURVEY §2.9 ML predict surface) over
  * the `embeddings` table. The "trained models" are deterministic
  * fixtures — a labeled subset of the corpus for the KNN classifier,
  * a seeded weight vector for the logistic scorer — so the DuckDB
  * oracle reproduces predictions exactly.
  */
object MLQueries {

  private val K = 3
  private val NTrain = 40
  private val Dim = 64
  private lazy val weights: Seq[Double] = Similarity.hyperplanes(1, Dim, seed = 7L).head
  private val Bias = 0.1
  private val QBuckets = 1 << 20
  private val QScale = 8.0
  private val QBias = 0.0
  private val TreeBias = 0.05
  // deterministic stand-ins for an exported GBT: depth-2 splits over
  // seeded feature indices (a real model serializes to the same Tree
  // shape and compiles identically)
  private def fixtureTree(k: Int): ModelScoring.Tree = ModelScoring.Split(
    (k * 7) % Dim, 0.0,
    ModelScoring.Split((k * 13 + 3) % Dim, -0.2,
      ModelScoring.Leaf(-0.6 + 0.1 * k), ModelScoring.Leaf(0.3)),
    ModelScoring.Split((k * 19 + 5) % Dim, 0.2,
      ModelScoring.Leaf(0.1), ModelScoring.Leaf(0.5 - 0.05 * k)))
  private lazy val fixtureTrees = (0 until 4).map(fixtureTree)

  val queries: Map[String, QueryFn] = Map(
    // Deterministic negative sampling for contrastive training: k
    // hash-drawn corpus negatives per anchor, same-label positives
    // excluded, replayable (same corpus -> same negatives).
    "ml_negatives" -> ((s, d) => {
      graft.operators.Sampling.negativeSample(
        tbl(s, d, "embeddings").select(col("vec_id"), col("label")),
        "vec_id", "label", k = 4)
    }),

    // KNN genome-classifier surface: broadcast labeled training set,
    // cosine top-k, majority vote.
    "ml_knn_predict" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
      val train = e.filter(col("vec_id") < NTrain)
        .select(col("embedding"), pmod(col("vec_id"), lit(4)).as("label"))
      val data = e.filter(col("vec_id") >= NTrain)
      ModelScoring.knnPredict(data, train, "vec_id", "embedding", "label", K)
    }),

    // CatBoost-predict surface as a parametric stub: literal-weight
    // logistic score, fully codegen.
    "ml_linear_score" -> ((s, d) => {
      tbl(s, d, "embeddings").select(col("vec_id"),
        round4(ModelScoring.linearScore(col("embedding"), weights, Bias)).as("score"))
    }),

    // GBT/CatBoost-shaped tree-ensemble scoring: the literal trees
    // compile to nested CASE WHEN — the model IS the plan.
    "ml_tree_score" -> ((s, d) => {
      tbl(s, d, "embeddings").select(col("vec_id"),
        round4(ModelScoring.treeEnsembleScore(
          col("embedding"), fixtureTrees, TreeBias)).as("score"))
    }),

    // Reliability diagram for the scorer — the calibration report a
    // quality-filter threshold is chosen from: fixed-width score bins
    // (conventional for calibration curves, and unlike ntile-deciles it
    // needs NO global sort / partition-less window — the binning is
    // map-side and the report is one partial-agg groupBy), per bin the
    // count, mean score, and observed positive rate against the
    // fixture label.
    "ml_calibration" -> ((s, d) => {
      val scored = tbl(s, d, "embeddings").select(
        (col("label") >= 2).cast("int").as("pos"),
        round4(ModelScoring.linearScore(col("embedding"), weights, Bias)).as("score"))
      scored
        .groupBy(least(floor(col("score") * 10), lit(9.0)).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          round4(avg(col("score"))).as("mean_score"),
          round4(avg(col("pos").cast("double"))).as("pos_rate"))
    }),

    // fastText-style learned quality filter: hashed uni+bigram bag,
    // mean-pooled bucket weights, logistic head. keep is derived from
    // the ROUNDED score so both sides threshold the same value.
    "ml_quality_filter" -> ((s, d) => {
      val score = round4(ModelScoring.hashedTextScore(
        col("text"), QBuckets, QScale, QBias))
      tblSpread(s, d, "documents").select(col("doc_id"), score.as("score"),
        (score >= 0.5).as("keep"))
    }),

    // Distributed logistic-regression TRAINING: 3 full-batch GD steps
    // over dyadic-rational features (order-independent exact gradient
    // sums — see ModelScoring.logregTrainGD), then the trained
    // weights + training accuracy in one summary row.
    "ml_logreg_train" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(
        lit(1.0).as("x0"),
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"),
        when(col("n_chars") >= 250, 1.0).otherwise(0.0).as("y"))
        .localCheckpoint()
      val w = ModelScoring.logregTrainGD(base, k = 3, iters = 3)
      val p = ModelScoring.logregPredict(w)
      base.agg(
        count(lit(1)).as("n"),
        round4(sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("accuracy"))
        .select(col("n"),
          (floor(lit(w(0)) * 1000000 + 0.5) / 1000000).as("w0"),
          (floor(lit(w(1)) * 1000000 + 0.5) / 1000000).as("w1"),
          (floor(lit(w(2)) * 1000000 + 0.5) / 1000000).as("w2"),
          col("accuracy"))
    }),

    // Feature moments + covariance in ONE pass (the standardization /
    // PCA-whitening building block): dyadic-rational features make
    // every raw sum exact, so means and covariances are
    // bit-reproducible across partitionings and engines.
    "ml_feature_moments" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"))
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * 1000000 + lit(0.5)) / 1000000
      base.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("__s1"), sum(col("x2")).as("__s2"),
        sum(col("x1") * col("x1")).as("__s11"),
        sum(col("x1") * col("x2")).as("__s12"),
        sum(col("x2") * col("x2")).as("__s22"))
        .select(col("n"),
          r6(col("__s1") / col("n")).as("mean1"),
          r6(col("__s2") / col("n")).as("mean2"),
          r6(col("__s11") / col("n")
            - (col("__s1") / col("n")) * (col("__s1") / col("n"))).as("cov11"),
          r6(col("__s12") / col("n")
            - (col("__s1") / col("n")) * (col("__s2") / col("n"))).as("cov12"),
          r6(col("__s22") / col("n")
            - (col("__s2") / col("n")) * (col("__s2") / col("n"))).as("cov22"))
    }),

    // Standardization applied: per-row z-scores using the one-pass
    // moments (1-row broadcast) — the map-side half of the
    // moments/whitening pair.
    "ml_standardize" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(col("doc_id"),
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"))
      val m = base.agg(
        count(lit(1)).as("__n"),
        sum(col("x1")).as("__s1"), sum(col("x2")).as("__s2"),
        sum(col("x1") * col("x1")).as("__s11"),
        sum(col("x2") * col("x2")).as("__s22"))
        .select((col("__s1") / col("__n")).as("__m1"),
          (col("__s2") / col("__n")).as("__m2"),
          sqrt(col("__s11") / col("__n")
            - (col("__s1") / col("__n")) * (col("__s1") / col("__n"))).as("__sd1"),
          sqrt(col("__s22") / col("__n")
            - (col("__s2") / col("__n")) * (col("__s2") / col("__n"))).as("__sd2"))
      base.crossJoin(broadcast(m))
        .select(col("doc_id"),
          round4((col("x1") - col("__m1")) / col("__sd1")).as("z1"),
          round4((col("x2") - col("__m2")) / col("__sd2")).as("z2"))
    }),

    // PCA end-to-end: exact one-pass covariance (dyadic features) +
    // the CLOSED-FORM 2x2 eigen solution (λ = mean ± sqrt(Δ² + b²)) +
    // map-side per-row principal-component scores — every step is
    // deterministic arithmetic, so the whole pipeline is
    // differentially checkable; a d-dim PCA eigen-solves the same
    // exact covariance on the driver.
    "ml_pca_project" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(col("doc_id"),
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"))
      val m = base.agg(
        count(lit(1)).as("__n"),
        sum(col("x1")).as("__s1"), sum(col("x2")).as("__s2"),
        sum(col("x1") * col("x1")).as("__s11"),
        sum(col("x1") * col("x2")).as("__s12"),
        sum(col("x2") * col("x2")).as("__s22"))
        .select((col("__s1") / col("__n")).as("m1"),
          (col("__s2") / col("__n")).as("m2"),
          (col("__s11") / col("__n")
            - (col("__s1") / col("__n")) * (col("__s1") / col("__n"))).as("a"),
          (col("__s12") / col("__n")
            - (col("__s1") / col("__n")) * (col("__s2") / col("__n"))).as("b"),
          (col("__s22") / col("__n")
            - (col("__s2") / col("__n")) * (col("__s2") / col("__n"))).as("c"))
        .withColumn("lam1",
          (col("a") + col("c")) / 2
            + sqrt(((col("a") - col("c")) / 2) * ((col("a") - col("c")) / 2)
              + col("b") * col("b")))
        .withColumn("__vnorm",
          sqrt(col("b") * col("b")
            + (col("lam1") - col("a")) * (col("lam1") - col("a"))))
        .withColumn("u1", col("b") / col("__vnorm"))
        .withColumn("u2", (col("lam1") - col("a")) / col("__vnorm"))
      base.crossJoin(broadcast(m))
        .select(col("doc_id"),
          round4(col("u1") * (col("x1") - col("m1"))
            + col("u2") * (col("x2") - col("m2"))).as("pc1"),
          round4(-col("u2") * (col("x1") - col("m1"))
            + col("u1") * (col("x2") - col("m2"))).as("pc2"))
    }),

    // K-fold cross-validated training: all 4 leave-one-fold-out models
    // fitted in SHARED aggregation passes (fold ≠ model join), each
    // scored on its own held-out fold — model selection for the scans
    // of one fit.
    "ml_logreg_cv" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(
        pmod(col("doc_id"), lit(4)).cast("int").as("fold"),
        lit(1.0).as("x0"),
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"),
        when(col("n_chars") >= 250, 1.0).otherwise(0.0).as("y"))
        .localCheckpoint()
      ModelScoring.logregTrainCV(base, "fold", k = 4, d = 3, iters = 3)
    }),

    // The per-group fleet: one independent logistic model per language,
    // all fitted in the SAME per-step aggregation pass (G models for
    // the scans of one). Per-lang weights + training accuracy.
    "ml_logreg_by_group" -> ((s, d) => {
      val base = tbl(s, d, "documents").select(
        col("lang"),
        lit(1.0).as("x0"),
        (col("n_chars").cast("double") / 512).as("x1"),
        (size(split(trim(col("text")), "\\s+")).cast("double") / 128).as("x2"),
        when(col("n_chars") >= 250, 1.0).otherwise(0.0).as("y"))
        .localCheckpoint()
      val wDf = ModelScoring.logregTrainGDGrouped(base, "lang", k = 3, iters = 3)
      val joined = base.join(broadcast(wDf), Seq("lang"))
      val z = (0 until 3).map(i => col(s"w$i") * col(s"x$i")).reduce(_ + _)
      val p = ModelScoring.roundP(lit(1.0) / (lit(1.0) + exp(-z)))
      joined.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        (floor(first(col("w0")) * 1000000 + 0.5) / 1000000).as("w0"),
        (floor(first(col("w1")) * 1000000 + 0.5) / 1000000).as("w1"),
        (floor(first(col("w2")) * 1000000 + 0.5) / 1000000).as("w2"),
        round4(sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("accuracy"))
    }))

  private def dotSql(x: String, y: String): String =
    s"list_sum(list_transform(generate_series(1, $Dim), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private def weightLit: String = weights.mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "ml_logreg_train" -> {
      // mirrors logregTrainGD: 3 unrolled full-batch GD steps, p
      // rounded to 2^-20 so every gradient term (and hence each sum)
      // is an exact double in both engines
      def pExpr(w0: String, w1: String, w2: String) =
        s"floor((1/(1 + exp(-($w0*x0 + $w1*x1 + $w2*x2)))) * 1048576 + 0.5) / 1048576"
      def grads(src: String) =
        s"""SELECT sum((p - y) * x0) AS ga, sum((p - y) * x1) AS gb,
              sum((p - y) * x2) AS gc FROM $src"""
      s"""WITH d AS (
            SELECT 1.0 AS x0, n_chars::DOUBLE / 512 AS x1,
              len(string_split_regex(trim(text), '\\s+'))::DOUBLE / 128 AS x2,
              (CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END) AS y
            FROM documents),
          nn AS (SELECT count(*)::BIGINT AS n FROM d),
          p1 AS (SELECT d.*, ${pExpr("0.0", "0.0", "0.0")} AS p FROM d),
          gr1 AS (${grads("p1")}),
          wt1 AS (SELECT 0.0 - (ga / n) * 0.25 AS wa,
                    0.0 - (gb / n) * 0.25 AS wb,
                    0.0 - (gc / n) * 0.25 AS wc FROM gr1 CROSS JOIN nn),
          p2 AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d CROSS JOIN wt1),
          gr2 AS (${grads("p2")}),
          wt2 AS (SELECT wa - (ga / n) * 0.25 AS wa,
                    wb - (gb / n) * 0.25 AS wb,
                    wc - (gc / n) * 0.25 AS wc
                  FROM gr2 CROSS JOIN wt1 CROSS JOIN nn),
          p3 AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d CROSS JOIN wt2),
          gr3 AS (${grads("p3")}),
          wt3 AS (SELECT wa - (ga / n) * 0.25 AS wa,
                    wb - (gb / n) * 0.25 AS wb,
                    wc - (gc / n) * 0.25 AS wc
                  FROM gr3 CROSS JOIN wt2 CROSS JOIN nn),
          pf AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d CROSS JOIN wt3),
          acc AS (SELECT count(*)::BIGINT AS n,
                    sum(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)::BIGINT
                      AS correct
                  FROM pf)
          SELECT n,
            floor(wa * 1000000 + 0.5) / 1000000 AS w0,
            floor(wb * 1000000 + 0.5) / 1000000 AS w1,
            floor(wc * 1000000 + 0.5) / 1000000 AS w2,
            floor(correct::DOUBLE / n * 10000 + 0.5) / 10000 AS accuracy
          FROM wt3 CROSS JOIN acc"""
    },
    "ml_pca_project" ->
      """WITH d AS (
           SELECT doc_id, n_chars::DOUBLE / 512 AS x1,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE / 128 AS x2
           FROM documents),
         s AS (
           SELECT count(*)::BIGINT AS n, sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22
           FROM d),
         cov AS (
           SELECT s1 / n AS m1, s2 / n AS m2,
             s11 / n - (s1 / n) * (s1 / n) AS a,
             s12 / n - (s1 / n) * (s2 / n) AS b,
             s22 / n - (s2 / n) * (s2 / n) AS c
           FROM s),
         eig AS (
           SELECT m1, m2, a, b,
             (a + c) / 2 + sqrt(((a - c) / 2) * ((a - c) / 2) + b * b) AS lam1
           FROM cov),
         pc AS (
           SELECT m1, m2,
             b / sqrt(b * b + (lam1 - a) * (lam1 - a)) AS u1,
             (lam1 - a) / sqrt(b * b + (lam1 - a) * (lam1 - a)) AS u2
           FROM eig)
         SELECT doc_id,
           floor((u1 * (x1 - m1) + u2 * (x2 - m2)) * 10000 + 0.5) / 10000 AS pc1,
           floor((-u2 * (x1 - m1) + u1 * (x2 - m2)) * 10000 + 0.5) / 10000 AS pc2
         FROM d CROSS JOIN pc""",
    "ml_standardize" ->
      """WITH d AS (
           SELECT doc_id, n_chars::DOUBLE / 512 AS x1,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE / 128 AS x2
           FROM documents),
         s AS (
           SELECT count(*)::BIGINT AS n, sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22
           FROM d),
         m AS (
           SELECT s1 / n AS m1, s2 / n AS m2,
             sqrt(s11 / n - (s1 / n) * (s1 / n)) AS sd1,
             sqrt(s22 / n - (s2 / n) * (s2 / n)) AS sd2
           FROM s)
         SELECT doc_id,
           floor(((x1 - m1) / sd1) * 10000 + 0.5) / 10000 AS z1,
           floor(((x2 - m2) / sd2) * 10000 + 0.5) / 10000 AS z2
         FROM d CROSS JOIN m""",
    "ml_feature_moments" ->
      """WITH d AS (
           SELECT n_chars::DOUBLE / 512 AS x1,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE / 128 AS x2
           FROM documents),
         s AS (
           SELECT count(*)::BIGINT AS n, sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22
           FROM d)
         SELECT n,
           floor((s1 / n) * 1000000 + 0.5) / 1000000 AS mean1,
           floor((s2 / n) * 1000000 + 0.5) / 1000000 AS mean2,
           floor((s11 / n - (s1 / n) * (s1 / n)) * 1000000 + 0.5) / 1000000 AS cov11,
           floor((s12 / n - (s1 / n) * (s2 / n)) * 1000000 + 0.5) / 1000000 AS cov12,
           floor((s22 / n - (s2 / n) * (s2 / n)) * 1000000 + 0.5) / 1000000 AS cov22
         FROM s""",
    "ml_logreg_cv" -> {
      def pExpr(w0: String, w1: String, w2: String) =
        s"floor((1/(1 + exp(-($w0*x0 + $w1*x1 + $w2*x2)))) * 1048576 + 0.5) / 1048576"
      def stepCtes(t: Int): String = {
        val prev = if (t == 1) "wt0" else s"wt${t - 1}"
        s"""g$t AS (
              SELECT mfold AS fold, sum((p - y) * x0) AS ga,
                sum((p - y) * x1) AS gb, sum((p - y) * x2) AS gc
              FROM (SELECT d.x0, d.x1, d.x2, d.y, w.fold AS mfold,
                      ${pExpr("w.wa", "w.wb", "w.wc")} AS p
                    FROM d JOIN $prev w ON w.fold <> d.fold) q
              GROUP BY mfold),
            wt$t AS (
              SELECT w.fold, w.wa - (g.ga / nc.nc) * 0.25 AS wa,
                w.wb - (g.gb / nc.nc) * 0.25 AS wb,
                w.wc - (g.gc / nc.nc) * 0.25 AS wc
              FROM $prev w JOIN g$t g ON w.fold = g.fold
              JOIN nc ON nc.fold = w.fold)"""
      }
      s"""WITH d AS (
            SELECT (doc_id % 4)::INT AS fold, 1.0 AS x0,
              n_chars::DOUBLE / 512 AS x1,
              len(string_split_regex(trim(text), '\\s+'))::DOUBLE / 128 AS x2,
              (CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END) AS y
            FROM documents),
          fs AS (SELECT fold, count(*)::BIGINT AS c FROM d GROUP BY fold),
          nt AS (SELECT count(*)::BIGINT AS n FROM d),
          nc AS (SELECT fold, n - c AS nc FROM fs CROSS JOIN nt),
          wt0 AS (SELECT * FROM (VALUES (0, 0.0, 0.0, 0.0), (1, 0.0, 0.0, 0.0),
            (2, 0.0, 0.0, 0.0), (3, 0.0, 0.0, 0.0)) AS t(fold, wa, wb, wc)),
          ${stepCtes(1)},
          ${stepCtes(2)},
          ${stepCtes(3)},
          acc AS (
            SELECT q.fold, count(*)::BIGINT AS n_val,
              sum(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)::BIGINT
                AS correct
            FROM (SELECT d.fold, d.y, ${pExpr("w.wa", "w.wb", "w.wc")} AS p
                  FROM d JOIN wt3 w ON w.fold = d.fold) q
            GROUP BY q.fold)
          SELECT w.fold, nt.n - a.n_val AS n_train, a.n_val,
            floor(w.wa * 1000000 + 0.5) / 1000000 AS w0,
            floor(w.wb * 1000000 + 0.5) / 1000000 AS w1,
            floor(w.wc * 1000000 + 0.5) / 1000000 AS w2,
            floor(a.correct::DOUBLE / a.n_val * 10000 + 0.5) / 10000
              AS val_accuracy
          FROM wt3 w JOIN acc a ON w.fold = a.fold CROSS JOIN nt"""
    },
    "ml_logreg_by_group" -> {
      def pExpr(w0: String, w1: String, w2: String) =
        s"floor((1/(1 + exp(-($w0*x0 + $w1*x1 + $w2*x2)))) * 1048576 + 0.5) / 1048576"
      def grads(src: String) =
        s"""SELECT lang, sum((p - y) * x0) AS ga, sum((p - y) * x1) AS gb,
              sum((p - y) * x2) AS gc FROM $src GROUP BY lang"""
      s"""WITH d AS (
            SELECT lang, 1.0 AS x0, n_chars::DOUBLE / 512 AS x1,
              len(string_split_regex(trim(text), '\\s+'))::DOUBLE / 128 AS x2,
              (CASE WHEN n_chars >= 250 THEN 1.0 ELSE 0.0 END) AS y
            FROM documents),
          nn AS (SELECT lang, count(*)::BIGINT AS n FROM d GROUP BY lang),
          p1 AS (SELECT d.*, ${pExpr("0.0", "0.0", "0.0")} AS p FROM d),
          gr1 AS (${grads("p1")}),
          wt1 AS (SELECT lang, 0.0 - (ga / n) * 0.25 AS wa,
                    0.0 - (gb / n) * 0.25 AS wb,
                    0.0 - (gc / n) * 0.25 AS wc
                  FROM gr1 JOIN nn USING (lang)),
          p2 AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d JOIN wt1 USING (lang)),
          gr2 AS (${grads("p2")}),
          wt2 AS (SELECT lang, wa - (ga / n) * 0.25 AS wa,
                    wb - (gb / n) * 0.25 AS wb,
                    wc - (gc / n) * 0.25 AS wc
                  FROM gr2 JOIN wt1 USING (lang) JOIN nn USING (lang)),
          p3 AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d JOIN wt2 USING (lang)),
          gr3 AS (${grads("p3")}),
          wt3 AS (SELECT lang, wa - (ga / n) * 0.25 AS wa,
                    wb - (gb / n) * 0.25 AS wb,
                    wc - (gc / n) * 0.25 AS wc
                  FROM gr3 JOIN wt2 USING (lang) JOIN nn USING (lang)),
          pf AS (SELECT d.*, ${pExpr("wa", "wb", "wc")} AS p
                 FROM d JOIN wt3 USING (lang)),
          acc AS (SELECT lang, count(*)::BIGINT AS n,
                    sum(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END)::BIGINT
                      AS correct
                  FROM pf GROUP BY lang)
          SELECT lang, n,
            floor(wa * 1000000 + 0.5) / 1000000 AS w0,
            floor(wb * 1000000 + 0.5) / 1000000 AS w1,
            floor(wc * 1000000 + 0.5) / 1000000 AS w2,
            floor(correct::DOUBLE / n * 10000 + 0.5) / 10000 AS accuracy
          FROM wt3 JOIN acc USING (lang)"""
    },
    "ml_negatives" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
         cands AS (
           SELECT a.vec_id AS anchor_id, a.label AS alabel,
             min(j) AS j,
             ('0x' || substring(md5(a.vec_id::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT
               % (SELECT n FROM n) AS cand_id
           FROM embeddings a CROSS JOIN unnest(generate_series(1, 12)) t(j)
           WHERE ('0x' || substring(md5(a.vec_id::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT
               % (SELECT n FROM n) <> a.vec_id
           GROUP BY a.vec_id, a.label,
             ('0x' || substring(md5(a.vec_id::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT
               % (SELECT n FROM n)),
         resolved AS (
           SELECT c.anchor_id, c.j, c.cand_id
           FROM cands c JOIN embeddings e ON c.cand_id = e.vec_id
           WHERE e.label <> c.alabel)
         SELECT anchor_id, rank, negative_id FROM (
           SELECT anchor_id, cand_id AS negative_id,
             row_number() OVER (PARTITION BY anchor_id ORDER BY j, cand_id) AS rank
           FROM resolved) t
         WHERE rank <= 4""",
    "ml_knn_predict" ->
      s"""WITH t AS (
            SELECT vec_id % 4 AS label, embedding FROM embeddings WHERE vec_id < $NTrain),
          q AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $NTrain),
          topk AS (
            SELECT vec_id, label FROM (
              SELECT q.vec_id, t.label,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY ${cosSql("q.embedding", "t.embedding")} DESC, t.label ASC) AS rn
              FROM q CROSS JOIN t)
            WHERE rn <= $K),
          votes AS (
            SELECT vec_id, label, count(*) AS n FROM topk GROUP BY vec_id, label)
          SELECT vec_id, label AS predicted_label FROM (
            SELECT vec_id, label,
              row_number() OVER (PARTITION BY vec_id ORDER BY n DESC, label ASC) AS vr
            FROM votes)
          WHERE vr = 1""",
    "ml_linear_score" ->
      s"""SELECT vec_id,
            floor((1.0 / (1.0 + exp(-(${dotSql("embedding", weightLit)} + $Bias)))) * 10000 + 0.5) / 10000 AS score
          FROM embeddings""",
    "ml_tree_score" ->
      s"""SELECT vec_id,
            floor((${ModelScoring.treeEnsembleSql("embedding", fixtureTrees, TreeBias)})
              * 10000 + 0.5) / 10000 AS score
          FROM embeddings""",
    "ml_calibration" ->
      s"""WITH s AS (
            SELECT (label >= 2)::INT AS pos,
              floor((1.0 / (1.0 + exp(-(${dotSql("embedding", weightLit)} + $Bias)))) * 10000 + 0.5) / 10000 AS score
            FROM embeddings)
          SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
            count(*)::BIGINT AS n,
            floor(avg(score) * 10000 + 0.5) / 10000 AS mean_score,
            floor(avg(pos::DOUBLE) * 10000 + 0.5) / 10000 AS pos_rate
          FROM s GROUP BY 1""",
    "ml_quality_filter" ->
      s"""WITH t AS (
            SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok
            FROM documents),
          f AS (
            SELECT doc_id,
              list_concat(tok,
                list_transform(generate_series(1, len(tok) - 1),
                  i -> tok[i] || '_' || tok[i + 1])) AS feats
            FROM t),
          s AS (
            SELECT doc_id,
              floor((1.0 / (1.0 + exp(-(
                list_sum(list_transform(feats, g ->
                  ((('0x' || substring(md5(g), 1, 15))::BIGINT % $QBuckets)
                    * 2654435761 % 1009)::DOUBLE / 1009.0 - 0.5))
                / len(feats) * $QScale + $QBias)))) * 10000 + 0.5) / 10000 AS score
            FROM f)
          SELECT doc_id, score, score >= 0.5 AS keep FROM s""")
}
