package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Batch ML model scoring (SURVEY §2.9): the reference applies two
  * trained models row-at-a-time — a sklearn KNN genome classifier
  * (lib/KBDatalakeApps/utils.py:147-161) and a CatBoost phenotype
  * predictor (berdl/berdl/prediction/phenotype.py:20-32). Both
  * surfaces re-expressed as broadcast-model batch operators:
  *
  *  - `knnPredict`: the training set (model "parameters" of a KNN) is
  *    a small DataFrame, broadcast; prediction is one broadcast join +
  *    per-row top-k window + majority vote. Nothing about the 100 TB
  *    scoring side ever shuffles on a model key — the only wide op is
  *    the per-query window, partitioned by the scored row's own id.
  *  - `linearScore`: a parametric model (weights, bias) inlined as a
  *    literal array — the plan is pure codegen (dot product + sigmoid),
  *    no UDF, no per-row Python. A gradient-boosted model would ship
  *    its trees the same way (broadcast handle + mapPartitions, see
  *    Multimodal.extractFeatures for that shape); the linear stub keeps
  *    the oracle able to reproduce scores exactly.
  */
object ModelScoring {

  /** k-NN classification of `data` against a broadcast labeled
    * training set: cosine similarity, top-k neighbors, majority vote
    * (ties → smallest label, matching sklearn's deterministic
    * tie-break by training order when labels sort that way). */
  def knnPredict(data: DataFrame, train: DataFrame, idCol: String,
                 vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = data.select(col(idCol), col(vecCol).as("__qv"))
      .withColumn("__qn", VectorOps.norm(col("__qv")))
    val t = train.select(col(vecCol).as("__tv"), col(labelCol).as("__label"))
      .withColumn("__tn", VectorOps.norm(col("__tv")))
    val scored = q.join(broadcast(t))
      .withColumn("__cos",
        VectorOps.dot(col("__qv"), col("__tv")) / (col("__qn") * col("__tn")))
    val wTop = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("__label").asc)
    val topK = scored.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= k)
    val votes = topK.groupBy(col(idCol), col("__label"))
      .agg(count(lit(1)).as("__votes"))
    val wVote = Window.partitionBy(col(idCol))
      .orderBy(col("__votes").desc, col("__label").asc)
    votes.withColumn("__vr", row_number().over(wVote))
      .filter(col("__vr") === 1)
      .select(col(idCol), col("__label").as("predicted_label"))
  }

  /** Logistic-linear scoring with literal weights: sigmoid(w·x + b).
    * The whole scorer lives inside whole-stage codegen. */
  def linearScore(vec: Column, weights: Seq[Double], bias: Double): Column = {
    val w = array(weights.map(lit): _*)
    val z = VectorOps.dot(vec, w) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Literal decision tree: feature index (0-based into the vector),
    * threshold, subtrees. A trained GBT/CatBoost model exports to
    * exactly this shape; here fixture trees stand in so the oracle can
    * mirror the ensemble as nested CASE WHEN. */
  sealed trait Tree
  final case class Leaf(w: Double) extends Tree
  final case class Split(feature: Int, threshold: Double,
                         lo: Tree, hi: Tree) extends Tree

  private def treeExpr(vec: Column, t: Tree): Column = t match {
    case Leaf(w) => lit(w)
    case Split(f, thr, lo, hi) =>
      when(element_at(vec, f + 1) <= thr, treeExpr(vec, lo))
        .otherwise(treeExpr(vec, hi))
  }

  /** Tree-ensemble (GBT-style) scoring with literal trees: the model
    * compiles to nested CASE WHEN — whole-stage codegen, no UDF, no
    * broadcast needed (the ensemble IS the plan). sigmoid(bias + Σ
    * tree(vec)) — the additive-margin form CatBoost/LightGBM use for
    * binary classification. */
  def treeEnsembleScore(vec: Column, trees: Seq[Tree], bias: Double): Column = {
    val margin = trees.map(t => treeExpr(vec, t))
      .foldLeft(lit(bias))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** The same ensemble as oracle SQL over a DuckDB list column (1-based
    * indexing mirrors element_at). */
  def treeEnsembleSql(vecSql: String, trees: Seq[Tree], bias: Double): String = {
    // every literal carries ::DOUBLE — DuckDB otherwise parses numeric
    // literals as DECIMAL and the arithmetic diverges from Spark's
    def one(t: Tree): String = t match {
      case Leaf(w) => s"($w)::DOUBLE"
      case Split(f, thr, lo, hi) =>
        s"(CASE WHEN $vecSql[${f + 1}]::DOUBLE <= ($thr)::DOUBLE " +
          s"THEN ${one(lo)} ELSE ${one(hi)} END)"
    }
    val margin = trees.map(one).mkString(s"(($bias)::DOUBLE + ", " + ", ")")
    s"(1.0 / (1.0 + exp(-$margin)))"
  }

  /** fastText-style hashed-feature text classifier: word uni+bigrams →
    * md5 bucket in [0, buckets) → per-bucket weight → mean pool →
    * logistic output. The bucket weights here are a deterministic hash
    * of the bucket id (a stand-in for a trained embedding matrix — the
    * plumbing is identical: a learned model would inline its weight
    * array the same way `linearScore` does, or broadcast it).
    *
    * Scale shape: the whole scorer is array HOFs over the row's own
    * token list — no explode, no join, no shuffle. A 100 TB corpus
    * scores entirely map-side in a single pass over the scan.
    */
  def hashedTextScore(text: Column, buckets: Int = 1 << 20,
                      scale: Double = 8.0, bias: Double = 0.0): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    // zip_with, NOT transform-with-slice: a lambda that captures `toks`
    // re-evaluates the whole tokenization per ELEMENT (HOF lambdas see
    // no subexpression elimination), turning the scorer quadratic in
    // practice. zip_with's arguments evaluate once per row; the tail
    // mismatch pads with null, which filter() drops — so a doc yields
    // exactly len-1 bigrams (none for a one-token doc).
    val bigrams = zip_with(toks,
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit("_"), b))
    val feats = filter(concat(toks, bigrams), f => f.isNotNull)
    def weight(f: Column): Column = {
      val b = conv(substring(md5(f), 1, 15), 16, 10).cast("long") % buckets
      (b * lit(2654435761L) % 1009L).cast("double") / lit(1009.0) - lit(0.5)
    }
    // one pass: (sum, count) accumulator, so `feats` is built once
    // instead of once for the sum and once for size()
    val mean = aggregate(feats,
      struct(lit(0.0).as("s"), lit(0).as("c")),
      (acc, f) => struct((acc.getField("s") + weight(f)).as("s"),
        (acc.getField("c") + 1).as("c")),
      acc => acc.getField("s") / acc.getField("c"))
    lit(1.0) / (lit(1.0) + exp(-(mean * scale + bias)))
  }

  /** Distributed full-batch logistic-regression TRAINING as iterated
    * aggregations — the quality-classifier fit that usually gets
    * shipped off to a single-node sklearn job, expressed so the corpus
    * never leaves the cluster: each GD step is ONE partial-agg pass
    * computing the k gradient sums; the driver holds only the k
    * weights (collect of 1 row per iteration, like the BPE argmax
    * loop).
    *
    * Cross-engine-exact by construction: predictions round to 2⁻²⁰
    * (binary rounding — representable exactly), so with features that
    * are small dyadic rationals every gradient TERM is an exact
    * double and the sums are order-independent — Spark's partial aggs
    * and a sequential engine produce bit-identical gradients. The
    * learning step divides by n then scales by a power of two, both
    * single deterministic ops. Only `exp` is libm-dependent; the 2⁻²⁰
    * rounding absorbs its ulp variation.
    *
    * `features` must be dyadic-rational columns (integer / power of
    * two), ≲ 20 significant bits each; returns the trained weights. */
  def logregTrainGD(base: DataFrame, k: Int, iters: Int,
                    lrNum: Double = 0.25): Seq[Double] = {
    val n = base.count()
    var w = Seq.fill(k)(0.0)
    for (_ <- 0 until iters) {
      val z = w.zipWithIndex.map { case (wi, i) => lit(wi) * col(s"x$i") }
        .reduce(_ + _)
      val p = roundP(lit(1.0) / (lit(1.0) + exp(-z)))
      val gradCols = (0 until k).map(i =>
        sum((p - col("y")) * col(s"x$i")).as(s"g$i"))
      val g = base.agg(gradCols.head, gradCols.tail: _*).head()
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - (g.getDouble(i) / n) * lrNum
      }
    }
    w
  }

  /** Binary 2⁻²⁰ rounding: exactly representable, engine-portable. */
  def roundP(p: Column): Column =
    floor(p * (1 << 20) + 0.5) / (1 << 20)

  /** GROUPED logistic-regression training — one independent model per
    * `groupCol` value (the per-domain/per-language quality-classifier
    * fleet), all fitted simultaneously: each GD step is STILL one
    * aggregation pass, now keyed by the group, so fitting G models
    * costs the same scans as fitting one. Driver state is G×k weights
    * (bounded by group count — the centroid-collect pattern); the
    * per-step weight table re-enters as a broadcast join. Same exact
    * dyadic-rational arithmetic as [[logregTrainGD]] — every group's
    * weights are order-independent and bit-reproducible.
    *
    * `base` needs columns x0..x{k−1}, y, and a string `groupCol`.
    * Returns (groupCol, w0..w{k−1}). */
  def logregTrainGDGrouped(base: DataFrame, groupCol: String, k: Int,
                           iters: Int, lrNum: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val spark = base.sparkSession
    val counts = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var w: Map[String, Array[Double]] =
      counts.keys.map(_ -> Array.fill(k)(0.0)).toMap
    val schema = StructType(StructField(groupCol, StringType) +:
      (0 until k).map(i => StructField(s"__w$i", DoubleType)))
    def wFrame: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(
        w.toSeq.sortBy(_._1).map { case (g, ws) => Row.fromSeq(g +: ws.toSeq) }, 1),
      schema)
    for (_ <- 0 until iters) {
      val joined = base.join(broadcast(wFrame), Seq(groupCol))
      val z = (0 until k).map(i => col(s"__w$i") * col(s"x$i")).reduce(_ + _)
      val p = roundP(lit(1.0) / (lit(1.0) + exp(-z)))
      val gradCols = (0 until k).map(i =>
        sum((p - col("y")) * col(s"x$i")).as(s"g$i"))
      val g = joined.groupBy(col(groupCol)).agg(gradCols.head, gradCols.tail: _*)
        .collect()
      w = g.map { r =>
        val grp = r.getString(0)
        val n = counts(grp)
        grp -> w(grp).zipWithIndex.map { case (wi, i) =>
          wi - (r.getDouble(i + 1) / n) * lrNum
        }
      }.toMap
    }
    wFrame.toDF((groupCol +: (0 until k).map(i => s"w$i")): _*)
  }

  /** The sigmoid prediction for a trained `logregTrainGD` weight
    * vector, with the same rounding the training loop used. */
  def logregPredict(w: Seq[Double]): Column =
    roundP(lit(1.0) / (lit(1.0) +
      exp(-w.zipWithIndex.map { case (wi, i) => lit(wi) * col(s"x$i") }
        .reduce(_ + _))))

  /** K-fold CROSS-VALIDATED logistic training — all k leave-one-fold-
    * out models fitted simultaneously: each GD step joins the corpus
    * to the k-row weight table on `fold ≠ model` (a row contributes a
    * gradient term to every model whose validation fold it is NOT in)
    * and reduces per model — ONE aggregation pass trains all k models,
    * so model selection costs the same scans as a single fit. The
    * readout scores each model on ITS OWN held-out fold. Same exact
    * dyadic arithmetic as [[logregTrainGD]]: per-model sums are
    * order-independent, weights bit-reproducible.
    *
    * `base` needs x0..x{d−1}, y, and an integer fold column in
    * [0, k). Returns (fold, w0..w{d−1}, n_val, val_accuracy, n_train). */
  def logregTrainCV(base: DataFrame, foldCol: String, k: Int, d: Int,
                    iters: Int, lrNum: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    val spark = base.sparkSession
    val foldSizes = base.groupBy(col(foldCol)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nTot = foldSizes.values.sum
    var w: Map[Int, Array[Double]] =
      (0 until k).map(_ -> Array.fill(d)(0.0)).toMap
    val schema = StructType(StructField("__fold", IntegerType) +:
      (0 until d).map(i => StructField(s"__w$i", DoubleType)))
    def wFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(
        w.toSeq.sortBy(_._1).map { case (f, ws) => Row.fromSeq(f +: ws.toSeq) }, 1),
      schema)
    val z = (0 until d).map(i => col(s"__w$i") * col(s"x$i")).reduce(_ + _)
    val p = roundP(lit(1.0) / (lit(1.0) + exp(-z)))
    for (_ <- 0 until iters) {
      val joined = base.join(broadcast(wFrame),
        col(foldCol) =!= col("__fold"))
      val gradCols = (0 until d).map(i =>
        sum((p - col("y")) * col(s"x$i")).as(s"g$i"))
      val g = joined.groupBy(col("__fold")).agg(gradCols.head, gradCols.tail: _*)
        .collect()
      w = g.map { r =>
        val f = r.getInt(0)
        val nc = nTot - foldSizes.getOrElse(f, 0L) // complement size
        f -> w(f).zipWithIndex.map { case (wi, i) =>
          wi - (r.getDouble(i + 1) / nc) * lrNum
        }
      }.toMap
    }
    // score each model on its OWN held-out fold
    base.join(broadcast(wFrame), col(foldCol) === col("__fold"))
      .groupBy(col("__fold"))
      .agg(count(lit(1)).as("n_val"),
        sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L))
          .as("__correct"))
      .join(broadcast(wFrame), Seq("__fold"))
      .select(col("__fold").as("fold") +:
        lit(nTot).as("__ntot") +:
        (0 until d).map(i =>
          (floor(col(s"__w$i") * 1000000 + lit(0.5)) / 1000000).as(s"w$i")) :+
        col("n_val") :+
        (floor(col("__correct").cast("double") / col("n_val") * 10000
          + lit(0.5)) / 10000).as("val_accuracy"): _*)
      .withColumn("n_train", col("__ntot") - col("n_val"))
      .drop("__ntot")
  }
}
