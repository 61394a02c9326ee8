package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{ArrayNumeric, CentroidBook}
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Paths, exact → approximate:
  *  - `bruteForceTopK`: exact cosine top-k via a blocked cross join —
  *    the correctness baseline. O(|queries|·|corpus|); fine when the
  *    query side is small or broadcastable.
  *  - `lshTopK`: random-hyperplane LSH bucketing — queries only compare
  *    against same-bucket corpus vectors; bucket count grows 2^planes,
  *    recall tunable with multi-probe.
  *  - `ivfTopK`: inverted-file cells from a coarse quantizer; search
  *    within the assigned cell.
  *  - `cosineNearDupPairs` / `lshCosineNearDupPairs`: the semantic-dedup
  *    pair primitives (exact, and LSH-candidates + exact-verify).
  *
  * Hyperplanes are deterministic (seeded) literal arrays, so plans are
  * reproducible run-to-run and in the differential oracle.
  */
object Similarity {

  /** Round-robin a one-file scan across the shuffle parallelism so the
    * pairwise probe work (the O(n*m) part) doesn't serialize into one
    * task — gated on the scan's actual partition count like
    * [[Dedup.spread]] (an already-parallel production scan must not
    * pay a full-corpus exchange). */
  private def spread(df: DataFrame): DataFrame = Dedup.spread(df)

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** EXACT-FOR-VALIDATION — exact top-k neighbors for each query id
    * via a blocked cross join: O(|queries|·|corpus|), a scale-killer
    * when the query side is large. Use it as the recall oracle for the
    * production paths (`lshTopK` / `lshTopKMultiProbe` / `ivfTopK`) on
    * a sampled query set, never as the default ANN. Both sides must
    * expose (idCol, vecCol). Ranks are total-ordered (cosine desc,
    * id asc). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // Norms are computed once per row BEFORE the pair join, so the
    // per-pair work is a single codegen dot product. The quotient is
    // the same double arithmetic as cosine(qv, cv) — norm per side is
    // an identical sqrt(dot(v,v)) — so values are bit-stable vs the
    // unfactored form.
    val q = spread(queries).select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** LSH-bucketed ANN: compare only within hyperplane-sign buckets.
    * Returns the same (query_id, rank, neighbor_id) shape; rank is
    * within-bucket. Recall < 1 by construction — pair with
    * `bruteForceTopK` on a sample to measure. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
      .withColumn("vn", VectorOps.norm(col("v")))
    val a = bucketed.select(col("bucket"), col(idCol).as("query_id"),
      col("v").as("qv"), col("vn").as("qn"))
    val b = bucketed.select(col("bucket"), col(idCol).as("neighbor_id"),
      col("v").as("cv"), col("vn").as("cn"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Hard-negative mining for contrastive/embedding training: for
    * each anchor, the top-`k` most-cosine-similar vectors carrying a
    * DIFFERENT label, drawn from the anchor's LSH bucket — the
    * "semantically close but wrong" examples that make a contrastive
    * batch informative (in-batch random negatives are mostly easy).
    * Same scale shape as [[lshTopK]]: candidates never leave the
    * hyperplane bucket, labels ride the bucketed frame so the
    * different-label filter applies before the ranking window. */
  def hardNegativesLsh(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, k: Int,
                       planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = spread(df).select(col(idCol), col(vecCol).as("v"),
      col(labelCol).as("lbl"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
      .withColumn("vn", VectorOps.norm(col("v")))
    val a = bucketed.select(col("bucket"), col(idCol).as("anchor_id"),
      col("v").as("qv"), col("vn").as("qn"), col("lbl").as("albl"))
    val b = bucketed.select(col("bucket"), col(idCol).as("negative_id"),
      col("v").as("cv"), col("vn").as("cn"), col("lbl").as("nlbl"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("anchor_id") =!= col("negative_id") &&
        col("albl") =!= col("nlbl"))
      .withColumn("cosine",
        VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("negative_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("negative_id"), col("cosine"))
  }

  /** Multi-probe LSH ANN: each query also probes the Hamming-1
    * neighbors of its own hyperplane bucket — the recall knob of
    * `lshTopK` (a near neighbor split across a single plane's boundary
    * is recovered from the adjacent bucket). Query side replicated
    * (planes+1)×; corpus side untouched, so the shuffle grows linearly
    * with probe count, not data. */
  /** The bucket itself plus its `nPlanes` Hamming-1 variants — the
    * multi-probe candidate set of a hyperplane bucket key. */
  private def probeVariants(nPlanes: Int): Column = {
    def flip(i: Int) = concat(
      substring(col("bucket"), 1, i - 1),
      when(substring(col("bucket"), i, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(col("bucket"), i + 1, nPlanes - i))
    array(col("bucket") +: (1 to nPlanes).map(flip): _*)
  }

  def lshTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String, k: Int,
                        planes: Seq[Seq[Double]]): DataFrame = {
    val nPlanes = planes.size
    val bucketed = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds probe and corpus sides of the join
    val a = bucketed.select(col(idCol).as("query_id"), col("v").as("qv"),
      col("vn").as("qn"), explode(probeVariants(nPlanes)).as("bucket"))
    val b = bucketed.select(col("bucket"), col(idCol).as("neighbor_id"),
      col("v").as("cv"), col("vn").as("cn"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** One broadcast per fitted codebook, shared by every expression of
    * the plan: the centroid matrix moves once per executor instead of
    * riding in each task binary (the r5 literal/field form hit
    * "Broadcasting large task binary" warnings at 8 cells already and
    * is O(k·dim) per task at a production 256–4096-cell quantizer). */
  private def bcBook(df: DataFrame,
                     centroids: Seq[(Long, Seq[Double])]): Broadcast[CentroidBook] =
    df.sparkSession.sparkContext.broadcast(CentroidBook(centroids))

  /** Cosine-argmax cell assignment against a BROADCAST codebook — a
    * pure codegen projection, no join, no window, no shuffle; on a
    * cosine tie the LOWEST cell id wins. Runs as ONE compact JIT-hot
    * loop ([[ArrayNumeric.nearestCentroid]]): constant codegen size and
    * constant task-binary size regardless of k·dim. */
  private def assignCell(v: Column, bc: Broadcast[CentroidBook]): Column =
    ArrayNumeric.nearestCentroid(v, bc, l2 = false)

  /** Nearest centroid by EUCLIDEAN distance: argmin |v−c|² = argmax
    * dot(v,c) − |c|²/2. Residual PQ must assign in L2 — residuals are
    * centered at 0, so a cosine (direction-only) assignment throws the
    * magnitude away and quantization collapses. */
  private def assignCellL2(v: Column, bc: Broadcast[CentroidBook]): Column =
    ArrayNumeric.nearestCentroid(v, bc, l2 = true)

  /** Deterministic k-means fit returning the centroids as plain data:
    * seeded with the first `k` corpus vectors (id < k), then `iters`
    * rounds of cosine-argmax assignment + element-wise mean update.
    * Centroids are O(k·dim) — they always fit on the driver, so each
    * round collects them and inlines the next assignment as a literal
    * codegen projection. Each round is ONE narrow pass + one
    * partial-agg groupBy with `dim` per-position `avg` columns — no
    * row explosion, no second shuffle, no join. Means are rounded to
    * 1e-6 per round so the fit is bit-reproducible across engines
    * (the differential oracle unrolls the same rounds in SQL).
    *
    * `trainSampleMod > 1` fits the quantizer on the deterministic
    * sample `id % trainSampleMod == 0` — the 100 TB shape: a coarse
    * quantizer needs a corpus-shaped sample, not the corpus; the
    * full-data work stays in the assignment projection. */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int = 2, trainSampleMod: Int = 1): Seq[(Long, Seq[Double])] = {
    val sampled =
      if (trainSampleMod > 1) df.filter(col(idCol) % trainSampleMod === 0) else df
    val base = spread(sampled).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // reused every round: don't re-scan per iteration
    kmeansFitOnBase(base, df, idCol, vecCol, k, iters)
  }

  /** [[kmeansFit]] over an ALREADY-materialized (idCol, v, vn) base —
    * lets a caller that needs the same projection for the search itself
    * (ivfTopK and friends) materialize ONCE instead of paying a second
    * localCheckpoint job for the training slice; a narrow filter over
    * the shared checkpoint replaces it. Identical arithmetic, identical
    * centroids. */
  private def kmeansFitOnBase(base: DataFrame, df: DataFrame, idCol: String,
                              vecCol: String, k: Int,
                              iters: Int): Seq[(Long, Seq[Double])] = {
    var centroids: Seq[(Long, Seq[Double])] = df.filter(col(idCol) < k)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    require(centroids.nonEmpty,
      s"kmeansFit: no seed vectors with $idCol < $k — seed ids must start at 0")
    val dim = centroids.headOption.map(_._2.size).getOrElse(0)
    val meanCols = (0 until dim).map(i =>
      (floor(avg(col("v").getItem(i).cast("double")) * 1e6 + lit(0.5)) / 1e6).as(s"m$i"))
    for (_ <- 0 until iters) {
      centroids = base
        .select(assignCell(col("v"), bcBook(df, centroids)).as("cell"), col("v"))
        .groupBy(col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect().map(r => (r.getLong(0), (1 to dim).map(r.getDouble).toSeq))
        .sortBy(_._1).toSeq
    }
    centroids
  }

  /** Top-`nprobe` cells by (cosine desc, cell asc) as an array —
    * the multi-probe variant of [[assignCell]], one broadcast-codebook
    * selection loop ([[ArrayNumeric.nearestCells]]) with the exact
    * ordering of the `sort_array(struct(sim, -cell), desc)` form it
    * replaces. */
  private def assignCells(v: Column, bc: Broadcast[CentroidBook],
                          nprobe: Int): Column =
    ArrayNumeric.nearestCells(v, bc, nprobe)

  /** Multi-probe IVF ANN: the corpus is inverted by nearest cell as in
    * `ivfTopK`, but each QUERY searches its `nprobe` nearest cells —
    * the standard IVF recall knob. Only the query side replicates
    * (`nprobe`×); the corpus index is untouched, so the join grows
    * linearly with probe count, never with corpus size. Oracle-gated
    * at the headline ≥0.8-recall budget (`ann_ivf_multiprobe`,
    * 16 cells / nprobe=8 — the row_number spelling of
    * NearestCellsTopN's probe-order tie-break); recall-vs-brute-force
    * is asserted in RecallSpec. */
  def ivfTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String, k: Int,
                        nCentroids: Int, nprobe: Int,
                        kmeansIters: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    // one materialization for training slice + probe + corpus sides
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds probe and corpus sides
    val train =
      if (trainSampleMod > 1) base.filter(col(idCol) % trainSampleMod === 0) else base
    val centroids = kmeansFitOnBase(train, df, idCol, vecCol, nCentroids, kmeansIters)
    val bc = bcBook(df, centroids)
    val corpus = base
      .withColumn("cell", assignCell(col("v"), bc))
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col("v").as("cv2"), col("vn").as("cn2"))
    val queries = base
      .withColumn("cell",
        explode(assignCells(col("v"), bc, nprobe)))
      .select(col("cell"), col(idCol).as("query_id"),
        col("v").as("qv"), col("vn").as("qn"))
    val pairs = queries.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Product-quantization codebooks: an independent deterministic
    * k-means fit ([[kmeansFit]]) per contiguous `subDim`-wide subspace.
    * Returns one (cell, centroid) list per subspace — O(m·ksub·subDim)
    * doubles, always driver-small. At 100 TB the codebooks compress a
    * 64-dim float vector to `m` small ints (16× smaller index), and the
    * fit runs on the same 1-in-N hash sample as the IVF quantizer. */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, m: Int, subDim: Int,
            ksub: Int, iters: Int = 2, trainSampleMod: Int = 1,
            l2Assign: Boolean = false): Seq[Seq[(Long, Seq[Double])]] = {
    // All m subspaces train in the SAME pass: explode each sampled row
    // into (j, subvector), branch the literal-codebook assignment on j,
    // then ONE groupBy(j, cell) with subDim mean columns and one
    // driver collect per round — m-independent job count (the naive
    // per-subspace loop costs m x (checkpoint + iters collects)).
    val sampled =
      if (trainSampleMod > 1) df.filter(col(idCol) % trainSampleMod === 0) else df
    val subCols = (0 until m).map(j => struct(lit(j).as("j"),
      slice(col(vecCol), j * subDim + 1, subDim).as("sub")))
    val base = spread(sampled)
      .select(col(idCol), explode_outer(array(subCols: _*)).as("s"))
      .select(col("s.j").as("j"), col("s.sub").as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // reused every round
    // seeds: the first ksub corpus vectors, sliced per subspace
    val seedRows = df.filter(col(idCol) < ksub)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    require(seedRows.nonEmpty,
      s"pqFit: no seed vectors with $idCol < $ksub — seed ids must start at 0")
    var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map(j =>
      seedRows.map { case (id, v) => (id, v.slice(j * subDim, (j + 1) * subDim).toSeq) })
    val meanCols = (0 until subDim).map(i =>
      (floor(avg(col("v").getItem(i).cast("double")) * 1e6 + lit(0.5)) / 1e6).as(s"m$i"))
    for (_ <- 0 until iters) {
      val cellExpr = books.zipWithIndex.foldRight(lit(null).cast("long")) {
        case ((cents, j), acc) =>
          val bcj = bcBook(df, cents)
          when(col("j") === j,
            if (l2Assign) assignCellL2(col("v"), bcj)
            else assignCell(col("v"), bcj)).otherwise(acc)
      }
      val rows = base.select(col("j"), cellExpr.as("cell"), col("v"))
        .groupBy(col("j"), col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
      books = (0 until m).map(j =>
        rows.filter(_.getInt(0) == j)
          .map(r => (r.getLong(1), (2 until 2 + subDim).map(r.getDouble).toSeq))
          .sortBy(_._1).toSeq)
    }
    books
  }

  /** PQ encoding: each vector becomes `m` codes `c0..c{m-1}` — the
    * nearest (cosine, min-cell tiebreak) codebook centroid per
    * subspace. A pure literal-codebook codegen projection: no join, no
    * shuffle, nothing but the scan. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: Seq[Seq[(Long, Seq[Double])]], subDim: Int): DataFrame = {
    val codeCols = codebooks.zipWithIndex.map { case (cents, j) =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      assignCell(sub, bcBook(df, cents)).as(s"c$j")
    }
    df.select(col(idCol) +: codeCols: _*)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query keeps its
    * exact vector; every corpus vector is approximated by its `m`
    * codebook centroids. Per (query, code) the cosine numerator is `m`
    * map lookups of precomputed sub-dot tables instead of a `dim`-wide
    * dot product, and the corpus norm comes from the codebook norms —
    * the classical PQ trade: ~subDim× less pair math and a 16× smaller
    * index, at approximation-bounded recall (RecallSpec measures it;
    * not oracle-gated). The pair space is still |q|·|corpus| — at scale
    * compose with the IVF cells (IVF-PQ) so ADC only runs within the
    * probed cells. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, codebooks: Seq[Seq[(Long, Seq[Double])]],
             subDim: Int): DataFrame = {
    val codes = pqEncode(corpus, idCol, vecCol, codebooks, subDim)
      .withColumnRenamed(idCol, "neighbor_id")
    // |x̂|² = Σ_j |c_{x_j}|² — driver-computed constants as TWO literal
    // array objects per codebook (typedlit), not 2·ksub literal
    // expressions: plan size stays O(1) in expression count.
    val normSqMaps = codebooks.map { cents =>
      map_from_arrays(typedlit(cents.map(_._1)),
        typedlit(cents.map(_._2.map(x => x * x).sum)))
    }
    // per-query lookup tables: dot(q_j, centroid) for every codebook
    // entry — one broadcast-codebook table expression per subspace, no
    // inlined centroid literals.
    val bcs = codebooks.map(cents => bcBook(queries, cents))
    val q = spread(queries).select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val qWithTables = codebooks.indices.foldLeft(q) { case (acc, j) =>
      val sub = slice(col("qv"), j * subDim + 1, subDim)
      acc.withColumn(s"qd$j", ArrayNumeric.centroidDotMap(sub, bcs(j)))
    }
    val approxDot = codebooks.indices
      .map(j => element_at(col(s"qd$j"), col(s"c$j")))
      .reduce(_ + _)
    val approxNorm = sqrt(codebooks.indices
      .map(j => element_at(normSqMaps(j), col(s"c$j")))
      .reduce(_ + _))
    val scored = qWithTables.join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", approxDot / (col("qn") * approxNorm))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF-PQ: the standard billion-scale ANN layout — the IVF coarse
    * quantizer bounds the candidate set (each query probes its `nprobe`
    * nearest cells), and within a cell the pair math is PQ/ADC lookups
    * instead of full-width dot products. The index is (cell, m codes)
    * per vector: ~16 bytes instead of 256. Recall is measured in
    * RecallSpec (two approximations compose); not oracle-gated. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                nCentroids: Int, nprobe: Int, m: Int, subDim: Int, ksub: Int,
                kmeansIters: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    val (pairs, _) = ivfPqScored(df, idCol, vecCol, nCentroids, nprobe,
      m, subDim, ksub, kmeansIters, trainSampleMod)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF-PQ with an exact re-ranking stage: ADC keeps a `shortlist`-deep
    * candidate list per query (cheap lookup math over the compressed
    * index), then ONLY those candidates fetch their full-width vectors
    * for an exact cosine top-k. This is the standard two-stage retrieval
    * answer to ADC's quantization noise — recall approaches the IVF
    * candidate-set ceiling while the exact math touches `shortlist` rows
    * per query, not the cell. The vector fetch is a shuffle join keyed
    * on neighbor_id, sized |queries|·shortlist — negligible against the
    * corpus at scale. */
  def ivfPqRerankTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      nCentroids: Int, nprobe: Int, m: Int, subDim: Int,
                      ksub: Int, shortlist: Int, kmeansIters: Int = 2,
                      trainSampleMod: Int = 1): DataFrame = {
    val (pairs, base) = ivfPqScored(df, idCol, vecCol, nCentroids, nprobe,
      m, subDim, ksub, kmeansIters, trainSampleMod)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val short = pairs.withColumn("rank", row_number().over(wAdc))
      .filter(col("rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"))
    val nbr = base.select(col(idCol).as("neighbor_id"),
      col("v").as("nv"), col("vn").as("nn"))
    val exact = short.join(nbr, Seq("neighbor_id"))
      .withColumn("cosine",
        VectorOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Shared IVF-PQ candidate scorer: (ADC-scored pairs carrying the
    * query vector, corpus base with exact vectors). */
  private def ivfPqScored(df: DataFrame, idCol: String, vecCol: String,
                          nCentroids: Int, nprobe: Int, m: Int, subDim: Int,
                          ksub: Int, kmeansIters: Int,
                          trainSampleMod: Int): (DataFrame, DataFrame) = {
    val centroids = kmeansFit(df, idCol, vecCol, nCentroids, kmeansIters, trainSampleMod)
    val books = pqFit(df, idCol, vecCol, m, subDim, ksub, kmeansIters, trainSampleMod)
    val bcCent = bcBook(df, centroids)
    val bcBooks = books.map(cents => bcBook(df, cents))
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds the corpus index and the query side
    // corpus index: coarse cell + PQ codes, nothing else
    val codeCols = books.indices.map { j =>
      val sub = slice(col("v"), j * subDim + 1, subDim)
      assignCell(sub, bcBooks(j)).as(s"c$j")
    }
    val corpus = base
      .withColumn("cell", assignCell(col("v"), bcCent))
      .select(col("cell") +: col(idCol).as("neighbor_id") +: codeCols: _*)
    // queries: nprobe cells + per-codebook sub-dot lookup tables
    val nsqMaps = books.map(cents => map_from_arrays(
      typedlit(cents.map(_._1)),
      typedlit(cents.map(_._2.map(x => x * x).sum))))
    val queries0 = base
      .withColumn("cell",
        explode(assignCells(col("v"), bcCent, nprobe)))
      .select(col("cell"), col(idCol).as("query_id"), col("v").as("qv"),
        col("vn").as("qn"))
    val queries = books.indices.foldLeft(queries0) { case (acc, j) =>
      val sub = slice(col("qv"), j * subDim + 1, subDim)
      acc.withColumn(s"qd$j", ArrayNumeric.centroidDotMap(sub, bcBooks(j)))
    }
    val approxDot = books.indices
      .map(j => element_at(col(s"qd$j"), col(s"c$j"))).reduce(_ + _)
    val approxNorm = sqrt(books.indices
      .map(j => element_at(nsqMaps(j), col(s"c$j"))).reduce(_ + _))
    val pairs = queries.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", approxDot / (col("qn") * approxNorm))
    (pairs, base)
  }

  /** Residual-encoded IVF-PQ (the classical IVFADC layout): the PQ
    * codebooks are trained on r = v − centroid(cell) instead of v. The
    * residual has a fraction of the raw vector's variance, so the same
    * code budget quantizes far finer — recall rises with no change to
    * index size or probe cost. Reconstruction is x̂ = c + r̂, and the
    * ADC math stays lookup-shaped:
    *   dot(q, x̂)  = dot(q, c) + Σⱼ qdⱼ[codeⱼ]
    *   |x̂|²       = |c|² + 2·Σⱼ cross[cell, codeⱼ] + Σⱼ nsqⱼ[codeⱼ]
    * where qd (per query), cross and nsq (pure literals:
    * cells × ksub entries) are precomputed tables. Recall measured in
    * RecallSpec vs the raw-vector ivfPqTopK. */
  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
                        nCentroids: Int, nprobe: Int, m: Int, subDim: Int,
                        ksub: Int, kmeansIters: Int = 2,
                        trainSampleMod: Int = 1): DataFrame = {
    val centroids = kmeansFit(df, idCol, vecCol, nCentroids, kmeansIters, trainSampleMod)
    val bcCent = bcBook(df, centroids)
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .withColumn("cell", assignCell(col("v"), bcCent))
      .withColumn("r", zip_with(col("v"),
        ArrayNumeric.centroidVector(col("cell"), bcCent), (a, b) => a - b))
      .localCheckpoint() // feeds PQ training, the index, and the queries
    val books = pqFit(base.select(col(idCol), col("r")), idCol, "r",
      m, subDim, ksub, kmeansIters, trainSampleMod, l2Assign = true)
    val bcBooks = books.map(cents => bcBook(df, cents))
    // corpus index: (cell, m residual codes) — L2 code assignment, as
    // in training
    val codeCols = books.indices.map { j =>
      val sub = slice(col("r"), j * subDim + 1, subDim)
      assignCellL2(sub, bcBooks(j)).as(s"c$j")
    }
    val corpus = base
      .select(col("cell") +: col(idCol).as("neighbor_id") +: codeCols: _*)
    // literal tables (cell and code labels are both < their k by
    // construction — seeds are the first-k corpus ids — so the cross
    // table keys as cell*ksub+code without collision)
    val nsqMaps = books.map(cents => map_from_arrays(
      typedlit(cents.map(_._1)),
      typedlit(cents.map(_._2.map(x => x * x).sum))))
    val crossMaps = books.zipWithIndex.map { case (cents, j) =>
      val entries = for ((cellId, cv) <- centroids; (code, rv) <- cents)
        yield (cellId * ksub + code,
          cv.slice(j * subDim, (j + 1) * subDim).zip(rv).map { case (a, b) => a * b }.sum)
      map_from_arrays(typedlit(entries.map(_._1)), typedlit(entries.map(_._2)))
    }
    val cellNormSq = map_from_arrays(
      typedlit(centroids.map(_._1)),
      typedlit(centroids.map(_._2.map(x => x * x).sum)))
    val queries0 = base
      .withColumn("pcell",
        explode(assignCells(col("v"), bcCent, nprobe)))
      .select(col("pcell").as("cell"), col(idCol).as("query_id"),
        col("v").as("qv"), col("vn").as("qn"))
    val queries = books.indices.foldLeft(queries0) { case (acc, j) =>
      val sub = slice(col("qv"), j * subDim + 1, subDim)
      acc.withColumn(s"qd$j", ArrayNumeric.centroidDotMap(sub, bcBooks(j)))
    }
    val dotQC = VectorOps.dot(col("qv"),
      ArrayNumeric.centroidVector(col("cell"), bcCent))
    val approxDot = dotQC + books.indices
      .map(j => element_at(col(s"qd$j"), col(s"c$j"))).reduce(_ + _)
    val normSq = element_at(cellNormSq, col("cell")) +
      lit(2.0) * books.indices
        .map(j => element_at(crossMaps(j), col("cell") * ksub + col(s"c$j")))
        .reduce(_ + _) +
      books.indices.map(j => element_at(nsqMaps(j), col(s"c$j"))).reduce(_ + _)
    val pairs = queries.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", approxDot / (col("qn") * sqrt(normSq)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** `kmeansFit` as a DataFrame (cell, cv) for callers that join it. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    kmeansFit(df, idCol, vecCol, k, iters).toDF("cell", "cv")
  }

  /** IVF-style ANN: a trained coarse quantizer (`kmeansFit`) assigns
    * every vector to its nearest centroid cell as a broadcast-codebook
    * codegen projection; queries compare only within their own cell
    * (nprobe=1 here; multi-probe = also join the next-nearest cells).
    * The cells shard the O(n²) space like an inverted file does. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              nCentroids: Int, kmeansIters: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    // ONE materialization feeds k-means training (a narrow filter over
    // the checkpoint selects the training sample) AND both sides of the
    // within-cell self-join — the training slice never pays its own
    // checkpoint job.
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint()
    val train =
      if (trainSampleMod > 1) base.filter(col(idCol) % trainSampleMod === 0) else base
    val centroids = kmeansFitOnBase(train, df, idCol, vecCol, nCentroids, kmeansIters)
    val cells = base
      .withColumn("cell", assignCell(col("v"), bcBook(df, centroids)))
    // search within the cell
    val a = cells.select(col("cell"), col(idCol).as("query_id"),
      col("v").as("qv"), col("vn").as("qn"))
    val b = cells.select(col("cell"), col(idCol).as("neighbor_id"),
      col("v").as("cv2"), col("vn").as("cn2"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Reciprocal-rank fusion of retrieval rankings — the hybrid-search
    * combiner (dense + sparse, or two dense rankers with different
    * recall profiles): per (query, candidate), score = Σ 1/(c + rank)
    * over the rankings that surfaced it, re-ranked to top-`k`. Rank
    * lists are (query_id, rank, neighbor_id) frames — top-k-sized per
    * query, so every join here is over already-bounded inputs, never
    * the corpus. The per-ranker contributions are summed in fixed
    * declaration order (coalesced column adds, not a grouped float
    * sum), so fused scores are deterministic across engines and
    * partitionings. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("neighbor_id"),
        (lit(1.0) / (col("rank") + c)).as(s"__s$i"))
    }
    val joined = tagged.reduce((a, b) =>
      a.join(b, Seq("query_id", "neighbor_id"), "full_outer"))
    val score = tagged.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__rrf").desc, col("neighbor_id").asc)
    joined.withColumn("__rrf", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (floor(col("__rrf") * 1000000 + lit(0.5)) / 1000000).as("rrf"))
  }

  /** Incremental IVF probe — the operational ANN form at ingest time:
    * the NEW batch's vectors are assigned to the cells of a quantizer
    * trained on the PERSISTED index side and search only the index
    * members of their cell. The index is scanned once and never
    * self-joins; training, seeding, and assignment follow the exact
    * `ivfTopK` protocol (seed ids < nCentroids drawn from the INDEX,
    * Lloyd rounds over the index's 1-in-`trainSampleMod` sample) so a
    * SQL oracle reproduces the cells bit-for-bit. The batch side is
    * ingest-sized — `broadcastIfSmall` guards the cell join, so a
    * normal ingest broadcasts and the 100 TB index never shuffles
    * (the IVF sibling of `Dedup.lshProbePairs`). */
  def ivfProbeTopK(index: DataFrame, batch: DataFrame, idCol: String,
                   vecCol: String, k: Int, nCentroids: Int,
                   kmeansIters: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    val (centroids, idxCells) = ivfIndexCore(index, idCol, vecCol,
      nCentroids, kmeansIters, trainSampleMod)
    probeIvfIndex(IvfIndex(centroids, idxCells), batch, idCol, vecCol, k)
  }

  /** Persisted-index handle for the amortized IVF serving path: the
    * fitted centroid codebook plus the cell-inverted index frame.
    * Obtain via [[buildIvfIndex]]; probe with [[probeIvfIndex]]. */
  case class IvfIndex(centroids: Seq[(Long, Seq[Double])], cells: DataFrame)

  /** The shared core of [[ivfProbeTopK]] and [[buildIvfIndex]]: fit
    * the quantizer on the index side (exact `ivfTopK` protocol) and
    * invert the index by nearest cell. The cells frame is returned
    * LAZY over the idxBase checkpoint — the one-shot probe consumes it
    * inside a single action; only the persisted-index form pays a
    * second checkpoint to make the assignment a reusable artifact. */
  private def ivfIndexCore(index: DataFrame, idCol: String, vecCol: String,
                           nCentroids: Int, kmeansIters: Int,
                           trainSampleMod: Int): (Seq[(Long, Seq[Double])], DataFrame) = {
    val idxBase = spread(index).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds k-means training AND the searched side
    val train =
      if (trainSampleMod > 1) idxBase.filter(col(idCol) % trainSampleMod === 0)
      else idxBase
    val centroids = kmeansFitOnBase(train, index, idCol, vecCol,
      nCentroids, kmeansIters)
    val idxCells = idxBase
      .withColumn("cell", assignCell(col("v"), bcBook(index, centroids)))
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col("v").as("cv2"), col("vn").as("cn2"))
    (centroids, idxCells)
  }

  /** Build the persisted IVF index ONCE (train + invert + checkpoint)
    * so [[probeIvfIndex]] calls time the probe alone — the steady-state
    * ANN serving cost, the IVF sibling of `TfIdf.buildSparseIndex`.
    * Identical protocol to [[ivfProbeTopK]]'s inline build, so a probe
    * against this index returns bit-identical rows. */
  def buildIvfIndex(index: DataFrame, idCol: String, vecCol: String,
                    nCentroids: Int, kmeansIters: Int = 2,
                    trainSampleMod: Int = 1): IvfIndex = {
    val (centroids, idxCells) = ivfIndexCore(index, idCol, vecCol,
      nCentroids, kmeansIters, trainSampleMod)
    IvfIndex(centroids, idxCells.localCheckpoint())
  }

  /** Search a persisted [[IvfIndex]] with a new batch: assign each
    * batch vector to its cell against the BROADCAST codebook (pure
    * codegen, no shuffle), join only that cell's index members, exact
    * cosine, top-`k` per query. The batch side is ingest-sized —
    * `broadcastIfSmall` guards the join, so the index never reshuffles
    * across probes (the operational contract a vector store serves). */
  def probeIvfIndex(ix: IvfIndex, batch: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val book = bcBook(batch, ix.centroids)
    val batchCells = batch.select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .withColumn("cell", assignCell(col("v"), book))
      .select(col("cell"), col(idCol).as("query_id"),
        col("v").as("qv"), col("vn").as("qn"))
    val pairs = Relational.broadcastIfSmall(batchCells).join(ix.cells, Seq("cell"))
      .withColumn("cosine",
        VectorOps.dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** LSH-bucketed cosine near-dup pairs: hyperplane buckets generate
    * candidates, the exact threshold verifies — the scale path of
    * `cosineNearDupPairs` (recall < 1 by construction, tunable via
    * plane count / multi-probe). */
  def lshCosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
      .withColumn("vn", VectorOps.norm(col("v")))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col("v").as("va"), col("vn").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col("v").as("vb"), col("vn").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Johnson-Lindenstrauss RANDOM PROJECTION of an embedding column —
    * the 100-TB dimensionality cut (d → k) that makes every downstream
    * distance pass (brute-force screens, LSH bucketing, dedup verify)
    * k/d as expensive while JL bounds the pairwise-distance
    * distortion. Map-side and shuffle-free: the d×k ±1 sign matrix is
    * a plan-time literal (Rademacher signs from the md5 parity of
    * "i_j", reproducible in ANY engine with md5 — no RNG state to
    * ship), so the projection is one codegen'd expression per output
    * coordinate.
    *
    * Cross-engine-exact: inputs quantize to the 2⁻¹⁰ dyadic grid, the
    * signed sums are therefore exactly representable (order-
    * independent), and the JL scale is fixed at 1/√k with k=16 → 0.25,
    * itself dyadic. Emits (id, j, p) exploded rows — one per output
    * coordinate. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    dim: Int, k: Int = 16): DataFrame =
    df.select(col(idCol),
        posexplode(array(projExprs(vecCol, dim, k): _*)).as(Seq("j", "p")))
      .withColumn("j", col("j").cast("long"))

  /** [[randomProject]] in VECTOR form: (id, pvec) with the k projected
    * coordinates as one array column — the shape downstream distance
    * passes consume directly. Same sign matrix, grid, and exact sums
    * as the exploded form. */
  def randomProjectVec(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, k: Int = 16): DataFrame =
    df.select(col(idCol), array(projExprs(vecCol, dim, k): _*).as("pvec"))

  private def projExprs(vecCol: String, dim: Int, k: Int): Seq[Column] = {
    // power of FOUR, not merely a perfect square: 1/sqrt(k) is dyadic
    // (exactly representable) only when sqrt(k) is a power of two —
    // k=9 would pass a square check but 1/3 leaves the grid
    require(k >= 1 && (k & (k - 1)) == 0
        && java.lang.Integer.numberOfTrailingZeros(k) % 2 == 0,
      "k must be a power of 4 so 1/sqrt(k) is exactly representable")
    val scale = 1.0 / math.sqrt(k)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
      // first hex nibble parity, matching ('0x'||substring(md5(s),1,1))::BIGINT % 2
      if (((hex(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
    }
    val vq = transform(col(vecCol),
      x => floor(x.cast("double") * 1024 + lit(0.5)) / 1024)
    (0 until k).map { j =>
      val sj = array((0 until dim).map(i => lit(sign(i, j))): _*)
      aggregate(zip_with(vq, sj, (x, s) => x * s), lit(0.0),
        (acc, x) => acc + x) * scale
    }
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): cluster
    * the embedding space with the trained coarse quantizer, then drop
    * every vector that has a LOWER-id within-cluster partner above the
    * cosine threshold — "keep one representative per semantic
    * neighborhood" at a cost that is within-cell quadratic, never
    * corpus-quadratic (the cells shard the O(n²) space exactly like the
    * IVF index they share the quantizer with).
    *
    * Drop rule: b drops iff ∃ a < b in b's cell with cos(a,b) ≥ t —
    * deterministic and engine-portable (no transitive closure: a chain
    * a~b~c with cos(a,c) < t still drops c, because CHAINS of near-
    * duplicates are exactly what semantic dedup prunes). Returns the
    * surviving ids. */
  def semanticDedupKeepSet(df: DataFrame, idCol: String, vecCol: String,
                           nCentroids: Int, threshold: Double,
                           kmeansIters: Int = 2,
                           trainSampleMod: Int = 1): DataFrame = {
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds training AND both sides of the cell join
    val train =
      if (trainSampleMod > 1) base.filter(col(idCol) % trainSampleMod === 0) else base
    val centroids = kmeansFitOnBase(train, df, idCol, vecCol, nCentroids, kmeansIters)
    val cells = base
      .withColumn("cell", assignCell(col("v"), bcBook(df, centroids)))
    val a = cells.select(col("cell"), col(idCol).as("id_a"),
      col("v").as("va"), col("vn").as("na"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"),
      col("v").as("vb"), col("vn").as("nb"))
    val drops = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb"))
        >= threshold)
      .select(col("id_b").as("__drop")).distinct()
    df.join(drops, col(idCol) === col("__drop"), "left_anti")
      .select(col(idCol))
  }

  /** Multi-probe LSH cosine near-dup pairs: like
    * `lshCosineNearDupPairs` but each vector also probes the Hamming-1
    * neighbors of its bucket, recovering near-dup pairs split across a
    * single hyperplane boundary. With `p` planes this covers every pair
    * whose bucket keys differ in ≤1 bit — the recall knob that keeps
    * the candidate join linear in probe count, never all-pairs. */
  def lshCosineNearDupPairsMultiProbe(df: DataFrame, idCol: String,
                                      vecCol: String, threshold: Double,
                                      planes: Seq[Seq[Double]]): DataFrame = {
    val bucketed = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds probe and corpus sides of the join
    val a = bucketed.select(col(idCol).as("id_a"), col("v").as("va"),
      col("vn").as("na"), explode(probeVariants(planes.size)).as("bucket"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col("v").as("vb"), col("vn").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** OR-amplified multi-TABLE LSH near-dup pairs: `tables` independent
    * hyperplane sets each bucket the corpus, a pair is a candidate if
    * ANY table co-buckets it (within Hamming-1 multi-probe), and the
    * exact cosine verifies. Per-table hit probability p lifts to
    * 1 − (1 − p)^L — the standard LSH recall amplifier (Indyk/Motwani;
    * the banding trick of MMDS ch.3) that raises recall WITHOUT
    * coarsening any single table's buckets (candidate cost grows
    * linearly in L, never quadratically in bucket size).
    *
    * Scale shape: ONE join, not L — every vector emits its L
    * table-prefixed bucket keys on the corpus side and L·(planes+1)
    * probe keys on the query side, the join runs on the composite
    * `t|bits` key, and the verified pairs dedup once at the end. The
    * corpus is never replicated by more than L; buckets from different
    * tables can never collide (the `t|` prefix partitions the key
    * space). */
  def lshCosineNearDupPairsMultiTable(df: DataFrame, idCol: String,
                                      vecCol: String, threshold: Double,
                                      tables: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(tables.nonEmpty && tables.size <= 9, "1-9 tables (1-char prefix)")
    val nPlanes = tables.head.size
    require(tables.forall(_.size == nPlanes), "tables must share a plane count")
    val base = spread(df).select(col(idCol), col(vecCol).as("v"))
      .withColumn("buckets", array(tables.zipWithIndex.map { case (p, t) =>
        concat(lit(s"$t|"), VectorOps.hyperplaneBucket(col("v"), p))
      }: _*))
      .withColumn("vn", VectorOps.norm(col("v")))
      .localCheckpoint() // feeds probe and corpus sides of the join
    // Hamming-1 variants of a PREFIXED key: flip bit i at offset +2
    // ("t|" is 2 chars), keeping the table prefix intact.
    def flip(i: Int) = concat(
      substring(col("bucket"), 1, i + 1),
      when(substring(col("bucket"), i + 2, 1) === "1", lit("0"))
        .otherwise(lit("1")),
      substring(col("bucket"), i + 3, nPlanes - i))
    val probes = array(col("bucket") +: (1 to nPlanes).map(flip): _*)
    val a = base.select(col(idCol).as("id_a"), col("v").as("va"),
        col("vn").as("na"), explode(col("buckets")).as("bucket"))
      .select(col("id_a"), col("va"), col("na"),
        explode(probes).as("bucket"))
    val b = base.select(explode(col("buckets")).as("bucket"),
      col(idCol).as("id_b"), col("v").as("vb"), col("vn").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** EXACT-FOR-VALIDATION — embedding-cosine near-duplicate pairs
    * above a threshold (the semantic-dedup primitive) via an all-pairs
    * theta join: O(n²), a scale-killer at 100 TB. Use it to measure
    * recall of the production paths (`lshCosineNearDupPairs` /
    * `lshCosineNearDupPairsMultiProbe`) on a sample, never as the
    * default pipeline. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = spread(df).select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", VectorOps.norm(col("va")))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", VectorOps.norm(col("vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Embedding-level decontamination: flag every train vector within
    * cosine `threshold` of ANY eval vector (the semantic sibling of the
    * n-gram `Cleaning.decontaminate` — catches paraphrased eval
    * leakage that exact n-grams miss).
    *
    * The eval side is broadcast and the train corpus streams through
    * ONE map-side pass — deliberately a broadcast nested-loop, not an
    * LSH bucket join: an eval benchmark is thousands of rows (always
    * broadcastable), train is the 100 TB side, and an LSH screen here
    * would trade false-negative LEAKAGE for a shuffle we don't need.
    * Per-row cost is |eval| codegen'd dot products
    * ([[graft.functions.VectorOps.dot]] → NumericArrayDot); the
    * threshold filter runs before the per-id aggregation, so the
    * shuffle carries only contaminated ids (partial-agg'd map-side). */
  def broadcastCosineScreen(train: DataFrame, eval: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val ev = broadcast(eval.select(col(vecCol).as("__evec"))
      .withColumn("__enorm", VectorOps.norm(col("__evec"))))
    spread(train).select(col(idCol), col(vecCol))
      .withColumn("__tnorm", VectorOps.norm(col(vecCol)))
      .crossJoin(ev)
      .withColumn("__cos",
        VectorOps.dot(col(vecCol), col("__evec")) /
          (col("__tnorm") * col("__enorm")))
      .filter(col("__cos") >= threshold)
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_eval_cos"),
        count(lit(1)).as("n_hits"))
  }
}
