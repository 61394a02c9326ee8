package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.ArrayNumeric
import graft.functions.Hashes

/** Document deduplication for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-dup detection, plus
  * the post-candidate steps — connected-component clustering and the
  * final keep-set.
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the content hash;
  *  - MinHash signatures are ONE groupBy over exploded shingles with k
  *    `min` aggregates (map-side partial agg — never materializes the
  *    (doc × seed) cross product);
  *  - LSH candidate generation joins the banded signature table with
  *    itself on (band, band_signature) — only same-bucket pairs are
  *    produced, never the O(n²) pair space;
  *  - verification (true Jaccard) runs only on candidates;
  *  - clustering is iterative min-label propagation (one join + one
  *    groupBy per round), not driver-side union-find.
  */
object Dedup {

  /** Spread a small-file scan across the session's shuffle parallelism
    * before the shingling/probe stages — see
    * [[Relational.computeRebalance]] for the gating rationale. */
  private[operators] def spread(df: DataFrame): DataFrame =
    Relational.computeRebalance(df)

  /** Exact dedup: keep the lowest-`idCol` row per normalized content
    * hash (reference content-hash dedup before expensive compute:
    * pangenome.py:22-68). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", Hashes.contentHash(col(textCol)))
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct character n-gram shingles of `text`, as an array column. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** (id, shingle) long table — the exploded form both MinHash and
    * Jaccard verification build on. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    spread(df).select(col(idCol), explode(shingles(col(textCol), n)).as("shingle"))

  /** MinHash universal-hash family: ONE portable base hash per shingle
    * (60 bits of its md5, mod the Mersenne prime 2^31-1), then k cheap
    * affine mixes `(a_s·h + b_s) mod p` — instead of k md5 calls per
    * shingle occurrence. All intermediates stay < 2^51, so the same
    * arithmetic is overflow-free in any 64-bit engine (the SQL oracle
    * reproduces it with `('0x'||substring(md5(s),1,15))::BIGINT`). */
  val MinhashPrime = 2147483647L // 2^31 - 1
  def minhashSeedA(s: Int): Long = ((s * 40503L + 12345L) % 1048573L) + 1L
  def minhashSeedB(s: Int): Long = (s * 65521L + 17L) % 1048573L

  /** 60-bit md5 prefix of the shingle, reduced mod p. */
  def shingleBaseHash(shingle: Column): Column =
    shingleFingerprint60(shingle) % MinhashPrime

  /** The UNREDUCED 60-bit md5 prefix — for set-membership fingerprints
    * (overlap/containment reports), where the minhash family's mod-p
    * reduction to 31 bits would add ~|A|·|B|/2³¹ cross-set collision
    * noise at corpus scale. Only the affine mixes need the prime
    * field. */
  def shingleFingerprint60(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long")

  def seedHash(baseHash: Column, seed: Int): Column =
    (baseHash * minhashSeedA(seed) + minhashSeedB(seed)) % MinhashPrime

  /** MinHash signature: k min-hash columns `mh0..mh{k-1}` per id.
    * Single groupBy; k aggregates with map-side partial min. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    val st = shingleTable(df, idCol, textCol, n)
      .withColumn("hm", shingleBaseHash(col("shingle")))
    val aggs = (0 until k).map(s => min(seedHash(col("hm"), s)).as(s"mh$s"))
    st.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature frame: (id, band, band_sig)
    * with `bands` bands of `rows` signature columns each. */
  def lshBands(sig: DataFrame, idCol: String, bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("band_sig"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band"), col("bs.band_sig"))
  }

  /** Per-row (map-side) MinHash signature: the same VALUES as
    * `minhashSignature` (PropertySpec asserts equality), computed
    * entirely with array HOFs — no explode, no groupBy — so it runs
    * inside a streaming map stage (streaming.StreamNearDup), where a
    * shuffle agg before the stateful operator is off the table. The
    * base md5 hashes materialize ONCE per row (outer transform); the
    * fold then applies the k affine mixes to a k-wide min accumulator,
    * so total hash work matches the agg form. Returns (id, sig). */
  def minhashSignatureRowwise(df: DataFrame, idCol: String, textCol: String,
                              n: Int = 5, k: Int = 16): DataFrame = {
    val seedA = array((0 until k).map(s => lit(minhashSeedA(s))): _*)
    val seedB = array((0 until k).map(s => lit(minhashSeedB(s))): _*)
    val hashes = transform(shingles(col(textCol), n), s => shingleBaseHash(s))
    val sig = aggregate(hashes,
      array_repeat(lit(MinhashPrime), k),
      (acc, h) => transform(acc, (m, j) =>
        least(m, (h * element_at(seedA, j + 1) + element_at(seedB, j + 1))
          % MinhashPrime)))
    df.select(col(idCol), sig.as("sig"))
  }

  /** Band rows from a row-wise signature — still map-side (the explode
    * is a stateless generator): (id, band, band_sig), signature-
    * compatible with `lshBands` output. */
  def lshBandsRowwise(sig: DataFrame, idCol: String, bands: Int,
                      rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val parts = (b * rows until (b + 1) * rows)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band"), md5(concat_ws(",", parts: _*)).as("band_sig"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band"), col("bs.band_sig"))
  }

  /** Band signatures of a corpus slice, shaped for persistence as an
    * incremental dedup INDEX: (id, band, band_sig) — ~bands rows per
    * doc, independent of text size. */
  def lshIndexBands(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 5, k: Int = 16, bands: Int = 4): DataFrame =
    lshBands(minhashSignature(df, idCol, textCol, n, k), idCol, bands, k / bands)

  /** Incremental near-dup screening — the operational form at 100 TB:
    * instead of re-running LSH over the whole corpus per ingest, the
    * NEW batch's band signatures probe a persisted band index
    * (`lshIndexBands` output, appended per ingest). The batch side is
    * tiny relative to the index, so it BROADCASTS: the index never
    * shuffles, and the probe is one scan. New-vs-new pairs within the
    * batch are `lshCandidatePairs` on the batch alone. Returns
    * (id_new, id_idx) candidate pairs. */
  def lshProbePairs(newDocs: DataFrame, index: DataFrame, idCol: String,
                    textCol: String, n: Int = 5, k: Int = 16,
                    bands: Int = 4): DataFrame = {
    val probe = lshIndexBands(newDocs, idCol, textCol, n, k, bands)
      .select(col("band"), col("band_sig"), col(idCol).as("id_new"))
    broadcast(probe)
      .join(index.select(col("band"), col("band_sig"), col(idCol).as("id_idx")),
        Seq("band", "band_sig"))
      .select(col("id_new"), col("id_idx")).distinct()
  }

  /** Candidate near-dup pairs: ids sharing any LSH band bucket.
    * Self-join on (band, band_sig) — shuffles only the banded keys.
    *
    * The bucket join is salted like `jaccardPairs`: a degenerate corpus
    * (many identical documents → one hot bucket) would otherwise put
    * that bucket's whole O(n²) pair space in ONE task. Side A carries
    * `salt = hash(id) mod salts`, side B replicates to every salt —
    * each pair still meets exactly once (at A's salt), while a hot
    * bucket's pair space fans out over `salts` tasks. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, k: Int = 16, bands: Int = 4,
                        salts: Int = 8): DataFrame = {
    val rows = k / bands
    // The banded table feeds BOTH sides of the self-join; materialize it
    // once (localCheckpoint) — Spark's exchange reuse does not unify the
    // two branches here, so without this the whole signature aggregation
    // runs twice.
    val sig = minhashSignature(df, idCol, textCol, n, k).localCheckpoint()
    val withSigs = sig.select(col(idCol),
      minhashBandSigs(bands, k / bands).as("band_sigs"))
    saltedBucketPairs(withSigs, idCol, bands, salts)
  }

  /** The banded bucket-signature array over a minhash signature frame
    * (columns mh0..mh{k−1}): band b's signature is the md5 of its
    * `rows` components joined by "," — the ONE protocol (slicing +
    * delimiter + hash) the LSH oracles reproduce, so every banded
    * consumer must build it here, not inline. */
  private[operators] def minhashBandSigs(bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      md5(concat_ws(",", cols: _*))
    }: _*)

  /** Salted same-bucket pair generation shared by the banded candidate
    * operators. Input: (id, band_sigs) with one bucket signature per
    * band. A-side salt from the id hash, B-side replicated `salts`×,
    * join on (band, band_sig, salt) — so each unordered pair meets once
    * per matching band, at A's salt. Replication cost is `salts`× the
    * (small) banded key table — shuffle-cheap next to the quadratic
    * hot-bucket probe work it spreads out.
    *
    * Pairs matching in several bands are deduped by FIRST-MATCHING-BAND
    * -WINS: a pair is emitted only from its lowest matching band
    * (both sides carry the full band_sigs array, so "no earlier band
    * matches" is a cheap codegen filter). That replaces a `distinct()`
    * over the full candidate-pair stream — a shuffle + hash agg whose
    * cost grows with the pair space — with a narrow filter: measured
    * 2.5 s → 1.5 s on the sf0.1 simhash candidates. */
  private[operators] def saltedBucketPairs(withSigs: DataFrame, idCol: String,
                                           bands: Int, salts: Int): DataFrame = {
    // posexplode_outer, not posexplode: the optimizer infers a
    // `size(band_sigs)>0` guard under the plain generator that
    // re-evaluates the band-signature md5s a second time per row; the
    // array is constant-size and never null, so outer is identical.
    val exploded = withSigs.select(col(idCol), col("band_sigs"),
      posexplode_outer(col("band_sigs")).as(Seq("band", "band_sig")))
    val a = exploded.select(col("band"), col("band_sig"),
      col(idCol).as("id_a"), col("band_sigs").as("sigs_a"))
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts)).cast("int"))
    val b = exploded.select(col("band"), col("band_sig"),
      col(idCol).as("id_b"), col("band_sigs").as("sigs_b"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    // explicit predicate chain (band count is static) rather than an
    // exists() higher-order function: HOFs drop out of whole-stage
    // codegen, and this filter sits on the candidate hot path
    val noEarlierMatch = (0 until bands - 1).map { bp =>
      col("band") <= bp ||
        element_at(col("sigs_a"), bp + 1) =!= element_at(col("sigs_b"), bp + 1)
    }.reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, Seq("band", "band_sig", "salt"))
      .filter(col("id_a") < col("id_b"))
      .filter(noEarlierMatch)
      .select(col("id_a"), col("id_b"))
  }

  /** MinHash Jaccard ESTIMATE over the LSH candidate pairs: the
    * fraction of the k signature components that agree (P[component
    * match] = J(A,B), so the mean over k seeds is the unbiased
    * estimator, sd √(J(1−J)/k)). The point at scale: candidate
    * generation AND verification both stay in SIGNATURE space — k
    * longs per doc, text read exactly once to build signatures —
    * where the exact verifier (`jaccardPairs`) re-reads both
    * documents' shingle sets per pair. Rank/filter candidates on the
    * estimate; run the exact form only on survivors (or as the
    * oracle). Estimates are exact multiples of 1/k, so differential
    * comparison needs no rounding when k is a power of two. */
  def minhashEstimatePairs(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 5, k: Int = 16, bands: Int = 4,
                           salts: Int = 8): DataFrame = {
    // one signature build feeds banding AND both estimate sides
    val sig = minhashSignature(df, idCol, textCol, n, k).localCheckpoint()
    val withSigs = sig.select(col(idCol),
      minhashBandSigs(bands, k / bands).as("band_sigs"))
    val pairs = saltedBucketPairs(withSigs, idCol, bands, salts)
    val sigArr = sig.select(col(idCol),
      array((0 until k).map(i => col(s"mh$i")): _*).as("__sig"))
    val matches = (0 until k).map(i =>
      when(element_at(col("__sa"), i + 1) === element_at(col("__sb"), i + 1),
        1).otherwise(0)).reduce(_ + _)
    pairs
      .join(sigArr.select(col(idCol).as("id_a"), col("__sig").as("__sa")),
        Seq("id_a"))
      .join(sigArr.select(col(idCol).as("id_b"), col("__sig").as("__sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / k).as("est_jaccard"))
  }

  /** Ascending-sorted 64-bit shingle hashes — the per-row form the
    * pairwise Jaccard verifier consumes. Hashing shingles to longs once
    * per row (xxhash64) makes each pair comparison a primitive merge
    * scan instead of string-set intersection; sortedness is what lets
    * the verifier run in O(|A|+|B|) with zero allocation. */
  def hashedShingles(text: Column, n: Int): Column =
    array_sort(array_distinct(transform(shingles(text, n), s => xxhash64(s))))

  /** Exact Jaccard from two sorted hashed-shingle arrays:
    * |A∩B| / (|A|+|B|-|A∩B|), the intersection via merge scan. */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = ArrayNumeric.sortedIntersectSize(shA, shB)
    inter.cast("double") / (size(shA) + size(shB) - inter).cast("double")
  }

  /** All pairs (within `blockCol` blocks) with n-gram Jaccard >= threshold.
    * Blocking keeps the pair space bounded; at scale the block column is
    * an LSH bucket (see lshCandidatePairs) — here it demonstrates the
    * verify operator itself.
    *
    * Per-pair cost is one merge scan over presorted hash arrays; a
    * size-ratio prefilter (J ≤ min/max, so J ≥ t ⇒ sizes within factor
    * 1/t — exact, no false negatives) prunes pairs before any scan.
    *
    * The block key is low-cardinality (languages, LSH buckets), so a
    * plain block-equi-join would put one whole block's O(n²) pair space
    * in ONE task. The join is therefore salted: side A carries
    * `salt = hash(id) mod salts`, side B is replicated to every salt —
    * each pair still meets exactly once (at A's salt), but a block's
    * pair space fans out over `salts` tasks. Replication cost is
    * B×`salts` rows of presorted hash arrays, shuffle-cheap next to the
    * quadratic probe work it parallelizes. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, threshold: Double,
                   salts: Int = 8): DataFrame = {
    val withSh = spread(df).select(col(blockCol).as("block"), col(idCol),
      hashedShingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
    val a = withSh.select(col("block"), col(idCol).as("id_a"),
      col("sh").as("sh_a"), col("sz").as("sz_a"))
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts)).cast("int"))
    val b = withSh.select(col("block"), col(idCol).as("id_b"),
      col("sh").as("sh_b"), col("sz").as("sz_b"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    // Probe parallelism: `spread` above already round-robins the source
    // rows, which a broadcast-hash probe inherits; if the planner picks
    // a shuffle join instead (build side over the broadcast threshold),
    // its exchange on (block, salt) takes over — where the salt, not
    // partition count, is what breaks the low-cardinality block skew.
    //
    // The merge scan is evaluated ONCE per surviving pair: only the
    // cheap conditions (id order, size ratio) ride the join; `inter` is
    // computed in a single post-join projection behind an evalOnce
    // fence, so predicate pushdown can't substitute the O(array_len)
    // scan back into the join condition, and both the threshold test
    // and the jaccard value derive from that one column. The threshold
    // test uses the product form: J = I/(A+B-I) >= t  ⇔  I·(1+t) >=
    // t·(A+B) — products of small ints with t are exact in double, so
    // this is the exact rational comparison, equivalent to the division
    // form (for |A∪B| ≤ 2^26 no rational J can sit within an ulp of t
    // without being equal).
    a.join(b, Seq("block", "salt"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_a") >= col("sz_b") * threshold &&
        col("sz_b") >= col("sz_a") * threshold)
      .withColumn("inter", ArrayNumeric.evalOnce(
        ArrayNumeric.sortedIntersectSize(col("sh_a"), col("sh_b"))))
      .filter(col("inter").cast("double") * (1.0 + threshold) >=
        lit(threshold) * (col("sz_a") + col("sz_b")).cast("double"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Duplicate clusters from a near-dup pair list: connected components
    * by iterative min-label propagation WITH pointer jumping — the
    * post-candidate step that turns pairwise matches into "keep one
    * representative per group".
    *
    * Each round every node takes the min of (its label, its neighbors'
    * labels, its label's label). The neighbor term alone converges in
    * O(component diameter) rounds; the pointer-jump term (path halving
    * — label-of-label is always a node in the same component) collapses
    * chains exponentially, so convergence is O(log diameter) — for a
    * pathological 1M-long near-dup chain that is ~20 rounds instead of
    * 1M. Each round is two joins + one groupBy, all shuffle-native
    * (driver-side union-find cannot scale); `localCheckpoint` truncates
    * the growing lineage so round N+1's plan doesn't replay rounds
    * 1..N.
    *
    * Returns (id, cluster_id) with cluster_id = min member id. */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b", maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().localCheckpoint()
    // Fused first round: starting from identity labels, round 1's
    // neighbor-min is just min(id, min neighbor id) — computable in the
    // same aggregation that enumerates the nodes, saving that round's
    // two label joins. Still a valid start state (every label is a node
    // id of the same component), so the fixpoint is unchanged.
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "__nid"), col("dst") === col("__nid"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val afterNeighbor = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("l1"),
          col("label").as("old_label"))
      // pointer jump: l1 is a node id of the same component, so its
      // current label is too — take the min of both.
      // The changed-label count RIDES the checkpoint materialization
      // as an `observe` metric (CollectMetrics folds while the rows
      // stream into blocks) — one action per round instead of a
      // checkpoint + a separate count job, and the checkpointed frame
      // no longer carries old_label (r16; same pattern as
      // Graph.labelPropagation's convergence probe).
      val obs = org.apache.spark.sql.Observation()
      val updated = afterNeighbor
        .join(labels.select(col("id").as("__jid"), col("label").as("__jl")),
          col("l1") === col("__jid"), "left")
        .select(col("id"),
          least(col("l1"), coalesce(col("__jl"), col("l1"))).as("label"),
          col("old_label"))
        .observe(obs, sum(when(col("label") =!= col("old_label"), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("id"), col("label"))
        .localCheckpoint()
      // sum over an empty frame is null — trivially converged
      changed = obs.get.get("changed") match {
        case Some(c: Long) => c
        case _ => 0L
      }
      labels = updated
      iter += 1
    }
    if (changed > 0)
      // A component with diameter > maxIters hasn't converged: labels
      // are still a valid partition refinement (every id has one), but
      // two labels may belong to one true component. Surface it — the
      // caller can raise maxIters — rather than silently under-merging.
      System.err.println(
        s"[graft] duplicateClusters: min-label propagation still changing after $maxIters iterations; clusters may be split finer than the true components")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** One representative per duplicate cluster (lowest id wins):
    * the rows to KEEP after near-dup clustering. Derived as
    * min(id) per final label — NOT `id === cluster_id` — so every
    * cluster keeps exactly one row even if label propagation stopped
    * at maxIters with labels that are no node's own id. */
  def representatives(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("cluster_id")).agg(min(col("id")).as("id"))
      .select(col("id"))

  /** The final dedup keep-set: cluster representatives plus every row
    * never implicated in a near-dup pair — what actually ships to
    * training. `corpus` supplies the full id set; `pairs` the near-dup
    * edges. One anti-join + the clustering. */
  def keepSet(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    val untouched = corpus.select(col(idCol).as("id"))
      .join(clusters.select(col("id")), Seq("id"), "left_anti")
    representatives(clusters).unionByName(untouched)
  }

  /** Quality-aware keep-set: like [[keepSet]], but each cluster keeps
    * its highest-`scoreCol` member (ties: lowest id) instead of the
    * accidental min-id — the production policy when duplicates differ
    * in quality (keep the longest/cleanest/highest-LM-scored copy, drop
    * the rest). One extra join to attach scores plus a per-cluster
    * window; clusters are near-dup groups, so the window's partitions
    * are small by construction. */
  def keepSetBy(corpus: DataFrame, idCol: String, scoreCol: String,
                pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = duplicateClusters(pairs)
    val scored = clusters.join(
      corpus.select(col(idCol).as("id"), col(scoreCol).as("__score")), Seq("id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("id").asc)
    val reps = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select(col("id"))
    val untouched = corpus.select(col(idCol).as("id"))
      .join(clusters.select(col("id")), Seq("id"), "left_anti")
    reps.unionByName(untouched)
  }

  /** 32-bit SimHash as a bit string, from md5 nibbles of each token:
    * bit i is the majority vote of nibble i's low bit across tokens.
    * Nibble-parity keeps the construction reproducible in any engine
    * with md5 (the SQL oracle); production would use xxhash64 bits. */
  def simhashBits(df: DataFrame, idCol: String, tokensCol: Column, bits: Int = 32): DataFrame = {
    val tok = spread(df).select(col(idCol), explode(tokensCol).as("tok"))
      .withColumn("h", md5(col("tok")))
    val lowNibbles = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val aggs = (0 until bits).map { i =>
      sum(when(substring(col("h"), i + 1, 1).isin(lowNibbles: _*), 1).otherwise(-1)).as(s"b$i")
    }
    val votes = tok.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val bitChars = (0 until bits).map(i => when(col(s"b$i") > 0, lit("1")).otherwise(lit("0")))
    votes.select(col(idCol), concat(bitChars: _*).as("simhash"))
  }

  /** SimHash near-dup candidates: split the bit string into `bands`
    * chunks; pairs agreeing on any chunk are candidates (guarantees
    * recall for hamming distance < bands). Salted like
    * `lshCandidatePairs` — identical docs share every chunk, so a
    * duplicate-heavy corpus is exactly the hot-bucket case. */
  def simhashCandidates(sig: DataFrame, idCol: String, bits: Int = 32,
                        bands: Int = 4, salts: Int = 8): DataFrame = {
    val chunk = bits / bands
    // self-joined below: materialize once (see lshCandidatePairs)
    val withSigs = sig.localCheckpoint().select(col(idCol),
      array((0 until bands).map { b =>
        substring(col("simhash"), b * chunk + 1, chunk)
      }: _*).as("band_sigs"))
    saltedBucketPairs(withSigs, idCol, bands, salts)
  }

  /** Winnowing fingerprints (the MOSS selection rule): hash every
    * `k`-char window of the text, then keep the minimum hash of each
    * run of `w` consecutive window hashes. Guarantee: two documents
    * sharing ANY substring of length >= k + w - 1 share at least one
    * fingerprint — this is substring-level (copy-paste) duplication,
    * which set-based shingle overlap (Jaccard) deliberately ignores.
    * Density is ~2/(w+1): the index is a small fraction of the text.
    *
    * Scale shape: winnowing is document-LOCAL, so the whole selection
    * runs inside one codegen projection on top of the scan
    * ([[org.apache.spark.sql.graftx.WinnowFingerprints]]: Karp-Rabin
    * rolling hash + deque sliding min, O(len) per doc) — zero
    * shuffles, and the exploded (id, fp) rows are already distinct
    * per doc. Replaces a per-position `md5(substr)` formulation that
    * computed O(len) full digests per doc and shuffled the whole
    * corpus by doc id for the sliding-min window
    * ([[winnowFingerprintsMd5]], kept as the cross-engine-parity
    * reference: md5 is universal where the rolling-hash protocol
    * constants are ours). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame =
    spread(df).select(col(idCol),
      explode(org.apache.spark.sql.graftx.ArrayNumeric
        .winnowFps(col(textCol), k, w)).as("fp"))

  /** The pre-rolling-hash winnowing formulation (per-position md5,
    * window-frame sliding min). Same selection rule and guarantee,
    * different hash values; O(len) md5 digests per doc plus a full
    * corpus shuffle for the per-doc window — use only when the
    * fingerprints must be reproducible with stock hash functions. */
  def winnowFingerprintsMd5(df: DataFrame, idCol: String, textCol: String,
                            k: Int, w: Int): DataFrame = {
    val n1 = greatest(length(col(textCol)) - (k - 1), lit(1))
    val positions = spread(df)
      .select(col(idCol), col(textCol).as("__t"), n1.as("__n1"))
      .select(col(idCol), col("__t"), col("__n1"),
        explode_outer(sequence(lit(1), col("__n1"))).as("pos"))
    val hashed = positions.select(col(idCol), col("pos"), col("__n1"),
      conv(substring(md5(col("__t").substr(col("pos"), lit(k))), 1, 15), 16, 10)
        .cast("long").as("h"))
    val frame = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    hashed.withColumn("fp", min(col("h")).over(frame))
      .filter(col("pos") <= greatest(col("__n1") - (w - 1), lit(1)))
      .select(col(idCol), col("fp")).distinct()
  }

  /** Document pairs sharing a verbatim run of >= k + w - 1 chars:
    * winnowing fingerprints + a salted self-join on the fingerprint
    * (same skew treatment as the banded LSH joins — boilerplate shared
    * by thousands of docs is exactly the hot-bucket case). */
  def substringDupPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 20, w: Int = 10, salts: Int = 4): DataFrame = {
    // self-joined: materialize once (see lshCandidatePairs)
    val fps = winnowFingerprints(df, idCol, textCol, k, w).localCheckpoint()
    val a = fps.select(col("fp"), col(idCol).as("id_a"))
      .withColumn("salt", pmod(xxhash64(col("id_a")), lit(salts)).cast("int"))
    val b = fps.select(col("fp"), col(idCol).as("id_b"))
      .withColumn("salt",
        explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    a.join(b, Seq("fp", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Containment pairs: `id_inner`'s text is (fingerprint-)contained
    * in `id_outer`'s — every winnowing fingerprint of the inner doc
    * also occurs in the outer doc. Pairwise Jaccard misses this case
    * by construction (a snippet quoted inside a much larger page has
    * near-zero Jaccard with it); containment is the dedup relation for
    * quote-inclusion, page-within-crawl, and doc-within-concatenation
    * duplication (Broder's resemblance/containment distinction, 1997).
    * Exact-equal docs are mutually contained and appear in both
    * directions.
    *
    * Scale shape: candidate pairs never leave shared-fingerprint
    * buckets (the same salted self-join as [[substringDupPairs]] —
    * boilerplate fingerprints shared by thousands of docs are the hot
    * buckets, salted `salts` ways), the intersection size is a
    * partial-agg count over those pairs, and the subset test is a
    * per-inner-doc fingerprint-count equi-join. No all-pairs stage
    * anywhere. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 20, w: Int = 10, salts: Int = 4): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w).localCheckpoint()
    val nfp = fps.groupBy(col(idCol)).agg(count(lit(1)).as("__nfp"))
      .select(col(idCol).as("id_inner"), col("__nfp"))
    val a = fps.select(col("fp"), col(idCol).as("id_inner"))
      .withColumn("salt", pmod(xxhash64(col("id_inner")), lit(salts)).cast("int"))
    val b = fps.select(col("fp"), col(idCol).as("id_outer"))
      .withColumn("salt",
        explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    a.join(b, Seq("fp", "salt"))
      .filter(col("id_inner") =!= col("id_outer"))
      .groupBy(col("id_inner"), col("id_outer"))
      .agg(count(lit(1)).as("__shared"))
      .join(nfp, Seq("id_inner"))
      .filter(col("__shared") === col("__nfp"))
      .select(col("id_inner"), col("id_outer"))
  }

  /** Cross-source duplication matrix: for every pair of corpus sources,
    * the shingle-fingerprint overlap (|A∩B|), Jaccard, and directional
    * containments — the "which crawls/dumps duplicate each other"
    * report a corpus-curation pass runs BEFORE choosing mixing weights
    * (a source 0.9-contained in another contributes little novelty at
    * full weight).
    *
    * Scale shape: fingerprints are 60-bit hashes (never shingle
    * strings) and the per-source fingerprint SETS are built by one
    * partial-agg distinct — the corpus is touched once. The pair join
    * shuffles only the deduped (group, fp) table on fp; a fingerprint
    * present in g of G groups emits C(g,2) ≤ C(G,2) pairs, so the
    * output and the join fan-out are bounded by the GROUP count (tiny),
    * not the corpus. */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
                    n: Int): DataFrame = {
    val fp = shingleTable(df.select(col(groupCol), col(textCol)),
        groupCol, textCol, n)
      .select(col(groupCol), shingleFingerprint60(col("shingle")).as("fp"))
      .distinct()
      .localCheckpoint() // feeds sizes + both join sides: hash once
    val sizes = fp.groupBy(col(groupCol)).agg(count(lit(1)).as("n_fp"))
    val a = fp.select(col(groupCol).as("source_a"), col("fp"))
    val b = fp.select(col(groupCol).as("source_b"), col("fp"))
    a.join(b, Seq("fp")).filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.withColumnRenamed(groupCol, "source_a")
        .withColumnRenamed("n_fp", "n_a")), Seq("source_a"))
      .join(broadcast(sizes.withColumnRenamed(groupCol, "source_b")
        .withColumnRenamed("n_fp", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"),
        (col("n_common").cast("double") / col("n_a").cast("double"))
          .as("containment_a"),
        (col("n_common").cast("double") / col("n_b").cast("double"))
          .as("containment_b"))
  }
}
