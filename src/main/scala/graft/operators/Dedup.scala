package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Document deduplication for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design:
  *  - exact dedup is one hash-shuffle on the content hash;
  *  - MinHash signatures are ONE groupBy over exploded shingles with k
  *    `min` aggregates (map-side partial agg — never materializes the
  *    (doc × seed) cross product);
  *  - LSH candidate generation joins the banded signature table with
  *    itself on (band, band_signature) — only same-bucket pairs are
  *    produced, never the O(n²) pair space;
  *  - verification (true Jaccard) runs only on candidates.
  */
object Dedup {

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
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("shingle"))

  /** Portable per-seed shingle hash: md5 of the seed-tagged shingle.
    * (Murmur/xxhash would be faster but md5 reproduces in any engine;
    * swap `hashFn` for `xxhash64` in production.) */
  def seedHash(shingle: Column, seed: Int): Column =
    md5(concat(shingle, lit("#" + seed)))

  /** MinHash signature: k min-hash columns `mh0..mh{k-1}` per id.
    * Single groupBy; k aggregates. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    val st = shingleTable(df, idCol, textCol, n)
    val aggs = (0 until k).map(s => min(seedHash(col("shingle"), s)).as(s"mh$s"))
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

  /** Candidate near-dup pairs: ids sharing any LSH band bucket.
    * Self-join on (band, band_sig) — shuffles only the banded keys. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = minhashSignature(df, idCol, textCol, n, k)
    val banded = lshBands(sig, idCol, bands, rows)
    val a = banded.select(col("band"), col("band_sig"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("band_sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact n-gram Jaccard for given pairs (verification stage), from
    * the shingle arrays of each side. */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double")

  /** All pairs (within `blockCol` blocks) with n-gram Jaccard >= threshold.
    * Blocking keeps the pair space bounded; at scale the block column is
    * an LSH bucket (see lshCandidatePairs) — here it demonstrates the
    * verify operator itself. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, threshold: Double): DataFrame = {
    val withSh = df.select(col(blockCol).as("block"), col(idCol),
      shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col("block"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("block"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 32-bit SimHash as a bit string, from md5 nibbles of each token:
    * bit i is the majority vote of nibble i's low bit across tokens.
    * Nibble-parity keeps the construction reproducible in any engine
    * with md5 (the SQL oracle); production would use xxhash64 bits. */
  def simhashBits(df: DataFrame, idCol: String, tokensCol: Column, bits: Int = 32): DataFrame = {
    val tok = df.select(col(idCol), explode(tokensCol).as("tok"))
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
    * recall for hamming distance < bands). */
  def simhashCandidates(sig: DataFrame, idCol: String, bits: Int = 32,
                        bands: Int = 4): DataFrame = {
    val chunk = bits / bands
    val banded = sig.select(col(idCol), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"), substring(col("simhash"), b * chunk + 1, chunk).as("chunk"))
    }: _*)).as("bc")).select(col(idCol), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("chunk"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "chunk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }
}
