package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-capacity bins (token budget per training sequence) by
  * contiguous fill — bin = floor(running-total-before-this-doc /
  * capacity) within a packing group.
  *
  * Scale shape: packing is per GROUP (shard key, language, source), so
  * the window's sort is bounded by the group, not the corpus — 100 TB
  * packs as thousands of independent group windows, never a global
  * sort. Deterministic: the fill order is the explicit `orderCol`, so
  * the same corpus packs identically on any cluster (and in the SQL
  * oracle). Oversized documents (> capacity) still get their own bin
  * rather than being dropped — the downstream truncation policy is the
  * caller's decision, not the packer's.
  */
object Packing {

  /** Add `bin` (0-based within group) and `bin_offset` (the document's
    * start position inside its bin's token budget — what a writer needs
    * to lay the sequence out) to `df`. */
  def packBins(df: DataFrame, groupCol: String, orderCol: String,
               sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumAfter: Column = sum(col(sizeCol)).over(w)
    val cumBefore = cumAfter - col(sizeCol)
    df.withColumn("bin", floor(cumBefore / capacity).cast("long"))
      .withColumn("bin_offset", (cumBefore % capacity).cast("long"))
  }

  /** Bin-level summary: documents and tokens per (group, bin) — the
    * packing-efficiency report (fill fraction vs capacity). */
  def binStats(packed: DataFrame, groupCol: String, sizeCol: String,
               capacity: Long): DataFrame =
    packed.groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("tokens"))
      .withColumn("fill", col("tokens").cast("double") / capacity)

  /** Deterministic global training-order shuffle: every row gets a
    * `shard` and a dense 1-based `shard_pos` within it, both pure
    * functions of (seed, id) — the same corpus shuffles identically on
    * any cluster, any partitioning, any engine (the hash is the
    * md5-prefix hash the samplers use, portable to the SQL oracle).
    *
    * Scale shape: shard assignment is hash-mod (no global sort, no
    * range exchange); the in-shard position is one window per shard, so
    * pick `nShards` large enough that a shard fits a task's sort buffer
    * (at 100 TB and nShards=100k a shard is ~1 GB). An epoch reader
    * streams shards in any order and rows by `shard_pos` — randomized
    * but reproducible.
    *
    * Seed spelling: a non-empty seed hashes `seed:id`; an EMPTY seed
    * hashes the bare id — the same two spellings [[shardManifest]]
    * uses, so trainingOrder(seed = "") aligns with the DEFAULT
    * manifest (the earlier `":id"` spelling silently aligned with
    * neither manifest form).
    *
    * MIGRATION (round 14): the empty-seed hash changed from `":id"`
    * to the bare id. Any layout exported with seed="" under the old
    * spelling does NOT reproduce — re-running assigns different
    * shard/shard_pos values. Re-export such layouts (or keep reading
    * them with their original manifest); layouts with a non-empty
    * seed are unaffected. */
  def trainingOrder(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val hashKey =
      if (seed.isEmpty) col(idCol).cast("string")
      else concat(lit(seed), lit(":"), col(idCol).cast("string"))
    val h = conv(substring(md5(hashKey), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w))
      .drop("__h")
  }

  /** Dataset-export shard manifest — the ship-the-dataset audit
    * artifact: per hash shard, the row count, payload bytes, and an
    * ORDER-INDEPENDENT content checksum (sum of the rows' md5-prefix
    * hashes mod 10^9 — commutative, so any executor/partition order
    * yields the same digest, and engine-portable so a consumer can
    * re-verify a shard in SQL). Verifying a delivered shard =
    * recompute (rows, bytes, checksum) over the files and compare —
    * no re-download of the whole set, per-shard granularity.
    *
    * To manifest an export laid out by [[trainingOrder]], pass the
    * SAME `seed` — the shard hash then uses trainingOrder's exact
    * `seed:id` spelling and the manifest's shard ids line up with the
    * export's. The default (empty seed) hashes the bare id, the same
    * spelling trainingOrder uses for an empty seed — so the default
    * manifest aligns with an unseeded trainingOrder layout and with
    * no seeded one. */
  def shardManifest(df: DataFrame, idCol: String, payloadCol: String,
                    nShards: Int, seed: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val M = 1000000000L
    val shardKey =
      if (seed.isEmpty) col(idCol).cast("string")
      else concat(lit(seed), lit(":"), col(idCol).cast("string"))
    val rowHash = conv(substring(md5(
      concat(col(idCol).cast("string"), lit("|"), col(payloadCol))), 1, 15), 16, 10)
      .cast("long") % M
    df.select(
      pmod(conv(substring(md5(shardKey), 1, 15), 16, 10)
        .cast("long"), lit(nShards.toLong)).as("shard"),
      length(col(payloadCol)).cast("long").as("__bytes"),
      rowHash.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__bytes")).as("n_bytes"),
        (sum(col("__h")) % M).as("content_hash"))
  }
}
