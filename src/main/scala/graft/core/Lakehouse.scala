package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a scale-factor directory of parquet tables.
  *
  * Mirrors the reference's lakehouse layout (one columnar file-set per
  * table, scanned lazily so the optimizer pushes predicates/projections
  * into the reader — reference: berdl/berdl/query/query_pangenome_local.py:17-29,
  * berdl/berdl/query/query_ontology_local.py:41-42).
  *
  * At 100 TB the per-table paths would be directories of many parquet
  * files (optionally hive-partitioned by the hot filter key, e.g.
  * `gtdb_species_clade_id` — SURVEY §4.2); `spark.read.parquet` handles
  * both a single file and a partitioned directory transparently, so this
  * registry is the single place a deployment re-points at real storage.
  */
object Lakehouse {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(tableNames.contains(name), s"unknown table: $name")
    if (name == "events") {
      // The events table's `ts` physical type has varied across fixture
      // generations: TIMESTAMP(NANOS) (which Spark's micro-precision
      // TimestampType cannot represent — PARQUET_TYPE_ILLEGAL — so it
      // arrives as a raw epoch-nanos Long under the nanosAsLong conf)
      // and TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads
      // as TIMESTAMP_NTZ). Normalize BOTH to one exact epoch-micros
      // `ts_us` Long so every downstream query is encoding-agnostic:
      //   - Long (nanos-as-long)  → `div 1000` (integer division; a
      //     double round-trip would lose precision at 1e18). Matches
      //     DuckDB, whose reader also truncates NANOS to micros.
      //   - TIMESTAMP_NTZ / TIMESTAMP → cast to session-tz timestamp
      //     then `unix_micros`. Sessions here pin
      //     spark.sql.session.timeZone=UTC, which matches DuckDB's
      //     treatment of naive parquet timestamps as UTC-epoch.
      //
      // The nanos conf is session-wide and consulted at plan time, so it
      // can't be set-and-restored around a lazy read; set it only when
      // the user hasn't EXPLICITLY chosen a value (an explicit 'false'
      // is respected — a nanos read then fails with Spark's own
      // PARQUET_TYPE_ILLEGAL, the honest outcome of that choice). With
      // the conf on, a micros file still loads as a timestamp type, so
      // the dtype branch below sees exactly what the file contains.
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      if (!spark.sessionState.conf.getAllConfs.contains(nanosKey))
        spark.conf.set(nanosKey, "true")
      import org.apache.spark.sql.functions.{col, expr, unix_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      val tsUs = raw.schema("ts").dataType match {
        case LongType         => expr("ts div 1000")
        case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
        case TimestampType    => unix_micros(col("ts"))
        case other => throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected nanos-as-Long, TIMESTAMP_NTZ, or TIMESTAMP")
      }
      raw.withColumn("ts_us", tsUs).drop("ts")
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Event timestamp as TimestampType from the exact epoch-micros column. */
  def eventTime(tsUs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(tsUs)

  /** Register every table as a temp view so `spark.sql` passthrough
    * (the reference's remote SQL surface, query_pangenome_berdl.py:92-153)
    * works against the same registry. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** Persist a fact table bucketed (+ sorted) on its join key (SURVEY
    * §4.2: the 1B-row junction joins). Two tables bucketed on the same
    * key with the same bucket count equi-join with NO exchange on
    * either side — at 100 TB that deletes the dominant shuffle of every
    * junction join. Requires a catalog table (`saveAsTable`); bucket
    * count sizes each bucket to fit executor memory at target scale. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
