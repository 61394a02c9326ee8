package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct alongside; decode / feature
  * extraction runs per-partition over the bytes.
  *
  * The Spark-side machinery here — schema, partition-batched decode via
  * `mapPartitions`, metadata struct shape — is real and tested. The
  * codec itself is STUBBED (`fakeDecode`): this container has no image/
  * audio libraries, so the "decoder" derives deterministic dimensions
  * from the byte content. A deployment swaps `fakeDecode` for a real
  * codec (JavaCV, TwelveMonkeys, …) without touching the plan shape.
  */
object Multimodal {

  /** Metadata struct emitted per decoded payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decoder: deterministic pseudo-dimensions from byte stats.
    * Mirrors the arithmetic in the SQL oracle so the plumbing is
    * differentially testable end-to-end. Replace with a real codec. */
  def fakeDecode(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val n = bytes.length.toLong
    ((n, (n * 3 % 640 + 16).toInt, (n * 7 % 480 + 16).toInt, 3))
  }

  /** Attach decoded metadata to a frame with a binary `payloadCol`.
    * Partition-batched: one decoder instance per partition, rows stream
    * through — the shape a real (expensive, JNI-backed) codec needs. */
  def withMediaMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", mediaMetaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec handle)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (len, w, h, c) = fakeDecode(bytes)
        Row.fromSeq(r.toSeq :+ Row(len, w, h, c))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame-sampling plan for (stub) video payloads: one output row per
    * sampled frame index — the explode-shaped plumbing a real frame
    * sampler slots into. */
  def sampleFrames(df: DataFrame, payloadCol: String, everyNth: Int): DataFrame =
    df.withColumn("n_frames", (length(col(payloadCol)) / lit(100)).cast("int") + 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .drop("n_frames")

  /** STUB feature extractor: dim deterministic doubles in [0,1) derived
    * from md5 of the seed-tagged bytes — the same arithmetic the SQL
    * oracle reproduces, so the embed plumbing is differentially
    * testable. A real model (ONNX runtime, JNI encoder) replaces the
    * body; the partition-batched shape (one model handle per partition,
    * rows streamed) is what carries over. */
  def stubEmbed(bytes: Array[Byte], dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      md.reset()
      md.update(bytes)
      md.update(s"#$i".getBytes("UTF-8"))
      val hex = md.digest().take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 1000).toDouble / 1000.0
    }
  }

  /** Embedding column from a binary payload: partition-batched decode +
    * featurize (`mapPartitions`), emitting `array<double>` that feeds
    * straight into the Similarity/Dedup operators — the bytes → features
    * → ANN path of a multimodal training-data pipeline. */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition model handle init would go here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ stubEmbed(bytes, dim).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STUB resize: truncate the payload to `maxBytes` (a real resampler
    * replaces the body; binary-in/binary-out per-partition plumbing and
    * the refreshed metadata struct are the reusable part). */
  def resize(df: DataFrame, payloadCol: String, maxBytes: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType) :+ StructField("resized_len", LongType))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out = bytes.take(maxBytes)
        Row.fromSeq(r.toSeq :+ out :+ out.length.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
