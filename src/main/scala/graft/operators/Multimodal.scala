package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with a typed metadata struct alongside; decode / feature
  * extraction runs per-partition over the bytes.
  *
  * The IMAGE path is fully real: [[decodeImage]]/[[resizeImage]] run
  * `javax.imageio` (JDK-pure — BMP/PNG/GIF/JPEG/WBMP) inside
  * `mapPartitions`, so decode → resample → re-encode → metadata is
  * end-to-end against actual pixels. The AUDIO path is fully real too:
  * [[decodeAudio]]/[[downsampleAudio]] run `javax.sound.sampled`
  * (JDK-pure WAV/AIFF/AU PCM) — decode → decimate → re-encode against
  * actual samples. Only VIDEO feature extraction stays STUBBED
  * (`fakeDecode`/`stubEmbed`: no JVM-pure video codec exists and this
  * container has no native media libs); the partition-batched plumbing
  * around the stubs is real and a deployment swaps the body (JavaCV,
  * ONNX runtime, …) without touching the plan shape.
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

  // ---- REAL image codec path (JDK-pure javax.imageio) ----

  /** Decode image bytes: (width, height, bands), or None if the bytes
    * are not a decodable image. ImageIO's JDK readers cover BMP, PNG,
    * GIF, JPEG, WBMP — no external libraries. Note ImageIO.read
    * returns null for an UNRECOGNIZED payload but THROWS for a
    * recognized-then-corrupt one (truncated JPEG, lying BMP header) —
    * both are "not a decodable image" here, never a task failure. A
    * null payload is guarded EXPLICITLY and the catch is narrowed to
    * IOException plus ImageIO's known runtime failure modes — a
    * blanket RuntimeException catch would also swallow genuine code
    * defects (NPEs, codegen bugs) into silent nulls. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null) return None
    javax.imageio.ImageIO.setUseCache(false) // memory streams, no temp files
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map(img => (img.getWidth, img.getHeight, img.getRaster.getNumBands))
    catch { case _: java.io.IOException | _: java.awt.color.CMMException
                 | _: java.awt.image.RasterFormatException
                 | _: IndexOutOfBoundsException | _: NegativeArraySizeException
                 | _: IllegalArgumentException => None }
  }

  /** One BMP ImageWriter per partition: `ImageIO.write` does an SPI
    * registry search per call and (with the default `useCache=true`)
    * spools every image through a TEMP FILE — per-row costs that
    * dominate tiny-image workloads. The writer instance is reused for
    * the whole partition and all streams stay in memory. */
  private def bmpWriter(): javax.imageio.ImageWriter = {
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
  }

  private def writeBmp(writer: javax.imageio.ImageWriter,
                       img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.flush()
    bos.toByteArray
  }

  /** Deterministic 24-bit BMP test/fixture image: pixel (x,y) carries
    * `(31x + 17y + seed) mod 256` across channels, so any engine can
    * predict the DIMENSIONS and exact byte length (BMP: 54-byte header
    * + rows padded to 4 bytes → `54 + (3w+3 & ~3) * h`) while the
    * payload is a genuine decodable image. */
  def syntheticBmp(width: Int, height: Int, seed: Long): Array[Byte] =
    writeBmp(bmpWriter(), syntheticImage(width, height, seed))

  private def syntheticImage(width: Int, height: Int,
                             seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (((x * 31 + y * 17).toLong + seed) % 256).toInt & 0xff
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Attach a synthetic BMP payload (see [[syntheticBmp]]) sized by the
    * given INT columns — the fixture generator for the real-codec path
    * (partition-batched like every other media step). */
  def withSyntheticBmp(df: DataFrame, widthCol: String, heightCol: String,
                       seedCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val (wi, hi, si) = (df.schema.fieldIndex(widthCol),
      df.schema.fieldIndex(heightCol), df.schema.fieldIndex(seedCol))
    df.mapPartitions { rows =>
      val writer = bmpWriter() // one encoder instance per partition
      rows.map { r =>
        val bmp = writeBmp(writer,
          syntheticImage(r.getInt(wi), r.getInt(hi), r.getLong(si)))
        Row.fromSeq(r.toSeq :+ bmp)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  // ---- REAL audio codec path (JDK-pure javax.sound.sampled) ----

  /** Deterministic 16-bit mono little-endian PCM WAV: sample i is
    * `((31·i + seed) mod 65536) − 32768`, behind a canonical 44-byte
    * RIFF header — so `byte_len = 44 + 2·n` and every sample value is
    * predictable by the SQL oracle, while the payload is a genuine WAV
    * that `javax.sound.sampled` (and any other reader) decodes. */
  def syntheticWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                   // PCM
      .putShort(1)                   // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)        // byte rate
      .putShort(2)                   // block align
      .putShort(16)                  // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((31L * i + seed) % 65536L) - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /** Decode audio bytes with the JDK codec into (sample_rate, channels,
    * decoded 16-bit PCM samples) — the codec, not a header offset,
    * locates the data (extra RIFF chunks are its problem) — or None if
    * `javax.sound.sampled` can't read the payload or it isn't 16-bit
    * (corrupt rows must not kill a 100 TB batch). */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = new Array[Short](data.length / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }

  /** Attach a synthetic WAV payload (see [[syntheticWav]]) sized by the
    * given INT columns — fixture generator for the real-codec path. */
  def withSyntheticWav(df: DataFrame, nCol: String, rateCol: String,
                       seedCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val (ni, ri, si) = (df.schema.fieldIndex(nCol),
      df.schema.fieldIndex(rateCol), df.schema.fieldIndex(seedCol))
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+
          syntheticWav(r.getInt(ni), r.getInt(ri), r.getLong(si)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** REAL audio decimation: decode 16-bit mono PCM with the JDK codec,
    * keep every `factor`-th sample, re-encode as canonical WAV —
    * emitting decoded metadata (rate, frames, peak, energy) plus the
    * downsampled payload. Undecodable or non-mono-16-bit payloads pass
    * through with null outputs. One pass, partition-batched. */
  def downsampleAudio(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("n_samples", LongType),
      StructField("peak_abs", IntegerType), StructField("sum_sq", LongType),
      StructField("ds", BinaryType), StructField("ds_samples", LongType),
      StructField("ds_len", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        decodeAudio(bytes) match {
          case Some((rate, 1, samples)) =>
            var peak = 0
            var sumSq = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toInt
              if (math.abs(v) > peak) peak = math.abs(v)
              sumSq += v.toLong * v
              i += 1
            }
            val nOut = (samples.length + factor - 1) / factor
            val out = java.nio.ByteBuffer.allocate(nOut * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            i = 0
            while (i < samples.length) {
              if (i % factor == 0) out.putShort(samples(i))
              i += 1
            }
            val ds = wavWrap(out.array(), rate / factor)
            Row.fromSeq(r.toSeq ++ Seq(rate, samples.length.toLong, peak,
              sumSq, ds, nOut.toLong, ds.length.toLong))
          case _ =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Canonical 44-byte WAV header around raw 16-bit mono PCM bytes. */
  private def wavWrap(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
    buf.put(pcm)
    buf.array()
  }

  /** REAL image resize: ImageIO decode → Graphics2D resample to
    * `1/denom` scale (min 1 px) → BMP re-encode, emitting the resized
    * payload plus decoded-and-resized dimensions. Non-image payloads
    * pass through with null outputs instead of failing the batch (the
    * 100 TB reality: corrupt rows must not kill the job). One decoder
    * graph per partition, rows streamed. */
  def resizeImage(df: DataFrame, payloadCol: String, denom: Int): DataFrame = {
    require(denom >= 1, "denom must be >= 1")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("resized", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType),
      StructField("resized_len", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val writer = bmpWriter() // one encoder instance per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // read returns null for unrecognized bytes but THROWS for a
        // recognized-then-corrupt payload — both are pass-through-null
        // rows, per the corrupt-rows-must-not-kill-the-batch contract.
        // Null payloads are guarded explicitly; the catch is narrowed
        // to ImageIO's known failure modes so genuine code defects
        // still fail the task instead of becoming silent null rows.
        val decoded =
          if (bytes == null) null
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException | _: java.awt.color.CMMException
                       | _: java.awt.image.RasterFormatException
                       | _: IndexOutOfBoundsException
                       | _: NegativeArraySizeException
                       | _: IllegalArgumentException => null }
        decoded match {
          case null =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, null))
          case img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (rw, rh) = (math.max(w / denom, 1), math.max(h / denom, 1))
            val out = new java.awt.image.BufferedImage(
              rw, rh, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, rw, rh, null)
            g.dispose()
            val enc = writeBmp(writer, out)
            Row.fromSeq(r.toSeq ++ Seq(w, h, img.getRaster.getNumBands,
              enc, rw, rh, enc.length.toLong))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
