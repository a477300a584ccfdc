package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata structs riding alongside. The
  * Spark-side shape — schema, partitioning, batch-wise processing — is real
  * and tested; the codec step is STUBBED (this container has no image/audio
  * libraries) behind [[FakeCodec]], a deterministic stand-in that a real
  * deployment replaces with a JNI/codec call inside the same
  * `mapPartitions` batch loop.
  */
object Multimodal {

  /** Metadata schema for a decoded image payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** The codec contract [[decodeImages]] batches over: payload bytes →
    * (width, height, channels, format). Implementations must be
    * Serializable — they ship to executors inside the mapPartitions
    * closure. */
  trait PayloadCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, String)
  }

  /** ======== STUB ========
    * Deterministic fake decoder: "decodes" a payload into plausible image
    * metadata derived from the byte length via fixed multiplicative mixers.
    * Chosen over a hash precisely so an external SQL oracle can recompute
    * every field from `octet_length(payload)` — the decode itself is the
    * sanctioned stub, the verifiable plumbing is the contract (q54 keeps
    * this codec so its DuckDB oracle stays exact). [[ImageIoCodec]] is the
    * real-decode implementation of the same contract. */
  object FakeCodec extends PayloadCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, String) = {
      val len = payload.length.toLong
      val w = 64 + ((len * 2654435761L) % 1856L).toInt   // 64..1919
      val ht = 64 + ((len * 40503L) % 1016L).toInt       // 64..1079
      val ch = if ((len * 7919L) % 4L == 0L) 1 else 3
      val fmt = if (len % 2L == 0L) "fake/png" else "fake/jpeg"
      (w, ht, ch, fmt)
    }
  }

  /** Real decoder over the same contract: JDK ImageIO (PNG/JPEG/GIF/BMP —
    * no external libraries). Reads dimensions from the header reader and
    * channel count from the decoded raster; undecodable bytes throw rather
    * than fabricate metadata (corrupt media must surface in a pipeline, not
    * pass silently as plausible rows). MultimodalSpec drives it end-to-end
    * through [[decodeImages]] over synthetic in-memory PNGs. */
  object ImageIoCodec extends PayloadCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, String) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable payload: no ImageIO reader claims it")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val img = reader.read(0)
          (img.getWidth, img.getHeight, img.getRaster.getNumBands,
            "image/" + reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of `text` stand in for a
    * real media blob in the test corpus). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Attach a REAL PNG payload: a deterministic synthetic image per row,
    * sized `16 + id % 48` × `16 + id % 32` (3-band RGB), PNG-encoded with
    * JDK ImageIO inside the same mapPartitions batch loop a real ingest
    * uses. Paired with [[ImageIoCodec]] this closes the encode→bytes→decode
    * loop through an actual codec, while the METADATA stays formula-derived
    * — which is what lets a SQL oracle check the decoded values exactly
    * (q145). Requires a `doc_id` long column. */
  def withSyntheticPng(docs: DataFrame): DataFrame = {
    val outSchema = StructType(docs.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val enc = Encoders.row(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val w = 16 + (id % 48L).toInt
        val h = 16 + (id % 32L).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = img.createGraphics()
        try {
          g.setColor(new java.awt.Color((id % 256L).toInt, 64, 128))
          g.fillRect(0, 0, w, h)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Attach a 32×32 grayscale PATTERN PNG per row: pixel
    * g(x, y, id) = ((id div 4)·31 + 7x + 13y) mod 256, plus a tiny
    * perturbation (+ id mod 4 at the origin pixel) — so ids sharing
    * id div 4 are NEAR-duplicate images, the perceptual-dedup fixture.
    * Encoded through real JDK ImageIO; PNG is lossless, so every decoded
    * sample equals the formula exactly — which is what lets a SQL oracle
    * recompute [[imageAHashBits]] without decoding anything (the q145
    * trick, extended from metadata to pixels). */
  def withPatternPng(docs: DataFrame): DataFrame = {
    val outSchema = StructType(docs.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val enc = Encoders.row(outSchema)
    val idIdx = docs.schema.fieldIndex("doc_id")
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val img = new java.awt.image.BufferedImage(
          32, 32, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val g = ((((id / 4) * 31 + 7L * x + 13L * y) % 256) +
              (if (x == 0 && y == 0) id % 4 else 0L)).toInt % 256
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) of each payload image, decoded through
    * real ImageIO at the sanctioned codec boundary: grayscale samples,
    * 8×8 blocks of 4×4 pixels, each block's floor-average compared to the
    * whole image's floor-average — emitted as a 64-char '0'/'1' string in
    * (cy, cx) order (a string, not a Long: bit 63 would be sign-ambiguous
    * across engines). Requires 32×32 payloads ([[withPatternPng]]);
    * non-32×32 images throw rather than hash garbage. All integer floors,
    * so two engines computing from the same pixels agree bit-for-bit. */
  def imageAHashBits(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(docs.schema.fields :+
      StructField("phash", StringType, nullable = false))
    val enc = Encoders.row(outSchema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null && img.getWidth == 32 && img.getHeight == 32,
            "imageAHashBits: expected a decodable 32x32 image")
          val gray = Array.ofDim[Long](32, 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val rgb = img.getRGB(x, y)
              gray(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3L
              x += 1
            }
            y += 1
          }
          val total = gray.map(_.sum).sum
          val mean = total / 1024L
          val sb = new StringBuilder(64)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              var s = 0L
              var by = 0
              while (by < 4) {
                var bx = 0
                while (bx < 4) { s += gray(cy * 4 + by)(cx * 4 + bx); bx += 1 }
                by += 1
              }
              sb.append(if (s / 16L >= mean) '1' else '0')
              cx += 1
            }
            cy += 1
          }
          Row.fromSeq(r.toSeq :+ sb.toString)
        }
      }
    }(enc)
  }

  /** Payload byte length — pure expression, pushes down. */
  def payloadBytes(payload: Column): Column = octet_length(payload).cast("long")

  /** Decode payloads partition-wise in fixed-size batches (the Scala
    * analogue of a pandas-UDF batch loop: amortizes codec init per batch,
    * never materializes a partition in memory). Appends `width/height/
    * channels/format` columns. */
  def decodeImages(docs: DataFrame, batchSize: Int = 64,
      codec: PayloadCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(docs.schema.fields ++ imageMetaSchema.fields)
    val enc = Encoders.row(outSchema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one codec-context per batch in a real implementation
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val (w, h, c, f) = codec.decode(bytes)
          Row.fromSeq(r.toSeq ++ Seq(w, h, c, f))
        }
      }
    }(enc)
  }

  // ---------- audio ------------------------------------------------------

  /** Metadata schema for a decoded audio payload. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("audio_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("audio_format", StringType, nullable = false)))

  /** Audio analogue of [[PayloadCodec]]: payload bytes →
    * (sample_rate, channels, frames, format). */
  trait AudioCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Long, String)
  }

  /** ======== STUB ========
    * Deterministic fake audio decoder (same design as [[FakeCodec]]): every
    * field derives from the byte length via fixed mixers so an external SQL
    * oracle recomputes them from `octet_length(payload)` alone — the decode
    * is the sanctioned stub, the batch plumbing is the tested contract.
    * [[WavCodec]] is the real-decode implementation. */
  object FakeAudioCodec extends AudioCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long, String) = {
      val len = payload.length.toLong
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      val sr = rates(((len * 2654435761L) % 5L).toInt)
      val ch = if ((len * 7919L) % 3L == 0L) 1 else 2
      val frames = len * 4L + 1000L
      val fmt = if (len % 2L == 0L) "fake/wav" else "fake/flac"
      (sr, ch, frames, fmt)
    }
  }

  /** Real decoder over the same contract: JDK `javax.sound.sampled` (WAV /
    * AU / AIFF — no external libraries, parity with [[ImageIoCodec]]).
    * Header-only parse; undecodable bytes throw rather than fabricate
    * metadata. MultimodalSpec drives it through [[decodeAudio]] over
    * synthetic in-memory WAVs. */
  object WavCodec extends AudioCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long, String) = {
      val in = new java.io.ByteArrayInputStream(payload)
      val aff =
        try javax.sound.sampled.AudioSystem.getAudioFileFormat(in)
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              "undecodable payload: no audio reader claims it", e)
        }
      val f = aff.getFormat
      (f.getSampleRate.toInt, f.getChannels, aff.getFrameLength.toLong,
        "audio/" + aff.getType.toString.toLowerCase(java.util.Locale.ROOT))
    }
  }

  /** Batch-wise audio decode — same mapPartitions shape as
    * [[decodeImages]]; appends `sample_rate/audio_channels/n_frames/
    * audio_format`. */
  def decodeAudio(docs: DataFrame, batchSize: Int = 64,
      codec: AudioCodec = FakeAudioCodec): DataFrame = {
    val outSchema = StructType(docs.schema.fields ++ audioMetaSchema.fields)
    val enc = Encoders.row(outSchema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val (sr, ch, fr, fmt) = codec.decode(bytes)
          Row.fromSeq(r.toSeq ++ Seq(sr, ch, fr, fmt))
        }
      }
    }(enc)
  }

  /** Duration in milliseconds from decoded audio metadata — integral
    * division (`div`), exact cross-engine (a plain `/` on longs is DOUBLE
    * division in Spark — truncation of an inexact quotient can differ from
    * an engine's integer divide). */
  def audioDurationMs(nFrames: Column, sampleRate: Column): Column =
    call_function("div", nFrames * 1000L, sampleRate)

  /** Fixed-length audio windowing plan: `windowMs`-sized chunk starts (in
    * frames) over the clip — the seek plan a feature extractor schedules
    * on; pure integer arithmetic (ceil via `(a + b - 1) div b`),
    * SQL-mirrorable. Capped at `maxWindows`. */
  def audioWindowStarts(nFrames: Column, sampleRate: Column,
      windowMs: Int, maxWindows: Int = 16): Column = {
    val winFrames = call_function("div", sampleRate.cast("long") * windowMs, lit(1000L))
    val n = greatest(least(
      call_function("div", nFrames + winFrames - 1L, winFrames),
      lit(maxWindows.toLong)), lit(1L))
    transform(sequence(lit(0L), n - 1), i => i * winFrames)
  }

  // ---------- video ------------------------------------------------------

  /** Metadata schema for a decoded video payload. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("v_width", IntegerType, nullable = false),
    StructField("v_height", IntegerType, nullable = false),
    StructField("v_frames", IntegerType, nullable = false),
    StructField("fps_milli", IntegerType, nullable = false), // fps × 1000
    StructField("video_format", StringType, nullable = false)))

  /** Video analogue of [[PayloadCodec]]: payload bytes →
    * (width, height, frames, fps×1000, format). */
  trait VideoCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int, String)
  }

  /** ======== STUB ========
    * Deterministic fake video decoder ([[FakeCodec]] design: every field
    * from the byte length, SQL-recomputable). */
  object FakeVideoCodec extends VideoCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int, String) = {
      val len = payload.length.toLong
      val w = 160 + ((len * 2654435761L) % 1760L).toInt
      val ht = 120 + ((len * 40503L) % 960L).toInt
      val frames = 24 + ((len * 7919L) % 2400L).toInt
      val fpsMilli = if (len % 2L == 0L) 24000 else 29970
      (w, ht, frames, fpsMilli, "fake/mp4")
    }
  }

  /** Real multi-frame decoder over the same contract: animated GIF via JDK
    * ImageIO (the one multi-frame container the JDK decodes natively —
    * parity with [[ImageIoCodec]]/[[WavCodec]]). Frame count from
    * `getNumImages(allowSearch = true)`; GIF carries no global fps, so
    * `fps_milli` is 0 (per-frame delays live in stream metadata a real
    * pipeline would read). Undecodable bytes throw. */
  object GifCodec extends VideoCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int, String) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable payload: no ImageIO reader claims it")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          require(reader.getFormatName.equalsIgnoreCase("gif"),
            s"not a multi-frame container: ${reader.getFormatName}")
          (reader.getWidth(0), reader.getHeight(0), reader.getNumImages(true), 0,
            "video/gif")
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Batch-wise video decode — same mapPartitions shape as
    * [[decodeImages]]/[[decodeAudio]]. */
  def decodeVideo(docs: DataFrame, batchSize: Int = 64,
      codec: VideoCodec = FakeVideoCodec): DataFrame = {
    val outSchema = StructType(docs.schema.fields ++ videoMetaSchema.fields)
    val enc = Encoders.row(outSchema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](payloadIdx)
          val (w, h, fr, fps, fmt) = codec.decode(bytes)
          Row.fromSeq(r.toSeq ++ Seq(w, h, fr, fps, fmt))
        }
      }
    }(enc)
  }

  /** Evenly spaced frame indices for sampling `n` frames of a clip —
    * integer arithmetic over the decoded frame count (unlike
    * [[frameSampleOffsets]], which seeks bytes of an opaque payload).
    * Clips shorter than `n` sample every frame once; a zero-frame clip
    * samples nothing (guarded explicitly — `sequence(0, -1)` would count
    * DOWN, not return empty). */
  def frameIndexSample(vFrames: Column, n: Int): Column =
    when(vFrames >= n,
      transform(sequence(lit(0), lit(n - 1)),
        i => call_function("div", i.cast("long") * vFrames, lit(n.toLong))))
      .when(vFrames > 0, sequence(lit(0L), vFrames.cast("long") - 1))
      .otherwise(array().cast("array<long>"))

  /** Resize planning: scales metadata to fit a bounding box, preserving
    * aspect ratio (real resize happens in the codec; the plan is what the
    * pipeline schedules on). */
  def resizePlan(width: Column, height: Column, maxDim: Int): Column = {
    val scale = least(lit(maxDim) / greatest(width, height).cast("double"), lit(1.0))
    struct(
      floor(width * scale).cast("int").as("width"),
      floor(height * scale).cast("int").as("height"))
  }

  /** Frame sampling for video-like payloads: n evenly spaced byte offsets
    * (stand-ins for frame indices) as an array column. Integer offsets
    * (floor of the even split), so downstream consumers can seek directly. */
  def frameSampleOffsets(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => floor((i * payloadBytes(payload)) / n).cast("long"))
}
