package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Multimodal plumbing: payload column, batch decode (stubbed codec),
  * resize planning, frame sampling. The FakeCodec arithmetic is the
  * sanctioned stub; these tests pin its determinism and the Spark-side
  * contract (schema, scalar-sortable projection, batch boundaries). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("FakeCodec is deterministic and SQL-recomputable from byte length") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (w, h, c, f) = Multimodal.FakeCodec.decode(payload)
    assert((w, h, c, f) == Multimodal.FakeCodec.decode(payload.clone()))
    val len = payload.length.toLong
    assert(w == 64 + ((len * 2654435761L) % 1856L).toInt)
    assert(h == 64 + ((len * 40503L) % 1016L).toInt)
    assert(c == (if ((len * 7919L) % 4L == 0L) 1 else 3))
    assert(f == (if (len % 2L == 0L) "fake/png" else "fake/jpeg"))
    assert(w >= 64 && w < 1920 && h >= 64 && h < 1080)
  }

  test("decodeImages appends metadata columns and survives odd batch sizes") {
    val docs = (0 until 7).map(i => (i.toLong, "x" * (i + 1))).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImages(Multimodal.withPayload(docs), batchSize = 3)
    assert(decoded.columns.takeRight(4).toSeq == Seq("width", "height", "channels", "format"))
    val rows = decoded.orderBy($"doc_id").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val len = r.getAs[Array[Byte]]("payload").length.toLong
      assert(r.getAs[Int]("width") == 64 + ((len * 2654435761L) % 1856L).toInt)
    }
  }

  test("ImageIoCodec decodes real PNGs through the same decodeImages plumbing") {
    // tiny synthetic PNGs, in memory: (w, h, color?) triples
    def png(w: Int, h: Int, gray: Boolean): Array[Byte] = {
      val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val img = new java.awt.image.BufferedImage(w, h, t)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val specs = Seq((7, 5, false), (16, 9, false), (3, 11, true))
    val docs = specs.zipWithIndex
      .map { case ((w, h, g), i) => (i.toLong, png(w, h, g)) }
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodeImages(docs, batchSize = 2, codec = Multimodal.ImageIoCodec)
      .orderBy($"doc_id").collect()
    specs.zip(decoded).foreach { case ((w, h, gray), r) =>
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == (if (gray) 1 else 3))
      assert(r.getAs[String]("format") == "image/png")
    }
    // corrupt bytes must throw, not fabricate metadata
    intercept[Exception] { Multimodal.ImageIoCodec.decode("not an image".getBytes) }
  }

  test("WavCodec decodes real WAVs through the same decodeAudio plumbing") {
    // tiny synthetic PCM WAVs, in memory: (sampleRate, channels, frames)
    def wav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i * 31) & 0xff).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val specs = Seq((8000, 1, 800), (44100, 2, 441), (16000, 1, 1600))
    val docs = specs.zipWithIndex
      .map { case ((r, c, f), i) => (i.toLong, wav(r, c, f)) }
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodeAudio(docs, batchSize = 2, codec = Multimodal.WavCodec)
      .orderBy($"doc_id").collect()
    specs.zip(decoded).foreach { case ((rate, ch, frames), r) =>
      assert(r.getAs[Int]("sample_rate") == rate)
      assert(r.getAs[Int]("audio_channels") == ch)
      assert(r.getAs[Long]("n_frames") == frames.toLong)
      assert(r.getAs[String]("audio_format") == "audio/wave")
    }
    // corrupt bytes must throw, not fabricate metadata
    intercept[Exception] { Multimodal.WavCodec.decode("not audio".getBytes) }
  }

  test("GifCodec decodes real animated GIFs through the same decodeVideo plumbing") {
    // tiny synthetic animated GIFs, in memory: (w, h, frames) triples
    def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until w).foreach(x => (0 until h).foreach(y =>
          img.setRGB(x, y, (x * 31 + y * 17 + f * 7) & 0xffffff)))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      bos.toByteArray
    }
    val specs = Seq((8, 6, 3), (5, 5, 1), (12, 4, 7))
    val docs = specs.zipWithIndex
      .map { case ((w, h, f), i) => (i.toLong, gif(w, h, f)) }
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodeVideo(docs, batchSize = 2, codec = Multimodal.GifCodec)
      .orderBy($"doc_id").collect()
    specs.zip(decoded).foreach { case ((w, h, frames), r) =>
      assert(r.getAs[Int]("v_width") == w && r.getAs[Int]("v_height") == h)
      assert(r.getAs[Int]("v_frames") == frames)
      assert(r.getAs[String]("video_format") == "video/gif")
    }
    // corrupt bytes must throw, not fabricate metadata; single-frame
    // stills are fine (a 1-frame GIF is a degenerate clip), but a PNG is
    // not a multi-frame container and must be rejected
    intercept[Exception] { Multimodal.GifCodec.decode("not a video".getBytes) }
  }

  test("frameIndexSample is exact integer arithmetic, short clips take every frame") {
    val docs = Seq((1L, "x" * 40), (2L, "y" * 7)).toDF("doc_id", "text")
    val d = Multimodal.decodeVideo(Multimodal.withPayload(docs))
    val rows = d.select($"doc_id", $"v_frames",
        Multimodal.frameIndexSample($"v_frames", 8).as("idx"))
      .orderBy($"doc_id").collect()
    rows.foreach { r =>
      val nf = r.getAs[Int]("v_frames").toLong
      val expected =
        if (nf >= 8) (0 until 8).map(i => i * nf / 8)
        else 0L until nf
      assert(r.getAs[scala.collection.Seq[Long]]("idx") == expected)
    }
    // the short-clip branch directly (FakeVideoCodec's floor is 24 frames)
    val short = Seq(Tuple1(3)).toDF("v_frames")
      .select(Multimodal.frameIndexSample($"v_frames", 8).as("idx")).head()
    assert(short.getAs[scala.collection.Seq[Long]]("idx") == Seq(0L, 1L, 2L))
  }

  test("audio duration and window plan are exact integer arithmetic") {
    val docs = Seq((1L, "x" * 50), (2L, "y" * 3)).toDF("doc_id", "text")
    val d = Multimodal.decodeAudio(Multimodal.withPayload(docs))
    val rows = d.select($"doc_id", $"sample_rate", $"n_frames",
        Multimodal.audioDurationMs($"n_frames", $"sample_rate").as("ms"),
        Multimodal.audioWindowStarts($"n_frames", $"sample_rate", 250).as("ws"))
      .orderBy($"doc_id").collect()
    rows.foreach { r =>
      val sr = r.getAs[Int]("sample_rate").toLong
      val nf = r.getAs[Long]("n_frames")
      assert(r.getAs[Long]("ms") == nf * 1000L / sr)
      val winFrames = sr * 250L / 1000L
      val nWin = math.max(math.min((nf + winFrames - 1) / winFrames, 16L), 1L)
      assert(r.getAs[scala.collection.Seq[Long]]("ws") ==
        (0L until nWin).map(_ * winFrames))
    }
  }

  test("resizePlan preserves aspect ratio and never upscales") {
    val df = Seq((1920, 1080), (100, 50), (256, 256), (64, 1079)).toDF("w", "h")
    val out = df.select($"w", $"h",
        Multimodal.resizePlan($"w", $"h", 256).as("r"))
      .select($"w", $"h", $"r.width".as("rw"), $"r.height".as("rh"))
      .collect()
    out.foreach { r =>
      val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(rw <= 256 && rh <= 256)
      assert(rw <= w && rh <= h) // never upscale
      val scale = math.min(256.0 / math.max(w, h), 1.0)
      assert(rw == math.floor(w * scale).toInt && rh == math.floor(h * scale).toInt)
    }
  }

  test("frameSampleOffsets yields n integer offsets evenly splitting the payload") {
    val df = Seq(("a" * 10), ("b" * 3)).toDF("text")
    val out = Multimodal.withPayload(df)
      .select(Multimodal.frameSampleOffsets($"payload", 4).as("fr"),
        octet_length($"payload").as("len"))
      .collect()
    out.foreach { r =>
      val fr = r.getAs[scala.collection.Seq[Long]]("fr")
      val len = r.getAs[Int]("len").toLong
      assert(fr == (0 until 4).map(i => i * len / 4))
    }
  }

  test("aHash through the real PNG round trip equals the pixel-formula replay; near-dup ids cluster") {
    val docs = (0L until 20L).toDF("doc_id")
    val got = Multimodal.imageAHashBits(Multimodal.withPatternPng(docs))
      .select("doc_id", "phash")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // formula replay — the PNG encode→ImageIO decode loop must be exact
    def replay(id: Long): String = {
      val g = Array.tabulate(32, 32) { (y, x) =>
        (((id / 4) * 31 + 7L * x + 13L * y) % 256 +
          (if (x == 0 && y == 0) id % 4 else 0L)) % 256
      }
      val mean = g.map(_.sum).sum / 1024L
      (for (cy <- 0 until 8; cx <- 0 until 8) yield {
        val s = (for (by <- 0 until 4; bx <- 0 until 4)
          yield g(cy * 4 + by)(cx * 4 + bx)).sum
        if (s / 16L >= mean) '1' else '0'
      }).mkString
    }
    (0L until 20L).foreach(id => assert(got(id) === replay(id), s"id $id"))
    // the perturbed siblings of each id div 4 group land on one hash here
    // (the +3 max nudge moves no block across its threshold for this
    // pattern), so the near-dup fixture clusters in groups of 4
    assert(got.groupBy(_._2).values.map(_.size).toSeq.sorted === Seq(4, 4, 4, 4, 4))
  }
}
