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
}
