package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("extractFeatures is deterministic and length-faithful over binary payloads") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(3L, "audio", "hello".getBytes("UTF-8"))
    ).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r).toMap
    assert(f(1L).n_bytes == 4 && f(3L).n_bytes == 5)
    // same bytes -> same features; different bytes -> different
    assert((f(1L).f0, f(1L).f1) == ((f(2L).f0, f(2L).f1)))
    assert((f(1L).f0, f(1L).f1) != ((f(3L).f0, f(3L).f1)))
    // features are u16-range
    assert(f.values.forall(m => Seq(m.f0, m.f1, m.f2, m.f3)
      .forall(v => v >= 0 && v < 65536)))
  }

  test("decodeStub matches the codegen'd featureDigestCols path") {
    val media = Seq(Multimodal.MediaRow(7L, "text", "abc".getBytes("UTF-8"))).toDS()
    val viaStub = Multimodal.extractFeatures(media).head()
    val viaCols = media.toDF()
      .select(Multimodal.featureDigestCols(col("bytes")): _*).head()
    assert(viaStub.f0 == viaCols.getAs[Long]("f0"))
    assert(viaStub.f3 == viaCols.getAs[Long]("f3"))
  }

  // --- real fixture bytes for the codec-free decoders ---

  /** 2x2 24-bit uncompressed BMP, rows bottom-up, 2 padding bytes per
    * row. Pixels (BGR): row0 = (10,20,30),(40,50,60); row1 =
    * (70,80,90),(100,110,120). */
  private def bmpFixture: Array[Byte] = {
    val width = 2; val height = 2
    val stride = (width * 3 + 3) / 4 * 4 // 8
    val dataSize = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, data offset
      .putInt(40).putInt(width).putInt(height) // DIB header
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put(Array[Byte](10, 20, 30, 40, 50, 60, 0, 0)) // row + pad
    buf.put(Array[Byte](70, 80, 90, 100, 110, 120, 0, 0))
    buf.array()
  }

  /** 2x1 binary PPM with a header comment; pixels RGB (0,0,0) and
    * (30,60,90). */
  private def ppmFixture: Array[Byte] =
    "P6\n# test comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 30, 60, 90)

  /** Mono 16-bit PCM WAV, 8000 Hz, 4 samples: +100, -100, +300, -300. */
  private def wavFixture: Array[Byte] = {
    val samples = Array[Short](100, -100, 300, -300)
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000) // PCM, mono, 8 kHz
      .putInt(16000).putShort(2).putShort(16) // byte rate, align, bits
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("decodeMedia really decodes BMP/PPM/WAV fixture bytes") {
    val media = Seq(
      Multimodal.MediaRow(1L, "bmp", bmpFixture),
      Multimodal.MediaRow(2L, "ppm", ppmFixture),
      Multimodal.MediaRow(3L, "wav", wavFixture),
      Multimodal.MediaRow(4L, "jpeg", Array[Byte](1, 2, 3)) // stub path
    ).toDS()
    val d = Multimodal.decodeMedia(media).collect()
      .map(r => r.media_id -> r).toMap
    // BMP: 2x2, 3 channels, mean of the 12 pixel bytes (padding
    // excluded) = floor(780/12) = 65
    assert(d(1L).decoded && d(1L).width == 2 && d(1L).height == 2)
    assert(d(1L).channels == 3 && d(1L).n_samples == 4)
    assert(d(1L).mean_value == 65)
    // PPM: 2x1, mean byte = floor(180/6) = 30
    assert(d(2L).decoded && d(2L).width == 2 && d(2L).height == 1)
    assert(d(2L).mean_value == 30)
    // WAV: mono 8kHz, 4 samples, mean |amplitude| = 200
    assert(d(3L).decoded && d(3L).channels == 1)
    assert(d(3L).sample_rate == 8000 && d(3L).n_samples == 4)
    assert(d(3L).mean_value == 200)
    // compressed codec: honest stub, flagged
    assert(!d(4L).decoded && d(4L).n_bytes == 3)
  }

  test("decodeMedia falls back to the stub on corrupt headers") {
    val media = Seq(
      Multimodal.MediaRow(1L, "bmp", Array[Byte]('B', 'M', 1, 2)),
      Multimodal.MediaRow(2L, "ppm", "P6 garbage".getBytes),
      Multimodal.MediaRow(3L, "wav", "RIFFxxxx".getBytes)
    ).toDS()
    assert(Multimodal.decodeMedia(media).collect().forall(!_.decoded))
  }

  test("frameSample splits payloads into strided frames") {
    val df = Seq((1L, "a" * 100)).toDF("id", "payload")
    val frames = Multimodal.frameSample(df, col("id"), col("payload"),
      frameSize = 30, everyNth = 2).collect()
    // 100 bytes -> 4 frames (30,30,30,10), keep frames 0 and 2
    assert(frames.map(_.getAs[Long]("frame_no")).toSet == Set(0L, 2L))
    val f0 = frames.find(_.getAs[Long]("frame_no") == 0L).get
    assert(f0.getAs[String]("frame_bytes").length == 30)
  }
}
