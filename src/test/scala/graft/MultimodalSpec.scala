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
