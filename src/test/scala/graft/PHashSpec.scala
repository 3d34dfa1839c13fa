package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Perceptual dHash over real decoded rasters: cross-format
  * invariance (the same image as BMP / PPM / PNG hashes identically —
  * exactly what byte-level dedup cannot see), locality under small
  * edits, and the banded near-dup join. */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  /** 24-bpp bottom-up BMP; pix(x, y) is top-origin gray value. */
  private def bmp24(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le(54L + stride * h, 4)); out.write(le(0L, 4))
    out.write(le(54L, 4))
    out.write(le(40L, 4)); out.write(le(w.toLong, 4)); out.write(le(h.toLong, 4))
    out.write(le(1L, 2)); out.write(le(24L, 2)); out.write(le(0L, 4))
    out.write(le((stride * h).toLong, 4))
    out.write(new Array[Byte](16)) // resolutions + palette fields
    for (row <- h - 1 to 0 by -1) {
      val line = new Array[Byte](stride)
      for (x <- 0 until w) {
        val v = pix(x, row).toByte
        line(x * 3) = v; line(x * 3 + 1) = v; line(x * 3 + 2) = v
      }
      out.write(line)
    }
    out.toByteArray
  }

  private def ppm(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y)
      out.write(v); out.write(v); out.write(v)
    }
    out.toByteArray
  }

  private def png(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // horizontal gradient: every right neighbor cell is brighter
  private val grad = (x: Int, _: Int) => math.min(255, x * 7)
  // same image with the top-left 4x2 cell blasted to white: exactly
  // one dHash comparison flips
  private val gradDent = (x: Int, y: Int) =>
    if (x < 4 && y < 2) 255 else math.min(255, x * 7)
  private val gradRev = (x: Int, _: Int) => math.min(255, (35 - x) * 7)

  test("dHash is identical across BMP / PPM / PNG encodings of the same raster") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "bmp", bmp24(36, 16, grad)),
      Multimodal.MediaRow(2L, "ppm", ppm(36, 16, grad)),
      Multimodal.MediaRow(3L, "png", png(36, 16, grad))).toDS()
    val rows = Multimodal.perceptualHash(media).collect()
      .map(p => p.media_id -> p).toMap
    assert(rows.values.forall(_.decoded))
    // monotone gradient: all 64 comparisons fire -> every bit set
    assert(rows(1L).phash == -1L)
    assert(rows(2L).phash == rows(1L).phash &&
      rows(3L).phash == rows(1L).phash,
      "identical rasters must hash identically across containers")
  }

  test("near-dup pairs: small edit stays within hamming, reversal is not a candidate") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "bmp", bmp24(36, 16, grad)),
      Multimodal.MediaRow(2L, "ppm", ppm(36, 16, grad)),
      Multimodal.MediaRow(3L, "bmp", bmp24(36, 16, gradDent)),
      Multimodal.MediaRow(4L, "bmp", bmp24(36, 16, gradRev)),
      Multimodal.MediaRow(5L, "bin", Array[Byte](1, 2, 3))).toDS()
    val hashes = Multimodal.perceptualHash(media).toDF()
    val pairs = Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical rasters pair at hamming 0; the dented copy pairs with
    // both at hamming 1 (one flipped comparison)
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs((1L, 3L)) == 1L && pairs((2L, 3L)) == 1L)
    // the reversed gradient shares no 16-bit band: not even a candidate
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // the undecodable payload (stub hash) must never enter the join
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L))
    // plan: banded equi-join, never all-pairs
    val plan = Multimodal.phashNearDupPairs(hashes, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hostile payloads degrade to flagged stub hashes") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "bmp", bmp24(6, 4, grad)), // below the grid
      Multimodal.MediaRow(2L, "png", Array[Byte](0x50, 0x4e, 0x47)),
      Multimodal.MediaRow(3L, "ppm", "P6\n999999999 2\n255\n".getBytes("US-ASCII")),
      Multimodal.MediaRow(4L, "flac", new Array[Byte](64))).toDS()
    val rows = Multimodal.perceptualHash(media).collect()
    assert(rows.length == 4)
    assert(rows.forall(!_.decoded))
  }
}
