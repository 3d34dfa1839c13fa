package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / frame-sample run as
  * per-partition batch transforms over the binary payloads (the Scala
  * analogue of arrow-batched Python UDFs: one iterator pass per
  * partition, no per-row driver interaction, schema declared up
  * front).
  *
  * STUB NOTE: this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features from the payload
  * bytes (md5-seeded). The decode internals are the ONLY fake part —
  * the schema, partitioning, batch iteration and column plumbing are
  * the real thing a codec-backed implementation would keep unchanged:
  * swap `decodeStub` for a real decoder and nothing else moves.
  *
  * Scale notes: binary payloads stay columnar in parquet and are never
  * shuffled by these operators (all transforms are narrow maps);
  * feature vectors (small) are what downstream joins/aggregations
  * shuffle. Frame sampling emits (media_id, frame_no, frame_bytes)
  * with explode — still narrow.
  */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  case class MediaMeta(kind: String, declaredBytes: Long)

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  case class MediaFeatures(
      media_id: Long, n_bytes: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** Deterministic fake "decode": md5 the payload, derive 4 feature
    * ints from the digest. ??? -> replace with a real codec. */
  private[operators] def decodeStub(bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(bytes)
    def u16(i: Int): Long = ((h(i) & 0xffL) << 8) | (h(i + 1) & 0xffL)
    (u16(0), u16(2), u16(4), u16(6))
  }

  /** Per-partition batched feature extraction over binary payloads. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition setup cost amortized over the batch (a real
      // decoder would allocate its native context here, once)
      it.map { m =>
        val (f0, f1, f2, f3) = decodeStub(m.bytes)
        MediaFeatures(m.media_id, m.bytes.length.toLong, f0, f1, f2, f3)
      }
    }
  }

  /** Fixed-size frame sampling: split the payload into `frameSize`-byte
    * frames, keep every `everyNth` (narrow op, no shuffle). */
  def frameSample(df: DataFrame, id: Column, bytes: Column,
      frameSize: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(length(bytes) / lit(frameSize.toDouble)).cast("int")
    df.select(id.as("media_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_no"),
        bytes.as("b"))
      .filter(pmod(col("frame_no"), lit(everyNth)) === 0)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        substring(col("b"), col("frame_no") * frameSize + 1, lit(frameSize))
          .as("frame_bytes"))
  }

  /** Column-level feature digest (same md5-derived ints as decodeStub,
    * expressed as codegen'd built-ins — used for the oracle-checked
    * query; decodeStub/mapPartitions is the codec-shaped path). */
  def featureDigestCols(bytes: Column): Seq[Column] = {
    val h = md5(bytes)
    (0 until 4).map { i =>
      val hex = substring(h, i * 4 + 1, 4)
      conv(hex, 16, 10).cast("long").as(s"f$i")
    }
  }
}
