package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators whose Spark-side shape (schema, partitioning, batch iteration)
  * is real while the codec itself is a deterministic STUB — the container
  * has no image/audio libraries, so `decodePayload` parses our synthetic
  * header format in place of libjpeg/ffmpeg. Swapping in a real codec
  * changes only that one function.
  *
  * Scale posture: payloads never pass through a shuffle wider than their
  * key — feature extraction is mapPartitions (no grouping), and downstream
  * aggregations run on the extracted compact features, not the blobs.
  */
object Multimodal {

  final case class Media(id: Long, modality: String, payload: Array[Byte])
  final case class MediaMeta(id: Long, modality: String, width: Int, height: Int,
      sampleRate: Int, nFrames: Int, nBytes: Int)
  final case class MediaFeatures(id: Long, modality: String, meta: MediaMeta,
      features: Array[Double])

  /** Deterministic synthetic payload: 19-byte header
    * [MGF1][modality:1][width:4][height:4][rate:4][frames:4] + body. */
  def encodePayload(id: Long, modality: String): Array[Byte] = {
    val width = 64 + (id % 64).toInt
    val height = 48 + (id % 48).toInt
    val rate = if (modality == "audio") 16000 else 0
    val frames = if (modality == "video") 24 + (id % 8).toInt else 1
    val body = Array.tabulate[Byte](32)(i => ((id * 31 + i * 7) % 251).toByte)
    val buf = ByteBuffer.allocate(4 + 1 + 16 + body.length).order(ByteOrder.BIG_ENDIAN)
    buf.put("MGF1".getBytes("ASCII"))
    buf.put(modality.headOption.getOrElse('i').toByte)
    buf.putInt(width).putInt(height).putInt(rate).putInt(frames)
    buf.put(body)
    buf.array()
  }

  /** STUB decoder standing in for libjpeg/ffmpeg: parses the MGF1 header.
    * Throws on bad magic — corrupt payloads must fail loudly, not corrupt
    * downstream features. */
  def decodePayload(id: Long, modality: String, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 21 && new String(payload, 0, 4, "ASCII") == "MGF1",
      s"bad magic for media $id")
    val buf = ByteBuffer.wrap(payload, 5, 16).order(ByteOrder.BIG_ENDIAN)
    MediaMeta(id, modality, buf.getInt, buf.getInt, buf.getInt, buf.getInt,
      payload.length)
  }

  /** Deterministic per-payload feature vector (stub for an embedding model):
    * byte-histogram moments over the body. */
  def extractFeatures(meta: MediaMeta, payload: Array[Byte]): Array[Double] = {
    val body = payload.drop(21)
    val n = math.max(body.length, 1)
    val mean = body.map(b => (b & 0xff).toDouble).sum / n
    val m2 = body.map(b => math.pow((b & 0xff) - mean, 2)).sum / n
    Array(meta.width.toDouble, meta.height.toDouble, mean, math.sqrt(m2))
  }

  /** Build a synthetic media table from any id column (the test harness's
    * stand-in for `spark.read.format("binaryFile")`). */
  def synthesize(ids: DataFrame): Dataset[Media] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("id").cast("long")).as[Long].map { id =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      Media(id, modality, encodePayload(id, modality))
    }
  }

  /** The decode + feature-extract operator: partition-local, no shuffle of
    * blobs; this is where `mapInPandas`-style batched codecs would plug in
    * on a Python stack — here a Scala mapPartitions with the same contract
    * (iterator in, iterator out, no materialization of the whole batch). */
  def decodeAndFeaturize(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val meta = decodePayload(m.id, m.modality, m.payload)
        MediaFeatures(m.id, m.modality, meta, extractFeatures(meta, m.payload))
      }
    }
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index as
    * (id, frame_idx) without touching payload bytes (metadata-driven). */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    meta.toDF()
      .filter(col("modality") === "video")
      .select(col("id"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(stride))).as("frame_idx"))
  }
}
