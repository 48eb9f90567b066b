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
    * byte-histogram moments over the body. Every term is exactly
    * representable (integer bytes, mean with 5 fractional bits, squares
    * under 2^26 significand bits), so the moments are bit-reproducible in
    * any IEEE engine — which is what lets q_media_features oracle this
    * path; explicit multiplication, not math.pow, keeps that guarantee. */
  def extractFeatures(meta: MediaMeta, payload: Array[Byte]): Array[Double] = {
    val body = payload.drop(21)
    val n = math.max(body.length, 1)
    val mean = body.map(b => (b & 0xff).toDouble).sum / n
    val m2 = body.map { b => val dmm = (b & 0xff).toDouble - mean; dmm * dmm }.sum / n
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

  val queries: Seq[graft.QueryDef] = Seq(

    // The multimodal decode path, ORACLE-VERIFIED: synthesize binary
    // payloads from doc ids, run the real bytes-in path (header parse via
    // ByteBuffer, mapPartitions feature extraction — the mapInPandas-
    // shaped contract), and hash-match a pure-arithmetic DuckDB replay of
    // the synthetic format (body byte i = (id·31 + i·7) mod 251; every
    // IEEE term in the moments is exactly representable, see
    // extractFeatures). A drift anywhere in encode→decode→extract breaks
    // the hash. Blobs never shuffle — only the compact features do.
    graft.QueryDef.sql(
      "q_media_features",
      """WITH b AS (
        |  SELECT doc_id AS id,
        |    CAST(SUM((doc_id * 31 + i.i * 7) % 251) AS BIGINT) AS s
        |  FROM documents CROSS JOIN (SELECT UNNEST(RANGE(0, 32)) AS i) i
        |  GROUP BY doc_id),
        |g AS (
        |  SELECT d.doc_id AS id,
        |    SUM(((d.doc_id * 31 + i.i * 7) % 251 - b.s / 32.0)
        |      * ((d.doc_id * 31 + i.i * 7) % 251 - b.s / 32.0)) AS sq
        |  FROM documents d
        |  CROSS JOIN (SELECT UNNEST(RANGE(0, 32)) AS i) i
        |  JOIN b ON b.id = d.doc_id
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id AS id,
        |  CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CAST(64 + d.doc_id % 64 AS BIGINT) AS width,
        |  CAST(48 + d.doc_id % 48 AS BIGINT) AS height,
        |  CAST(CASE WHEN d.doc_id % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT)
        |    AS sample_rate,
        |  CAST(CASE WHEN d.doc_id % 3 = 2 THEN 24 + d.doc_id % 8 ELSE 1 END
        |    AS BIGINT) AS n_frames,
        |  CAST(53 AS BIGINT) AS n_bytes,
        |  CAST(FLOOR((b.s / 32.0) * 1000000.0) AS BIGINT) AS mean_q6,
        |  CAST(FLOOR(SQRT(g.sq / 32.0) * 1000000.0) AS BIGINT) AS std_q6
        |FROM documents d
        |JOIN b ON b.id = d.doc_id
        |JOIN g ON g.id = d.doc_id
        |ORDER BY id""".stripMargin) { (s, d) =>
      val ids = graft.Tables.documents(s, d).select(col("doc_id").as("id"))
      val feats = decodeAndFeaturize(synthesize(ids))
      feats.select(col("id"), col("modality"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.sampleRate").cast("long").as("sample_rate"),
          col("meta.nFrames").cast("long").as("n_frames"),
          col("meta.nBytes").cast("long").as("n_bytes"),
          floor(element_at(col("features"), 3) * lit(1000000.0)).cast("long").as("mean_q6"),
          floor(element_at(col("features"), 4) * lit(1000000.0)).cast("long").as("std_q6"))
        .orderBy(col("id"))
    },

    // Frame sampling through the same decoded-metadata path: every 4th
    // frame of each video payload, oracled against the synthetic format's
    // frame count (24 + id mod 8). Metadata-driven — payload bytes are
    // read once at decode, never re-shuffled per frame.
    graft.QueryDef.sql(
      "q_frame_sample",
      """SELECT d.doc_id AS id, CAST(u.f AS BIGINT) AS frame_idx
        |FROM documents d, UNNEST(RANGE(0, 24 + d.doc_id % 8, 4)) AS u(f)
        |WHERE d.doc_id % 3 = 2
        |ORDER BY id, frame_idx""".stripMargin) { (s, d) =>
      import s.implicits._
      val ids = graft.Tables.documents(s, d).select(col("doc_id").as("id"))
      val meta = decodeAndFeaturize(synthesize(ids))
        .select(col("meta.*")).as[MediaMeta]
      sampleFrames(meta, 4)
        .select(col("id"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy(col("id"), col("frame_idx"))
    },

    // Exact media dedup — content-hash dedup on the BINARY column (the
    // multimodal twin of q_dedup_exact): each doc carries the payload of
    // content class doc_id mod 256, the engine groups by md5 of the REAL
    // bytes (only the 16-byte digest shuffles, never the blob), and the
    // oracle replays the equivalence classes semantically (payload bytes
    // are a pure function of the content id). Any drift in the
    // encode→hash path splits or merges a class and breaks the hash.
    graft.QueryDef.sql(
      "q_media_dedup",
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
        |  CASE (doc_id % 256) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  CAST(53 AS BIGINT) AS n_bytes
        |FROM documents
        |GROUP BY doc_id % 256, (doc_id % 256) % 3
        |ORDER BY keeper_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { did =>
          val c = did % 256
          val modality = (c % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          (did, modality, encodePayload(c, modality))
        }.toDF("doc_id", "modality", "payload")
      media
        .groupBy(md5(col("payload")).as("h"), col("modality"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"),
          max(length(col("payload"))).cast("long").as("n_bytes"))
        .select(col("keeper_id"), col("modality"), col("n_copies"), col("n_bytes"))
        .orderBy(col("keeper_id"))
    }
  )
}
