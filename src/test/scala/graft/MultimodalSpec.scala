package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize → decode round-trips metadata without shuffling blobs") {
    val ids = spark.range(0, 30).toDF("id")
    val media = Multimodal.synthesize(ids)
    val feats = Multimodal.decodeAndFeaturize(media).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.meta.width == 64 + (f.id % 64))
      assert(f.meta.height == 48 + (f.id % 48))
      assert(f.features.length == 4)
      if (f.modality == "audio") assert(f.meta.sampleRate == 16000)
      if (f.modality == "video") assert(f.meta.nFrames >= 24)
    }
  }

  test("corrupt payload fails loudly") {
    val bad = Multimodal.Media(7L, "image", Array[Byte](1, 2, 3))
    val ex = intercept[Exception] {
      Multimodal.decodeAndFeaturize(Seq(bad).toDS()).collect()
    }
    assert(ex.getMessage.contains("bad magic") ||
      ex.getCause != null && ex.getCause.getMessage.contains("bad magic"))
  }

  test("frame sampling is metadata-driven") {
    val metas = Seq(
      Multimodal.MediaMeta(1, "video", 64, 48, 0, 24, 100),
      Multimodal.MediaMeta(2, "image", 64, 48, 0, 1, 100)).toDS()
    val sampled = Multimodal.sampleFrames(metas, stride = 8)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(sampled == Seq((1L, 0), (1L, 8), (1L, 16)))
  }

  test("binaryFile source feeds the decode path like synthesize does") {
    // the production ingestion path: real files on disk read through
    // Spark's binaryFile source (path + binary content), decoded by the
    // same operator the synthetic table uses — proving the stand-in and
    // the real source are interchangeable at the operator boundary
    val dir = java.nio.file.Files.createTempDirectory("graft-binfile")
    val ids = 0L until 20L
    ids.foreach { id =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      java.nio.file.Files.write(dir.resolve(f"media_$id%05d.bin"),
        Multimodal.encodePayload(id, modality))
    }
    val fromFiles = spark.read.format("binaryFile")
      .load(dir.toString + "/*.bin")
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.bin", 1)
          .cast("long").as("id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Multimodal.Media(id, modality, payload)
      }
    val viaFiles = Multimodal.decodeAndFeaturize(fromFiles)
      .collect().map(f => f.id -> (f.meta, f.features.toSeq)).toMap
    val viaSynth = Multimodal.decodeAndFeaturize(
      Multimodal.synthesize(spark.range(0, 20).toDF("id")))
      .collect().map(f => f.id -> (f.meta, f.features.toSeq)).toMap
    assert(viaFiles.size == 20 && viaFiles == viaSynth)
  }
}
