package graft.sources

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import scala.xml.XML

/** SAFE-annotation XML ingest (SURVEY.md S9, parse_bursts.py:249-463): the
  * reference lxml-parses burst grids out of Sentinel-1 annotation XML. Here
  * the same extraction as a distributed flatMap with scala-xml — an ingest
  * job, not a query operator: each file is independent, so the natural unit
  * of parallelism is one XML document per task.
  */
object XmlSource {

  final case class BurstRow(file: String, swath: String, burstIndex: Int,
      sensingTimeUs: Long, firstValidSample: Int)
  final case class GridPoint(file: String, line: Int, pixel: Int,
      latitude: Double, longitude: Double)

  private[graft] def parseTimeUs(s: String): Long = {
    // annotation format: 2020-01-01T00:00:00.123456 (no zone)
    val inst = Instant.parse(if (s.endsWith("Z")) s else s + "Z")
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** (file, xmlText) rows → one row per <burst>. */
  def parseBursts(xmlFiles: Dataset[(String, String)]): Dataset[BurstRow] = {
    val spark = xmlFiles.sparkSession
    import spark.implicits._
    xmlFiles.flatMap { case (file, text) =>
      val root = XML.loadString(text)
      val swath = (root \ "adsHeader" \ "swath").text
      (root \ "swathTiming" \ "burstList" \ "burst").zipWithIndex.map {
        case (b, i) =>
          BurstRow(file, swath, i,
            parseTimeUs((b \ "sensingTime").text),
            (b \ "firstValidSample").text.trim.split("\\s+").headOption
              .map(_.toInt).getOrElse(-1))
      }
    }
  }

  /** (file, xmlText) rows → one row per geolocation grid point. */
  def parseGeolocationGrid(xmlFiles: Dataset[(String, String)]): Dataset[GridPoint] = {
    val spark = xmlFiles.sparkSession
    import spark.implicits._
    xmlFiles.flatMap { case (file, text) =>
      val root = XML.loadString(text)
      (root \ "geolocationGrid" \ "geolocationGridPointList" \
        "geolocationGridPoint").map { p =>
        GridPoint(file,
          (p \ "line").text.trim.toInt, (p \ "pixel").text.trim.toInt,
          (p \ "latitude").text.trim.toDouble, (p \ "longitude").text.trim.toDouble)
      }
    }
  }

  /** Read a directory of XML files as (path, content) — `wholetext` keeps
    * one document per row. */
  def readXmlDir(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .withColumn("file", org.apache.spark.sql.functions.input_file_name())
      .select("file", "value").as[(String, String)]
  }
}
