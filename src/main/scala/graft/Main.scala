package graft

import graft.domain.{Catalog, CatalogBuild}
import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Command-line front door (the reference's `opera-db` CLI, cli.py:28-44),
  * mapping each subcommand to the existing library calls:
  *
  *   create <burst_id_map.parquet> <land.wkt> <outDir> [<north_america.wkt>]
  *   lookup <catalogDir> <frameId>
  *   intersect <catalogDir> --bbox <xmin,ymin,xmax,ymax> | --wkt <WKT>
  *   fetch-bursts   <bursts.parquet> <frameToBurst.json.zip> <fids> <start> <end> <outDir>
  *   fetch-granules <bursts.parquet> <frameToBurst.json.zip> <fids> <start> <end>
  *
  * `create` persists the catalog as three parquet tables under <outDir>
  * (frames / frames_bursts / burst_id_map); frames additionally carry the
  * 4326-degree bbox columns (bb_*) so `intersect`'s coarse stage is plain
  * int/double column predicates that parquet row-group stats can skip on.
  * Query results print as JSON lines (lookup/intersect/fetch-granules are
  * human-sized); fetch-bursts writes CSV, the reference's output format.
  */
object Main {

  private def usage(): Nothing = {
    System.err.println(
      """usage: graft.Main <command> [args]
        |  create <burst_id_map.parquet> <land.wkt> <outDir> [<north_america.wkt>]
        |  lookup <catalogDir> <frameId>
        |  intersect <catalogDir> --bbox <xmin,ymin,xmax,ymax>
        |  intersect <catalogDir> --wkt <WKT>
        |  fetch-bursts <bursts.parquet> <frameToBurst.json.zip> <fid[,fid...]> <start> <end> <outDir>
        |  fetch-granules <bursts.parquet> <frameToBurst.json.zip> <fid[,fid...]> <start> <end>""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  /** Dispatch, separated from main so specs drive it on a shared session. */
  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "create" :: burstMap :: landWkt :: outDir :: rest =>
      create(spark, burstMap, landWkt, outDir, rest.headOption)
    case "lookup" :: catalogDir :: frameId :: Nil =>
      printJson(Catalog.lookup(frames(spark, catalogDir),
        table(spark, catalogDir, "frames_bursts"),
        table(spark, catalogDir, "burst_id_map"), frameId.toLong))
    case "intersect" :: catalogDir :: "--bbox" :: bbox :: Nil =>
      bbox.split(',').map(_.trim.toDouble) match {
        case Array(xmin, ymin, xmax, ymax) =>
          printJson(Catalog.intersect(frames(spark, catalogDir),
            Catalog.bboxWkt(xmin, ymin, xmax, ymax), (xmin, ymin, xmax, ymax))
            .select(col("fid"), col("epsg"), col("is_land"), col("orbit_pass")))
        case _ => usage()
      }
    case "intersect" :: catalogDir :: "--wkt" :: wkt :: Nil =>
      val env = GeoFunctions.parseWkt(wkt).getEnvelopeInternal
      printJson(Catalog.intersect(frames(spark, catalogDir), wkt,
        (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
        .select(col("fid"), col("epsg"), col("is_land"), col("orbit_pass")))
    case "fetch-bursts" :: bursts :: jsonZip :: fids :: start :: end :: outDir :: Nil =>
      Catalog.fetchBursts(spark, spark.read.parquet(bursts), jsonZip,
          fids.split(',').map(_.trim.toLong).toSeq, start, end)
        .orderBy(col("burst_id_jpl"), col("sensing_time"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(outDir)
    case "fetch-granules" :: bursts :: jsonZip :: fids :: start :: end :: Nil =>
      printJson(Catalog.fetchGranules(spark, spark.read.parquet(bursts), jsonZip,
        fids.split(',').map(_.trim.toLong).toSeq, start, end))
    case _ => usage()
  }

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name")

  private def frames(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "frames")

  /** §3.1 build → persisted catalog. The NA flag is a spatial-join flag
    * exactly like the land flag (build_frame_db.py:653-655 loads a
    * multi-shape North-America boundary); the boundary file holds one WKT
    * per line and routes through the broadcast STRtree join — the same J7
    * path the land flag uses — so a many-polygon coastline probes an index
    * instead of paying shapes×frames exact intersect calls. Absent a
    * North-America file the flag is false (it never gates the build). */
  private def create(spark: SparkSession, burstMap: String, landWktFile: String,
      outDir: String, naWktFile: Option[String]): Unit = {
    def readWkt(p: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8).trim
    val r = CatalogBuild.build(spark.read.parquet(burstMap), readWkt(landWktFile))
    val framesNa = naWktFile match {
      case Some(p) =>
        val shapes = readWkt(p).split('\n').map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
        val naFids = graft.operators.SpatialJoin.broadcastSpatialJoin(
            r.frames.select(col("fid").as("id"), col("geom").as("wkt")), shapes)
          .select(col("id").as("fid")).distinct()
          .withColumn("is_north_america", lit(true))
        // frame set is ≤46k rows and the hit set smaller — broadcast the flag
        r.frames.join(broadcast(naFids), Seq("fid"), "left")
          .withColumn("is_north_america",
            coalesce(col("is_north_america"), lit(false)))
      case None => r.frames.withColumn("is_north_america", lit(false))
    }
    framesNa
      .withColumn("e", GeoFunctions.stEnvelope(col("geom")))
      .withColumn("bb_xmin", col("e._1")).withColumn("bb_ymin", col("e._2"))
      .withColumn("bb_xmax", col("e._3")).withColumn("bb_ymax", col("e._4"))
      .drop("e")
      .write.mode("overwrite").parquet(s"$outDir/frames")
    r.framesBursts.write.mode("overwrite").parquet(s"$outDir/frames_bursts")
    r.burstIdMap.write.mode("overwrite").parquet(s"$outDir/burst_id_map")
  }

  /** Hard cap on rows printed by [[printJson]] — serving results are
    * human-sized; anything above this means the caller pointed the CLI at
    * an unfiltered fact table and collecting it would OOM the driver.
    * System property so specs can lower it without a million-row fixture. */
  private[graft] def maxJsonRows: Int =
    sys.props.get("graft.cli.maxJsonRows").map(_.toInt).getOrElse(100000)

  /** Deterministic JSON-lines print: small serving results only. The
    * `limit(cap + 1)` bounds what ever reaches the driver, and the +1
    * sentinel row distinguishes "exactly at the cap" from "over it" so the
    * failure is loud instead of a silent truncation. */
  private def printJson(df: DataFrame): Unit = {
    val cap = maxJsonRows
    val rows = df.limit(cap + 1).toJSON.collect()
    if (rows.length > cap)
      throw new IllegalArgumentException(
        s"result exceeds $cap rows — refusing to collect onto the " +
          "driver; narrow the query (bbox/fids/date range)")
    rows.foreach(println)
  }
}
