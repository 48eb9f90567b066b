package graft.domain

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving queries over the frame catalog (SURVEY.md §3.3).
  *
  * Tables follow the reference schemas (§1.2): `frames(fid, epsg, is_land,
  * is_north_america, geom WKT, relative_orbit_number, orbit_pass,
  * xmin..ymax)`, `frames_bursts(frame_fid, burst_ogc_fid)`,
  * `burst_id_map(OGC_FID, burst_id_jpl, geom, ...)`.
  *
  * Scale notes: `frames`/`frames_bursts`/`burst_id_map` are dimension-sized
  * (≤ ~1M rows) → broadcast everywhere; `intersect` is the two-stage plan
  * (query_frame_db.py:85-121): bbox int columns prefilter — which parquet
  * row-group stats turn into data skipping — then exact JTS refine on the
  * survivors only.
  */
object Catalog {

  /** `opera-db lookup FRAME_ID` (query_frame_db.py:18-58): J1 join + A1
    * aggregation for one frame. */
  def lookup(frames: DataFrame, framesBursts: DataFrame, burstIdMap: DataFrame,
      frameId: Long): DataFrame =
    frameSummaries(
      frames.filter(col("fid") === frameId), framesBursts, burstIdMap)

  /** All-frames summary (build_frame_db.py:495-516 shape): per frame the
    * bbox plus the member burst-id list, deterministic order. */
  def frameSummaries(frames: DataFrame, framesBursts: DataFrame,
      burstIdMap: DataFrame): DataFrame =
    frames
      .join(framesBursts, col("fid") === col("frame_fid"))
      .join(broadcast(burstIdMap.select(col("OGC_FID"), col("burst_id_jpl"))),
        col("burst_ogc_fid") === col("OGC_FID"))
      .groupBy(col("fid"), col("epsg"), col("is_land"), col("is_north_america"),
        col("orbit_pass"), col("relative_orbit_number"),
        col("xmin"), col("ymin"), col("xmax"), col("ymax"))
      .agg(array_sort(collect_list(col("burst_id_jpl"))).as("burst_ids"))

  /** `opera-db intersect` (query_frame_db.py:76-129): two-stage spatial
    * probe. `wkt` is the query geometry; bbox prefilter on the int columns,
    * JTS exact refine after. */
  def intersect(frames: DataFrame, queryWkt: String,
      bbox4326: (Double, Double, Double, Double)): DataFrame = {
    val (qxmin, qymin, qxmax, qymax) = bbox4326
    frames
      .filter(col("bb_xmin") <= qxmax && col("bb_xmax") >= qxmin &&
        col("bb_ymin") <= qymax && col("bb_ymax") >= qymin) // coarse: data-skips
      // exact refine via the native expression: the literal query geometry
      // is parsed+prepared once per executor (plans/SpatialExpressions)
      .filter(graft.plans.SpatialExpressions.stIntersectsNative(col("geom"), queryWkt))
  }

  /** bbox → WKT polygon (utils.py:27-29). */
  def bboxWkt(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"POLYGON (($xmin $ymin, $xmax $ymin, $xmax $ymax, $xmin $ymax, $xmin $ymin))"

  /** `opera-db historical fetch-bursts` (query_historical_bursts.py:20-124,
    * 188-209): expand the requested frames' burst ids from the zipped
    * frame-to-burst JSON document, then semi-join the ~50M-row historical
    * fact table on burst_id_jpl within the time range. The id list is a
    * broadcast semi-join, never an IN-list string (P4 at scale). */
  def fetchBursts(spark: org.apache.spark.sql.SparkSession, bursts: DataFrame,
      frameToBurstJsonZip: String, frameIds: Seq[Long],
      start: String, end: String): DataFrame = {
    import spark.implicits._
    val doc = graft.sources.Io.readJsonZip(frameToBurstJsonZip)
    val parsed = spark.read.json(Seq(doc).toDS())
    val wanted = frameIds.map(_.toString)
    // data.<fid>.burst_ids columns → one distinct id table
    val idDfs = wanted.flatMap { fid =>
      try Some(parsed.select(explode(col(s"data.$fid.burst_ids")).as("burst_id_jpl")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    require(idDfs.nonEmpty, s"no requested frame present in $frameToBurstJsonZip")
    val ids = idDfs.reduce(_ unionByName _).distinct()
    bursts
      .filter(col("sensing_time") >= lit(start).cast("timestamp") &&
        col("sensing_time") <= lit(end).cast("timestamp"))
      .join(broadcast(ids), Seq("burst_id_jpl"), "left_semi")
  }
}
