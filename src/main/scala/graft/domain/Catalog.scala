package graft.domain

import graft.functions.GeoFunctions
import graft.{QueryDef, Tables}
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
      start: String, end: String): DataFrame =
    burstsFor(bursts, frameBurstIds(spark, frameToBurstJsonZip, frameIds),
      start, end)

  /** Id-table form of fetch-bursts (the surface q_fetch_bursts drives):
    * pushed-down time-range filter on the fact scan, then the broadcast
    * semi-join on the requested burst-id list — the burst-ROW serving
    * path, where fetch-granules dedups to granules. */
  def burstsFor(bursts: DataFrame, burstIds: DataFrame,
      start: String, end: String): DataFrame =
    bursts
      .filter(col("sensing_time") >= lit(start).cast("timestamp") &&
        col("sensing_time") <= lit(end).cast("timestamp"))
      .join(broadcast(burstIds), Seq("burst_id_jpl"), "left_semi")

  /** `opera-db historical fetch-granules` (query_historical_bursts.py:98-124):
    * same frame→burst expansion + time range as fetch-bursts, then the
    * DISTINCT granule list with the trailing `.SAFE` stripped
    * (row_processor at :110-112). */
  def fetchGranules(spark: org.apache.spark.sql.SparkSession, bursts: DataFrame,
      frameToBurstJsonZip: String, frameIds: Seq[Long],
      start: String, end: String): DataFrame =
    granulesFor(bursts, frameBurstIds(spark, frameToBurstJsonZip, frameIds), start, end)

  /** Id-table form of fetch-granules (the surface q_fetch_granules drives):
    * time-range filter → broadcast semi-join on the burst-id list →
    * granule dedup. The DISTINCT runs on the already-filtered fact slice,
    * and the id list broadcasts — no shuffle of the ~50M-row fact beyond
    * the final distinct on the (small) matched slice. */
  def granulesFor(bursts: DataFrame, burstIds: DataFrame,
      start: String, end: String): DataFrame =
    bursts
      .filter(col("sensing_time") >= lit(start).cast("timestamp") &&
        col("sensing_time") <= lit(end).cast("timestamp"))
      .join(broadcast(burstIds), Seq("burst_id_jpl"), "left_semi")
      .select(replace(col("granule"), lit(".SAFE"), lit("")).as("granule"))
      .distinct()
      .orderBy(col("granule"))

  /** frame ids → one distinct burst-id table from the zipped
    * frame-to-burst JSON document (query_historical_bursts.py:33-40). */
  private def frameBurstIds(spark: org.apache.spark.sql.SparkSession,
      frameToBurstJsonZip: String, frameIds: Seq[Long]): DataFrame = {
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
    idDfs.reduce(_ unionByName _).distinct()
  }

  val queries: Seq[QueryDef] = Seq(
    // granule-level historical fetch (query_historical_bursts.py:98-124):
    // a synthetic bursts fact from orders (many bursts share a granule),
    // an arithmetic frame→burst mapping standing in for the JSON document
    // (frames 3 and 7, 27 burst numbers × 3 subswaths each), IN-list
    // semi-join + time range + granule dedup + `.SAFE` strip
    QueryDef.sql(
      "q_fetch_granules",
      """WITH bursts AS (
        |  SELECT
        |    PRINTF('t%03d_%06d_iw%d', (o_orderkey %% 3000) %% 175 + 1,
        |      o_orderkey %% 3000, o_orderkey %% 3 + 1) AS burst_id_jpl,
        |    CAST(o_orderdate AS TIMESTAMP) AS sensing_time,
        |    PRINTF('S1A_IW_SLC__1SDV_%sT000000_%05d.SAFE',
        |      STRFTIME(o_orderdate, '%Y%m%d'), o_orderkey %% 500) AS granule
        |  FROM orders),
        |wanted AS (
        |  SELECT DISTINCT PRINTF('t%03d_%06d_iw%d',
        |      (f.fid * 100 + k.k) %% 175 + 1, f.fid * 100 + k.k, iw.iw) AS burst_id_jpl
        |  FROM (SELECT UNNEST([3, 7]) AS fid) f,
        |       (SELECT UNNEST(RANGE(0, 27)) AS k) k,
        |       (SELECT UNNEST(RANGE(1, 4)) AS iw) iw)
        |SELECT DISTINCT REPLACE(granule, '.SAFE', '') AS granule
        |FROM bursts
        |WHERE burst_id_jpl IN (SELECT burst_id_jpl FROM wanted)
        |  AND sensing_time >= TIMESTAMP '1993-01-01 00:00:00'
        |  AND sensing_time <= TIMESTAMP '1997-06-30 00:00:00'
        |ORDER BY granule""".stripMargin.replace("%%", "%")) { (s, d) =>
      val bursts = Tables.orders(s, d).select(
        format_string("t%03d_%06d_iw%d",
          pmod(pmod(col("o_orderkey"), lit(3000)), lit(175)) + 1,
          pmod(col("o_orderkey"), lit(3000)),
          pmod(col("o_orderkey"), lit(3)) + 1).as("burst_id_jpl"),
        col("o_orderdate").cast("timestamp").as("sensing_time"),
        format_string("S1A_IW_SLC__1SDV_%sT000000_%05d.SAFE",
          date_format(col("o_orderdate"), "yyyyMMdd"),
          pmod(col("o_orderkey"), lit(500))).as("granule"))
      val fids = Seq(3L, 7L)
      import s.implicits._
      val ids = fids.toDF("fid")
        .crossJoin(s.range(0, 27).toDF("k"))
        .crossJoin(s.range(1, 4).toDF("iw"))
        .select(format_string("t%03d_%06d_iw%d",
          pmod(col("fid") * 100 + col("k"), lit(175)) + 1,
          col("fid") * 100 + col("k"), col("iw")).as("burst_id_jpl"))
        .distinct()
      granulesFor(bursts, ids, "1993-01-01 00:00:00", "1997-06-30 00:00:00")
    },

    // burst-row historical fetch (query_historical_bursts.py:188-209): the
    // same synthetic fact + frame→burst id list as q_fetch_granules, but
    // through the burst-ROW serving path (time range + broadcast
    // semi-join, no granule dedup) — closes the last §3.3 serving path
    // without an oracle row
    QueryDef.sql(
      "q_fetch_bursts",
      """WITH bursts AS (
        |  SELECT
        |    PRINTF('t%03d_%06d_iw%d', (o_orderkey %% 3000) %% 175 + 1,
        |      o_orderkey %% 3000, o_orderkey %% 3 + 1) AS burst_id_jpl,
        |    CAST(o_orderdate AS TIMESTAMP) AS sensing_time,
        |    PRINTF('S1A_IW_SLC__1SDV_%sT000000_%05d.SAFE',
        |      STRFTIME(o_orderdate, '%Y%m%d'), o_orderkey %% 500) AS granule
        |  FROM orders),
        |wanted AS (
        |  SELECT DISTINCT PRINTF('t%03d_%06d_iw%d',
        |      (f.fid * 100 + k.k) %% 175 + 1, f.fid * 100 + k.k, iw.iw) AS burst_id_jpl
        |  FROM (SELECT UNNEST([3, 7]) AS fid) f,
        |       (SELECT UNNEST(RANGE(0, 27)) AS k) k,
        |       (SELECT UNNEST(RANGE(1, 4)) AS iw) iw)
        |SELECT burst_id_jpl, sensing_time, granule
        |FROM bursts
        |WHERE burst_id_jpl IN (SELECT burst_id_jpl FROM wanted)
        |  AND sensing_time >= TIMESTAMP '1993-01-01 00:00:00'
        |  AND sensing_time <= TIMESTAMP '1997-06-30 00:00:00'
        |ORDER BY burst_id_jpl, sensing_time, granule""".stripMargin.replace("%%", "%")) { (s, d) =>
      val bursts = Tables.orders(s, d).select(
        format_string("t%03d_%06d_iw%d",
          pmod(pmod(col("o_orderkey"), lit(3000)), lit(175)) + 1,
          pmod(col("o_orderkey"), lit(3000)),
          pmod(col("o_orderkey"), lit(3)) + 1).as("burst_id_jpl"),
        col("o_orderdate").cast("timestamp").as("sensing_time"),
        format_string("S1A_IW_SLC__1SDV_%sT000000_%05d.SAFE",
          date_format(col("o_orderdate"), "yyyyMMdd"),
          pmod(col("o_orderkey"), lit(500))).as("granule"))
      val fids = Seq(3L, 7L)
      import s.implicits._
      val ids = fids.toDF("fid")
        .crossJoin(s.range(0, 27).toDF("k"))
        .crossJoin(s.range(1, 4).toDF("iw"))
        .select(format_string("t%03d_%06d_iw%d",
          pmod(col("fid") * 100 + col("k"), lit(175)) + 1,
          col("fid") * 100 + col("k"), col("iw")).as("burst_id_jpl"))
        .distinct()
      burstsFor(bursts, ids, "1993-01-01 00:00:00", "1997-06-30 00:00:00")
        .orderBy(col("burst_id_jpl"), col("sensing_time"), col("granule"))
    }
  )
}
