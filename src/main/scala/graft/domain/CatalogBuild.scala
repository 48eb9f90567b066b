package graft.domain

import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `opera-db create` pipeline (SURVEY.md §3.1, build_frame_db.py:576-754)
  * as one linear Dataset program — the reference's pandas↔SQLite↔subprocess
  * hops collapse into a single Spark plan.
  *
  * Stages: jpl-id derivation → triplet dissolve (geometry-union agg) → land
  * flag (spatial predicate vs a broadcast land geometry) → per-track DP
  * frame optimization (flatMapGroups) → frame assembly (union + majority
  * track + first orbit_pass) → EPSG assignment (dateline-aware centroid) →
  * UTM bbox snap → minimal/denormalized projections.
  *
  * Scale: everything keys on burst_id/track/frame — the only shuffles are
  * the dissolve groupBy, the per-track solve, and the frame groupBy; land
  * geometry is broadcast (small polygon side, J7); nothing collects to the
  * driver.
  */
object CatalogBuild {

  /** burst_id_jpl = t{track:03d}_{esa_id:06d}_{iw} (build_frame_db.py:37-47,
    * D1 — built-in format_string, no UDF). */
  def withJplId(burstIdMap: DataFrame): DataFrame =
    burstIdMap.withColumn("burst_id_jpl",
      format_string("t%03d_%06d_%s", col("relative_orbit_number"),
        col("burst_id"), lower(col("subswath_name"))))

  /** Triplet dissolve (A2/A3, build_frame_db.py:63-89): one row per ESA
    * burst id — union of the 3 subswath geometries, id range, first-by-id
    * orbit attributes. */
  def dissolveTriplets(bursts: DataFrame): DataFrame =
    bursts
      .groupBy(col("burst_id"))
      .agg(
        GeoFunctions.stUnionAgg(col("geom")).as("geom"),
        min(col("OGC_FID")).as("min_ogc_fid"),
        max(col("OGC_FID")).as("max_ogc_fid"),
        min_by(col("relative_orbit_number"), col("OGC_FID")).as("relative_orbit_number"),
        min_by(col("orbit_pass"), col("OGC_FID")).as("orbit_pass"),
        // the reference's custom concat-of-set aggfunc (build_frame_db.py:63-89)
        array_join(array_sort(array_distinct(collect_list(col("burst_id_jpl")))), ",")
          .as("jpl_ids"))

  /** Land flag (J7): exact intersects against a broadcast land WKT. At the
    * reference's scale the land polygon side is a few MB → literal/broadcast;
    * the bbox prefilter keeps the JTS predicate off most rows. */
  def withLandFlag(triplets: DataFrame, landWkt: String): DataFrame = {
    val env = GeoFunctions.parseWkt(landWkt).getEnvelopeInternal
    val pre = triplets.withColumn("e", GeoFunctions.stEnvelope(col("geom")))
    pre.withColumn("is_land",
        col("e._1") <= env.getMaxX && col("e._3") >= env.getMinX &&
          col("e._2") <= env.getMaxY && col("e._4") >= env.getMinY &&
          GeoFunctions.stIntersects(col("geom"), lit(landWkt)))
      .drop("e")
  }

  /** Per-track DP frame optimization (D2) → (track, frame-in-track, burst
    * id span, is_land). Sequential per key → flatMapGroups. */
  def solveTrackFrames(triplets: DataFrame, target: Double = 9.0, minF: Int = 5,
      maxF: Int = 10): DataFrame = {
    val spark = triplets.sparkSession
    import spark.implicits._
    triplets
      .select(col("relative_orbit_number").cast("int"), col("burst_id").cast("long"),
        col("is_land").cast("boolean"))
      .as[(Int, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (track, rows) =>
        val sorted = rows.toSeq.sortBy(_._2)
        val ids = sorted.map(_._2).toArray
        val land = sorted.map(_._3).toArray
        FrameSolver.landOptimizedSlices(land, target, minF, maxF).zipWithIndex.flatMap {
          case (FrameSolver.FrameSlice(s, e, isLand), i) =>
            (s until e).map(j => (track, i + 1, ids(j), isLand))
        }.iterator
      }
      .toDF("track", "frame_in_track", "burst_id", "frame_is_land")
  }

  /** Global frame ids: dense 1-based over (track, frame_in_track). Frames
    * per track are ≤ ~30 → a window over the compact distinct set, not the
    * burst rows. */
  def withGlobalFrameIds(trackFrames: DataFrame): DataFrame = {
    val distinctFrames = trackFrames.select(col("track"), col("frame_in_track")).distinct()
    val w = Window.orderBy(col("track"), col("frame_in_track"))
    val ids = distinctFrames.withColumn("frame_fid", row_number().over(w))
    trackFrames.join(broadcast(ids), Seq("track", "frame_in_track"))
  }

  final case class BuildResult(frames: DataFrame, framesBursts: DataFrame,
      burstIdMap: DataFrame)

  /** Full build: burst_id_map (with geom WKT) + land WKT → frames +
    * frames_bursts + enriched burst map (§3.1 steps 2-7).
    *
    * `polarOverrideWkt`: the reference forces every frame intersecting the
    * Greenland shape to EPSG:3413 regardless of its centroid latitude
    * (build_frame_db.py:251-257). The shape itself is a downloaded
    * artifact; pass it here when available — the override is the same
    * bbox-prefilter + exact-intersects plan as the land flag. */
  def build(burstIdMapRaw: DataFrame, landWkt: String,
      marginM: Double = 5000.0, snapM: Double = 30.0,
      polarOverrideWkt: Option[String] = None): BuildResult = {
    val bursts = withJplId(burstIdMapRaw)
    // triplets feed the DP solver AND frame assembly — materialize once
    // (the dissolve runs the JTS union aggregator; recomputing it per
    // consumer doubles the most expensive stage)
    val triplets = withLandFlag(dissolveTriplets(bursts), landWkt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val frameBursts = withGlobalFrameIds(solveTrackFrames(triplets))

    // frames_bursts join table: expand triplets back to subswath rows
    val fb = frameBursts
      .join(bursts.select(col("burst_id").as("b_id"), col("OGC_FID")),
        col("burst_id") === col("b_id"))
      .select(col("frame_fid"), col("OGC_FID").as("burst_ogc_fid"))

    // frame assembly (build_frame_db.py:122-190): geometry union, majority
    // track (A4: round(avg)), deterministic first orbit_pass (W1 + §7.5
    // risk 5: min_by burst), any-land
    val frames0 = frameBursts
      .join(triplets.select(col("burst_id").as("t_id"), col("geom"),
          col("orbit_pass"), col("is_land")),
        col("burst_id") === col("t_id"))
      .groupBy(col("frame_fid"))
      .agg(
        GeoFunctions.stUnionAgg(col("geom")).as("geom"),
        floor(avg(col("track")) + 0.5).cast("int").as("relative_orbit_number"),
        min_by(col("orbit_pass"), col("burst_id")).as("orbit_pass"),
        max(col("frame_is_land")).as("is_land"),
        count(lit(1)).as("n_bursts"))

    // EPSG via dateline-aware centroid (D3, build_frame_db.py:193-307):
    // centroid computed in shifted space BEFORE the split — a centroid of
    // the split halves would average to ~0° longitude
    val withEpsg0 = frames0
      .withColumn("c", GeoFunctions.stCentroidDateline(col("geom")))
      .withColumn("geom", GeoFunctions.stDatelineSplit(col("geom")))
      .withColumn("epsg", GeoFunctions.utmEpsg(col("c._1"), col("c._2")))
    // polar-shape override (build_frame_db.py:251-257): bbox prefilter
    // keeps the exact JTS predicate off frames nowhere near the shape
    val withEpsg = polarOverrideWkt match {
      case None => withEpsg0
      case Some(wkt) =>
        val env = GeoFunctions.parseWkt(wkt).getEnvelopeInternal
        withEpsg0
          .withColumn("e", GeoFunctions.stEnvelope(col("geom")))
          .withColumn("epsg",
            when(col("e._1") <= env.getMaxX && col("e._3") >= env.getMinX &&
                col("e._2") <= env.getMaxY && col("e._4") >= env.getMinY &&
                GeoFunctions.stIntersects(col("geom"), lit(wkt)), lit(3413))
              .otherwise(col("epsg")))
          .drop("e")
    }

    // UTM bbox, snapped (build_frame_db.py:409-451): project → envelope →
    // pad margin → snap to grid, stored as int columns for data skipping
    val frames = withEpsg
      .withColumn("utm", GeoFunctions.stEnvelope(
        GeoFunctions.stProject(col("geom"), col("epsg"))))
      .select(
        col("frame_fid").as("fid"), col("epsg"), col("is_land"),
        col("relative_orbit_number"), col("orbit_pass"), col("n_bursts"),
        col("geom"),
        GeoFunctions.snapLo(col("utm._1"), marginM, snapM).as("xmin"),
        GeoFunctions.snapLo(col("utm._2"), marginM, snapM).as("ymin"),
        GeoFunctions.snapHi(col("utm._3"), marginM, snapM).as("xmax"),
        GeoFunctions.snapHi(col("utm._4"), marginM, snapM).as("ymax"))

    BuildResult(frames, fb, bursts)
  }

  /** Minimal projection (build_frame_db.py:453-480): the 7-column serving
    * artifact, int-snapped coordinates. */
  def minimal(r: BuildResult): DataFrame =
    r.frames.select(col("fid"), col("epsg"), col("xmin"), col("ymin"),
      col("xmax"), col("ymax"), col("is_land"))

  /** Denormalized burst view (export_denormalized_db.py:68-146): per burst
    * the frame-id range and count — the materialization that kills
    * query-time joins (§4). */
  def denormalized(r: BuildResult): DataFrame =
    r.burstIdMap
      .join(r.framesBursts, col("OGC_FID") === col("burst_ogc_fid"))
      .join(r.frames.select(col("fid"), col("epsg").as("f_epsg")),
        col("frame_fid") === col("fid"))
      .groupBy(col("burst_id_jpl"))
      .agg(min(col("fid")).as("min_frame_id"),
        max(col("fid")).as("max_frame_id"),
        min_by(col("f_epsg"), col("fid")).as("min_frame_epsg"),
        max_by(col("f_epsg"), col("fid")).as("max_frame_epsg"),
        countDistinct(col("fid")).as("num_frames"))
}
