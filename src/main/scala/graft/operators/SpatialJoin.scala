package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree

/** Broadcast STRtree spatial join (SURVEY.md J7/J10/J11: the reference's
  * in-memory STRtree joins — bursts×land, bursts×NA, points-in-polygons —
  * build_frame_db.py:92-99, snow-analysis/get_volcano_frames.py:29-33).
  *
  * The small polygon side (a few MB of WKB) is indexed once on the driver
  * and broadcast; the big side streams through `mapPartitions`, probing the
  * tree by envelope and refining with prepared geometries. One pass, no
  * shuffle of the big side — the J7 pattern that scales to 100 TB because
  * the only data movement is the broadcast.
  */
object SpatialJoin {

  /** big(id: long, wkt: string) ⨝ small Seq[(polyId, wkt)] →
    * (id, poly_id) for every pair satisfying the predicate.
    * `predicate`: "intersects" | "contains" (small-side contains big-side). */
  def broadcastSpatialJoin(big: DataFrame, small: Seq[(Long, String)],
      predicate: String = "intersects"): DataFrame = {
    require(Seq("intersects", "contains").contains(predicate), predicate)
    val spark = big.sparkSession
    import spark.implicits._
    // ship WKB, build the tree lazily per executor (JTS trees don't serialize)
    val wkbs = small.map { case (id, wkt) =>
      (id, new org.locationtech.jts.io.WKBWriter().write(GeoFunctions.parseWkt(wkt)))
    }
    val bc = spark.sparkContext.broadcast(wkbs)

    big.select(col("id").cast("long"), col("wkt").cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val reader = new org.locationtech.jts.io.WKBReader()
        val tree = new STRtree()
        val prepared = bc.value.map { case (id, wkb) =>
          val g = reader.read(wkb)
          val p = PreparedGeometryFactory.prepare(g)
          tree.insert(g.getEnvelopeInternal, (id, p))
          id -> p
        }.toMap
        tree.build()
        it.flatMap { case (rowId, wkt) =>
          val g = GeoFunctions.parseWkt(wkt)
          import scala.jdk.CollectionConverters._
          tree.query(g.getEnvelopeInternal).asScala.flatMap { hit =>
            val (polyId, p) = hit.asInstanceOf[(Long, PreparedGeometry)]
            val ok = predicate match {
              case "intersects" => p.intersects(g)
              case "contains" => p.contains(g)
            }
            if (ok) Some((rowId, polyId)) else None
          }
        }
      }
      .toDF("id", "poly_id")
  }
}
