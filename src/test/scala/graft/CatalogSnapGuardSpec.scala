package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Guard for the q_catalog_build analytic oracle's one approximation seam:
  * the oracle reproduces the Snyder TM-forward series in DuckDB SQL, whose
  * libm sin/cos may differ from the JVM's by ~1 ulp (≈1e-8 m after the
  * series) — harmless only because the outputs are 30 m-snapped integers.
  * This spec proves the quantization is stable for every fixture the
  * differential and the rehearsals can see: each frame's pre-snap UTM
  * envelope coordinate sits ≥ 1e-3 m from its FLOOR/CEIL snap boundary
  * (five orders of magnitude beyond the cross-libm divergence) and every
  * dateline-aware centroid longitude sits ≥ 0.4° from a UTM zone edge.
  * Rehearsal clones duplicate supplier rows but never change the
  * coordinate VALUES (the fixture filters s_suppkey < 400), so passing at
  * the three base scale factors covers every clone. */
class CatalogSnapGuardSpec extends SparkSpec {

  private val MarginM = 5000.0
  private val SnapM = 30.0
  private val MinDist = 1e-3

  private def boundaryDist(v: Double): Double = {
    val frac = v / SnapM - math.floor(v / SnapM)
    math.min(frac, 1 - frac) * SnapM
  }

  for (sfDir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"catalog fixture at $sfDir: snapped coordinates are quantization-stable") {
      val r = graft.domain.CatalogBuild.build(
        graft.operators.Geo.burstGridFixture(spark, sf(sfDir)),
        graft.operators.Geo.catalogFixtureLandWkt)
      val rows = r.frames
        .withColumn("utm", GeoFunctions.stEnvelope(
          GeoFunctions.stProject(col("geom"), col("epsg"))))
        .withColumn("c", GeoFunctions.stCentroidDateline(col("geom")))
        .select(col("fid"), col("utm._1"), col("utm._2"), col("utm._3"),
          col("utm._4"), col("c._1"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { row =>
        val fid = row.get(0)
        val pre = Seq(row.getDouble(1) - MarginM, row.getDouble(2) - MarginM,
          row.getDouble(3) + MarginM, row.getDouble(4) + MarginM)
        pre.foreach { v =>
          assert(boundaryDist(v) >= MinDist,
            s"frame $fid: pre-snap coordinate $v sits ${boundaryDist(v)} m " +
              s"from a $SnapM m snap boundary — the analytic oracle's " +
              "cross-libm tolerance no longer holds; re-derive the fixture")
        }
        val lon = row.getDouble(5)
        val zoneFrac = (lon + 180) / 6 - math.floor((lon + 180) / 6)
        val zoneDist = math.min(zoneFrac, 1 - zoneFrac) * 6
        assert(zoneDist >= 0.4,
          s"frame $fid: centroid lon $lon sits $zoneDist deg from a UTM " +
            "zone edge — the oracle's arithmetic EPSG is no longer safe")
      }
    }
  }
}
