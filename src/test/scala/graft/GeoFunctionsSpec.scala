package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("utmZone standard + Norway/Svalbard exceptions") {
    val df = Seq(
      (-122.3, 47.6), // Seattle → 10
      (13.4, 52.5),   // Berlin → 33
      (10.75, 59.9),  // Oslo → 32 (Norway exception; base formula says 32 too)
      (5.0, 60.0),    // Bergen → 32 (exception: base says 31)
      (15.0, 78.0),   // Svalbard → 33
      (31.0, 78.0),   // Svalbard → 35
      (0.0, 0.0)      // → 31
    ).toDF("lon", "lat")
    val zones = df.select(GeoFunctions.utmZone($"lon", $"lat")).as[Int].collect()
    assert(zones.toSeq == Seq(10, 33, 32, 32, 33, 35, 31))
  }

  test("utmEpsg hemisphere + polar overrides") {
    val df = Seq(
      (13.4, 52.5, 32633), // north
      (13.4, -52.5, 32733), // south
      (-45.0, 85.0, 3413), // arctic
      (-45.0, 76.0, 3413), // above NORTH_THRESHOLD=75 (build_frame_db.py:27)
      (18.0, 74.0, 32633), // 74N: UTM, not polar (below the 75 threshold)
      (100.0, -75.0, 3031) // antarctic
    ).toDF("lon", "lat", "want")
    val got = df.select(GeoFunctions.utmEpsg($"lon", $"lat").as("epsg"), $"want")
      .as[(Int, Int)].collect()
    got.foreach { case (epsg, want) => assert(epsg == want) }
  }

  test("transverse Mercator forward: central meridian and scale") {
    // on the central meridian easting is exactly 500000
    val (e0, n0) = GeoFunctions.tmForward(9.0, 45.0, 32, south = false)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(n0 > 0)
    // equator northing = 0
    val (_, nEq) = GeoFunctions.tmForward(9.0, 0.0, 32, south = false)
    assert(math.abs(nEq) < 1e-9)
    // scale near the central meridian ≈ 0.9996 · per-degree arc
    val (e1, _) = GeoFunctions.tmForward(9.1, 0.0, 32, south = false)
    val perDeg = (e1 - e0) * 10
    val expected = 0.9996 * (math.Pi / 180) * 6378137.0
    assert(math.abs(perDeg - expected) / expected < 1e-4)
    // symmetry about the central meridian
    val (eW, _) = GeoFunctions.tmForward(8.0, 30.0, 32, south = false)
    val (eE, _) = GeoFunctions.tmForward(10.0, 30.0, 32, south = false)
    assert(math.abs((500000 - eW) - (eE - 500000)) < 1e-6)
    // southern hemisphere false northing
    val (_, nS) = GeoFunctions.tmForward(9.0, -10.0, 32, south = true)
    assert(nS > 8000000 && nS < 10000000)
  }

  test("transverse Mercator northing ≈ meridian arc at 45°N") {
    // meridian arc from equator to 45° on WGS84 is 4984944.4 m (public
    // geodesy constant); scaled by k0=0.9996
    val (_, n45) = GeoFunctions.tmForward(9.0, 45.0, 32, south = false)
    assert(math.abs(n45 - 0.9996 * 4984944.4) < 5.0)
  }

  test("polar stereographic: pole at origin, radius grows away from pole") {
    val (x, y) = GeoFunctions.polarForward(30.0, 90.0, south = false)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
    val r80 = GeoFunctions.polarForward(0.0, 80.0, south = false)
    val r70 = GeoFunctions.polarForward(0.0, 70.0, south = false)
    def mag(p: (Double, Double)) = math.hypot(p._1, p._2)
    assert(mag(r70) > mag(r80))
    // ~10° of latitude ≈ 1113 km of radius (within 1%)
    assert(math.abs((mag(r70) - mag(r80)) - 1113000) < 15000)
    // south pole at origin for 3031
    val (xs, ys) = GeoFunctions.polarForward(10.0, -90.0, south = true)
    assert(math.abs(xs) < 1e-6 && math.abs(ys) < 1e-6)
  }

  test("geometry union aggregator merges adjacent squares") {
    val df = Seq(
      (1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (1, "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"),
      (2, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    ).toDF("k", "wkt")
    val out = df.groupBy($"k")
      .agg(GeoFunctions.stUnionAgg($"wkt").as("geom"))
      .select($"k", GeoFunctions.stArea($"geom").as("area"))
      .as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) - 2.0) < 1e-9)
    assert(math.abs(out(2) - 1.0) < 1e-9)
  }

  test("stIntersects and envelope UDFs") {
    val df = Seq(("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")).toDF("a", "b")
    val inter = df.select(GeoFunctions.stIntersects($"a", $"b")).as[Boolean].head()
    assert(inter)
    val env = df.select(GeoFunctions.stEnvelope($"a").as("e"))
      .select($"e._1", $"e._2", $"e._3", $"e._4")
      .as[(Double, Double, Double, Double)].head()
    assert(env == ((0.0, 0.0, 2.0, 2.0)))
  }

  test("dateline split produces parts within [-180, 180]") {
    val crossing = GeoFunctions.parseWkt(
      "POLYGON ((175 0, -175 0, -175 5, 175 5, 175 0))")
    assert(crossing.getEnvelopeInternal.getWidth > 180) // encoded the wrap
    val split = GeoFunctions.datelineSplit(crossing)
    assert(split.getNumGeometries == 2)
    val env = split.getEnvelopeInternal
    assert(env.getMinX >= -180 && env.getMaxX <= 180)
    assert(math.abs(split.getArea - 50.0) < 1e-6)
    // non-crossing geometry passes through untouched
    val plain = GeoFunctions.parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(GeoFunctions.datelineSplit(plain) eq plain)
  }

  test("snap bbox columns") {
    val df = Seq((100.0, 900.0)).toDF("lo", "hi")
    val got = df.select(
      GeoFunctions.snapLo($"lo", margin = 50, snap = 30),
      GeoFunctions.snapHi($"hi", margin = 50, snap = 30))
      .as[(Long, Long)].head()
    assert(got._1 == 30L) // floor((100-50)/30)*30
    assert(got._2 == 960L) // ceil((900+50)/30)*30
  }
}
