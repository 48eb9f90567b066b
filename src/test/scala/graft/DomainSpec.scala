package graft

import java.time.LocalDate

import graft.domain.{Catalog, ConsistentBursts, FrameSolver, Reconcile}
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

class DomainSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = LocalDate.parse(s)

  test("consistent-burst options: full-coverage set wins") {
    // bursts a,b,c on 3 dates; burst c missing on one date
    val tuples = Seq(
      ("a", d("2020-01-01")), ("b", d("2020-01-01")), ("c", d("2020-01-01")),
      ("a", d("2020-01-13")), ("b", d("2020-01-13")),
      ("a", d("2020-01-25")), ("b", d("2020-01-25")), ("c", d("2020-01-25")))
    val opts = ConsistentBursts.options(tuples)
    // option {a,b} keeps 3 dates → 6 cells; {a,b,c} keeps 2 dates → 6 cells;
    // tie broken by more dates → {a,b} first
    assert(opts.head.burstIds == Seq("a", "b"))
    assert(opts.head.dates.size == 3)
    assert(opts.head.totalCells == 6)
    assert(opts(1).burstIds == Seq("a", "b", "c"))
    assert(opts(1).dates.size == 2)
  }

  test("consistent-burst options: bigger grid dominates") {
    val tuples =
      (1 to 10).flatMap(i => Seq("a", "b", "c").map(b => (b, d("2020-01-01").plusDays(i)))) ++
        Seq(("a", d("2020-03-01")))
    val opts = ConsistentBursts.options(tuples)
    assert(opts.head.burstIds == Seq("a", "b", "c")) // 3×10=30 beats 1×11=11
    assert(opts.head.totalCells == 30)
  }

  test("Spark missingDataOptions emits ranked options per frame") {
    val df = Seq(
      (1L, "a", "2020-01-01"), (1L, "b", "2020-01-01"),
      (1L, "a", "2020-01-02"),
      (2L, "x", "2020-01-01")).toDF("frame_id", "burst_id", "date")
      .withColumn("date", $"date".cast("date"))
    val out = ConsistentBursts.missingDataOptions(df)
      .orderBy($"frame_id", $"option_num")
      .select($"frame_id", $"option_num", $"total_num_bursts")
      .as[(Long, Int, Long)].collect().toSeq
    // frame 1: {a}×2=2 beats {a,b}×1=2? tie → more dates wins → {a} first
    assert(out == Seq((1L, 0, 2L), (1L, 1, 2L), (2L, 0, 1L)))
  }

  test("reconcile: restart, shrink, backfill branches") {
    val oldDb = Seq(
      (1L, Seq("a", "b"), Seq("2020-01-01T00:00:00", "2020-02-01T00:00:00")),
      (2L, Seq("a", "b"), Seq("2020-01-01T00:00:00", "2020-02-01T00:00:00")),
      (3L, Seq("a", "b"), Seq("2020-01-01T00:00:00")))
      .toDF("frame_id", "burst_id_list", "sensing_time_list")
    val newDb = Seq(
      // frame 1: more bursts, disjoint dates → restart, keep new
      (1L, Seq("a", "b", "c"), Seq("2023-01-01T00:00:00")),
      // frame 2: more bursts, overlapping dates → shrink to old + backfill
      (2L, Seq("a", "b", "c"), Seq("2020-02-01T01:02:03", "2020-03-01T00:00:00")),
      // frame 3: same bursts → passthrough
      (3L, Seq("a", "b"), Seq("2020-04-01T00:00:00")),
      // frame 4: only in new → passthrough
      (4L, Seq("z"), Seq("2021-01-01T00:00:00")))
      .toDF("frame_id", "burst_id_list", "sensing_time_list")
    val out = Reconcile.reconcile(oldDb, newDb)
      .orderBy($"frame_id")
      .as[(Long, Seq[String], Seq[String], String)].collect()

    assert(out(0) == ((1L, Seq("a", "b", "c"), Seq("2023-01-01T00:00:00"), "restart")))
    // frame 2: bursts shrink to old; 2020-01-01 (date only in old) backfilled;
    // 2020-02-01 NOT backfilled (date overlaps despite differing hours)
    assert(out(1)._2 == Seq("a", "b"))
    assert(out(1)._3 == Seq("2020-01-01T00:00:00", "2020-02-01T01:02:03",
      "2020-03-01T00:00:00"))
    assert(out(1)._4 == "shrink")
    assert(out(2)._4 == "passthrough")
    assert(out(3)._4 == "passthrough")
  }

  test("catalog lookup and two-stage intersect on a synthetic grid") {
    // 9 bursts along a track, 3 frames of 3+1 overlap, square geometries
    val burstMap = (1 to 9).map { i =>
      (i, f"t001_${i}%06d_iw1",
        s"POLYGON ((0 $i, 1 $i, 1 ${i + 1}, 0 ${i + 1}, 0 $i))")
    }.toDF("OGC_FID", "burst_id_jpl", "geom")
    val fb = Seq(
      (1, 1), (1, 2), (1, 3), (1, 4),
      (2, 4), (2, 5), (2, 6), (2, 7),
      (3, 7), (3, 8), (3, 9)).toDF("frame_fid", "burst_ogc_fid")
    val frames = Seq(
      (1, 32631, true, false, "ASCENDING", 1, 0, 1, 1, 5,
        "POLYGON ((0 1, 1 1, 1 5, 0 5, 0 1))"),
      (2, 32631, true, false, "ASCENDING", 1, 0, 4, 1, 8,
        "POLYGON ((0 4, 1 4, 1 8, 0 8, 0 4))"),
      (3, 32631, false, false, "ASCENDING", 1, 0, 7, 1, 10,
        "POLYGON ((0 7, 1 7, 1 10, 0 10, 0 7))"))
      .toDF("fid", "epsg", "is_land", "is_north_america", "orbit_pass",
        "relative_orbit_number", "bb_xmin", "bb_ymin", "bb_xmax", "bb_ymax", "geom")
      .withColumn("xmin", $"bb_xmin").withColumn("ymin", $"bb_ymin")
      .withColumn("xmax", $"bb_xmax").withColumn("ymax", $"bb_ymax")

    val lk = Catalog.lookup(frames, fb, burstMap, 2L)
      .select($"fid", $"burst_ids").as[(Int, Seq[String])].head()
    assert(lk._1 == 2)
    assert(lk._2 == Seq("t001_000004_iw1", "t001_000005_iw1",
      "t001_000006_iw1", "t001_000007_iw1"))

    // intersect query box around y∈[6,7.5] → frames 2 and 3
    val wkt = Catalog.bboxWkt(0.2, 6.0, 0.8, 7.5)
    val hit = Catalog.intersect(frames, wkt, (0.2, 6.0, 0.8, 7.5))
      .select($"fid").as[Int].collect().sorted.toSeq
    assert(hit == Seq(2, 3))

    // bbox prefilter alone would pass frame 1 for a corner box the exact
    // geometry misses: box outside polygon but inside padded bbox
    val frames2 = frames.withColumn("geom",
      lit("POLYGON ((0 1, 0.3 1, 0.3 5, 0 5, 0 1))"))
    val refined = Catalog.intersect(frames2, Catalog.bboxWkt(0.5, 1.5, 0.9, 2.0),
      (0.5, 1.5, 0.9, 2.0)).select($"fid").as[Int].collect()
    assert(!refined.contains(1)) // JTS refine rejected it
  }
}
