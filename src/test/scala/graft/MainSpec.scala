package graft

import graft.domain.Catalog
import graft.sources.Io
import org.apache.spark.sql.functions._

/** End-to-end CLI test (cli.py:28-44 surface): create a catalog from a
  * synthetic burst grid, then drive every serving subcommand against the
  * persisted artifacts exactly as a shell user would. */
class MainSpec extends SparkSpec {
  import spark.implicits._

  private def grid() = {
    val rows = for {
      track <- Seq(1, 2); burst <- 1 to 18; iw <- 1 to 3
    } yield {
      val esaId = (track - 1) * 18 + burst
      val ogc = (esaId - 1) * 3 + iw
      val x0 = 10.0 * track + (iw - 1) * 1.0
      val y0 = burst * 0.8
      (ogc, esaId.toLong, track, s"IW$iw",
        if (track == 1) "ASCENDING" else "DESCENDING",
        s"POLYGON (($x0 $y0, ${x0 + 1} $y0, ${x0 + 1} ${y0 + 0.8}, $x0 ${y0 + 0.8}, $x0 $y0))")
    }
    rows.toDF("OGC_FID", "burst_id", "relative_orbit_number", "subswath_name",
      "orbit_pass", "geom")
  }

  private def capture(body: => Unit): Seq[String] = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8").linesIterator.toSeq.filter(_.nonEmpty)
  }

  test("create + lookup + intersect + fetch-bursts + fetch-granules end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val burstMapDir = s"$tmp/burst_map"
    grid().write.parquet(burstMapDir)
    val landFile = java.nio.file.Paths.get(s"$tmp/land.wkt")
    java.nio.file.Files.writeString(landFile,
      "POLYGON ((9 3.5, 14 3.5, 14 11.5, 9 11.5, 9 3.5))")
    val catDir = s"$tmp/catalog"

    // create: persists the three catalog tables
    Main.run(spark, List("create", burstMapDir, landFile.toString, catDir))
    val frames = spark.read.parquet(s"$catDir/frames")
    assert(frames.count() > 0)
    assert(Seq("bb_xmin", "bb_ymin", "bb_xmax", "bb_ymax", "is_north_america")
      .forall(frames.columns.contains))

    // lookup: JSON line carrying the frame's sorted burst-id list
    val someFid = frames.select($"fid").orderBy($"fid").as[Int].head()
    val lookupOut = capture(Main.run(spark, List("lookup", catDir, someFid.toString)))
    assert(lookupOut.size == 1)
    assert(lookupOut.head.contains("\"burst_ids\":[\"t001_"))

    // intersect: both probe forms hit the frames covering lon 10-12, lat ~4
    val byBbox = capture(Main.run(spark,
      List("intersect", catDir, "--bbox", "10.5,3.9,11.5,4.1")))
    val byWkt = capture(Main.run(spark, List("intersect", catDir, "--wkt",
      Catalog.bboxWkt(10.5, 3.9, 11.5, 4.1))))
    assert(byBbox.nonEmpty && byBbox == byWkt)
    assert(byBbox.forall(_.contains("\"fid\":")))

    // historical fact fixture: every burst of the looked-up frame acquires
    // on two dates under two granules
    val burstIds = spark.read.json(Seq(Io.readJsonZip {
      val zip = s"$tmp/f2b.json.zip"
      Io.writeJsonZip(zip, "f2b.json", Io.frameToBurstJson(
        Catalog.frameSummaries(frames, spark.read.parquet(s"$catDir/frames_bursts"),
          spark.read.parquet(s"$catDir/burst_id_map")),
        Map("version" -> "test")))
      zip
    }).toDS()).select(explode(col(s"data.$someFid.burst_ids")).as("burst_id_jpl"))
      .as[String].collect().toSeq
    assert(burstIds.nonEmpty)
    val zip = s"$tmp/f2b.json.zip" // written above
    val burstsDir = s"$tmp/bursts"
    burstIds.flatMap(b => Seq(
        (b, "2023-01-05 00:00:00", "S1A_20230105.SAFE"),
        (b, "2024-06-01 00:00:00", "S1A_20240601.SAFE")))
      .toDF("burst_id_jpl", "st", "granule")
      .select($"burst_id_jpl", $"st".cast("timestamp").as("sensing_time"), $"granule")
      .write.parquet(burstsDir)

    // fetch-bursts: CSV rows only inside the time range
    val outDir = s"$tmp/fetched"
    Main.run(spark, List("fetch-bursts", burstsDir, zip, someFid.toString,
      "2023-01-01 00:00:00", "2023-12-31 00:00:00", outDir))
    val fetched = spark.read.option("header", "true").csv(outDir)
    assert(fetched.count() == burstIds.size)
    assert(fetched.select($"granule").distinct().as[String].collect().toSeq ==
      Seq("S1A_20230105.SAFE"))

    // fetch-granules: distinct granules with .SAFE stripped, full range
    val granules = capture(Main.run(spark, List("fetch-granules", burstsDir, zip,
      someFid.toString, "2023-01-01 00:00:00", "2024-12-31 00:00:00")))
    assert(granules.map(l => l.contains("S1A_20230105") || l.contains("S1A_20240601"))
      .forall(identity) && granules.size == 2)
    assert(granules.forall(!_.contains(".SAFE")))
  }

  test("printJson guard refuses to collect past the row cap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cli-guard").toString
    val burstMapDir = s"$tmp/burst_map"
    grid().write.parquet(burstMapDir)
    val landFile = java.nio.file.Paths.get(s"$tmp/land.wkt")
    java.nio.file.Files.writeString(landFile,
      "POLYGON ((9 3.5, 14 3.5, 14 11.5, 9 11.5, 9 3.5))")
    val catDir = s"$tmp/catalog"
    Main.run(spark, List("create", burstMapDir, landFile.toString, catDir))
    val nFrames = spark.read.parquet(s"$catDir/frames").count()
    assert(nFrames > 1)
    // a planet-sized probe hits every frame; with the cap below it, the
    // CLI must fail loud instead of silently pulling them onto the driver
    System.setProperty("graft.cli.maxJsonRows", "1")
    try {
      val e = intercept[IllegalArgumentException](capture(Main.run(spark,
        List("intersect", catDir, "--bbox", "-180,-90,180,90"))))
      assert(e.getMessage.contains("exceeds 1 rows"))
    } finally System.clearProperty("graft.cli.maxJsonRows")
    // and with the default cap the same probe serves fine
    val all = capture(Main.run(spark,
      List("intersect", catDir, "--bbox", "-180,-90,180,90")))
    assert(all.size == nFrames)
  }

  test("create routes a multi-shape North-America boundary through the STRtree join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cli-na").toString
    val burstMapDir = s"$tmp/burst_map"
    grid().write.parquet(burstMapDir)
    val landFile = java.nio.file.Paths.get(s"$tmp/land.wkt")
    java.nio.file.Files.writeString(landFile,
      "POLYGON ((9 3.5, 14 3.5, 14 11.5, 9 11.5, 9 3.5))")
    // two disjoint shapes, one WKT per line (build_frame_db.py:653-655
    // loads a multi-shape NA boundary): one over track 1's lon band
    // (~10-13), one over track 2's (~20-23) but only low latitudes
    val naFile = java.nio.file.Paths.get(s"$tmp/na.wkt")
    java.nio.file.Files.writeString(naFile,
      """POLYGON ((9 0, 14 0, 14 20, 9 20, 9 0))
        |POLYGON ((19 0, 24 0, 24 3, 19 3, 19 0))""".stripMargin)
    val catDir = s"$tmp/catalog"
    Main.run(spark, List("create", burstMapDir, landFile.toString, catDir,
      naFile.toString))
    val frames = spark.read.parquet(s"$catDir/frames")
    // every track-1 frame intersects shape 1; track-2 frames only if their
    // bbox dips below lat 3 (burst rows start at y = 0.8) — both shapes
    // must have contributed hits or the multi-shape routing is broken
    val na = frames.filter($"is_north_america").select($"fid").as[Int].collect().toSet
    val t1 = frames.filter($"relative_orbit_number" === 1)
      .select($"fid").as[Int].collect().toSet
    val t2low = frames.filter($"relative_orbit_number" === 2 && $"bb_ymin" < 3)
      .select($"fid").as[Int].collect().toSet
    assert(t1.nonEmpty && t2low.nonEmpty)
    assert(na == (t1 ++ t2low))
  }

  test("CLI lookup/intersect agree with direct Catalog calls on the sf0.01 build") {
    val d = sf("sf0.01")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cli-oracle").toString
    val burstMapDir = s"$tmp/burst_map"
    graft.operators.Geo.burstGridFixture(spark, d).write.parquet(burstMapDir)
    val landFile = java.nio.file.Paths.get(s"$tmp/land.wkt")
    java.nio.file.Files.writeString(landFile,
      graft.operators.Geo.catalogFixtureLandWkt)
    val catDir = s"$tmp/catalog"
    Main.run(spark, List("create", burstMapDir, landFile.toString, catDir))
    val frames = spark.read.parquet(s"$catDir/frames")
    val fb = spark.read.parquet(s"$catDir/frames_bursts")
    val bim = spark.read.parquet(s"$catDir/burst_id_map")
    val fids = frames.select($"fid").orderBy($"fid").as[Int].collect()
    assert(fids.length > 4)
    // lookup: every frame's CLI JSON == the library call's JSON, verbatim
    fids.foreach { fid =>
      val cli = capture(Main.run(spark, List("lookup", catDir, fid.toString)))
      val direct = Catalog.lookup(frames, fb, bim, fid.toLong).toJSON.collect().toSeq
      assert(cli == direct, s"lookup($fid) diverged")
    }
    // intersect: a probe crossing several frames, both CLI forms vs direct
    val (xmin, ymin, xmax, ymax) = (1.5, 0.5, 18.0, 13.0)
    val direct = Catalog.intersect(frames,
        Catalog.bboxWkt(xmin, ymin, xmax, ymax), (xmin, ymin, xmax, ymax))
      .select($"fid", $"epsg", $"is_land", $"orbit_pass")
      .toJSON.collect().toSeq
    val cli = capture(Main.run(spark,
      List("intersect", catDir, "--bbox", s"$xmin,$ymin,$xmax,$ymax")))
    val cliWkt = capture(Main.run(spark, List("intersect", catDir, "--wkt",
      Catalog.bboxWkt(xmin, ymin, xmax, ymax))))
    assert(direct.nonEmpty && cli == direct && cliWkt == direct)
  }
}
