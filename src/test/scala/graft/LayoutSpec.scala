package graft

import java.nio.file.Files

import graft.domain.Blackout
import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write enables partition pruning") {
    val tmp = Files.createTempDirectory("graft-layout").toString
    val ev = Tables.events(spark, sf())
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    Layout.writePartitioned(ev, s"$tmp/events", Seq("day"))

    val read = spark.read.parquet(s"$tmp/events").filter($"day" === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no pruning:\n$plan")
    // pruned read returns exactly that day's rows
    val want = ev.filter($"day" === "2024-01-02").count()
    assert(read.count() == want && want > 0)
  }

  test("bucketed tables join without any exchange") {
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val orders = Tables.orders(spark, sf())
    val lineitem = Tables.lineitem(spark, sf())
    Layout.writeBucketed(orders, "b_orders", s"$tmp/o", "o_orderkey", 8)
    Layout.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$tmp/l", "o_orderkey", 8)
    try {
      val j = spark.table("b_orders").join(spark.table("b_lineitem"), Seq("o_orderkey"))
        .groupBy($"o_orderstatus").count()
      val plan = j.queryExecution.executedPlan.toString
      // bucketed-by-join-key tables: no shuffle before the join
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the plain join
      val want = orders.join(
          lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"))
        .groupBy($"o_orderstatus").count()
        .as[(String, Long)].collect().toMap
      val got = j.as[(String, Long)].collect().toMap
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted aggregation matches direct aggregation on skewed keys") {
    // heavy skew: 90% of rows share key 0
    val df = spark.range(0, 10000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(0L)).as("k"),
        ($"id" % 100).cast("double").as("v"))
    val direct = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy($"k").as[(Long, Long, Double)].collect().toSeq
    val salted = Layout.saltedSumCount(df, $"k", salts = 8, sumCols = Seq("v"))
      .orderBy($"key").as[(Long, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("z-order key interleaves bits") {
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 3L, 14L), (5L, 0L, 17L))
    val df = cases.toDF("x", "y", "want")
    val got = df.select(Layout.zOrderKey($"x", $"y", 8).as("z"), $"want")
      .as[(Long, Long)].collect()
    got.foreach { case (z, want) => assert(z == want) }
  }

  test("spatial clustering shrinks per-partition extents") {
    val pts = Tables.customer(spark, sf("sf0.01"))
      .select($"c_custkey",
        (($"c_custkey" * 37) % 1000).cast("double").as("x"),
        (($"c_custkey" * 73) % 1000).cast("double").as("y"))
    val clustered = Layout.spatialCluster(pts, $"x", $"y", 0, 1000, 0, 1000,
      partitions = 8)
    val extents = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid")
      .agg(((max($"x") - min($"x")) * (max($"y") - min($"y"))).as("area"),
        count(lit(1)).as("n"))
      .as[(Int, Double, Long)].collect()
    assert(extents.length > 1)
    val avgArea = extents.map(_._2).sum / extents.length
    // each Z-range partition covers a compact region, far below the
    // global 1000×1000 extent
    assert(avgArea < 1000.0 * 1000.0 / 3, s"avg partition area $avgArea")
    // clustering preserves all rows
    assert(extents.map(_._3).sum == pts.count())
  }

  test("blackout find_seasons hand-traced case") {
    // one key, one water year: a 3-day run (too short), then a 6-day run,
    // then stragglers; minRun=5, minTotal=8
    val days = Seq(
      // short run Nov 1-3
      "2020-11-01", "2020-11-02", "2020-11-03",
      // significant run Dec 1-6
      "2020-12-01", "2020-12-02", "2020-12-03", "2020-12-04", "2020-12-05",
      "2020-12-06",
      // last bad day Feb 10
      "2021-02-10")
    val all = (0 until 200).map(i =>
      java.sql.Date.valueOf(java.time.LocalDate.parse("2020-10-01").plusDays(i)))
    val df = all.map(d => (1L, d, days.contains(d.toString))).toDF("key", "day", "bad")
    val out = Blackout.findSeasons(df, pivotMonth = 10, minTotal = 8, minRun = 5)
      .as[(Long, Int, java.sql.Date, java.sql.Date, Long)].collect().toSeq
    assert(out == Seq((1L, 2020,
      java.sql.Date.valueOf("2020-12-01"), java.sql.Date.valueOf("2021-02-10"), 10L)))
    // raising minTotal above the bad-day count yields nothing
    assert(Blackout.findSeasons(df, 10, minTotal = 11, minRun = 5).count() == 0)
  }

  test("yearly windows wrap the calendar year") {
    val tmpl = Seq((1L, 11, 1, 5, 31)).toDF("key", "s_month", "s_day", "e_month", "e_day")
    val w = Blackout.yearlyWindows(tmpl, Seq(2016, 2017))
      .orderBy($"yr")
      .select($"window_start".cast("string"), $"window_end".cast("string"))
      .as[(String, String)].collect().toSeq
    assert(w == Seq(
      ("2016-11-01 00:00:00", "2017-05-31 23:59:59"),
      ("2017-11-01 00:00:00", "2018-05-31 23:59:59")))
  }
}
