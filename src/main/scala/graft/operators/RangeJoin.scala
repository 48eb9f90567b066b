package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — `points.t BETWEEN intervals.lo AND hi`
  * as a shuffled EQUI-join, the scale path for interval predicates.
  *
  * A raw inequality join has no equi-key, so Spark plans a broadcast
  * nested loop: O(|points|·|intervals|) comparisons and a hard requirement
  * that one side fits in memory — wrong at 100 TB where both sides are
  * large (the reference's blackout-date window checks against full-history
  * acquisitions, create_blackout_dates_s1.py's date-window semantics).
  * Bucketing restores an equi-key: quantize the line into `width`-sized
  * cells, emit each interval once per cell it overlaps, map each point to
  * its single cell, hash-join on the cell id, then refine with the exact
  * BETWEEN. Each point lands in exactly one cell, so a (point, interval)
  * pair meets at most once — no post-join dedup needed. Both sides
  * shuffle-partition by cell: fully distributed, combiner-friendly, AQE
  * handles residual cell skew. Pick `width` near the typical interval
  * length so intervals explode into ~2 cells (the blowup is
  * 1 + len/width per interval).
  */
object RangeJoin {

  /** Inner join of `points` (numeric column `tCol`) with `intervals`
    * (numeric `loCol`..`hiCol`, inclusive both ends). Column names must be
    * distinct across the two sides. Returns points.* ++ intervals.*. */
  def bucketed(points: DataFrame, tCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(!intervals.columns.contains(tCol) &&
      !points.columns.contains(loCol) && !points.columns.contains(hiCol),
      "point/interval column names must not collide")
    val pb = points.withColumn("__pb", floor(col(tCol) / width).cast("long"))
    val ib = intervals.withColumn("__ib",
      explode(sequence(floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    pb.join(ib, pb("__pb") === ib("__ib") &&
        col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__pb", "__ib")
  }

  val queries: Seq[QueryDef] = Seq(
    // monthly audit dates × synthetic in-transit windows over lineitem
    // (ship date + deterministic 3..30-day transit): for each audit date,
    // how many shipments were in transit — the classic point-in-interval
    // aggregation, run through the bucketed equi-join plan
    QueryDef.sql(
      "q_range_join_bucketed",
      """WITH audits AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(d AS DATE)) AS BIGINT) AS t
        |  FROM (SELECT UNNEST(GENERATE_SERIES(DATE '1995-01-01', DATE '2001-12-01',
        |                                      INTERVAL 1 MONTH)) AS d)),
        |iv AS (
        |  SELECT
        |    CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS lo,
        |    CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      + (l_orderkey * 7 + l_linenumber) % 28 + 3 AS BIGINT) AS hi
        |  FROM lineitem)
        |SELECT t AS audit_day, CAST(COUNT(*) AS BIGINT) AS n_in_transit
        |FROM audits a JOIN iv ON a.t >= iv.lo AND a.t <= iv.hi
        |GROUP BY t ORDER BY audit_day""".stripMargin) { (s, d) =>
      val epoch = lit("1970-01-01")
      val iv = Tables.lineitem(s, d).select(
        datediff(col("l_shipdate"), epoch).cast("long").as("lo"),
        (datediff(col("l_shipdate"), epoch)
          + (col("l_orderkey") * 7 + col("l_linenumber")) % 28 + 3)
          .cast("long").as("hi"))
      val audits = s.range(0, 84).select(
        make_date((col("id") / 12 + 1995).cast("int"),
          (col("id") % 12 + 1).cast("int"), lit(1)).as("d"))
        .select(datediff(col("d"), epoch).cast("long").as("t"))
      bucketed(audits, "t", iv, "lo", "hi", width = 32)
        .groupBy(col("t").as("audit_day"))
        .agg(count(lit(1)).as("n_in_transit"))
        .orderBy(col("audit_day"))
    }
  )
}
