package graft

import org.apache.spark.sql.functions._

/** Driver-side exact replays of the survival/trend statistics:
  * Kaplan-Meier's integer q6 running product over the duration
  * timeline, Mann-Kendall's tie-corrected S/variance/z, and
  * Theil-Sen's deterministic median-pair pick — recomputed with plain
  * collections from raw events and compared cell-for-cell.
  */
class SurvivalTrendCrossCheckSpec extends SparkSpec {

  private def events(dir: String): Array[(Long, Long, String)] =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("di"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("kaplan-meier equals an exact integer running product") {
    val dir = sf("sf0.01")
    val ev = events(dir)
    val maxd = ev.map(_._2).max
    val obs = ev.groupBy(_._1).values.map { g =>
      val d0 = g.map(_._2).min
      val errs = g.filter(_._3 == "error").map(_._2)
      if (errs.nonEmpty) (errs.min - d0, 1L) else (maxd - d0, 0L)
    }.toSeq
    val byt = obs.groupBy(_._1).map { case (t, g) =>
      (t, g.map(_._2).sum, g.length.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = obs.length.toLong
    var sQ = 1000000L
    val expected = byt.map { case (t, dEv, cnt) =>
      val nRisk = atRisk
      sQ = sQ * (nRisk - dEv) / nRisk
      atRisk -= cnt
      (t, nRisk, dEv, sQ)
    }
    val got = SparkEntry.queries("q_kaplan_meier")(spark, dir).collect()
      .map(r => (r.getAs[Long]("duration_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("surv_q6"))).toSeq
    assert(got == expected, s"got ${got.take(4)}… expected ${expected.take(4)}…")
  }

  test("mann-kendall equals a driver-side pair scan with tie correction") {
    val dir = sf("sf0.01")
    val daily = events(dir).groupBy(e => (e._3, e._2)).view
      .mapValues(_.length.toLong).toSeq
      .map { case ((t, di), x) => (t, di, x) }
    val expected = daily.groupBy(_._1).map { case (t, g) =>
      val pts = g.sortBy(_._2)
      val sStat = (for (i <- pts.indices; j <- (i + 1) until pts.length)
        yield java.lang.Long.signum(pts(j)._3 - pts(i)._3).toLong).sum
      val n = pts.length.toLong
      val tie18 = pts.groupBy(_._3).values
        .map(v => { val c = v.length.toLong; c * (c - 1) * (2 * c + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie18
      val z = if (var18 <= 0) None
        else Some(math.floor((sStat - java.lang.Long.signum(sStat))
          * 1000000.0 / math.sqrt(var18 * 1.0 / 18.0)).toLong)
      t -> ((n, sStat, z))
    }
    val got = SparkEntry.queries("q_mann_kendall")(spark, dir).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (n, sStat, z) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("s_stat") == sStat)
      assert((if (r.isNullAt(r.fieldIndex("z_q6"))) None
        else Some(r.getAs[Long]("z_q6"))) == z)
    }
  }

  test("theil-sen equals the deterministic median pair pick") {
    val dir = sf("sf0.01")
    val daily = events(dir).groupBy(e => (e._3, e._2)).view
      .mapValues(_.length.toLong).toSeq
      .map { case ((t, di), x) => (t, di, x) }
    val expected = daily.groupBy(_._1).map { case (t, g) =>
      val pts = g.sortBy(_._2)
      val pairs = for (i <- pts.indices; j <- (i + 1) until pts.length) yield {
        val (_, d1, x1) = pts(i); val (_, d2, x2) = pts(j)
        (math.floor((x2 - x1) * 1000000.0 / (d2 - d1)).toLong, d1, d2)
      }
      val sorted = pairs.sortBy { case (sl, d1, d2) => (sl, d1, d2) }
      val m = sorted.length.toLong
      t -> ((m, sorted(((m + 1) / 2 - 1).toInt)._1))
    }
    val got = SparkEntry.queries("q_theilsen")(spark, dir).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (m, sl) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_pairs") == m && r.getAs[Long]("ts_slope_q6") == sl,
        s"${r.getAs[String]("event_type")}: " +
          s"(${r.getAs[Long]("n_pairs")},${r.getAs[Long]("ts_slope_q6")}) vs ($m,$sl)")
    }
  }
}
