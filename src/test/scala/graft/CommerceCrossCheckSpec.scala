package graft

import org.apache.spark.sql.functions._

/** Driver-side replays of the commerce/event sequential semantics: the
  * FIFO layer-matching interval algebra recomputed as an actual
  * first-in-first-out consumption simulation (a genuinely different
  * formulation — a running two-pointer walk instead of the engines'
  * interval-overlap join), and the strictly-ordered funnel recomputed
  * as per-user timestamp scans.
  */
class CommerceCrossCheckSpec extends SparkSpec {

  test("fifo match equals a two-pointer consumption simulation") {
    val dir = sf("sf0.01")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        col("l_returnflag"), col("l_shipdate").cast("string").as("sd"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getInt(5).toLong))
    val expected = li.groupBy(_._1).map { case (pk, rows) =>
      def ordered(f: String => Boolean) =
        rows.filter(x => f(x._3)).sortBy(x => (x._4, x._5, x._6)).map(_._2)
      val recv = ordered(_ != "R"); val ret = ordered(_ == "R")
      // actual FIFO walk: returns consume the oldest open receipt layer
      var i = 0; var j = 0
      var remR = if (recv.nonEmpty) recv(0) else 0L
      var remT = if (ret.nonEmpty) ret(0) else 0L
      var matches = 0L; var qty = 0L
      while (i < recv.length && j < ret.length) {
        val m = math.min(remR, remT)
        if (m > 0) { matches += 1; qty += m; remR -= m; remT -= m }
        if (remR == 0) { i += 1; if (i < recv.length) remR = recv(i) }
        if (remT == 0) { j += 1; if (j < ret.length) remT = ret(j) }
      }
      pk -> ((matches, qty, ret.sum - qty, recv.sum - qty))
    }
    val got = SparkEntry.queries("q_fifo_match")(spark, dir).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (m, q, ur, ls) = expected(r.getAs[Long]("l_partkey"))
      assert(r.getAs[Long]("n_matches") == m
        && r.getAs[Long]("matched_qty") == q
        && r.getAs[Long]("unmatched_returns") == ur
        && r.getAs[Long]("leftover_stock") == ls,
        s"part ${r.getAs[Long]("l_partkey")}: " +
          s"(${r.getAs[Long]("n_matches")},${r.getAs[Long]("matched_qty")}," +
          s"${r.getAs[Long]("unmatched_returns")},${r.getAs[Long]("leftover_stock")})" +
          s" vs ($m,$q,$ur,$ls)")
    }
  }

  test("ordered funnel equals per-user timestamp scans") {
    val dir = sf("sf0.01")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    var nV = 0L; var nC = 0L; var nP = 0L
    for ((_, g) <- byUser) {
      val views = g.filter(_._3 == "view").map(_._2)
      if (views.nonEmpty) {
        nV += 1
        val t0 = views.min
        val clicks = g.filter(x => x._3 == "click" && x._2 > t0).map(_._2)
        if (clicks.nonEmpty) {
          nC += 1
          val t1 = clicks.min
          if (g.exists(x => x._3 == "purchase" && x._2 > t1)) nP += 1
        }
      }
    }
    val r = SparkEntry.queries("q_funnel")(spark, dir).collect().head
    assert(r.getAs[Long]("n_viewed") == nV
      && r.getAs[Long]("n_clicked_after") == nC
      && r.getAs[Long]("n_purchased_after") == nP,
      s"(${r.getAs[Long]("n_viewed")},${r.getAs[Long]("n_clicked_after")}," +
        s"${r.getAs[Long]("n_purchased_after")}) vs ($nV,$nC,$nP)")
  }
}
