package graft

import graft.operators.Windows

/** Invariants of the round-9 statistics/analytics operators that the
  * DuckDB oracle can't phrase: the Wilson bound's shrink-toward-zero
  * property, the Holt fold's fixpoint/tracking behavior (closed-form
  * cases of the exact-halving recursion), churn-flow conservation, and
  * chi-square contribution consistency.
  */
class StatsOpsSpec extends SparkSpec {

  test("wilson lower bound sits below the point estimate, inside [0, 1]") {
    val rows = SparkEntry.queries("q_wilson_lb")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val lb = r.getAs[Long]("wilson_lb_q6")
      assert(lb >= 0 && lb <= 1000000, s"bound out of band: $lb")
      assert(lb <= k * 1000000 / n + 1, s"bound above point estimate: $lb vs $k/$n")
    }
    // descending by bound (the ranking contract)
    val lbs = rows.map(_.getAs[Long]("wilson_lb_q6")).toSeq
    assert(lbs.zip(lbs.tail).forall { case (a, b) => b <= a })
  }

  test("holt fold: constant series is a fixpoint, ramp tracks its slope") {
    // constant x: l seeds at x·100 (trend 0) and never moves
    var l = 4200L; var b = 0L
    for (_ <- 1 to 50) { val (l2, b2) = Windows.holtStep(l, b, 4200L); l = l2; b = b2 }
    assert(l == 4200L && b == 0L)
    // ramp x_t = 100·t (centi-units): the trend state converges to the
    // true per-step slope (100) and the level tracks the input closely
    l = 100L; b = 0L
    var x = 100L
    for (_ <- 1 to 60) { x += 100L; val (l2, b2) = Windows.holtStep(l, b, x); l = l2; b = b2 }
    assert(math.abs(b - 100L) <= 2, s"trend $b should track slope 100")
    assert(math.abs(l - x) <= 300, s"level $l should track input $x")
  }

  test("churn flow conserves weekly actives and total users") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_churn_flow")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val du = Tables.events(spark, sf())
      .select(expr("unix_micros(ts) div 86400000000 div 7").as("wk"), col("user_id"))
      .distinct()
    val weekly = du.groupBy("wk").count().collect()
      .map(r => r.getAs[Long]("wk") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val total = r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
        r.getAs[Long]("n_resurrected")
      assert(total == weekly(r.getAs[Long]("week")),
        s"week ${r.getAs[Long]("week")}: $total != ${weekly(r.getAs[Long]("week"))}")
    }
    val sumNew = rows.map(_.getAs[Long]("n_new")).sum
    val nUsers = du.select("user_id").distinct().count()
    assert(sumNew == nUsers, s"every user is new exactly once: $sumNew != $nUsers")
  }

  test("chi-square statistic equals the sum of its cell contributions") {
    val rows = SparkEntry.queries("q_chi2_independence")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val chi2 = rows.head.getAs[Long]("chi2_q6")
    assert(rows.forall(_.getAs[Long]("chi2_q6") == chi2))
    assert(rows.forall(_.getAs[Long]("contrib_q6") >= 0))
    assert(rows.map(_.getAs[Long]("contrib_q6")).sum == chi2)
  }

  test("clamped balance closed form equals the sequential Lindley fold") {
    // the window formulation B_t = S_t − min(0, min_{k≤t} S_k) must agree
    // with the literal recursion B_t = max(0, B_{t−1} + x_t) on real data
    val out = SparkEntry.queries("q_clamped_balance")(spark, sf()).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("n_moves"), r.getAs[Long]("end_bal"),
          r.getAs[Long]("peak_bal"), r.getAs[Long]("n_floor_hits"))).toMap
    val rows = Tables.lineitem(spark, sf())
      .select(org.apache.spark.sql.functions.col("l_partkey"),
        org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_returnflag"),
        // TIMESTAMP_NTZ casts to neither long nor Timestamp here; its ISO
        // string form orders chronologically, which is all the fold needs
        org.apache.spark.sql.functions.expr("cast(l_shipdate as string)").as("ship_s"),
        org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_linenumber")).collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        if (r.getAs[String]("l_returnflag") == "R") -r.getAs[Double]("l_quantity").toLong
        else r.getAs[Double]("l_quantity").toLong,
        (r.getAs[String]("ship_s"),
          r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))))
    val folded = rows.groupBy(_._1).map { case (pk, mv) =>
      var bal = 0L; var peak = 0L; var hits = 0L
      mv.sortBy(_._3).foreach { case (_, x, _) =>
        val next = bal + x
        bal = if (next < 0) 0L else next
        // a floor hit = a return that left the balance at the floor
        // (includes exact-zero landings, matching bal == 0 ∧ x < 0)
        if (x < 0 && bal == 0L) hits += 1
        if (bal > peak) peak = bal
      }
      pk -> (mv.length.toLong, bal, peak, hits)
    }
    assert(out.size == folded.size)
    folded.foreach { case (pk, v) => assert(out(pk) == v, s"part $pk: ${out(pk)} vs $v") }
  }

  test("spearman is ±1e6 on perfectly monotone data, bounded on real data") {
    val rows = SparkEntry.queries("q_spearman")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getAs[Long]("rho_q6")
      assert(rho >= -1000000 && rho <= 1000000, s"rho out of band: $rho")
    }
  }
}
