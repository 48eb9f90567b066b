package graft

import org.apache.spark.sql.functions._

/** Driver-side replays of the three historically heaviest iterative
  * operators — k-core peeling, Spearman's doubled-mid-rank correlation,
  * and the Bradley-Terry MM recursion (a past floor-contract bug site) —
  * each recomputed from the raw tables with plain collections and
  * compared exactly against the registered queries.
  */
class HeavyOpsCrossCheckSpec extends SparkSpec {

  test("kcore census equals a driver-side synchronous peel") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val n = docs.length.toLong
    val ue = docs.flatMap(src => (1 to 3).map(j => (src, (src * 7 + j) % n)))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var surv = ue.flatMap(e => Seq(e._1, e._2)).distinct.toSet
    val expected = scala.collection.mutable.ListBuffer(
      (0L, surv.size.toLong, surv.sum))
    for (r <- 1 to 4) {
      val induced = ue.filter(e => surv(e._1) && surv(e._2))
      val deg = induced.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      surv = deg.filter(_._2 >= 3).keySet.toSet
      expected += ((r.toLong, surv.size.toLong, surv.sum))
    }
    val got = SparkEntry.queries("q_kcore")(spark, dir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_core"),
        r.getAs[Long]("sum_ids"))).toSeq
    assert(got == expected.toSeq, s"got $got expected $expected")
  }

  test("spearman equals a driver-side doubled-mid-rank recomputation") {
    val dir = sf("sf0.01")
    val base = Tables.lineitem(spark, dir).select(
        col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def doubled(vals: Seq[Long]): Map[Long, Long] = {
      val cnt = vals.groupBy(identity).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      cnt.keys.toSeq.sorted.map { v =>
        val r2 = 2 * cum + cnt(v) + 1; cum += cnt(v); v -> r2
      }.toMap
    }
    val expected = base.groupBy(_._1).map { case (g, rows) =>
      val rx = doubled(rows.map(_._2)); val ry = doubled(rows.map(_._3))
      val nn1 = rows.length + 1L
      var sxy = BigInt(0); var sxx = BigInt(0); var syy = BigInt(0)
      for ((_, x, y) <- rows) {
        val dx = BigInt(rx(x) - nn1); val dy = BigInt(ry(y) - nn1)
        sxy += dx * dy; sxx += dx * dx; syy += dy * dy
      }
      val rho = if (sxx == 0 || syy == 0) None
        else Some(math.floor(sxy.toDouble / math.sqrt(sxx.toDouble)
          / math.sqrt(syy.toDouble) * 1000000.0).toLong)
      g -> ((rows.length.toLong, rho))
    }
    val got = SparkEntry.queries("q_spearman")(spark, dir).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (n, rho) = expected(r.getAs[String]("g"))
      assert(r.getAs[Long]("n") == n)
      assert((if (r.isNullAt(r.fieldIndex("rho_q6"))) None
        else Some(r.getAs[Long]("rho_q6"))) == rho,
        s"${r.getAs[String]("g")}: rho mismatch")
    }
  }

  test("bradley-terry equals a driver-side MM recursion with the 1-floor") {
    val dir = sf("sf0.001")
    val op = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byOrder = op.groupBy(_._1)
    val pairs: Seq[(Long, Long, Long)] = byOrder.values.toSeq.flatMap {
      g: Array[(Long, Long, Long)] =>
        g.toSeq.flatMap(a => g.toSeq
          .filter(b => a._2 != b._2 && a._3 != b._3)
          .map(b => (a._2, b._2, if (a._3 > b._3) 1L else 0L)))
    }
    val cn = pairs.groupBy(p => (p._1, p._2)).map { case (k, g) =>
      k -> ((g.length.toLong, g.map(_._3).sum))
    }
    val wi = cn.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._2).sum).toMap
    val nc = cn.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._1).sum).toMap
    var s = cn.keys.map(_._1).toSeq.distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val dd = cn.toSeq.groupBy(_._1._1).view.mapValues { g =>
        g.map { case ((i, j), (nIj, _)) => nIj * 1000000000000L / (s(i) + s(j)) }.sum
      }.toMap
      s = s.keys.map { i =>
        i -> math.max(
          math.floor(wi.getOrElse(i, 0L).toDouble * 1.0e12 / dd(i).toDouble).toLong, 1L)
      }.toMap
    }
    val expected = s.toSeq.sortBy { case (i, v) => (-v, i) }.take(50)
      .map { case (i, v) => (i, wi.getOrElse(i, 0L), nc(i), v) }
    val got = SparkEntry.queries("q_bradley_terry")(spark, dir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("n_wins"),
        r.getAs[Long]("n_contests"), r.getAs[Long]("strength_q6"))).toSeq
    assert(got == expected,
      s"got ${got.take(3)}… expected ${expected.take(3)}…")
  }
}
