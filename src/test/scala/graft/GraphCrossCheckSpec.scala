package graft

import org.apache.spark.sql.functions._

/** Driver-side integer-recursion replays of the iterative graph/chain
  * operators: PageRank's floor-quantized rounds over a mutable array and
  * the Markov conversion chain's T⁸-by-squaring over a nested map. The
  * unrolled DuckDB oracles replay the same recursion in SQL; these add a
  * third voice with no join/window machinery at all, so a formulation
  * bug shared by both engines would still be caught.
  */
class GraphCrossCheckSpec extends SparkSpec {

  test("pagerank top-20 equals an exact integer recursion") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val n = docs.length.toLong
    val edges = for (src <- docs; j <- 1 to 3) yield (src, (src * 7 + j) % n)
    var rank = docs.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((src, dst) <- edges)
        in(dst) += math.floor(rank(src) * 850000.0 / 3000000.0).toLong
      rank = docs.map(d => d -> (150000L + in(d))).toMap
    }
    val expected = rank.toSeq.sortBy { case (d, r) => (-r, d) }.take(20)
    val got = SparkEntry.queries("q_pagerank")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_q6"))).toSeq
    assert(got == expected)
  }

  test("anf equals an exact driver-side register simulation") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val n = docs.length.toLong
    val P = 2147483647L
    def mix(key: Long): Long = {
      val x1 = (((key % P + P) % P) * 2654435761L + 104729L) % P
      val x3 = ((x1 ^ (x1 >> 15)) * 104729L + 12345L) % P
      x3 ^ (x3 >> 13)
    }
    def bitLen25(w: Long): Long = (0 until 25).count(j => w >= (1L << j)).toLong
    // r0: each vertex's own (bucket, rho); rounds merge OUT-neighbors'
    // registers bucket-wise by max — the HyperANF ball advance
    val edges = docs.flatMap(src => (1 to 3).map(j => (src, (src * 7 + j) % n)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var reg: Map[Long, Map[Long, Long]] = docs.map { v =>
      val hv = mix(v)
      v -> Map((hv & 63L) -> (26L - bitLen25(hv >> 6)))
    }.toMap
    def readout(round: Long): (Long, Long, Long, Long) = {
      var present = 0L; var srho = 0L; var est = 0L
      for (v <- docs) {
        val rs = reg(v)
        present += rs.size; srho += rs.values.sum
        val z = rs.values.map(r => 1.0 / (1L << r)).sum + (64 - rs.size) * 1.0
        est += math.floor(0.709 * 64 * 64 / z).toLong
      }
      (docs.length.toLong, present, srho, est)
    }
    val expected = scala.collection.mutable.ListBuffer(readout(0))
    for (_ <- 1 to 3) {
      reg = docs.map { v =>
        val merged = (reg(v).toSeq ++ edges.getOrElse(v, Array.empty[Long])
          .flatMap(d => reg(d).toSeq))
          .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        v -> merged
      }.toMap
      expected += readout(expected.size.toLong)
    }
    val got = SparkEntry.queries("q_anf")(spark, dir)
      .orderBy(col("round")).collect()
    for ((r, i) <- got.zipWithIndex) {
      val (nv, np, sr, se) = expected(i)
      assert(r.getAs[Long]("n_vertices") == nv && r.getAs[Long]("sum_present") == np
        && r.getAs[Long]("sum_rho") == sr && r.getAs[Long]("sum_ball_est") == se,
        s"round $i: (${r.getAs[Long]("n_vertices")},${r.getAs[Long]("sum_present")}," +
          s"${r.getAs[Long]("sum_rho")},${r.getAs[Long]("sum_ball_est")}) vs ($nv,$np,$sr,$se)")
    }
  }

  test("markov conversion equals T^8-by-squaring over a driver-side map") {
    val dir = sf("sf0.001")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(x => (x._2, x._3)).map(_._4)
      s.zip(s.drop(1))
    }.filter(_._1 != "purchase")
    val counts = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowSum = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    // t1 with the absorbing purchase self-loop, q6 integer probabilities
    var t: Map[(String, String), Long] =
      counts.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowSum(a) } +
        (("purchase", "purchase") -> 1000000L)
    for (_ <- 1 to 3) {
      val next = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for (((a, b), p1) <- t; ((b2, c), p2) <- t if b2 == b)
        next((a, c)) += p1 * p2
      t = next.map { case (k, v) => k -> v / 1000000L }.toMap
    }
    val expected = t.collect {
      case ((a, "purchase"), p) if a != "purchase" => (a, p)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_markov_conversion")(spark, dir).collect()
      .map(r => (r.getAs[String]("start_state"), r.getAs[Long]("p_convert8_q6"))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }
}
