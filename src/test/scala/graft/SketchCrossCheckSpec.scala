package graft

import org.apache.spark.sql.functions._

/** Third-voice replays for the sketch family: the hash formulas are part
  * of the cross-engine CONTRACT (the SQL twins replay them already), so
  * these tests re-derive the full sketch pipelines — registers, minima,
  * estimates — in plain driver-side Scala from the collected raw keys,
  * sharing no code with either engine, and demand exact equality with the
  * registered queries. Plus the estimator-contract property the
  * differential can't express: Count-Min never underestimates, for EVERY
  * key (not just the 10 the query reports).
  */
class SketchCrossCheckSpec extends SparkSpec {

  private val P = 2147483647L

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  // ------------------------------------------------------------ CountMin

  test("q_countmin_heavy: sketch build + min-estimate replayed exactly; one-sided for every key") {
    val keys = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val depth = 4; val width = 256L
    val as = (0 until depth).map(i => 104729L * (i + 1) + 12345L)
    val bs = (0 until depth).map(i => 7919L * (i + 1) + 271L)
    def bucket(k: Long, i: Int): Long = pmod(pmod(k * as(i) + bs(i), P), width)

    val cnt = Array.fill(depth)(new Array[Long](width.toInt))
    keys.foreach { k =>
      var i = 0
      while (i < depth) { cnt(i)(bucket(k, i).toInt) += 1; i += 1 }
    }
    val exact = keys.groupBy(identity).map { case (k, a) => k -> a.length.toLong }
    def est(k: Long): Long = (0 until depth).map(i => cnt(i)(bucket(k, i).toInt)).min

    // the one-sided error contract, over the FULL key domain
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: ${est(k)} < $n")
    }

    val heavy = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
    val replay = heavy.map { case (k, n) => (k, n, est(k)) }
    val got = SparkEntry.queries("q_countmin_heavy")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == replay, "CMS heavy-hitter estimates diverged from the replay")
  }

  // ----------------------------------------------------------------- HLL

  private def hllMix(k: Long): Long = {
    val x0 = pmod(k, P)
    val x1 = pmod(x0 * 2654435761L + 104729L, P)
    val x3 = pmod((x1 ^ (x1 >> 15)) * 104729L + 12345L, P)
    x3 ^ (x3 >> 13)
  }

  private def bitLen25(w: Long): Long =
    (0 until 25).map(j => if (w >= (1L << j)) 1L else 0L).sum

  test("q_hll_distinct: register table and estimate replayed exactly") {
    val keys = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val reg = new Array[Long](64)
    keys.foreach { k =>
      val hv = hllMix(k)
      val b = (hv & 63L).toInt
      val rho = 26L - bitLen25(hv >> 6)
      if (rho > reg(b)) reg(b) = rho
    }
    // z = sum of 2^-maxrho: every term is dyadic with exponent >= -26 and
    // the total is < 64, so the double sum is EXACT in any order — the
    // engines' differing aggregation orders cannot diverge here
    val z = reg.map(r => 1.0 / (1L << r).toDouble).sum
    val nEmpty = reg.count(_ == 0L)
    val estimate = math.floor(0.709 * 64 * 64 / z).toLong
    val nExact = keys.distinct.length.toLong

    val got = SparkEntry.queries("q_hll_distinct")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got == ((nExact, estimate, nEmpty.toLong)),
      s"HLL replay diverged: engine $got vs replay ($nExact, $estimate, $nEmpty)")
  }
}
