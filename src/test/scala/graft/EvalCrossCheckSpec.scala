package graft

import org.apache.spark.sql.functions._

/** Exact driver-side replays of the ML-evaluation readouts: the
  * language scores are recomputed from the raw text with plain
  * java.lang.String arithmetic (the same non-overlapping REPLACE
  * semantics both engines use), then binned/deciled with the documented
  * integer tie contracts — every output cell must match the engine
  * bit-for-bit.
  */
class EvalCrossCheckSpec extends SparkSpec {

  private def hits(p: String, pat: String): Long =
    ((p.length - p.replace(pat, "").length) / pat.length).toLong

  /** (lang, s_en, s_de, s_fr, s_es) rows replicating Eval's scored CTE. */
  private def scoredRows(dir: String): Array[(String, Long, Long, Long, Long)] =
    Tables.documents(spark, dir).select(col("lang"), col("text"))
      .collect().map { r =>
        val p = " " + r.getString(1).toLowerCase + " "
        (r.getString(0),
          hits(p, " the ") + hits(p, " and "),
          hits(p, " der ") + hits(p, " und "),
          hits(p, " le ") + hits(p, " et "),
          hits(p, " el ") + hits(p, " y "))
      }

  test("calibration bins equal an exact text-score replay") {
    val dir = sf("sf0.01")
    val rows = scoredRows(dir).map { case (lang, en, de, fr, es) =>
      val tot = en + de + fr + es
      (math.min(9L, (en + 1) * 10 / (tot + 4)),
        (en + 1) * 1000000L / (tot + 4),
        if (lang == "en") 1L else 0L)
    }
    val expected = rows.groupBy(_._1).map { case (bin, g) =>
      val n = g.length.toLong; val pos = g.map(_._3).sum; val sp = g.map(_._2).sum
      bin -> ((n, pos, sp / n, pos * 1000000L / n))
    }
    val got = SparkEntry.queries("q_calibration_bins")(spark, dir).collect()
    assert(got.length == expected.size)
    for (r <- got) {
      val (n, pos, mp, rate) = expected(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("n_pos") == pos)
      assert(r.getAs[Long]("mean_pred_q6") == mp)
      assert(r.getAs[Long]("rate_q6") == rate)
      assert(r.getAs[Long]("gap_q6") == math.abs(mp - rate))
    }
  }

  test("lift/gain deciles equal an exact text-score replay") {
    val dir = sf("sf0.01")
    val rows = scoredRows(dir)
    val n = rows.length.toLong
    val p = rows.count(_._1 == "en").toLong
    // whole-cell decile assignment by exclusive cumulative start,
    // score descending (the documented tie contract)
    val hist = rows.groupBy(_._2).map { case (sc, g) =>
      (sc, g.length.toLong, g.count(_._1 == "en").toLong)
    }.toSeq.sortBy(-_._1)
    var cumb = 0L
    val byDec = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, t, c1) <- hist) {
      val dec = math.min(9L, cumb * 10 / n)
      val (a, b) = byDec.getOrElse(dec, (0L, 0L))
      byDec(dec) = (a + t, b + c1)
      cumb += t
    }
    val got = SparkEntry.queries("q_lift_gain")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("decile")).toSeq == byDec.keys.toSeq.sorted)
    var cn = 0L; var cp = 0L
    for (r <- got) {
      val (nD, posD) = byDec(r.getAs[Long]("decile"))
      cn += nD; cp += posD
      assert(r.getAs[Long]("n") == nD && r.getAs[Long]("n_pos") == posD)
      assert(r.getAs[Long]("cum_n") == cn && r.getAs[Long]("cum_pos") == cp)
      assert(r.getAs[Long]("gain_q6") == cp * 1000000L / p)
      assert(r.getAs[Long]("lift_q6") == cp * n * 1000000L / (cn * p))
    }
    // the last decile row closes the books on the whole corpus
    assert(cn == n && cp == p)
  }

  test("auc-roc equals the exact rank-sum over the replayed scores") {
    val dir = sf("sf0.01")
    val rows = scoredRows(dir).map(r => (r._2, if (r._1 == "en") 1L else 0L))
    val n1 = rows.count(_._2 == 1L).toLong
    val n0 = rows.length - n1
    // doubled mid-ranks ascending over the score histogram
    val hist = rows.groupBy(_._1).map { case (sc, g) =>
      (sc, g.length.toLong, g.count(_._2 == 1L).toLong)
    }.toSeq.sortBy(_._1)
    var cumb = 0L
    var r2 = 0L
    for ((_, t, c1) <- hist) {
      r2 += c1 * (2 * cumb + t + 1)
      cumb += t
    }
    val auc = (r2 - n1 * (n1 + 1)) * 500000L / (n0 * n1)
    val got = SparkEntry.queries("q_auc_roc")(spark, dir).collect().head
    assert(got.getAs[Long]("n_pos") == n1 && got.getAs[Long]("n_neg") == n0)
    assert(got.getAs[Long]("auc_q6") == auc,
      s"AUC ${got.getAs[Long]("auc_q6")} vs replay $auc")
  }
}
