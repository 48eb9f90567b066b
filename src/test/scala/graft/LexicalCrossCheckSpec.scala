package graft

import org.apache.spark.sql.functions._

/** Driver-side replays of the lexical statistics from raw text with
  * java.util.regex tokenization: PMI's exact double tree over bigram/
  * unigram counts and the Zipf log-log OLS slope over bit-length
  * buckets — cell-for-cell against the registered queries.
  */
class LexicalCrossCheckSpec extends SparkSpec {

  private def docTokens(dir: String): Array[Array[String]] = {
    val re = "[a-z0-9]+".r
    Tables.documents(spark, dir).select(col("text")).collect()
      .map(r => re.findAllIn(r.getString(0).toLowerCase).toArray)
  }

  test("pmi bigrams equal a driver-side count-and-score replay") {
    val dir = sf("sf0.01")
    val docs = docTokens(dir)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nU = uni.values.sum
    val bigrams = docs.filter(_.length >= 2)
      .flatMap(tk => tk.zip(tk.drop(1)))
    val nB = bigrams.length.toLong
    val pair = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 5L)
    val scored = pair.toSeq.map { case ((w1, w2), cXy) =>
      val pmi = math.floor(cXy * 1.0 * nU * nU * 1000000.0
        / (uni(w1) * 1.0 * uni(w2) * nB)).toLong
      (w1, w2, cXy, pmi)
    }
    val expected = scored.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(100).zipWithIndex
      .map { case ((w1, w2, c, p), i) => (i + 1L, w1, w2, c, p) }
    val got = SparkEntry.queries("q_pmi_bigrams")(spark, dir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_xy"), r.getAs[Long]("pmi_q6"))).toSeq
    assert(got == expected, s"first divergence: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("zipf slope equals a driver-side log-log moment recomputation") {
    val dir = sf("sf0.01")
    val uni = docTokens(dir).flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val pts = uni.values.groupBy(c => 63L - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (x, g) => (x, 63L - java.lang.Long.numberOfLeadingZeros(g.size.toLong)) }
    val n = pts.size.toLong
    val sx = pts.keys.sum; val sy = pts.values.sum
    val sxy = pts.map { case (x, y) => x * y }.sum
    val sxx = pts.keys.map(x => x * x).sum
    val varx = n * sxx - sx * sx
    val slope = if (varx == 0) None
      else Some(math.floor((n * sxy - sx * sy) * 1000000.0 / varx).toLong)
    val r = SparkEntry.queries("q_zipf_slope")(spark, dir).collect().head
    assert(r.getAs[Long]("n_buckets") == n && r.getAs[Long]("sx") == sx
      && r.getAs[Long]("sy") == sy && r.getAs[Long]("sxy") == sxy
      && r.getAs[Long]("sxx") == sxx)
    assert((if (r.isNullAt(r.fieldIndex("slope_q6"))) None
      else Some(r.getAs[Long]("slope_q6"))) == slope)
    // no sign assertion: the synthetic corpus is not Zipf-distributed
    // (slope comes out +0.8 here) — sign is a data property, not an
    // operator contract (the q_auc_roc lesson)
  }
}
