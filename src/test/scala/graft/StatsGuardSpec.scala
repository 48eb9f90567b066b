package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the guarded ratio statistics: a constant
  * series (zero variance) or a saturated/empty conversion pool must yield
  * NULL — never a NaN/Inf that Spark silently casts and DuckDB raises on
  * (the q_autocorr_lag lesson, ADVICE r8). These specs replay the guarded
  * expressions on hand-built degenerate frames; the oracle gate can't see
  * this case because the shared testdata is non-degenerate.
  */
class StatsGuardSpec extends SparkSpec {
  import spark.implicits._

  test("pearson/OLS guard: constant series yields NULL corr and slope") {
    // same moment-sum algebra as q_daily_corr_ols, fed a constant y
    val m = Seq((5L, 15L, 10L, 30L, 55L, 20L)) // n, sx, sy, sxy, sxx, syy with n*syy == sy*sy
      .toDF("n", "sx", "sy", "sxy", "sxx", "syy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vxI = col("n") * col("sxx") - col("sx") * col("sx")
    val vyI = col("n") * col("syy") - col("sy") * col("sy")
    val out = m.select(
      when(vxI === 0 || vyI === 0, lit(null))
        .otherwise(floor(cov * lit(1000000.0)
          / (sqrt(vxI * lit(1.0)) * sqrt(vyI * lit(1.0)))).cast("long")).as("corr_q6"),
      when(vxI === 0, lit(null))
        .otherwise(floor(cov * lit(1000000.0) / (vxI * lit(1.0))).cast("long"))
        .as("slope_q6")).collect().head
    assert(out.isNullAt(0), "constant series must NULL the correlation")
    assert(!out.isNullAt(1), "x-variance is nonzero here — slope stays defined")
  }

  test("z-test guard: zero and saturated conversion pools yield NULL z") {
    Seq((100L, 0L, 100L, 0L), (100L, 100L, 100L, 100L)).foreach { case (n0, k0, n1, k1) =>
      val w = Seq((n0, k0, n1, k1)).toDF("n0", "k0", "n1", "k1")
      val p0 = col("k0") * lit(1.0) / col("n0")
      val p1 = col("k1") * lit(1.0) / col("n1")
      val pp = (col("k0") + col("k1")) * lit(1.0) / (col("n0") + col("n1"))
      val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
      val degenerate = (col("k0") + col("k1")) === 0 ||
        (col("k0") + col("k1")) === (col("n0") + col("n1"))
      val z = w.select(when(degenerate, lit(null))
        .otherwise(floor((p0 - p1) / se * lit(1000000.0)).cast("long")).as("z")).collect().head
      assert(z.isNullAt(0), s"pool ($k0+$k1)/($n0+$n1) must NULL the z statistic")
    }
  }

  test("autocorr guard shape: zero-variance lag pair yields NULL acf on real query") {
    // end-to-end: the registered query must not throw on ANY events data;
    // NULLs are permitted, NaN/Inf casts are not (every acf value that IS
    // present must be a plausible q6 correlation)
    val rows = SparkEntry.queries("q_autocorr_lag")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("acf_q6"))) {
        val v = r.getAs[Long]("acf_q6")
        assert(v >= -1000001 && v <= 1000000, s"acf_q6 out of [-1, 1] band: $v")
      }
    }
  }
}
