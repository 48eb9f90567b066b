package graft

import java.sql.Timestamp

/** End-to-end degenerate-input behavior of the round-11 inference
  * queries: the registered query is run on a hand-built events.parquet
  * whose data hits the division-by-zero seams (all-tied values, a
  * single cohort, zero paired differences). The contract is the
  * StatsGuardSpec one — NULL is fine, a throw or a NaN/Inf silently
  * cast to a garbage BIGINT is not — but checked through the real
  * query, not an expression replay, so a missing guard in the
  * registered plan cannot hide.
  */
class InferenceGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Writes `rows` (event_id, ts, user_id, event_type, value) as
    * <tmp>/events.parquet and returns the directory. */
  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-guard").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")

  test("all-tied values: KW tie correction NULLs, MW z NULLs, KS D is zero") {
    // two groups, two cohorts, every value identical — total tie
    val rows = (0 until 40).map { i =>
      (i.toLong, ts(1 + i % 10), i.toLong % 4, if (i % 2 == 0) "a" else "b", 3.14)
    }
    val dir = eventsDir(rows)
    val kw = SparkEntry.queries("q_kruskal_wallis")(spark, dir).collect().head
    assert(kw.isNullAt(kw.fieldIndex("h_tie_q6")),
      "fully-tied data must NULL the tie-corrected H")
    assert(kw.getAs[Long]("h_q6") <= 0L && kw.getAs[Long]("h_q6") >= -2L,
      s"uncorrected H on fully-tied data should sit at ~0, got ${kw.getAs[Long]("h_q6")}")
    val mw = SparkEntry.queries("q_mann_whitney")(spark, dir).collect().head
    assert(mw.isNullAt(mw.fieldIndex("z_q6")),
      "fully-tied data zeroes the rank variance — z must be NULL")
    val ks = SparkEntry.queries("q_ks_test")(spark, dir).collect().head
    assert(ks.getAs[Long]("d_num") == 0L && ks.getAs[Long]("d_q6") == 0L)
    val af = SparkEntry.queries("q_anova_f")(spark, dir).collect().head
    assert(af.isNullAt(af.fieldIndex("f_q6")) || af.getAs[Long]("f_q6") >= 0L,
      "zero within-variance must yield NULL or a finite nonnegative F")
  }

  test("single cohort: MW and KS NULL their statistics, never throw") {
    // every user_id even → cohort 1 (user_id % 2) is empty
    val rows = (0 until 30).map { i =>
      (i.toLong, ts(1 + i % 10), 2L * i, if (i % 2 == 0) "a" else "b", i * 0.37)
    }
    val dir = eventsDir(rows)
    val mw = SparkEntry.queries("q_mann_whitney")(spark, dir).collect().head
    assert(mw.getAs[Long]("n1") == 0L)
    assert(mw.isNullAt(mw.fieldIndex("z_q6")), "empty cohort must NULL z")
    val ks = SparkEntry.queries("q_ks_test")(spark, dir).collect().head
    assert(ks.getAs[Long]("n1") == 0L)
    assert(ks.isNullAt(ks.fieldIndex("d_q6")) && ks.isNullAt(ks.fieldIndex("ks_q6")),
      "empty cohort must NULL both KS readouts")
  }

  test("zero paired differences: wilcoxon keeps no pairs and NULLs z") {
    // each user: one event in each timeline half with the SAME value →
    // every signed difference is exactly zero and drops
    val rows = (0 until 20).flatMap { u =>
      Seq((2L * u, ts(1 + u % 5), u.toLong, "a", 1.0 + u),
        (2L * u + 1, ts(20 + u % 5), u.toLong, "a", 1.0 + u))
    }
    val dir = eventsDir(rows)
    val w = SparkEntry.queries("q_wilcoxon_signed_rank")(spark, dir).collect().head
    assert(w.isNullAt(w.fieldIndex("z_q6")), "no surviving pairs must NULL z")
    val n = if (w.isNullAt(w.fieldIndex("n_pairs"))) 0L else w.getAs[Long]("n_pairs")
    assert(n == 0L, s"all differences are zero, got n_pairs $n")
  }

  test("single group: kruskal-wallis degenerates to zero H, anova NULLs F") {
    val rows = (0 until 25).map { i =>
      (i.toLong, ts(1 + i % 10), i.toLong, "only", i * 1.11)
    }
    val dir = eventsDir(rows)
    val kw = SparkEntry.queries("q_kruskal_wallis")(spark, dir).collect().head
    assert(kw.getAs[Long]("k_groups") == 1L)
    // k=1: between-group rank variance is 0 by construction; H must be
    // ~0 (quantization may leave it a hair negative), never NaN-garbage
    assert(math.abs(kw.getAs[Long]("h_q6")) <= 2L,
      s"single-group H should be ~0, got ${kw.getAs[Long]("h_q6")}")
    val af = SparkEntry.queries("q_anova_f")(spark, dir).collect().head
    assert(af.isNullAt(af.fieldIndex("f_q6")),
      "k=1 has no between-group df — F must be NULL")
  }
}
