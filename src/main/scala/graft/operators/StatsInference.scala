package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypothesis-test readouts the experimentation surface still lacked:
  * one-way ANOVA (k-group mean comparison — the k>2 generalization of
  * q_abtest_z) and the tie-corrected Mann-Whitney rank-sum U (the
  * distribution-free two-sample test; reference analogy: the
  * summary-stats family of `build_frame_db.py:233-270` read out as
  * decision statistics).
  *
  * Determinism contract (shared with Stats.scala): every sufficient
  * statistic is an exact integer reduction — BIGINT first moments,
  * DECIMAL(38,0)/HUGEINT second moments (the q_spearman precedent) — and
  * each per-group floating step is ONE shared IEEE expression tree,
  * floor-quantized to a BIGINT before any cross-group summation so
  * accumulation order can never matter.
  *
  * Scale posture: ANOVA reduces the fact stream to k group-moment rows
  * (one combiner-backed groupBy); Mann-Whitney reduces it to a
  * quantized-value histogram whose size is bounded by the value DOMAIN
  * (≤ 49k centi-unit cells here), not the row count, so the rank-sum
  * window runs over a domain-bounded table at any data scale.
  */
object StatsInference {

  val queries: Seq[QueryDef] = Seq(

    // One-way ANOVA F over event types: vq = floor(value·1e3) exact
    // BIGINTs; per-group (n, Σx BIGINT, Σx² DECIMAL38) moments; each
    // group's SSW contribution is floor-quantized at q0 (its magnitude is
    // ~1e15 at 100x, so a 1e6 upscale would overflow — q0 keeps 15
    // significant digits, plenty for an F ratio) BEFORE the k-row sum.
    // SSB = SStot − SSW on exact BIGINTs; only the final F is floating.
    QueryDef.sql(
      "q_anova_f",
      """WITH base AS (
        |  SELECT event_type AS g, CAST(FLOOR(value * 1000) AS BIGINT) AS vq
        |  FROM events),
        |m AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(vq) AS BIGINT) AS s1,
        |    SUM(vq * vq) AS s2
        |  FROM base GROUP BY g),
        |perg AS (
        |  SELECT g, n, s1, s2,
        |    CAST(FLOOR(CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      AS BIGINT) AS ssw_g
        |  FROM m),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
        |    CAST(SUM(s1) AS BIGINT) AS s1, SUM(s2) AS s2,
        |    CAST(SUM(ssw_g) AS BIGINT) AS ssw
        |  FROM perg),
        |fin AS (
        |  SELECT k, n, ssw,
        |    CAST(FLOOR(CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      AS BIGINT) - ssw AS ssb
        |  FROM tot)
        |SELECT k AS k_groups, n AS n_total, ssb AS ssb_q0, ssw AS ssw_q0,
        |  CASE WHEN k <= 1 OR n <= k OR ssw <= 0 THEN NULL
        |  ELSE CAST(FLOOR(CAST(ssb AS DOUBLE) * CAST(n - k AS DOUBLE) * 1000000.0
        |    / (CAST(k - 1 AS DOUBLE) * CAST(ssw AS DOUBLE))) AS BIGINT)
        |  END AS f_q6
        |FROM fin""".stripMargin) { (s, d) =>
      val dec = "decimal(38,0)"
      val base = Tables.events(s, d).select(
        col("event_type").as("g"),
        floor(col("value") * 1000).cast("long").as("vq"))
      val m = base.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        sum(col("vq")).as("s1"),
        sum((col("vq") * col("vq")).cast(dec)).as("s2"))
      def sswOf(s2: org.apache.spark.sql.Column, s1: org.apache.spark.sql.Column,
                n: org.apache.spark.sql.Column) =
        floor(s2.cast("double")
          - s1.cast("double") * (s1.cast("double") / n.cast("double"))).cast("long")
      val tot = m.withColumn("ssw_g", sswOf(col("s2"), col("s1"), col("n")))
        .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
          sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
          sum(col("ssw_g")).as("ssw"))
      val fin = tot.select(col("k"), col("n"), col("ssw"),
        (sswOf(col("s2"), col("s1"), col("n")) - col("ssw")).as("ssb"))
      fin.select(col("k").as("k_groups"), col("n").as("n_total"),
        col("ssb").as("ssb_q0"), col("ssw").as("ssw_q0"),
        when(col("k") <= 1 || col("n") <= col("k") || col("ssw") <= 0, lit(null))
          .otherwise(floor(col("ssb").cast("double") * (col("n") - col("k")).cast("double")
            * lit(1000000.0)
            / ((col("k") - 1).cast("double") * col("ssw").cast("double"))).cast("long"))
          .as("f_q6"))
    },

    // Mann-Whitney U (two cohorts by user parity, value at centi-unit
    // quantization) with the exact tie correction. Ranks never touch raw
    // rows: the centi-value histogram carries per-cell cohort counts, the
    // doubled block mid-rank 2·cumBefore + t + 1 is exact integer
    // arithmetic (the q_spearman doubled-rank trick), and U is reported
    // in the same ×2 scale (`u_x2`) so it stays an exact BIGINT even when
    // tied mid-ranks are half-integers. The rank window runs over the
    // domain-bounded histogram (≤ 49k cells for this value range) — never
    // a global sort of the fact table.
    QueryDef.sql(
      "q_mann_whitney",
      """WITH base AS (
        |  SELECT CAST(user_id % 2 AS BIGINT) AS coh,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS vq
        |  FROM events),
        |hist AS (
        |  SELECT vq,
        |    CAST(SUM(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(COUNT(*) AS BIGINT) AS t
        |  FROM base GROUP BY vq),
        |rk AS (
        |  SELECT c0, c1, t,
        |    SUM(t) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) - t AS cumb
        |  FROM hist),
        |agg AS (
        |  SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c0 + c1) AS BIGINT) AS n,
        |    CAST(SUM(c1 * (2 * cumb + t + 1)) AS BIGINT) AS r2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties
        |  FROM rk)
        |SELECT n0, n1, r2 - n1 * (n1 + 1) AS u_x2,
        |  CASE WHEN n0 = 0 OR n1 = 0
        |    OR CAST(n + 1 AS DOUBLE)
        |       - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) <= 0
        |  THEN NULL
        |  ELSE CAST(FLOOR(
        |    CAST(r2 - n1 * (n1 + 1) - n0 * n1 AS DOUBLE) * 1000000.0
        |    / (2.0 * SQRT(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
        |        * (CAST(n + 1 AS DOUBLE)
        |           - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))))
        |    AS BIGINT)
        |  END AS z_q6
        |FROM agg""".stripMargin) { (s, d) =>
      val base = Tables.events(s, d).select(
        pmod(col("user_id"), lit(2)).cast("long").as("coh"),
        floor(col("value") * 100).cast("long").as("vq"))
      val hist = base.groupBy(col("vq")).agg(
        sum(when(col("coh") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("coh") === 1, 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("t"))
      // domain-bounded global window: the histogram has at most one row
      // per centi-unit value cell regardless of fact-table size
      val w = Window.orderBy(col("vq")).rowsBetween(Window.unboundedPreceding, 0)
      val rk = hist.select(col("c0"), col("c1"), col("t"),
        (sum(col("t")).over(w) - col("t")).as("cumb"))
      val agg = rk.agg(
        sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("c0") + col("c1")).as("n"),
        sum(col("c1") * (lit(2) * col("cumb") + col("t") + 1)).as("r2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      val tieTerm = (col("n") + 1).cast("double") -
        col("ties").cast("double") / (col("n").cast("double") * (col("n") - 1).cast("double"))
      agg.select(col("n0"), col("n1"),
        (col("r2") - col("n1") * (col("n1") + 1)).as("u_x2"),
        when(col("n0") === 0 || col("n1") === 0 || tieTerm <= 0, lit(null))
          .otherwise(floor(
            (col("r2") - col("n1") * (col("n1") + 1) - col("n0") * col("n1")).cast("double")
              * lit(1000000.0)
              / (lit(2.0) * sqrt(col("n0").cast("double") * col("n1").cast("double") / lit(12.0)
                * tieTerm))).cast("long"))
          .as("z_q6"))
    }
  )
}
