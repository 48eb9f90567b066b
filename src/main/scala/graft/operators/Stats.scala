package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / ML-feature operators a training-data pipeline layers on
  * top of the reference's aggregation surface (summary_stats shape,
  * `build_frame_db.py:233-270`): exact Pearson correlation + OLS trend,
  * a two-proportion A/B z-test, per-key lag/rolling feature generation,
  * and an hour-of-week seasonality profile.
  *
  * Determinism: every statistic is derived from exact BIGINT sums
  * (n, Σx, Σy, Σxy, Σx², Σy²) reduced by a combiner-backed groupBy, and
  * the final floating step is an IDENTICAL IEEE expression tree in both
  * engines (`* CAST(1.0 AS DOUBLE)` — never a DECIMAL literal, see the
  * FLOOR-boundary trap in the round-7 rehearsal notes), floor-quantized
  * to 1e-6 before comparison.
  *
  * Scale posture: correlation/OLS first reduces the fact stream to a
  * BOUNDED daily grid (days × event types — time-bounded, not
  * data-bounded), so the moment sums stay < 2^63 at any row count and
  * the quadratic terms never see raw rows. Lag features use per-user
  * partitioned windows (never a global sort); the seasonality profile is
  * one map-side-combined groupBy over 168 hour-of-week cells.
  */
object Stats {

  val queries: Seq[QueryDef] = Seq(

    // Exact Pearson r + OLS slope of (daily event count) vs (daily value
    // sum, unit-quantized) per event type. The daily rollup bounds the
    // moment magnitudes: at 32 x sf0.1 the largest term n*Sxy is ~1e16,
    // within exact BIGINT range; only the final ratio is floating.
    QueryDef.sql(
      "q_daily_corr_ols",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x,
        |    CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |m AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
        |  FROM daily GROUP BY event_type)
        |SELECT event_type, n,
        |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
        |  ELSE CAST(FLOOR((n*sxy - sx*sy) * CAST(1000000.0 AS DOUBLE)
        |    / (SQRT((n*sxx - sx*sx) * CAST(1.0 AS DOUBLE))
        |       * SQRT((n*syy - sy*sy) * CAST(1.0 AS DOUBLE)))) AS BIGINT)
        |  END AS corr_q6,
        |  CASE WHEN (n*sxx - sx*sx) = 0 THEN NULL
        |  ELSE CAST(FLOOR((n*sxy - sx*sy) * CAST(1000000.0 AS DOUBLE)
        |    / ((n*sxx - sx*sx) * CAST(1.0 AS DOUBLE))) AS BIGINT)
        |  END AS slope_q6
        |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"),
          sum(floor(col("value")).cast("long")).as("y"))
      val m = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vxI = col("n") * col("sxx") - col("sx") * col("sx")
      val vyI = col("n") * col("syy") - col("sy") * col("sy")
      // zero-variance guard (the q_autocorr_lag lesson): a constant daily
      // series must yield NULL, not a NaN/Inf cast divergence
      m.select(col("event_type"), col("n"),
          when(vxI === 0 || vyI === 0, lit(null))
            .otherwise(floor(cov * lit(1000000.0)
              / (sqrt(vxI * lit(1.0)) * sqrt(vyI * lit(1.0)))).cast("long"))
            .as("corr_q6"),
          when(vxI === 0, lit(null))
            .otherwise(floor(cov * lit(1000000.0) / (vxI * lit(1.0))).cast("long"))
            .as("slope_q6"))
        .orderBy(col("event_type"))
    },

    // Two-proportion z-test (A/B experiment readout): cohorts split by
    // user_id parity, conversion = user made >= 1 high-value purchase
    // (value >= 200 — rare enough that neither cohort saturates, which
    // would zero the pooled standard error). The count reduction is
    // user-keyed; the z statistic is one shared IEEE expression over
    // four small integers.
    QueryDef.sql(
      "q_abtest_z",
      """WITH u AS (
        |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
        |    MAX(CASE WHEN event_type = 'purchase' AND value >= 200 THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS k
        |  FROM u GROUP BY cohort),
        |w AS (
        |  SELECT
        |    MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN cohort = 0 THEN k END) AS k0,
        |    MAX(CASE WHEN cohort = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN cohort = 1 THEN k END) AS k1
        |  FROM c)
        |SELECT n0, k0, n1, k1,
        |  CASE WHEN (k0 + k1) = 0 OR (k0 + k1) = (n0 + n1) THEN NULL
        |  ELSE CAST(FLOOR(
        |    (k0 * CAST(1.0 AS DOUBLE) / n0 - k1 * CAST(1.0 AS DOUBLE) / n1)
        |    / SQRT(((k0 + k1) * CAST(1.0 AS DOUBLE) / (n0 + n1))
        |           * (1.0 - (k0 + k1) * CAST(1.0 AS DOUBLE) / (n0 + n1))
        |           * (1.0 / n0 + 1.0 / n1)) * 1000000.0) AS BIGINT)
        |  END AS z_q6
        |FROM w""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") >= 200, 1)
          .otherwise(0)).as("conv"))
        .withColumn("cohort", pmod(col("user_id"), lit(2)).cast("long"))
      val c = u.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
      val w = c.agg(
        max(when(col("cohort") === 0, col("n"))).as("n0"),
        max(when(col("cohort") === 0, col("k"))).as("k0"),
        max(when(col("cohort") === 1, col("n"))).as("n1"),
        max(when(col("cohort") === 1, col("k"))).as("k1"))
      val p0 = col("k0") * lit(1.0) / col("n0")
      val p1 = col("k1") * lit(1.0) / col("n1")
      val pp = (col("k0") + col("k1")) * lit(1.0) / (col("n0") + col("n1"))
      val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
      // saturation guard: zero or all-converted pools zero the SE — NULL,
      // not a NaN/Inf cast divergence (the q_autocorr_lag lesson)
      val degenerate = (col("k0") + col("k1")) === 0 ||
        (col("k0") + col("k1")) === (col("n0") + col("n1"))
      w.select(col("n0"), col("k0"), col("n1"), col("k1"),
        when(degenerate, lit(null))
          .otherwise(floor((p0 - p1) / se * lit(1000000.0)).cast("long")).as("z_q6"))
    },

    // Per-user lag / delta / rolling-3 features (supervised-learning
    // feature generation): every window partitions by user, so the sort
    // is key-local and scales with executor count.
    QueryDef.sql(
      "q_lag_features",
      """WITH v AS (
        |  SELECT user_id, event_id, EPOCH_US(ts) AS tus,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS v_q2
        |  FROM events)
        |SELECT user_id, event_id, v_q2,
        |  LAG(v_q2, 1) OVER w AS lag1_q2,
        |  LAG(v_q2, 2) OVER w AS lag2_q2,
        |  CAST(tus - LAG(tus, 1) OVER w AS BIGINT) AS dt_us,
        |  CAST(FLOOR(SUM(v_q2) OVER w3 * CAST(1.0 AS DOUBLE)
        |             / COUNT(*) OVER w3) AS BIGINT) AS mean3_q2
        |FROM v
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id),
        |       w3 AS (PARTITION BY user_id ORDER BY tus, event_id
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id LIMIT 2000""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        floor(col("value") * 100).cast("long").as("v_q2"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      v.select(col("user_id"), col("event_id"), col("v_q2"),
          lag(col("v_q2"), 1).over(w).as("lag1_q2"),
          lag(col("v_q2"), 2).over(w).as("lag2_q2"),
          (col("tus") - lag(col("tus"), 1).over(w)).cast("long").as("dt_us"),
          floor(sum(col("v_q2")).over(w3) * lit(1.0)
            / count(lit(1)).over(w3)).cast("long").as("mean3_q2"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(2000)
    },

    // Hour-of-week seasonality profile: activity share (ppm of the event
    // type's total) per ISO weekday x hour cell. One combiner-backed
    // groupBy to <= 168 cells per type; the share join is broadcast.
    QueryDef.sql(
      "q_seasonality_profile",
      """WITH cell AS (
        |  SELECT event_type,
        |    CAST(ISODOW(ts) AS BIGINT) AS dow,
        |    CAST(HOUR(ts) AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
        |        FROM cell GROUP BY event_type)
        |SELECT c.event_type, c.dow, c.hr, c.n,
        |  CAST(FLOOR(c.n * CAST(1000000.0 AS DOUBLE) / t.total) AS BIGINT) AS share_q6
        |FROM cell c JOIN tot t USING (event_type)
        |ORDER BY c.event_type, c.dow, c.hr""".stripMargin) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type"),
          (weekday(col("ts")) + 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"))
      val tot = cell.groupBy(col("event_type")).agg(sum(col("n")).as("total"))
      cell.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("dow"), col("hr"), col("n"),
          floor(col("n") * lit(1000000.0) / col("total")).cast("long").as("share_q6"))
        .orderBy(col("event_type"), col("dow"), col("hr"))
    },

    // Exponential time-decay engagement score per user (half-life 1 day,
    // anchored at the corpus max date — feature-store freshness
    // weighting). EXACT despite the floating weight: each term is
    // v_cents · 2^(20 - age_days), an integer times a power of two, so
    // the double product rounds nothing (v_c < 2^17, scale ≤ 2^20);
    // per-term floor-to-bigint then makes the SUM order-independent.
    // One combiner-backed groupBy; the anchor date is a broadcast row.
    QueryDef.sql(
      "q_decay_sum",
      """WITH anchor AS (SELECT CAST(MAX(ts) AS DATE) AS d0 FROM events),
        |term AS (
        |  SELECT user_id,
        |    CAST(FLOOR(CAST(FLOOR(value * 100) AS BIGINT)
        |      * POWER(2.0, 20 - DATEDIFF('day', CAST(ts AS DATE), d0)))
        |      AS BIGINT) AS t
        |  FROM events CROSS JOIN anchor)
        |SELECT user_id, CAST(SUM(t) AS BIGINT) AS decay_s20,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM term GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val anchor = ev.agg(max(col("ts")).cast("date").as("d0"))
      ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          floor(floor(col("value") * 100).cast("long")
            * pow(lit(2.0), lit(20) - datediff(col("d0"), col("ts").cast("date"))))
            .cast("long").as("t"))
        .groupBy(col("user_id"))
        .agg(sum(col("t")).as("decay_s20"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // Smoothed mean-target encoding of the (event_type × hour) category
    // (the leakage-safe categorical → numeric feature for tabular models):
    // enc = (Σ_cat target + m · global_mean) / (n_cat + m), m = 100.
    // Numerators/denominators are exact BIGINT sums; the encode is one
    // shared IEEE tree (two divisions, one fma-free sum) floor-quantized
    // to cents. Both reductions are combiner-backed; the global row
    // broadcasts.
    QueryDef.sql(
      "q_target_encode",
      """WITH g AS (
        |  SELECT CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS gs,
        |    CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM events),
        |c AS (
        |  SELECT event_type, CAST(HOUR(ts) AS BIGINT) AS hr,
        |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cs,
        |    CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM events GROUP BY 1, 2)
        |SELECT c.event_type, c.hr, c.cn,
        |  CAST(FLOOR((cs * CAST(1.0 AS DOUBLE)
        |              + 100.0 * (gs * CAST(1.0 AS DOUBLE) / gn))
        |             / (cn + 100)) AS BIGINT) AS enc_c
        |FROM c CROSS JOIN g ORDER BY event_type, hr""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val g = ev.agg(sum(floor(col("value") * 100).cast("long")).as("gs"),
        count(lit(1)).as("gn"))
      val c = ev.groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cs"),
          count(lit(1)).as("cn"))
      c.crossJoin(broadcast(g))
        .select(col("event_type"), col("hr"), col("cn"),
          floor((col("cs") * lit(1.0) + lit(100.0) * (col("gs") * lit(1.0) / col("gn")))
            / (col("cn") + lit(100L))).cast("long").as("enc_c"))
        .orderBy(col("event_type"), col("hr"))
    },

    // Statistical mode per key (most frequent event type per user) with
    // a deterministic (count DESC, value ASC) tie-break, plus the mode's
    // integer-exact q6 share of the key's rows. The rank/total windows
    // run over the (user x event-type) AGGREGATE — bounded by the type
    // vocabulary per user — never over raw rows, and the share is pure
    // integer division so both engines agree bit-for-bit.
    QueryDef.sql(
      "q_mode_per_group",
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type),
        |t AS (
        |  SELECT user_id, event_type, c,
        |    SUM(c) OVER (PARTITION BY user_id) AS tot,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY c DESC, event_type) AS rk
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, c AS n_mode,
        |  CAST((c * 1000000) // tot AS BIGINT) AS share_q6
        |FROM t WHERE rk = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("user_id"))
      c.select(col("user_id"), col("event_type"), col("c"),
          sum(col("c")).over(w).as("tot"),
          row_number().over(w.orderBy(col("c").desc, col("event_type"))).as("rk"))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"),
          col("c").as("n_mode"),
          expr("(c * 1000000) div tot").as("share_q6"))
        .orderBy(col("user_id"))
    },

    // Benford first-digit audit (the classic fabricated-data screen for a
    // numeric fact column): distribution of the first significant digit
    // of `value`, per event type, against the Benford expectation
    // log10(1+1/d). The expectation enters as a 9-entry INTEGER constant
    // table (q6, summing to exactly 1e6) shared by both engines, so no
    // log is ever evaluated at runtime; the observed share and its
    // deviation are pure integer division over the per-type counts. One
    // map-side-combined groupBy over ≤ 9 × |types| cells — no shuffle
    // beyond the aggregate, no windows over raw rows.
    QueryDef.sql(
      "q_benford",
      """WITH digits AS (
        |  SELECT event_type,
        |    CAST(SUBSTR(CAST(CAST(FLOOR(value * 1000000) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS BIGINT) AS d
        |  FROM events WHERE CAST(FLOOR(value * 1000000) AS BIGINT) >= 1),
        |c AS (
        |  SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM digits GROUP BY event_type, d),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY event_type)
        |SELECT c.event_type, c.d, c.n,
        |  CAST((c.n * 1000000) // t.tot AS BIGINT) AS obs_q6,
        |  CAST(CASE c.d WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |    WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS BIGINT) AS exp_q6,
        |  CAST(ABS((c.n * 1000000) // t.tot
        |    - CASE c.d WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |      WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |      WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END) AS BIGINT) AS dev_q6
        |FROM c JOIN t ON c.event_type = t.event_type
        |ORDER BY c.event_type, c.d""".stripMargin) { (s, d) =>
      val expQ6 = {
        // q6 of log10(1+1/d), d=1..9; the 9 entries sum to exactly 1e6
        val tbl = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
          5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
        tbl.init.foldRight(lit(tbl.last._2): org.apache.spark.sql.Column) {
          case ((dg, v), acc) => when(col("d") === dg, lit(v)).otherwise(acc)
        }
      }
      val q6 = floor(col("value") * 1000000).cast("long")
      val c = Tables.events(s, d)
        .filter(q6 >= 1)
        .select(col("event_type"),
          substring(q6.cast("string"), 1, 1).cast("long").as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
      c.join(broadcast(t), Seq("event_type"))
        .select(col("event_type"), col("d"), col("n"),
          expr("(n * 1000000) div tot").as("obs_q6"),
          expQ6.as("exp_q6"),
          abs(expr("(n * 1000000) div tot") - expQ6).cast("long").as("dev_q6"))
        .orderBy(col("event_type"), col("d"))
    },

    // Lag-k autocorrelation (k = 1, 7) of the daily event-count series
    // per event type — the feature-engineering readout that tells a
    // pipeline whether a series has day-over-day momentum or weekly
    // seasonality. Pairs (x_t, x_{t-k}) come from a LAG window over the
    // BOUNDED daily grid (days × types, never raw rows); the five moment
    // sums are exact BIGINTs and the final Pearson ratio is one shared
    // IEEE expression floor-quantized to q6.
    QueryDef.sql(
      "q_autocorr_lag",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |lagged AS (
        |  SELECT event_type, k.lag AS lag, x,
        |    LAG(x, CAST(k.lag AS INTEGER)) OVER (
        |      PARTITION BY event_type, k.lag ORDER BY day) AS xl
        |  FROM daily CROSS JOIN (SELECT UNNEST([1, 7]) AS lag) k),
        |m AS (
        |  SELECT event_type, lag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(xl) AS BIGINT) AS sy,
        |    CAST(SUM(x*xl) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(xl*xl) AS BIGINT) AS syy
        |  FROM lagged WHERE xl IS NOT NULL GROUP BY event_type, lag)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
        |  ELSE CAST(FLOOR((n*sxy - sx*sy) * CAST(1000000.0 AS DOUBLE)
        |    / (SQRT((n*sxx - sx*sx) * CAST(1.0 AS DOUBLE))
        |       * SQRT((n*syy - sy*sy) * CAST(1.0 AS DOUBLE)))) AS BIGINT)
        |  END AS acf_q6
        |FROM m ORDER BY event_type, lag""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val lagged = daily
        .select(col("event_type"), col("day"), col("x"),
          explode(array(lit(1), lit(7))).as("lag"))
      val k1 = Window.partitionBy(col("event_type"), col("lag")).orderBy(col("day"))
      val withLag = lagged
        .withColumn("xl", when(col("lag") === 1, lag(col("x"), 1).over(k1))
          .otherwise(lag(col("x"), 7).over(k1)))
        .filter(col("xl").isNotNull)
      val m = withLag.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("xl")).as("sy"),
          sum(col("x") * col("xl")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("xl") * col("xl")).as("syy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vxInt = col("n") * col("sxx") - col("sx") * col("sx")
      val vyInt = col("n") * col("syy") - col("sy") * col("sy")
      // zero-variance guard: a constant series yields 0/0 — Spark would
      // silently cast NaN/Inf while DuckDB's CAST raises; both emit NULL
      m.select(col("event_type"), col("lag").cast("long").as("lag"), col("n"),
          when(vxInt === 0 || vyInt === 0, lit(null))
            .otherwise(floor(cov * lit(1000000.0) /
              (sqrt(vxInt * lit(1.0)) * sqrt(vyInt * lit(1.0)))).cast("long"))
            .as("acf_q6"))
        .orderBy(col("event_type"), col("lag"))
    },

    // Wilson-score lower bound ranking (the "sort by positive rate, but
    // don't let 2-of-2 beat 90-of-100" fix): per-part return rate from
    // lineitem with the z=1.96 lower confidence bound. Counts are one
    // combiner-backed groupBy; the bound is one shared IEEE tree over
    // (n, k) — every op (+,-,*,/,sqrt) is correctly rounded, so both
    // engines agree bit-for-bit before the q6 floor. Parts with n < 20
    // are dropped (the bound is meaningless below minimal support).
    QueryDef.sql(
      "q_wilson_lb",
      """WITH c AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM lineitem GROUP BY l_partkey
        |  HAVING COUNT(*) >= 20),
        |w AS (
        |  SELECT l_partkey, n, k,
        |    k * CAST(1.0 AS DOUBLE) / n AS p, CAST(1.96 AS DOUBLE) AS z
        |  FROM c)
        |SELECT l_partkey, n, k,
        |  CAST(FLOOR((p + z*z/(2*n) - z*SQRT((p*(1.0-p) + z*z/(4*n))/n))
        |    / (1.0 + z*z/n) * 1000000.0) AS BIGINT) AS wilson_lb_q6
        |FROM w ORDER BY wilson_lb_q6 DESC, l_partkey LIMIT 100""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("long").as("k"))
        .filter(col("n") >= 20)
      val z = lit(1.96)
      val p = col("k") * lit(1.0) / col("n")
      val lb = (p + z * z / (lit(2) * col("n"))
        - z * sqrt((p * (lit(1.0) - p) + z * z / (lit(4) * col("n"))) / col("n"))) /
        (lit(1.0) + z * z / col("n"))
      c.select(col("l_partkey"), col("n"), col("k"),
          floor(lb * lit(1000000.0)).cast("long").as("wilson_lb_q6"))
        .orderBy(col("wilson_lb_q6").desc, col("l_partkey"))
        .limit(100)
    },

    // Chi-square test of independence over the (event_type × ISO weekday)
    // contingency table — the data-audit screen for "is activity mix
    // uniform across the week". Marginals and cells are exact BIGINTs;
    // the per-cell deviation d = O·N − r·c is an exact int64 (< 2^53 at
    // rehearsal scales), and each cell's χ² contribution is one shared
    // IEEE tree floor-quantized to q6 BEFORE the global sum, so the
    // total is an order-independent BIGINT sum. Cells ≤ |types| × 7 —
    // the marginal joins broadcast, the stat row cross-joins broadcast.
    QueryDef.sql(
      "q_chi2_independence",
      """WITH cell AS (
        |  SELECT event_type, CAST(ISODOW(ts) AS BIGINT) AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS tr FROM cell GROUP BY event_type),
        |cc AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS tc FROM cell GROUP BY dow),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS tn FROM cell),
        |x AS (
        |  SELECT c.event_type, c.dow, c.o, r.tr, cc.tc, nn.tn,
        |    (c.o * nn.tn - r.tr * cc.tc) * CAST(1.0 AS DOUBLE) AS dd
        |  FROM cell c JOIN r USING (event_type) JOIN cc USING (dow) CROSS JOIN nn),
        |y AS (
        |  SELECT event_type, dow, o,
        |    CAST(FLOOR(tr * CAST(1.0 AS DOUBLE) * tc / tn * 100.0) AS BIGINT) AS exp_c,
        |    CAST(FLOOR(dd * dd / (tr * CAST(1.0 AS DOUBLE) * tc * tn)
        |      * 1000000.0) AS BIGINT) AS contrib_q6
        |  FROM x),
        |tot AS (SELECT CAST(SUM(contrib_q6) AS BIGINT) AS chi2_q6 FROM y)
        |SELECT y.event_type, y.dow, y.o, y.exp_c, y.contrib_q6, tot.chi2_q6
        |FROM y CROSS JOIN tot ORDER BY y.event_type, y.dow""".stripMargin) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      val r = cell.groupBy(col("event_type")).agg(sum(col("o")).as("tr"))
      val cc = cell.groupBy(col("dow")).agg(sum(col("o")).as("tc"))
      val nn = cell.agg(sum(col("o")).as("tn"))
      val x = cell
        .join(broadcast(r), Seq("event_type"))
        .join(broadcast(cc), Seq("dow"))
        .crossJoin(broadcast(nn))
        .withColumn("dd", (col("o") * col("tn") - col("tr") * col("tc")) * lit(1.0))
      val y = x.select(col("event_type"), col("dow"), col("o"),
        floor(col("tr") * lit(1.0) * col("tc") / col("tn") * lit(100.0))
          .cast("long").as("exp_c"),
        floor(col("dd") * col("dd") / (col("tr") * lit(1.0) * col("tc") * col("tn"))
          * lit(1000000.0)).cast("long").as("contrib_q6"))
      val tot = y.agg(sum(col("contrib_q6")).as("chi2_q6"))
      y.crossJoin(broadcast(tot))
        .select(col("event_type"), col("dow"), col("o"), col("exp_c"),
          col("contrib_q6"), col("chi2_q6"))
        .orderBy(col("event_type"), col("dow"))
    },

    // Kolmogorov–Smirnov two-sample drift between the first-15-days and
    // later value distributions per event type — the distribution-shift
    // screen next to q_drift_weekly's total variation. ENTIRELY integer:
    // per-(type, whole-dollar-value) histograms, key-partitioned
    // cumulative windows over the bounded value vocabulary, and the KS
    // statistic as max |cumA·nB − cumB·nA| cross-multiplied so no
    // division happens until the final q6 quantization.
    QueryDef.sql(
      "q_ks_drift",
      """WITH span AS (SELECT CAST(MIN(ts) AS DATE) AS d0 FROM events),
        |h AS (
        |  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) < d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) >= d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM events CROSS JOIN span GROUP BY event_type, CAST(FLOOR(value) AS BIGINT)),
        |t AS (
        |  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb
        |  FROM h GROUP BY event_type),
        |c AS (
        |  SELECT event_type, v,
        |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cuma,
        |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cumb
        |  FROM h),
        |d AS (
        |  SELECT c.event_type,
        |    CAST(MAX(ABS(c.cuma * t.nb - c.cumb * t.na)) AS BIGINT) AS dnum
        |  FROM c JOIN t ON t.event_type = c.event_type
        |  GROUP BY c.event_type)
        |SELECT d.event_type, t.na, t.nb,
        |  CAST((d.dnum * 1000000) // (t.na * t.nb) AS BIGINT) AS ks_q6
        |FROM d JOIN t ON t.event_type = d.event_type
        |ORDER BY d.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val span = ev.agg(min(col("ts")).cast("date").as("d0"))
      val h = ev.crossJoin(broadcast(span))
        .groupBy(col("event_type"), floor(col("value")).cast("long").as("v"))
        .agg(sum(when(col("ts").cast("date") < date_add(col("d0"), 15), 1L)
          .otherwise(0L)).as("ca"),
          sum(when(col("ts").cast("date") >= date_add(col("d0"), 15), 1L)
            .otherwise(0L)).as("cb"))
      val t = h.groupBy(col("event_type"))
        .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val c = h.select(col("event_type"), col("v"),
        sum(col("ca")).over(wCum).as("cuma"),
        sum(col("cb")).over(wCum).as("cumb"))
      val dMax = c.join(broadcast(t), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .cast("long").as("dnum"))
      dMax.join(broadcast(t), Seq("event_type"))
        .select(col("event_type"), col("na"), col("nb"),
          expr("(dnum * 1000000) div (na * nb)").as("ks_q6"))
        .orderBy(col("event_type"))
    },

    // Binary (at-most-one-change) changepoint per event type: over the
    // bounded daily-count grid, the split k maximizing the CUSUM²
    // objective (S_k·n − S·k)²/(k·(n−k)). Prefix sums are exact; the
    // score is one shared IEEE tree floor-quantized BEFORE the argmax so
    // the (score, k) rank is deterministic in both engines. Left/right
    // means report as exact integer centi-divisions.
    QueryDef.sql(
      "q_changepoint",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type, di, x,
        |    SUM(x) OVER w AS sk,
        |    ROW_NUMBER() OVER w AS k,
        |    SUM(x) OVER (PARTITION BY event_type) AS s,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY di
        |               ROWS UNBOUNDED PRECEDING)),
        |sc AS (
        |  SELECT event_type, di, k, n, sk, s,
        |    CAST(FLOOR(((sk * n - s * k) * CAST(1.0 AS DOUBLE))
        |      * ((sk * n - s * k) * CAST(1.0 AS DOUBLE))
        |      / (k * (n - k)) / (s * CAST(1.0 AS DOUBLE) / n)
        |      * 1000000.0 / s) AS BIGINT) AS score_q6
        |  FROM p WHERE k < n),
        |best AS (
        |  SELECT event_type, di, k, n, sk, s, score_q6,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY score_q6 DESC, k) AS rn
        |  FROM sc)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(k AS BIGINT) AS k_hat, CAST(di AS BIGINT) AS split_day,
        |  score_q6,
        |  CAST((sk * 100) // k AS BIGINT) AS mean_left_c,
        |  CAST(((s - sk) * 100) // (n - k) AS BIGINT) AS mean_right_c
        |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val wRun = Window.partitionBy(col("event_type")).orderBy(col("di"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("event_type"))
      val p = daily.select(col("event_type"), col("di"), col("x"),
        sum(col("x")).over(wRun).as("sk"),
        row_number().over(Window.partitionBy(col("event_type")).orderBy(col("di"))).as("k"),
        sum(col("x")).over(wAll).as("s"),
        count(lit(1)).over(wAll).as("n"))
      val dd = (col("sk") * col("n") - col("s") * col("k")) * lit(1.0)
      val sc = p.filter(col("k") < col("n"))
        .select(col("event_type"), col("di"), col("k"), col("n"), col("sk"), col("s"),
          floor(dd * dd / (col("k") * (col("n") - col("k")))
            / (col("s") * lit(1.0) / col("n")) * lit(1000000.0) / col("s"))
            .cast("long").as("score_q6"))
      val wBest = Window.partitionBy(col("event_type"))
        .orderBy(col("score_q6").desc, col("k"))
      sc.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          col("k").cast("long").as("k_hat"), col("di").as("split_day"),
          col("score_q6"),
          expr("(sk * 100) div k").as("mean_left_c"),
          expr("((s - sk) * 100) div (n - k)").as("mean_right_c"))
        .orderBy(col("event_type"))
    },

    // CUPED variance reduction (the modern experimentation readout):
    // per-user pre-period spend (first 15 days, whole-dollar floor) as
    // the covariate x, post-period spend as the metric y; θ = cov/var(x)
    // from exact BIGINT moments over users; the cohort (user parity)
    // difference reported raw AND CUPED-adjusted (diff_y − θ·diff_x),
    // plus the theoretical variance-reduction share ρ². Zero pre-period
    // variance NULLs everything downstream (the guard discipline). One
    // user-keyed reduction, then 1-row broadcast algebra.
    QueryDef.sql(
      "q_cuped",
      """WITH span AS (SELECT CAST(MIN(ts) AS DATE) AS d0 FROM events),
        |u AS (
        |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) < d0 + 15
        |      THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) >= d0 + 15
        |      THEN CAST(FLOOR(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events CROSS JOIN span GROUP BY user_id, user_id % 2),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
        |  FROM u),
        |c AS (
        |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cn,
        |    CAST(SUM(x) AS BIGINT) AS cx, CAST(SUM(y) AS BIGINT) AS cy
        |  FROM u GROUP BY cohort),
        |w AS (
        |  SELECT
        |    MAX(CASE WHEN cohort = 0 THEN cn END) AS n0,
        |    MAX(CASE WHEN cohort = 0 THEN cx END) AS x0,
        |    MAX(CASE WHEN cohort = 0 THEN cy END) AS y0,
        |    MAX(CASE WHEN cohort = 1 THEN cn END) AS n1,
        |    MAX(CASE WHEN cohort = 1 THEN cx END) AS x1,
        |    MAX(CASE WHEN cohort = 1 THEN cy END) AS y1
        |  FROM c)
        |SELECT m.n AS n_users,
        |  CASE WHEN (m.n*m.sxx - m.sx*m.sx) = 0 THEN NULL
        |  ELSE CAST(FLOOR((m.n*m.sxy - m.sx*m.sy) * CAST(1000000.0 AS DOUBLE)
        |    / (m.n*m.sxx - m.sx*m.sx)) AS BIGINT) END AS theta_q6,
        |  CASE WHEN (m.n*m.sxx - m.sx*m.sx) = 0 OR (m.n*m.syy - m.sy*m.sy) = 0 THEN NULL
        |  ELSE CAST(FLOOR(
        |    ((m.n*m.sxy - m.sx*m.sy) * CAST(1.0 AS DOUBLE))
        |    * ((m.n*m.sxy - m.sx*m.sy) * CAST(1.0 AS DOUBLE))
        |    / ((m.n*m.sxx - m.sx*m.sx) * CAST(1.0 AS DOUBLE))
        |    / (m.n*m.syy - m.sy*m.sy) * 1000000.0) AS BIGINT) END AS rho2_q6,
        |  CAST(FLOOR((w.y0 * CAST(1.0 AS DOUBLE) / w.n0
        |    - w.y1 * CAST(1.0 AS DOUBLE) / w.n1) * 1000000.0) AS BIGINT) AS diff_raw_q6,
        |  CASE WHEN (m.n*m.sxx - m.sx*m.sx) = 0 THEN NULL
        |  ELSE CAST(FLOOR(
        |    ((w.y0 * CAST(1.0 AS DOUBLE) / w.n0 - w.y1 * CAST(1.0 AS DOUBLE) / w.n1)
        |     - ((m.n*m.sxy - m.sx*m.sy) * CAST(1.0 AS DOUBLE) / (m.n*m.sxx - m.sx*m.sx))
        |       * (w.x0 * CAST(1.0 AS DOUBLE) / w.n0 - w.x1 * CAST(1.0 AS DOUBLE) / w.n1))
        |    * 1000000.0) AS BIGINT) END AS diff_adj_q6
        |FROM m CROSS JOIN w""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val span = ev.agg(min(col("ts")).cast("date").as("d0"))
      val u = ev.crossJoin(broadcast(span))
        .select(col("user_id"), pmod(col("user_id"), lit(2)).cast("long").as("cohort"),
          when(col("ts").cast("date") < date_add(col("d0"), 15),
            floor(col("value")).cast("long")).otherwise(0L).as("xv"),
          when(col("ts").cast("date") >= date_add(col("d0"), 15),
            floor(col("value")).cast("long")).otherwise(0L).as("yv"))
        .groupBy(col("user_id"), col("cohort"))
        .agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
      val m = u.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val c = u.groupBy(col("cohort"))
        .agg(count(lit(1)).as("cn"), sum(col("x")).as("cx"), sum(col("y")).as("cy"))
      val w = c.agg(
        max(when(col("cohort") === 0, col("cn"))).as("n0"),
        max(when(col("cohort") === 0, col("cx"))).as("x0"),
        max(when(col("cohort") === 0, col("cy"))).as("y0"),
        max(when(col("cohort") === 1, col("cn"))).as("n1"),
        max(when(col("cohort") === 1, col("cx"))).as("x1"),
        max(when(col("cohort") === 1, col("cy"))).as("y1"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      val my0 = col("y0") * lit(1.0) / col("n0")
      val my1 = col("y1") * lit(1.0) / col("n1")
      val mx0 = col("x0") * lit(1.0) / col("n0")
      val mx1 = col("x1") * lit(1.0) / col("n1")
      m.crossJoin(broadcast(w))
        .select(col("n").as("n_users"),
          when(vx === 0, lit(null))
            .otherwise(floor(cov * lit(1000000.0) / vx).cast("long")).as("theta_q6"),
          when(vx === 0 || vy === 0, lit(null))
            .otherwise(floor((cov * lit(1.0)) * (cov * lit(1.0))
              / (vx * lit(1.0)) / vy * lit(1000000.0)).cast("long")).as("rho2_q6"),
          floor((my0 - my1) * lit(1000000.0)).cast("long").as("diff_raw_q6"),
          when(vx === 0, lit(null))
            .otherwise(floor(((my0 - my1)
              - (cov * lit(1.0) / vx) * (mx0 - mx1)) * lit(1000000.0)).cast("long"))
            .as("diff_adj_q6"))
    },

    // Theil–Sen robust trend: the median of all pairwise slopes of the
    // per-type daily count series — the outlier-proof alternative to the
    // OLS slope in q_daily_corr_ols. The pair self-join runs on the
    // TIME-bounded daily grid (≤ days²/2 pairs per type, independent of
    // row count), each slope is one exact-numerator IEEE division
    // floor-quantized to q6, and the median pick is a deterministic
    // (slope, d1, d2) rank inside each type partition.
    QueryDef.sql(
      "q_theilsen",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |pr AS (
        |  SELECT a.event_type,
        |    CAST(FLOOR((b.x - a.x) * CAST(1000000.0 AS DOUBLE)
        |      / (b.di - a.di)) AS BIGINT) AS sl,
        |    a.di AS d1, b.di AS d2
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.di < b.di),
        |rk AS (
        |  SELECT event_type, sl,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY sl, d1, d2) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM pr)
        |SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
        |  CAST(sl AS BIGINT) AS ts_slope_q6
        |FROM rk WHERE rn = (m + 1) // 2 ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val pr = daily.as("a")
        .join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.di") < col("b.di"))
        .select(col("a.event_type").as("event_type"),
          floor((col("b.x") - col("a.x")) * lit(1000000.0)
            / (col("b.di") - col("a.di"))).cast("long").as("sl"),
          col("a.di").as("d1"), col("b.di").as("d2"))
      val wp = Window.partitionBy(col("event_type"))
      pr.select(col("event_type"), col("sl"),
          row_number().over(wp.orderBy(col("sl"), col("d1"), col("d2"))).as("rn"),
          count(lit(1)).over(wp).as("m"))
        .filter(col("rn") === expr("(m + 1) div 2"))
        .select(col("event_type"), col("m").cast("long").as("n_pairs"),
          col("sl").as("ts_slope_q6"))
        .orderBy(col("event_type"))
    },

    // Mann–Kendall trend test (with the textbook tie correction) on the
    // same daily grid: S = Σ sign(x_j − x_i) over ordered day pairs, the
    // variance 18·Var = n(n−1)(2n+5) − Σt(t−1)(2t+5) stays a pure
    // integer, and the continuity-corrected z is one shared IEEE tree.
    // A constant series zeroes the variance → NULL (the q_autocorr_lag
    // guard discipline).
    QueryDef.sql(
      "q_mann_kendall",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |pr AS (
        |  SELECT a.event_type,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.di < b.di),
        |s AS (SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
        |      FROM pr GROUP BY event_type),
        |nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM daily GROUP BY event_type),
        |ties AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        |  FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM daily GROUP BY event_type, x)
        |  GROUP BY event_type),
        |v AS (
        |  SELECT nn.event_type, nn.n, s.s_stat,
        |    nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 AS var18
        |  FROM nn JOIN s ON s.event_type = nn.event_type
        |  JOIN ties ON ties.event_type = nn.event_type)
        |SELECT event_type, n AS n_days, s_stat,
        |  CASE WHEN var18 <= 0 THEN NULL
        |  ELSE CAST(FLOOR(
        |    (s_stat - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
        |    * CAST(1000000.0 AS DOUBLE)
        |    / SQRT(var18 * CAST(1.0 AS DOUBLE) / 18.0)) AS BIGINT)
        |  END AS z_q6
        |FROM v ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val pr = daily.as("a")
        .join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.di") < col("b.di"))
        .select(col("a.event_type").as("event_type"),
          when(col("b.x") > col("a.x"), 1)
            .when(col("b.x") < col("a.x"), -1).otherwise(0).as("sg"))
      val sS = pr.groupBy(col("event_type")).agg(sum(col("sg")).cast("long").as("s_stat"))
      val nn = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ties = daily.groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie18"))
      val v = nn.join(sS, Seq("event_type")).join(ties, Seq("event_type"))
        .withColumn("var18",
          col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie18"))
      val corr = col("s_stat") -
        when(col("s_stat") > 0, 1).when(col("s_stat") < 0, -1).otherwise(0)
      v.select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          when(col("var18") <= 0, lit(null))
            .otherwise(floor(corr * lit(1000000.0)
              / sqrt(col("var18") * lit(1.0) / lit(18.0))).cast("long"))
            .as("z_q6"))
        .orderBy(col("event_type"))
    },

    // Additive seasonal decomposition of the daily event-count series:
    // trend = centered 7-day moving average (NULL at the edges where the
    // window is short), seasonal = per-ISO-weekday mean of the detrended
    // series, residual = detrended − seasonal. The only global window
    // runs over the BOUNDED daily grid (an Aggregate input — gated by
    // PlanAuditSpec); everything stays integer-exact in centi-units: the
    // MA is (Σ·100) div 7, the per-dow mean is one negative-safe FLOOR
    // of an exact-sum division, both identical across engines.
    QueryDef.sql(
      "q_seasonal_decompose",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |ma AS (
        |  SELECT day, x,
        |    CAST(SUM(x) OVER w7 AS BIGINT) AS s7,
        |    CAST(COUNT(*) OVER w7 AS BIGINT) AS c7
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, x,
        |    CASE WHEN c7 = 7 THEN CAST((s7 * 100) // 7 AS BIGINT) END AS trend_c,
        |    CASE WHEN c7 = 7 THEN x * 100 - CAST((s7 * 100) // 7 AS BIGINT) END AS detr_c
        |  FROM ma),
        |seas AS (
        |  SELECT CAST(ISODOW(day) AS BIGINT) AS dow,
        |    CAST(FLOOR(SUM(detr_c) * CAST(1.0 AS DOUBLE) / COUNT(*)) AS BIGINT) AS seas_c
        |  FROM det WHERE detr_c IS NOT NULL GROUP BY 1)
        |SELECT d.day, d.x, d.trend_c, s.seas_c,
        |  d.detr_c - s.seas_c AS resid_c
        |FROM det d JOIN seas s ON s.dow = CAST(ISODOW(d.day) AS BIGINT)
        |ORDER BY d.day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val ma = daily.select(col("day"), col("x"),
        sum(col("x")).over(w7).as("s7"),
        count(lit(1)).over(w7).as("c7"))
      val det = ma.select(col("day"), col("x"),
        when(col("c7") === 7, expr("(s7 * 100) div 7")).as("trend_c"),
        when(col("c7") === 7, col("x") * 100 - expr("(s7 * 100) div 7")).as("detr_c"))
      val seas = det.filter(col("detr_c").isNotNull)
        .groupBy((weekday(col("day")) + 1).cast("long").as("dow"))
        .agg(floor(sum(col("detr_c")) * lit(1.0) / count(lit(1)))
          .cast("long").as("seas_c"))
      det
        .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
        .join(broadcast(seas), Seq("dow"))
        .select(col("day"), col("x"), col("trend_c"), col("seas_c"),
          (col("detr_c") - col("seas_c")).as("resid_c"))
        .orderBy(col("day"))
    },

    // Spearman rank correlation (tie-corrected, per return flag) between
    // quantity and price — the monotone-association twin of Pearson
    // q_daily_corr_ols. Average ranks are kept EXACT as doubled integers:
    // 2·avgrank = 2·(count below) + (count equal) + 1, from one
    // value-vocabulary cumulative window per variable, joined back to
    // rows. Sum of average ranks is n(n+1)/2 exactly even under ties, so
    // centering at (n+1) makes Σd = 0 and the three remaining moments
    // Σdx·dy, Σdx², Σdy² are exact — accumulated in DECIMAL(38,0) /
    // HUGEINT (the q_table_checksum 128-bit discipline: |d| ≤ n makes the
    // sums O(n³), past int64 at rehearsal scale). One shared IEEE tree
    // computes ρ at the end; zero rank variance → NULL (guard
    // discipline).
    QueryDef.sql(
      "q_spearman",
      """WITH base AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |rx AS (
        |  SELECT g, x,
        |    2 * (SUM(c) OVER (PARTITION BY g ORDER BY x
        |           ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS rx2
        |  FROM (SELECT g, x, COUNT(*) AS c FROM base GROUP BY g, x)),
        |ry AS (
        |  SELECT g, y,
        |    2 * (SUM(c) OVER (PARTITION BY g ORDER BY y
        |           ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS ry2
        |  FROM (SELECT g, y, COUNT(*) AS c FROM base GROUP BY g, y)),
        |r AS (
        |  SELECT base.g, CAST(rx.rx2 AS BIGINT) AS rx2, CAST(ry.ry2 AS BIGINT) AS ry2
        |  FROM base JOIN rx ON rx.g = base.g AND rx.x = base.x
        |            JOIN ry ON ry.g = base.g AND ry.y = base.y),
        |nn AS (SELECT g, COUNT(*) + 1 AS nn1 FROM base GROUP BY g),
        |m AS (
        |  SELECT r.g, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM((rx2 - nn1) * (ry2 - nn1)) AS sxy,
        |    SUM((rx2 - nn1) * (rx2 - nn1)) AS sxx,
        |    SUM((ry2 - nn1) * (ry2 - nn1)) AS syy
        |  FROM r JOIN nn ON nn.g = r.g
        |  GROUP BY r.g)
        |SELECT g, n,
        |  CASE WHEN sxx = 0 OR syy = 0 THEN NULL
        |    ELSE CAST(FLOOR(CAST(sxy AS DOUBLE) / SQRT(CAST(sxx AS DOUBLE))
        |      / SQRT(CAST(syy AS DOUBLE)) * 1000000.0) AS BIGINT)
        |  END AS rho_q6
        |FROM m ORDER BY g""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      def doubledRanks(df: org.apache.spark.sql.DataFrame, v: String, out: String) = {
        val w = Window.partitionBy(col("g")).orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, 0)
        df.groupBy(col("g"), col(v)).agg(count(lit(1)).as("c"))
          .select(col("g"), col(v),
            (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c") + 1).as(out))
      }
      val nn = base.groupBy(col("g")).agg((count(lit(1)) + 1).as("nn1"))
      val r = base
        .join(doubledRanks(base, "x", "rx2"), Seq("g", "x"))
        .join(doubledRanks(base, "y", "ry2"), Seq("g", "y"))
        .join(broadcast(nn), Seq("g"))
      val dec = "decimal(38,0)"
      val m = r.groupBy(col("g")).agg(
        count(lit(1)).as("n"),
        sum(((col("rx2") - col("nn1")) * (col("ry2") - col("nn1"))).cast(dec)).as("sxy"),
        sum(((col("rx2") - col("nn1")) * (col("rx2") - col("nn1"))).cast(dec)).as("sxx"),
        sum(((col("ry2") - col("nn1")) * (col("ry2") - col("nn1"))).cast(dec)).as("syy"))
      m.select(col("g"), col("n"),
        when(col("sxx") === 0 || col("syy") === 0, lit(null))
          .otherwise(floor(col("sxy").cast("double") / sqrt(col("sxx").cast("double"))
            / sqrt(col("syy").cast("double")) * lit(1000000.0)).cast("long"))
          .as("rho_q6"))
        .orderBy(col("g"))
    },

    // Seasonal-naive forecast backtest: over each event type's last 14
    // days, score yesterday's count (naive-1) against the same-weekday
    // count (naive-7) as forecasts — the sanity baseline every real
    // forecasting pipeline reports before fitting anything. Missing grid
    // days forecast 0 via LEFT self-joins on the bounded daily rollup
    // (a lag window would silently skip gaps); MAE is an exact integer
    // permille-style division.
    QueryDef.sql(
      "q_snaive_mae",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(di) AS d0, MAX(di) AS d1
        |         FROM daily GROUP BY 1),
        |ev AS (
        |  SELECT d.event_type, d.di, d.x,
        |    COALESCE(l1.x, 0) AS f1, COALESCE(l7.x, 0) AS f7
        |  FROM daily d
        |  JOIN span s ON s.event_type = d.event_type
        |  LEFT JOIN daily l1 ON l1.event_type = d.event_type AND l1.di = d.di - 1
        |  LEFT JOIN daily l7 ON l7.event_type = d.event_type AND l7.di = d.di - 7
        |  WHERE d.di > s.d1 - 14 AND d.di - 7 >= s.d0)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  CAST((SUM(ABS(x - f1)) * 1000000) // COUNT(*) AS BIGINT) AS mae1_q6,
        |  CAST((SUM(ABS(x - f7)) * 1000000) // COUNT(*) AS BIGINT) AS mae7_q6
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val span = daily.groupBy(col("event_type"))
        .agg(min(col("di")).as("d0"), max(col("di")).as("d1"))
      val l1 = daily.select(col("event_type").as("et1"),
        col("di").as("di1"), col("x").as("x1"))
      val l7 = daily.select(col("event_type").as("et7"),
        col("di").as("di7"), col("x").as("x7"))
      daily
        .join(broadcast(span), Seq("event_type"))
        .join(l1, col("et1") === col("event_type")
          && col("di1") === col("di") - 1, "left")
        .join(l7, col("et7") === col("event_type")
          && col("di7") === col("di") - 7, "left")
        .filter(col("di") > col("d1") - 14 && col("di") - 7 >= col("d0"))
        .select(col("event_type"), col("x"),
          coalesce(col("x1"), lit(0L)).as("f1"),
          coalesce(col("x7"), lit(0L)).as("f7"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          expr("(sum(abs(x - f1)) * 1000000) div count(*)").as("mae1_q6"),
          expr("(sum(abs(x - f7)) * 1000000) div count(*)").as("mae7_q6"))
        .orderBy(col("event_type"))
    },

    // Rolling 14-day OLS slope of daily event volume — local trend
    // detection as a windowed twin of the global q_daily_corr_ols fit.
    // The five moments (n, Σd, Σx, Σdx, Σd²) accumulate exactly inside
    // one RANGE frame over the bounded daily grid (epoch-day indexes
    // keep every product well under 2⁶³ — n·Σdx tops out near 10¹³ even
    // at 1000× volume). One shared IEEE division at the end; single-day
    // windows (zero variance) emit NULL.
    QueryDef.sql(
      "q_rolling_slope",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, di, x,
        |    COUNT(*) OVER w AS n,
        |    SUM(di) OVER w AS sd, SUM(x) OVER w AS sx,
        |    SUM(di * x) OVER w AS sdx, SUM(di * di) OVER w AS sdd
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY di
        |    RANGE BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, di, x, CAST(n AS BIGINT) AS n_days,
        |  CASE WHEN n * sdd - sd * sd = 0 THEN NULL
        |    ELSE CAST(FLOOR((n * sdx - sd * sx) * CAST(1000000.0 AS DOUBLE)
        |      / (n * sdd - sd * sd)) AS BIGINT)
        |  END AS slope_q6
        |FROM m ORDER BY event_type, di""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
        .rangeBetween(-13, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sd", sum(col("di")).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sdx", sum(col("di") * col("x")).over(w))
        .withColumn("sdd", sum(col("di") * col("di")).over(w))
        .select(col("event_type"), col("di"), col("x"),
          col("n").cast("long").as("n_days"),
          when(col("n") * col("sdd") - col("sd") * col("sd") === 0, lit(null))
            .otherwise(floor((col("n") * col("sdx") - col("sd") * col("sx"))
              * lit(1000000.0)
              / (col("n") * col("sdd") - col("sd") * col("sd"))).cast("long"))
            .as("slope_q6"))
        .orderBy(col("event_type"), col("di"))
    },

    // Lead–lag cross-correlation between the view and purchase daily
    // series: Pearson r at every shift k ∈ [−7, 7] (does today's view
    // volume predict purchases k days later?). One lag-grid expansion
    // (15×) over the BOUNDED daily rollup, aligned by an equi-join on
    // the shifted day index; exact moments per lag, zero-variance →
    // NULL. The full lag profile is reported — argmax is the reader's
    // one-liner and would hide the shape.
    QueryDef.sql(
      "q_lag_xcorr",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT di, x FROM daily WHERE event_type = 'view'),
        |b AS (SELECT di, x FROM daily WHERE event_type = 'purchase'),
        |lags AS (SELECT UNNEST(RANGE(-7, 8)) AS k),
        |m AS (
        |  SELECT lags.k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.x) AS BIGINT) AS sa, CAST(SUM(b.x) AS BIGINT) AS sb,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS sab,
        |    CAST(SUM(a.x * a.x) AS BIGINT) AS saa,
        |    CAST(SUM(b.x * b.x) AS BIGINT) AS sbb
        |  FROM lags JOIN a ON TRUE JOIN b ON b.di = a.di + lags.k
        |  GROUP BY lags.k)
        |SELECT k AS lag_days, n AS n_days,
        |  CASE WHEN n*saa - sa*sa = 0 OR n*sbb - sb*sb = 0 THEN NULL
        |    ELSE CAST(FLOOR((n*sab - sa*sb) * CAST(1000000.0 AS DOUBLE)
        |      / SQRT(CAST(n*saa - sa*sa AS DOUBLE))
        |      / SQRT(CAST(n*sbb - sb*sb AS DOUBLE))) AS BIGINT)
        |  END AS r_q6
        |FROM m ORDER BY lag_days""".stripMargin) { (s, d) =>
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val a = daily.filter(col("event_type") === "view")
        .select(col("di").as("dia"), col("x").as("xa"))
      val b = daily.filter(col("event_type") === "purchase")
        .select(col("di").as("dib"), col("x").as("xb"))
      val lags = (-7 to 7).map(_.toLong).toDF("k")
      val m = broadcast(lags).crossJoin(a)
        .join(b, col("dib") === col("dia") + col("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
          sum(col("xa") * col("xb")).as("sab"),
          sum(col("xa") * col("xa")).as("saa"),
          sum(col("xb") * col("xb")).as("sbb"))
      m.select(col("k").as("lag_days"), col("n").as("n_days"),
        when((col("n") * col("saa") - col("sa") * col("sa")) === 0
          || (col("n") * col("sbb") - col("sb") * col("sb")) === 0, lit(null))
          .otherwise(floor((col("n") * col("sab") - col("sa") * col("sb"))
            * lit(1000000.0)
            / sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double"))
            / sqrt((col("n") * col("sbb") - col("sb") * col("sb")).cast("double")))
            .cast("long"))
          .as("r_q6"))
        .orderBy(col("lag_days"))
    },

    // Spike/peak detection on the daily volume series: a day is a peak
    // when it beats both neighbors (strictly the previous, at-least the
    // next — deterministic plateau handling) AND clears 120% of the
    // trailing-7-day mean, phrased as the cross-multiplied integer
    // comparison 10·7·x ≥ 12·Σ₇ so no division ever happens. Pure
    // lag/lead windows over the bounded daily grid.
    QueryDef.sql(
      "q_peak_detection",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, di, x,
        |    LAG(x) OVER win AS prev, LEAD(x) OVER win AS nxt,
        |    SUM(x) OVER (PARTITION BY event_type ORDER BY di
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY di
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY di))
        |SELECT event_type, di, x, CAST(s7 AS BIGINT) AS sum7_prev,
        |  CAST(n7 AS BIGINT) AS n7
        |FROM w
        |WHERE prev IS NOT NULL AND nxt IS NOT NULL AND n7 >= 3
        |  AND x > prev AND x >= nxt AND 10 * n7 * x >= 12 * s7
        |ORDER BY event_type, di""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("di"))
      val trail = win.rowsBetween(-7, -1)
      daily
        .withColumn("prev", lag(col("x"), 1).over(win))
        .withColumn("nxt", lead(col("x"), 1).over(win))
        .withColumn("s7", sum(col("x")).over(trail))
        .withColumn("n7", count(lit(1)).over(trail))
        .filter(col("prev").isNotNull && col("nxt").isNotNull && col("n7") >= 3
          && col("x") > col("prev") && col("x") >= col("nxt")
          && lit(10) * col("n7") * col("x") >= lit(12) * col("s7"))
        .select(col("event_type"), col("di"), col("x"),
          col("s7").as("sum7_prev"), col("n7"))
        .orderBy(col("event_type"), col("di"))
    },

    // SAX symbolization: each event type's daily series compressed to a
    // symbol string — 3-day piecewise-aggregate segments, each mapped to
    // a/b/c/d by its ratio to the series mean (cross-multiplied integer
    // breakpoints at 75%/100%/125%, no division): the classic
    // time-series index for motif/novelty search. Segment order is
    // pinned by an explicit sort inside the aggregation, so the string
    // is deterministic in both engines.
    QueryDef.sql(
      "q_sax_symbols",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |d0 AS (SELECT event_type, MIN(di) AS d0 FROM daily GROUP BY 1),
        |seg AS (
        |  SELECT daily.event_type, (daily.di - d0.d0) // 3 AS sg,
        |    CAST(SUM(daily.x) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS sn
        |  FROM daily JOIN d0 ON d0.event_type = daily.event_type
        |  GROUP BY daily.event_type, (daily.di - d0.d0) // 3),
        |m AS (SELECT event_type, CAST(SUM(sx) AS BIGINT) AS tx,
        |        CAST(SUM(sn) AS BIGINT) AS tn FROM seg GROUP BY 1),
        |sym AS (
        |  SELECT seg.event_type, seg.sg,
        |    CASE
        |      WHEN seg.sx * m.tn * 4 < m.tx * seg.sn * 3 THEN 'a'
        |      WHEN seg.sx * m.tn * 4 < m.tx * seg.sn * 4 THEN 'b'
        |      WHEN seg.sx * m.tn * 4 < m.tx * seg.sn * 5 THEN 'c'
        |      ELSE 'd' END AS s
        |  FROM seg JOIN m ON m.event_type = seg.event_type)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  STRING_AGG(s, '' ORDER BY sg) AS sax
        |FROM sym GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val d0 = daily.groupBy(col("event_type")).agg(min(col("di")).as("d0"))
      val seg = daily.join(broadcast(d0), Seq("event_type"))
        .groupBy(col("event_type"), expr("(di - d0) div 3").as("sg"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("sn"))
      val m = seg.groupBy(col("event_type"))
        .agg(sum(col("sx")).as("tx"), sum(col("sn")).as("tn"))
      val sym = seg.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("sg"),
          when(col("sx") * col("tn") * 4 < col("tx") * col("sn") * 3, "a")
            .when(col("sx") * col("tn") * 4 < col("tx") * col("sn") * 4, "b")
            .when(col("sx") * col("tn") * 4 < col("tx") * col("sn") * 5, "c")
            .otherwise("d").as("s"))
      sym.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_segments"),
          array_join(transform(array_sort(collect_list(struct(col("sg"), col("s")))),
            x => x.getField("s")), "").as("sax"))
        .orderBy(col("event_type"))
    },

    // Difference-in-differences: purchase (treated) vs view (control)
    // daily volume around the day-15 intervention split — the 2×2 design
    // whose interaction term is the causal readout when parallel trends
    // hold. All four cell means are exact centi-integer divisions of
    // BIGINT (sum, days) cells; DiD is pure integer arithmetic on them.
    QueryDef.sql(
      "q_did",
      """WITH daily AS (
        |  SELECT event_type, CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1, 2),
        |sp AS (SELECT MIN(di) + 15 AS cut FROM daily),
        |cells AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS treated,
        |    CASE WHEN di >= sp.cut THEN 1 ELSE 0 END AS post,
        |    CAST((SUM(x) * 100) // COUNT(*) AS BIGINT) AS mean_c
        |  FROM daily CROSS JOIN sp GROUP BY 1, 2)
        |SELECT
        |  MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_c END) AS t_pre_c,
        |  MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_c END) AS t_post_c,
        |  MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_c END) AS c_pre_c,
        |  MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_c END) AS c_post_c,
        |  CAST(MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_c END)
        |     - MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_c END)
        |     - MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_c END)
        |     + MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_c END)
        |   AS BIGINT) AS did_c
        |FROM cells""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(count(lit(1)).as("x"))
      val sp = daily.agg((min(col("di")) + 15).as("cut"))
      val cells = daily.crossJoin(broadcast(sp))
        .groupBy(when(col("event_type") === "purchase", 1).otherwise(0).as("treated"),
          when(col("di") >= col("cut"), 1).otherwise(0).as("post"))
        .agg(expr("(sum(x) * 100) div count(*)").as("mean_c"))
      def cell(t: Int, p: Int) =
        max(when(col("treated") === t && col("post") === p, col("mean_c")))
      cells.agg(
        cell(1, 0).as("t_pre_c"), cell(1, 1).as("t_post_c"),
        cell(0, 0).as("c_pre_c"), cell(0, 1).as("c_post_c"),
        (cell(1, 1) - cell(1, 0) - cell(0, 1) + cell(0, 0)).cast("long").as("did_c"))
    },

    // Partial correlation: does view volume still track purchase volume
    // once total daily activity is controlled for? r_xy·z from the three
    // pairwise Pearson r's — each from exact BIGINT moments over the
    // bounded daily grid, combined in ONE shared IEEE tree
    // (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). Degenerate controls
    // (|r_xz| or |r_yz| = 1, or any zero variance) emit NULL.
    QueryDef.sql(
      "q_partial_corr",
      """WITH daily AS (
        |  SELECT CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS z
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(z) AS BIGINT) AS sz,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*z) AS BIGINT) AS sxz,
        |    CAST(SUM(y*z) AS BIGINT) AS syz,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
        |    CAST(SUM(z*z) AS BIGINT) AS szz
        |  FROM daily),
        |r AS (
        |  SELECT n,
        |    (n*sxy - sx*sy) * CAST(1.0 AS DOUBLE)
        |      / SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
        |      / SQRT(CAST(n*syy - sy*sy AS DOUBLE)) AS rxy,
        |    (n*sxz - sx*sz) * CAST(1.0 AS DOUBLE)
        |      / SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
        |      / SQRT(CAST(n*szz - sz*sz AS DOUBLE)) AS rxz,
        |    (n*syz - sy*sz) * CAST(1.0 AS DOUBLE)
        |      / SQRT(CAST(n*syy - sy*sy AS DOUBLE))
        |      / SQRT(CAST(n*szz - sz*sz AS DOUBLE)) AS ryz
        |  FROM m
        |  WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 AND n*szz - sz*sz > 0)
        |SELECT n AS n_days,
        |  CAST(FLOOR(rxy * 1000000.0) AS BIGINT) AS rxy_q6,
        |  CAST(FLOOR(rxz * 1000000.0) AS BIGINT) AS rxz_q6,
        |  CAST(FLOOR(ryz * 1000000.0) AS BIGINT) AS ryz_q6,
        |  CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) <= 0.0 THEN NULL
        |    ELSE CAST(FLOOR((rxy - rxz * ryz)
        |      / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
        |      * 1000000.0) AS BIGINT)
        |  END AS partial_q6
        |FROM r""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
          count(lit(1)).as("z"))
      val m = daily.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
        sum(col("y") * col("z")).as("syz"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"))
      def rr(sab: String, a: String, b: String) =
        (col("n") * col(sab) - col("s" + a) * col("s" + b)) * lit(1.0) /
          sqrt((col("n") * col(s"s$a$a") - col("s" + a) * col("s" + a)).cast("double")) /
          sqrt((col("n") * col(s"s$b$b") - col("s" + b) * col("s" + b)).cast("double"))
      val r = m
        .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0
          && col("n") * col("syy") - col("sy") * col("sy") > 0
          && col("n") * col("szz") - col("sz") * col("sz") > 0)
        .select(col("n"), rr("sxy", "x", "y").as("rxy"),
          rr("sxz", "x", "z").as("rxz"), rr("syz", "y", "z").as("ryz"))
      r.select(col("n").as("n_days"),
        floor(col("rxy") * lit(1000000.0)).cast("long").as("rxy_q6"),
        floor(col("rxz") * lit(1000000.0)).cast("long").as("rxz_q6"),
        floor(col("ryz") * lit(1000000.0)).cast("long").as("ryz_q6"),
        when((lit(1.0) - col("rxz") * col("rxz"))
          * (lit(1.0) - col("ryz") * col("ryz")) <= 0.0, lit(null))
          .otherwise(floor((col("rxy") - col("rxz") * col("ryz"))
            / sqrt((lit(1.0) - col("rxz") * col("rxz"))
              * (lit(1.0) - col("ryz") * col("ryz")))
            * lit(1000000.0)).cast("long"))
          .as("partial_q6"))
    },

    // Jackknife confidence interval for the purchase/view ratio —
    // resampling inference WITHOUT randomness: the leave-one-day-out
    // replicates are each computable from the totals minus that day
    // (one pass over the bounded daily grid), every replicate is
    // integer-quantized to q9 BEFORE the exact variance sums (so
    // accumulation order can't matter; Σθ² runs in DECIMAL/HUGEINT),
    // and SE = √((n−1)/n · Σ(θᵢ−θ̄)²) is one shared IEEE tree.
    QueryDef.sql(
      "q_jackknife_ci",
      """WITH daily AS (
        |  SELECT CAST(EPOCH_US(ts) // 86400000000 AS BIGINT) AS di,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(v) AS BIGINT) AS tv, CAST(SUM(p) AS BIGINT) AS tp,
        |        CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        |rep AS (
        |  SELECT ((t.tp - d.p) * 1000000000) // (t.tv - d.v) AS th
        |  FROM daily d CROSS JOIN t WHERE t.tv > d.v),
        |js AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(th) AS BIGINT) AS m,
        |    SUM(CAST(th AS HUGEINT) * th) AS ss
        |  FROM rep)
        |SELECT js.n AS n_days,
        |  CAST((t.tp * 1000000000) // t.tv AS BIGINT) AS theta_q9,
        |  CAST(FLOOR(SQRT((CAST(js.n AS DOUBLE) * CAST(js.ss AS DOUBLE)
        |      - CAST(js.m AS DOUBLE) * CAST(js.m AS DOUBLE))
        |    * (js.n - 1)) / js.n) AS BIGINT) AS se_q9,
        |  CAST((t.tp * 1000000000) // t.tv
        |    - CAST(FLOOR(1.96 * (SQRT((CAST(js.n AS DOUBLE) * CAST(js.ss AS DOUBLE)
        |        - CAST(js.m AS DOUBLE) * CAST(js.m AS DOUBLE))
        |      * (js.n - 1)) / js.n)) AS BIGINT) AS BIGINT) AS lo_q9,
        |  CAST((t.tp * 1000000000) // t.tv
        |    + CAST(FLOOR(1.96 * (SQRT((CAST(js.n AS DOUBLE) * CAST(js.ss AS DOUBLE)
        |        - CAST(js.m AS DOUBLE) * CAST(js.m AS DOUBLE))
        |      * (js.n - 1)) / js.n)) AS BIGINT) AS BIGINT) AS hi_q9
        |FROM js CROSS JOIN t""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("di"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      val t = daily.agg(sum(col("v")).as("tv"), sum(col("p")).as("tp"),
        count(lit(1)).as("nd"))
      val rep = daily.crossJoin(broadcast(t))
        .filter(col("tv") > col("v"))
        .select(expr("((tp - p) * 1000000000) div (tv - v)").as("th"))
      val js = rep.agg(count(lit(1)).as("n"), sum(col("th")).as("m"),
        sum(col("th").cast("decimal(38,0)") * col("th")).as("ss"))
      val se = sqrt((col("n").cast("double") * col("ss").cast("double")
        - col("m").cast("double") * col("m").cast("double"))
        * (col("n") - 1)) / col("n")
      js.crossJoin(broadcast(t))
        .select(col("n").as("n_days"),
          expr("(tp * 1000000000) div tv").as("theta_q9"),
          floor(se).cast("long").as("se_q9"),
          (expr("(tp * 1000000000) div tv")
            - floor(lit(1.96) * se).cast("long")).as("lo_q9"),
          (expr("(tp * 1000000000) div tv")
            + floor(lit(1.96) * se).cast("long")).as("hi_q9"))
    }
  )
}
