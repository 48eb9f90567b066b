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
      // (r15 negative result: deriving nn1 as a second window on the rx
      // table — instead of this separate broadcast count — measured 1 s
      // SLOWER at sf0.1; the broadcast build overlaps the rank scans,
      // the extra window pass does not. Left as-was.)
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
