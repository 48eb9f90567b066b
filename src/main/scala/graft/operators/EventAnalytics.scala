package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the product-analytics
  * operator family a serving engine runs next to the pipeline operators:
  * transition matrices, funnels, cohort retention, and time-weighted
  * averages. All window frames partition by user (high cardinality — never
  * a global window), all aggregates are combiner-backed, and every value
  * is integer-quantized per the determinism contract.
  */
object EventAnalytics {

  val queries: Seq[QueryDef] = Seq(

    // Markov transition matrix: (event_type → next event_type) counts per
    // user-ordered stream — LEAD over (user, time) then one combiner
    // aggregate over the 25-cell matrix
    QueryDef.sql(
      "q_event_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Ordered funnel: users who viewed, then clicked AFTER the first view,
    // then purchased AFTER that click — each stage joins on the previous
    // stage's first-completion time (strict event ordering, not mere
    // co-occurrence)
    QueryDef.sql(
      "q_funnel",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t1
        |  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t0
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t1
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked_after,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchased_after""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id") && col("e.ts") > col("v.t0"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t1"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.t1"))
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_after")))
    },

    // Cohort retention: users grouped by first-activity week, counted as
    // active per week offset — the (cohort × offset) retention matrix.
    // Both stages are combiner-backed aggregates; the cohort table joins
    // back by user key (no window over the corpus).
    QueryDef.sql(
      "q_retention_cohorts",
      """WITH firsts AS (
        |  SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
        |  FROM events)
        |SELECT f.cohort AS cohort_week,
        |  CAST(DATEDIFF('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_active
        |FROM activity a JOIN firsts f USING (user_id)
        |GROUP BY f.cohort, DATEDIFF('day', f.cohort, a.wk) / 7
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firsts = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      activity.join(firsts, Seq("user_id"))
        .groupBy(col("cohort").as("cohort_week"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Time-weighted average value per user-day (TWAP): each reading
    // weights by its holding duration to the next reading the same day;
    // the day's last reading carries no weight (half-open intervals).
    // Weighted sums are exact int64; the final ratio is one double
    // division + floor, identical both engines.
    QueryDef.sql(
      "q_twap",
      """WITH seq AS (
        |  SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS v_c, EPOCH_US(ts) AS t,
        |    LEAD(EPOCH_US(ts)) OVER (
        |      PARTITION BY user_id, DATE_TRUNC('day', ts) ORDER BY ts, event_id) AS t_next
        |  FROM events)
        |SELECT user_id, day,
        |  CAST(SUM(v_c * (t_next - t)) AS BIGINT) AS sum_wv,
        |  CAST(SUM(t_next - t) AS BIGINT) AS sum_dt,
        |  CAST(FLOOR(SUM(v_c * (t_next - t)) * CAST(1.0 AS DOUBLE) / SUM(t_next - t)) AS BIGINT) AS twap_c
        |FROM seq WHERE t_next IS NOT NULL
        |GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), date_trunc("day", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      val seq = Tables.events(s, d).select(
        col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
        floor(col("value") * 100).cast("long").as("v_c"),
        unix_micros(col("ts")).as("t"),
        lead(unix_micros(col("ts")), 1).over(w).as("t_next"))
      seq.filter(col("t_next").isNotNull)
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("v_c") * (col("t_next") - col("t"))).as("sum_wv"),
          sum(col("t_next") - col("t")).as("sum_dt"))
        .select(col("user_id"), col("day"), col("sum_wv"), col("sum_dt"),
          floor(col("sum_wv") * lit(1.0) / col("sum_dt")).cast("long").as("twap_c"))
        .orderBy(col("user_id"), col("day"))
    },

    // Interval-union coverage: each event opens a 5-minute activity
    // interval; overlapping intervals merge and the covered time per user
    // is the union length. The running-max-end island trick — all windows
    // partition by user, so the merge is key-local at any scale.
    QueryDef.sql(
      "q_interval_union",
      """WITH iv AS (
        |  SELECT user_id, event_id, EPOCH_US(ts) AS s,
        |    EPOCH_US(ts) + 300000000 AS e
        |  FROM events),
        |x AS (
        |  SELECT user_id, event_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |y AS (
        |  SELECT user_id, event_id, s, e,
        |    CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (
        |  SELECT user_id, s, e,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM y),
        |isl AS (
        |  SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
        |  FROM z GROUP BY user_id, island)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      val iv = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 300000000L).as("e"))
      val x = iv.withColumn("prev_max",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      val y = x.withColumn("is_new",
        when(col("prev_max").isNull || col("s") > col("prev_max"), 1).otherwise(0))
      val z = y.withColumn("island",
        sum(col("is_new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      z.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("s0"), max(col("e")).as("e1"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), sum(col("e1") - col("s0")).as("covered_us"))
        .orderBy(col("user_id"))
    },

    // Week-over-week growth: LAG over the pre-aggregated weekly series
    // (the window sees one row per (type, week), never raw events),
    // growth quantized from one exact double division
    QueryDef.sql(
      "q_wow_growth",
      """WITH wk AS (
        |  SELECT event_type, CAST(DATE_TRUNC('week', ts) AS DATE) AS week,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, DATE_TRUNC('week', ts)),
        |g AS (
        |  SELECT event_type, week, n,
        |    LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev
        |  FROM wk)
        |SELECT event_type, week, n, COALESCE(prev, 0) AS prev_n,
        |  CASE WHEN prev IS NULL THEN CAST(NULL AS BIGINT)
        |       ELSE CAST(FLOOR((n - prev) * CAST(1000000.0 AS DOUBLE) / prev) AS BIGINT) END AS growth_q6
        |FROM g ORDER BY event_type, week""".stripMargin) { (s, d) =>
      val wk = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      wk.withColumn("prev", lag(col("n"), 1).over(w))
        .select(col("event_type"), col("week"), col("n"),
          coalesce(col("prev"), lit(0L)).as("prev_n"),
          when(col("prev").isNull, lit(null).cast("long"))
            .otherwise(floor((col("n") - col("prev")) * lit(1000000.0) / col("prev"))
              .cast("long")).as("growth_q6"))
        .orderBy(col("event_type"), col("week"))
    },

    // Distribution-drift monitor: total-variation distance between
    // consecutive weeks' event-type mixes — the alarm a training-data
    // pipeline hangs on its source composition. TV = ½·Σ|p_i − q_i|
    // computed from EXACT integer cross terms |n_i·M − m_i·N| (no
    // per-row division), quantized once per week. The type×week spine
    // fills absent types with 0 so a vanishing type registers as drift.
    // Scale: everything runs over the #weeks × #types aggregate table,
    // never raw events; windows partition by week or type.
    QueryDef.sql(
      "q_drift_weekly",
      """WITH wk AS (
        |  SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS week, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT w.week, t.event_type
        |  FROM (SELECT DISTINCT week FROM wk) w
        |  CROSS JOIN (SELECT DISTINCT event_type FROM wk) t),
        |f AS (
        |  SELECT s.week, s.event_type, COALESCE(wk.n, 0) AS n
        |  FROM spine s LEFT JOIN wk USING (week, event_type)),
        |l AS (
        |  SELECT week, event_type, n,
        |    LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM f),
        |d AS (
        |  SELECT week, event_type, n, prev_n,
        |    SUM(n) OVER (PARTITION BY week) AS n_cur,
        |    SUM(prev_n) OVER (PARTITION BY week) AS n_prev
        |  FROM l WHERE prev_n IS NOT NULL)
        |SELECT week,
        |  CAST(MAX(n_cur) AS BIGINT) AS n_cur,
        |  CAST(MAX(n_prev) AS BIGINT) AS n_prev,
        |  CAST(SUM(ABS(n * n_prev - prev_n * n_cur)) AS BIGINT) AS s_abs,
        |  CAST(FLOOR(SUM(ABS(n * n_prev - prev_n * n_cur))
        |    * CAST(1000000.0 AS DOUBLE) / (2 * MAX(n_cur) * MAX(n_prev)))
        |    AS BIGINT) AS tv_q6
        |FROM d GROUP BY week ORDER BY week""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wk = Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val spine = wk.select(col("week")).distinct()
        .crossJoin(broadcast(wk.select(col("event_type")).distinct()))
      val f = spine.join(wk, Seq("week", "event_type"), "left")
        .select(col("week"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      val l = f.withColumn("prev_n",
          lag(col("n"), 1).over(Window.partitionBy(col("event_type")).orderBy(col("week"))))
        .filter(col("prev_n").isNotNull)
      val wWeek = Window.partitionBy(col("week"))
      val dd = l
        .withColumn("n_cur", sum(col("n")).over(wWeek))
        .withColumn("n_prev", sum(col("prev_n")).over(wWeek))
      val sAbs = sum(abs(col("n") * col("n_prev") - col("prev_n") * col("n_cur")))
      dd.groupBy(col("week"))
        .agg(max(col("n_cur")).as("n_cur"), max(col("n_prev")).as("n_prev"),
          sAbs.cast("long").as("s_abs"),
          floor(sAbs * lit(1000000.0) / (lit(2) * max(col("n_cur")) * max(col("n_prev"))))
            .cast("long").as("tv_q6"))
        .orderBy(col("week"))
    },

    // Rolling 7-day distinct active users. Sliding DISTINCT does not
    // decompose into window partials, so the scale formulation is the
    // CONTRIBUTION EXPANSION: reduce to one row per (day, user) first
    // (combiner-backed), then each such row contributes to the ≤7 target
    // days whose trailing window covers it — a bounded ×7 explode over the
    // REDUCED rows, never the raw stream — and a per-target-day distinct
    // count. Window edges keep their partial windows on both engines.
    QueryDef.sql(
      "q_rolling_dau",
      """WITH du AS (
        |  SELECT DISTINCT EPOCH_US(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du),
        |contrib AS (
        |  SELECT du.day + o AS tday, du.user_id
        |  FROM du CROSS JOIN UNNEST(RANGE(0, 7)) AS u(o))
        |SELECT CAST(c.tday AS BIGINT) AS day,
        |  CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS dau7
        |FROM contrib c CROSS JOIN span
        |WHERE c.tday BETWEEN span.d0 AND span.d1
        |GROUP BY c.tday ORDER BY day""".stripMargin) { (s, d) =>
      val dayUs = 86400000000L
      val du = Tables.events(s, d)
        .select(expr(s"unix_micros(ts) div $dayUs").as("day"), col("user_id"))
        .distinct()
      val span = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      du.select(explode(sequence(col("day"), col("day") + 6)).as("tday"),
          col("user_id"))
        .crossJoin(broadcast(span))
        .filter(col("tday").between(col("d0"), col("d1")))
        .groupBy(col("tday").as("day"))
        .agg(countDistinct(col("user_id")).as("dau7"))
        .orderBy(col("day"))
    },

    // Cumulative customer growth: distinct customers ever seen, by first
    // order month. The scale form: one combiner-backed MIN per customer
    // (first-seen month), one count per month, then a running sum over
    // the TINY month table — a cumulative COUNT(DISTINCT) window over
    // raw orders would re-shuffle the fact table per month instead.
    QueryDef.sql(
      "q_cumulative_users",
      """WITH fs AS (
        |  SELECT o_custkey,
        |    CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS DATE) AS first_month
        |  FROM orders GROUP BY o_custkey),
        |mo AS (
        |  SELECT first_month AS month, CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM fs GROUP BY first_month)
        |SELECT month, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY month
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cumulative
        |FROM mo ORDER BY month""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val fs = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(date_trunc("month", min(col("o_orderdate"))).cast("date").as("first_month"))
      val mo = fs.groupBy(col("first_month").as("month"))
        .agg(count(lit(1)).as("n_new"))
      // global window over the month table only (#months rows —
      // documented bounded-global-window exception)
      mo.withColumn("n_cumulative",
          sum(col("n_new")).over(Window.orderBy(col("month"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("month"))
    },

    // RFM segmentation: per-user Recency (days since last event, against
    // the corpus max timestamp), Frequency (events), Monetary (purchase
    // cents) — then the coarse 2×2×2 segment label a lifecycle pipeline
    // acts on. One combiner-backed pass over events plus a broadcast
    // 1-row anchor; banding thresholds are exact integers.
    QueryDef.sql(
      "q_rfm_segments",
      """WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
        |rfm AS (
        |  SELECT user_id,
        |    CAST((EPOCH_US(a.mx) - EPOCH_US(MAX(e.ts))) // 86400000000 AS BIGINT) AS recency_d,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CASE WHEN e.event_type = 'purchase'
        |      THEN CAST(FLOOR(e.value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS monetary_c
        |  FROM events e CROSS JOIN anchor a
        |  GROUP BY user_id, a.mx)
        |SELECT user_id, recency_d, frequency, monetary_c,
        |  (CASE WHEN recency_d <= 7 THEN 'R1' ELSE 'R0' END ||
        |   CASE WHEN frequency >= 20 THEN 'F1' ELSE 'F0' END ||
        |   CASE WHEN monetary_c >= 50000 THEN 'M1' ELSE 'M0' END) AS segment
        |FROM rfm ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val anchor = ev.agg(max(col("ts")).as("mx"))
      ev.crossJoin(broadcast(anchor)) // 1-row corpus anchor — never a driver action
        .groupBy(col("user_id"), col("mx"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("frequency"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).as("monetary_c"))
        .select(col("user_id"),
          expr("(unix_micros(mx) - unix_micros(last_ts)) div 86400000000")
            .as("recency_d"),
          col("frequency"), col("monetary_c"),
          concat(when(expr("(unix_micros(mx) - unix_micros(last_ts)) div 86400000000") <= 7,
              "R1").otherwise("R0"),
            when(col("frequency") >= 20, "F1").otherwise("F0"),
            when(col("monetary_c") >= 50000, "M1").otherwise("M0")).as("segment"))
        .orderBy(col("user_id"))
    },

    // Last-touch attribution: each purchase credits the most recent
    // preceding non-purchase event of the same user within a 24 h
    // lookback, else 'direct'. One pass: the per-user IGNORE NULLS
    // last_value window carries (ts, type) of the latest candidate
    // touch — no self-join, the stream is scanned once and the window
    // is user-partitioned (key-local sort at any scale).
    QueryDef.sql(
      "q_attribution",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, EPOCH_US(ts) AS tus FROM events),
        |carried AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN tus END IGNORE NULLS)
        |      OVER w AS touch_tus,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id,
        |  CASE WHEN touch_tus IS NOT NULL AND tus - touch_tus <= 86400000000
        |       THEN touch_type ELSE 'direct' END AS channel,
        |  CAST(CASE WHEN touch_tus IS NOT NULL AND tus - touch_tus <= 86400000000
        |       THEN tus - touch_tus END AS BIGINT) AS dt_us
        |FROM carried WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id LIMIT 2000""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carried = ev
        .withColumn("touch_tus",
          last(when(col("event_type") =!= "purchase", col("tus")), ignoreNulls = true).over(w))
        .withColumn("touch_type",
          last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
      val attributed = col("touch_tus").isNotNull &&
        col("tus") - col("touch_tus") <= 86400000000L
      carried.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          when(attributed, col("touch_type")).otherwise("direct").as("channel"),
          when(attributed, col("tus") - col("touch_tus")).cast("long").as("dt_us"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(2000)
    },

    // Linear multi-touch attribution (the fractional complement of the
    // last-touch query above): every non-purchase touch within the 24 h
    // lookback of a purchase shares its credit equally — credit per touch
    // is the INTEGER q6 split 1000000 div n, so both engines sum exact
    // integers and channel totals compare bit-for-bit. The touch↔purchase
    // pairing is an equi join on user_id with a bounded time-range
    // predicate — per-user work is bounded by activity inside the window,
    // never a cross join; the per-purchase touch count is one
    // combiner-backed groupBy on the pair stream.
    QueryDef.sql(
      "q_attribution_linear",
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, EPOCH_US(ts) AS tus FROM events),
        |p AS (SELECT user_id, event_id AS pid, tus AS ptus
        |      FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type AS channel, tus
        |      FROM ev WHERE event_type <> 'purchase'),
        |pt AS (
        |  SELECT p.pid, t.channel
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tus < p.ptus AND t.tus >= p.ptus - 86400000000),
        |n AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_t FROM pt GROUP BY pid),
        |credit AS (
        |  SELECT pt.channel, 1000000 // n.n_t AS c
        |  FROM pt JOIN n USING (pid))
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(c) AS BIGINT) AS credit_q6
        |FROM credit GROUP BY channel ORDER BY channel""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("tus").as("ptus"))
      val t = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("channel"), col("tus"))
      val pt = p.join(t, p("user_id") === t("user_id") &&
          t("tus") < p("ptus") && t("tus") >= p("ptus") - 86400000000L)
        .select(col("pid"), col("channel"))
      val n = pt.groupBy(col("pid")).agg(count(lit(1)).as("n_t"))
      pt.join(n, Seq("pid"))
        .select(col("channel"), expr("1000000 div n_t").as("c"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"), sum(col("c")).as("credit_q6"))
        .orderBy(col("channel"))
    },

    // Consecutive-day activity streaks per user (gaps-and-islands on the
    // DISTINCT active-day grid): day minus its per-user rank is constant
    // within a run of consecutive days, so one user-partitioned window +
    // two combiner-backed groupBys produce per-user streak stats. The
    // window runs over the (user, day) DISTINCT grid — time-bounded per
    // user, never raw events.
    QueryDef.sql(
      "q_user_streaks",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM days),
        |isl AS (
        |  SELECT user_id, day - CAST(rn AS INTEGER) AS grp,
        |    CAST(COUNT(*) AS BIGINT) AS len
        |  FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
        |SELECT user_id,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(MAX(len) AS BIGINT) AS longest_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val r = days.withColumn("rn",
        row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
      val isl = r.groupBy(col("user_id"),
          date_sub(col("day"), col("rn").cast("int")).as("grp"))
        .agg(count(lit(1)).as("len"))
      isl.groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy(col("user_id"))
    },

    // Entry-path analysis: each user's first three event types (event-time
    // order, id tie-break) as a '>'-joined path, counted across users.
    // The rank window is user-partitioned; the path assembly is a 3-row
    // conditional pivot per user — never an ordered collect.
    QueryDef.sql(
      "q_entry_paths",
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY EPOCH_US(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN rn = 1 THEN event_type END) || '>' ||
        |    MAX(CASE WHEN rn = 2 THEN event_type END) || '>' ||
        |    MAX(CASE WHEN rn = 3 THEN event_type END) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id
        |  HAVING COUNT(*) = 3)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val r = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
      val p = r.groupBy(col("user_id"))
        .agg(
          max(when(col("rn") === 1, col("event_type"))).as("e1"),
          max(when(col("rn") === 2, col("event_type"))).as("e2"),
          max(when(col("rn") === 3, col("event_type"))).as("e3"),
          count(lit(1)).as("n"))
        .filter(col("n") === 3)
        .select(concat(col("e1"), lit(">"), col("e2"), lit(">"), col("e3")).as("path"))
      p.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    },

    // Association rules over session baskets (market-basket mining):
    // sessions are the 30-minute-gap sessionization, a basket is the
    // DISTINCT event_type set of one session, and each ordered pair
    // a→b (a < b lexically) is scored support / confidence / lift from
    // exact basket counts. The pair self-join fans out per basket by
    // its DISTINCT item degree (bounded by the event-type vocabulary,
    // never raw event count) and reduces to ≤|vocab|² cells; the three
    // ratios are single IEEE divisions of exact BIGINTs.
    QueryDef.sql(
      "q_assoc_rules",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |              OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_type,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sn
        |  FROM flagged),
        |basket AS (SELECT DISTINCT user_id, sn, event_type FROM sess),
        |nb AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT DISTINCT user_id, sn FROM basket)),
        |item AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM basket GROUP BY event_type),
        |pair AS (
        |  SELECT a.event_type AS a, b.event_type AS b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM basket a JOIN basket b
        |    ON a.user_id = b.user_id AND a.sn = b.sn
        |   AND a.event_type < b.event_type
        |  GROUP BY a.event_type, b.event_type)
        |SELECT p.a, p.b, p.n_ab, ia.c AS n_a, ib.c AS n_b,
        |  CAST(FLOOR(p.n_ab * CAST(1000000.0 AS DOUBLE) / nb.n) AS BIGINT)
        |    AS support_q6,
        |  CAST(FLOOR(p.n_ab * CAST(1000000.0 AS DOUBLE) / ia.c) AS BIGINT)
        |    AS conf_q6,
        |  CAST(FLOOR(p.n_ab * CAST(1000000.0 AS DOUBLE) * nb.n
        |             / (ia.c * CAST(1.0 AS DOUBLE) * ib.c)) AS BIGINT)
        |    AS lift_q6
        |FROM pair p
        |JOIN item ia ON ia.event_type = p.a
        |JOIN item ib ON ib.event_type = p.b
        |CROSS JOIN nb
        |ORDER BY p.a, p.b""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val basket = Tables.events(s, d)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sn",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("user_id"), col("sn"), col("event_type"))
        .distinct()
        .persist()
      val nb = basket.select(col("user_id"), col("sn")).distinct()
        .agg(count(lit(1)).as("n"))
      val item = basket.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      val pair = basket.as("a")
        .join(basket.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.sn") === col("b.sn") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("a"), col("b.event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      pair
        .join(broadcast(item.select(col("event_type").as("a"), col("c").as("n_a"))), Seq("a"))
        .join(broadcast(item.select(col("event_type").as("b"), col("c").as("n_b"))), Seq("b"))
        .crossJoin(broadcast(nb))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          floor(col("n_ab") * lit(1000000.0) / col("n")).cast("long").as("support_q6"),
          floor(col("n_ab") * lit(1000000.0) / col("n_a")).cast("long").as("conf_q6"),
          floor(col("n_ab") * lit(1000000.0) * col("n")
            / (col("n_a") * lit(1.0) * col("n_b"))).cast("long").as("lift_q6"))
        .orderBy(col("a"), col("b"))
    },

    // Eventually-follows graph (process mining): a ⤳ b counts the users
    // with SOME occurrence of a strictly before SOME occurrence of b,
    // which reduces to first(a) < last(b) — so the raw stream collapses
    // to one (user, type) span table first (combiner-backed min/max) and
    // the pair join fans out by each user's DISTINCT type degree
    // (vocabulary-bounded), never by raw event count. The companion to
    // q_event_transitions' directly-follows matrix.
    QueryDef.sql(
      "q_eventually_follows",
      """WITH span AS (
        |  SELECT user_id, event_type,
        |    MIN(EPOCH_US(ts)) AS first_us, MAX(EPOCH_US(ts)) AS last_us
        |  FROM events GROUP BY user_id, event_type)
        |SELECT a.event_type AS from_type, b.event_type AS to_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM span a JOIN span b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        | AND a.first_us < b.last_us
        |GROUP BY a.event_type, b.event_type
        |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      val span = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      span.as("a")
        .join(span.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") =!= col("b.event_type") &&
            col("a.first_us") < col("b.last_us"))
        .groupBy(col("a.event_type").as("from_type"),
          col("b.event_type").as("to_type"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Peak interval concurrency per user (max simultaneously-open
    // sessions — the companion to q_interval_union's covered-time): each
    // event opens a 5-minute interval; the classic sweep line turns every
    // interval into a +1/-1 endpoint pair, a per-user running sum gives
    // the open-interval depth, and the peak is the max depth. Ends sort
    // before starts at the same instant (delta -1 < +1), so touching
    // intervals do not double-count — half-open [s, e) semantics. All
    // windows are per-user partitions over 2× the user's own events;
    // first_peak_us is the earliest sweep position reaching the peak,
    // which is deterministic because depth at a position does not depend
    // on the order of equal-delta ties.
    QueryDef.sql(
      "q_interval_concurrency",
      """WITH pts AS (
        |  SELECT user_id, EPOCH_US(ts) AS t, 1 AS delta, event_id FROM events
        |  UNION ALL
        |  SELECT user_id, EPOCH_US(ts) + 300000000, -1, event_id FROM events),
        |run AS (
        |  SELECT user_id, t, delta,
        |    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS depth
        |  FROM pts),
        |pk AS (SELECT user_id, CAST(MAX(depth) AS BIGINT) AS peak FROM run GROUP BY user_id)
        |SELECT r.user_id, p.peak, CAST(MIN(r.t) AS BIGINT) AS first_peak_us
        |FROM run r JOIN pk p ON r.user_id = p.user_id AND r.depth = p.peak
        |GROUP BY r.user_id, p.peak ORDER BY r.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val starts = ev.select(col("user_id"), unix_micros(col("ts")).as("t"),
        lit(1).as("delta"), col("event_id"))
      val ends = ev.select(col("user_id"),
        (unix_micros(col("ts")) + 300000000L).as("t"),
        lit(-1).as("delta"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("delta"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val run = starts.unionAll(ends)
        .withColumn("depth", sum(col("delta")).over(w))
      val pk = run.groupBy(col("user_id"))
        .agg(max(col("depth")).cast("long").as("peak"))
      run.join(pk.withColumnRenamed("user_id", "pu"),
          col("user_id") === col("pu") && col("depth") === col("peak"))
        .groupBy(col("user_id"), col("peak"))
        .agg(min(col("t")).as("first_peak_us"))
        .orderBy(col("user_id"))
    },

    // DAU/MAU stickiness (the engagement ratio product teams track): per
    // day, distinct actives that day over distinct actives in the
    // trailing 30 days, as integer q6. Both counts come off the
    // PRE-REDUCED distinct (day, user) grid — DAU directly, MAU by
    // exploding each grid row into the 30 forward days it contributes to
    // (bounded 30× blow-up of an already user×day-bounded table, the
    // same contribution trick as q_rolling_dau — never a window over raw
    // events).
    QueryDef.sql(
      "q_stickiness",
      """WITH du AS (
        |  SELECT DISTINCT EPOCH_US(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du),
        |dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
        |contrib AS (
        |  SELECT du.day + o AS tday, du.user_id
        |  FROM du CROSS JOIN UNNEST(RANGE(0, 30)) AS u(o)),
        |mau AS (
        |  SELECT c.tday AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
        |  FROM contrib c CROSS JOIN span
        |  WHERE c.tday BETWEEN span.d0 AND span.d1
        |  GROUP BY c.tday)
        |SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, mau.mau,
        |  CAST((dau.dau * 1000000) // mau.mau AS BIGINT) AS stick_q6
        |FROM dau JOIN mau ON dau.day = mau.day
        |ORDER BY day""".stripMargin) { (s, d) =>
      val dayUs = 86400000000L
      val du = Tables.events(s, d)
        .select(expr(s"unix_micros(ts) div $dayUs").as("day"), col("user_id"))
        .distinct()
      val span = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val mau = du
        .select(explode(sequence(col("day"), col("day") + 29)).as("tday"),
          col("user_id"))
        .crossJoin(broadcast(span))
        .filter(col("tday").between(col("d0"), col("d1")))
        .groupBy(col("tday").as("day"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, Seq("day"))
        .select(col("day"), col("dau"), col("mau"),
          expr("(dau * 1000000) div mau").as("stick_q6"))
        .orderBy(col("day"))
    },

    // Week-over-week churn flow (the growth-accounting waterfall): each
    // active (user, week) is classified new / retained / resurrected by
    // the user's previous active week, and counted as churning OUT of a
    // week when the next active week is not the immediately following
    // one. Weeks are exact integer indices (epoch-day // 7), the per-user
    // LAG/LEAD windows run over the DISTINCT (user, week) grid — bounded
    // by users × weeks, never raw events — and the final rollup is one
    // combiner-backed groupBy per week.
    QueryDef.sql(
      "q_churn_flow",
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    CAST((EPOCH_US(ts) // 86400000000) // 7 AS BIGINT) AS mi
        |  FROM events),
        |mx AS (SELECT CAST(MAX(mi) AS BIGINT) AS max_mi FROM um),
        |seq AS (
        |  SELECT user_id, mi,
        |    LAG(mi) OVER (PARTITION BY user_id ORDER BY mi) AS prev_mi,
        |    LEAD(mi) OVER (PARTITION BY user_id ORDER BY mi) AS next_mi
        |  FROM um),
        |st AS (
        |  SELECT s.mi,
        |    CASE WHEN prev_mi IS NULL THEN 'new'
        |         WHEN prev_mi = s.mi - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS status,
        |    CASE WHEN s.mi < mx.max_mi
        |              AND (next_mi IS NULL OR next_mi > s.mi + 1)
        |         THEN 1 ELSE 0 END AS churn_out
        |  FROM seq s CROSS JOIN mx)
        |SELECT mi AS week,
        |  CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |  CAST(SUM(churn_out) AS BIGINT) AS n_churn_out
        |FROM st GROUP BY mi ORDER BY week""".stripMargin) { (s, d) =>
      val um = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("mi"))
        .distinct()
      val mx = um.agg(max(col("mi")).as("max_mi"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("mi"))
      val seq0 = um.select(col("user_id"), col("mi"),
        lag(col("mi"), 1).over(w).as("prev_mi"),
        lead(col("mi"), 1).over(w).as("next_mi"))
      val st = seq0.crossJoin(broadcast(mx))
        .select(col("mi"),
          when(col("prev_mi").isNull, "new")
            .when(col("prev_mi") === col("mi") - 1, "retained")
            .otherwise("resurrected").as("status"),
          when(col("mi") < col("max_mi") &&
            (col("next_mi").isNull || col("next_mi") > col("mi") + 1), 1)
            .otherwise(0).as("churn_out"))
      st.groupBy(col("mi").as("week"))
        .agg(sum(when(col("status") === "new", 1).otherwise(0)).cast("long").as("n_new"),
          sum(when(col("status") === "retained", 1).otherwise(0)).cast("long").as("n_retained"),
          sum(when(col("status") === "resurrected", 1).otherwise(0)).cast("long").as("n_resurrected"),
          sum(col("churn_out")).cast("long").as("n_churn_out"))
        .orderBy(col("week"))
    },

    // Cohort LTV curves: users grouped by first-activity week, purchase
    // revenue (exact cents) accumulated by week-age with a per-cohort
    // running total and per-user LTV (integer division by the cohort's
    // size). The per-user week rollup bounds everything downstream by
    // users × weeks; the cumulative window partitions by cohort over the
    // (cohort × age) AGGREGATE; cohort sizes broadcast back.
    QueryDef.sql(
      "q_cohort_ltv",
      """WITH um AS (
        |  SELECT user_id,
        |    CAST((EPOCH_US(ts) // 86400000000) // 7 AS BIGINT) AS mi,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_c
        |  FROM events GROUP BY user_id, (EPOCH_US(ts) // 86400000000) // 7),
        |co AS (SELECT user_id, CAST(MIN(mi) AS BIGINT) AS cohort_mi
        |       FROM um GROUP BY user_id),
        |cs AS (SELECT cohort_mi, CAST(COUNT(*) AS BIGINT) AS cohort_size
        |       FROM co GROUP BY cohort_mi),
        |age AS (
        |  SELECT co.cohort_mi, um.mi - co.cohort_mi AS age,
        |    CAST(SUM(um.rev_c) AS BIGINT) AS rev_c,
        |    CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM um JOIN co USING (user_id)
        |  GROUP BY co.cohort_mi, um.mi - co.cohort_mi),
        |cum AS (
        |  SELECT cohort_mi, age, rev_c, n_active,
        |    CAST(SUM(rev_c) OVER (PARTITION BY cohort_mi ORDER BY age
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_c
        |  FROM age)
        |SELECT c.cohort_mi AS cohort_week, c.age, c.rev_c, c.n_active,
        |  s.cohort_size, c.cum_rev_c,
        |  CAST(c.cum_rev_c // s.cohort_size AS BIGINT) AS ltv_pu_c
        |FROM cum c JOIN cs s USING (cohort_mi)
        |ORDER BY cohort_week, age""".stripMargin) { (s, d) =>
      val um = Tables.events(s, d)
        .groupBy(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("mi"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("rev_c"))
      val co = um.groupBy(col("user_id")).agg(min(col("mi")).as("cohort_mi"))
      val cs = co.groupBy(col("cohort_mi")).agg(count(lit(1)).as("cohort_size"))
      val age = um.join(co, Seq("user_id"))
        .groupBy(col("cohort_mi"), (col("mi") - col("cohort_mi")).as("age"))
        .agg(sum(col("rev_c")).as("rev_c"), count(lit(1)).as("n_active"))
      val wc = Window.partitionBy(col("cohort_mi")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, 0)
      age
        .withColumn("cum_rev_c", sum(col("rev_c")).over(wc).cast("long"))
        .join(broadcast(cs), Seq("cohort_mi"))
        .select(col("cohort_mi").as("cohort_week"), col("age"), col("rev_c"),
          col("n_active"), col("cohort_size"), col("cum_rev_c"),
          expr("cum_rev_c div cohort_size").as("ltv_pu_c"))
        .orderBy(col("cohort_week"), col("age"))
    },

    // Sequence-pattern detection (the behavioral-regex screen): each
    // user's event history collapses to an initial-letter string in
    // exact (ts, event_id) order, then counted against ordered-funnel /
    // exclusion / repeat patterns. The per-user string is key-local
    // (one collect per user, bounded by per-user activity); the pattern
    // sweep is 3 one-row aggregates unioned. Event initials are unique
    // in this schema (c/e/p/s/v), and the regexes stick to portable
    // syntax (classes + star) so Java and RE2 agree.
    QueryDef.sql(
      "q_seq_pattern",
      """WITH seq AS (
        |  SELECT user_id,
        |    STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id),
        |pats AS (
        |  SELECT 'funnel_vcp' AS pattern, 'v.*c.*p' AS re
        |  UNION ALL SELECT 'repeat_purchase', 'p.*p'
        |  UNION ALL SELECT 'vcp_no_error', 'v[^e]*c[^e]*p')
        |SELECT p.pattern,
        |  CAST(SUM(CASE WHEN REGEXP_MATCHES(s.s, p.re) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM pats p CROSS JOIN seq s
        |GROUP BY p.pattern ORDER BY p.pattern""".stripMargin) { (s, d) =>
      val seqDf = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_join(transform(array_sort(collect_list(struct(
            unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            substring(col("event_type"), 1, 1).as("i")))),
          x => x.getField("i")), "").as("s"))
      Seq(("funnel_vcp", "v.*c.*p"),
          ("repeat_purchase", "p.*p"),
          ("vcp_no_error", "v[^e]*c[^e]*p"))
        .map { case (nm, re) =>
          seqDf.agg(
              sum(when(col("s").rlike(re), 1L).otherwise(0L)).as("n_matched"),
              count(lit(1)).as("n_users"))
            .select(lit(nm).as("pattern"), col("n_matched"), col("n_users"))
        }
        .reduce(_ unionByName _)
        .orderBy(col("pattern"))
    },

    // Weekly top movers (the leaderboard-delta readout): items ranked by
    // weekly interaction count (dense ties broken by item id via
    // row_number), each week's top 5 reported with the rank change from
    // the previous week (NULL on debut). Rank windows partition by week
    // over the (week × item) AGGREGATE — bounded by the item vocabulary
    // per week; the week-over-week join keys on (item, week−1).
    QueryDef.sql(
      "q_weekly_top_movers",
      """WITH wi AS (
        |  SELECT (EPOCH_US(ts) // 86400000000) // 7 AS wk,
        |    CAST(props->>'k' AS BIGINT) AS item,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT wk, item, n,
        |    ROW_NUMBER() OVER (PARTITION BY wk ORDER BY n DESC, item) AS rank
        |  FROM wi)
        |SELECT CAST(a.wk AS BIGINT) AS week, a.item, a.n,
        |  CAST(a.rank AS BIGINT) AS rank,
        |  CAST(b.rank AS BIGINT) AS prev_rank,
        |  CAST(b.rank - a.rank AS BIGINT) AS rank_delta
        |FROM rk a LEFT JOIN rk b ON b.item = a.item AND b.wk = a.wk - 1
        |WHERE a.rank <= 5
        |ORDER BY week, rank""".stripMargin) { (s, d) =>
      val wi = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000 div 7").as("wk"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("item"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("wk")).orderBy(col("n").desc, col("item"))
      val rk = wi.withColumn("rank", row_number().over(w).cast("long"))
      rk.as("a")
        .join(rk.as("b"),
          col("b.item") === col("a.item") && col("b.wk") === col("a.wk") - 1,
          "left")
        .filter(col("a.rank") <= 5)
        .select(col("a.wk").as("week"), col("a.item").as("item"),
          col("a.n").as("n"), col("a.rank").as("rank"),
          col("b.rank").as("prev_rank"),
          (col("b.rank") - col("a.rank")).cast("long").as("rank_delta"))
        .orderBy(col("week"), col("rank"))
    },

    // Kaplan–Meier survival of time-to-first-error per user (duration =
    // first error day − first activity day; users with no error are
    // right-censored at the corpus horizon): the estimator's running
    // product stays a pure-integer q6 recursion
    // S_t = ⌊S_{t−1}·(n_t − d_t)/n_t⌋ over the TIME-bounded duration
    // timeline, so the DuckDB recursive CTE replays it exactly. Risk
    // sets come from one descending cumulative window over the per-
    // duration aggregate (gated as bounded input); the fold itself runs
    // over ≤ |durations| rows.
    QueryDef.sql(
      "q_kaplan_meier",
      """WITH RECURSIVE f AS (
        |  SELECT user_id,
        |    CAST(MIN(EPOCH_US(ts) // 86400000000) AS BIGINT) AS d0,
        |    CAST(MIN(CASE WHEN event_type = 'error'
        |      THEN EPOCH_US(ts) // 86400000000 END) AS BIGINT) AS de
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT CAST(MAX(EPOCH_US(ts) // 86400000000) AS BIGINT) AS maxd
        |       FROM events),
        |obs AS (
        |  SELECT CASE WHEN f.de IS NOT NULL THEN f.de - f.d0
        |              ELSE mx.maxd - f.d0 END AS t,
        |    CASE WHEN f.de IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM f CROSS JOIN mx),
        |byt AS (
        |  SELECT t, CAST(SUM(ev) AS BIGINT) AS d_ev,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM obs GROUP BY t),
        |tl AS (
        |  SELECT t, d_ev,
        |    CAST(SUM(cnt) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
        |    ROW_NUMBER() OVER (ORDER BY t) AS rn
        |  FROM byt),
        |km(rn, s) AS (
        |  SELECT rn, CAST((1000000 * (n_risk - d_ev)) // n_risk AS BIGINT)
        |  FROM tl WHERE rn = 1
        |  UNION ALL
        |  SELECT e.rn, CAST((k.s * (e.n_risk - e.d_ev)) // e.n_risk AS BIGINT)
        |  FROM km k JOIN tl e ON e.rn = k.rn + 1)
        |SELECT e.t AS duration_days, e.n_risk, e.d_ev AS n_events, k.s AS surv_q6
        |FROM tl e JOIN km k ON k.rn = e.rn
        |ORDER BY duration_days""".stripMargin) { (s, d) =>
      import s.implicits._
      val day = expr("unix_micros(ts) div 86400000000")
      val f = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(day).as("d0"),
          min(when(col("event_type") === "error", day)).as("de"))
      val mx = Tables.events(s, d).agg(max(day).as("maxd"))
      val obs = f.crossJoin(broadcast(mx))
        .select(
          when(col("de").isNotNull, col("de") - col("d0"))
            .otherwise(col("maxd") - col("d0")).as("t"),
          when(col("de").isNotNull, 1L).otherwise(0L).as("ev"))
      val byt = obs.groupBy(col("t"))
        .agg(sum(col("ev")).as("d_ev"), count(lit(1)).as("cnt"))
      val wDesc = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAsc = Window.orderBy(col("t"))
      val tl = byt
        .select(col("t"), col("d_ev"),
          sum(col("cnt")).over(wDesc).cast("long").as("n_risk"),
          row_number().over(wAsc).cast("long").as("rn"))
      tl.select(col("t"), col("rn"), col("n_risk"), col("d_ev"))
        .as[(Long, Long, Long, Long)]
        .coalesce(1)
        .sortWithinPartitions(col("rn"))
        .mapPartitions { it =>
          var sQ = 1000000L
          it.map { case (t, _, nRisk, dEv) =>
            sQ = sQ * (nRisk - dEv) / nRisk
            (t, nRisk, dEv, sQ)
          }
        }
        .toDF("duration_days", "n_risk", "n_events", "surv_q6")
        .orderBy(col("duration_days"))
    },

    // Pairwise audience overlap (exact Jaccard between every pair of
    // event-type audiences) WITHOUT a per-pair self-join of the user
    // table: one pass folds each user into a type-set BITMASK, the mask
    // histogram is at most 2^K rows (K = event-type vocabulary, bounded),
    // and every pair's |A|, |B|, |A∩B| read off the broadcast histogram
    // — the 25-pair matrix costs one groupBy over users at any scale.
    QueryDef.sql(
      "q_audience_overlap",
      """WITH idx AS (
        |  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS i
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |ui AS (
        |  SELECT DISTINCT user_id, i FROM events JOIN idx USING (event_type)),
        |um AS (SELECT user_id, CAST(SUM(1 << i) AS BIGINT) AS mask
        |       FROM ui GROUP BY user_id),
        |mc AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM um GROUP BY mask),
        |p AS (
        |  SELECT a.event_type AS type_a, a.i AS ia, b.event_type AS type_b, b.i AS ib
        |  FROM idx a JOIN idx b ON a.i < b.i),
        |o AS (
        |  SELECT type_a, type_b,
        |    CAST(SUM(CASE WHEN (mask >> ia) % 2 = 1 THEN cnt ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN (mask >> ib) % 2 = 1 THEN cnt ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN (mask >> ia) % 2 = 1 AND (mask >> ib) % 2 = 1
        |             THEN cnt ELSE 0 END) AS BIGINT) AS n_inter
        |  FROM p CROSS JOIN mc GROUP BY type_a, type_b)
        |SELECT type_a, type_b, na, nb, n_inter,
        |  CAST((n_inter * 1000000) // (na + nb - n_inter) AS BIGINT) AS jaccard_q6
        |FROM o ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val idx = ev.select(col("event_type")).distinct()
        .withColumn("i",
          row_number().over(Window.orderBy(col("event_type"))) - 1)
      val ui = ev.join(broadcast(idx), Seq("event_type"))
        .select(col("user_id"), col("i")).distinct()
      val mc = ui.groupBy(col("user_id"))
        .agg(sum(expr("shiftleft(1, cast(i as int))")).as("mask"))
        .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
      val p = idx.as("a").join(idx.as("b"), col("a.i") < col("b.i"))
        .select(col("a.event_type").as("type_a"), col("a.i").as("ia"),
          col("b.event_type").as("type_b"), col("b.i").as("ib"))
      // functions.shiftright only takes a literal shift — the SQL form
      // accepts a column, and stays inside codegen
      def hasBit(bit: String) =
        expr(s"shiftright(mask, cast($bit as int)) % 2 = 1")
      broadcast(p).crossJoin(mc)
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(when(hasBit("ia"), col("cnt")).otherwise(0L)).as("na"),
          sum(when(hasBit("ib"), col("cnt")).otherwise(0L)).as("nb"),
          sum(when(hasBit("ia") && hasBit("ib"), col("cnt"))
            .otherwise(0L)).as("n_inter"))
        .select(col("type_a"), col("type_b"), col("na"), col("nb"), col("n_inter"),
          expr("(n_inter * 1000000) div (na + nb - n_inter)").as("jaccard_q6"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // Conversion-window funnel: view → click → purchase where each step
    // must land within 24 h of the previous one — the time-bounded
    // variant of q_funnel (unbounded steps overstate conversion badly;
    // every product funnel uses a window). Same de-correlated shape:
    // per-step keyed joins + MIN aggregates, never a per-user event
    // scan; conversion reported as exact permille of the entry stage.
    QueryDef.sql(
      "q_funnel_windowed",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t1
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |    AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |    AND e.ts > c.t1 AND e.ts <= c.t1 + INTERVAL 24 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |k AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked_24h,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchased_24h)
        |SELECT n_viewed, n_clicked_24h, n_purchased_24h,
        |  CAST((n_clicked_24h * 1000) // n_viewed AS BIGINT) AS click_permille,
        |  CAST((n_purchased_24h * 1000) // n_viewed AS BIGINT) AS purchase_permille
        |FROM k""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val day = expr("INTERVAL 24 HOURS")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id")
          && col("e.ts") > col("v.t0") && col("e.ts") <= col("v.t0") + day)
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t1"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id")
          && col("e.ts") > col("c.t1") && col("e.ts") <= col("c.t1") + day)
        .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_24h")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_24h")))
        .select(col("n_viewed"), col("n_clicked_24h"), col("n_purchased_24h"),
          expr("(n_clicked_24h * 1000) div n_viewed").as("click_permille"),
          expr("(n_purchased_24h * 1000) div n_viewed").as("purchase_permille"))
    },

    // Absorbing-Markov conversion probability: estimate the per-user
    // next-event transition matrix (purchase made absorbing), square it
    // three times — T⁸ in 3 rounds instead of 8 — and read off
    // P(reach purchase within 8 steps | start state). The matrix is
    // event-type × event-type (bounded vocabulary), so every squaring is
    // a tiny keyed join; the fact-scale work is ONE lag window for the
    // transition counts. Each squared entry is an exact integer
    // Σ(p·p) // 10⁶ (sum of ≤|S| q6×q6 products is exact, one floored
    // division) — no accumulation-order hazard. Oracle: 3 unrolled
    // squaring CTEs, AS MATERIALIZED (each references the previous round
    // TWICE — the exponential re-inlining lesson).
    QueryDef.sql(
      "q_markov_conversion",
      """WITH seq AS (
        |  SELECT user_id, event_type AS a,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b
        |  FROM events),
        |tc AS (
        |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM seq
        |  WHERE b IS NOT NULL AND a <> 'purchase' GROUP BY a, b),
        |t1 AS MATERIALIZED (
        |  SELECT a, b, (c * 1000000) // SUM(c) OVER (PARTITION BY a) AS p
        |  FROM tc
        |  UNION ALL
        |  SELECT 'purchase' AS a, 'purchase' AS b, 1000000 AS p),
        |t2 AS MATERIALIZED (
        |  SELECT x.a, y.b, CAST(SUM(x.p * y.p) // 1000000 AS BIGINT) AS p
        |  FROM t1 x JOIN t1 y ON y.a = x.b GROUP BY x.a, y.b),
        |t4 AS MATERIALIZED (
        |  SELECT x.a, y.b, CAST(SUM(x.p * y.p) // 1000000 AS BIGINT) AS p
        |  FROM t2 x JOIN t2 y ON y.a = x.b GROUP BY x.a, y.b),
        |t8 AS MATERIALIZED (
        |  SELECT x.a, y.b, CAST(SUM(x.p * y.p) // 1000000 AS BIGINT) AS p
        |  FROM t4 x JOIN t4 y ON y.a = x.b GROUP BY x.a, y.b)
        |SELECT a AS start_state, CAST(p AS BIGINT) AS p_convert8_q6
        |FROM t8 WHERE b = 'purchase' AND a <> 'purchase'
        |ORDER BY start_state""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d).select(col("user_id"), col("event_type").as("a"),
        lead(col("event_type"), 1).over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).as("b"))
      val tc = seq.filter(col("b").isNotNull && col("a") =!= "purchase")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      val t1 = tc
        .withColumn("p", expr("(c * 1000000) div sum(c) over (partition by a)"))
        .select(col("a"), col("b"), col("p"))
        .unionByName(Tables.events(s, d).sparkSession.range(1)
          .select(lit("purchase").as("a"), lit("purchase").as("b"),
            lit(1000000L).as("p")))
      var t = t1.localCheckpoint(true)
      for (_ <- 1 to 3) {
        t = t.as("x").join(t.as("y"), col("y.a") === col("x.b"))
          .groupBy(col("x.a").as("a"), col("y.b").as("b"))
          .agg(expr("sum(x.p * y.p) div 1000000").as("p"))
          .localCheckpoint(true)
      }
      t.filter(col("b") === "purchase" && col("a") =!= "purchase")
        .select(col("a").as("start_state"), col("p").as("p_convert8_q6"))
        .orderBy(col("start_state"))
    },

    // Top 3-step behavior paths: the most frequent consecutive
    // event-type trigrams across user journeys (the "path analysis"
    // panel). One double-lead window per user, then a combiner-backed
    // trigram count — the path vocabulary is bounded (|types|³), so the
    // top-k never ranks raw rows.
    QueryDef.sql(
      "q_top_paths",
      """WITH seq AS (
        |  SELECT user_id, event_type AS a,
        |    LEAD(event_type, 1) OVER w AS b,
        |    LEAD(event_type, 2) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
        |GROUP BY a, b, c
        |ORDER BY n_paths DESC, a, b, c LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .filter(col("b").isNotNull && col("c").isNotNull)
        .groupBy(col("a"), col("b"), col("c"))
        .agg(count(lit(1)).as("n_paths"))
        .orderBy(col("n_paths").desc, col("a"), col("b"), col("c"))
        .limit(20)
    },

    // Markov removal-effect attribution (the principled multi-touch
    // model): channel credit = how much the 8-step view→purchase
    // conversion probability DROPS when that state is deleted from the
    // chain (its column zeroed — journeys entering it are lost; row
    // probabilities keep their denominator, the standard removal
    // formulation). Each variant is the same exact T⁸-by-squaring
    // algebra as q_markov_conversion on a ≤|types|² matrix; the
    // fact-scale work (transition counts) happens once and is shared by
    // all variants. Oracle: per-variant unrolled squaring CTEs, all
    // AS MATERIALIZED.
    QueryDef.sql(
      "q_markov_attribution",
      {
        def sq(prev: String, next: String, suf: String) =
          s"""$next AS MATERIALIZED (
             |  SELECT x.a, y.b, CAST(SUM(x.p * y.p) // 1000000 AS BIGINT) AS p
             |  FROM ${prev} x JOIN ${prev} y ON y.a = x.b GROUP BY x.a, y.b)"""
            .stripMargin
        def variant(state: String, suf: String) =
          s"""v1$suf AS MATERIALIZED (
             |  SELECT a, b, p FROM t1 WHERE a <> '$state' AND b <> '$state'
             |  UNION ALL
             |  SELECT '$state' AS a, '$state' AS b, 0 AS p),
             |${sq(s"v1$suf", s"v2$suf", suf)},
             |${sq(s"v2$suf", s"v4$suf", suf)},
             |${sq(s"v4$suf", s"v8$suf", suf)}""".stripMargin
        s"""WITH seq AS (
           |  SELECT user_id, event_type AS a,
           |    LEAD(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS b
           |  FROM events),
           |tc AS (
           |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM seq
           |  WHERE b IS NOT NULL AND a <> 'purchase' GROUP BY a, b),
           |t1 AS MATERIALIZED (
           |  SELECT a, b, (c * 1000000) // SUM(c) OVER (PARTITION BY a) AS p
           |  FROM tc
           |  UNION ALL
           |  SELECT 'purchase' AS a, 'purchase' AS b, 1000000 AS p),
           |${sq("t1", "t2", "")},
           |${sq("t2", "t4", "")},
           |${sq("t4", "t8", "")},
           |base AS (SELECT p AS p0 FROM t8 WHERE a = 'view' AND b = 'purchase'),
           |${variant("click", "c")},
           |${variant("error", "e")},
           |${variant("signup", "s")},
           |rem AS (
           |  SELECT 'click' AS removed_state, p FROM v8c WHERE a = 'view' AND b = 'purchase'
           |  UNION ALL
           |  SELECT 'error', p FROM v8e WHERE a = 'view' AND b = 'purchase'
           |  UNION ALL
           |  SELECT 'signup', p FROM v8s WHERE a = 'view' AND b = 'purchase')
           |SELECT rem.removed_state, base.p0 AS p_base_q6,
           |  CAST(rem.p AS BIGINT) AS p_removed_q6,
           |  CAST(((base.p0 - rem.p) * 1000000) // base.p0 AS BIGINT)
           |    AS removal_effect_q6
           |FROM rem CROSS JOIN base
           |ORDER BY removed_state""".stripMargin
      }) { (s, d) =>
      val seq = Tables.events(s, d).select(col("user_id"), col("event_type").as("a"),
        lead(col("event_type"), 1).over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).as("b"))
      val tc = seq.filter(col("b").isNotNull && col("a") =!= "purchase")
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      val sess = Tables.events(s, d).sparkSession
      val absorbing = sess.range(1)
        .select(lit("purchase").as("a"), lit("purchase").as("b"), lit(1000000L).as("p"))
      val t1 = tc
        .withColumn("p", expr("(c * 1000000) div sum(c) over (partition by a)"))
        .select(col("a"), col("b"), col("p"))
        .unionByName(absorbing)
        .localCheckpoint(true)
      def pow8(m0: org.apache.spark.sql.DataFrame) = {
        var t = m0
        for (_ <- 1 to 3) {
          t = t.as("x").join(t.as("y"), col("y.a") === col("x.b"))
            .groupBy(col("x.a").as("a"), col("y.b").as("b"))
            .agg(expr("sum(x.p * y.p) div 1000000").as("p"))
            .localCheckpoint(true)
        }
        t.filter(col("a") === "view" && col("b") === "purchase").select(col("p"))
      }
      val base = pow8(t1).select(col("p").as("p0"))
      val variants = Seq("click", "error", "signup").map { st =>
        val v1 = t1.filter(col("a") =!= st && col("b") =!= st)
          .unionByName(sess.range(1)
            .select(lit(st).as("a"), lit(st).as("b"), lit(0L).as("p")))
        pow8(v1).select(lit(st).as("removed_state"), col("p"))
      }
      variants.reduce(_ unionByName _)
        .crossJoin(broadcast(base))
        .select(col("removed_state"), col("p0").as("p_base_q6"),
          col("p").as("p_removed_q6"),
          expr("((p0 - p) * 1000000) div p0").as("removal_effect_q6"))
        .orderBy(col("removed_state"))
    }
  )
}
