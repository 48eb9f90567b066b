package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.2–§2.8) re-expressed over the
  * driver test tables. Every query is pure `functions._` Column arithmetic —
  * whole-stage-codegen'd, no UDFs — and each has a DuckDB oracle.
  *
  * Scale posture: filters/projections push to the parquet scan; every join
  * against a dimension table (region/nation/supplier/part ≤ O(10k) rows at
  * any SF) is explicitly `broadcast`-hinted so the fact table never shuffles
  * for them; aggregations are partial (map-side combine) by construction.
  */
object Relational {

  /** floor-quantize a double to fixed-point bigint: deterministic under any
    * aggregation order, identical in Spark and DuckDB (both IEEE doubles). */
  private def q4(c: Column): Column = floor(c * lit(10000)).cast("long")

  val queries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // A1/A4-style pricing summary (the reference's frame-summary shape:
    // group + min/max/sum/count; build_frame_db.py:495-516)
    QueryDef.sql(
      "q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(FLOOR(l_quantity*10000) AS BIGINT)) AS BIGINT) AS sum_qty_q4,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*10000) AS BIGINT)) AS BIGINT) AS sum_price_q4,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_q4,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(q4(col("l_quantity"))).as("sum_qty_q4"),
          sum(q4(col("l_extendedprice"))).as("sum_price_q4"),
          sum(q4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_q4"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // P1/P2/P6: projection + equality filter + range predicate, pushed to scan
    QueryDef.sql(
      "q_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR(l_quantity*10000) AS BIGINT) AS qty_q4
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), q4(col("l_quantity")).as("qty_q4"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // P3: point lookup (query_frame_db.py:34-52 `WHERE f.fid = ?`)
    QueryDef.sql(
      "q_point_lookup",
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(FLOOR(o_totalprice*10000) AS BIGINT) AS totalprice_q4
        |FROM orders WHERE o_orderkey = 1024 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") === 1024L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          q4(col("o_totalprice")).as("totalprice_q4"))
        .orderBy(col("o_orderkey"))
    },

    // P4: IN-list membership (query_historical_bursts.py:188-209)
    QueryDef.sql(
      "q_in_list",
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer WHERE c_custkey IN (1,7,42,99,1000,777,31,555)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey").isin(1L, 7L, 42L, 99L, 1000L, 777L, 31L, 555L))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    },

    // P4-large: semi-join form for big dynamic id lists (left_semi, no row dup)
    QueryDef.sql(
      "q_semi_join",
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .limit(200)
    },

    // P7: anti-join (blackout-interval exclusion pattern,
    // create_cslc_burst_catalog.py:172-183)
    QueryDef.sql(
      "q_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J1: canonical 3-way dim join + group (README.md:146-151 shape)
    QueryDef.sql(
      "q_join3",
      """SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(FLOOR(c.c_acctbal*10000) AS BIGINT)) AS BIGINT) AS acctbal_q4
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) { (s, d) =>
      Tables.region(s, d).join(broadcast(Tables.nation(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(q4(col("c_acctbal"))).as("acctbal_q4"))
        .orderBy(col("r_name"))
    },

    // J2: 4-way fact ⋈ dims chain (create_cslc_burst_catalog.py:90-103 shape)
    QueryDef.sql(
      "q_join4",
      """SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_q4,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name, YEAR(o.o_orderdate)
        |ORDER BY n.n_name, order_year""".stripMargin) { (s, d) =>
      // customer scales with SF (not broadcastable at 100 TB) — shuffle
      // join it and let AQE pick; nation is fixed-size → broadcast
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(sum(q4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_q4"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"), col("order_year"))
    },

    // J4: left join + null-fill (summarize_blackout_difference.py:83)
    QueryDef.sql(
      "q_left_join",
      """SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice*10000) AS BIGINT)), 0) AS BIGINT) AS spend_q4
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey LIMIT 500""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(q4(col("o_totalprice"))), lit(0L)).as("spend_q4"))
        .orderBy(col("c_custkey"))
        .limit(500)
    },

    // J5: JOIN USING(col) (query_historical_bursts.py:227-231)
    QueryDef.sql(
      "q_join_using",
      """SELECT s.s_suppkey, s.s_name, n.n_name
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY s_suppkey LIMIT 100""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d).withColumnRenamed("s_nationkey", "n_nationkey")
      sup.join(broadcast(Tables.nation(s, d)), Seq("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
        .limit(100)
    },

    // J6: "UPDATE ... FROM subquery" (build_frame_db.py:158-170) — recompute
    // a column from a grouped self-derived table, no in-place update.
    QueryDef.sql(
      "q_join_update",
      """WITH avgbal AS (
        |  SELECT s_nationkey, CAST(SUM(CAST(FLOOR(s_acctbal*10000) AS BIGINT)) AS BIGINT) AS tot_q4,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT s.s_suppkey,
        |  CAST(FLOOR(CAST(FLOOR(s.s_acctbal*10000) AS BIGINT)
        |             - CAST(a.tot_q4 AS DOUBLE) / a.n) AS BIGINT) AS delta_q4
        |FROM supplier s JOIN avgbal a ON s.s_nationkey = a.s_nationkey
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val avgbal = sup.groupBy(col("s_nationkey").as("k"))
        .agg(sum(q4(col("s_acctbal"))).as("tot_q4"), count(lit(1)).as("n"))
      sup.join(broadcast(avgbal), col("s_nationkey") === col("k"))
        .select(col("s_suppkey"),
          floor(q4(col("s_acctbal")) - col("tot_q4").cast("double") / col("n"))
            .cast("long").as("delta_q4"))
        .orderBy(col("s_suppkey"))
    },

    // A5: dedup-by-key keeping deterministic first (row_number, not FIRST —
    // SURVEY.md §7.5 risk 5)
    QueryDef.sql(
      "q_dedup_first",
      """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_date FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
          col("o_orderdate").as("first_date"))
        .orderBy(col("o_custkey"))
    },

    // A1/A7: group-concat / collect-to-list per key (build_frame_db.py:517)
    QueryDef.sql(
      "q_group_concat",
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  STRING_AGG(c_name, ',' ORDER BY c_name) AS names
        |FROM (SELECT * FROM customer WHERE c_custkey <= 200) t
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") <= 200)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
        .orderBy(col("c_nationkey"))
    },

    // A11: multi-agg denormalization (export_denormalized_db.py:125-146)
    QueryDef.sql(
      "q_multi_agg",
      """SELECT p_brand,
        |  CAST(MIN(p_size) AS BIGINT) AS min_size, CAST(MAX(p_size) AS BIGINT) AS max_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
        |  CAST(MIN(FLOOR(p_retailprice*10000)) AS BIGINT) AS min_price_q4
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.part(s, d).groupBy(col("p_brand"))
        .agg(min(col("p_size")).cast("long").as("min_size"),
          max(col("p_size")).cast("long").as("max_size"),
          count(lit(1)).as("n_parts"),
          countDistinct(col("p_type")).as("n_types"),
          min(q4(col("p_retailprice"))).as("min_price_q4"))
        .orderBy(col("p_brand"))
    },

    // A4: AVG + round-half-up + CAST int (build_frame_db.py:156-170) —
    // floor(x+0.5) to dodge round-mode divergence
    QueryDef.sql(
      "q_avg_round",
      """SELECT p_type,
        |  CAST(FLOOR(CAST(SUM(p_size) AS DOUBLE)/COUNT(*) + 0.5) AS BIGINT) AS avg_size
        |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin) { (s, d) =>
      Tables.part(s, d).groupBy(col("p_type"))
        .agg(floor(sum(col("p_size")).cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("avg_size"))
        .orderBy(col("p_type"))
    },

    // A10: DISTINCT projection
    QueryDef.sql(
      "q_distinct",
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },

    // A8: first-seen min per key (example-queries.sql:1-12)
    QueryDef.sql(
      "q_first_seen",
      """SELECT user_id, MIN(ts) AS first_seen, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_seen"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // O1/O4: multi-column order + top-k
    QueryDef.sql(
      "q_topk",
      """SELECT o_orderkey, CAST(FLOOR(o_totalprice*10000) AS BIGINT) AS totalprice_q4
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), q4(col("o_totalprice")).as("totalprice_q4"),
          col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .drop("o_totalprice")
    },

    // O5: top-1-by-key (min(..., key=...) ANX selection, parse_bursts.py:561-567)
    QueryDef.sql(
      "q_top1_per_group",
      """SELECT c_nationkey, c_custkey AS top_custkey FROM (
        |  SELECT c_nationkey, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t WHERE rn = 1 ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey").as("top_custkey"))
        .orderBy(col("c_nationkey"))
    },

    // U1: UNION-dedup of two projections (example-queries.sql:35-65)
    QueryDef.sql(
      "q_union_distinct",
      """SELECT k FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |  UNION SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier) t
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").cast("long").as("k"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").cast("long").as("k")))
        .distinct()
        .orderBy(col("k"))
    },

    // U2: INTERSECT / EXCEPT set ops
    QueryDef.sql(
      "q_intersect_except",
      """SELECT k, src FROM (
        |  SELECT k, 'both' AS src FROM
        |    (SELECT DISTINCT o_custkey AS k FROM orders
        |     INTERSECT SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 9000)
        |  UNION ALL
        |  SELECT k, 'only_rich' AS src FROM
        |    (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        |     EXCEPT SELECT DISTINCT o_custkey AS k FROM orders)
        |) t ORDER BY src, k""".stripMargin) { (s, d) =>
      val withOrders = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k")).distinct()
      withOrders.intersect(rich).withColumn("src", lit("both"))
        .unionByName(rich.except(withOrders).withColumn("src", lit("only_rich")))
        .orderBy(col("src"), col("k"))
    },

    // explicit GROUPING SETS — the third grouping-sets form next to
    // q_rollup/q_cube: per-lang totals, per-source totals, and the grand
    // total in ONE pass (one shuffle, expanded map-side), never three
    // scans unioned. Null-marker flags use IS NULL directly (lang/source
    // are non-null columns) so both engines agree without depending on
    // GROUPING() bit conventions.
    QueryDef.sql(
      "q_grouping_sets",
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(lang IS NULL AS BOOLEAN) AS is_total_lang,
        |  CAST(source IS NULL AS BOOLEAN) AS is_total_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY is_total_lang, is_total_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("graft_gsets_documents")
      s.sql(
        """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          |  (lang IS NULL) AS is_total_lang,
          |  (source IS NULL) AS is_total_source
          |FROM graft_gsets_documents
          |GROUP BY GROUPING SETS ((lang), (source), ())
          |ORDER BY is_total_lang, is_total_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin)
    },

    // UNPIVOT/melt — the inverse reshape of q_pivot_event_types: wide
    // per-language aggregates to long (lang, metric, value) rows. The
    // oracle uses the portable UNION ALL expansion (identical semantics,
    // no dialect-specific UNPIVOT syntax).
    QueryDef.sql(
      "q_unpivot",
      """WITH wide AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM documents GROUP BY lang)
        |SELECT lang, metric, value FROM (
        |  SELECT lang, 'n_docs' AS metric, n_docs AS value FROM wide
        |  UNION ALL SELECT lang, 'sum_chars', sum_chars FROM wide
        |  UNION ALL SELECT lang, 'n_sources', n_sources FROM wide) t
        |ORDER BY lang, metric""".stripMargin) { (s, d) =>
      val wide = Tables.documents(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
      wide.unpivot(
          ids = Array(col("lang")),
          values = Array(col("n_docs"), col("sum_chars"), col("n_sources")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy(col("lang"), col("metric"))
    },

    // SQL entry point: the identical engine surface through spark.sql over
    // temp views — a reference user can paste ANSI SQL instead of building
    // DataFrames, and Catalyst plans both identically (the oracle text IS
    // the Spark query text here, modulo the query-scoped view name)
    QueryDef.sql(
      "q_sql_api",
      """SELECT d.lang, d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d
        |WHERE d.n_chars >= 200
        |GROUP BY d.lang, d.source
        |ORDER BY d.lang, d.source""".stripMargin) { (s, d) =>
      // query-scoped view name: registering plain "documents" on the
      // shared session would be global mutable state — a concurrent
      // builder could bind its sql() analysis to another sfDir's table
      Tables.documents(s, d).createOrReplaceTempView("graft_sql_api_documents")
      s.sql(
        """SELECT d.lang, d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
          |FROM graft_sql_api_documents d
          |WHERE d.n_chars >= 200
          |GROUP BY d.lang, d.source
          |ORDER BY d.lang, d.source""".stripMargin)
    },

    // FULL OUTER join: per-nation high-balance customer vs supplier
    // counts — sparse sides leave unmatched rows in BOTH directions, which
    // the coalesced key + zero-fill must carry (pd.merge(how="outer"))
    QueryDef.sql(
      "q_full_outer_join",
      """WITH c AS (
        |  SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
        |  FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey),
        |s AS (
        |  SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9500 GROUP BY s_nationkey)
        |SELECT COALESCE(c.k, s.k) AS nationkey,
        |  COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9500)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
      val sp = Tables.supplier(s, d).filter(col("s_acctbal") > 9500)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },

    // U3: UNION ALL row append (pd.concat analogue)
    QueryDef.sql(
      "q_union_all",
      """SELECT side, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT 'cust' AS side FROM customer
        |  UNION ALL SELECT 'supp' AS side FROM supplier) t
        |GROUP BY side ORDER BY side""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(lit("cust").as("side"))
        .unionByName(Tables.supplier(s, d).select(lit("supp").as("side")))
        .groupBy(col("side")).agg(count(lit(1)).as("n"))
        .orderBy(col("side"))
    },

    // P5/W6: CASE WHEN banding + group
    QueryDef.sql(
      "q_case_banding",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("band",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .orderBy(col("band"))
    },

    // JSON extraction (props column; from_json/get_json_object surface)
    QueryDef.sql(
      "q_json_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // from_json with a declared schema beats per-row get_json_object
      // path evaluation (single parse, typed extraction)
      Tables.events(s, d)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Scalar string surface (SURVEY.md §2.8: lower/replace/substr/lpad/
    // printf/split/regexp_extract — the burst-id formatter family)
    QueryDef.sql(
      "q_scalar_string",
      """SELECT p_partkey,
        |  LOWER(p_name) AS lname,
        |  REPLACE(p_name, ' ', '_') AS underscored,
        |  SUBSTR(p_name, 1, 5) AS prefix5,
        |  LPAD(CAST(p_partkey AS VARCHAR), 9, '0') AS padded,
        |  PRINTF('t%03d_%06d_iw%d', p_partkey % 175 + 1, p_partkey, p_partkey % 3 + 1) AS jpl_id,
        |  CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_words,
        |  REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        lpad(col("p_partkey").cast("string"), 9, "0").as("padded"),
        format_string("t%03d_%06d_iw%d",
          pmod(col("p_partkey"), lit(175)) + 1, col("p_partkey"),
          pmod(col("p_partkey"), lit(3)) + 1).as("jpl_id"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
        .orderBy(col("p_partkey"))
        .limit(300)
    },

    // Scalar date/time surface (§2.8: trunc/add/diff/format/last_day)
    QueryDef.sql(
      "q_scalar_date",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        |  STRFTIME(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey"))
        .limit(300)
    },

    // Scalar math surface (§2.8: floor/ceil snap-to-grid, cubic badness —
    // frames.py:198-211, build_frame_db.py:440-443)
    QueryDef.sql(
      "q_scalar_math",
      """SELECT p_partkey,
        |  CAST(FLOOR((p_retailprice - 5) / 30) * 30 AS BIGINT) AS snapped_lo,
        |  CAST(CEIL((p_retailprice + 5) / 30) * 30 AS BIGINT) AS snapped_hi,
        |  CAST(ABS(p_size - 9) * ABS(p_size - 9) * ABS(p_size - 9) AS BIGINT) AS badness,
        |  CAST(FLOOR(SQRT(CAST(p_partkey AS DOUBLE)) * 1000000) AS BIGINT) AS sqrt_q6
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin) { (s, d) =>
      val bad = abs(col("p_size") - 9)
      Tables.part(s, d).select(
        col("p_partkey"),
        (floor((col("p_retailprice") - 5) / 30) * 30).cast("long").as("snapped_lo"),
        (ceil((col("p_retailprice") + 5) / 30) * 30).cast("long").as("snapped_hi"),
        (bad * bad * bad).cast("long").as("badness"),
        floor(sqrt(col("p_partkey").cast("double")) * 1e6).cast("long").as("sqrt_q6"))
        .orderBy(col("p_partkey"))
        .limit(300)
    },

    // National market share (TPC-H Q8 shape): within the ASIA customer
    // market, each supplier nation's share of yearly revenue. Revenue is
    // the exact q4-integer reduction; only the one final share division is
    // floating (shared IEEE tree — nat_rev*1e6 would overflow int64 at
    // rehearsal scale, so the ratio is computed in DOUBLE and floored).
    // Scale posture: nation/region/supplier are fixed-size dims
    // (broadcast); orders/customer shuffle on their keys and AQE picks
    // the fact-join strategy.
    QueryDef.sql(
      "q_market_share",
      """WITH rev AS (
        |  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
        |    n2.n_name AS supp_nation,
        |    CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT) AS r
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region rg ON rg.r_regionkey = n1.n_regionkey AND rg.r_name = 'ASIA'
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey),
        |a AS (
        |  SELECT o_year, supp_nation, CAST(SUM(r) AS BIGINT) AS nat_rev_q4
        |  FROM rev GROUP BY o_year, supp_nation)
        |SELECT o_year, supp_nation, nat_rev_q4,
        |  CAST(FLOOR(nat_rev_q4 * CAST(1000000.0 AS DOUBLE)
        |    / SUM(nat_rev_q4) OVER (PARTITION BY o_year)) AS BIGINT) AS share_q6
        |FROM a ORDER BY o_year, supp_nation""".stripMargin) { (s, d) =>
      val suppNation = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val a = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("supp_nation"))
        .agg(sum(q4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("nat_rev_q4"))
      a.withColumn("share_q6",
        floor(col("nat_rev_q4") * lit(1000000.0)
          / sum(col("nat_rev_q4")).over(Window.partitionBy(col("o_year")))).cast("long"))
        .orderBy(col("o_year"), col("supp_nation"))
    },

    // Waiting-supplier audit (TPC-H Q21 shape, DE-correlated): suppliers
    // who were the sole late shipper (>60 days after order date) on a
    // multi-supplier order. The reference formulation is two correlated
    // EXISTS subqueries; the Spark-first rewrite reduces each order once
    // — groupBy (order, supplier) with a MAX(late) flag, then a single
    // order-partitioned window supplies both "other suppliers exist" and
    // "no other supplier was late" without rescanning the fact table.
    QueryDef.sql(
      "q_late_supplier",
      """WITH ol AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY l.l_orderkey, l.l_suppkey),
        |f AS (
        |  SELECT l_orderkey, l_suppkey, late,
        |    COUNT(*) OVER (PARTITION BY l_orderkey) AS ns,
        |    SUM(late) OVER (PARTITION BY l_orderkey) AS nl
        |  FROM ol)
        |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM f JOIN supplier s ON s.s_suppkey = f.l_suppkey
        |WHERE f.late = 1 AND f.ns >= 2 AND f.nl = 1
        |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name""".stripMargin) { (s, d) =>
      val ol = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          1).otherwise(0)).as("late"))
      val wo = Window.partitionBy(col("l_orderkey"))
      ol.withColumn("ns", count(lit(1)).over(wo))
        .withColumn("nl", sum(col("late")).over(wo))
        .filter(col("late") === 1 && col("ns") >= 2 && col("nl") === 1)
        .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // Laspeyres price index: yearly price level relative to the base
    // (first) year, weighted by base-year quantities over the parts
    // traded in both years. Unit prices are integer-divided cents
    // (floor — deterministic in both engines), the index is ONE shared
    // double division of two exact BIGINT basket sums (a q6 integer
    // multiply would overflow int64 at rehearsal quantities); everything reduces
    // per (year, part) first, so the basket join is vocabulary-sized.
    QueryDef.sql(
      "q_price_index",
      """WITH yp AS (
        |  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS y, l.l_partkey,
        |    CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT))
        |      // SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS unit_c,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |b0 AS (SELECT MIN(y) AS y0 FROM yp),
        |base AS (
        |  SELECT l_partkey, unit_c AS p0, qty AS q0
        |  FROM yp CROSS JOIN b0 WHERE y = y0)
        |SELECT yp.y, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(FLOOR(SUM(base.q0 * yp.unit_c) * CAST(1000000.0 AS DOUBLE)
        |    / SUM(base.q0 * base.p0)) AS BIGINT) AS laspeyres_q6
        |FROM yp JOIN base ON base.l_partkey = yp.l_partkey
        |GROUP BY yp.y ORDER BY yp.y""".stripMargin) { (s, d) =>
      val yp = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("y"), col("l_partkey"))
        .agg(expr("sum(cast(floor(l_extendedprice * 100) as bigint)) div sum(cast(l_quantity as bigint))").as("unit_c"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val y0 = yp.agg(min(col("y")).as("y0"))
      val base = yp.crossJoin(broadcast(y0)).filter(col("y") === col("y0"))
        .select(col("l_partkey"), col("unit_c").as("p0"), col("qty").as("q0"))
      yp.join(base, Seq("l_partkey"))
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n_parts"),
          floor(sum(col("q0") * col("unit_c")) * lit(1000000.0)
            / sum(col("q0") * col("p0"))).cast("long").as("laspeyres_q6"))
        .orderBy(col("y"))
    },

    // Duplicate-invoice audit: order pairs from the same customer in the
    // same thousand-dollar amount band within 90 days — the
    // double-billing screen (banded, because real dupes rarely match to
    // the cent). Candidates come only from the (customer, band)
    // equi-join; the day-window is a residual filter, so the fanout is
    // the band-group size, not the customer's order count. Output is
    // pair-level (the audit artifact).
    QueryDef.sql(
      "q_dup_invoices",
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS band,
        |    CAST(o_orderdate AS DATE) AS d
        |  FROM orders)
        |SELECT a.o_custkey, a.band,
        |  a.o_orderkey AS orderkey_1, b.o_orderkey AS orderkey_2,
        |  CAST(ABS(b.d - a.d) AS BIGINT) AS day_gap
        |FROM o a JOIN o b ON b.o_custkey = a.o_custkey
        |  AND b.band = a.band AND a.o_orderkey < b.o_orderkey
        |  AND ABS(b.d - a.d) <= 90
        |ORDER BY a.o_custkey, a.band, orderkey_1, orderkey_2""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") / 1000).cast("long").as("band"),
        col("o_orderdate").cast("date").as("d"))
      o.as("a").join(o.as("b"),
          col("b.o_custkey") === col("a.o_custkey")
            && col("b.band") === col("a.band")
            && col("a.o_orderkey") < col("b.o_orderkey")
            && abs(datediff(col("b.d"), col("a.d"))) <= 90)
        .select(col("a.o_custkey").as("o_custkey"), col("a.band").as("band"),
          col("a.o_orderkey").as("orderkey_1"), col("b.o_orderkey").as("orderkey_2"),
          abs(datediff(col("b.d"), col("a.d"))).cast("long").as("day_gap"))
        .orderBy(col("o_custkey"), col("band"), col("orderkey_1"), col("orderkey_2"))
    }
  )
}
