package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint report (the Deequ/dbt-test shape):
  * null checks, domain/range checks, uniqueness, and cross-table
  * referential integrity, evaluated in one pass per table and emitted as
  * a single (check, n_violations, n_checked) report table — the artifact
  * a pipeline gates a load on.
  *
  * Scale posture: per-table checks are ONE aggregate scan each (every
  * predicate a conditional count — map-side combined, no row ever
  * shuffles); referential checks are key-grouped anti-join counts; the
  * final report is a union of per-check one-row aggregates, so the
  * report cost is the cost of scanning each table once plus two keyed
  * anti joins.
  */
object Quality {

  private def check(name: String, violations: org.apache.spark.sql.Column,
      df: DataFrame): DataFrame =
    df.agg(sum(when(violations, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))

  /** Anti-join referential check: rows of `child` whose `childKey` has no
    * match in `parent.parentKey`. */
  private def orphans(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(child.agg(count(lit(1)).as("n_checked")))
      .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))

  val queries: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_dq_report",
      """WITH checks AS (
        |  SELECT 'documents_empty_text' AS check_name,
        |    CAST(SUM(CASE WHEN LENGTH(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |    CAST(COUNT(*) AS BIGINT) AS n_checked FROM documents
        |  UNION ALL
        |  SELECT 'documents_nchars_mismatch',
        |    CAST(SUM(CASE WHEN LENGTH(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'events_negative_value',
        |    CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'orders_nonpositive_price',
        |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'orders_orphan_custkey',
        |    CAST((SELECT COUNT(*) FROM orders o
        |          WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey',
        |    CAST((SELECT COUNT(*) FROM lineitem l
        |          WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_duplicate_orderkey',
        |    CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
        |          (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) g
        |          WHERE c > 1) AS BIGINT),
        |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT))
        |SELECT check_name, n_violations, n_checked
        |FROM checks ORDER BY check_name""".stripMargin) { (s, d) =>
      dqReport(s, d).orderBy(col("check_name"))
    },

    // k-anonymity audit over quasi-identifiers (lang, source, length
    // band): equivalence classes smaller than k = 10 re-identify their
    // members; the violating classes are the privacy-review artifact.
    // One map-side-combined groupBy over the bounded QI space — the
    // HAVING filter runs on class aggregates, never raw rows.
    QueryDef.sql(
      "q_k_anonymity",
      """SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM documents
        |GROUP BY lang, source, band
        |HAVING COUNT(*) < 10
        |ORDER BY lang, source, band""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("band"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") < 10)
        .orderBy(col("lang"), col("source"), col("band"))
    },

    // Column profiling (the pandas-profiling / Deequ-analyzer shape):
    // per-column row/null/distinct counts plus typed min/max — numerics
    // and dates land in a quantized BIGINT lane (cents / epoch-µs),
    // strings in a VARCHAR lane, the other lane NULL. Each column is ONE
    // pruned single-column aggregate scan (at 100 TB the profile reads
    // each parquet column chunk once, no shuffle beyond the combiner);
    // the report is the union of the per-column one-row aggregates.
    QueryDef.sql(
      "q_column_profile",
      """SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_q,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_q,
        |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |  CAST(MIN(o_custkey) AS BIGINT), CAST(MAX(o_custkey) AS BIGINT),
        |  NULL, NULL
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |  NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT),
        |  CAST(MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT),
        |  CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT),
        |  NULL, NULL
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT),
        |  CAST(MIN(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT),
        |  CAST(MAX(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT),
        |  NULL, NULL
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        |  NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
        |FROM orders
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      def num(name: String, v: org.apache.spark.sql.Column): DataFrame =
        orders.agg(count(lit(1)).as("n"),
            sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(v).as("n_distinct"),
            min(v).cast("long").as("min_q"), max(v).cast("long").as("max_q"))
          .select(lit(name).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"), col("min_q"), col("max_q"),
            lit(null).cast("string").as("min_s"), lit(null).cast("string").as("max_s"))
      def str(name: String, v: org.apache.spark.sql.Column): DataFrame =
        orders.agg(count(lit(1)).as("n"),
            sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(v).as("n_distinct"),
            min(v).as("min_s"), max(v).as("max_s"))
          .select(lit(name).as("col_name"), col("n"), col("n_null"),
            col("n_distinct"), lit(null).cast("long").as("min_q"),
            lit(null).cast("long").as("max_q"), col("min_s"), col("max_s"))
      num("o_orderkey", col("o_orderkey"))
        .unionByName(num("o_custkey", col("o_custkey")))
        .unionByName(str("o_orderstatus", col("o_orderstatus")))
        .unionByName(num("o_totalprice", floor(col("o_totalprice") * 100).cast("long")))
        .unionByName(num("o_orderdate",
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))))
        .unionByName(str("o_orderpriority", col("o_orderpriority")))
        .orderBy(col("col_name"))
    }
  )

  /** The full report as a composable DataFrame (also the q_dq_report
    * builder). */
  def dqReport(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val events = Tables.events(s, d)
    val orders = Tables.orders(s, d)
    val dupKeys = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      .crossJoin(orders.agg(count(lit(1)).as("n_checked")))
      .select(lit("orders_duplicate_orderkey").as("check_name"),
        col("n_violations"), col("n_checked"))
    check("documents_empty_text", length(col("text")) === 0, docs)
      .unionByName(check("documents_nchars_mismatch",
        length(col("text")) =!= col("n_chars"), docs))
      .unionByName(check("events_negative_value", col("value") < 0, events))
      .unionByName(check("orders_nonpositive_price", col("o_totalprice") <= 0, orders))
      .unionByName(orphans("orders_orphan_custkey", orders, "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .unionByName(orphans("lineitem_orphan_orderkey", Tables.lineitem(s, d),
        "l_orderkey", orders, "o_orderkey"))
      .unionByName(dupKeys)
  }
}
