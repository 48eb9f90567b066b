package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Ingest-side string derivations (SURVEY.md §2.8 / F4): the CMR survey's
  * granule-ID parsing (create_cslc_burst_catalog.py:70-75: burst id from a
  * fixed character slice, lowered with '-'→'_'; polarization from chars
  * 72:73) and the regex date-tuple extraction
  * (create_cslc_burst_catalog.py:164-169) — as codegen'd Column plans over
  * deterministically synthesized granule strings.
  */
object Ingest {

  val queries: Seq[QueryDef] = Seq(

    // OPERA granule-ID parse: synthesize
    // OPERA_L2_CSLC-S1_T{track}-{id}-IW{k}_{date}T{hhmmss}Z_..._{POL}_v1.0
    // then recover burst_id_jpl, sensing_time, pol — exactly the reference's
    // fixed-slice parse (1-based substring positions match DuckDB's)
    QueryDef.sql(
      "q_granule_parse",
      """WITH g AS (
        |  SELECT o_orderkey,
        |    PRINTF('OPERA_L2_CSLC-S1_T%03d-%06d-IW%d_%sT%02d%02d%02dZ_20240101T000000Z_S1A_%s_v1.0',
        |      o_orderkey % 175 + 1, o_orderkey % 375887 + 1, o_orderkey % 3 + 1,
        |      STRFTIME(o_orderdate, '%Y%m%d'),
        |      o_orderkey % 24, o_orderkey % 60, (o_orderkey * 7) % 60,
        |      CASE WHEN o_orderkey % 4 = 0 THEN 'VH' ELSE 'VV' END) AS granule,
        |    o_orderdate
        |  FROM orders)
        |SELECT o_orderkey, granule,
        |  LOWER(REPLACE(SUBSTR(granule, 18, 15), '-', '_')) AS burst_id_jpl,
        |  SUBSTR(granule, 72, 2) AS pol,
        |  CAST(STRPTIME(SUBSTR(granule, 34, 15), '%Y%m%dT%H%M%S') AS TIMESTAMP) AS sensing_time
        |FROM g WHERE SUBSTR(granule, 72, 2) = 'VV'
        |ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d).select(
        col("o_orderkey"),
        format_string(
          "OPERA_L2_CSLC-S1_T%03d-%06d-IW%d_%sT%02d%02d%02dZ_20240101T000000Z_S1A_%s_v1.0",
          pmod(col("o_orderkey"), lit(175)) + 1,
          pmod(col("o_orderkey"), lit(375887)) + 1,
          pmod(col("o_orderkey"), lit(3)) + 1,
          date_format(col("o_orderdate"), "yyyyMMdd"),
          pmod(col("o_orderkey"), lit(24)),
          pmod(col("o_orderkey"), lit(60)),
          pmod(col("o_orderkey") * 7, lit(60)),
          when(pmod(col("o_orderkey"), lit(4)) === 0, "VH").otherwise("VV"))
          .as("granule"))
      g.select(col("o_orderkey"), col("granule"),
          lower(regexp_replace(substring(col("granule"), 18, 15), "-", "_"))
            .as("burst_id_jpl"),
          substring(col("granule"), 72, 2).as("pol"),
          to_timestamp(substring(col("granule"), 34, 15), "yyyyMMdd'T'HHmmss")
            .as("sensing_time"))
        .filter(col("pol") === "VV")
        .orderBy(col("o_orderkey"))
        .limit(500)
    },

    // regex date-tuple extraction (the `datetime.date(YYYY, M, D)` string
    // parse): pull all dates out of a synthesized tuple string
    QueryDef.sql(
      "q_regexp_dates",
      """WITH t AS (
        |  SELECT n_nationkey,
        |    PRINTF('[datetime.date(2023, %d, %d), datetime.date(2024, %d, %d)]',
        |      n_nationkey % 12 + 1, n_nationkey % 27 + 1,
        |      (n_nationkey + 3) % 12 + 1, (n_nationkey + 5) % 27 + 1) AS s
        |  FROM nation)
        |SELECT n_nationkey,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(s, 'datetime\.date\((\d+), (\d+), (\d+)\)')) AS BIGINT) AS n_dates,
        |  REGEXP_EXTRACT(s, 'datetime\.date\((\d+), (\d+), (\d+)\)', 1) AS first_year,
        |  REGEXP_EXTRACT(s, 'datetime\.date\((\d+), (\d+), (\d+)\)', 2) AS first_month
        |FROM t ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val t = Tables.nation(s, d).select(col("n_nationkey"),
        format_string("[datetime.date(2023, %d, %d), datetime.date(2024, %d, %d)]",
          pmod(col("n_nationkey"), lit(12)) + 1,
          pmod(col("n_nationkey"), lit(27)) + 1,
          pmod(col("n_nationkey") + 3, lit(12)) + 1,
          pmod(col("n_nationkey") + 5, lit(27)) + 1).as("s"))
      val pat = "datetime\\.date\\((\\d+), (\\d+), (\\d+)\\)"
      t.select(col("n_nationkey"),
          size(regexp_extract_all(col("s"), lit(pat), lit(0))).cast("long").as("n_dates"),
          regexp_extract(col("s"), pat, 1).as("first_year"),
          regexp_extract(col("s"), pat, 2).as("first_month"))
        .orderBy(col("n_nationkey"))
    }
  )
}
