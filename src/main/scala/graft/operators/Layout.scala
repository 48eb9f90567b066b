package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture (SURVEY.md §7.5 risk 7:
  * "partition bursts by year(sensing_time), bucket by burst_id_jpl").
  *
  *   - `writePartitioned`: hive-style partition directories → partition
  *     pruning turns time/key predicates into directory listing, no data
  *     read at all for pruned partitions;
  *   - `saltedAggregate`: two-stage aggregation for skewed keys — stage 1
  *     aggregates (key, salt) so the hot key's rows spread over `salts`
  *     reducers, stage 2 merges the tiny per-salt partials. AQE handles
  *     join skew; aggregation skew still needs this.
  */
object Layout {

  /** Write with partition columns (e.g. year/month of the event time). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed external table (the "bucket bursts by burst_id_jpl" layout,
    * SURVEY.md §7.5 risk 7): co-located joins on the bucket key need no
    * exchange at all — the join becomes map-side at any scale. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Morton/Z-order key: interleave the low `bits` of two non-negative
    * cell coordinates (pure Column arithmetic → codegen'd). Spatially
    * close cells get numerically close keys. */
  def zOrderKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { j =>
      (shiftleft(shiftright(x, j).bitwiseAND(1), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(1), 2 * j + 1)).cast("long")
    }.reduce(_ + _)

  /** Cluster rows spatially before writing: normalize (x, y) into a
    * 2^bits grid, range-partition on the Z key, sort within partitions —
    * each output file then covers a compact spatial extent, so the bbox
    * min/max statistics in its row groups prune sharply (the physical
    * complement of the BboxPrefilterRule query-side plan). */
  def spatialCluster(df: DataFrame, x: Column, y: Column,
      xMin: Double, xMax: Double, yMin: Double, yMax: Double,
      partitions: Int, bits: Int = 16): DataFrame = {
    val scale = (1L << bits) - 1
    val cx = floor((x - xMin) / (xMax - xMin) * scale).cast("long")
    val cy = floor((y - yMin) / (yMax - yMin) * scale).cast("long")
    val keyed = df.withColumn("__z", zOrderKey(cx, cy, bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Deterministic row salt: hashes the row's actual column values, never
    * monotonically_increasing_id() — a nondeterministic expression feeding
    * a shuffle KEY re-routes rows on task retry (the classic
    * nondeterministic-shuffle-key failure: a retried map task salts rows
    * differently than the outputs reducers already fetched → lost or
    * duplicated rows). Content hashing is retry-stable and run-stable;
    * duplicate rows sharing a salt only costs spread uniformity. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  /** Salted two-stage aggregation: SUM/COUNT-style mergeable aggregates
    * only. `aggs` maps output column name → (stage1 agg of input col,
    * stage2 merge). */
  def saltedSumCount(df: DataFrame, key: Column, salts: Int,
      sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    val stage1 = salted.groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    stage1.groupBy(col("key"))
      .agg(sum(col("__cnt")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted replicate join for a skewed key: the big side gets a random-
    * but-deterministic salt in [0, salts); the small side is replicated
    * `salts`× so every (key, salt) pair still finds its match. The hot
    * key's rows then spread over `salts` reducers instead of one. Use when
    * the small side is too big to broadcast outright but `salts`× its key
    * rows still shuffle cheaply; AQE's skew splitting covers sort-merge
    * joins it can see, this covers the planned-ahead case. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val sb = big.withColumn("__salt", rowSalt(big, salts))
    val ss = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sb.join(ss, Seq(key, "__salt")).drop("__salt")
  }

  val queries: Seq[QueryDef] = Seq(
    // the salted two-stage aggregation vs a plain GROUP BY oracle: proves
    // the skew-mitigation path is semantics-preserving (event_type has
    // only 5 values — exactly the hot-key shape salting exists for; value
    // is per-row quantized BEFORE summation so both engines sum integers)
    QueryDef.sql(
      "q_salted_agg",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_v_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      saltedSumCount(ev, col("event_type"), salts = 8, sumCols = Seq("v_c"))
        .select(col("key").as("event_type"), col("n"),
          col("sum_v_c").cast("long").as("sum_v_c"))
        .orderBy(col("event_type"))
    },

    // salted replicate JOIN vs the plain join oracle: events (5 event
    // types — all hot keys) against a per-type weight dim; weighted sums
    // must come out identical to the unsalted plan
    QueryDef.sql(
      "q_salted_join",
      """WITH dim AS (
        |  SELECT event_type, CAST(LENGTH(event_type) AS BIGINT) AS w
        |  FROM (SELECT DISTINCT event_type FROM events) x),
        |ev AS (
        |  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v_c FROM events)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(e.v_c * d.w) AS BIGINT) AS weighted_sum
        |FROM ev e JOIN dim d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v_c"))
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("w", length(col("event_type")).cast("long"))
      saltedJoin(ev, dim, "event_type", salts = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v_c") * col("w")).as("weighted_sum"))
        .orderBy(col("event_type"))
    },

    // Z-order clustering readout: rows land in Morton tiles (the key
    // `spatialCluster` range-partitions files by); per tile, total rows
    // vs rows matching a 2-D query box. A multi-dim predicate touches
    // only the tiles whose n_match > 0 — the measurable pruning win of
    // Z-layout over either single-column sort. The oracle recomputes the
    // interleave with pure integer arithmetic ((x div 2^j) mod 2 terms),
    // which equals the Spark side's shiftright/bitwiseAND for the
    // non-negative coordinates used here.
    QueryDef.sql(
      "q_zorder_tiles", {
        val zSql = (0 until 8).map { j =>
          s"((x // ${1L << j}) % 2) * ${1L << (2 * j)} + ((y // ${1L << j}) % 2) * ${1L << (2 * j + 1)}"
        }.mkString(" + ")
        s"""WITH c AS (
           |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
           |z AS (SELECT x, y, CAST($zSql AS BIGINT) AS zk FROM c)
           |SELECT CAST(zk // 1024 AS BIGINT) AS tile,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CASE WHEN x < 64 AND y < 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_match
           |FROM z GROUP BY 1 ORDER BY tile""".stripMargin
      }) { (s, d) =>
      val c = Tables.lineitem(s, d).select(
        pmod(col("l_partkey"), lit(256)).as("x"),
        pmod(col("l_suppkey"), lit(256)).as("y"))
      c.withColumn("zk", zOrderKey(col("x"), col("y"), bits = 8))
        .groupBy((col("zk") / 1024).cast("long").as("tile"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") < 64 && col("y") < 64, 1).otherwise(0)).as("n_match"))
        .orderBy(col("tile"))
    },

    // Zone-map (min/max statistics) pruning planner: bucket the fact
    // table into key-ranged "files", compute each file's shipdate zone
    // map, and classify every file against a date predicate as
    // pruned / full / partial — exactly the decision a parquet reader
    // makes from row-group stats, surfaced as a queryable plan. The
    // groupBy is combiner-backed (one row per file), so the planner
    // itself costs one scan regardless of file count.
    QueryDef.sql(
      "q_zonemap_prune",
      """WITH f AS (
        |  SELECT l_orderkey // 256 AS file_id,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM lineitem),
        |zm AS (
        |  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(MIN(d) AS BIGINT) AS min_d, CAST(MAX(d) AS BIGINT) AS max_d
        |  FROM f GROUP BY file_id),
        |lo AS (SELECT CAST(DATE '1998-01-01' - DATE '1970-01-01' AS BIGINT) AS lo,
        |              CAST(DATE '1998-12-31' - DATE '1970-01-01' AS BIGINT) AS hi)
        |SELECT CAST(file_id AS BIGINT) AS file_id, n_rows, min_d, max_d,
        |  CASE WHEN max_d < lo OR min_d > hi THEN 'pruned'
        |       WHEN min_d >= lo AND max_d <= hi THEN 'full'
        |       ELSE 'partial' END AS verdict
        |FROM zm CROSS JOIN lo ORDER BY file_id""".stripMargin) { (s, d) =>
      val f = Tables.lineitem(s, d).select(
        (col("l_orderkey") / 256).cast("long").as("file_id"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      val zm = f.groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("d")).cast("long").as("min_d"), max(col("d")).cast("long").as("max_d"))
      val lo = datediff(lit("1998-01-01").cast("date"), lit("1970-01-01").cast("date")).cast("long")
      val hi = datediff(lit("1998-12-31").cast("date"), lit("1970-01-01").cast("date")).cast("long")
      zm.select(col("file_id"), col("n_rows"), col("min_d"), col("max_d"),
          when(col("max_d") < lo || col("min_d") > hi, "pruned")
            .when(col("min_d") >= lo && col("max_d") <= hi, "full")
            .otherwise("partial").as("verdict"))
        .orderBy(col("file_id"))
    }
  )
}
