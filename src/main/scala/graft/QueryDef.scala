package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark query builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (both sides must follow it so the driver's
  * column-sorted value hash matches):
  *   - every query ends in a total ORDER BY (ties broken by a key column);
  *   - no raw double aggregation: doubles are floor-quantized to bigints
  *     (`floor(x * 10^k)`) before SUM so accumulation order cannot matter;
  *   - integer-valued derived columns are cast to BIGINT on both sides;
  *   - no non-deterministic FIRST/collect order — window row_number with a
  *     full tie-break instead (SURVEY.md §7.5 risk 5).
  *
  * Runner contract: a built plan may `persist()` intermediates that feed
  * several downstream branches (e.g. q_dedup_embedding's equality-class
  * reps). The plan is lazy, so the query function cannot unpersist them
  * itself; the RUNNER must call `spark.catalog.clearCache()` after
  * materializing each query (Verify and Bench both do, in their per-query
  * `finally`) or cached blocks accumulate across a registry sweep.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
