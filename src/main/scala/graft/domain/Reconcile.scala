package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Old-vs-new database reconciliation (reconcile_and_label_db.py:111-287).
  *
  * Semantics per frame present in both databases with differing burst sets:
  *   - restart:  new has MORE bursts and date sets are disjoint → keep new
  *   - shrink:   new has more bursts but dates overlap → keep OLD burst list
  *   - backfill: sensing times whose DATE exists only in old are added to new
  * Frames only in new (or with identical burst sets) pass through.
  *
  * Spark-first: one full-outer join on frame_id over array columns, then
  * pure array expressions (array_except/array_union/array_sort — SURVEY.md
  * U2) — no per-row UDF, fully codegen'd, scales as a single shuffle.
  */
object Reconcile {

  /** Inputs: (frame_id, burst_id_list: array<string>,
    * sensing_time_list: array<string> ISO 'yyyy-MM-ddTHH:mm:ss').
    * Output adds `action` ∈ {restart, shrink, backfill_only, passthrough}. */
  def reconcile(oldDb: DataFrame, newDb: DataFrame): DataFrame = {
    val o = oldDb.select(col("frame_id").as("o_fid"),
      col("burst_id_list").as("o_bursts"), col("sensing_time_list").as("o_times"))
    val n = newDb.select(col("frame_id").as("n_fid"),
      col("burst_id_list").as("n_bursts"), col("sensing_time_list").as("n_times"))
    val dateOf = (c: org.apache.spark.sql.Column) =>
      transform(c, t => substring(t, 1, 10))

    val joined = n.join(o, col("n_fid") === col("o_fid"), "left")
    val bothPresent = col("o_fid").isNotNull
    val burstsDiffer = bothPresent &&
      (size(array_except(col("o_bursts"), col("n_bursts"))) > 0 ||
        size(array_except(col("n_bursts"), col("o_bursts"))) > 0)
    val newBigger = size(col("n_bursts")) > size(col("o_bursts"))
    val datesOverlap =
      size(array_intersect(dateOf(col("n_times")), dateOf(col("o_times")))) > 0
    // old times whose DATE is absent from new (backfill set)
    val missingOldTimes = filter(col("o_times"),
      t => !array_contains(dateOf(col("n_times")), substring(t, 1, 10)))

    joined.select(
      col("n_fid").as("frame_id"),
      when(!burstsDiffer, col("n_bursts"))
        .when(newBigger && !datesOverlap, col("n_bursts")) // restart
        .when(newBigger, col("o_bursts")) // shrink to old
        .otherwise(col("n_bursts"))
        .as("burst_id_list"),
      when(!burstsDiffer, col("n_times"))
        .when(newBigger && !datesOverlap, col("n_times"))
        .otherwise(array_sort(array_union(col("n_times"), missingOldTimes)))
        .as("sensing_time_list"),
      when(!bothPresent || !burstsDiffer, lit("passthrough"))
        .when(newBigger && !datesOverlap, lit("restart"))
        .when(newBigger, lit("shrink"))
        .otherwise(lit("backfill_only"))
        .as("action"))
  }
}
