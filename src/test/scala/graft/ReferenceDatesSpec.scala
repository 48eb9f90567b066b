package graft

import java.sql.Timestamp
import java.time.LocalDate

import graft.domain.ReferenceDates

class ReferenceDatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(LocalDate.of(2020, 1, 1).plusDays(day).atStartOfDay())

  test("interval-triggered references (hand-traced case)") {
    val times = Seq(0, 10, 20, 30, 40, 50, 60).map(ts)
    val refs = ReferenceDates.sweep(times, intervalDays = 30, minAcq = 2)
    assert(refs == Seq(ts(0), ts(30), ts(60)))
  }

  test("undersized interval group does not emit") {
    val times = Seq(0, 40, 80).map(ts) // interval passes but only 2 in group
    val refs = ReferenceDates.sweep(times, intervalDays = 30, minAcq = 5)
    assert(refs == Seq(ts(0)))
  }

  test("event date with undersized group merges into previous batch") {
    val times = Seq(0, 10, 20, 25, 30, 55, 85).map(ts)
    val event = Set(LocalDate.of(2020, 1, 26)) // day 25
    val refs = ReferenceDates.sweep(times, event, intervalDays = 30, minAcq = 5)
    assert(refs == Seq(ts(25)))
  }

  test("event date with big-enough group emits a reference") {
    val times = Seq(0, 1, 2, 3, 4, 25, 40).map(ts)
    val event = Set(LocalDate.of(2020, 1, 26)) // day 25
    val refs = ReferenceDates.sweep(times, event, intervalDays = 365, minAcq = 3)
    assert(refs == Seq(ts(0), ts(25)))
  }

  test("Spark operator emits per-key indexed references") {
    val df = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (1L, ts(30)),
      (2L, ts(0)), (2L, ts(100))).toDF("key", "ts")
    val out = ReferenceDates.referenceDates(df, intervalDays = 30, minAcq = 2)
      .orderBy($"key", $"ref_idx")
      .as[(Long, Int, Timestamp)].collect().toSeq
    assert(out == Seq((1L, 1, ts(0)), (1L, 2, ts(30)),
      (2L, 1, ts(0)), (2L, 2, ts(100))))
  }
}
