package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed interval join: equivalence to brute force at several widths,
  * and the plan guarantee (equi-join, never a nested loop). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val ivs = (1 to 150).map { i =>
    val lo = rnd.nextInt(1000).toLong - 100
    (i.toLong, lo, lo + rnd.nextInt(60))
  }
  private val pts = (1 to 200).map(i => (i.toLong, rnd.nextInt(1100).toLong - 150))

  test("bucketed join matches brute force at widths 1, 7, 64, 4096") {
    val points = pts.toDF("pid", "t")
    val intervals = ivs.toDF("iid", "lo", "hi")
    val want = (for {
      (pid, t) <- pts; (iid, lo, hi) <- ivs if t >= lo && t <= hi
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 7L, 64L, 4096L)) {
      val got = RangeJoin.bucketed(points, "t", intervals, "lo", "hi", w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"width $w")
    }
  }

  test("each matching pair appears exactly once (no cross-cell duplicates)") {
    val points = pts.toDF("pid", "t")
    val intervals = ivs.toDF("iid", "lo", "hi")
    val counts = RangeJoin.bucketed(points, "t", intervals, "lo", "hi", 16)
      .groupBy($"pid", $"iid").count().filter($"count" > 1).count()
    assert(counts == 0)
  }

  test("plan is an equi-join on the cell id, not a nested loop") {
    val points = pts.toDF("pid", "t")
    val intervals = ivs.toDF("iid", "lo", "hi")
    val plan = RangeJoin.bucketed(points, "t", intervals, "lo", "hi", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated to a scan-everything plan:\n$plan")
  }

  test("guardrails: zero width and colliding names are rejected") {
    val points = pts.toDF("pid", "t")
    val intervals = ivs.toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points, "t", intervals, "lo", "hi", 0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points.withColumnRenamed("pid", "lo"), "t",
        intervals, "lo", "hi", 16)
    }
  }
}
