package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join: the union+running-last plan vs a brute-force per-row scan. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 15L, "p3"), (3L, 8L, "p4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 18L, 180L), (2L, 1L, 10L), (4L, 2L, 20L))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t")
      .select($"tag", $"asof_t", $"asof_v")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      ("p0", None, None),              // before any right row for k=1
      ("p1", Some(10L), Some(100L)),   // equal timestamp IS visible
      ("p2", Some(18L), Some(180L)),   // latest ≤ 20
      ("p3", Some(1L), Some(10L)),
      ("p4", None, None)))             // k=3 has no right rows at all
  }

  test("asOf matches brute force on random data") {
    val rnd = new scala.util.Random(42)
    val lrows = (1 to 300).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rrows0 = (1 to 200).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong * 7))
    // right unique per (k, t): keep max v (the operator's documented contract)
    val rrows = rrows0.groupBy(r => (r._1, r._2)).map { case ((k, t), vs) =>
      (k, t, vs.map(_._3).max)
    }.toSeq
    val left = lrows.toDF("k", "t", "id")
    val right = rrows.toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t")
      .select($"id", $"asof_v").as[(Long, Option[Long])].collect().toMap
    val want = lrows.map { case (k, t, id) =>
      val cands = rrows.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == want)
  }

  test("forward asOf attaches the earliest right row at-or-after each left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 19L, "p2"), (1L, 30L, "p3"), (2L, 5L, "p4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 18L, 180L), (1L, 25L, 250L))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", direction = "forward")
      .select($"tag", $"asof_t", $"asof_v")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      ("p1", Some(10L), Some(100L)), // equal timestamp IS visible
      ("p2", Some(25L), Some(250L)), // earliest ≥ 19
      ("p3", None, None),            // nothing after 30
      ("p4", None, None)))           // no right rows for k=2
  }

  test("asOf plan is one shuffle (window), no join") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1L)).toDF("k", "t", "v")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected a window operator")
  }
}
