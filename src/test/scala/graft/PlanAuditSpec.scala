package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: the properties that make these queries scale
  * (pushdown, pruning, broadcast choice, shuffle count) asserted on the
  * physical plans, so a future refactor that silently loses them fails CI.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution.executedPlan.toString

  private def countOccurrences(s: String, needle: String): Int =
    needle.r.findAllIn(s).length

  test("flagship entry runs and returns rows (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5) // one per region
    assert(rows.map(_.getAs[Long]("n_customers")).sum == 150)
  }

  test("filters and projections reach the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(l_returnflag,R)"),
      s"filter not pushed:\n$p")
    // column pruning: only the 4 referenced columns are read
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_extendedprice"),
      s"no pruning: $read")
  }

  test("point lookup pushes the key predicate") {
    val p = plan("q_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,1024)"), s"no pushdown:\n$p")
  }

  test("dimension joins broadcast, fact side does not") {
    val p = plan("q_join3")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    val p4 = plan("q_join4")
    // nation broadcast; lineitem⋈orders stays a shuffle join under AQE
    assert(p4.contains("BroadcastHashJoin"))
  }

  test("sessionization is a single shuffle per window key") {
    val p = plan("q_sessionize")
    // one hash-partitioning exchange on user_id feeds both window passes
    // and the final aggregation (sort-based reuse); orderBy adds a range
    // exchange at the end
    val hashExchanges = countOccurrences(p, "hashpartitioning\\(user_id")
    assert(hashExchanges <= 2, s"$hashExchanges user_id exchanges:\n$p")
  }

  test("semi and anti joins plan as such") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    val p = plan("q_scalar_math")
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan
    assert(p.contains("*(1) Project"), s"no codegen:\n$p")
  }
}
