package graft

import org.apache.spark.sql.functions._

/** Approximate-sketch surface (HLL distinct counting, t-digest quantiles):
  * mergeable sketches are the 100 TB path for cardinality/quantile stats —
  * partials combine map-side, so the shuffle carries sketches, not rows.
  * Engine sketch encodings differ (no DuckDB hash oracle possible); gated
  * by error bounds against the exact answers instead. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL) is within its rsd bound of exact") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val (approx, exact) = docs.agg(
        approx_count_distinct($"text", 0.02).as("a"),
        countDistinct($"text").as("e"))
      .as[(Long, Long)].head()
    // 0.02 rsd → allow 3 sigma ≈ 6%
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.06).toLong),
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile lands within rank tolerance of the exact quantile") {
    val docs = Tables.documents(spark, sf("sf0.01")).select($"n_chars".cast("double"))
    val n = docs.count()
    val acc = 1000 // rank error ≤ n/acc
    val approx = docs.agg(expr(s"approx_percentile(n_chars, 0.5d, $acc)"))
      .as[Double].head()
    // rank of the approx answer must be within n/acc of the true median rank
    val rank = docs.filter($"n_chars" <= approx).count()
    assert(math.abs(rank - n / 2) <= n / acc + 1,
      s"median approx=$approx has rank $rank of $n")
  }

  test("HLL partials combine map-side (sketch, not rows, crosses the shuffle)") {
    val plan = Tables.documents(spark, sf("sf0.01"))
      .groupBy($"lang").agg(approx_count_distinct($"text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"expected a partial HLL aggregate in:\n$plan")
  }

  test("Misra-Gries summary keeps every item above the n/k guarantee") {
    // adversarial stream: heavy items buried in a long tail, split across
    // partials merged in a skewed tree (the worst case for the subtract-
    // the-(k+1)th merge rule)
    val k = 16
    val agg = new graft.pipeline.Sketches.MisraGriesAgg(k)
    val heavy = (1 to 4).flatMap(i => Seq.fill(500 * i)(s"hh$i"))
    val tail = (1 to 3000).map(i => s"t${i % 997}")
    val rnd = new scala.util.Random(42) // deterministic shuffle seed
    val items = rnd.shuffle(heavy ++ tail)
    val n = items.length
    // 8 partials, unequal sizes, merged left-to-right
    val parts = items.grouped(math.max(1, n / 8 + 1)).toList
    val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged = partials.reduce(agg.merge)
    val out = agg.finish(merged).split(" ").toSet
    val exact = items.groupBy(identity).view.mapValues(_.size).toMap
    val mustHave = exact.filter { case (_, c) => c.toLong * k > n }.keySet
    assert(mustHave.nonEmpty, "fixture produced no heavy hitters")
    assert(mustHave.subsetOf(out),
      s"MG lost guaranteed items: ${mustHave -- out}")
    // and the buffer never exceeded k entries
    assert(merged.size <= k, s"buffer ${merged.size} > k=$k")
  }
}
