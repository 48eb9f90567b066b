package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter pre-join: the scale path for `big ⋉ small` when `small` is
  * too large to broadcast as a hash relation but its Bloom fingerprint
  * (KB–MB regardless of row width) fits on every task.
  *
  * Two passes: (1) fold `small`'s join keys into one Bloom sketch with the
  * native `BloomFilterAggregate` (mergeable → map-side combined; the
  * driver holds only the final KB-scale binary — the same license as a
  * broadcast variable); (2) prefilter `big` with the codegen'd
  * `BloomFilterMightContain` BEFORE its shuffle, then run the exact join,
  * which removes the Bloom's false positives. No false negatives exist, so
  * the result is bit-identical to the plain join — the oracle proves it —
  * while the shuffle moves only the ~matching fraction of `big`. This is
  * Spark's own runtime-filter expression pair, applied explicitly so the
  * reduction is guaranteed rather than left to the optimizer's injection
  * heuristics (spark.sql.optimizer.runtime.bloomFilter covers only
  * adaptively-detected cases).
  */
object BloomJoin {

  /** The serialized Bloom sketch of `keyOf(small)` (hashed to long via
    * xxhash64 — the same keying `BloomFilterMightContain` probes with). */
  def bloomOf(small: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftShim.expression(xxhash64(key)),
      GraftShim.expression(lit(expectedItems)))
    small.agg(GraftShim.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd filter Column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftShim.column(BloomFilterMightContain(
      GraftShim.expression(lit(bloom)),
      GraftShim.expression(xxhash64(key))))

  /** big ⋉ small (inner, on bigKey == smallKey) with the Bloom prefilter
    * applied to `big` before its shuffle. `expectedItems` sizes the sketch
    * (production: from table stats; a 10⁸-key dim at 3% fpp is ~90 MB —
    * still task-shippable where its hash relation is not). */
  def bloomJoin(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      expectedItems: Long = 100000L): DataFrame = {
    val bloom = bloomOf(small, smallKey, expectedItems)
    big.filter(mightContain(bloom, bigKey)).join(small, bigKey === smallKey)
  }

  val queries: Seq[QueryDef] = Seq(

    // lineitem ⋉ urgent-expensive-orders via the Bloom prefilter; the plain
    // SQL join is the oracle — hash equality proves the prefilter loses
    // nothing and the exact join kills every false positive
    QueryDef.sql(
      "q_bloom_semi_join",
      """WITH sel AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000),
        |j AS (
        |  SELECT l.l_returnflag, l.l_quantity
        |  FROM lineitem l JOIN sel s ON l.l_orderkey = s.o_orderkey)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_q2
        |FROM j GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val sel = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
        .select(col("o_orderkey"))
      bloomJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_returnflag"), col("l_quantity")),
        col("l_orderkey"), sel, col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_q2"))
        .orderBy(col("l_returnflag"))
    }
  )
}
