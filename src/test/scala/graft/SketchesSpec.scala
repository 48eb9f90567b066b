package graft

import graft.operators.Layout
import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

/** Specs for the relational sketches + skew/salt paths: the properties the
  * DuckDB hash oracle can't express (one-sided error, mergeability,
  * estimate accuracy, salt invariance). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min never underestimates — for every key, not just the heavy ones") {
    val li = Tables.lineitem(spark, sf())
    val cms = Sketches.countMin(li, col("l_partkey"))
    val exact = li.groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("exact"))
    val joined = Sketches.cmEstimate(cms, exact.select($"k"))
      .join(exact, Seq("k"))
      .select($"k", $"exact", $"est").as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (k, ex, est) =>
      assert(est >= ex, s"CMS underestimated key $k: est $est < exact $ex")
    }
  }

  test("count-min holds its one-sided guarantee at a non-default geometry") {
    // geometry is the scale dial — prove the family is generic in it, not
    // hard-wired to 4×256 (the LshGeometrySpec discipline)
    val li = Tables.lineitem(spark, sf())
    val (depth, width) = (6, 64)
    val cms = Sketches.countMin(li, col("l_partkey"), depth, width)
    assert(cms.table.count() <= depth.toLong * width)
    val exact = li.groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("exact"))
    val joined = Sketches.cmEstimate(cms, exact.select($"k"))
      .join(exact, Seq("k")).select($"exact", $"est").as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (ex, est) => assert(est >= ex) }
  }

  test("count-min is mergeable: sketch(a ∪ b) == sketch(a) + sketch(b)") {
    val li = Tables.lineitem(spark, sf())
    val a = li.filter($"l_orderkey" % 2 === 0)
    val b = li.filter($"l_orderkey" % 2 =!= 0)
    val merged = Sketches.countMin(a, col("l_partkey")).table
      .unionByName(Sketches.countMin(b, col("l_partkey")).table)
      .groupBy($"i", $"bucket").agg(sum($"cnt").as("cnt"))
    val whole = Sketches.countMin(li, col("l_partkey")).table
    val diff = merged.join(whole.withColumnRenamed("cnt", "cnt2"),
        Seq("i", "bucket"), "full")
      .filter(coalesce($"cnt", lit(-1L)) =!= coalesce($"cnt2", lit(-2L)))
    assert(diff.isEmpty, "merged partial sketches differ from the whole-input sketch")
  }

  test("hll estimate lands within the expected error band of the exact count") {
    // sf0.01: ~1500 distinct customers — safely inside the raw-estimator
    // regime (sf0.001's 150 sits under the 2.5·m small-range cutoff)
    val row = SparkEntry.queries("q_hll_distinct")(spark, sf("sf0.01"))
      .select($"n_exact", $"hll_est").as[(Long, Long)].head()
    val (exact, est) = row
    assert(exact > 160, s"corpus too small for the raw estimator regime: $exact")
    // 64 buckets → typical rel. error 1.04/√64 ≈ 13%; gate at 3σ-ish 40%
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr < 0.4, s"HLL est $est vs exact $exact (rel err $relErr)")
  }

  test("hll is mergeable: bucket-wise max of partial sketches == whole sketch") {
    // the merge operation of an HLL register table is element-wise MAX —
    // build the rho table per half, merge via max, compare with the
    // whole-input register table (the partial-aggregation licence at 100 TB);
    // the hash/rho algebra comes from the SAME helpers the queries use
    def rhoTable(df: org.apache.spark.sql.DataFrame) = {
      val (bucket, r) = Sketches.rhoOf(Sketches.hllMix($"o_custkey"))
      df.select(bucket.as("bucket"), r.as("r"))
        .groupBy($"bucket").agg(max($"r").as("maxrho"))
    }
    val orders = Tables.orders(spark, sf())
    val a = rhoTable(orders.filter($"o_orderkey" % 2 === 0))
    val b = rhoTable(orders.filter($"o_orderkey" % 2 =!= 0))
    val merged = a.unionByName(b).groupBy($"bucket").agg(max($"maxrho").as("maxrho"))
      .as[(Long, Long)].collect().toMap
    val whole = rhoTable(orders).as[(Long, Long)].collect().toMap
    assert(merged == whole && whole.nonEmpty)
  }

  test("grouped hll registers merge per key exactly like the global table") {
    def regTable(df: org.apache.spark.sql.DataFrame) = {
      val (bucket, r) = Sketches.rhoOf(Sketches.hllMix($"o_custkey"))
      df.select($"o_orderpriority".as("grp"), bucket.as("bucket"), r.as("r"))
        .groupBy($"grp", $"bucket").agg(max($"r").as("maxrho"))
    }
    val orders = Tables.orders(spark, sf())
    val a = regTable(orders.filter($"o_orderkey" % 2 === 0))
    val b = regTable(orders.filter($"o_orderkey" % 2 =!= 0))
    val merged = a.unionByName(b).groupBy($"grp", $"bucket")
      .agg(max($"maxrho").as("maxrho"))
      .as[(String, Long, Long)].collect().toSet
    val whole = regTable(orders).as[(String, Long, Long)].collect().toSet
    assert(merged == whole && whole.nonEmpty)
  }

  test("table checksum detects cross-row value swaps (non-linearity)") {
    import spark.implicits._
    // swap two custkeys between rows: per-column sums are unchanged, so a
    // LINEAR row hash would sum to the identical checksum — the avalanche
    // mix must break the cancellation
    def checksum(df: org.apache.spark.sql.DataFrame): Long = {
      val base = pmod($"k1" * 1000003L + $"k2" * 8191L, lit(Sketches.P))
      df.select(Sketches.hllMix(base).as("h"))
        .agg((sum($"h".cast("decimal(38,0)")) % Sketches.P).cast("long"))
        .as[Long].head()
    }
    val orig = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k1", "k2")
    val swapped = Seq((1L, 20L), (2L, 10L), (3L, 30L)).toDF("k1", "k2")
    assert(checksum(orig) != checksum(swapped),
      "checksum failed to detect a cross-row swap")
  }

  test("salted join result is invariant to the salt width") {
    val ev = Tables.events(spark, sf()).select($"event_type",
      floor($"value" * 100).cast("long").as("v_c"))
    val dim = ev.select($"event_type").distinct()
      .withColumn("w", length($"event_type").cast("long"))
    def agg(salts: Int) =
      Layout.saltedJoin(ev, dim, "event_type", salts)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"v_c" * $"w").as("ws"))
        .as[(String, Long, Long)].collect().toSet
    val plain = ev.join(dim, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_c" * $"w").as("ws"))
      .as[(String, Long, Long)].collect().toSet
    assert(agg(2) == plain && agg(16) == plain)
  }

  test("decontamination flags only training docs, each with real overlap") {
    val out = SparkEntry.queries("q_decontaminate")(spark, sf())
      .select($"doc_id", $"n_shared_grams").as[(Long, Long)].collect()
    assert(out.nonEmpty, "no contamination found — the fixture should plant some")
    out.foreach { case (id, n) =>
      assert(id % 50 != 0, s"eval doc $id flagged as training")
      assert(n >= 1)
    }
  }

  test("source mixture: deterministic, and kept counts respect the rate bound") {
    val run1 = SparkEntry.queries("q_source_mixture")(spark, sf())
      .select($"source", $"target_permille", $"n_docs", $"n_kept")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val run2 = SparkEntry.queries("q_source_mixture")(spark, sf())
      .select($"source", $"target_permille", $"n_docs", $"n_kept")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(run1.sameElements(run2)) // hash-based, never rand()
    run1.foreach { case (src, rate, n, kept) =>
      assert(kept <= n)
      assert(rate >= 200 && rate < 900, s"$src rate $rate")
    }
  }

  test("quantile sketch brackets the exact quantile within one mantissa bucket") {
    import org.apache.spark.sql.functions._
    // the oracle proves both engines compute the same sketch; this spec
    // proves the sketch answers the QUESTION: for each p, the exact
    // rank-k order statistic lies in the reported [lb, ub) bucket, whose
    // width is the advertised <= 1/16 relative error
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, sf())
      .collect().map(r => (r.getAs[Long]("p_permille"), r.getAs[Long]("rank_k"),
        r.getAs[Long]("q_lb"), r.getAs[Long]("q_ub")))
    assert(rows.map(_._1).toSeq == Seq(500L, 900L, 990L))
    val vs = Tables.lineitem(spark, sf())
      .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
      .orderBy(col("v")).as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    rows.foreach { case (p, k, lb, ub) =>
      val exact = vs((k - 1).toInt)
      assert(lb <= exact && exact < ub, s"p$p: exact $exact outside [$lb, $ub)")
      assert(ub - lb <= lb / 16 + 1, s"p$p: bucket wider than 1/16 relative")
    }
  }
}
