package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Driver-side replays of the resampling family (q_permutation_test,
  * q_bh_fdr, q_bootstrap_ci). The DuckDB differential proves Spark and
  * DuckDB agree on the same algebra; these tests recompute every
  * replicate in plain sequential Scala — per-user maps, BigInt division,
  * an explicit sort for the CI order statistics — so a shared
  * formulation bug cannot hide behind a matching hash. The hash chain
  * (Knuth multiply, top-bit sign, Poisson threshold table) is exact
  * integer arithmetic, so every comparison here is ==, not a tolerance.
  * The BH step-up additionally gets a synthetic fixture where one group
  * genuinely rejects — the registry fixture is null data, where
  * "nothing rejected" is correct but would leave the step-up branch
  * untested.
  */
class ResamplingCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  private val thresholds = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L)

  private def h1(u: Long): Long =
    (((u % 1000003L) + 1000003L) % 1000003L) * 2654435761L % 2147483648L
  private def h2(h1v: Long, b: Long): Long =
    (h1v + b) * 2654435761L % 4294967296L
  private def sgn(h1v: Long, b: Long): Long =
    1L - 2L * (h2(h1v, b) / 2147483648L)
  private def pois(h: Long): Long = thresholds.indexWhere(h < _) match {
    case -1 => 9L
    case k  => k.toLong
  }

  private def eventRows(dir: String): Array[(Long, Long, Long, String)] =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("di"),
        floor(col("value") * 100).cast("long").as("vq"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  /** Per-user second-half-minus-first-half totals (the wilcoxon pairing). */
  private def userDiffs(rows: Array[(Long, Long, Long, String)]): Map[Long, Long] = {
    val cut = (rows.map(_._2).min + rows.map(_._2).max + 1) / 2
    rows.groupBy(_._1).view.mapValues { g =>
      g.filter(_._2 >= cut).map(_._3).sum - g.filter(_._2 < cut).map(_._3).sum
    }.toMap
  }

  test("permutation test: every replicate sum and the p-value replay exactly") {
    val r = SparkEntry.queries("q_permutation_test")(spark, sf("sf0.01")).collect().head
    val dd = userDiffs(eventRows(sf("sf0.01")))
    val tObs = dd.values.sum
    val tb = (1L to 200L).map(b => dd.map { case (u, d) => sgn(h1(u), b) * d }.sum)
    val c = tb.count(t => math.abs(t) >= math.abs(tObs)).toLong
    assert(r.getAs[Long]("n_users") == dd.size.toLong)
    assert(r.getAs[Long]("t_obs") == tObs)
    assert(r.getAs[Long]("p_num") == c + 1,
      s"p_num ${r.getAs[Long]("p_num")} vs replay ${c + 1}")
    assert(r.getAs[Long]("p_q6") == (c + 1) * 1000000L / 201L)
  }

  test("bh fdr: per-group p-values, ranks, and the step-up index replay exactly") {
    val out = SparkEntry.queries("q_bh_fdr")(spark, sf("sf0.01")).collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("p_num"), r.getAs[Long]("rnk"), r.getAs[Long]("rejected")))).toMap
    val rows = eventRows(sf("sf0.01"))
    val cut = (rows.map(_._2).min + rows.map(_._2).max + 1) / 2
    val pNum = rows.groupBy(_._4).view.mapValues { grp =>
      val dd = grp.groupBy(_._1).view.mapValues { g =>
        g.filter(_._2 >= cut).map(_._3).sum - g.filter(_._2 < cut).map(_._3).sum
      }.toMap
      val tObs = dd.values.sum
      val c = (1L to 200L).count { b =>
        math.abs(dd.map { case (u, d) => sgn(h1(u), b) * d }.sum) >= math.abs(tObs)
      }
      c + 1L
    }.toMap
    val m = pNum.size.toLong
    val ranked = pNum.toSeq.sortBy { case (g, p) => (p, g) }.zipWithIndex
      .map { case ((g, p), i) => (g, p, i + 1L) }
    val istar = ranked.collect {
      case (_, p, i) if 20L * m * p <= 201L * i => i
    }.maxOption.getOrElse(0L)
    assert(out.keySet == pNum.keySet)
    for ((g, p, i) <- ranked) {
      val (ep, ei, er) = out(g)
      assert(ep == p, s"$g p_num $ep vs replay $p")
      assert(ei == i, s"$g rank $ei vs replay $i")
      assert(er == (if (i <= istar) 1L else 0L), s"$g rejected $er, istar=$istar")
    }
  }

  test("bh fdr: a genuinely shifted group rejects while a null group survives") {
    // 'shift': every user gains +50 units in the second half (all dd > 0,
    // so only near-all-plus sign vectors reach |t_obs| — p_num is 1 with
    // overwhelming probability over the 200 hash draws, and 20*m*1 <=
    // 201*1 rejects at rank 1). 'null': identical totals in both halves,
    // dd = 0, t_obs = 0, every |T_b| >= 0 — p_num = 201, never rejected.
    val rows = (0 until 30).flatMap { u =>
      Seq(
        (4L * u, Timestamp.valueOf("2024-01-05 12:00:00"), u.toLong, "shift", 10.0),
        (4L * u + 1, Timestamp.valueOf("2024-01-25 12:00:00"), u.toLong, "shift", 60.0),
        (4L * u + 2, Timestamp.valueOf("2024-01-05 12:00:00"), u.toLong, "null", 20.0),
        (4L * u + 3, Timestamp.valueOf("2024-01-25 12:00:00"), u.toLong, "null", 20.0))
    }
    val dirPath = java.nio.file.Files.createTempDirectory("graft-resample")
    try {
      val dir = dirPath.toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = SparkEntry.queries("q_bh_fdr")(spark, dir).collect()
        .map(r => r.getAs[String]("g") ->
          ((r.getAs[Long]("p_num"), r.getAs[Long]("rejected")))).toMap
      // p_num for the shifted group depends on the deterministic hash
      // draw: it is 1 unless some of the 200 sign vectors happens to be
      // (near-)all-same-sign across the 30 users. A small bound keeps the
      // test diagnosable if B, the hash constants, or the user-id layout
      // ever change — the REJECTION is the semantic claim, not the exact
      // count (which the sf0.01 replay tests already pin exactly).
      assert(out("shift")._1 <= 5L && out("shift")._2 == 1L,
        s"shifted group must reject with a small p: ${out("shift")} " +
          "(p_num rides on the deterministic hash draw — see comment)")
      assert(out("null")._1 == 201L && out("null")._2 == 0L,
        s"null group must survive: ${out("null")}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("residue guard: colliding user ids fail the run instead of coupling") {
    // users 7 and 7 + 1000003 share a residue class — the draws would
    // silently co-flip; the in-plan injectivity assertion must fire
    val rows = Seq(
      (0L, Timestamp.valueOf("2024-01-05 12:00:00"), 7L, "a", 10.0),
      (1L, Timestamp.valueOf("2024-01-25 12:00:00"), 7L + 1000003L, "a", 20.0))
    val dirPath = java.nio.file.Files.createTempDirectory("graft-residue")
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${dirPath.toString}/events.parquet")
      for (q <- Seq("q_permutation_test", "q_bh_fdr", "q_bootstrap_ci")) {
        val e = intercept[Exception] {
          SparkEntry.queries(q)(spark, dirPath.toString).collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("residue collision")),
          s"$q: expected the residue guard, got $e")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("bootstrap ci: weights, replicate means, and CI ranks replay exactly") {
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, sf("sf0.01")).collect().head
    val rows = eventRows(sf("sf0.01"))
    val pu = rows.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).sum, g.length.toLong)).toMap
    val means = (1L to 200L).flatMap { b =>
      var ws = BigInt(0); var wn = 0L
      for ((u, (su, cu)) <- pu) {
        val w = pois(h2(h1(u), b))
        ws += BigInt(w) * su; wn += w * cu
      }
      if (wn > 0) Some(((ws * 1000000) / wn).toLong -> b) else None
    }.sortBy(identity)
    val nValid = means.length.toLong
    val loRank = math.max(1L, 25L * nValid / 1000L)
    assert(r.getAs[Long]("n_users") == pu.size.toLong)
    assert(r.getAs[Long]("n_valid") == nValid)
    val totS = BigInt(pu.values.map(_._1).sum)
    val totN = pu.values.map(_._2).sum
    assert(r.getAs[Long]("est_q6") == ((totS * 1000000) / totN).toLong)
    assert(r.getAs[Long]("lo_q6") == means((loRank - 1).toInt)._1)
    assert(r.getAs[Long]("hi_q6") == means((nValid - loRank).toInt)._1)
  }
}
