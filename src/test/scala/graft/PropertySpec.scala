package graft

import graft.domain.FrameSolver
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5: DP solver + gaps-and-islands invariants,
  * fixed seed via explicit ScalaCheck params). */
class PropertySpec extends AnyFunSuite {

  private val params = ScTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(1234L))

  private def check(name: String, prop: Prop): Unit = {
    val r = ScTest.check(params, prop)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("DP solve: chain covers [0,n), sizes within bounds, overlap 1") {
    val gen = for {
      n <- Gen.choose(5, 60)
      minF <- Gen.choose(3, 6)
      spread <- Gen.choose(1, 6)
      target <- Gen.choose(minF, minF + spread)
    } yield (n, minF, minF + spread, target.toDouble)
    check("dp-chain", Prop.forAll(gen) { case (n, minF, maxF, target) =>
      val slices = FrameSolver.solve(n, target, minF, maxF)
      val chainOk = slices.head._1 == 0 && slices.last._2 == n &&
        slices.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => s2 == e1 - 1
          case _ => true
        }
      // underlying cuts (j = next start; n for last) honor [minF, maxF] —
      // when n is representable as a sum of steps in [minF-1, maxF-1];
      // otherwise the documented fallback is a single undersized slice
      val feasible = (1 to n).exists(k =>
        k.toLong * (minF - 1) <= n && n <= k.toLong * (maxF - 1))
      val js = slices.drop(1).map(_._1) :+ n
      val sizesOk =
        if (feasible)
          slices.map(_._1).zip(js).forall { case (i, j) =>
            val m = j - i + 1; m >= minF && m <= maxF
          }
        else slices == Seq((0, n))
      chainOk && sizesOk
    })
  }

  test("smoothing: monotone water→land, no short water runs survive") {
    val gen = for {
      n <- Gen.choose(1, 80)
      bits <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield bits.toArray
    check("smoothing", Prop.forAll(gen) { ind =>
      val out = FrameSolver.smoothIndicator(ind, minF = 5)
      val monotone = ind.zip(out).forall { case (b, a) => !b || a }
      var runs = List.empty[(Boolean, Int)]
      out.foreach { v =>
        runs = runs match {
          case (b, c) :: t if b == v => (b, c + 1) :: t
          case t => (v, 1) :: t
        }
      }
      val noShortWater = runs.filter(!_._1).forall(_._2 >= 5)
      monotone && noShortWater
    })
  }

  test("landOptimizedSlices: slices sorted, cover the whole track") {
    val gen = for {
      n <- Gen.choose(1, 100)
      bits <- Gen.listOfN(n, Gen.prob(0.6))
    } yield bits.toArray
    check("slices-cover", Prop.forAll(gen) { ind =>
      val slices = FrameSolver.landOptimizedSlices(ind)
      slices.nonEmpty &&
        slices.head.start == 0 &&
        slices.map(_.end).max == ind.length &&
        slices.sliding(2).forall {
          case Seq(a, b) => a.start <= b.start
          case _ => true
        } &&
        // every index is inside at least one slice
        (0 until ind.length).forall(i => slices.exists(s => s.start <= i && i < s.end))
    })
  }

  test("reconcile invariants over random old/new frame pairs") {
    val spark = SparkSpec.session
    import spark.implicits._
    val genFrame = for {
      nb <- Gen.choose(1, 5)
      bursts <- Gen.pick(nb, Seq("a", "b", "c", "d", "e", "f"))
      nt <- Gen.choose(1, 6)
      days <- Gen.pick(nt, 1 to 28)
    } yield (bursts.sorted.toSeq,
      days.toSeq.sorted.map(d => f"2020-01-$d%02dT00:00:00"))
    val gen = Gen.zip(genFrame, genFrame)
    val cases = Gen.listOfN(60, gen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(99L)).get

    val oldDb = cases.zipWithIndex.map { case (((ob, ot), _), i) =>
      (i.toLong, ob, ot) }.toDF("frame_id", "burst_id_list", "sensing_time_list")
    val newDb = cases.zipWithIndex.map { case ((_, (nb, nt)), i) =>
      (i.toLong, nb, nt) }.toDF("frame_id", "burst_id_list", "sensing_time_list")
    val out = graft.domain.Reconcile.reconcile(oldDb, newDb)
      .orderBy($"frame_id")
      .as[(Long, Seq[String], Seq[String], String)].collect()

    out.zip(cases).foreach { case ((_, bursts, times, action), ((ob, ot), (nb, nt))) =>
      // burst list is always exactly the old or the new list
      assert(bursts == ob || bursts == nb, s"bursts $bursts not old/new")
      // times are sorted, deduped, and cover all new times
      assert(times == times.sorted && times.distinct == times)
      assert(nt.toSet.subsetOf(times.toSet))
      // every time comes from old or new
      assert(times.toSet.subsetOf(ot.toSet ++ nt.toSet))
      // restart keeps new exactly
      if (action == "restart") assert(bursts == nb && times == nt.sorted)
      // shrink only ever happens when new is strictly bigger
      if (action == "shrink") assert(nb.size > ob.size && bursts == ob)
    }
  }

  test("utm zone/epsg invariants over random coordinates") {
    val spark = SparkSpec.session
    import spark.implicits._
    import graft.functions.GeoFunctions
    import org.apache.spark.sql.functions.col
    val gen = Gen.zip(Gen.chooseNum(-180.0, 179.999), Gen.chooseNum(-89.9, 89.9))
    val pts = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get
    val got = pts.toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        GeoFunctions.utmZone(col("lon"), col("lat")).as("zone"),
        GeoFunctions.utmEpsg(col("lon"), col("lat")).as("epsg"))
      .as[(Double, Double, Int, Int)].collect()
    got.foreach { case (lon, lat, zone, epsg) =>
      assert(zone >= 1 && zone <= 60, s"zone $zone at $lon,$lat")
      if (lat > 75) assert(epsg == 3413) // NORTH_THRESHOLD=75, build_frame_db.py:27-28
      else if (lat < -60) assert(epsg == 3031)
      else if (lat >= 0) assert(epsg == 32600 + zone)
      else assert(epsg == 32700 + zone)
      // outside the exception bands the formula zone holds exactly
      val inException = (lat >= 56 && lat < 64 && lon >= 3 && lon < 12) ||
        (lat >= 72 && lat < 84)
      if (!inException)
        assert(zone == math.min(60, math.max(1, (math.floor((lon + 180) / 6) + 1).toInt)))
      // the projection of an in-band point lands at a plausible easting
      if (lat > -60 && lat <= 75) {
        val (e, n) = GeoFunctions.tmForward(lon, lat, zone, south = lat < 0)
        assert(e > -1000000 && e < 2000000, s"easting $e at $lon,$lat z$zone")
        assert(n >= -1000000 && n <= 20000000, s"northing $n")
      }
    }
  }

  test("gaps-and-islands sessionization matches brute force") {
    val gen = for {
      n <- Gen.choose(1, 40)
      gaps <- Gen.listOfN(n, Gen.choose(1L, 4000L))
    } yield gaps
    val gapThreshold = 1800L
    check("sessions", Prop.forAll(gen) { gaps =>
      val times = gaps.scanLeft(0L)(_ + _).tail
      // brute force: count boundaries where delta > threshold
      val bruteSessions = 1 + times.sliding(2).count {
        case Seq(a, b) => b - a > gapThreshold
        case _ => false
      }
      // islands formulation (same as q_sessionize): cumulative new-session flags
      val flags = times.zip(0L +: times.dropRight(1)).zipWithIndex.map {
        case ((t, prev), i) => if (i == 0 || t - prev > gapThreshold) 1 else 0
      }
      flags.sum == bruteSessions
    })
  }

  test("Lindley closed form equals the clamp recursion on random series") {
    // q_clamped_balance rests on B_t = S_t − min(0, min_{k≤t} S_k) being
    // the closed form of B_t = max(0, B_{t−1} + x_t); fuzz the identity
    // on arbitrary signed series, step by step
    val gen = Gen.listOf(Gen.choose(-50L, 50L))
    check("lindley", Prop.forAll(gen) { xs =>
      val prefix = xs.scanLeft(0L)(_ + _).drop(1)
      val runmin = prefix.scanLeft(Long.MaxValue)(math.min).drop(1)
      val closed = prefix.zip(runmin).map { case (s, m) => s - math.min(0L, m) }
      val rec = xs.scanLeft(0L)((b, x) => math.max(0L, b + x)).drop(1)
      closed == rec
    })
  }
}
