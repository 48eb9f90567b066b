package graft

import org.apache.spark.sql.functions._

/** The q_pca_power_iter floor-rescale above 2^53: the centered moment
  * n*Sxy - Sx*Sy is 128-bit, and a double-based floor there would be
  * engine-divergent (DuckDB's HUGEINT->DOUBLE composes two roundings and
  * is not correctly rounded, Spark's BigDecimal.doubleValue is — a 1-ULP
  * difference flips a FLOOR and cascades through the ten squarings).
  * The engine therefore rescales in pure integer space via
  * floor(c*S/m) = (c+m)*S div m - S. This spec pins the >2^53 regime:
  * a 100k-row 2-dim fixture whose moments reach ~1e16 (> 2^53 ≈ 9.0e15),
  * verified against an exact BigInt replay of the whole pipeline —
  * moments, eleven shift-rescales, ten matrix squarings, the row-sum.
  */
class PcaRescaleSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000
  private val Dims = 2

  /** Deterministic ±1.0 signs from two decorrelated hash streams —
    * moments land on non-round integers so the rescale divisions are
    * generically inexact (a floor-flip cannot hide behind exactness). */
  private def sign(i: Long, stream: Long): Float = {
    val h = (i * 2654435761L + stream * 40503L) * -7046029254386353131L
    if (((h >>> 17) & 1L) == 0L) 1.0f else -1.0f
  }

  private lazy val fixture: (String, Vector[Array[Long]]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pca53").toString
    val rows = (0 until N).map { i =>
      (i.toLong, Array.tabulate(Dims)(d => sign(i.toLong, d.toLong + 1)))
    }
    rows.toDF("vec_id", "embedding")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val xs = rows.map { case (_, e) =>
      e.map(v => math.floor(v.toDouble * 1000).toLong)
    }.toVector
    (dir, xs)
  }

  /** floor(v*S/m) via the engine's shift identity, exact in BigInt. */
  private def rescale(m: Array[Array[BigInt]], scale: Long): Array[Array[BigInt]] = {
    val mx = m.flatten.map(_.abs).max
    m.map(_.map(c =>
      if (mx == 0) BigInt(0) else (c + mx) * scale / mx - scale))
  }

  private def replay(xs: Vector[Array[Long]]): Vector[(Long, Long)] = {
    val n = BigInt(xs.length)
    val sx = Array.tabulate(Dims)(i => BigInt(xs.map(_(i)).sum))
    val sxy = Array.tabulate(Dims, Dims)((i, j) =>
      BigInt(xs.map(x => x(i) * x(j)).sum))
    val cov = Array.tabulate(Dims, Dims)((i, j) => n * sxy(i)(j) - sx(i) * sx(j))
    assert(cov.flatten.map(_.abs).max > BigInt(2).pow(53),
      "fixture must place the centered moment above 2^53 or it tests nothing")
    var c = rescale(cov, 100000000L)
    for (_ <- 1 to 10) {
      val p = Array.tabulate(Dims, Dims)((i, j) =>
        (0 until Dims).map(k => c(i)(k) * c(k)(j)).sum)
      c = rescale(p, 100000000L)
    }
    val w = Array(Array.tabulate(Dims)(i => c(i).sum))
    val v = rescale(w, 1000000L)(0)
    (0 until Dims).map(i => ((i + 1).toLong, v(i).toLong)).toVector
  }

  test("q_pca_power_iter matches an exact BigInt replay with moments above 2^53") {
    val (dir, xs) = fixture
    val got = SparkEntry.queries("q_pca_power_iter")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector.sortBy(_._1)
    assert(got == replay(xs),
      s"engine $got diverged from the exact integer replay ${replay(xs)}")
  }
}
