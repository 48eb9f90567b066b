package graft

import org.apache.spark.sql.functions._

/** Third-voice replays for the clustering family (the r11 cross-check
  * pattern, extended per the r11 verdict): the DuckDB differential proves
  * Spark and DuckDB agree on one algebraic formulation, so these tests
  * re-derive the same answers from implementations that share NO code with
  * either engine — plain driver-side Scala over the collected raw arrays:
  * Lloyd assignment + centroid updates (q_kmeans), PQ block coding
  * (q_pq_codes), the SemDeDup greedy keep (q_semdedup), and the grid-
  * DBSCAN union-find (q_dbscan_cells) — demanding exact cell-for-cell
  * equality against the registered queries.
  *
  * Arithmetic discipline mirrors the engines': quantize floor(x·10⁶) via
  * one float→double widening, exact Long distance/dot accumulation, and
  * the same IEEE expression-tree order for every double division.
  */
class ClusteringCrossCheckSpec extends SparkSpec {

  private def dir = sf("sf0.001")

  /** (vec_id ascending) -> raw float embedding, collected once. */
  private lazy val vecs: Vector[(Long, Array[Float])] = {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
    rows.map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray))
      .sortBy(_._1).toVector
  }

  private def q6(e: Array[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 1000000.0).toLong)

  private def sqDist(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  test("q_kmeans: Lloyd rounds replayed driver-side, members and centroids exact") {
    val qv = vecs.map { case (id, e) => (id, q6(e)) }
    def assign(cent: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      qv.map { case (id, q) =>
        val (cid, d) = cent.map { case (c, cq) => (c, sqDist(q, cq)) }
          .minBy { case (c, d) => (d, c) }
        id -> (cid, d)
      }.toMap
    def recompute(members: Map[Long, (Long, Long)]): Seq[(Long, Array[Long])] = {
      val byC = qv.groupBy { case (id, _) => members(id)._1 }
      byC.toSeq.sortBy(_._1).map { case (cid, vs) =>
        val dim = vs.head._2.length
        val cq = (0 until dim).map { i =>
          val s = vs.map(_._2(i)).sum
          // engine: floor(sum(qe) * 1.0 / count) — one widening, one
          // correctly-rounded division, one floor
          math.floor(s.toDouble * 1.0 / vs.length.toDouble).toLong
        }.toArray
        (cid, cq)
      }
    }
    val c0 = qv.take(4).map { case (id, q) => (id, q) }
    val m1 = assign(c0)
    val c1 = recompute(m1)
    val m2 = assign(c1)
    val c2 = recompute(m2)

    val (membersDf, centDf) = pipeline.Clustering.kmeans(
      Tables.embeddings(spark, dir), k = 4, iters = 2)
    val gotMembers = membersDf.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotMembers == m2, "final-round assignment diverged from the replay")
    val gotCent = centDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    assert(gotCent.length == c2.length)
    gotCent.zip(c2).foreach { case ((gc, gq), (rc, rq)) =>
      assert(gc == rc && gq.sameElements(rq), s"centroid $gc diverged")
    }
  }

  test("q_pq_codes: block coding + reconstruction error replayed exactly") {
    val qv = vecs.map { case (id, e) => (id, q6(e)) }
    val codebook = qv.take(4).map { case (id, q) =>
      (id, (0 until 4).map(b => q.slice(16 * b, 16 * b + 16)).toArray)
    }
    val replay = qv.map { case (id, q) =>
      val perBlock = (0 until 4).map { b =>
        val sub = q.slice(16 * b, 16 * b + 16)
        codebook.map { case (code, subs) => (code, sqDist(sub, subs(b))) }
          .minBy { case (c, d) => (d, c) }
      }
      (id, perBlock.map(_._1).toVector, perBlock.map(_._2).sum)
    }.toVector
    val got = SparkEntry.queries("q_pq_codes")(spark, dir).collect()
      .map(r => (r.getLong(0),
        Vector(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        r.getLong(5))).toVector
    assert(got == replay, "PQ codes/reconstruction diverged from the replay")
  }

  test("q_semdedup: greedy keep-lowest-id replayed per cluster, exact") {
    val slice = vecs.filter(_._1 < 4096).map { case (id, e) => (id, q6(e)) }
    val cents = slice.filter(_._1 < 8)
    // assignment: max dot, tie -> lowest cid (engine windows by
    // dot DESC, cid ASC)
    val cluster = slice.map { case (id, q) =>
      val cid = cents.map { case (c, cq) => (c, dot(q, cq)) }
        .maxBy { case (c, dd) => (dd, -c) }._1
      id -> cid
    }.toMap
    val n2 = slice.map { case (id, q) => id -> dot(q, q) }.toMap
    val byCluster = slice.groupBy { case (id, _) => cluster(id) }
    val result = byCluster.toSeq.sortBy(_._1).map { case (c, vs) =>
      val ids = vs.map(_._1).sorted
      val qOf = vs.toMap
      val dropped = ids.filter { v2 =>
        ids.exists { v1 =>
          v1 < v2 && {
            val dd = dot(qOf(v1), qOf(v2))
            // engine tree: floor(dot / sqrt(n21.double * n22) * 1e6)
            math.floor(dd.toDouble
              / math.sqrt(n2(v1).toDouble * n2(v2).toDouble)
              * 1000000.0) >= 300000.0
          }
        }
      }.toSet
      val kept = ids.filterNot(dropped)
      (c, ids.length.toLong, dropped.size.toLong, kept.length.toLong, kept.sum)
    }
    val got = SparkEntry.queries("q_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == result, "SemDeDup per-cluster keep census diverged")
  }

  test("q_dbscan_cells: core-cell union-find replayed, components exact") {
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val cellCounts = keys.map { k =>
      val m = k % 1000
      val cx = (m * m * 3 % 360) / 10
      val cy = (m * m * 7 % 160) / 10
      cx * 1000 + cy
    }.groupBy(identity).map { case (cell, a) => cell -> a.length.toLong }
    val core = cellCounts.filter(_._2 >= 5)
    // union-find over 4-adjacency (+1 in y, +1000 in x — both directions
    // come from symmetry of the union operation)
    val parent = scala.collection.mutable.Map(core.keys.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    core.keys.foreach { c =>
      Seq(1L, 1000L).foreach { d => if (core.contains(c + d)) union(c, c + d) }
    }
    val replay = core.keys.toSeq.groupBy(find).toSeq
      .map { case (root, cells) =>
        // canonical id is the MIN cell label in the component
        (cells.min, cells.length.toLong, cells.map(core).sum)
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_dbscan_cells")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == replay, "DBSCAN component census diverged from union-find")
  }
}
