package graft

import org.apache.spark.sql.functions._

/** Second graph batch of driver-side exact replays: triangle census,
  * BFS frontiers, Bellman-Ford relaxation, HITS half-rounds with the
  * max-normalization contract, and synchronous min-tie-break label
  * propagation — all recomputed with plain collections from the same
  * deterministic link graph and compared cell-for-cell.
  */
class GraphCrossCheck2Spec extends SparkSpec {

  private def graph(dir: String): (Seq[Long], Seq[(Long, Long)]) = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val n = docs.length.toLong
    (docs, docs.flatMap(src => (1 to 3).map(j => (src, (src * 7 + j) % n))))
  }

  private def undirected(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct

  test("triangle census equals a brute-force wedge check") {
    val (_, edges) = graph(sf("sf0.001"))
    val ue = undirected(edges)
    val ueSet = ue.toSet
    val deg = ue.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val byA = ue.groupBy(_._1)
    val tris = byA.values.map { g =>
      val bs = g.map(_._2).sorted
      bs.combinations(2).count(p => ueSet((p(0), p(1)))).toLong
    }.sum
    val r = SparkEntry.queries("q_triangle_count")(spark, sf("sf0.001"))
      .collect().head
    assert(r.getAs[Long]("n_vertices") == deg.size.toLong)
    assert(r.getAs[Long]("n_edges") == ue.length.toLong)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == tris)
    assert(r.getAs[Long]("clustering_q6") ==
      math.floor((3000000L * tris).toDouble / wedges.toDouble).toLong)
  }

  test("bfs frontier census equals a driver-side frontier walk") {
    val (_, edges) = graph(sf("sf0.001"))
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var seen = Set(0L); var frontier = Set(0L)
    val expected = scala.collection.mutable.ListBuffer((0L, 1L, 0L))
    for (hop <- 1 to 3) {
      frontier = frontier.flatMap(v => out.getOrElse(v, Seq.empty)) -- seen
      seen ++= frontier
      expected += ((hop.toLong, frontier.size.toLong, frontier.sum))
    }
    val got = SparkEntry.queries("q_bfs_reach")(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("sum_ids"))).toSeq
    assert(got == expected.toSeq)
  }

  test("bellman-ford distances equal a driver-side relaxation") {
    val (_, edges) = graph(sf("sf0.001"))
    val we = edges.map { case (s, d) => (s, d, (s * 31 + d * 17) % 97 + 1) }
    var dist = Map(0L -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = we.flatMap { case (s, d, w) =>
        dist.get(s).map(x => d -> (x + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val expected = dist.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_shortest_path")(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dist"))).toSeq
    assert(got == expected)
  }

  test("hits equals a driver-side max-normalized half-round recursion") {
    val (docs, edges) = graph(sf("sf0.001"))
    def half(prev: Map[Long, Long], in: Boolean): Map[Long, Long] = {
      // in=true: auth(v) = sum over u->v of prev(u); else hub side
      val raw = edges.groupBy(e => if (in) e._2 else e._1).view.mapValues { g =>
        g.map(e => prev(if (in) e._1 else e._2)).sum
      }.toMap
      val m = raw.values.max
      docs.map(v => v -> raw.get(v)
        .map(x => math.floor(x * 1000000.0 / m).toLong).getOrElse(0L)).toMap
    }
    val h0 = docs.map(_ -> 1000000L).toMap
    val a1 = half(h0, in = true); val h1 = half(a1, in = false)
    val a2 = half(h1, in = true); val h2 = half(a2, in = false)
    val expected = docs.map(v => (v, a2(v), h2(v)))
      .sortBy { case (v, a, _) => (-a, v) }.take(20)
    val got = SparkEntry.queries("q_hits")(spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("auth_q6"),
        r.getAs[Long]("hub_q6"))).toSeq
    assert(got == expected)
  }

  test("label propagation communities equal a synchronous driver replay") {
    val (docs, edges) = graph(sf("sf0.001"))
    val ue = undirected(edges)
    val adj = (ue ++ ue.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var lbl = docs.map(v => v -> v).toMap
    for (_ <- 1 to 2) {
      lbl = docs.map { v =>
        val nbrs = adj.getOrElse(v, Seq.empty)
        if (nbrs.isEmpty) v -> lbl(v)
        else {
          val counts = nbrs.map(lbl).groupBy(identity).view
            .mapValues(_.length.toLong).toSeq
          v -> counts.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    val expected = lbl.toSeq.groupBy(_._2).map { case (c, g) =>
      (c, g.length.toLong, g.map(_._1).min)
    }.toSeq.sortBy { case (c, n, _) => (-n, c) }.take(25)
    val got = SparkEntry.queries("q_label_propagation")(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Long]("community"),
        r.getAs[Long]("n_members"), r.getAs[Long]("min_doc"))).toSeq
    assert(got == expected)
  }
}
