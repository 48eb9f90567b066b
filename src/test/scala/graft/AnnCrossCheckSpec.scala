package graft

import org.apache.spark.sql.functions._

/** Exact driver-side replay of q_ann_recall_at_k: quantization, LCG
  * hyperplane projections, two 4-bit bucket tables, exact cosine top-5,
  * LSH-candidate top-5, and the recall readout — all recomputed with
  * plain Scala arrays and compared cell-for-cell. Pins the QDot
  * expression, the bucket plumbing, and the tie contracts against an
  * implementation with no Spark or SQL in it.
  */
class AnnCrossCheckSpec extends SparkSpec {

  test("ann recall@5 equals a plain-scala replay of the whole pipeline") {
    val dir = sf("sf0.001")
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(e => math.floor(e.toDouble * 1000000).toLong).toArray)
      .toMap
    // two 4-bit tables from 8 LCG hyperplanes
    def buckets(qe: Array[Long]): Map[Long, Long] =
      (0 until 8).map { p =>
        val s = qe.zipWithIndex.map { case (e, i) =>
          e * (((1103515245L * (p * 97 + i + 1) + 12345L) % 2097152L) - 1048576L)
        }.sum
        (p / 4).toLong -> (if (s >= 0) 1L << (p % 4) else 0L)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tbl = vecs.view.mapValues(buckets).toMap
    val norms = vecs.view.mapValues(v => v.map(e => e * e).sum).toMap
    def cosQ6(q: Long, c: Long): Long = {
      val dot = vecs(q).zip(vecs(c)).map { case (a, b) => a * b }.sum
      math.floor(dot / math.sqrt(norms(q).toDouble * norms(c).toDouble) * 1000000).toLong
    }
    def top5(q: Long, pool: Iterable[Long]): Seq[Long] =
      pool.toSeq.map(c => (c, cosQ6(q, c)))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1)
    val got = SparkEntry.queries("q_ann_recall_at_k")(spark, dir).collect()
    assert(got.length == 8)
    for (r <- got) {
      val q = r.getAs[Long]("qid")
      val others = vecs.keys.filter(_ != q)
      val cand = others.filter(c =>
        (0L to 1L).exists(t => tbl(c)(t) == tbl(q)(t)))
      val hits = top5(q, cand).toSet.intersect(top5(q, others).toSet).size.toLong
      assert(r.getAs[Long]("n_candidates") == cand.size.toLong,
        s"q$q candidates ${r.getAs[Long]("n_candidates")} vs ${cand.size}")
      assert(r.getAs[Long]("n_hits") == hits, s"q$q hits ${r.getAs[Long]("n_hits")} vs $hits")
      assert(r.getAs[Long]("recall_q6") == hits * 1000000L / 5)
    }
  }
}
