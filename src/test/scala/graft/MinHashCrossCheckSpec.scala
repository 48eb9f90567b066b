package graft

import org.apache.spark.sql.functions._

/** Third-voice replays for the MinHash-LSH dedup family, from raw text in
  * plain driver-side Scala: 5-char shingle hashes, 16 minhash components,
  * 4x4 band keys, candidate pairs, and cluster formation via UNION-FIND —
  * a third algorithm for the components, independent of BOTH the engine's
  * two-phase min-label propagation AND the oracle's recursive transitive
  * closure. Exact equality demanded throughout.
  *
  * The hash constants (gram coefficient vector, minhash affine family,
  * P = 2^31-1) are part of the cross-engine contract, so the replay uses
  * the same numbers — what it does NOT share is any of the machinery:
  * no Catalyst expression, no SQL, no label propagation.
  */
class MinHashCrossCheckSpec extends SparkSpec {

  private val P = 2147483647L
  private val Coef = Array(294499921L, 2248091L, 17161L, 131L, 1L)
  private val A = (0 until 16).map(i => 104729L * (i + 1) + 12345L)
  private val B = (0 until 16).map(i => 7919L * (i + 1) + 271L)

  private lazy val docs: Vector[(Long, String)] =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toVector

  private def hash5(g: String): Long = {
    var acc = 0L; var i = 0; var k = 0
    while (k < 5 && i < g.length) {
      val cp = g.codePointAt(i)
      acc += cp.toLong * Coef(k)
      i += Character.charCount(cp); k += 1
    }
    acc % P
  }

  /** doc -> 16-component signature over DISTINCT 5-gram hashes of the
    * lowercased 200-char prefix (docs shorter than 5 chars drop). */
  private lazy val signatures: Map[Long, Vector[Long]] =
    docs.flatMap { case (id, text) =>
      val t = text.toLowerCase(java.util.Locale.ROOT).take(200)
      if (t.length < 5) None
      else {
        val hms = (0 to t.length - 5).map(i => hash5(t.substring(i, i + 5))).distinct
        Some(id -> (0 until 16).map(i => hms.map(h => (h * A(i) + B(i)) % P).min).toVector)
      }
    }.toMap

  test("q_dedup_minhash: 16-component signatures replayed from raw text, exact") {
    val got = SparkEntry.queries("q_dedup_minhash")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
    assert(got == signatures, "minhash signature table diverged from the replay")
  }

  /** (doc1, doc2) -> number of fully-matching 4-row bands. */
  private lazy val candidatePairs: Map[(Long, Long), Long] = {
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Set[Int]]
    for (b <- 0 until 4) {
      signatures.toSeq.groupBy { case (_, sig) => sig.slice(4 * b, 4 * b + 4) }
        .values.filter(_.size > 1).foreach { bucket =>
          val ids = bucket.map(_._1).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.length) {
            val k = (ids(i), ids(j))
            pairs(k) = pairs.getOrElse(k, Set.empty) + b
          }
        }
    }
    pairs.map { case (k, bs) => k -> bs.size.toLong }.toMap
  }

  test("q_dedup_lsh_pairs: band-bucket candidate pairs replayed, exact") {
    val replay = candidatePairs.toSeq
      .map { case ((d1, d2), n) => (d1, d2, n) }
      .sortBy { case (d1, d2, _) => (d1, d2) }
    val got = SparkEntry.queries("q_dedup_lsh_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == replay, "LSH candidate pairs diverged from the replay")
  }

  test("q_dedup_clusters: components re-derived by union-find, exact") {
    // third algorithm: union-find — independent of the engine's min-label
    // propagation AND the oracle's recursive closure
    val parent = scala.collection.mutable.Map(docs.map { case (id, _) => id -> id }: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    candidatePairs.keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val replay = docs.map(_._1).groupBy(find).toSeq
      .map { case (_, members) =>
        (members.min, members.length.toLong, members.sum)
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_dedup_clusters")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == replay, "dedup cluster census diverged from union-find")
  }
}
