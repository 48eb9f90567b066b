package graft

import java.nio.file.Files
import java.util.Locale

import org.apache.spark.sql.functions._

/** Algebra-independence leg of the scale second voice for the three
  * permanently-skipped rehearsal oracles (q_dedup_clusters,
  * q_dedup_embedding, q_pack_sequences): plain-Scala NAIVE per-row
  * replays — pairwise union-find, all-pairs-in-bucket cosine, a
  * sequential greedy walk — verified against the engine on the base
  * corpus AND on an in-test verbatim clone with the real rehearsal
  * geometry (id + k·10_000_000; the offset is ≡ 0 mod 8, so packing
  * shards are preserved exactly as at rehearsal scale). The replays
  * share NEITHER the formulation (star edges / contraction, candidate
  * joins, window walks) NOR the system with the engine; at real
  * rehearsal scale `tools/scale_second_voice.py` runs the rep-collapsed
  * versions of the same replays, chained: naive == engine (here,
  * factor 5), rep(python) == engine (tool, factor 32/100).
  */
class DedupScaleLawSpec extends SparkSpec {

  private val CloneFactor = 5
  private val CloneOffset = 10000000L

  private lazy val baseDocs: Vector[(Long, String)] =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toVector

  private lazy val baseVecs: Vector[(Long, Array[Float])] =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1).toVector

  private lazy val cloneDir: String = {
    val dir = Files.createTempDirectory("graft_dedup_clone").toFile.getAbsolutePath
    for (t <- Seq("documents", "embeddings")) {
      val key = if (t == "documents") "doc_id" else "vec_id"
      val base = spark.read.parquet(sf("sf0.001") + s"/$t.parquet")
      (0 until CloneFactor)
        .map(k => base.withColumn(key, col(key) + lit(k * CloneOffset)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def cloneDocs: Vector[(Long, String)] =
    (0 until CloneFactor).flatMap(k =>
      baseDocs.map { case (id, t) => (id + k * CloneOffset, t) }).sortBy(_._1).toVector

  private def cloneVecs: Vector[(Long, Array[Float])] =
    (0 until CloneFactor).flatMap(k =>
      baseVecs.map { case (id, e) => (id + k * CloneOffset, e) }).sortBy(_._1).toVector

  // ------------------------------------------------------- clusters
  private val P31 = 2147483647L

  /** per-doc 16-slot MinHash signature (None when no 5-gram exists) —
    * the textbook per-document computation, not the engine's shared
    * materialized gram table. */
  private def docSig(t: String): Option[Vector[Long]] = {
    val p = t.substring(0, math.min(200, t.length)).toLowerCase(Locale.ROOT)
    if (p.length < 5) None
    else {
      val hms = (0 to p.length - 5).map { i =>
        (p(i).toLong * 294499921L + p(i + 1).toLong * 2248091L
          + p(i + 2).toLong * 17161L + p(i + 3).toLong * 131L
          + p(i + 4).toLong) % P31
      }.toSet
      Some((0 until 16).map { k =>
        val a = 104729L * (k + 1) + 12345L
        val b = 7919L * (k + 1) + 271L
        hms.map(hm => (hm * a + b) % P31).min
      }.toVector)
    }
  }

  /** naive pairwise union-find over LSH band buckets → component census
    * (canonical = min id, member count, member sum), sorted. */
  private def replayClusters(docs: Seq[(Long, String)]): Vector[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      if (r != x) parent(x) = r
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sigs = docs.map { case (id, t) => id -> docSig(t) }
    val buckets = scala.collection.mutable.Map.empty[(Int, Seq[Long]), List[Long]]
    sigs.foreach {
      case (id, Some(sig)) =>
        for (b <- 0 until 4) {
          val key = (b, sig.slice(4 * b, 4 * b + 4))
          buckets(key) = id :: buckets.getOrElse(key, Nil)
        }
      case _ => ()
    }
    buckets.values.foreach { members => // naive all-pairs, O(k^2)
      val arr = members.toArray
      for (a <- arr.indices; b <- (a + 1) until arr.length) union(arr(a), arr(b))
    }
    val comp = scala.collection.mutable.Map.empty[Long, List[Long]]
    sigs.foreach {
      case (id, Some(_)) => val r = find(id); comp(r) = id :: comp.getOrElse(r, Nil)
      case (id, None) => comp(id) = List(id)
    }
    comp.values.map(ids => (ids.min, ids.length.toLong, ids.sum))
      .toVector.sortBy(_._1)
  }

  private def engineClusters(dir: String): Vector[(Long, Long, Long)] =
    SparkEntry.queries("q_dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector

  test("q_dedup_clusters: naive pairwise union-find matches the engine on the base corpus") {
    assert(engineClusters(sf("sf0.001")) == replayClusters(baseDocs))
  }

  test("q_dedup_clusters: naive replay matches the engine's star-edge/contraction path on a verbatim clone") {
    assert(engineClusters(cloneDir) == replayClusters(cloneDocs))
  }

  // ------------------------------------------------------ embedding
  private def replayEmbedding(vecs: Seq[(Long, Array[Float])]): Vector[(Long, Long, Long)] = {
    val qes = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1000000).toLong)
    }
    def bucket(qe: Array[Long]): Long = (0 until 8).map { p =>
      var s = 0L
      var i = 0
      while (i < qe.length) {
        s += qe(i) * ((1103515245L * (p * 97 + i + 1) + 12345L) % 2097152L - 1048576L)
        i += 1
      }
      if (s >= 0) 1L << p else 0L
    }.sum
    val pairs = qes.groupBy { case (_, qe) => bucket(qe) }.values.flatMap { ms =>
      val arr = ms.sortBy(_._1).toArray
      for {
        a <- arr.indices
        b <- (a + 1) until arr.length
      } yield {
        val dot = arr(a)._2.zip(arr(b)._2).map { case (x, y) => x * y }.sum
        val n1 = arr(a)._2.map(q => q * q).sum
        val n2 = arr(b)._2.map(q => q * q).sum
        // the engine's exact IEEE order: dot / sqrt(double(n1)*n2) * 1e6
        val c = math.floor(dot / math.sqrt(n1.toDouble * n2.toDouble) * 1000000.0).toLong
        (arr(a)._1, arr(b)._1, c)
      }
    }
    pairs.filter(_._3 >= 150000L).toVector
      .sortBy { case (v1, v2, c) => (-c, v1, v2) }.take(200)
  }

  private def engineEmbedding(dir: String): Vector[(Long, Long, Long)] =
    SparkEntry.queries("q_dedup_embedding")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector

  test("q_dedup_embedding: naive all-pairs-in-bucket replay matches the engine on the base corpus") {
    assert(engineEmbedding(sf("sf0.001")) == replayEmbedding(baseVecs))
  }

  test("q_dedup_embedding: naive replay matches the engine on a verbatim clone (top-200 under clique blowup)") {
    assert(engineEmbedding(cloneDir) == replayEmbedding(cloneVecs))
  }

  // -------------------------------------------------------- packing
  private def replayPack(docs: Seq[(Long, String)]): Vector[(Long, Long, Long, Long)] = {
    val state = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    docs.sortBy(_._1).map { case (id, t) =>
      val tok = (t.length / 4).toLong
      val shard = id % 8
      val next = state.get(shard) match {
        case None => (0L, tok)
        case Some((bin, fill)) =>
          if (fill + tok > 2048L) (bin + 1, tok) else (bin, fill + tok)
      }
      state(shard) = next
      (id, shard, next._1, tok)
    }.toVector
  }

  private def enginePack(dir: String): Vector[(Long, Long, Long, Long)] =
    SparkEntry.queries("q_pack_sequences")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toVector

  test("q_pack_sequences: sequential greedy walk matches the engine on the base corpus") {
    assert(enginePack(sf("sf0.001")) == replayPack(baseDocs))
  }

  test("q_pack_sequences: sequential walk matches the engine on a verbatim clone (bin state crosses copy blocks)") {
    assert(enginePack(cloneDir) == replayPack(cloneDocs))
  }

  // ----------------------------------------------- substring dedup
  /** naive per-doc replay: token lists, 15-token gram -> doc-set map,
    * duplicated positions, interval-union coverage — plain collections,
    * no windows, no joins. */
  private def replaySubstring(docs: Seq[(Long, String)]): Vector[(Long, Long, Long, Long, Long)] = {
    val tokPat = "[a-z0-9]+".r
    val toks: Vector[(Long, Vector[String])] = docs.map { case (id, t) =>
      id -> tokPat.findAllIn(t.toLowerCase(Locale.ROOT)).toVector
    }.toVector
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, tk) =>
      if (tk.length >= 15)
        (0 to tk.length - 15).foreach { i =>
          val g = tk.slice(i, i + 15).mkString(" ")
          gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
        }
    }
    toks.sortBy(_._1).map { case (id, tk) =>
      val dupPos = if (tk.length < 15) Vector.empty[Int]
      else (0 to tk.length - 15).filter { i =>
        gramDocs(tk.slice(i, i + 15).mkString(" ")).size >= 2
      }.toVector
      var covered = 0L
      var islands = 0L
      var start = -1
      var last = -1
      dupPos.foreach { p =>
        if (start < 0 || p - last > 15) {
          if (start >= 0) covered += last - start + 15
          start = p; islands += 1
        }
        last = p
      }
      if (start >= 0) covered += last - start + 15
      val n = tk.length.toLong
      (id, n, dupPos.length.toLong, covered,
        covered * 1000000L / math.max(n, 1L))
    }
  }

  private def engineSubstring(dir: String): Vector[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("q_dedup_substring")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector

  test("q_dedup_substring: naive span-coverage replay matches the engine on the base corpus") {
    assert(engineSubstring(sf("sf0.001")) == replaySubstring(baseDocs))
  }

  test("q_dedup_substring: naive replay matches the engine on a verbatim clone (every span duplicated)") {
    assert(engineSubstring(cloneDir) == replaySubstring(cloneDocs))
  }
}
