package graft

import graft.pipeline.{Clustering, Corpus, CorpusTokenizers}
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Specs for the round-4 corpus-shaping family: TF-IDF, quality filters,
  * PII scrubbing, k-means, bloom pre-join. The oracle gate checks the
  * full queries; these specs pin the algebra on hand-computable inputs
  * and the scale-posture invariants the oracle can't see. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def byName(name: String, dir: String = "sf0.001") =
    SparkEntry.queries(name)(spark, sf(dir))

  test("tfidf: rarer terms outscore common terms at equal tf") {
    // idf odds (N - df + 0.5)/(df + 0.5) strictly decreases in df, so at
    // equal tf a rarer term must strictly outrank a more common one
    val rows = byName("q_tfidf_top_terms")
      .select($"doc_id", $"rk", $"tf", $"df", $"score").as[(Long, Long, Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.values.foreach { perDoc =>
      val sorted = perDoc.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, tf1, df1, s1), (_, _, tf2, df2, s2)) =>
          assert(s1 >= s2) // rank order == score order
          if (tf1 == tf2 && df1 < df2) assert(s1 > s2)
        case _ =>
      }
    }
  }

  test("gopher signals: repetitive and tiny docs are dropped, diverse kept") {
    val docs = Seq(
      (1L, ("spam " * 50).trim),                        // one token repeated: top_share = 1e6
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")),   // all-distinct, 60 tokens
      (3L, "too short")                                 // < 20 tokens
    ).toDF("doc_id", "text")
    // run the same signal algebra on the synthetic docs
    val tc = docs.select($"doc_id",
        explode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("cnt"))
    val sig = tc.groupBy($"doc_id").agg(
      sum($"cnt").as("n_tokens"), count(lit(1)).as("n_distinct"), max($"cnt").as("top_cnt"))
    val keep = sig.select($"doc_id",
      ($"n_tokens" >= 20 &&
        floor($"n_distinct" * lit(1000000.0) / $"n_tokens").cast("long") >= 200000 &&
        floor($"top_cnt" * lit(1000000.0) / $"n_tokens").cast("long") <= 200000).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("pii redaction leaves no live email or phone pattern behind") {
    val out = byName("q_pii_redact").select($"redacted", $"n_emails", $"n_phones")
      .as[(String, Long, Long)].collect()
    assert(out.length == 100)
    out.foreach { case (red, ne, np) =>
      assert(ne == 1 && np == 1) // one of each synthesized per row
      assert(!red.contains("@"), red)
      assert(!red.matches(".*\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}.*"), red)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"), red)
    }
  }

  test("domain cap keeps at most 10 docs per source, lowest ids first") {
    val rows = byName("q_domain_cap")
      .select($"source", $"doc_id", $"rk", $"n_source")
      .as[(String, Long, Long, Long)].collect()
    val bySource = rows.groupBy(_._1)
    bySource.values.foreach { g =>
      assert(g.length <= 10)
      assert(g.length == math.min(10, g.head._4))
      // kept ids are exactly the group's smallest, ranked in order
      val ids = g.sortBy(_._3).map(_._2)
      assert(ids.sorted.sameElements(ids))
    }
  }

  test("inverted index postings are sorted, unique, and df-consistent") {
    val rows = byName("q_inverted_index")
      .select($"t", $"df", $"postings_head").as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, dfv, postings) =>
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length == math.min(10, dfv))
      assert(ids.distinct.length == ids.length)
      assert(ids.sorted.sameElements(ids))
    }
  }

  test("ewma fold matches a driver-side reference recursion on the same data") {
    // the risky part of the distributed EWMA is the secondary sort + key
    // transition handling, so cross-check the full Spark output against a
    // plain in-memory recursion over identically-ordered rows
    val d = sf()
    val got = byName("q_ewma")
      .select($"user_id", $"n_events", $"ewma_final", $"n_spikes")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val rows = Tables.events(spark, d).filter($"user_id" < 40)
      .select($"user_id", unix_micros($"ts"), $"event_id",
        floor($"value" * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val ref = rows.groupBy(_._1).map { case (u, rs) =>
      var s = 0L; var spikes = 0L; var n = 0L
      rs.foreach { case (_, _, _, x) =>
        if (n == 0) s = x
        else {
          if (math.abs(x - s) > 500) spikes += 1
          s = math.floor((16.0 * x + 48.0 * s) / 64.0).toLong
        }
        n += 1
      }
      u -> ((n, s, spikes))
    }
    assert(got.keySet == ref.keySet && got.nonEmpty)
    ref.foreach { case (u, (n, s, spikes)) =>
      val (gn, gs, gsp) = (got(u)._1, got(u)._2, got(u)._3)
      assert((gn, gs, gsp) == ((n, s, spikes)), s"user $u: got ${got(u)}, ref ($n,$s,$spikes)")
    }
  }

  test("pagerank matches a driver-side power iteration on the same graph") {
    val docs = Tables.documents(spark, sf())
    val n = docs.count()
    val got = graft.pipeline.Graphs.pageRank(docs, iters = 3)
      .as[(Long, Long)].collect().toMap
    // reference: same integer recursion, dense driver-side
    var ranks = Map.empty[Long, Long].withDefaultValue(1000000L)
    val ids = (0L until n)
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      ids.foreach { src =>
        val c = math.floor(ranks(src) * 850000.0 / 3000000.0).toLong
        (1 to 3).foreach(j => contrib((src * 7 + j) % n) += c)
      }
      ranks = ids.map(i => i -> (150000L + contrib(i))).toMap.withDefaultValue(1000000L)
    }
    assert(got.size == n)
    ids.foreach(i => assert(got(i) == ranks(i), s"node $i: got ${got(i)}, ref ${ranks(i)}"))
  }

  test("kmeans: two obvious blobs separate; inertia never increases") {
    // 2 tight clusters around (0.1.., ) and (0.9..): ids 0,1 seed them
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.1f else 0.9f
      (i.toLong, Array.fill(8)(base + (i / 1000.0f)))
    }.toDF("vec_id", "embedding")
    val (members, cent) = Clustering.kmeans(vecs, k = 2, iters = 3)
    val got = members.select($"vec_id", $"cid").as[(Long, Long)].collect().toMap
    (0 until 20).foreach { i =>
      assert(got(i.toLong) == (if (i % 2 == 0) 0L else 1L))
    }
    assert(cent.count() == 2)
    // Lloyd monotonicity on the real table: total inertia(iter 2) ≤ iter 1
    val emb = Tables.embeddings(spark, sf())
    def inertia(iters: Int): Long =
      Clustering.kmeans(emb, 4, iters)._1.agg(sum($"dist")).as[Long].head()
    assert(inertia(2) <= inertia(1))
  }

  test("semdedup: dropped iff a lower-id same-cluster member clears the threshold") {
    // driver-side reference of the full greedy-keeper semantics at sf0.01
    // (500 vectors — trivially collectable in a test)
    val emb = Tables.embeddings(spark, sf("sf0.01")).filter($"vec_id" < 4096)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val qs = emb.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1000000).toLong)
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map(_ * _).sum
    val cents = emb.map(_._1).filter(_ < 8).map(id => id -> qs(id))
    val cluster = emb.map { case (id, _) =>
      id -> cents.map { case (cid, cq) => (dot(qs(id), cq), cid) }
        .minBy { case (d, cid) => (-d, cid) }._2
    }.toMap
    def cos(a: Long, b: Long): Long =
      math.floor(dot(qs(a), qs(b)) /
        math.sqrt(dot(qs(a), qs(a)).toDouble * dot(qs(b), qs(b))) * 1000000).toLong
    val byClusterIds = emb.map(_._1).groupBy(cluster)
    val refDropped = byClusterIds.map { case (c, ids) =>
      val sorted = ids.sorted
      c -> sorted.filter(v => sorted.exists(u => u < v && cos(u, v) >= 300000)).toSet
    }
    val out = byName("q_semdedup", "sf0.01")
      .select($"cluster", $"n_members", $"n_dropped", $"n_kept", $"kept_id_sum")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == byClusterIds.size)
    out.foreach { case (c, nm, nd, nk, ks) =>
      val ids = byClusterIds(c)
      assert(nm == ids.length, s"cluster $c membership")
      assert(nd == refDropped(c).size, s"cluster $c dropped count")
      assert(nk == nm - nd)
      assert(ks == (ids.toSet -- refDropped(c)).sum, s"cluster $c keeper ids")
    }
    assert(out.map(_._3).sum > 0, "threshold never fired — fixture too sparse")
  }

  test("pq codes: codebook vectors reconstruct exactly; codes stay in range") {
    val rows = byName("q_pq_codes")
      .select($"vec_id", $"code0", $"code1", $"code2", $"code3", $"recon_err")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, c0, c1, c2, c3, err) =>
      assert(Seq(c0, c1, c2, c3).forall(c => c >= 0 && c < 4))
      assert(err >= 0)
      // a codebook vector's own blocks are in the codebook → zero error
      // and self-codes (ties broken toward the lowest code id)
      if (id < 4) {
        assert(err == 0, s"codebook vector $id must reconstruct exactly")
        assert(Seq(c0, c1, c2, c3).forall(_ <= id),
          s"vector $id coded by a higher id than itself")
      }
    }
  }

  test("bloom pre-join: no false negatives, and the prefilter is selective") {
    val d = sf()
    val small = Tables.orders(spark, d)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 200000)
      .select($"o_orderkey")
    val big = Tables.lineitem(spark, d).select($"l_orderkey", $"l_quantity")
    val exact = big.join(small, $"l_orderkey" === $"o_orderkey").count()
    val viaBloom = BloomJoin.bloomJoin(big, $"l_orderkey", small, $"o_orderkey").count()
    assert(viaBloom == exact)
    // the prefilter alone must pass a strict subset of the fact table
    // (false-positive rate bounded — this is the shuffle-volume guarantee)
    val bloom = BloomJoin.bloomOf(small, $"o_orderkey", 100000L)
    val passed = big.filter(BloomJoin.mightContain(bloom, $"l_orderkey")).count()
    val total = big.count()
    val matching = big.join(small, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    assert(passed >= matching)        // no false negatives
    assert(passed < total / 2, s"prefilter not selective: $passed of $total")
  }

  test("bpe merge round: window-island apply == sequential greedy scan (fuzz)") {
    // q_bpe_merges applies each merge with gaps-and-islands window algebra
    // (even offsets within islands of consecutive matching boundaries);
    // this fuzz pins that formulation to the textbook sequential greedy
    // left-to-right non-overlapping scan on run-heavy random docs — the
    // chain case ("aaaa" under merge (a,a)) is exactly where a naive
    // non-overlap regex/replace formulation goes wrong
    def greedyApply(toks: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    def refRound(docs: Map[Long, Vector[String]])
        : ((String, String, Long), Map[Long, Vector[String]]) = {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.values.foreach { tk =>
        tk.indices.dropRight(1).foreach { i =>
          counts((tk(i), tk(i + 1))) = counts.getOrElse((tk(i), tk(i + 1)), 0L) + 1
        }
      }
      val ((ba, bb), bn) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      ((ba, bb, bn), docs.map { case (id, tk) => id -> greedyApply(tk, ba, bb) })
    }
    val rnd = new scala.util.Random(42)
    // alphabet weighted toward 'a' to force long equal-token runs
    var docs: Map[Long, Vector[String]] = (0L until 150L).map { id =>
      id -> Vector.fill(1 + rnd.nextInt(14))("aaabbc" (rnd.nextInt(6)).toString)
    }.toMap
    var sparkToks = docs.toSeq
      .flatMap { case (id, tk) => tk.zipWithIndex.map { case (t, i) => (id, (i + 1).toLong, t) } }
      .toDF("doc_id", "i", "t")
    (1 to 3).foreach { r =>
      val ((ba, bb, bn), refApplied) = refRound(docs)
      val (stat, applied) = CorpusTokenizers.bpeMergeRound(r, sparkToks)
      val st = stat.collect().head
      assert((st.getAs[String]("lhs"), st.getAs[String]("rhs"), st.getAs[Long]("n_pair"))
        === ((ba, bb, bn)), s"round $r argmax diverged")
      assert(st.getAs[Long]("n_tokens_after") === refApplied.values.map(_.size.toLong).sum,
        s"round $r token count diverged")
      val got = applied.collect()
        .groupBy(_.getAs[Long]("doc_id"))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getAs[Long]("i")).map(_.getAs[String]("t")).toVector }
      assert(got === refApplied, s"round $r apply diverged")
      docs = refApplied
      sparkToks = applied
    }
  }
}
