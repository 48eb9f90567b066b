package graft

import graft.pipeline.{Embeddings, TextPipeline}
import org.apache.spark.sql.functions._

/** The LSH geometry (hyperplane count, band layout) is the scale dial —
  * this spec proves the operators are correct at NON-default settings,
  * closing the "fixed geometry" risk: growing planes/rows for a bigger
  * corpus must not change semantics, only bucket granularity. */
class LshGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("embedding LSH buckets at 12 planes refine the 8-plane buckets") {
    val emb = Tables.embeddings(spark, sf())
    val qe = emb
      .select($"vec_id", posexplode($"embedding").as(Seq("i", "e")))
      .select($"vec_id", $"i",
        floor($"e".cast("double") * 1000000).cast("long").as("qe"))
    val n = emb.count()

    val b8 = Embeddings.lshBuckets(qe, 8)
      .select($"vec_id", $"bucket".as("b8"))
    val b12 = Embeddings.lshBuckets(qe, 12)
      .select($"vec_id", $"bucket".as("b12"))

    val joined = b8.join(b12, "vec_id").collect()
    assert(joined.length == n)
    joined.foreach { r =>
      val (v8, v12) = (r.getAs[Long]("b8"), r.getAs[Long]("b12"))
      assert(v12 >= 0 && v12 < 4096)
      // planes 0..7 are identical hyperplanes → the 12-bit bucket's low
      // 8 bits ARE the 8-bit bucket (finer geometry only splits buckets)
      assert((v12 & 255L) == v8, s"vec ${r.getAs[Long]("vec_id")}: $v12 vs $v8")
    }
    // more planes → at least as many occupied buckets
    assert(b12.select($"b12").distinct().count() >=
      b8.select($"b8").distinct().count())
  }

  test("LSH candidate pairs match brute-force banding at 8x2 and 4x4") {
    val sig = TextPipeline.minhashSignatures(spark, sf())
      .persist()
    val rows = sig.collect()
    val hs: Map[Long, Seq[Long]] = rows.map { r =>
      r.getAs[Long]("doc_id") -> (0 until 16).map(i => r.getAs[Long](s"h$i"))
    }.toMap

    for ((bands, rpb) <- Seq((8, 2), (4, 4))) {
      val got = TextPipeline.lshCandidatePairs(sig, bands, rpb)
        .select($"doc1", $"doc2", $"n_bands")
        .as[(Long, Long, Long)].collect().toSet
      val ids = hs.keys.toSeq.sorted
      val want = (for {
        i <- ids.indices; j <- (i + 1) until ids.length
        (d1, d2) = (ids(i), ids(j))
        matched = (0 until bands).count(b =>
          (b * rpb until (b + 1) * rpb).forall(k => hs(d1)(k) == hs(d2)(k)))
        if matched > 0
      } yield (d1, d2, matched.toLong)).toSet
      assert(got == want, s"geometry ${bands}x$rpb")
    }
    sig.unpersist()
  }

  test("dedup clusters: min-label propagation matches hand-computed components") {
    // components: {1,2,3} via 1-2, 2-3 (a chain, diameter 2), {4,5}, {6} isolated
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc1", "doc2")
    val got = TextPipeline.dedupClusters(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("dedup clusters: a 240-edge chain converges within the round budget") {
    // A path graph 1-2-...-241 has diameter 240: plain neighbor-min
    // propagation would need 240 rounds. Phase 1 contracts each of the 8
    // forced partitions locally; the quotient chain of ≤ 8 local roots
    // then converges in O(log) pointer-jumping rounds. Forcing 8
    // partitions exercises the cross-partition path a 1-partition test
    // would skip; it also regression-pins the lineage fix (un-truncated
    // plans at this round count would blow past the plan-string cap).
    val n = 241
    val docs = (1L to n.toLong).toDF("doc_id")
    val pairs = (1L until n.toLong).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val got = TextPipeline.dedupClusters(docs, pairs, partsOverride = Some(8))
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 1L),
      s"all $n chain members must canonicalize to 1")
    assert(TextPipeline.lastClusterRounds <= 8,
      s"${TextPipeline.lastClusterRounds} rounds on an 8-root quotient chain")
  }

  test("dedup clusters: exhausting maxIters fails loudly, not silently wrong") {
    // 8 forced partitions keep a non-trivial quotient graph alive so the
    // propagation loop actually runs; maxIters=1 cannot converge on it
    val n = 241
    val docs = (1L to n.toLong).toDF("doc_id")
    val pairs = (1L until n.toLong).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val e = intercept[IllegalStateException] {
      TextPipeline.dedupClusters(docs, pairs, maxIters = 1, partsOverride = Some(8))
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("star-reduced cluster edges yield the same components as pairwise edges") {
    val sig = TextPipeline.minhashSignatures(spark, sf()).persist()
    val docs = Tables.documents(spark, sf()).select($"doc_id")
    val viaPairs = TextPipeline.dedupClusters(docs,
      TextPipeline.lshCandidatePairs(sig).select($"doc1", $"doc2"))
      .as[(Long, Long)].collect().toMap
    val viaStars = TextPipeline.dedupClusters(docs,
      TextPipeline.lshClusterEdges(sig))
      .as[(Long, Long)].collect().toMap
    assert(viaStars == viaPairs)
    // and the star set is never larger than the pairwise set
    val nPairs = TextPipeline.lshCandidatePairs(sig).count()
    val nStars = TextPipeline.lshClusterEdges(sig).count()
    assert(nStars <= nPairs, s"$nStars star edges vs $nPairs pairwise")
    sig.unpersist()
  }

  test("band geometry guardrails") {
    val sig = TextPipeline.minhashSignatures(spark, sf())
    intercept[IllegalArgumentException] {
      TextPipeline.bandRows(sig, bands = 5, rowsPerBand = 4) // 20 > 16
    }
    intercept[IllegalArgumentException] {
      Embeddings.lshBuckets(null, planes = 63)
    }
  }
}
