package graft

import graft.pipeline.TextPipeline
import org.apache.spark.sql.functions._

/** Dev probe: rounds + wall time of the cluster loop at a given SF
  * (run with -DclusterProbe.sf=sf0.1 to profile a larger input). */
class ClusterRoundsProbe extends SparkSpec {

  test("cluster loop round count stays logarithmic in the corpus") {
    val dir = sf(sys.props.getOrElse("clusterProbe.sf", "sf0.001"))
    val t0 = System.nanoTime()
    val sig = TextPipeline.minhashSignatures(spark, dir)
    val edges = TextPipeline.lshClusterEdges(sig)
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val n = TextPipeline.dedupClusters(docs, edges).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$dir: $n%d docs, ${TextPipeline.lastClusterRounds}%d rounds, $secs%.1f s")
    // with pointer jumping, rounds ~ log2(component diameter) + 2; the
    // diameter is at most the corpus size, so log2(n)+3 bounds any healthy
    // run (linear-in-diameter propagation would blow straight past it)
    val bound = (math.log(n.toDouble.max(2)) / math.log(2)).ceil.toInt + 3
    assert(TextPipeline.lastClusterRounds <= bound,
      s"${TextPipeline.lastClusterRounds} rounds > log bound $bound — " +
        "propagation is degenerating")
  }
}
