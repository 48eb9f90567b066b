package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring for corpus curation: PageRank-style authority over a
  * deterministic synthetic link graph (each document links to its 3
  * arithmetic neighbors (id·7+j) mod N — the testdata carries no real link
  * column, so the graph is derived, like the reference derives its frame
  * adjacency from track numbers).
  *
  * Integer-exact power iteration: ranks are q6-quantized bigints, each
  * contribution is one exact double product (< 2⁵³) followed by one
  * correctly-rounded division and a floor — so Spark and DuckDB replay the
  * iteration bit-for-bit and the oracle unrolls it as CTEs.
  *
  * Scale posture: one round = one shuffle join (edges ⋈ ranks on src,
  * partitioned by the join key) + one combiner-backed groupBy(dst). Ranks
  * and edges co-partition round over round, so at 100 TB the per-round
  * cost is a single co-located shuffle of the edge list — the standard
  * distributed PageRank shape. Damping 0.85 (q6: 850000/1000000).
  */
object Graphs {

  /** (src, dst) edge list: 3 out-edges per document id. */
  def syntheticEdges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id").as("src"))
      .crossJoin(broadcast(n))
      .select(col("src"),
        explode(array((1 to 3).map(j => pmod(col("src") * 7 + j, col("n_docs"))): _*))
          .as("dst"))
  }

  /** `iters` integer-exact PageRank rounds, uniform out-degree 3.
    * Returns (doc_id, rank_q6).
    *
    * The edge list is materialized ONCE, pre-partitioned on `src` — every
    * round's rank join then reuses that partitioning instead of re-deriving
    * and re-shuffling the edges (at 100 TB the edge scan is the dominant
    * cost and must not repeat per iteration). Ranks are checkpointed per
    * round past a small iteration count, same lineage rationale as
    * TextPipeline.dedupClusters. */
  def pageRank(docs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    import org.apache.spark.storage.StorageLevel
    val edges = syntheticEdges(docs)
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = docs.select(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("doc_id"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      val contribs = edges
        .join(ranks.select(col("doc_id").as("src"), col("r")), Seq("src"))
        .select(col("dst"),
          floor(col("r") * lit(850000.0) / lit(3000000.0)).cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs.select(col("dst").as("doc_id"), col("cin")), Seq("doc_id"), "left")
        .select(col("doc_id"), (lit(150000L) + coalesce(col("cin"), lit(0L))).as("r"))
      // fixed small unrolls stay one static plan; longer runs cut lineage
      if (iters > 4 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("doc_id"), col("r").as("rank_q6"))
  }

  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.doc_id, 150000 + COALESCE(SUM(c.c), 0) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS doc_id,
       |      CAST(FLOOR(p.r * 850000.0 / 3000000.0) AS BIGINT) AS c
       |    FROM edges e JOIN $prev p ON p.doc_id = e.src) c
       |    ON c.doc_id = n.doc_id
       |  GROUP BY n.doc_id)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // 3 unrolled power-iteration rounds; top 20 authorities
    QueryDef.sql(
      "q_pagerank",
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |${iterSql("r0", "r1")},
         |${iterSql("r1", "r2")},
         |${iterSql("r2", "r3")}
         |SELECT doc_id, CAST(r AS BIGINT) AS rank_q6
         |FROM r3 ORDER BY rank_q6 DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      pageRank(Tables.documents(s, d), iters = 3)
        .orderBy(col("rank_q6").desc, col("doc_id"))
        .limit(20)
    }
  )
}
