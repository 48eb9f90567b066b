package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus shaping: document → chunk explosion and greedy
  * sequence packing — the two operators between a deduped corpus and a
  * token-budgeted training shard.
  *
  *   - `chunks`: overlapping sliding character windows (stride/width
  *     parameters), pure Column arithmetic — explode of a computed index
  *     sequence + `substr`, fully codegen'd, shuffle-free (narrow).
  *   - `packGreedy`: per-shard greedy bin packing — docs stream in id
  *     order, a bin closes when the next doc would exceed the token
  *     budget. Sequential per-shard state → `groupByKey.flatMapGroups`
  *     (the key-local state pattern used for every sequential domain
  *     algorithm here); parallelism = shard count, so shard at the
  *     granularity you want the cluster busy (a real pipeline uses
  *     thousands of shards). Oracled through a DuckDB recursive CTE that
  *     steps all shards one ordered row per iteration.
  */
object Packing {

  final case class DocTok(doc_id: Long, shard: Long, tok: Long)
  final case class Packed(doc_id: Long, shard: Long, bin_idx: Long, tok: Long)

  /** Sliding character windows: one row per (doc, window start k·stride). */
  def chunks(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, s"width $width / stride $stride")
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          floor((length(col("text")) - 1) / stride).cast("long"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        col("text").substr((col("chunk_idx") * stride + 1).cast("int"), lit(width))
          .as("chunk"))
  }

  /** Greedy fixed-budget packing of (doc_id, shard, tok) rows, in doc-id
    * order within each shard. A doc larger than the budget gets a bin of
    * its own (the first doc of a bin always enters it).
    *
    * Secondary-sort shape, not flatMapGroups: repartition by shard, let
    * Spark's spill-aware sort order (shard, doc_id) within each partition,
    * then stream a single iterator that resets its counters at every
    * shard boundary. No shard's rows are ever materialized — a shard
    * bigger than executor memory still packs — and the sort spills to
    * disk instead of OOMing. */
  def packGreedy(docs: DataFrame, budget: Long): DataFrame = {
    val s: SparkSession = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("shard"), col("tok")).as[DocTok]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bin = 0L
        var acc = 0L
        var first = true
        it.map { d =>
          if (first || d.shard != curShard) {
            curShard = d.shard; bin = 0L; acc = d.tok; first = false
          } else if (acc + d.tok > budget) { bin += 1; acc = d.tok }
          else acc += d.tok
          Packed(d.doc_id, d.shard, bin, d.tok)
        }
      }.toDF()
  }

  val queries: Seq[QueryDef] = Seq(

    // sliding-window chunking, 500-char windows every 400 chars; the md5
    // of each window proves the chunk CONTENT matches, not just its length
    QueryDef.sql(
      "q_text_chunks",
      """SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
        |  CAST(LENGTH(SUBSTR(text, CAST(k * 400 + 1 AS INTEGER), 500)) AS BIGINT) AS chunk_len,
        |  MD5(SUBSTR(text, CAST(k * 400 + 1 AS INTEGER), 500)) AS chunk_md5
        |FROM documents,
        |  UNNEST(RANGE(0, CAST(FLOOR((LENGTH(text) - 1) / 400) AS BIGINT) + 1)) AS u(k)
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      chunks(Tables.documents(s, d), width = 500, stride = 400)
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(encode(col("chunk"), "UTF-8")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // passage-level duplicate detection (the block-hash flavor of corpus
    // dedup): md5 of aligned 100-char blocks, keep hashes seen in >1
    // distinct document — finds repeated passages that whole-document
    // dedup misses; one narrow chunk pass + one combiner-backed groupBy
    QueryDef.sql(
      "q_dup_passages",
      """WITH blocks AS (
        |  SELECT doc_id, MD5(SUBSTR(text, CAST(k * 100 + 1 AS INTEGER), 100)) AS h
        |  FROM documents,
        |    UNNEST(RANGE(0, CAST(FLOOR((LENGTH(text) - 1) / 100) AS BIGINT) + 1)) AS u(k)
        |  WHERE LENGTH(SUBSTR(text, CAST(k * 100 + 1 AS INTEGER), 100)) = 100)
        |SELECT h, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM blocks GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
        |ORDER BY n_occurrences DESC, h LIMIT 100""".stripMargin) { (s, d) =>
      chunks(Tables.documents(s, d), width = 100, stride = 100)
        .filter(length(col("chunk")) === 100)
        .select(col("doc_id"), md5(encode(col("chunk"), "UTF-8")).as("h"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).cast("long").as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("n_occurrences").desc, col("h"))
        .limit(100)
    },

    // Boilerplate REMOVAL (the apply step the detection query above only
    // locates — the C4-style cleaning rule): any aligned block appearing
    // in >= 3 distinct documents is chrome/template text and every
    // occurrence is dropped. A fixed min-df (not one scaled to corpus
    // size) is the right shape here: "repeated verbatim in 3+ documents"
    // is the semantic, and under clone-heavy growth the flagged set only
    // gets richer, never vacuous. Emits per-doc cleaning stats (blocks
    // kept, blocks dropped, chars surviving). The df table is a
    // combiner-backed group on the block hash — bounded by distinct
    // blocks — and joins back to the narrow (doc_id, h) stream; raw text
    // never shuffles twice.
    QueryDef.sql(
      "q_boilerplate_clean",
      """WITH blocks AS (
        |  SELECT doc_id, MD5(SUBSTR(text, CAST(k * 100 + 1 AS INTEGER), 100)) AS h
        |  FROM documents,
        |    UNNEST(RANGE(0, CAST(FLOOR((LENGTH(text) - 1) / 100) AS BIGINT) + 1)) AS u(k)
        |  WHERE LENGTH(SUBSTR(text, CAST(k * 100 + 1 AS INTEGER), 100)) = 100),
        |boiler AS (
        |  SELECT h FROM blocks GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 3),
        |per_doc AS (
        |  SELECT b.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(CASE WHEN bo.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM blocks b LEFT JOIN boiler bo ON bo.h = b.h
        |  GROUP BY b.doc_id)
        |SELECT d.doc_id, p.n_blocks, p.n_dropped,
        |  CAST(d.n_chars - 100 * p.n_dropped AS BIGINT) AS clean_chars
        |FROM documents d JOIN per_doc p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val blocks = chunks(docs, width = 100, stride = 100)
        .filter(length(col("chunk")) === 100)
        .select(col("doc_id"), md5(encode(col("chunk"), "UTF-8")).as("h"))
      val boiler = blocks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 3)
        .select(col("h"), lit(1L).as("is_boiler"))
      val perDoc = blocks
        .join(boiler, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(coalesce(col("is_boiler"), lit(0L))).as("n_dropped"))
      docs.select(col("doc_id"), col("n_chars"))
        .join(perDoc, Seq("doc_id"))
        .select(col("doc_id"), col("n_blocks"), col("n_dropped"),
          (col("n_chars") - lit(100L) * col("n_dropped")).cast("long").as("clean_chars"))
        .orderBy(col("doc_id"))
    },

    // greedy 2048-token packing over 8 shards (tokens ~ chars/4); the
    // DuckDB recursive CTE replays the identical greedy walk per shard
    QueryDef.sql(
      "q_pack_sequences",
      """WITH RECURSIVE docs2 AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(FLOOR(LENGTH(text) / 4) AS BIGINT) AS tok,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |walk(shard, rn, doc_id, tok, bin_idx, bin_tok) AS (
        |  SELECT shard, rn, doc_id, tok, 0, tok FROM docs2 WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id, d.tok,
        |    CASE WHEN w.bin_tok + d.tok > 2048 THEN w.bin_idx + 1 ELSE w.bin_idx END,
        |    CASE WHEN w.bin_tok + d.tok > 2048 THEN d.tok ELSE w.bin_tok + d.tok END
        |  FROM walk w JOIN docs2 d ON d.shard = w.shard AND d.rn = w.rn + 1)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(bin_idx AS BIGINT) AS bin_idx, tok
        |FROM walk ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 8).as("shard"),
        floor(length(col("text")) / 4).cast("long").as("tok"))
      packGreedy(docs, budget = 2048L)
        .select(col("doc_id"), col("shard"), col("bin_idx"), col("tok"))
        .orderBy(col("doc_id"))
    }
  )
}
