package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Graphs._

/** Structural graph census over the deterministic synthetic link graph
  * (see [[Graphs]] — each document links to its 3 arithmetic neighbors
  * (id*7+j) mod N): triangle/wedge census, BFS reachability frontiers,
  * Bellman-Ford shortest paths, degree assortativity, modularity of the
  * label-propagation partition, degree distribution, reciprocity, and
  * Bradley-Terry strength fitting.
  *
  * Byte-identical move of the census/paths/structure query family out of
  * Graphs.scala (round-12 file-size seam, the EventAnalytics/Corpus split
  * discipline): the graph generators and the round-unrolling SQL helpers
  * stay in [[Graphs]] (shared with [[GraphMining]] and the rank family)
  * and are imported unqualified so the query bodies are untouched.
  */
object GraphStructure {

  val queries: Seq[QueryDef] = Seq(

    // triangle/wedge census + global clustering coefficient, degree-ordered
    // orientation (engine) vs naive canonical-order triple join (oracle —
    // correct but no hub bound; fine at oracle scale)
    QueryDef.sql(
      "q_triangle_count",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |ue AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM e0 WHERE src <> dst),
         |deg AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM (SELECT a AS v FROM ue UNION ALL SELECT b AS v FROM ue)
         |  GROUP BY v),
         |tri AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM ue e1 JOIN ue e2 ON e1.a = e2.a AND e1.b < e2.b
         |       JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ue) AS n_edges,
         |  (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         |  tri.n_triangles,
         |  CAST(FLOOR(CAST(3000000 * tri.n_triangles AS DOUBLE) /
         |    CAST((SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS DOUBLE)) AS BIGINT)
         |    AS clustering_q6
         |FROM tri""".stripMargin) { (s, d) =>
      triangleStats(undirectedEdges(Tables.documents(s, d)))
    },

    // 3-hop BFS reachability from doc 0; per-hop frontier census.
    // Oracle unrolls the frontier recurrence with EXCEPT.
    QueryDef.sql(
      "q_bfs_reach",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |d0 AS (SELECT CAST(0 AS BIGINT) AS v),
         |f1 AS (
         |  SELECT DISTINCT e.dst AS v FROM e0 e JOIN d0 ON e.src = d0.v
         |  EXCEPT SELECT v FROM d0),
         |f2 AS (
         |  SELECT DISTINCT e.dst AS v FROM e0 e JOIN f1 ON e.src = f1.v
         |  EXCEPT (SELECT v FROM d0 UNION SELECT v FROM f1)),
         |f3 AS (
         |  SELECT DISTINCT e.dst AS v FROM e0 e JOIN f2 ON e.src = f2.v
         |  EXCEPT (SELECT v FROM d0 UNION SELECT v FROM f1 UNION SELECT v FROM f2)),
         |hops AS (
         |  SELECT CAST(0 AS BIGINT) AS hop, v FROM d0
         |  UNION ALL SELECT 1, v FROM f1
         |  UNION ALL SELECT 2, v FROM f2
         |  UNION ALL SELECT 3, v FROM f3)
         |SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(v) AS BIGINT) AS sum_ids
         |FROM hops GROUP BY hop ORDER BY hop""".stripMargin) { (s, d) =>
      bfsHops(Tables.documents(s, d), source = 0L, maxHop = 3)
        .groupBy(col("hop"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("hop"))
    },

    // Weighted single-source shortest path, 4 Bellman-Ford rounds from
    // doc 0 over the link graph with deterministic integer weights —
    // the oracle unrolls the relaxation as min-merge CTEs.
    QueryDef.sql(
      "q_shortest_path",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |we AS (
         |  SELECT src, dst,
         |    CAST((src * 31 + dst * 17) % 97 + 1 AS BIGINT) AS w FROM e0),
         |d0 AS (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist),
         |${bfRoundSql("d0", "d1")},
         |${bfRoundSql("d1", "d2")},
         |${bfRoundSql("d2", "d3")},
         |${bfRoundSql("d3", "d4")}
         |SELECT CAST(v AS BIGINT) AS doc_id, dist
         |FROM d4 ORDER BY doc_id""".stripMargin) { (s, d) =>
      shortestPaths(Tables.documents(s, d), source = 0L, rounds = 4)
        .orderBy(col("doc_id"))
    },

    // Degree assortativity of the undirected link graph: Pearson r over
    // the (deg(a), deg(b)) samples taken once per edge ORIENTATION (both
    // directions, so the marginals are identical and the formula
    // simplifies to (MΣjk − (Σj)²)/(MΣj² − (Σj)²)). Two keyed joins of
    // the edge list against the degree table, exact integer moment sums,
    // one guarded IEEE division.
    QueryDef.sql(
      "q_assortativity",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |ue AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM e0 WHERE src <> dst),
         |deg AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
         |  FROM (SELECT a AS v FROM ue UNION ALL SELECT b AS v FROM ue)
         |  GROUP BY v),
         |sam AS (
         |  SELECT da.dg AS j, db.dg AS k
         |  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b
         |  UNION ALL
         |  SELECT db.dg, da.dg
         |  FROM ue JOIN deg da ON da.v = ue.a JOIN deg db ON db.v = ue.b),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(j) AS BIGINT) AS sj,
         |    CAST(SUM(j * k) AS BIGINT) AS sjk, CAST(SUM(j * j) AS BIGINT) AS sjj
         |  FROM sam)
         |SELECT m AS n_samples, sj, sjk, sjj,
         |  CASE WHEN (m * sjj - sj * sj) = 0 THEN NULL
         |  ELSE CAST(FLOOR((m * sjk - sj * sj) * CAST(1000000.0 AS DOUBLE)
         |    / (m * sjj - sj * sj)) AS BIGINT) END AS r_q6
         |FROM m""".stripMargin) { (s, d) =>
      val ue = undirectedEdges(Tables.documents(s, d))
      val deg = ue.select(col("a").as("v"))
        .unionAll(ue.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      val joined = ue
        .join(deg.select(col("v").as("a"), col("dg").as("ja")), Seq("a"))
        .join(deg.select(col("v").as("b"), col("dg").as("jb")), Seq("b"))
      val sam = joined.select(col("ja").as("j"), col("jb").as("k"))
        .unionAll(joined.select(col("jb").as("j"), col("ja").as("k")))
      val m = sam.agg(count(lit(1)).as("m"), sum(col("j")).as("sj"),
        sum(col("j") * col("k")).as("sjk"), sum(col("j") * col("j")).as("sjj"))
      val den = col("m") * col("sjj") - col("sj") * col("sj")
      m.select(col("m").as("n_samples"), col("sj"), col("sjk"), col("sjj"),
        when(den === 0, lit(null))
          .otherwise(floor((col("m") * col("sjk") - col("sj") * col("sj"))
            * lit(1000000.0) / den).cast("long")).as("r_q6"))
    },

    // Newman modularity of the 2-round label-propagation partition:
    // Q = Σ_c (e_c/m − (d_c/2m)²) computed as ONE exact integer numerator
    // Σ_c (4m·e_c − d_c²) over 4m² — the within/between edge quality
    // readout for the community structure. Per-community sums are keyed
    // joins of the edge list against the label table; the final division
    // is one shared IEEE expression (numerator can be negative — FLOOR is
    // negative-safe in both engines).
    QueryDef.sql(
      "q_modularity",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
         |ue AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM e0 WHERE src <> dst),
         |adj AS (SELECT a AS v, b AS u FROM ue UNION ALL SELECT b, a FROM ue),
         |nodes AS (SELECT doc_id AS v FROM documents),
         |l0 AS (SELECT doc_id AS v, doc_id AS lbl FROM documents),
         |${lpRoundSql("l0", "l1")},
         |${lpRoundSql("l1", "l2")},
         |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dg FROM adj GROUP BY v),
         |dc AS (
         |  SELECT c.lbl, CAST(SUM(d.dg) AS BIGINT) AS d_c
         |  FROM l2 c JOIN deg d ON d.v = c.v GROUP BY c.lbl),
         |ec AS (
         |  SELECT ca.lbl, CAST(COUNT(*) AS BIGINT) AS e_c
         |  FROM ue JOIN l2 ca ON ca.v = ue.a
         |          JOIN l2 cb ON cb.v = ue.b AND cb.lbl = ca.lbl
         |  GROUP BY ca.lbl),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ue),
         |s AS (
         |  SELECT CAST(SUM(4 * mm.m * COALESCE(e.e_c, 0) - d.d_c * d.d_c)
         |    AS BIGINT) AS num, CAST(COUNT(*) AS BIGINT) AS n_comm
         |  FROM dc d LEFT JOIN ec e ON e.lbl = d.lbl CROSS JOIN mm)
         |SELECT mm.m AS n_edges, s.n_comm AS n_communities,
         |  CAST(FLOOR(s.num * CAST(1000000.0 AS DOUBLE) / (4 * mm.m * mm.m))
         |    AS BIGINT) AS q_q6
         |FROM s CROSS JOIN mm""".stripMargin) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      val docs = Tables.documents(s, d)
      val ue = undirectedEdges(docs).persist(StorageLevel.MEMORY_AND_DISK)
      val lbl = labelPropagation(docs, rounds = 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = ue.select(col("a").as("v"))
        .unionAll(ue.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      val dc = lbl.join(deg, Seq("v"))
        .groupBy(col("lbl")).agg(sum(col("dg")).as("d_c"))
      val ec = ue
        .join(lbl.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
        .join(lbl.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_c"))
      val mm = ue.agg(count(lit(1)).as("m"))
      val sRow = dc.join(ec, Seq("lbl"), "left")
        .crossJoin(broadcast(mm))
        .agg(sum(lit(4) * col("m") * coalesce(col("e_c"), lit(0L))
          - col("d_c") * col("d_c")).as("num"),
          count(lit(1)).as("n_comm"))
      sRow.crossJoin(broadcast(mm))
        .select(col("m").as("n_edges"), col("n_comm").as("n_communities"),
          floor(col("num") * lit(1000000.0) / (lit(4) * col("m") * col("m")))
            .cast("long").as("q_q6"))
    },

    // Degree distribution of the co-purchase graph (the power-law shape
    // check next to q_zipf_slope, on graph structure instead of token
    // frequency): parts are neighbors when they share an order, degree =
    // distinct co-purchase partners, histogrammed into exact floor-log2
    // buckets (LENGTH(BIN(d))−1 — no runtime log). The pair fanout is
    // bounded by order width, so the edge set stays linear in orders at
    // any scale; isolated parts (no multi-part order) have no edges and
    // no row, by construction.
    QueryDef.sql(
      "q_degree_distribution",
      """WITH ol AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pr AS (
        |  SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
        |  FROM ol a JOIN ol b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |und AS (SELECT p, q FROM pr UNION ALL SELECT q AS p, p AS q FROM pr),
        |deg AS (SELECT p AS node, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM und GROUP BY p)
        |SELECT CAST(LENGTH(BIN(degree)) - 1 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(MIN(degree) AS BIGINT) AS min_deg,
        |  CAST(MAX(degree) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val ol = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pr = ol.as("a").join(ol.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("p"), col("b.l_partkey").as("q"))
        .distinct()
      val und = pr.unionAll(pr.select(col("q").as("p"), col("p").as("q")))
      und.groupBy(col("p")).agg(count(lit(1)).as("degree"))
        .groupBy((length(bin(col("degree"))) - 1).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_parts"),
          min(col("degree")).as("min_deg"), max(col("degree")).as("max_deg"))
        .orderBy(col("bucket"))
    },

    // Directed-graph reciprocity over the synthetic link graph: the share
    // of non-loop edges whose reverse edge also exists — the standard
    // social-graph mutuality statistic. One self-join of the
    // deduplicated edge list against its swap, keyed on (src, dst); at
    // scale both sides hash-partition on the same composite key.
    QueryDef.sql(
      "q_reciprocity",
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src, (doc_id * 7 + j) % n.n_docs AS dst
        |  FROM documents CROSS JOIN n CROSS JOIN UNNEST(RANGE(1, 4)) AS u(j)),
        |ed AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM ed),
        |r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
        |  FROM ed a JOIN ed b ON b.src = a.dst AND b.dst = a.src)
        |SELECT m.n_edges, r.n_recip,
        |  CAST((r.n_recip * 1000000) // m.n_edges AS BIGINT) AS recip_q6
        |FROM m CROSS JOIN r""".stripMargin) { (s, d) =>
      val ed = syntheticEdges(Tables.documents(s, d))
        .filter(col("src") =!= col("dst")).distinct()
      val m = ed.agg(count(lit(1)).as("n_edges"))
      val r = ed.as("a")
        .join(ed.as("b"), col("b.src") === col("a.dst") && col("b.dst") === col("a.src"))
        .agg(count(lit(1)).as("n_recip"))
      m.crossJoin(r)
        .select(col("n_edges"), col("n_recip"),
          expr("(n_recip * 1000000) div n_edges").as("recip_q6"))
    },

    // Bradley–Terry pairwise strength (3 minorize–maximize rounds) over
    // within-order quantity contests: when two parts share an order, the
    // larger-quantity part "wins". The MM update
    // sᵢ′ = Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ) is made order-free by quantizing each
    // denominator TERM with integer division (nᵢⱼ·10¹² // (sᵢ+sⱼ)) before
    // the exact BIGINT sum — IEEE addition order can never matter — and
    // the final per-item ratio is one shared double tree. Per round: one
    // shuffle join of the contest edges against the strength table on
    // each endpoint + a combiner-backed groupBy — the PageRank cost
    // shape. Strengths are floored at 1 after every round (GREATEST in
    // both engines): a zero- or low-win item (w*10^12 < Σ terms) would
    // otherwise floor to 0, and a round-2 contest between two floored
    // items would hit a 0+0 denominator whose NULL term SUM silently
    // drops. Oracle: 3 unrolled CTE rounds, same integer divisions.
    QueryDef.sql(
      "q_bradley_terry",
      {
        def round(prev: String, next: String) =
          s"""$next AS MATERIALIZED (
             |  SELECT c.i,
             |    GREATEST(CAST(FLOOR(COALESCE(w.w, 0) * 1000000000000.0
             |      / SUM((c.n * 1000000000000) // (a.s + b.s))) AS BIGINT), 1) AS s
             |  FROM cn c
             |  JOIN $prev a ON a.i = c.i
             |  JOIN $prev b ON b.i = c.j
             |  LEFT JOIN wi w ON w.i = c.i
             |  GROUP BY c.i, w.w)""".stripMargin
        s"""WITH op AS MATERIALIZED (
           |  SELECT l_orderkey, l_partkey,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           |  FROM lineitem GROUP BY 1, 2),
           |ct AS MATERIALIZED (
           |  SELECT a.l_partkey AS i, b.l_partkey AS j, CAST(COUNT(*) AS BIGINT) AS w
           |  FROM op a JOIN op b ON b.l_orderkey = a.l_orderkey
           |    AND a.l_partkey <> b.l_partkey AND a.q > b.q
           |  GROUP BY 1, 2),
           |cn AS MATERIALIZED (
           |  SELECT a.l_partkey AS i, b.l_partkey AS j, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM op a JOIN op b ON b.l_orderkey = a.l_orderkey
           |    AND a.l_partkey <> b.l_partkey AND a.q <> b.q
           |  GROUP BY 1, 2),
           |wi AS MATERIALIZED (SELECT i, CAST(SUM(w) AS BIGINT) AS w FROM ct GROUP BY i),
           |s0 AS MATERIALIZED (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS s FROM cn),
           |${round("s0", "s1")},
           |${round("s1", "s2")},
           |${round("s2", "s3")}
           |SELECT s3.i AS l_partkey, COALESCE(wi.w, 0) AS n_wins,
           |  nc.n_contests, s3.s AS strength_q6
           |FROM s3
           |LEFT JOIN wi ON wi.i = s3.i
           |JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS n_contests FROM cn GROUP BY i) nc
           |  ON nc.i = s3.i
           |ORDER BY strength_q6 DESC, l_partkey LIMIT 50""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.storage.StorageLevel
      // the self-join consumes op twice — materialize the per-(order,
      // part) reduction once instead of re-aggregating the fact table
      // per side (and let both probes reuse its orderkey partitioning)
      val op = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .repartition(col("l_orderkey"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val pairs = op.as("a").join(op.as("b"),
          col("b.l_orderkey") === col("a.l_orderkey")
            && col("a.l_partkey") =!= col("b.l_partkey")
            && col("a.q") =!= col("b.q"))
        .select(col("a.l_partkey").as("i"), col("b.l_partkey").as("j"),
          (col("a.q") > col("b.q")).cast("long").as("win"))
      val cn = pairs.groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"), sum(col("win")).as("wdir"))
        .repartition(col("i"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val wi = cn.groupBy(col("i")).agg(sum(col("wdir")).as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var st = cn.select(col("i")).distinct()
        .select(col("i"), lit(1000000L).as("s"))
      for (_ <- 1 to 3) {
        // broadcast the O(|items|) strength vector to BOTH endpoint joins:
        // the planner sees only a stats-free checkpointed relation and
        // falls back to sort-merge, which re-shuffles the O(E) contest
        // table by j and back by i EVERY round (2×2.3M rows/round at
        // sf0.1). Broadcast keeps cn on its persisted i-partitioning end
        // to end — zero edge-table exchanges per round (guide §3.1/§2.4);
        // the model vector is the broadcastable side by construction
        // (one row per item, the BT parameter vector).
        val dsum = cn
          .join(broadcast(st.select(col("i"), col("s").as("si"))), Seq("i"))
          .join(broadcast(st.select(col("i").as("j"), col("s").as("sj"))), Seq("j"))
          .groupBy(col("i"))
          .agg(sum(expr("(n * 1000000000000) div (si + sj)")).as("dd"))
        st = dsum.join(wi, Seq("i"), "left")
          .select(col("i"),
            greatest(floor(coalesce(col("w"), lit(0L)) * lit(1.0e12)
              / col("dd")).cast("long"), lit(1L)).as("s"))
          .localCheckpoint(true)
      }
      val nc = cn.groupBy(col("i")).agg(sum(col("n")).as("n_contests"))
      st.join(wi, Seq("i"), "left").join(nc, Seq("i"))
        .select(col("i").as("l_partkey"),
          coalesce(col("w"), lit(0L)).as("n_wins"),
          col("n_contests"), col("s").as("strength_q6"))
        .orderBy(col("strength_q6").desc, col("l_partkey"))
        .limit(50)
    }
  )
}
