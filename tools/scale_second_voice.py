#!/usr/bin/env python3
"""Engine-independent second voice for q_bpe_merges and q_knn_graph at
rehearsal scale, where the naive DuckDB oracle dies of resource limits
(q_bpe_merges: OOM; q_knn_graph: >70 GB temp spill at 100x).

Two checks, chained with ScaleLawCrossCheckSpec to cover the full gap:

1. q_bpe_merges — a pure-python sequential greedy BPE replay runs on the
   BASE corpus (no Spark, no DuckDB, no SQL), then the clone-lift law
   (a verbatim F-clone multiplies every pair count and surviving token
   count by exactly F and preserves every argmax, ties included; proved
   replay-vs-replay in ScaleLawCrossCheckSpec) lifts it to the clone
   factor. The engine's ACTUAL clone output must match the lifted replay
   row-for-row.

2. q_knn_graph — a rep-collapsed DuckDB replay over the clone (distinct
   texts carry clone-weighted df; identical-text pairs emit self-cosine
   directly), which stays within resources where the naive oracle
   cannot. This mirrors the engine's scale ALGEBRA but executes on a
   different system; independence of the algebra itself is what
   ScaleLawCrossCheckSpec establishes (naive per-doc replay == rep path
   on an in-test clone). Chained: naive==rep (spec, factor 5),
   rep(Spark)==rep(DuckDB) (here, factor 100).

Usage:
  python3 tools/scale_second_voice.py BASE_SF_DIR CLONE_DIR ENGINE_OUT_DIR FACTOR [--json OUT]

ENGINE_OUT_DIR must contain q_bpe_merges.parquet / q_knn_graph.parquet
from `sbt "runMain graft.Verify CLONE_DIR ENGINE_OUT_DIR"` (VERIFY_ONLY
works). Exits 1 on any mismatch.
"""
import json
import re
import sys

import duckdb


USAGE = ("usage: python3 tools/scale_second_voice.py "
         "BASE_SF_DIR CLONE_DIR ENGINE_OUT_DIR FACTOR [--json OUT]")


def replay_bpe(texts, rounds=3):
    # Engine convention (CorpusTokenizers.scala q_bpe_merges): truncate to
    # the 100-char prefix FIRST, then lowercase, and filter on the LOWERED
    # length. Python str indexing is by code point, the same unit as
    # Spark/DuckDB SUBSTR; main() asserts the corpus is ASCII so
    # lowercasing is length-preserving and locale-free in every voice.
    prefixes = [t[:100].lower() for t in texts]
    seqs = [list(p) for p in prefixes if len(p) >= 2]
    out = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for s in seqs:
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + 1
        (bt, bnt), bn = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        nxt = []
        for s in seqs:
            o, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == bt and s[i + 1] == bnt:
                    o.append(bt + bnt)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            nxt.append(o)
        seqs = nxt
        out.append((rnd, bt, bnt, bn, sum(len(s) for s in seqs)))
    return out


KNN_REP_SQL = """
WITH docs AS (SELECT doc_id, text FROM '{clone}/documents.parquet'),
reps AS (SELECT text, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_copies
         FROM docs GROUP BY text),
m AS (SELECT d.doc_id, r.rep FROM docs d JOIN reps r USING (text)),
toks AS (SELECT rep, n_copies, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS tk
         FROM reps),
g AS (SELECT rep, n_copies,
        UNNEST(LIST_TRANSFORM(RANGE(1, LEN(tk) - 3),
          i -> ARRAY_TO_STRING(tk[i:i+4], ' '))) AS t
      FROM toks WHERE LEN(tk) >= 5),
tf AS (SELECT rep, t, CAST(COUNT(*) AS BIGINT) AS tf, MAX(n_copies) AS n_copies
       FROM g GROUP BY rep, t),
dfreq AS (SELECT t, SUM(n_copies) AS df FROM tf GROUP BY t),
cap AS (SELECT GREATEST(20, COUNT(*) // 25) AS df_cap FROM docs),
vec AS MATERIALIZED (
  SELECT tf.rep, tf.t, tf.tf FROM tf JOIN dfreq USING (t) CROSS JOIN cap
  WHERE dfreq.df BETWEEN 2 AND cap.df_cap),
norms AS MATERIALIZED (
  SELECT rep, CAST(SUM(tf * tf) AS BIGINT) AS nsq FROM vec GROUP BY rep),
dots_rep AS (
  SELECT a.rep AS rep1, b.rep AS rep2, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM vec a JOIN vec b ON a.t = b.t AND a.rep < b.rep GROUP BY 1, 2),
crossp AS (
  SELECT LEAST(ma.doc_id, mb.doc_id) AS doc1,
         GREATEST(ma.doc_id, mb.doc_id) AS doc2,
         d.dot, n1.nsq AS n1, n2.nsq AS n2
  FROM dots_rep d
  JOIN norms n1 ON n1.rep = d.rep1
  JOIN norms n2 ON n2.rep = d.rep2
  JOIN m ma ON ma.rep = d.rep1
  JOIN m mb ON mb.rep = d.rep2),
within AS (
  SELECT x.doc_id AS doc1, y.doc_id AS doc2, n.nsq AS dot, n.nsq AS n1, n.nsq AS n2
  FROM m x JOIN m y ON x.rep = y.rep AND x.doc_id < y.doc_id
  JOIN norms n ON n.rep = x.rep),
scored AS (
  SELECT doc1, doc2, dot,
    CAST(FLOOR(dot * CAST(1000000.0 AS DOUBLE)
      / SQRT(CAST(n1 * n2 AS DOUBLE))) AS BIGINT) AS cos_q6
  FROM (SELECT * FROM crossp UNION ALL SELECT * FROM within)),
sym AS (
  SELECT doc1 AS doc_id, doc2 AS nbr, cos_q6 FROM scored
  UNION ALL SELECT doc2, doc1, cos_q6 FROM scored),
ranked AS (
  SELECT doc_id, nbr, cos_q6,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cos_q6 DESC, nbr) AS rk
  FROM sym)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, nbr, cos_q6
FROM ranked WHERE rk <= 3
"""


def main():
    # Exit codes: 0 = all checks match, 1 = a check mismatched,
    # 2 = bad invocation or violated precondition (did not run checks).
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(USAGE + "\n  --json requires a path", file=sys.stderr)
            sys.exit(2)
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) != 4:
        print(USAGE, file=sys.stderr)
        sys.exit(2)
    base, clone, eng_out = argv[0], argv[1], argv[2]
    try:
        factor = int(argv[3])
    except ValueError:
        print(USAGE + f"\n  FACTOR must be an integer, got {argv[3]!r}",
              file=sys.stderr)
        sys.exit(2)
    con = duckdb.connect()
    report = {"factor": factor}

    # ---- 1. BPE: python base replay + lift law vs engine clone output
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM '{base}/documents.parquet' ORDER BY doc_id").fetchall()]
    non_ascii = sum(1 for t in texts if not t.isascii())
    if non_ascii:
        print(f"precondition violated: {non_ascii} non-ASCII document(s); "
              "the cross-voice char-unit/lowercase equivalence (python code "
              "points vs Spark/DuckDB SUBSTR vs JVM UTF-16) is only proved "
              "for ASCII corpora", file=sys.stderr)
        sys.exit(2)
    lifted = [(r, a, b, n * factor, nt * factor)
              for (r, a, b, n, nt) in replay_bpe(texts)]
    got = [tuple(r) for r in con.execute(
        f"SELECT round, lhs, rhs, n_pair, n_tokens_after "
        f"FROM '{eng_out}/q_bpe_merges/*.parquet' ORDER BY round").fetchall()]
    bpe_ok = got == lifted
    report["bpe"] = {"match": bpe_ok, "engine": got, "lifted_replay": lifted}
    print(f"bpe_merges: {'MATCH' if bpe_ok else 'MISMATCH'} "
          f"(python replay x{factor} lift vs engine)")
    if not bpe_ok:
        print(f"  engine: {got}\n  lifted: {lifted}")

    # ---- 2. kNN: rep-collapsed duckdb replay vs engine clone output
    con.execute("CREATE TEMP TABLE knn_ref AS " + KNN_REP_SQL.format(clone=clone))
    n_ref = con.execute("SELECT COUNT(*) FROM knn_ref").fetchone()[0]
    n_eng = con.execute(
        f"SELECT COUNT(*) FROM '{eng_out}/q_knn_graph/*.parquet'").fetchone()[0]
    diff = con.execute(
        f"""SELECT COUNT(*) FROM (
              (SELECT doc_id, rk, nbr, cos_q6 FROM knn_ref
               EXCEPT
               SELECT doc_id, rk, nbr, cos_q6 FROM '{eng_out}/q_knn_graph/*.parquet')
              UNION ALL
              (SELECT doc_id, rk, nbr, cos_q6 FROM '{eng_out}/q_knn_graph/*.parquet'
               EXCEPT
               SELECT doc_id, rk, nbr, cos_q6 FROM knn_ref))""").fetchone()[0]
    knn_ok = (n_ref == n_eng) and diff == 0
    report["knn"] = {"match": knn_ok, "rows_ref": n_ref, "rows_engine": n_eng,
                     "sym_diff_rows": diff}
    print(f"knn_graph: {'MATCH' if knn_ok else 'MISMATCH'} "
          f"({n_eng} engine rows vs {n_ref} replay rows, symdiff {diff})")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, default=str)
    sys.exit(0 if (bpe_ok and knn_ok) else 1)


if __name__ == "__main__":
    main()
