#!/usr/bin/env python3
"""Engine-independent second voice for the queries whose DuckDB oracle
dies of resource limits at rehearsal scale: q_bpe_merges (OOM),
q_knn_graph (>70 GB temp spill at 100x), and — since r13 — the three
permanently-skipped dedup oracles q_dedup_clusters / q_dedup_embedding /
q_pack_sequences (the naive recursive/pairwise replays are superlinear
on clone-clique data at EVERY clone factor).

Six checks, chained with ScaleLawCrossCheckSpec / DedupScaleLawSpec to
cover the full gap (q_dedup_incremental — r15 — shares the clusters
oracle and is second-voiced by engine-vs-engine equality with the batch
clusters table, which check 3 independently replays):

1. q_bpe_merges — a pure-python WEIGHTED sequential greedy BPE replay
   over the clone's distinct 100-char prefixes (each carrying its
   multiplicity), no Spark and no SQL in the merge loop. On a verbatim
   F-clone this reduces to the clone-lift law (every weight = F; the
   law — ×F counts, argmaxes + ties preserved — is proved
   replay-vs-replay in ScaleLawCrossCheckSpec); on a power clone the
   weights differ per prefix, so the same replay covers the skewed
   corpus where base-plus-lift cannot. The engine's ACTUAL clone output
   must match row-for-row.

2. q_knn_graph — a rep-collapsed DuckDB replay over the clone (distinct
   texts carry clone-weighted df; identical-text pairs emit self-cosine
   directly), which stays within resources where the naive oracle
   cannot. This mirrors the engine's scale ALGEBRA but executes on a
   different system; independence of the algebra itself is what
   ScaleLawCrossCheckSpec establishes (naive per-doc replay == rep path
   on an in-test clone). Chained: naive==rep (spec, factor 5),
   rep(Spark)==rep(DuckDB) (here, factor 100).

3. q_dedup_clusters — a rep-collapsed pure-python replay: MinHash
   signatures computed once per DISTINCT 200-char prefix, LSH band
   union-find over prefix nodes, then doc components expanded through
   each prefix's doc list. Clone-content-agnostic (verbatim AND power
   clones): identical-prefix docs share every band, so prefix-level
   connectivity IS doc-level connectivity.

4. q_dedup_embedding — a rep-collapsed pure-python replay: buckets /
   norms / cosines once per DISTINCT embedding vector, then the global
   top-200 (cos desc, v1, v2) enumerated LAZILY from per-class sorted
   pair generators (a class = one distinct-vector pair or one
   self-pair family), so the clone's quadratic pair blowup is never
   materialized. All cosine arithmetic replays the engine's exact IEEE
   expression order, so the match is bit-for-bit.

5. q_pack_sequences — a pure-python sequential greedy walk over the
   clone's (shard, doc_id-ordered) token counts, compared row-for-row.

The naive-vs-rep independence leg for 3-5 is DedupScaleLawSpec (plain
Scala per-doc replays equal the engine on base AND an in-test clone).

Usage:
  python3 tools/scale_second_voice.py BASE_SF_DIR CLONE_DIR ENGINE_OUT_DIR FACTOR [--json OUT]

ENGINE_OUT_DIR must contain the q_<name>/ parquet dirs from
`sbt "runMain graft.Verify CLONE_DIR ENGINE_OUT_DIR"` (VERIFY_ONLY
works). Exits 1 on any mismatch, 2 on bad invocation/precondition.
"""
import heapq
import json
import math
import re
import sys

import duckdb


USAGE = ("usage: python3 tools/scale_second_voice.py "
         "BASE_SF_DIR CLONE_DIR ENGINE_OUT_DIR FACTOR [--json OUT]")


def replay_bpe(prefix_counts, rounds=3):
    # Engine convention (CorpusTokenizers.scala q_bpe_merges): truncate to
    # the 100-char prefix FIRST, then lowercase, and filter on the LOWERED
    # length. Python str indexing is by code point, the same unit as
    # Spark/DuckDB SUBSTR; main() asserts the corpus is ASCII so
    # lowercasing is length-preserving and locale-free in every voice.
    # Rep-collapsed: one sequence per DISTINCT prefix, pair counts and
    # surviving token counts weighted by the prefix's multiplicity —
    # exact because merges are a per-sequence function of the text alone.
    seqs = [(list(p), w) for p, w in prefix_counts if len(p) >= 2]
    out = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for s, w in seqs:
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + w
        (bt, bnt), bn = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        nxt = []
        for s, w in seqs:
            o, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == bt and s[i + 1] == bnt:
                    o.append(bt + bnt)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            nxt.append((o, w))
        seqs = nxt
        out.append((rnd, bt, bnt, bn, sum(len(s) * w for s, w in seqs)))
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


# ---- q_dedup_clusters replay (TextPipeline.scala constants) -----------
P31 = 2147483647
MINHASH_A = [104729 * (i + 1) + 12345 for i in range(16)]
MINHASH_B = [7919 * (i + 1) + 271 for i in range(16)]


def prefix_signature(p):
    """16-slot MinHash signature of a lowered 200-char prefix (None when
    no 5-gram exists). Mirrors TextPipeline grams/signaturesOf: char
    5-grams, H(g) = sum(cp*131^(4-k)) mod P, h_i = min((H*a_i+b_i) mod P);
    min is multiplicity-invariant so the distinct gram set suffices."""
    if len(p) < 5:
        return None
    hms = set()
    for i in range(len(p) - 4):
        hms.add((ord(p[i]) * 294499921 + ord(p[i + 1]) * 2248091
                 + ord(p[i + 2]) * 17161 + ord(p[i + 3]) * 131
                 + ord(p[i + 4])) % P31)
    return tuple(min((hm * a + b) % P31 for hm in hms)
                 for a, b in zip(MINHASH_A, MINHASH_B))


def check_dedup_clusters(con, clone, eng_out):
    groups = con.execute(
        f"SELECT LOWER(SUBSTR(text, 1, 200)) AS p, LIST(doc_id) "
        f"FROM '{clone}/documents.parquet' GROUP BY p").fetchall()
    bad = sum(1 for p, _ in groups if not p.isascii())
    if bad:
        print(f"precondition violated: {bad} non-ASCII prefixes in the "
              "clone documents", file=sys.stderr)
        sys.exit(2)
    parent = list(range(len(groups)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    sigless = []
    buckets = {}
    for idx, (p, ids) in enumerate(groups):
        sig = prefix_signature(p)
        if sig is None:
            sigless.append(idx)
            continue
        for b in range(4):
            key = (b, sig[4 * b:4 * b + 4])
            root = buckets.setdefault(key, idx)
            ra, rb = find(root), find(idx)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    sigless_set = set(sigless)
    for idx, (p, ids) in enumerate(groups):
        if idx in sigless_set:
            continue
        comp.setdefault(find(idx), []).extend(ids)
    expected = [(min(ids), len(ids), sum(ids)) for ids in comp.values()]
    for idx in sigless:
        expected.extend((i, 1, i) for i in groups[idx][1])
    expected.sort()
    got = [tuple(r) for r in con.execute(
        f"SELECT canonical_id, n_members, sum_members "
        f"FROM '{eng_out}/q_dedup_clusters/*.parquet' "
        f"ORDER BY canonical_id").fetchall()]
    ok = got == expected
    detail = {"match": ok, "n_components_engine": len(got),
              "n_components_replay": len(expected)}
    if not ok:
        diff = [(g, e) for g, e in zip(got, expected) if g != e][:3]
        detail["first_diffs"] = diff
    return ok, detail


def check_dedup_incremental(con, clone, eng_out):
    # q_dedup_incremental shares q_dedup_clusters' oracle (and its clone-
    # scale skip). Its second voice chains through the batch table:
    # engine(incremental) == engine(batch clusters) here, and
    # engine(batch clusters) == rep-collapsed python replay in
    # check_dedup_clusters — so the stream-accumulated state is tied to
    # the independent replay without re-running it.
    n = con.execute(
        f"SELECT COUNT(*) FROM '{eng_out}/q_dedup_incremental/*.parquet'"
    ).fetchone()[0]
    diff = con.execute(
        f"""SELECT COUNT(*) FROM (
              (SELECT canonical_id, n_members, sum_members
               FROM '{eng_out}/q_dedup_incremental/*.parquet'
               EXCEPT
               SELECT canonical_id, n_members, sum_members
               FROM '{eng_out}/q_dedup_clusters/*.parquet')
              UNION ALL
              (SELECT canonical_id, n_members, sum_members
               FROM '{eng_out}/q_dedup_clusters/*.parquet'
               EXCEPT
               SELECT canonical_id, n_members, sum_members
               FROM '{eng_out}/q_dedup_incremental/*.parquet'))"""
    ).fetchone()[0]
    ok = n > 0 and diff == 0
    return ok, {"match": ok, "rows": n, "symdiff_vs_batch_clusters": diff}


# ---- q_dedup_embedding replay (Embeddings.scala constants) ------------
def vec_bucket(qe, planes=8):
    bucket = 0
    for p in range(planes):
        s = sum(q * ((1103515245 * (p * 97 + i + 1) + 12345) % 2097152
                     - 1048576) for i, q in enumerate(qe))
        if s >= 0:
            bucket += 1 << p
    return bucket


def pair_stream(la, lb):
    """All unordered pairs across (or within, when lb is None) sorted id
    lists, yielded in (v1, v2) ascending order, lazily."""
    if lb is None:
        for a in range(len(la)):
            for b in range(a + 1, len(la)):
                yield (la[a], la[b])
    else:
        merged = sorted(la + lb)
        la_set = set(la)
        for x in merged:
            partners = lb if x in la_set else la
            for p in partners:
                if p > x:
                    yield (x, p)


def check_dedup_embedding(con, clone, eng_out):
    groups = con.execute(
        f"SELECT embedding, LIST(vec_id) "
        f"FROM '{clone}/embeddings.parquet' GROUP BY embedding").fetchall()
    qes, ids, n2s, bucket_members = [], [], [], {}
    for gi, (emb, vids) in enumerate(groups):
        qe = [math.floor(float(e) * 1000000) for e in emb]
        qes.append(qe)
        ids.append(sorted(vids))
        n2s.append(sum(q * q for q in qe))
        bucket_members.setdefault(vec_bucket(qe), []).append(gi)

    def cos_q6(dot, n1, n2):
        # the engine's exact IEEE order: dot / sqrt(double(n1)*n2) * 1e6
        return math.floor(dot / math.sqrt(float(n1) * float(n2)) * 1000000.0)

    # classes: (cos, class_id, generator-factory args)
    classes = []
    for members in bucket_members.values():
        for ai in range(len(members)):
            g1 = members[ai]
            if len(ids[g1]) >= 2:  # self-class: identical-vector copies
                c = cos_q6(n2s[g1], n2s[g1], n2s[g1])
                if c >= 150000:
                    classes.append((c, g1, None))
            for bi in range(ai + 1, len(members)):
                g2 = members[bi]
                dot = sum(a * b for a, b in zip(qes[g1], qes[g2]))
                c = cos_q6(dot, n2s[g1], n2s[g2])
                if c >= 150000:
                    classes.append((c, g1, g2))
    # dedupe self-classes counted once per bucket membership (a group is
    # in exactly one bucket, so no dupes occur; kept for clarity)
    expected = []
    by_cos = {}
    for c, g1, g2 in classes:
        by_cos.setdefault(c, []).append((g1, g2))
    for c in sorted(by_cos, reverse=True):
        if len(expected) >= 200:
            break
        gens = [pair_stream(ids[g1], None if g2 is None else ids[g2])
                for g1, g2 in by_cos[c]]
        for v1, v2 in heapq.merge(*gens):
            expected.append((v1, v2, c))
            if len(expected) >= 200:
                break
    got = [tuple(r) for r in con.execute(
        f"SELECT v1, v2, cos_q6 FROM '{eng_out}/q_dedup_embedding/*.parquet' "
        f"ORDER BY cos_q6 DESC, v1, v2").fetchall()]
    ok = got == expected
    detail = {"match": ok, "rows_engine": len(got), "rows_replay": len(expected),
              "n_classes_ge_threshold": len(classes)}
    if not ok:
        detail["first_diffs"] = [(g, e) for g, e in zip(got, expected)
                                 if g != e][:3]
    return ok, detail


# ---- q_pack_sequences replay (Packing.scala greedy walk) --------------
def check_pack_sequences(con, clone, eng_out):
    docs = con.execute(
        f"SELECT doc_id, LENGTH(text) // 4 "
        f"FROM '{clone}/documents.parquet' ORDER BY doc_id").fetchall()
    state = {}  # shard -> (bin_idx, bin_tok)
    expected = []
    for doc_id, tok in docs:
        shard = doc_id % 8
        if shard not in state:
            state[shard] = (0, tok)
        else:
            bin_idx, bin_tok = state[shard]
            if bin_tok + tok > 2048:
                state[shard] = (bin_idx + 1, tok)
            else:
                state[shard] = (bin_idx, bin_tok + tok)
        expected.append((doc_id, shard, state[shard][0], tok))
    got = [tuple(r) for r in con.execute(
        f"SELECT doc_id, shard, bin_idx, tok "
        f"FROM '{eng_out}/q_pack_sequences/*.parquet' "
        f"ORDER BY doc_id").fetchall()]
    ok = got == expected
    detail = {"match": ok, "rows_engine": len(got), "rows_replay": len(expected)}
    if not ok:
        detail["first_diffs"] = [(g, e) for g, e in zip(got, expected)
                                 if g != e][:3]
    return ok, detail


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

    # ---- 1. BPE: weighted python replay over the clone's distinct
    # prefixes vs engine clone output (reduces to the proved clone-lift
    # law on verbatim clones; also valid on power-skewed corpora)
    prefix_counts = con.execute(
        f"SELECT LOWER(SUBSTR(text, 1, 100)) AS p, CAST(COUNT(*) AS BIGINT) "
        f"FROM '{clone}/documents.parquet' GROUP BY p").fetchall()
    non_ascii = sum(w for p, w in prefix_counts if not p.isascii())
    if non_ascii:
        print(f"precondition violated: {non_ascii} non-ASCII document "
              "prefix(es); the cross-voice char-unit/lowercase equivalence "
              "(python code points vs Spark/DuckDB SUBSTR vs JVM UTF-16) is "
              "only proved for ASCII corpora", file=sys.stderr)
        sys.exit(2)
    replay = replay_bpe(prefix_counts)
    got = [tuple(r) for r in con.execute(
        f"SELECT round, lhs, rhs, n_pair, n_tokens_after "
        f"FROM '{eng_out}/q_bpe_merges/*.parquet' ORDER BY round").fetchall()]
    bpe_ok = got == replay
    report["bpe"] = {"match": bpe_ok, "engine": got,
                     "weighted_replay": replay,
                     "n_distinct_prefixes": len(prefix_counts)}
    print(f"bpe_merges: {'MATCH' if bpe_ok else 'MISMATCH'} "
          f"(weighted python replay over {len(prefix_counts)} distinct "
          f"prefixes vs engine)")
    if not bpe_ok:
        print(f"  engine: {got}\n  replay: {replay}")

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

    # ---- 3-5. the permanently-skipped dedup trio: rep-collapsed python
    # replays over the clone itself (clone-content-agnostic — no lift-law
    # precondition, so power clones are covered too)
    all_ok = bpe_ok and knn_ok
    for key, fn in (("dedup_clusters", check_dedup_clusters),
                    ("dedup_incremental", check_dedup_incremental),
                    ("dedup_embedding", check_dedup_embedding),
                    ("pack_sequences", check_pack_sequences)):
        ok, detail = fn(con, clone, eng_out)
        report[key] = detail
        all_ok = all_ok and ok
        print(f"{key}: {'MATCH' if ok else 'MISMATCH'} "
              + " ".join(f"{k}={v}" for k, v in detail.items()
                         if k not in ("match", "first_diffs")))
        if not ok and "first_diffs" in detail:
            print(f"  first diffs (engine, replay): {detail['first_diffs']}")

    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, default=str)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
