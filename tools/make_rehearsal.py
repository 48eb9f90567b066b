#!/usr/bin/env python3
"""Build a scaled clone of a testdata sf dir for scale rehearsals
(dev tool only — the shipped Scala library does not depend on this).

Clones documents/embeddings Nx, lineitem/orders ~5N/8x, events ~3N/8x
(key-offset so keys stay unique; document text is cloned VERBATIM — the
dedup worst case, identical copies maximize LSH/band collisions).
Dimensions copy as-is. N defaults to 8 (the round-4 rehearsal geometry);
pass a third argument to scale further. Run the differential against the
result:

    python3 tools/make_rehearsal.py /root/testdata/sf0.01 /tmp/rehearsal [N]
    sbt "runMain graft.Verify /tmp/rehearsal /tmp/verify_rehearsal"
    python3 tools/check.py /tmp/rehearsal /tmp/verify_rehearsal

--power additionally injects per-key degree skew the verbatim clone can
never produce (clones multiply ROWS but keep per-key item degrees):
  - events gains ONE power user holding 2100 distinct items — 2000 of
    them new vocabulary, so |V| = 2100 and the capItemsPerKey bound
    (GREATEST(64, 4·isqrt|V|) = 180) genuinely truncates (2100 -> 180);
    its events are 1 h apart so sessionizers see many 1-event sessions,
    not one mega-basket.
  - lineitem gains ONE power order holding the 2000 smallest partkeys
    (|parts| = 20000 -> cap 564 truncates 2000 -> 564), each line
    templated from a real row of that part so every non-key column
    stays realistic.
  - documents gains ONE power SOURCE ('src999', 250·factor docs —
    tying the largest base source's clone mass) whose texts share a hot
    five-token vocabulary repeated into an identical >100-char prefix,
    with a unique tail making every full text distinct. This is the
    doc-corpus skew a verbatim clone can never produce: the hot grams'
    document frequency blows past every df cap (rare-gram candidate
    joins, kNN postings, source-overlap gram sets must TRUNCATE the hot
    mass, not enumerate it), the identical prefix floods one LSH
    cluster/BPE prefix class, and the power clone's second voice
    genuinely diverges from the plain clone's (different BPE merge
    table, different df-cap cutoffs).
Both engines read the same parquet, so every oracle stays valid; the
point is showing the capped families flat under adversarial per-key
degree and per-source text mass, not just row volume.
"""
import argparse
import os
import sys

import duckdb

COPY = ["region", "nation", "customer", "supplier", "part"]

POWER_USER = 3_999_999_999  # beyond any clone's user_id offset range
POWER_EVENT_ITEMS = 2100
POWER_ORDER_PARTS = 2000
# beyond any clone's doc_id offset range (k*1e7, factor <= ~160) but
# BELOW Long.Max / 2654435761 ~= 3.47e9 — the Knuth-hash samplers
# multiply doc_id by that constant and ANSI Spark errors on overflow
POWER_DOC_BASE = 2_000_000_000
POWER_DOC_HOT = "zq vortex quill zephyr xylem "  # hot vocabulary block
POWER_DOCS_PER_FACTOR = 250  # ties the largest base source per clone copy


def power_events_sql(src, cols):
    """One power user, one row per item 0..2099; columns emitted in table
    order so the UNION ALL with the clone parts lines up positionally."""
    overrides = {
        "event_id": f"(SELECT MAX(event_id) FROM '{src}/events.parquet') + 1 + i AS event_id",
        "ts": "TIMESTAMP '2024-03-01 00:00:00' + i * INTERVAL 1 HOUR AS ts",
        "user_id": f"CAST({POWER_USER} AS BIGINT) AS user_id",
        "event_type": "'view' AS event_type",
        "value": "CAST(1.0 AS DOUBLE) AS value",
        "props": "'{\"k\": ' || i || '}' AS props",
    }
    sel = ", ".join(overrides.get(c, f"NULL AS {c}") for c in cols)
    return (f"SELECT {sel} FROM (SELECT CAST(UNNEST(RANGE(0, "
            f"{POWER_EVENT_ITEMS})) AS BIGINT) AS i)")


def power_lineitem_sql(src, cols):
    """One power order over the POWER_ORDER_PARTS smallest partkeys, each
    line templated from that part's first real row (deterministic pick);
    columns emitted in table order for the positional UNION ALL."""
    sel = ", ".join(
        f"(SELECT MAX(l_orderkey) FROM '{src}/lineitem.parquet') + 1 AS l_orderkey"
        if c == "l_orderkey"
        else "CAST(ROW_NUMBER() OVER (ORDER BY l_partkey) AS INTEGER) AS l_linenumber"
        if c == "l_linenumber" else c
        for c in cols)
    return f"""
    SELECT {sel} FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                                   ORDER BY l_orderkey, l_linenumber) AS rn_pow
      FROM '{src}/lineitem.parquet'
      WHERE l_partkey IN (SELECT DISTINCT l_partkey
                          FROM '{src}/lineitem.parquet'
                          ORDER BY l_partkey LIMIT {POWER_ORDER_PARTS})
    ) WHERE rn_pow = 1"""


def power_docs_sql(cols, factor):
    """One power source: 250·factor docs sharing a hot-vocabulary block
    repeated into an identical 145-char prefix, each with a unique tail
    token; columns emitted in table order for the positional UNION ALL."""
    n = POWER_DOCS_PER_FACTOR * factor
    text = f"REPEAT('{POWER_DOC_HOT}', 5) || 'tail' || i"
    overrides = {
        "doc_id": f"CAST({POWER_DOC_BASE} + i AS BIGINT) AS doc_id",
        "text": f"{text} AS text",
        "lang": "'en' AS lang",
        "source": "'src999' AS source",
        "n_chars": f"CAST(LENGTH({text}) AS BIGINT) AS n_chars",
    }
    sel = ", ".join(overrides.get(c, f"NULL AS {c}") for c in cols)
    return (f"SELECT {sel} FROM (SELECT CAST(UNNEST(RANGE(0, {n})) "
            f"AS BIGINT) AS i)")


def clones(n):
    scale = lambda k: max(1, round(k * n / 8))
    return {
        "documents": ("doc_id", scale(8), 10_000_000),
        "embeddings": ("vec_id", scale(8), 10_000_000),
        "lineitem": ("l_orderkey", scale(5), 100_000_000),
        "orders": ("o_orderkey", scale(5), 100_000_000),
        "events": ("event_id", scale(3), 100_000_000),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("factor", nargs="?", type=int, default=8)
    ap.add_argument("--power", action="store_true",
                    help="inject the power user / power order skew rows")
    args = ap.parse_args()
    src, out = args.src, args.out
    CLONES = clones(args.factor)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)")
    for t, (key, n, offset) in CLONES.items():
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").description]
        # user_id also offsets in events so window-key cardinality scales
        extra = "user_id" if t == "events" else None
        parts = []
        for k in range(n):
            sel = ", ".join(
                f"{c} + {k * offset} AS {c}" if c == key
                else (f"{c} + {k * 1000} AS {c}" if c == extra else c)
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        if args.power and t == "events":
            parts.append(power_events_sql(src, cols))
        if args.power and t == "lineitem":
            parts.append(power_lineitem_sql(src, cols))
        if args.power and t == "documents":
            parts.append(power_docs_sql(cols, args.factor))
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)")
    for t in list(CLONES) + COPY:
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    if args.power:
        pu = con.execute(
            f"SELECT COUNT(DISTINCT props->>'k') FROM '{out}/events.parquet'"
            f" WHERE user_id = {POWER_USER}").fetchone()[0]
        po = con.execute(
            f"SELECT MAX(c) FROM (SELECT COUNT(DISTINCT l_partkey) AS c"
            f" FROM '{out}/lineitem.parquet' GROUP BY l_orderkey)").fetchone()[0]
        pd_, pdd = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT text)"
            f" FROM '{out}/documents.parquet' WHERE source = 'src999'"
        ).fetchone()
        print(f"power: user {POWER_USER} holds {pu} items; "
              f"widest order holds {po} parts; src999 holds {pd_} docs "
              f"({pdd} distinct texts, one shared 145-char prefix)")


if __name__ == "__main__":
    main()
