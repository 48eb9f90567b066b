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
Both engines read the same parquet, so every oracle stays valid; the
point is showing the capped bipartite/CF family flat under adversarial
per-key degree, not just row volume.
"""
import argparse
import os
import sys

import duckdb

COPY = ["region", "nation", "customer", "supplier", "part"]

POWER_USER = 3_999_999_999  # beyond any clone's user_id offset range
POWER_EVENT_ITEMS = 2100
POWER_ORDER_PARTS = 2000


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
        print(f"power: user {POWER_USER} holds {pu} items; "
              f"widest order holds {po} parts")


if __name__ == "__main__":
    main()
