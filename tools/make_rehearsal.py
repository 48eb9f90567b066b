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
"""
import os
import sys

import duckdb

COPY = ["region", "nation", "customer", "supplier", "part"]


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
    src, out = sys.argv[1], sys.argv[2]
    CLONES = clones(int(sys.argv[3]) if len(sys.argv) > 3 else 8)
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
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)")
    for t in list(CLONES) + COPY:
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
