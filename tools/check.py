#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
run graft.Verify output vs DuckDB oracle on the same sf dir.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(dev tool only — the shipped Scala library does not depend on this)
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB native types an oracle projection may produce. Everything the
# engine emits lands in this set when read back from parquet; an oracle
# column outside it (HUGEINT from an uncast SUM, DECIMAL from uncast
# arithmetic) is exactly the class the driver's type-sensitive hash
# rejects even when stringified values match (r14: q_burst_ingest).
ALLOWED_TYPES = {"VARCHAR", "BIGINT", "DOUBLE", "DATE", "TIMESTAMP",
                 "BOOLEAN", "INTEGER"}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def df_key(rows, cols):
    # sort columns by name, then rows lexicographically (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [tuple(sorted(cols))] + data


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GRAFT_CHECK_SKIP=q_a,q_b: skip oracles that are superlinear in DuckDB
    # on clone-heavy rehearsal data (e.g. the recursive transitive closure)
    # — the ENGINE side still ran; only the oracle replay is skipped
    skip = set(filter(None,
                      os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    # GRAFT_CHECK_ONLY=q_a,q_b: restrict to a subset (dev loop / resuming a
    # long rehearsal check); queries outside the subset are not counted
    only = set(filter(None,
                      os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (GRAFT_CHECK_SKIP)")
            n_skip += 1
            continue
        try:
            rel = con.sql(sql)
            exp_cols = list(rel.columns)
            exp_types = [str(t) for t in rel.types]
            exp_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # Native-type gate: the driver's hash is type-sensitive, while the
        # row compare below stringifies values. An oracle projection that
        # comes back HUGEINT/DECIMAL (e.g. an uncast SUM) hash-matches here
        # but fails the driver (r14: q_burst_ingest). Fail locally first.
        bad = [(c, t) for c, t in zip(exp_cols, exp_types)
               if t.split("(")[0] not in ALLOWED_TYPES]
        if bad:
            print(f"FAIL {name}: oracle native type outside driver-safe set: "
                  + ", ".join(f"{c}:{t}" for c, t in bad)
                  + "  (cast the projection, e.g. CAST(SUM(x) AS BIGINT))")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        a, b = df_key(exp_rows, exp_cols), df_key(got_rows, got_cols)
        if a == b:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(exp_rows)} vs {len(got_rows)}")
            if a[0] != b[0]:
                print(f"  cols oracle={a[0]}\n  cols spark ={b[0]}")
            else:
                diffs = [(x, y) for x, y in zip(a[1:], b[1:]) if x != y]
                for x, y in diffs[:3]:
                    print(f"  oracle: {x}\n  spark : {y}")
                if len(a) != len(b):
                    print(f"  row-count mismatch {len(a)-1} vs {len(b)-1}")
    # skips are REDUCED COVERAGE, not passes: surface them in the summary
    # so a skipped superlinear oracle can't be mistaken for a full
    # differential run (nonzero skips → distinct exit code 2)
    tail = f" / {n_skip} SKIPPED (reduced coverage)" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{tail}")
    sys.exit(1 if n_fail else (2 if n_skip else 0))


if __name__ == "__main__":
    main()
