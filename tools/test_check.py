#!/usr/bin/env python3
"""Meta-test: tools/check.py must FAIL when spark output and oracle differ
(guards against a silently-green harness). Dev tool only.

Usage: python3 tools/test_check.py
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb


def run_check(sf_dir, out_dir):
    r = subprocess.run([sys.executable, "tools/check.py", sf_dir, out_dir],
                       capture_output=True, text=True)
    return r.returncode, r.stdout


def main():
    sf_dir = "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory() as tmp:
        # craft one query whose spark "output" is WRONG vs its oracle
        con = duckdb.connect()
        os.makedirs(f"{tmp}/q_fake")
        con.execute(f"""COPY (SELECT CAST(42 AS BIGINT) AS n)
                        TO '{tmp}/q_fake/part.parquet' (FORMAT PARQUET)""")
        json.dump({"q_fake": "SELECT CAST(43 AS BIGINT) AS n"},
                  open(f"{tmp}/oracle_sql.json", "w"))
        rc, out = run_check(sf_dir, tmp)
        assert rc == 1 and "FAIL q_fake" in out, f"harness passed a wrong result!\n{out}"

        # and a matching one must pass
        json.dump({"q_fake": "SELECT CAST(42 AS BIGINT) AS n"},
                  open(f"{tmp}/oracle_sql.json", "w"))
        rc, out = run_check(sf_dir, tmp)
        assert rc == 0 and "PASS q_fake" in out, f"harness failed a correct result!\n{out}"

        # an oracle whose native type is HUGEINT must FAIL even though the
        # stringified values match — the driver's hash is type-sensitive
        # and this is exactly how r14's q_burst_ingest shipped red
        json.dump({"q_fake": "SELECT SUM(n) AS n FROM (SELECT 42 AS n)"},
                  open(f"{tmp}/oracle_sql.json", "w"))
        rc, out = run_check(sf_dir, tmp)
        assert rc == 1 and "native type outside driver-safe set" in out, \
            f"harness passed an uncast HUGEINT oracle!\n{out}"

        # a skipped query is REDUCED COVERAGE, never a clean pass: the
        # summary must say so and the exit code must be distinct (2)
        env = dict(os.environ, GRAFT_CHECK_SKIP="q_fake")
        r = subprocess.run([sys.executable, "tools/check.py", sf_dir, tmp],
                           capture_output=True, text=True, env=env)
        assert r.returncode == 2 and "1 SKIPPED (reduced coverage)" in r.stdout, \
            f"skip not surfaced as reduced coverage!\n{r.stdout}"
    print("check.py meta-test OK (fails on mismatch, passes on match, "
          "flags skips)")


if __name__ == "__main__":
    main()
