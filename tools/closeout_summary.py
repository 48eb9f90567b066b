#!/usr/bin/env python3
"""Print the end-of-round close-out tally lines FROM THE ARTIFACTS, so the
NEXT.md prose can never drift from the committed JSONs (r11 lesson: the
close-out said 198.0 s while the committed capture recorded 188.8 s —
the capture had been regenerated after the prose was written).

Usage: python3 tools/closeout_summary.py [--round N]
Reads bench_full_latest.json, COVERAGE via tools/check_coverage.py, and
every REHEARSAL_r{N}*.json / SECONDVOICE*.json present for the round.
"""
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = None
    argv = sys.argv[1:]
    if "--round" in argv:
        rnd = int(argv[argv.index("--round") + 1])

    def fmt(v, spec="{:.2f}"):
        # Older captures may miss sentinel/value fields — print n/a
        # instead of crashing the tally tool.
        return spec.format(v) if isinstance(v, (int, float)) else "n/a"

    cap = json.load(open(os.path.join(REPO, "bench_full_latest.json")))
    sb, sa = cap.get("sentinel_before"), cap.get("sentinel_after")
    print(f"bench: {cap.get('n_queries', 'n/a')} queries / "
          f"{fmt(cap.get('value'), '{:.1f}')} s "
          f"(median-of-{cap.get('runs_per_query', '?')}, "
          f"sentinel {fmt(sb)}->{fmt(sa)} s, "
          f"contaminated={str(cap.get('contaminated', False)).lower()})")

    # The driver re-benches AFTER the builder's close-out, so the worktree
    # bench_full_latest.json routinely shadows the committed BENCH_r{N}.json
    # with per-query drift. Print BOTH totals whenever the round's driver
    # capture differs, so the discrepancy is self-documenting (r12/r13
    # judge nit) instead of re-derived from git diff each round.
    if rnd is not None:
        drv_path = os.path.join(REPO, f"BENCH_r{rnd:02d}.json")
        if not os.path.exists(drv_path):
            drv_path = os.path.join(REPO, f"BENCH_r{rnd}.json")
        if os.path.exists(drv_path):
            drv = json.load(open(drv_path))
            # driver wrapper schema: totals live under "parsed" (may be
            # null if the driver didn't parse the Bench line)
            core = drv.get("parsed") if isinstance(drv.get("parsed"), dict) \
                else drv
            # the driver wrapper often ships parsed:null with the Bench
            # metric line embedded in its raw stdout `tail` — recover the
            # LAST such line so the dual-capture comparison still fires
            # (r14: this tool printed "cannot compare" against the very
            # capture it was built to cross-check)
            if not (isinstance(core, dict)
                    and isinstance(core.get("value"), (int, float))) \
                    and isinstance(drv.get("tail"), str):
                ms = re.findall(r'\{"metric":"total".*?\}(?=\s|$)',
                                drv["tail"])
                for m in reversed(ms):
                    try:
                        core = json.loads(m)
                        break
                    except json.JSONDecodeError:
                        continue
            val = core.get("value") if isinstance(core, dict) else None
            if not isinstance(val, (int, float)):
                print(f"  (driver capture {os.path.basename(drv_path)} "
                      "carries no parsed totals — cannot compare)")
            elif val != cap.get("value"):
                # a Bench stdout headline truncates `queries` to the 24
                # slowest — n_total carries the real count
                nq = core.get("n_total", len(core.get("queries", {})))
                print(f"  (driver capture {os.path.basename(drv_path)}: "
                      f"{fmt(val, '{:.1f}')} s / "
                      f"{nq} queries — differs "
                      "from the worktree capture above; per-query drift "
                      "between the builder's and the driver's benches)")
            else:
                print(f"  (driver capture {os.path.basename(drv_path)} "
                      "matches the worktree capture: "
                      f"{fmt(val, '{:.1f}')} s)")

    cov = subprocess.run([sys.executable,
                          os.path.join(REPO, "tools/check_coverage.py")],
                         capture_output=True, text=True)
    tail = [l for l in cov.stdout.strip().splitlines() if l][-2:]
    print(f"coverage (exit {cov.returncode}): " + " | ".join(tail))

    pats = ([f"REHEARSAL_r{rnd}*.json"] if rnd else ["REHEARSAL_r*.json"])
    for pat in pats:
        for p in sorted(glob.glob(os.path.join(REPO, pat))):
            r = json.load(open(p))
            print(f"{os.path.basename(p)}: {r.get('n_pass', 'n/a')} pass / "
                  f"{r.get('n_fail', 'n/a')} fail / {r.get('n_skip', 'n/a')} skip "
                  f"(factor {r.get('factor')}, power={r.get('power')}, "
                  f"oracle_mode={r.get('oracle_mode', 'full')})")
    for p in sorted(glob.glob(os.path.join(REPO, "SECONDVOICE*.json"))):
        r = json.load(open(p))
        # Every dict-valued entry with a "match" key is a check — the set
        # grows round over round, so enumerate instead of hardcoding.
        checks = {k: v for k, v in r.items()
                  if isinstance(v, dict) and "match" in v}
        parts = [f"{k}={'MATCH' if v.get('match') else 'MISMATCH'}"
                 for k, v in sorted(checks.items())]
        print(f"{os.path.basename(p)}: " + " ".join(parts or ["(no checks)"])
              + f" (factor {r.get('factor', 'n/a')})")


if __name__ == "__main__":
    main()
