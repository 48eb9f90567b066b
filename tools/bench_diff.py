#!/usr/bin/env python3
"""Round-over-round bench triage (dev tool only — the shipped Scala
library does not depend on this).

Compares two full Bench captures (the JSON line Bench.scala writes to
bench_full_latest.json) and prints per-query regressions worse than
REG_RATIO with an absolute delta above NOISE_SEC, plus improvements of
the same magnitude, added/removed queries, and the total. Contaminated
captures (sentinel tripped) are refused — re-measure isolated instead
of triaging noise.

Usage:
    python3 tools/bench_diff.py [old.json] [new.json]

Defaults: old = the last git-committed bench_full_latest.json
(`git show HEAD:bench_full_latest.json`), new = the working-tree
bench_full_latest.json — i.e. "what did this round's capture change".
"""
import json
import subprocess
import sys

REG_RATIO = 1.3
NOISE_SEC = 0.3


def load(arg):
    if arg.startswith("git:"):
        out = subprocess.run(
            ["git", "show", arg[4:]], capture_output=True, text=True)
        if out.returncode != 0:
            sys.exit(f"cannot read {arg}: {out.stderr.strip()}")
        return json.loads(out.stdout)
    with open(arg) as f:
        return json.load(f)


def main():
    old_arg = sys.argv[1] if len(sys.argv) > 1 else "git:HEAD:bench_full_latest.json"
    new_arg = sys.argv[2] if len(sys.argv) > 2 else "bench_full_latest.json"
    old, new = load(old_arg), load(new_arg)
    for name, cap in (("old", old), ("new", new)):
        if cap.get("contaminated"):
            sys.exit(f"{name} capture is contaminated "
                     f"(sentinel {cap.get('sentinel_before'):.2f} -> "
                     f"{cap.get('sentinel_after'):.2f} s) — re-measure isolated")
    oq, nq = old.get("queries", {}), new.get("queries", {})
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regs, imps = [], []
    for q in sorted(set(oq) & set(nq)):
        a, b = oq[q], nq[q]
        if b > a * REG_RATIO and b - a > NOISE_SEC:
            regs.append((b / a, a, b, q))
        elif a > b * REG_RATIO and a - b > NOISE_SEC:
            imps.append((a / b, a, b, q))
    print(f"old: {old['value']:.1f} s / {len(oq)} queries   "
          f"new: {new['value']:.1f} s / {len(nq)} queries")
    if added:
        t = sum(nq[q] for q in added)
        print(f"added ({len(added)}, {t:.1f} s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if regs:
        print(f"\nREGRESSIONS (> {REG_RATIO}x and > {NOISE_SEC} s):")
        for r, a, b, q in sorted(regs, reverse=True):
            print(f"  {q}: {a:.2f} -> {b:.2f} s ({r:.2f}x)")
    else:
        print(f"\nno regressions > {REG_RATIO}x")
    if imps:
        print(f"improvements (> {REG_RATIO}x):")
        for r, a, b, q in sorted(imps, reverse=True):
            print(f"  {q}: {a:.2f} -> {b:.2f} s ({r:.2f}x faster)")
    sys.exit(1 if regs else 0)


if __name__ == "__main__":
    main()
