#!/usr/bin/env python3
"""One-command scale rehearsal: rebuild the Nx clone, run the
full-registry engine pass + DuckDB differential over it, time the
slowest queries isolated, and write a machine-checkable artifact
(REHEARSAL_r{N}.json) next to CORRECTNESS. Dev tool only — the shipped
Scala library does not depend on this.

Usage:
    python3 tools/run_rehearsal.py --round 11 [--out REHEARSAL_r11.json]
        [--sf /root/testdata/sf0.1] [--clone /tmp/rehearsal32]
        [--factor 32] [--slowest 25] [--rebuild]

One of --round / --out is required (--out wins if both given) so a later
round can never silently overwrite an earlier round's committed artifact.
With --round N and a non-default factor, the default name carries the
factor too: REHEARSAL_r{N}_{factor}x.json.

Steps (all logged to stdout):
  1. Build the clone via make_rehearsal.py unless it already exists
     (pass --rebuild to force; /tmp is volatile across sessions).
  2. sbt "runMain graft.Verify <clone> <dump>" — the ENGINE side of every
     registered query at clone scale (any engine failure fails the run).
  3. tools/check.py against the clone with the known DuckDB-superlinear
     oracles skipped (KNOWN_SKIPS below — the ORACLE replay, not the
     engine, is what breaks on clone-heavy data; each carries a reason).
  4. Isolated Bench timings at clone scale for the slowest queries of the
     committed sf0.1 capture (bench_full_latest.json), so the artifact
     records the Nx-vs-sf0.1 ratio per heavy query.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Oracles DuckDB cannot replay at clone scale (the engine side still runs
# and is still required to succeed). Kept in ONE place so the rehearsal's
# coverage reduction is explicit and documented. Each of these has a
# SECOND VOICE at clone scale: tools/scale_second_voice.py replays all
# three rep-collapsed in pure python against the engine's clone output
# (run it after this rehearsal's Verify; SECONDVOICE_r{N}_*.json), with
# the naive-vs-engine independence leg in DedupScaleLawSpec.
KNOWN_SKIPS = {
    "q_dedup_clusters": "verbatim-clone fixture makes every copy collide; "
        "DuckDB's recursive cluster replay is superlinear on the clique "
        "-- covered by scale_second_voice.py (rep-collapsed union-find)",
    "q_dedup_incremental": "shares q_dedup_clusters' recursive-closure "
        "oracle verbatim, so the same clique blowup applies -- covered by "
        "scale_second_voice.py (engine-vs-engine equality with the batch "
        "clusters table, itself rep-collapse replayed)",
    "q_dedup_embedding": "same clique blowup through the embedding "
        "near-dup pair replay -- covered by scale_second_voice.py "
        "(rep-collapsed class enumeration, lazy top-200)",
    "q_pack_sequences": "DuckDB recursive packing replay is superlinear "
        "on cloned doc lengths -- covered by scale_second_voice.py "
        "(pure-python sequential walk over the clone)",
}


def run(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="round number; derives the default --out name")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--clone", default=None,
                    help="clone dir (default /tmp/rehearsal{factor}[_power] "
                         "— derived, so a power run never silently reuses a "
                         "plain clone)")
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument("--slowest", type=int, default=25)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--power", action="store_true",
                    help="build the clone with make_rehearsal --power "
                         "(adversarial per-key degree skew: power user / "
                         "power order); artifact records power: true")
    ap.add_argument("--only", default="",
                    help="comma list: restrict the ORACLE replay to these "
                         "queries (engine still runs the full registry); "
                         "for factors where a full DuckDB replay is "
                         "clone-output-bound. Artifact records the mode.")
    ap.add_argument("--skip", action="append", default=[],
                    metavar="QUERY=REASON",
                    help="extra oracle skips for this factor (e.g. "
                         "q_kcore='DuckDB peel replay spills >50GB at 100x'); "
                         "engine side still runs")
    args = ap.parse_args()
    if args.out is None:
        if args.round is None:
            ap.error("one of --round / --out is required (prevents "
                     "overwriting a previous round's committed artifact)")
        suffix = f"_{args.factor}x" if args.factor != 32 else ""
        if args.power:
            suffix += "_power"
        args.out = f"REHEARSAL_r{args.round}{suffix}.json"
    if args.clone is None:
        args.clone = (f"/tmp/rehearsal{args.factor}"
                      + ("_power" if args.power else ""))
    skips = dict(KNOWN_SKIPS)
    for item in args.skip:
        name, _, reason = item.partition("=")
        skips[name] = reason or "clone-scale DuckDB resource limit"
    os.chdir(REPO)

    built = False
    if args.rebuild or not os.path.exists(f"{args.clone}/lineitem.parquet"):
        cmd = [sys.executable, "tools/make_rehearsal.py", args.sf,
               args.clone, str(args.factor)]
        if args.power:
            cmd.append("--power")
        r = run(cmd)
        if r.returncode != 0:
            sys.exit("clone build failed")
        built = True

    dump = f"{args.clone}_verify"
    # SPARK_GRAFT_VERIFY_ONLY (inherited by the sbt child) restricts the
    # ENGINE pass too — used for wall-clock-bounded targeted runs at high
    # factors; the artifact records it so a targeted engine pass can never
    # read as full-registry engine evidence.
    engine_only = os.environ.get("SPARK_GRAFT_VERIFY_ONLY", "")
    r = run(["sbt", f"runMain graft.Verify {args.clone} {dump}"],
            capture_output=True, text=True)
    engine_failures = re.findall(r"\[verify\] \S+ failed.*",
                                 r.stdout + r.stderr)
    if r.returncode != 0 or engine_failures:
        print(r.stdout[-4000:])
        sys.exit(f"engine verify failed at clone scale: {engine_failures[:5]}")

    env = dict(os.environ, GRAFT_CHECK_SKIP=",".join(skips))
    if args.only:
        env["GRAFT_CHECK_ONLY"] = args.only
    r = run([sys.executable, "tools/check.py", args.clone, dump],
            env=env, capture_output=True, text=True)
    print(r.stdout[-2000:])
    results = {}
    for line in r.stdout.splitlines():
        m = re.match(r"(PASS|FAIL|SKIP) (\S+?):?(?: |$)", line)
        if m:
            results[m.group(2)] = m.group(1).lower()
    n_pass = sum(1 for v in results.values() if v == "pass")
    n_fail = sum(1 for v in results.values() if v == "fail")
    n_skip = sum(1 for v in results.values() if v == "skip")

    timings = {}
    try:
        base = json.load(open("bench_full_latest.json"))["queries"]
    except Exception:
        base = {}
    slow = sorted(base, key=base.get, reverse=True)[:args.slowest]
    slow = [q for q in slow if results.get(q) != "skip"]
    if slow:
        # read the FULL per-query JSON via an explicit out file — the
        # stdout line is a compact headline truncated to the 24 slowest,
        # which silently drops timings when --slowest > 24
        bench_out = f"{args.clone}_bench.json"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.clone,
                   SPARK_GRAFT_BENCH_ONLY=",".join(slow),
                   SPARK_GRAFT_BENCH_OUT=bench_out)
        r = run(["sbt", "runMain graft.Bench"],
                env=env, capture_output=True, text=True)
        cap = None
        try:
            cap = json.load(open(bench_out))
        except Exception:
            m = re.search(r'\{"metric".*\}', r.stdout)
            if m:
                cap = json.loads(m.group(0))
        if cap:
            for q, sec in cap["queries"].items():
                timings[q] = {
                    "sf01_sec": round(base.get(q, 0.0), 3),
                    "rehearsal_sec": round(sec, 3),
                    "ratio": round(sec / base[q], 2) if base.get(q) else None,
                }
            if cap.get("contaminated"):
                timings["_contaminated"] = True

    artifact = {
        "oracle_mode": "targeted" if args.only else "full",
        "engine_mode": ("targeted (SPARK_GRAFT_VERIFY_ONLY)" if engine_only
                        else "full registry"),
        "sf": args.sf,
        "clone": args.clone,
        "factor": args.factor,
        "power": args.power,
        "clone_rebuilt": built,
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_skip": n_skip,
        "known_skips": skips,
        "results": dict(sorted(results.items())),
        "slowest_isolated": dict(sorted(timings.items())),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {args.out}: {n_pass} pass / {n_fail} fail / "
          f"{n_skip} skip at {args.factor}x")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
