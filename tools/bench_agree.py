#!/usr/bin/env python3
"""Two-run bench agreement check, as code (round-9 protocol).

This host shows rare but large stall windows (documented in ROUND9.md:
a single window inflated one run's total 214.6 s -> 168.1 s on
identical code). The manual protocol was: run the bench twice, compare
per-query MEDIANS for the headline, and adjudicate any apparent
regression by comparing MINS (a stall inflates median and max, almost
never the min of interleaved fresh-JVM passes). This script makes the
protocol mechanical:

  python3 tools/bench_agree.py                  # two fresh Bench runs
  python3 tools/bench_agree.py a.json b.json    # compare saved details

Each Bench run writes BENCH_DETAIL.json (medians + mins + maxs per
query); the script snapshots it between runs. Agreement criteria:

  * totals within --total-tol (default 12%, the observed interleaved
    spread in ROUND9.md was ~8%)
  * no query whose MINS disagree by more than --query-tol (default
    50%) AND more than --abs-floor seconds (default 1.0 s): min-vs-min
    disagreement is the code-regression signal that median noise
    cannot explain away

Exit 0 = agree; exit 1 = disagreement (listed per query); exit 2 =
harness failure (a run errored). Env (SPARK_GRAFT_SF_DIR etc.) passes
through to Bench unchanged.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

DETAIL = "BENCH_DETAIL.json"


def run_bench(tag: str) -> dict:
    cmd = ["sbt", "-batch", "runMain graft.Bench"]
    print(f"[bench_agree] run {tag}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:])
        sys.exit(2)
    if not os.path.exists(DETAIL):
        sys.stderr.write(f"[bench_agree] {DETAIL} missing after run {tag}\n")
        sys.exit(2)
    snap = f"{DETAIL}.{tag}"
    shutil.copyfile(DETAIL, snap)
    with open(snap) as f:
        return json.load(f)


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("details", nargs="*",
                    help="two saved BENCH_DETAIL.json files; "
                         "omit to run Bench twice now")
    ap.add_argument("--total-tol", type=float, default=0.12,
                    help="allowed relative total disagreement")
    ap.add_argument("--query-tol", type=float, default=0.50,
                    help="allowed relative per-query MIN disagreement")
    ap.add_argument("--abs-floor", type=float, default=1.0,
                    help="ignore per-query deltas below this many seconds")
    args = ap.parse_args()

    if len(args.details) == 2:
        a, b = load(args.details[0]), load(args.details[1])
    elif not args.details:
        a, b = run_bench("run1"), run_bench("run2")
    else:
        ap.error("pass exactly two detail files, or none")

    for tag, d in (("run1", a), ("run2", b)):
        if d.get("n_errors", 0):
            print(f"[bench_agree] {tag} had {d['n_errors']} query errors: "
                  f"{sorted(d.get('errors', {}))}")
            return 2

    ta, tb = a["value"], b["value"]
    rel_total = abs(ta - tb) / max(ta, tb)
    print(f"[bench_agree] totals: {ta:.1f}s vs {tb:.1f}s "
          f"(disagreement {rel_total:.1%}, tolerance {args.total_tol:.0%})")

    bad = []
    shared = sorted(set(a["queries"]) & set(b["queries"]))
    dropped = sorted(set(a["queries"]) ^ set(b["queries"]))
    if dropped:
        print(f"[bench_agree] note: {len(dropped)} queries present in only "
              f"one run (catalog changed between runs?): {dropped[:6]}...")
    for q in shared:
        ma, mb = a["min"][q], b["min"][q]
        if ma is None or mb is None:
            continue
        delta = abs(ma - mb)
        rel = delta / max(ma, mb) if max(ma, mb) > 0 else 0.0
        if rel > args.query_tol and delta > args.abs_floor:
            bad.append((q, ma, mb, rel))

    if bad:
        print(f"[bench_agree] {len(bad)} per-query MIN disagreements "
              f"(>{args.query_tol:.0%} and >{args.abs_floor}s):")
        for q, ma, mb, rel in sorted(bad, key=lambda x: -x[3]):
            print(f"  {q}: min {ma:.2f}s vs {mb:.2f}s ({rel:.0%})")
    else:
        print("[bench_agree] per-query mins agree")

    ok = rel_total <= args.total_tol and not bad
    print(f"[bench_agree] {'AGREE' if ok else 'DISAGREE'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
