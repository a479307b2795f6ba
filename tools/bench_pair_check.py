#!/usr/bin/env python3
"""Quiet-window bench pair consistency check.

Usage: bench_pair_check.py <run1.json> <run2.json> [prev.json]

Compares two same-config Bench JSON lines (fresh JVMs, same SF):
  - totals and per-query medians side by side;
  - flags any query whose two medians disagree > 1.5x at min > 1 s
    (the verdict's host-noise significance bar);
  - with a third file (e.g. the previous round's run), flags
    regressions of min(run1, run2) vs that baseline by the same bar.

Exit code = number of flagged pairs/regressions, so round logs can
quote a hard zero.
"""
import json
import sys


def load(path):
    with open(path) as f:
        line = [l for l in f if '"metric"' in l][-1]
    return json.loads(line[line.index("{"):])


def main(argv):
    a, b = load(argv[1]), load(argv[2])
    qa, qb = a["queries"], b["queries"]
    names = sorted(set(qa) & set(qb))
    # a query present in only one run (or errored -> null) is itself a
    # finding, never silently dropped by the intersection
    missing = sorted(set(qa) ^ set(qb)) \
        + sorted(n for n in names if qa[n] is None or qb[n] is None)
    names = [n for n in names if qa[n] is not None and qb[n] is not None]
    flagged = []
    for n in names:
        x, y = qa[n], qb[n]
        if min(x, y) > 1.0 and max(x, y) > 1.5 * min(x, y):
            flagged.append((n, x, y))
    print(f"run1 total={a['value']}s run2 total={b['value']}s "
          f"queries={len(names)}")
    for n in missing:
        print(f"  MISSING/ERRORED {n}: run1={qa.get(n)} run2={qb.get(n)}")
    for n, x, y in flagged:
        print(f"  PAIR-DISAGREE {n}: {x} vs {y}")
    regs = []
    if len(argv) > 3:
        prev = load(argv[3])["queries"]
        for n in names:
            best = min(qa[n], qb[n])
            # bar on the NEW best, not min(prev, best): a 0.5 s -> 5 s
            # regression must flag even though its baseline is
            # sub-second; requiring BOTH fresh-JVM runs over the bar
            # keeps single stall windows from false-flagging
            if n in prev and prev[n] is not None and best > 1.0 \
                    and best > 1.5 * prev[n]:
                regs.append((n, prev[n], best))
        for n, p, c in regs:
            print(f"  REGRESSION {n}: prev={p} now={c}")
    print(f"{len(flagged)} pair disagreements, {len(regs)} regressions, "
          f"{len(missing)} missing/errored "
          f"(bars: pair >1.5x at min >1 s; regression best-of-pair "
          f">1.5x prev at >1 s)")
    # cap: a shell exit status is mod 256 — 256 findings must not
    # read as success
    return min(100, len(flagged) + len(regs) + len(missing))


if __name__ == "__main__":
    sys.exit(main(sys.argv))
