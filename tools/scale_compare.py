#!/usr/bin/env python3
"""Compare the scale-suite bench records across scale factors.

Usage: scale_compare.py BENCH_FULL_scale_sf0.1.json BENCH_FULL_sf1.json [max_ratio]

Prints per-query wall-clock growth over the (10x) data step, flags
queries above `max_ratio` (default 15 = 10x linear * 1.5 super-linear
allowance, the VERDICT r8 #1 bar), and summarizes the DAG lane. Exits
non-zero if any query exceeds the bar.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    missing = sorted(set(qa) ^ set(qb))
    if missing:
        print(f"WARNING: queries not in both records: {missing}")
    rows = [(q, qa[q], qb[q], qb[q] / max(qa[q], 1e-9)) for q in common]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':55s} {'sfA(s)':>8s} {'sfB(s)':>8s} {'ratio':>7s}")
    offenders = []
    for q, ta, tb, r in rows:
        flag = " <-- OVER BAR" if r > max_ratio else ""
        # A query that got much FASTER over more data is a measurement
        # artifact, not a win (a warm training memo once recorded a
        # 0.05x "ratio"). Warn, don't fail — sub-second queries jitter.
        if r < 0.5 and ta > 1.0:
            flag = " <-- SUSPICIOUS DROP (measurement artifact?)"
        if r > max_ratio:
            offenders.append((q, r))
        print(f"{q:55s} {ta:8.2f} {tb:8.2f} {r:6.2f}x{flag}")
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(f"\n{'TOTAL':55s} {ta:8.2f} {tb:8.2f} {tb / ta:6.2f}x  (n={len(common)}, bar={max_ratio}x)")
    for key in ("dag_build",):
        if key in a and key in b:
            print(f"{key:55s} {a[key]:8.2f} {b[key]:8.2f} {b[key] / max(a[key], 1e-9):6.2f}x")
    if "dag" in a and "dag" in b:
        for q in sorted(set(a["dag"]) & set(b["dag"])):
            da, db = a["dag"][q], b["dag"][q]
            if da > 0 and db > 0:
                print(f"dag:{q:51s} {da:8.2f} {db:8.2f} {db / da:6.2f}x")
    if offenders:
        print(f"\nFAIL: {len(offenders)} queries above {max_ratio}x: {offenders}")
        sys.exit(1)
    print("\nPASS: every query within the super-linear bar")


if __name__ == "__main__":
    main()
