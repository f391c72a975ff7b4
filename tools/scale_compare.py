#!/usr/bin/env python3
"""Compare the scale-suite bench records across scale factors.

Usage: scale_compare.py A.json B.json [--step N] [--bar X]

Prints per-query wall-clock growth over the data step from record A to
record B and flags queries above the bar. The bar is derived from the
DATA step (VERDICT r9 #2 — the old fixed 15 default encoded "10x
linear * 1.5 super-linear allowance" but the tool was step-agnostic,
so a 100x comparison misgraded sublinear queries as FAIL):

  --step N   data-volume ratio B/A (default 10; e.g. 100 for sf0.1->sf10)
  --bar X    override the bar (default step * 1.5)

When the step spans more than one decade, a per-decade column
(ratio^(1/log10(step))) is printed — the repo's standing bar is
"<= 15x per 10x step", so the per-decade number is the one SCALE.md
gates on. Exits non-zero if any query exceeds the bar.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    argv = sys.argv[1:]
    step, bar = 10.0, None
    pos = []
    i = 0
    while i < len(argv):
        if argv[i] == "--step":
            step = float(argv[i + 1]); i += 2
        elif argv[i] == "--bar":
            bar = float(argv[i + 1]); i += 2
        else:
            pos.append(argv[i]); i += 1
    if len(pos) < 2:
        print(__doc__)
        sys.exit(2)
    # Back-compat: a bare numeric third positional is the bar.
    if len(pos) > 2:
        bar = float(pos[2])
    a, b = load(pos[0]), load(pos[1])
    if bar is None:
        bar = step * 1.5
    decades = math.log10(step) if step > 1 else 1.0
    if a.get("code") and b.get("code") and a["code"] != b["code"]:
        print("WARNING: records were produced by DIFFERENT source trees "
              f"(code {a['code'][:8]} vs {b['code'][:8]}) — ratios mix code "
              "changes with data growth")
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    missing = sorted(set(qa) ^ set(qb))
    if missing:
        print(f"WARNING: queries not in both records: {missing}")
    rows = [(q, qa[q], qb[q], qb[q] / max(qa[q], 1e-9)) for q in common]
    rows.sort(key=lambda r: -r[3])
    dec_hdr = f" {'per-dec':>8s}" if decades > 1 else ""
    print(f"{'query':55s} {'sfA(s)':>8s} {'sfB(s)':>8s} {'ratio':>7s}{dec_hdr}")
    offenders = []

    def perdec(r):
        return r ** (1.0 / decades) if r > 0 else 0.0

    for q, ta, tb, r in rows:
        flag = " <-- OVER BAR" if r > bar else ""
        # A query that got much FASTER over more data is a measurement
        # artifact, not a win (a warm training memo once recorded a
        # 0.05x "ratio"). Warn, don't fail — sub-second queries jitter.
        if r < 0.5 and ta > 1.0:
            flag = " <-- SUSPICIOUS DROP (measurement artifact?)"
        if r > bar:
            offenders.append((q, round(r, 2)))
        dec = f" {perdec(r):7.2f}x" if decades > 1 else ""
        print(f"{q:55s} {ta:8.2f} {tb:8.2f} {r:6.2f}x{dec}{flag}")
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    dec = f" {perdec(tb / ta):7.2f}x" if decades > 1 else ""
    print(f"\n{'TOTAL':55s} {ta:8.2f} {tb:8.2f} {tb / ta:6.2f}x{dec}"
          f"  (n={len(common)}, step={step:g}x, bar={bar:g}x)")
    for key in ("dag_build",):
        if key in a and key in b:
            print(f"{key:55s} {a[key]:8.2f} {b[key]:8.2f} {b[key] / max(a[key], 1e-9):6.2f}x")
    if "dag" in a and "dag" in b:
        for q in sorted(set(a["dag"]) & set(b["dag"])):
            da, db = a["dag"][q], b["dag"][q]
            if da > 0 and db > 0:
                print(f"dag:{q:51s} {da:8.2f} {db:8.2f} {db / da:6.2f}x")
    if offenders:
        print(f"\nFAIL: {len(offenders)} queries above {bar:g}x "
              f"(step {step:g}x): {offenders}")
        sys.exit(1)
    print(f"\nPASS: every query within the super-linear bar ({bar:g}x over a {step:g}x step)")


if __name__ == "__main__":
    main()
