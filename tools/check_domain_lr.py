#!/usr/bin/env python3
"""Independent cross-check for the hashed-trigram domain classifier.

Retrains the whole model from the raw documents parquet with a
from-scratch numpy implementation (same spec: lowercased [a-z0-9]+
pre-tokens joined by single spaces, char trigrams, md5[:12-hex] % 256
buckets, l1-normalized ×16 features + bias, integer keyword-density
teacher 100*kw >= 13*n, full-batch logistic GD lr=2.0 × 20 iters) and
compares against the engine's Verify dumps.

The engine quantizes gradient contributions to DECIMAL(38,18) for
partition-order independence; this mirror sums in float64 — the drift
is ~1e-13/iteration, far below the comparison tolerances. Integer
columns (label / prediction / agreement counts) must match EXACTLY
(the closest score to the 0.5 cut sits ~4.7e-4 away on this corpus,
orders of magnitude beyond both engines' noise).

Usage: python3 tools/check_domain_lr.py [SF_DIR] [VERIFY_OUT_DIR]
"""
import glob
import hashlib
import re
import sys

import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

DIMS = 256
KW = {"spark", "query", "join", "hash"}
THRESH_PCT = 13
SCALE = 16.0
LR = 2.0
ITERS = 20
TOL = 5.05e-5


def bucket(tg):
    return int(hashlib.md5(tg.encode()).hexdigest()[:12], 16) % DIMS


def featurize(docs):
    n = len(docs)
    X = np.zeros((n, DIMS + 1))
    Y = np.zeros(n)
    for k, t in enumerate(docs["text"]):
        ws = re.findall(r"[a-z0-9]+", t.lower())
        kw = sum(1 for w in ws if w in KW)
        Y[k] = 1.0 if ws and 100 * kw >= THRESH_PCT * len(ws) else 0.0
        s = " ".join(ws)
        cnt = {}
        for i in range(len(s) - 2):
            b = bucket(s[i : i + 3])
            cnt[b] = cnt.get(b, 0) + 1
        tot = float(sum(cnt.values()))
        for b, c in cnt.items():
            X[k, b] = SCALE * c / tot
        X[k, DIMS] = 1.0
    return X, Y


def load(name):
    f = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(p) for p in f], ignore_index=True)


def main():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    X, Y = featurize(docs)
    n = len(Y)
    w = np.zeros(DIMS + 1)
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= LR * (X.T @ (p - Y)) / n
    p = 1.0 / (1.0 + np.exp(-(X @ w)))

    ok = True

    mine = (
        pd.DataFrame(
            {
                "source": docs["source"],
                "label": Y,
                "pred": (p >= 0.5).astype(int),
                "agree": ((p >= 0.5) == (Y == 1)).astype(int),
                "score": p,
            }
        )
        .groupby("source")
        .agg(
            n_docs=("label", "size"),
            n_teacher_pos=("label", "sum"),
            n_pred_pos=("pred", "sum"),
            n_agree=("agree", "sum"),
            mean_score=("score", "mean"),
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    spark = load("q_domain_classifier_eval").sort_values("source").reset_index(drop=True)
    if len(mine) != len(spark):
        print(f"FAIL q_domain_classifier_eval rowcount mine={len(mine)} spark={len(spark)}")
        ok = False
    else:
        bad = 0
        for c in ["n_docs", "n_teacher_pos", "n_pred_pos", "n_agree"]:
            m = mine[c].astype(int).to_numpy() != spark[c].astype(int).to_numpy()
            if m.any():
                i = int(m.argmax())
                print(f"FAIL eval col={c} row={i} mine={mine[c][i]} spark={spark[c][i]}")
                bad += 1
        dev = np.abs(mine["mean_score"].to_numpy() - spark["mean_score"].to_numpy()).max()
        if dev > TOL:
            print(f"FAIL eval mean_score maxdev={dev:.2e}")
            bad += 1
        if bad == 0:
            agree = mine["n_agree"].sum() / mine["n_docs"].sum()
            print(
                f"PASS q_domain_classifier_eval ({len(mine)} sources, "
                f"teacher agreement {agree:.3f}, mean_score maxdev={dev:.2e})"
            )
        ok = ok and bad == 0

    spark_w = load("q_domain_classifier_weights")
    order = sorted(range(len(w)), key=lambda i: (-abs(w[i]), i))  # |w| desc, bucket asc
    mine_top = [(int(i), w[i]) for i in order[:20]]
    sw = list(zip(spark_w["bucket"].astype(int), spark_w["weight"].astype(float)))
    bad = 0
    for (mb, mw), (sb, swt) in zip(mine_top, sw):
        if mb != sb or abs(mw - swt) > TOL:
            print(f"FAIL weights mine=({mb},{mw:.6f}) spark=({sb},{swt:.6f})")
            bad += 1
    if bad == 0:
        print(f"PASS q_domain_classifier_weights (top-20 buckets, |w| max {abs(w).max():.4f})")
    ok = ok and bad == 0

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
