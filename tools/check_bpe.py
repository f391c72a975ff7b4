#!/usr/bin/env python3
"""Independent cross-check for the BPE tokenizer queries.

Retrains BPE from the raw documents parquet with a from-scratch pure
python implementation (same spec: lowercased [a-z0-9]+ pre-tokens,
</w> end-of-word symbol, pair selection totally ordered by
(freq DESC, left ASC, right ASC), left-to-right non-overlapping merge
pass, min word count 2, min pair freq 2, 60 merges; encode applies the
lowest-rank merge repeatedly) and compares EXACTLY against the engine's
Verify dumps for q_bpe_merges and q_bpe_token_stats. Integer counting
and total ordering make the whole pipeline bit-deterministic, so any
difference is a real defect, not noise.

Usage: python3 tools/check_bpe.py [SF_DIR] [VERIFY_OUT_DIR]
"""
import glob
import re
import sys
from collections import Counter

import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

EOW = "</w>"
NUM_MERGES = 60
MIN_COUNT = 2
MIN_PAIR_FREQ = 2


def words_of(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def merge_pass(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(word_freq):
    words = [(list(w) + [EOW], f) for w, f in word_freq.items()]
    merges = []
    while len(merges) < NUM_MERGES:
        counts = Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < MIN_PAIR_FREQ:
            break
        merges.append((len(merges), l, r, c))
        words = [(merge_pass(syms, l, r), f) for syms, f in words]
    return merges


def encode(word, ranks, pair_of):
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best = min(
            (ranks.get(p, 10**9) for p in zip(syms, syms[1:])), default=10**9
        )
        if best >= 10**9:
            break
        l, r = pair_of[best]
        syms = merge_pass(syms, l, r)
    return syms


def load(name):
    f = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(p) for p in f], ignore_index=True)


def main():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    wf = Counter()
    for t in docs["text"]:
        wf.update(words_of(t))
    wf = Counter({w: f for w, f in wf.items() if f >= MIN_COUNT})
    merges = train(wf)

    ok = True

    spark_m = load("q_bpe_merges").sort_values("merge_rank").reset_index(drop=True)
    mine_m = pd.DataFrame(merges, columns=["merge_rank", "lhs", "rhs", "pair_freq"])
    if len(spark_m) != len(mine_m):
        print(f"FAIL q_bpe_merges rowcount spark={len(spark_m)} mine={len(mine_m)}")
        ok = False
    else:
        diff = (
            (spark_m["lhs"] != mine_m["lhs"])
            | (spark_m["rhs"] != mine_m["rhs"])
            | (spark_m["pair_freq"].astype(int) != mine_m["pair_freq"].astype(int))
        )
        if diff.any():
            i = diff.idxmax()
            print(
                f"FAIL q_bpe_merges rank={i} spark={spark_m.iloc[i].tolist()} "
                f"mine={mine_m.iloc[i].tolist()}"
            )
            ok = False
        else:
            print(f"PASS q_bpe_merges ({len(mine_m)} merges, exact)")

    ranks = {(l, r): k for k, l, r, _ in merges}
    pair_of = {k: (l, r) for k, l, r, _ in merges}
    rows = []
    for src, grp in docs.groupby("source"):
        n_words = n_tokens = n_chars = 0
        for t in grp["text"]:
            for w in words_of(t):
                n_words += 1
                n_chars += len(w)
                toks = encode(w, ranks, pair_of)
                assert "".join(toks) == w + EOW, (w, toks)
                n_tokens += len(toks)
        rows.append(
            {
                "source": src,
                "n_docs": len(grp),
                "n_words": n_words,
                "n_tokens": n_tokens,
                "n_alnum_chars": n_chars,
                "avg_tokens_per_doc": round(n_tokens / len(grp) + 1e-12, 4),
                "chars_per_token": round(n_chars / n_tokens + 1e-12, 4),
            }
        )
    mine_s = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    spark_s = load("q_bpe_token_stats").sort_values("source").reset_index(drop=True)
    if len(spark_s) != len(mine_s):
        print(f"FAIL q_bpe_token_stats rowcount spark={len(spark_s)} mine={len(mine_s)}")
        ok = False
    else:
        bad = 0
        for c in mine_s.columns:
            a, b = mine_s[c], spark_s[c]
            if a.dtype.kind == "f":
                m = (a - b).abs() > 5.05e-5  # python round vs HALF_UP slack
            else:
                m = a.astype(str) != b.astype(str)
            if m.any():
                i = m.idxmax()
                print(f"FAIL q_bpe_token_stats col={c} row={i} mine={a[i]!r} spark={b[i]!r}")
                bad += 1
        if bad == 0:
            print(f"PASS q_bpe_token_stats ({len(mine_s)} sources, exact counts)")
        ok = ok and bad == 0

    # q_bpe_packed_sequences: replay tokenize -> pack from scratch
    # (per-source shards ordered by doc_id, 512-token sequences).
    try:
        spark_p = load("q_bpe_packed_sequences")
    except Exception:
        spark_p = None
    if spark_p is not None:
        SEQ = 512
        prow = []
        for src, grp in docs.groupby("source"):
            end = 0
            for _, drow in grp.sort_values("doc_id").iterrows():
                tok = sum(
                    len(encode(w, ranks, pair_of)) for w in words_of(drow["text"])
                )
                if tok <= 0:
                    continue
                start = end
                end += tok
                prow.append(
                    {
                        "shard": src,
                        "doc_id": int(drow["doc_id"]),
                        "n_tokens": tok,
                        "chunk_offset": start % SEQ,
                        "first_chunk": start // SEQ,
                        "last_chunk": (end - 1) // SEQ,
                        "chunks_spanned": (end - 1) // SEQ - start // SEQ + 1,
                    }
                )
        mine_p = pd.DataFrame(prow).sort_values(["shard", "doc_id"]).reset_index(drop=True)
        spark_p = spark_p.sort_values(["shard", "doc_id"]).reset_index(drop=True)
        if len(spark_p) != len(mine_p):
            print(f"FAIL q_bpe_packed_sequences rowcount spark={len(spark_p)} mine={len(mine_p)}")
            ok = False
        else:
            bad = 0
            for c in mine_p.columns:
                m = mine_p[c].astype(str) != spark_p[c].astype(str)
                if m.any():
                    i = m.idxmax()
                    print(
                        f"FAIL q_bpe_packed_sequences col={c} row={i} "
                        f"mine={mine_p[c][i]!r} spark={spark_p[c][i]!r}"
                    )
                    bad += 1
            if bad == 0:
                print(f"PASS q_bpe_packed_sequences ({len(mine_p)} docs, exact packing)")
            ok = ok and bad == 0

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
