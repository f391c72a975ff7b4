#!/usr/bin/env python3
"""Numeric cross-check for the rows-only queries (no SQL oracle).

Recomputes the linear-algebra / ML signal queries from the sf parquet
with numpy + pure python, mirroring the Scala/Breeze implementations
exactly (same window framing, same estimator conventions, same
tie-breaking), and compares against the Spark engine's Verify dump.

Spark outputs are round(_, 4); we compare |mine_raw - spark_rounded|
<= 5.05e-5 (the rounding half-width plus numeric slack), so any
formula or framing error — which shows up at 1e-3+ — fails loudly,
while pinv/eigh backend noise (~1e-12) passes.

Usage: python3 tools/check_numeric.py [SF_DIR] [VERIFY_OUT_DIR]
"""
import glob
import math
import os
import re
import sys
import zipfile

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TOL = 5.05e-5

con = duckdb.connect()
for p in glob.glob(SF + "/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

failures = []


def report(name, n_rows, n_bad, maxdev, detail=""):
    ok = n_bad == 0
    status = "PASS" if ok else "FAIL"
    print(f"{status} {name} ({n_rows} rows, maxdev={maxdev:.2e}{', ' + detail if detail else ''})")
    if not ok:
        failures.append(name)


def spark_df(q):
    df = pd.read_parquet(f"{OUT}/{q}")
    if "d" in df.columns:
        df["d"] = pd.to_datetime(df["d"])
    return df


def cmp_cols(mine, spark, float_cols, exact_cols=()):
    """mine/spark: aligned DataFrames (same index). Returns (bad, maxdev)."""
    bad, maxdev = 0, 0.0
    for c in float_cols:
        a = mine[c].to_numpy(dtype=float)
        b = spark[c].to_numpy(dtype=float)
        both_nan = np.isnan(a) & np.isnan(b)
        d = np.abs(a - b)
        d[both_nan] = 0.0
        nan_mismatch = np.isnan(a) != np.isnan(b)
        bad += int(nan_mismatch.sum() + (d > TOL).sum())
        if len(d):
            maxdev = max(maxdev, float(np.nanmax(d)))
    for c in exact_cols:
        bad += int((mine[c].astype(str).to_numpy() != spark[c].astype(str).to_numpy()).sum())
    return bad, maxdev


# ---------------------------------------------------------------- panels
def panel(buckets):
    """Wide per-bucket daily panel, inner-complete (SignalQueries.panel)."""
    df = con.execute(f"""
        SELECT CAST(l_shipdate AS DATE) AS d, l_suppkey % {buckets} AS asset,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
        FROM lineitem GROUP BY 1, 2""").fetchdf()
    wide = df.pivot(index="d", columns="asset", values="v").sort_index()
    return wide.dropna()


def returns_panel(wide):
    """Per-asset simple returns, rows with any null dropped (safeDivide:
    zero denominator -> null)."""
    prev = wide.shift(1)
    r = (wide - prev) / prev
    r = r.mask(prev == 0)
    return r.dropna()


def roll_z(s, n):
    """z vs trailing-n window (incl current): safeDivide((x-avg)/stddev_samp)."""
    m = s.rolling(n, min_periods=1).mean()
    sd = s.rolling(n, min_periods=2).std(ddof=1)
    z = (s - m) / sd
    return z.mask(sd == 0)


def corrmat(hist):
    """NumericSignals.correlationMatrix mirror: sample sd, zero-variance
    columns get 0 off-diagonal / 1 diagonal, clamp to [-1, 1]."""
    n, k = hist.shape
    mu = hist.mean(axis=0)
    centered = hist - mu
    sd = np.sqrt((centered ** 2).sum(axis=0) / (n - 1))
    corr = np.empty((k, k))
    for a in range(k):
        for b in range(k):
            if sd[a] <= 0 or sd[b] <= 0:
                corr[a, b] = 1.0 if a == b else 0.0
            else:
                r = (centered[:, a] * centered[:, b]).sum() / ((n - 1) * sd[a] * sd[b])
                corr[a, b] = max(-1.0, min(1.0, r))
    return corr


# ------------------------------------------------------- q_turbulence_index
def check_turbulence():
    r = returns_panel(panel(4))
    V = r.to_numpy()
    k = V.shape[1]
    vals = []
    for i in range(len(V)):
        hist = V[max(0, i - 251): i + 1]
        n = len(hist)
        if n < k + 2:
            vals.append(np.nan)
            continue
        mu = hist.mean(axis=0)
        centered = hist - mu
        cov = centered.T @ centered / (n - 1)
        x = V[i] - mu
        d2 = x @ np.linalg.pinv(cov) @ x
        vals.append(math.sqrt(max(d2, 0.0)))
    s = pd.Series(vals, index=r.index).dropna()
    mine = pd.DataFrame({
        "d": pd.to_datetime(s.index),
        "turbulence": s.to_numpy(),
        "turb_avg20": s.rolling(20, min_periods=1).mean().to_numpy(),
        "turb_z252": roll_z(s, 252).to_numpy(),
    })
    z = mine["turb_z252"]
    mine["regime"] = np.select([z > 2, z > 1, z > -1], ["extreme", "elevated", "normal"], "calm")
    sp = spark_df("q_turbulence_index").sort_values("d").reset_index(drop=True)
    mine = mine.sort_values("d").reset_index(drop=True)
    if len(mine) != len(sp) or (mine["d"].to_numpy() != sp["d"].to_numpy()).any():
        report("q_turbulence_index", len(sp), 1, 1.0, "row set mismatch")
        return
    bad, maxdev = cmp_cols(mine, sp, ["turbulence", "turb_avg20", "turb_z252"], ["regime"])
    report("q_turbulence_index", len(sp), bad, maxdev)


# ------------------------------------------------------ q_absorption_ratio
def check_absorption():
    r = returns_panel(panel(8))
    V = r.to_numpy()
    k = V.shape[1]
    top = max(1, math.ceil(0.25 * k))
    vals = []
    for i in range(len(V)):
        hist = V[max(0, i - 119): i + 1]
        n = len(hist)
        if n < k + 2:
            vals.append(np.nan)
            continue
        ev = np.linalg.eigvalsh(corrmat(hist))
        srt = np.sort(ev)[::-1]
        total = srt.sum()
        vals.append(srt[:top].sum() / total if total > 0 else np.nan)
    s = pd.Series(vals, index=r.index).dropna()
    mine = pd.DataFrame({
        "d": pd.to_datetime(s.index),
        "absorption_ratio": s.to_numpy(),
        "ar_delta15": (s - s.shift(15)).to_numpy(),
        "ar_z1y": roll_z(s, 252).to_numpy(),
    })
    sp = spark_df("q_absorption_ratio").sort_values("d").reset_index(drop=True)
    mine = mine.sort_values("d").reset_index(drop=True)
    if len(mine) != len(sp) or (mine["d"].to_numpy() != sp["d"].to_numpy()).any():
        report("q_absorption_ratio", len(sp), 1, 1.0, "row set mismatch")
        return
    bad, maxdev = cmp_cols(mine, sp, ["absorption_ratio", "ar_delta15", "ar_z1y"])
    report("q_absorption_ratio", len(sp), bad, maxdev)


# -------------------------------------------------- q_permutation_entropy
def check_perm_entropy():
    series = con.execute("""
        SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
        FROM lineitem GROUP BY 1, 2""").fetchdf()
    order, hmax = 3, math.log(6.0)
    frames = []
    for flag, g in series.groupby("flag"):
        g = g.sort_values("d").reset_index(drop=True)
        prev = g["v"].shift(1)
        ret = ((g["v"] - prev) / prev).mask(prev == 0)
        g = g.assign(ret=ret).dropna(subset=["ret"]).reset_index(drop=True)
        rets = g["ret"].to_numpy()
        pes = []
        for i in range(len(rets)):
            win = rets[max(0, i - 59): i + 1]
            if len(win) < order + 1:
                pes.append(np.nan)
                continue
            counts = {}
            for j in range(len(win) - order + 1):
                pat = win[j: j + order]
                ranks = tuple(int(x) for x in np.argsort(pat, kind="stable"))
                counts[ranks] = counts.get(ranks, 0) + 1
            total = sum(counts.values())
            h = -sum((c / total) * math.log(c / total) for c in counts.values())
            pes.append(h / hmax)
        g = g.assign(pe=pes).dropna(subset=["pe"]).reset_index(drop=True)
        pe = g["pe"]
        frames.append(pd.DataFrame({
            "flag": flag,
            "d": pd.to_datetime(g["d"]),
            "perm_entropy": pe.to_numpy(),
            "pe_trend20": (pe - pe.rolling(20, min_periods=1).mean()).to_numpy(),
            "pe_z252": roll_z(pe, 252).to_numpy(),
        }))
    mine = pd.concat(frames).sort_values(["flag", "d"]).reset_index(drop=True)
    sp = spark_df("q_permutation_entropy").sort_values(["flag", "d"]).reset_index(drop=True)
    if len(mine) != len(sp):
        report("q_permutation_entropy", len(sp), 1, 1.0, "row count mismatch")
        return
    bad, maxdev = cmp_cols(mine, sp, ["perm_entropy", "pe_trend20", "pe_z252"])
    report("q_permutation_entropy", len(sp), bad, maxdev)


# ------------------------------------------------- q_mst_network_metrics
def mst_metrics(hist):
    corr = corrmat(hist)
    k = corr.shape[0]
    dist = np.sqrt(np.maximum(0.0, 2.0 * (1.0 - corr)))
    in_tree = [False] * k
    min_edge = [float("inf")] * k
    parent = [-1] * k
    min_edge[0] = 0.0
    total = 0.0
    adj = [[] for _ in range(k)]
    for _ in range(k):
        u = min((i for i in range(k) if not in_tree[i]), key=lambda i: min_edge[i])
        in_tree[u] = True
        if parent[u] >= 0:
            total += dist[parent[u]][u]
            adj[u].append(parent[u])
            adj[parent[u]].append(u)
        for v in range(k):
            if not in_tree[v] and dist[u][v] < min_edge[v]:
                min_edge[v] = dist[u][v]
                parent[v] = u
    max_degree = max(len(a) for a in adj)
    between = [0] * k
    path_sum, pairs = 0.0, 0
    for s in range(k):
        hops = [-1] * k
        par = [-1] * k
        hops[s] = 0
        q = [s]
        while q:
            u = q.pop(0)
            for v in adj[u]:
                if hops[v] < 0:
                    hops[v] = hops[u] + 1
                    par[v] = u
                    q.append(v)
        for t in range(s + 1, k):
            path_sum += hops[t]
            pairs += 1
            x = par[t]
            while x != -1 and x != s:
                between[x] += 1
                x = par[x]
    return total, max_degree, path_sum / pairs, max(between) / pairs


def check_mst():
    r = returns_panel(panel(8))
    V = r.to_numpy()
    rows = []
    for i in range(len(V)):
        if (i + 1) % 5 != 0:
            continue
        hist = V[max(0, i - 62): i + 1]
        if len(hist) < 10:
            continue
        total, deg, avg_path, max_bet = mst_metrics(hist)
        rows.append((pd.to_datetime(r.index[i]), total, deg, avg_path, max_bet))
    mine = pd.DataFrame(rows, columns=["d", "mst_total_length", "mst_max_degree",
                                       "mst_avg_path", "mst_max_betweenness"])
    sp = spark_df("q_mst_network_metrics").sort_values("d").reset_index(drop=True)
    mine = mine.sort_values("d").reset_index(drop=True)
    if len(mine) != len(sp) or (mine["d"].to_numpy() != sp["d"].to_numpy()).any():
        report("q_mst_network_metrics", len(sp), 1, 1.0, "row set mismatch")
        return
    bad, maxdev = cmp_cols(mine, sp,
                           ["mst_total_length", "mst_avg_path", "mst_max_betweenness"])
    bad += int((mine["mst_max_degree"].to_numpy() != sp["mst_max_degree"].to_numpy()).sum())
    report("q_mst_network_metrics", len(sp), bad, maxdev)


# ---------------------------------------------------- q_tfidf_top_terms
def build_tfidf():
    """Mirror of TextML.tfidf (tokenize, english stopwords, minDF 2,
    maxDF 0.85, vocab 1000): returns (doc_terms tf dicts, eligible
    vocab set, idf dict). None when the stopword list is unavailable."""
    jars = glob.glob("/opt/spark/jars/spark-mllib*.jar")
    stop = set()
    for jar in jars:
        with zipfile.ZipFile(jar) as z:
            try:
                stop = set(z.read("org/apache/spark/ml/feature/stopwords/english.txt")
                           .decode().split("\n")) - {""}
                break
            except KeyError:
                continue
    if not stop:
        return None
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchdf()
    m = len(docs)
    tok_re = re.compile(r"[a-zA-Z]{3,20}")
    doc_terms = {}
    df_count = {}
    for _, row in docs.iterrows():
        toks = [t for t in tok_re.findall(str(row["text"]).lower()) if t not in stop]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        doc_terms[row["doc_id"]] = tf
        for t in tf:
            df_count[t] = df_count.get(t, 0) + 1
    eligible = {t for t, c in df_count.items() if c >= 2 and c <= 0.85 * m}
    if len(eligible) > 1000:
        # CountVectorizer's top-vocabSize cut by corpus count has
        # undefined tie order; restrict to terms strictly above the cut.
        counts = sorted((sum(dt.get(t, 0) for dt in doc_terms.values()) for t in eligible),
                        reverse=True)
        cut = counts[999]
        eligible = {t for t in eligible
                    if sum(dt.get(t, 0) for dt in doc_terms.values()) > cut}
    idf = {t: math.log((m + 1) / (df_count[t] + 1)) for t in eligible}
    return doc_terms, eligible, idf


def check_tfidf():
    built = build_tfidf()
    if built is None:
        report("q_tfidf_top_terms", 0, 1, 1.0, "stopword list not found in spark jars")
        return
    doc_terms, eligible, idf = built
    rows = []
    for doc_id, tf in doc_terms.items():
        scored = sorted(((tf[t] * idf[t], t) for t in tf if t in eligible),
                        key=lambda x: (-x[0], x[1]))[:5]
        for s, t in scored:
            rows.append((doc_id, t, s))
    mine = pd.DataFrame(rows, columns=["doc_id", "term", "score"]) \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    sp = pd.read_parquet(f"{OUT}/q_tfidf_top_terms") \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    if len(mine) != len(sp) or (mine["doc_id"].to_numpy() != sp["doc_id"].to_numpy()).any() \
            or (mine["term"].to_numpy() != sp["term"].to_numpy()).any():
        report("q_tfidf_top_terms", len(sp), 1, 1.0, "term set mismatch")
        return
    bad, maxdev = cmp_cols(mine, sp, ["score"])
    report("q_tfidf_top_terms", len(sp), bad, maxdev)


# ------------------------------------------------------- q_ann_ivf_topk
def check_ivf():
    emb = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchdf()
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=float)
            for _, r in emb.iterrows()}
    q = vecs[0]
    qn = math.sqrt((q * q).sum())
    sp = pd.read_parquet(f"{OUT}/q_ann_ivf_topk")
    bad, maxdev = 0, 0.0
    prev = float("inf")
    for _, r in sp.iterrows():
        vid = int(r["vec_id"])
        if vid == 0:
            bad += 1
            continue
        v = vecs[vid]
        cos = float(v @ q) / (math.sqrt((v * v).sum()) * qn)
        d = abs(cos - float(r["cosine_sim"]))
        maxdev = max(maxdev, d)
        if d > TOL:
            bad += 1
        if float(r["cosine_sim"]) > prev + 1e-12:
            bad += 1  # must be descending
        prev = float(r["cosine_sim"])
    report("q_ann_ivf_topk", len(sp), bad, maxdev,
           "cosine values + ordering (cell membership is seeded-KMeans)")


# ----------------------------------------------------------- q_doc_topics
MASK64 = (1 << 64) - 1


def _mix(a, b):
    """Bit-mirror of graft.textml.NMF.mix (splitmix64 finalizer)."""
    z = (a * 0x9E3779B97F4A7C15 + b * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & MASK64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & MASK64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & MASK64
    z ^= z >> 31
    return (z >> 11) / float(1 << 53) + 1e-3


def _jhash(s):
    """Java String.hashCode (signed 32-bit), as NMF.termHash sees it."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def check_nmf(k=8, outer=10, inner=5):
    built = build_tfidf()
    if built is None:
        report("q_doc_topics", 0, 1, 1.0, "stopword list not found in spark jars")
        return
    doc_terms, eligible, idf = built
    vocab = sorted(eligible)
    tidx = {t: j for j, t in enumerate(vocab)}
    m = len(vocab)
    docs = {}
    for d, tf in doc_terms.items():
        terms = sorted((tidx[t], tf[t] * idf[t]) for t in tf if t in eligible)
        if terms:
            docs[int(d)] = (np.array([i for i, _ in terms]),
                            np.array([v for _, v in terms]))
    H = np.array([[_mix(t, _jhash(vocab[j])) for j in range(m)] for t in range(k)])

    def w_row(d, idxs, vals, H, HHt):
        numer = H[:, idxs] @ vals
        w = np.array([_mix(d, t) for t in range(k)])
        for _ in range(inner):
            denom = w @ HHt
            w = w * numer / np.maximum(denom, 1e-12)
        return w

    for _ in range(outer):
        HHt = H @ H.T
        A = np.zeros((k, m))
        B = np.zeros((k, k))
        for d in sorted(docs):
            idxs, vals = docs[d]
            w = w_row(d, idxs, vals, H, HHt)
            A[:, idxs] += np.outer(w, vals)
            B += np.outer(w, w)
        H = H * A / np.maximum(B @ H, 1e-12)

    HHt = H @ H.T
    rows = []
    for d in sorted(docs):
        idxs, vals = docs[d]
        w = w_row(d, idxs, vals, H, HHt)
        t_best = int(np.argmax(w))
        sw = np.sort(w)
        rows.append((d, t_best, w[t_best], sw[-1] - sw[-2]))
    mine = pd.DataFrame(rows, columns=["doc_id", "topic_id", "topic_weight", "gap"]) \
        .sort_values("doc_id").reset_index(drop=True)
    sp = pd.read_parquet(f"{OUT}/q_doc_topics").sort_values("doc_id").reset_index(drop=True)
    if len(mine) != len(sp) or (mine["doc_id"].to_numpy() != sp["doc_id"].to_numpy()).any():
        report("q_doc_topics", len(sp), 1, 1.0, "doc set mismatch")
        return
    same = mine["topic_id"].to_numpy() == sp["topic_id"].to_numpy()
    flips = (~same) & (mine["gap"].to_numpy() > 1e-6)  # real disagreement, not a float tie
    wdev = np.abs(mine["topic_weight"].to_numpy() - sp["topic_weight"].to_numpy())[same]
    bad = int(flips.sum()) + int((wdev > 1e-4).sum())
    report("q_doc_topics", len(sp), bad, float(wdev.max()) if len(wdev) else 0.0,
           f"true-NMF argmax topics, {int((~same).sum())} float-tie flips tolerated")


# --------------------------------------------------------- q_doc_clusters
def check_partition_counts(q):
    sp = pd.read_parquet(f"{OUT}/{q}")
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    total = int(sp["n_docs"].sum())
    ids = sp.iloc[:, 0]
    bad = int(total != n_docs) + int((ids < 0).sum() + (ids > 7).sum())
    report(q, len(sp), bad, 0.0, f"partition consistency: {total}/{n_docs} docs in 8 groups")


# ----------------------------------------------------------- q_ann_pq_topk
def check_pq(m=8, ks=16, sample_max=1024, iters=10, cand=50):
    """Bit-mirror of graft.operators.PqOps: seedless Lloyd codebooks
    (accumulation in sample order, strict-< argmin ties to the lower
    index), ADC shortlist, exact-cosine values of the emitted rows.
    The arithmetic is replayed in the SAME operation order as the JVM
    (sequential scalar adds), so the codebooks — and therefore the
    50-candidate shortlist membership — reproduce exactly; only the
    final cosines are compared at the rounding tolerance."""
    emb = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchdf()
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float32).astype(np.float64)
            for _, r in emb.iterrows()}
    sample = [vecs[i] for i in sorted(vecs) if i <= sample_max]
    d = len(sample[0])
    dsub = d // m

    def argmin(x, cents):
        best, bd = 0, float("inf")
        for c, ce in enumerate(cents):
            dd = 0.0
            for i in range(len(x)):
                t = float(x[i]) - float(ce[i])
                dd += t * t
            if dd < bd:
                bd, best = dd, c
        return best

    books = []
    for j in range(m):
        sub = [v[j * dsub:(j + 1) * dsub] for v in sample]
        cents = [s.copy() for s in sub[:ks]]
        for _ in range(iters):
            sums = [np.zeros(dsub) for _ in cents]
            counts = [0] * len(cents)
            for x in sub:
                a = argmin(x, cents)
                counts[a] += 1
                for i in range(dsub):
                    sums[a][i] += x[i]
            cents = [cents[c] if counts[c] == 0 else sums[c] / counts[c]
                     for c in range(len(cents))]
        books.append(cents)

    q = vecs[0]
    lut = []
    for j in range(m):
        qs = q[j * dsub:(j + 1) * dsub]
        row = []
        for ce in books[j]:
            dd = 0.0
            for i in range(dsub):
                t = float(qs[i]) - float(ce[i])
                dd += t * t
            row.append(dd)
        lut.append(row)
    scored = []
    for vid in sorted(vecs):
        if vid == 0:
            continue
        v = vecs[vid]
        s = 0.0
        for j in range(m):
            code = argmin(v[j * dsub:(j + 1) * dsub], books[j])
            s += lut[j][code]
        scored.append((s, vid))
    short_ids = {vid for _, vid in sorted(scored)[:cand]}

    qn = math.sqrt(float(q @ q))
    sp = pd.read_parquet(f"{OUT}/q_ann_pq_topk")
    bad, maxdev = 0, 0.0
    prev = float("inf")
    for _, r in sp.iterrows():
        vid = int(r["vec_id"])
        if vid not in short_ids:
            bad += 1  # emitted row must come from the replayed ADC shortlist
            continue
        v = vecs[vid]
        cos = float(v @ q) / (math.sqrt(float(v @ v)) * qn)
        dev = abs(cos - float(r["cosine_sim"]))
        maxdev = max(maxdev, dev)
        if dev > TOL:
            bad += 1
        if float(r["cosine_sim"]) > prev + 1e-12:
            bad += 1
        prev = float(r["cosine_sim"])
    report("q_ann_pq_topk", len(sp), bad, maxdev,
           "shortlist membership replayed bit-exactly + cosine values")


N_CHECKS = 9
check_turbulence()
check_absorption()
check_perm_entropy()
check_mst()
check_tfidf()
check_ivf()
check_partition_counts("q_doc_clusters")
check_nmf()
check_pq()

print(f"\n{N_CHECKS - len(failures)} passed, {len(failures)} failed")
sys.exit(1 if failures else 0)
