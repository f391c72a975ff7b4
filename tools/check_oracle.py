#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity.

Mimics the driver's t2 gate: run graft.Verify at a given SF, then run
each oracle SQL in DuckDB over the same parquet tables and compare
(sort columns by name, sort rows, exact value equality).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
(assumes Verify has already written outputs to the outDir)
"""
import glob
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int widths incl. nullable
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) == 0 or type(sample.iloc[0]).__name__ in ("date", "datetime", "Timestamp"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cast_decimals(tbl):
    """DECIMAL columns -> float64, matching duckdb's .df() conversion
    (to_pandas alone would yield Decimal objects -> str compare)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.types as pt
    cols = []
    for i, f in enumerate(tbl.schema):
        c = tbl.column(i)
        if pt.is_decimal(f.type):
            c = pc.cast(c, pa.float64())
        cols.append(c)
    return pa.table(cols, names=tbl.column_names)


def float_names(tbl):
    import pyarrow.types as pt
    return {f.name for f in tbl.schema if pt.is_floating(f.type)}


def add_nan_null_tags(df, arrow_tbl, names):
    """Append one tag column per named FLOAT column: 'v' value / 'n'
    NaN / '0' NULL, row-aligned with df. The tags become extra compare
    (and sort tie-break) columns so a spark-NaN row can never silently
    match a duck-NULL row even when the per-column counts balance."""
    import pyarrow.compute as pc
    for name in names:
        col = arrow_tbl.column(name)
        nulls = pc.is_null(col).to_pandas().to_numpy()
        nans = pc.fill_null(pc.is_nan(col), False).to_pandas().to_numpy()
        tags = np.where(nulls, "0", np.where(nans, "n", "v"))
        df[f"__nulltag_{name}"] = tags


def compare(name, spark_df, duck_df, spark_arrow, duck_arrow):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
    # Driver-hash fidelity: the driver stringizes values, so an int64
    # column on one side vs float64 on the other ("3" vs "3.0") hash-
    # mismatches even when numerically equal (r05: q_sequence_packing,
    # q_market_breadth_signals — DuckDB SUM(BIGINT) OVER yields HUGEINT
    # → float64). Same for Spark NaN vs DuckDB NULL. Flag both.
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        a_int = pd.api.types.is_integer_dtype(a)
        b_int = pd.api.types.is_integer_dtype(b)
        a_f = pd.api.types.is_float_dtype(a)
        b_f = pd.api.types.is_float_dtype(b)
        if (a_int and b_f) or (a_f and b_int):
            return (f"DTYPE MISMATCH col={c} spark={a.dtype} duck={b.dtype} "
                    "(int-vs-float: driver hash stringizes '3' != '3.0')")
        if a_f and b_f:
            # NULL vs NaN must be counted SEPARATELY (ADVICE r6): after
            # pd.read_parquet / .df() both collapse to np.nan, so equal
            # totals can hide a Spark-NaN-vs-DuckDB-NULL asymmetry that
            # the driver's stringized hash ("NaN" vs null) does catch.
            # The arrow-level masks keep them distinct.
            def null_nan(arrow_col):
                import pyarrow.compute as pc
                import pyarrow.types as pt
                nulls = arrow_col.null_count
                # decimal columns land float in pandas but have no NaN
                if not pt.is_floating(arrow_col.type):
                    return nulls, 0
                nans = int(pc.sum(pc.is_nan(arrow_col)).as_py() or 0)
                return nulls, nans
            an, bn = null_nan(spark_arrow[c]), null_nan(duck_arrow[c])
            if an != bn:
                return (f"NAN/NULL ASYMMETRY col={c} spark(null,nan)={an} "
                        f"duck(null,nan)={bn}")
    a, b = normalize(spark_df), normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            bad = ~((av.isna() & bv.isna()) | (av == bv))
            if bad.any():
                i = bad.idxmax()
                diff = (av - bv).abs().max()
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r} maxabsdiff={diff}"
        else:
            bad = ~(((av.isna()) & (bv.isna())) | (av.astype(str) == bv.astype(str)))
            if bad.any():
                i = bad.idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            import pyarrow.parquet as pq
            import pyarrow as pa
            # arrow copies ONLY for the null-vs-NaN distinction (they
            # collapse to np.nan in the pandas frames); the value
            # compare uses the same pandas conversions as the driver
            spark_arrow = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default")
            # ONE duck execution: row order is not stable across
            # executions, and the positional null/NaN tags below must
            # align row-for-row with the value frame — so duck_df is
            # derived from the same arrow table (decimals cast to
            # float64 first, matching .df()'s conversion).
            duck_arrow = cast_decimals(con.execute(sql).fetch_arrow_table())
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            duck_df = duck_arrow.to_pandas(date_as_object=False)
            # Positional null-vs-NaN tags (VERDICT r7 #7): equal per-
            # column (null, nan) COUNTS can hide a swap (spark NaN at
            # the row where duck has NULL and vice versa). Tag columns
            # derived from the arrow tables ride through normalize()'s
            # row sort as deterministic tie-breakers and are compared
            # exactly, so the asymmetry is caught per ROW, matching
            # the driver's stringized hash ("NaN" != null). Only
            # columns floating on BOTH sides are tagged (an int-vs-
            # float side pair is already a DTYPE MISMATCH).
            tag_cols = float_names(spark_arrow) & float_names(duck_arrow)
            add_nan_null_tags(spark_df, spark_arrow, tag_cols)
            add_nan_null_tags(duck_df, duck_arrow, tag_cols)
            err = compare(name, spark_df, duck_df, spark_arrow, duck_arrow)
        except Exception as e:
            err = f"EXCEPTION {type(e).__name__}: {e}"
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
