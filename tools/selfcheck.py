"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf dir, compare
row count, schema width, and an order-insensitive value multiset.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def dtype_sig(df: pd.DataFrame) -> dict:
    """Per-column type signature BEFORE any coercion.  The driver's value
    hash is type-sensitive (e.g. DuckDB windowed SUM widens BIGINT ->
    HUGEINT -> decimal128, which hashes differently from Spark's int64
    even when every value is equal), so the local replica must flag any
    column whose raw dtype family differs between the two engines."""
    sig = {}
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "O":
            nonnull = df[c].dropna()
            k = "O:" + (type(nonnull.iloc[0]).__name__ if len(nonnull) else "empty")
        elif k in "iu":
            k = "int"
        sig[c] = k
    return sig


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])  # hugeint etc -> numeric
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            if df[c].dropna().apply(float.is_integer).all():
                df[c] = df[c].astype("Int64")
            else:
                df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if len(a) != len(b):
        return f"ROWCOUNT {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"COLUMNS {sorted(a.columns)} vs {sorted(b.columns)}"
    sa, sb = dtype_sig(a[sorted(a.columns)]), dtype_sig(b[sorted(b.columns)])
    bad_types = {c: (sa[c], sb[c]) for c in sa if sa[c] != sb[c]}
    if bad_types:
        return f"DTYPE mismatch (driver hash would differ): {bad_types}"
    ca, cb = canon(a), canon(b)
    if ca.equals(cb):
        return "OK"
    diff_cols = [c for c in ca.columns if not ca[c].equals(cb[c])]
    n_bad = (ca[diff_cols[0]] != cb[diff_cols[0]]).sum() if diff_cols else 0
    sample = ""
    if diff_cols:
        mask = ca[diff_cols[0]] != cb[diff_cols[0]]
        sample = f" sample spark={ca[mask].head(2).to_dict('records')} duck={cb[mask].head(2).to_dict('records')}"
    return f"VALUES differ in {diff_cols} ({n_bad} rows){sample}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from osm_pbf_convert_spark.session import get_spark

    spark = get_spark("selfcheck", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} DUCKDB ERROR: {str(e)[:300]}")
            continue
        verdict = compare(sdf, ddf)
        print(f"{name:24s} {verdict}  ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
        if verdict != "OK":
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
