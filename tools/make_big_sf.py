"""Materialize a K-replicated sf directory for the big per-query bench.

At sf0.1 half the catalog queries run <1.5 s, where session fixed costs
blur plan costs; this builds a join-consistent larger input so plan
regressions show up as >2x signals. Facts are replicated with key
shifts that keep every FK relationship intact (dims stay single-copy,
exactly like scaling a TPC-H SF):

- lineitem + orders: orderkeys shift by r * 10M per replica r, so the
  l_orderkey <-> o_orderkey join keys stay aligned and the derived
  node ids (f(orderkey, linenumber)) stay globally unique; part /
  supplier / customer FKs still resolve against the single dims.
- documents: doc_id shift + per-replica vowel translate() (same scheme
  as tools/scale_rehearsal.py: within-replica near-dup structure is
  preserved, cross-replica similarity collapses, so the dedup family
  scales in docs AND groups, not into one giant cluster).
- embeddings: vec_id shift + per-replica deterministic perturbation
  (distinct vectors in tight near-dup families -- verbatim copies made
  recall measurements degenerate; see the embeddings COPY below).
- events: event/user id shifts (more users, unchanged session shape).

    python tools/make_big_sf.py --replicate 10 --out /dev/shm/spark_graft/sf0.1x10
    python bench.py --sf-dir /dev/shm/spark_graft/sf0.1x10 ...

Pure DuckDB -- no Spark session, safe to run before a bench."""

from __future__ import annotations

import argparse
import os

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=10)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    K = args.replicate
    src = lambda t: f"read_parquet('{args.sf_dir}/{t}.parquet')"  # noqa: E731
    dst = lambda t: f"'{args.out}/{t}.parquet'"  # noqa: E731

    for t in DIMS:
        con.sql(f"COPY (SELECT * FROM {src(t)}) TO {dst(t)} (FORMAT PARQUET)")

    rep = f"CROSS JOIN range({K}) rt(r)"
    con.sql(
        f"""COPY (SELECT l_orderkey + r * 10000000 AS l_orderkey,
                l_partkey, l_suppkey, l_linenumber, l_quantity,
                l_extendedprice, l_discount, l_tax, l_returnflag,
                l_linestatus, l_shipdate
            FROM {src('lineitem')} {rep}) TO {dst('lineitem')} (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (SELECT o_orderkey + r * 10000000 AS o_orderkey,
                o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                o_orderpriority
            FROM {src('orders')} {rep}) TO {dst('orders')} (FORMAT PARQUET)"""
    )
    # per-replica vowel rotation (see module docstring)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    cases = " ".join(
        f"WHEN {r} THEN translate(text, 'aeiou', "
        f"'{''.join(alphabet[(i * 7 + r) % 26] for i in range(5))}')"
        for r in range(K)
    )
    con.sql(
        f"""COPY (SELECT doc_id + r * 10000000 AS doc_id,
                CASE r {cases} END AS text, lang, source, n_chars
            FROM {src('documents')} {rep}) TO {dst('documents')} (FORMAT PARQUET)"""
    )
    # vec_id shift + deterministic per-replica perturbation (sigma ~ 5% of
    # the unit-ish element scale). A verbatim copy made the 10x corpus
    # DEGENERATE for recall measurements: each query's top-k were its own
    # identical replicas, so IVF recall read 1.0 no matter what. Perturbed
    # replicas are distinct vectors forming tight near-dup families
    # (cosine ~0.999 within, ~0 across on this isotropic corpus) -- the
    # same planted-structure treatment documents get, so the ANN family
    # scales in vectors AND in genuine neighborhood structure.
    con.sql(
        f"""COPY (SELECT vec_id + r * 10000000 AS vec_id,
                CASE WHEN r = 0 THEN embedding
                     ELSE list_transform(embedding, (x, i) ->
                          CAST(x + 0.05 * sin(vec_id * 7919.0 + i * 104729.0
                                              + r * 1299709.0) AS FLOAT))
                END AS embedding, label
            FROM {src('embeddings')} {rep}) TO {dst('embeddings')} (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (SELECT event_id + r * 1000000 AS event_id, ts,
                user_id + r * 100000 AS user_id, event_type, value, props
            FROM {src('events')} {rep}) TO {dst('events')} (FORMAT PARQUET)"""
    )
    for t in DIMS + ["lineitem", "orders", "documents", "embeddings", "events"]:
        n = con.sql(f"SELECT count(*) FROM {src(t).replace(args.sf_dir, args.out)}").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
