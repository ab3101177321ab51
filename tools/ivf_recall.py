"""End-to-end IVF recall gate: production `train_centroids` -> `ivf_topk`
measured against `brute_force_topk` (the exact baseline).

The catalog's `ivf_topk` oracle probes FIXED centroids so DuckDB can
replay it; this closes the remaining loop -- the TRAINED production path
(driver Lloyd on a deterministic 4096 sample, sqrt(N) cells) must still
find what exhaustive search finds. Two corpora, two regimes:

* sf0.1 embeddings (2000 vectors) are ISOTROPIC random -- IVF's
  adversarial case, where recall can only track the probed cell mass
  (no cluster structure to exploit; the label column is geometrically
  meaningless, same-label mean cosine ~= cross-label ~= 0). The curve is
  recorded; the gate is curve-matched: recall@10 >= 0.80 at nprobe=24
  of ncells=44 (measured 0.872).
* the 10x corpus (tools/make_big_sf.py, 20k vectors) carries planted
  near-dup families (per-replica perturbation; verbatim copies made the
  measurement degenerate -- each query's top-k were its own identical
  replicas and recall read 1.0 no matter what). Structured neighborhoods
  are the IVF sweet spot and the realistic shape: gate recall@10 >= 0.90
  at nprobe=16 of ncells=141 (measured 0.958, brute force 5.6x slower).

Deterministic input + seeded sampling: exactly reproducible.

    python tools/make_big_sf.py --replicate 10 --out /dev/shm/spark_graft/sf0.1x10
    python tools/ivf_recall.py --assert        # exit 1 below either bound

Appends the measurement to BENCH/NOTES.md unless --no-notes.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (corpus label, sf_dir attr, probed nprobes, gate (nprobe, bound))
RUNS = [
    ("isotropic sf0.1", "sf_dir_small", (8, 16, 24), (24, 0.80)),
    ("structured 10x", "sf_dir_big", (8, 16), (16, 0.90)),
]


def measure(spark, path, k, nqueries, nprobes):
    from pyspark.sql import functions as F

    from osm_pbf_convert_spark.operators import similarity

    vdf = spark.read.parquet(f"{path}/embeddings.parquet")
    n = vdf.count()
    ncells = max(16, int(math.sqrt(n)))
    q = (
        vdf.orderBy(F.xxhash64(F.col("vec_id").cast("string"), F.lit(7)))
        .limit(nqueries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .cache()
    )
    q.count()
    t0 = time.time()
    exact = similarity.brute_force_topk(vdf, q, k=k).toPandas()
    t_bf = time.time() - t0
    t0 = time.time()
    cents = similarity.train_centroids(vdf, ncells)
    t_train = time.time() - t0
    curve = {}
    for p in nprobes:
        t0 = time.time()
        approx = similarity.ivf_topk(vdf, q, k=k, nprobe=p, centroids=cents).toPandas()
        t_ivf = time.time() - t0
        qs = exact["query_id"].unique()
        rec = sum(
            len(set(exact[exact["query_id"] == qi]["vec_id"])
                & set(approx[approx["query_id"] == qi]["vec_id"])) / k
            for qi in qs
        ) / len(qs)
        curve[p] = (round(rec, 4), round(t_ivf, 2))
    return {"n": n, "ncells": ncells, "bf_sec": round(t_bf, 2),
            "train_sec": round(t_train, 2), "curve": curve}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir-small", default="/root/testdata/sf0.1")
    ap.add_argument("--sf-dir-big", default="/dev/shm/spark_graft/sf0.1x10")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nqueries", type=int, default=50)
    ap.add_argument("--assert", dest="assert_gate", action="store_true")
    ap.add_argument("--no-notes", action="store_true")
    args = ap.parse_args()

    from osm_pbf_convert_spark.session import get_spark

    spark = get_spark("ivf-recall", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    results, failures = {}, []
    for label, attr, nprobes, (gate_p, bound) in RUNS:
        m = measure(spark, getattr(args, attr), args.k, args.nqueries, nprobes)
        m["gate"] = {"nprobe": gate_p, "bound": bound, "recall": m["curve"][gate_p][0]}
        results[label] = m
        if m["curve"][gate_p][0] < bound:
            failures.append(f"{label}: recall {m['curve'][gate_p][0]} < {bound} at nprobe={gate_p}")
    spark.stop()

    print(json.dumps({"metric": f"IVF trained-path recall@{args.k} vs brute force",
                      **results}))

    if not args.no_notes:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        lines = [f"\n## IVF trained-path recall@{args.k} (production train_centroids)\n"]
        for label, m in results.items():
            pts = ", ".join(
                f"nprobe={p}: {r} ({t} s)" for p, (r, t) in m["curve"].items()
            )
            lines.append(
                f"- **{label}** ({m['n']} vectors, ncells={m['ncells']}, brute force "
                f"{m['bf_sec']} s, train {m['train_sec']} s): {pts}. Gate "
                f"recall >= {m['gate']['bound']} at nprobe={m['gate']['nprobe']}: "
                f"**{m['gate']['recall']}**.\n"
            )
        lines.append(
            "The isotropic corpus is IVF's worst case (recall can only track "
            "probed cell mass -- no structure to exploit); the 10x corpus's "
            "planted near-dup families are the realistic regime, where 11% "
            "of cells probed buys 0.96 recall and brute force is 5-6x "
            "slower already at 20k vectors. The ratio, not the wall time, "
            "is the 100 TB claim: candidates shrink by ~nprobe/ncells with "
            "sqrt(N) cells.\n"
        )
        with open(os.path.join(repo, "BENCH", "NOTES.md"), "a") as f:
            f.write("".join(lines))

    if args.assert_gate and failures:
        print("RECALL GATE FAILED:\n  " + "\n  ".join(failures))
        sys.exit(1)
    if args.assert_gate:
        print("recall gates PASS")


if __name__ == "__main__":
    main()
