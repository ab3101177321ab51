"""10x streaming-dedup replay with a selectable state store provider.

Round 6 proved exact batch parity of the stateful-LSH stream at 10x
corpus (50,000 docs, 8 micro-batches) on the DEFAULT on-heap
HDFSBackedStateStoreProvider. This tool makes that replay repeatable
and adds the production provider (RocksDB -- state in native memory +
local disk, executor heap stays flat as the corpus grows):

    python tools/stream_replay.py                   # both providers
    python tools/stream_replay.py --provider rocksdb
    python tools/stream_replay.py --replicate 4 --batches 4   # quicker

Per provider it reports wall seconds, raw emitted rows, distinct pairs
(asserted EQUAL to the batch operator's pair set -- parity, not just
counts), and the final state-operator totals (keys, bytes) from the
query's lastProgress. Appends a markdown section to BENCH/NOTES.md.
NEVER run concurrently with other work (single-box timings).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARAMS = dict(num_hashes=32, bands=8, shingle_k=5)


def run_replay(spark, docs_path, schema, provider: str, batches: int) -> dict:
    from osm_pbf_convert_spark.streaming.dedup import (
        configure_state_store,
        stream_documents,
        stream_minhash_pairs,
    )

    work = tempfile.mkdtemp(prefix=f"replay_{provider}_")
    name = f"replay_{provider}_{uuid.uuid4().hex[:8]}"
    prev = configure_state_store(spark, provider)
    try:
        sdf = stream_minhash_pairs(
            stream_documents(
                spark, docs_path, schema, maxFilesPerTrigger=1
            ),
            **PARAMS,
        )
        t0 = time.time()
        q = (
            sdf.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", f"{work}/ck").start()
        )
        try:
            if not q.awaitTermination(3600):
                raise TimeoutError(f"{name} did not terminate")
            wall = time.time() - t0
            state = (q.lastProgress or {}).get("stateOperators") or [{}]
            n_batches = 1 + max(
                (p["batchId"] for p in (q.recentProgress or []) if "batchId" in p),
                default=0,
            )
        finally:
            q.stop()
    finally:
        configure_state_store(spark, prev if prev is not None else "hdfs")
    return {
        "provider": provider,
        "table": name,
        "wall_s": round(wall, 1),
        "batches": n_batches,
        "raw_rows": spark.table(name).count(),
        "state_keys": state[0].get("numRowsTotal"),
        "state_mb": round((state[0].get("memoryUsedBytes") or 0) / 2**20, 1),
        "workspace": work,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=10)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--provider", choices=["hdfs", "rocksdb", "both"], default="both")
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osm_pbf_convert_spark.operators import dedup
    from osm_pbf_convert_spark.session import get_spark
    from tools.scale_rehearsal import replicate_documents

    spark = get_spark("stream-replay")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm/spark_graft")
    docs_path = os.path.join(scratch, "docs", f"stream_replay_x{args.replicate}")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        replicate_documents(spark, args.sf_dir, args.replicate).repartition(
            args.batches
        ).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    schema = docs.schema

    batch_pairs = dedup.minhash_lsh_pairs(docs, **PARAMS).select("a", "b")
    n_batch = batch_pairs.count()
    print(f"input: {n_docs} docs, batch pair set: {n_batch}", flush=True)

    providers = ["hdfs", "rocksdb"] if args.provider == "both" else [args.provider]
    rows = []
    for prov in providers:
        r = run_replay(spark, docs_path, schema, prov, args.batches)
        # parity = empty symmetric difference vs the batch pair set
        got = spark.table(r.pop("table")).select("a", "b").distinct()
        missing = batch_pairs.exceptAll(got).count()
        extra = got.exceptAll(batch_pairs).count()
        r["distinct_pairs"] = got.count()
        r["parity"] = (missing == 0 and extra == 0)
        r["missing_vs_batch"] = missing
        r["extra_vs_batch"] = extra
        shutil.rmtree(r.pop("workspace"), ignore_errors=True)
        print(json.dumps(r), flush=True)
        rows.append(r)

    out = {
        "metric": f"{args.replicate}x streaming dedup replay, state-store providers",
        "n_docs": n_docs,
        "batch_pairs": n_batch,
        "runs": rows,
    }
    print(json.dumps(out))
    for r in rows:
        assert r["parity"], f"{r['provider']}: stream != batch pair set"

    if not args.no_append:
        lines = [
            "",
            f"## {args.replicate}x streaming replay: state-store providers "
            f"({n_docs:,} docs, {args.batches} micro-batches, local[32])",
            "",
            "| provider | wall s | raw rows | distinct pairs | == batch | state keys | state MB |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['provider']} | {r['wall_s']} | {r['raw_rows']:,} "
                f"| {r['distinct_pairs']:,} | {r['parity']} "
                f"| {r['state_keys']:,} | {r['state_mb']} |"
            )
        with open(os.path.join(REPO, "BENCH", "NOTES.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
