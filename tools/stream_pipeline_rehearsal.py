"""Composed streaming-pipeline rehearsal at Nx bench volume: the whole
decode -> tile rollup -> stateful dedup chain (streaming/pipeline.py)
replayed availableNow over a replicated pages corpus, with hard parity
gates against the batch operators -- the evidence that the COMPOSED
surface (not just each operator) holds its exact-batch-parity contract
when state and the foreachBatch merge span many micro-batches at
10x-plus the bench row counts.

    python tools/stream_pipeline_rehearsal.py                  # 16x pages
    python tools/stream_pipeline_rehearsal.py --replicate 4 --batches 4

Gates (exit 1 on failure): entities count + per-kind id checksum equal
to batch decode; tile pyramid checksum-equal to batch tile_pyramid;
distinct dup pairs set-equal to the batch LSH operator (symmetric
difference == 0); the replay must actually span >= batches/2
micro-batches. Appends a markdown section to BENCH/NOTES.md.
NEVER run concurrently with other work (single-box timings).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LSH = dict(num_hashes=32, bands=8, shingle_k=5)


def _entity_checksum(ent):
    from pyspark.sql import functions as F

    return {
        (r["kind"], r["n"], str(r["ids"]))
        for r in ent.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id").cast("decimal(38,0)")).alias("ids"),
        )
        .collect()
    }


def _tile_checksum(tiles):
    from pyspark.sql import functions as F

    row = tiles.agg(
        F.count(F.lit(1)).alias("n"),
        # cast BEFORE the multiply: long x long overflows under ANSI mode
        F.sum(
            F.xxhash64("z", "tile").cast("decimal(38,0)") * F.col("cnt")
        ).alias("h"),
    ).first()
    return (row["n"], str(row["h"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--max-zoom", type=int, default=12)
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osm_pbf_convert_spark.operators import dedup
    from osm_pbf_convert_spark.operators.tiling import tile_pyramid
    from osm_pbf_convert_spark.session import get_spark
    from osm_pbf_convert_spark.sources.pages import synth_pages
    from osm_pbf_convert_spark.sources.pbf import decode_entities
    from osm_pbf_convert_spark.streaming.pipeline import run_streaming_pipeline

    spark = get_spark("stream-pipeline-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm/spark_graft")
    landing = os.path.join(scratch, "pages", f"pipe_rehearsal_x{args.replicate}")
    if not os.path.exists(os.path.join(landing, "_SUCCESS")):
        # synth page TEXT is templated (near-identical across pages), which
        # is exactly the boilerplate-bucket blowup max_bucket_size exists to
        # shed -- measured: the uncapped dedup stage emitted pairs
        # quadratically at 120k templated texts while decode+tiles finished
        # in minutes. The rehearsal corpus therefore carries the replicated
        # DOCUMENTS texts (planted near-dup families, the dedup family's
        # standard rehearsal input) assigned cyclically to pages; html
        # payloads are untouched, so decode/tiles see the full volume.
        from pyspark.sql import Window

        from tools.scale_rehearsal import replicate_documents

        pages_raw = synth_pages(spark, args.sf_dir, replicate=args.replicate).drop("text")
        docs = replicate_documents(spark, args.sf_dir, args.replicate)
        n_texts = docs.count()
        pw = pages_raw.withColumn(
            "_rn", F.row_number().over(Window.orderBy("url")) - 1
        ).withColumn("_drn", F.pmod("_rn", F.lit(n_texts)))
        dw = docs.select(
            (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("_drn"),
            "text",
        )
        pw.join(dw, "_drn").drop("_rn", "_drn").select(
            "url", "warc_ts", "html", "text", "lang"
        ).repartition(args.batches).write.mode("overwrite").parquet(landing)
    pages = spark.read.parquet(landing)
    n_pages = pages.count()
    print(f"input: {n_pages} pages x{args.replicate}, {args.batches} files", flush=True)

    out = os.path.join(scratch, "pipe_rehearsal_out")
    ckpt = os.path.join(scratch, "pipe_rehearsal_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    t0 = time.time()
    summary = run_streaming_pipeline(
        spark, out=out, checkpoint=ckpt, pages_dir=landing,
        max_z=args.max_zoom, lsh=LSH, timeout=3600,
        source_options={"maxFilesPerTrigger": 1},
    )
    wall = round(time.time() - t0, 1)
    print(json.dumps({**summary, "wall_s": wall}), flush=True)

    failures = []
    n_offsets = len([
        o for o in os.listdir(os.path.join(ckpt, "decode", "offsets"))
        if not o.endswith(".tmp")
    ])
    if n_offsets < args.batches // 2:
        failures.append(f"only {n_offsets} decode micro-batches (wanted >= {args.batches // 2})")

    batch_ent = decode_entities(pages, on_error="skip")
    # fused bronze (r8): entity consumers filter out the kind=3 geo rows
    got_ent = spark.read.parquet(f"{out}/entities").filter(F.col("kind") <= 2)
    if _entity_checksum(got_ent) != _entity_checksum(batch_ent):
        failures.append("entities checksum != batch decode")

    want_tiles = _tile_checksum(
        tile_pyramid(batch_ent.filter(F.col("kind") == 0), max_z=args.max_zoom, min_z=0)
    )
    got_tiles = _tile_checksum(spark.read.parquet(f"{out}/tiles"))
    if got_tiles != want_tiles:
        failures.append(f"tiles checksum {got_tiles} != batch pyramid {want_tiles}")

    from osm_pbf_convert_spark.operators.joins import join_pages_geo
    from osm_pbf_convert_spark.sources.pbf import decode_nodes

    def _geo_checksum(geo):
        row = geo.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_geo").cast("decimal(38,0)")).alias("g"),
            F.sum(
                F.xxhash64("url", "min_ilat", "max_ilat", "min_ilon", "max_ilon")
                .cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return (row["n"], str(row["g"]), str(row["h"]))

    want_geo = _geo_checksum(
        join_pages_geo(pages, decode_nodes(pages, on_error="skip"))
    )
    got_geo = _geo_checksum(spark.read.parquet(f"{out}/pages_geo"))
    if got_geo != want_geo:
        failures.append(f"pages_geo checksum {got_geo} != batch join {want_geo}")

    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text").filter(
        F.col("text").isNotNull()
    )
    batch_pairs = dedup.minhash_lsh_pairs(docs, **LSH).select("a", "b")
    got_pairs = spark.read.parquet(f"{out}/dup_pairs").select("a", "b").distinct()
    missing = batch_pairs.exceptAll(got_pairs).count()
    extra = got_pairs.exceptAll(batch_pairs).count()
    n_batch_pairs = batch_pairs.count()
    if missing or extra:
        failures.append(f"dup pairs: {missing} missing, {extra} extra vs batch")

    result = {
        "metric": f"composed streaming pipeline rehearsal x{args.replicate}",
        "n_pages": n_pages,
        "batches": n_offsets,
        "wall_s": wall,
        "stage_walls": summary.get("stage_walls"),
        "n_entities": summary.get("n_entities"),
        "n_tile_rows": summary.get("n_tile_rows"),
        "batch_pairs": n_batch_pairs,
        "distinct_pairs": summary.get("n_dup_pairs_distinct"),
        "parity": not failures,
    }
    print(json.dumps(result))

    if not args.no_append and not failures:
        with open(os.path.join(REPO, "BENCH", "NOTES.md"), "a") as f:
            sw = summary.get("stage_walls") or {}
            f.write(
                f"\n## Composed streaming pipeline rehearsal: x{args.replicate} pages, "
                f"{n_offsets} micro-batches (local[32])\n\n"
                f"{n_pages:,} pages replayed availableNow through the full "
                f"decode -> tile rollup -> stateful dedup chain "
                f"(jobs/run_stream_pipeline.py surface): wall {wall} s "
                f"(decode {sw.get('decode')}, tiles {sw.get('tiles')}, "
                f"pages_geo {sw.get('pages_geo')}, dedup {sw.get('dedup')}); "
                f"{result['n_entities']:,} entities "
                f"checksum-equal to batch decode, {result['n_tile_rows']:,} "
                f"pyramid rows checksum-equal to batch tile_pyramid, "
                f"{summary.get('n_pages_geo'):,} pages_geo rows checksum-equal "
                f"to the batch join (zero-shuffle page-local aggregate), "
                f"{result['distinct_pairs']:,} distinct dup pairs SET-equal to "
                f"the batch LSH operator ({n_batch_pairs:,}; symmetric "
                f"difference 0) across state spanning every micro-batch. "
                f"RocksDB state store; foreachBatch merge cost bounded by "
                f"tile count per batch.\n"
            )
    spark.stop()
    if failures:
        print("STREAM PIPELINE REHEARSAL FAILED:\n  " + "\n  ".join(failures))
        sys.exit(1)
    print("stream pipeline rehearsal PASS")


if __name__ == "__main__":
    main()
