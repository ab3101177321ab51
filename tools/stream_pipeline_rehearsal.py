"""Composed streaming-pipeline rehearsal at Nx bench volume: the whole
decode -> tile rollup -> stateful dedup chain (streaming/pipeline.py)
replayed availableNow over a replicated pages corpus, with hard parity
gates against the batch operators -- the evidence that the COMPOSED
surface (not just each operator) holds its exact-batch-parity contract
when state and the foreachBatch merge span many micro-batches at
10x-plus the bench row counts.

    python tools/stream_pipeline_rehearsal.py                  # 16x pages
    python tools/stream_pipeline_rehearsal.py --replicate 4 --batches 4
    python tools/stream_pipeline_rehearsal.py --continuous     # live mode
    python tools/stream_pipeline_rehearsal.py --anchor 4       # incremental

Gates (exit 1 on failure): entities count + per-kind id checksum equal
to batch decode; tile pyramid checksum-equal to batch tile_pyramid;
distinct dup pairs set-equal to the batch LSH operator (symmetric
difference == 0); the replay must actually span >= batches/2
micro-batches. Appends a markdown section to BENCH/NOTES.md.
NEVER run concurrently with other work (single-box timings).

``--continuous`` (round 8; VERDICT r7 item 5) rehearses processingTime
triggers instead of sequential availableNow drains: all queries start
CONCURRENTLY, input files are fed into the landing dir one at a time
WHILE downstream batches run (sink->source handoff live). Extra gates:
(a) overlap -- the tiles stage must process a data batch before decode
finishes its last one; (b) completeness -- a follow-up availableNow
drain against the same checkpoints must land zero new rows; (c) no
duplicate/lost files -- every parquet sink's ``_spark_metadata`` log
must list exactly the part files on disk; (d) the same batch-parity
checksums as replay mode.

``--anchor N`` runs the tile merge in the round-8 INCREMENTAL layout
(``tile_anchor_z=N``): per-batch bytes written are reported in the
summary (proportional to changed regions, not table size), and the
tiles parity gate proves the partition-pruned merge lands the identical
pyramid.
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


def _pp(p, key):
    """Field of a StreamingQueryProgress entry (dict in some PySpark
    versions, object with properties in others)."""
    try:
        return p[key]
    except Exception:
        return getattr(p, key)


def _sink_log_names(sink_dir: str) -> set:
    """Basenames of every data file the parquet streaming sink's
    ``_spark_metadata`` transaction log says it committed: the latest
    ``.compact`` (which folds in everything before it) plus later
    increments -- the exactly-once file inventory downstream readers
    trust."""
    log_dir = os.path.join(sink_dir, "_spark_metadata")
    entries = [f for f in os.listdir(log_dir) if not f.endswith(".tmp")]
    compacts = sorted(
        int(f.split(".")[0]) for f in entries if f.endswith(".compact")
    )
    start = compacts[-1] if compacts else -1
    names = set()
    for f in entries:
        base = f.split(".")[0]
        try:
            n = int(base)
        except ValueError:
            continue
        if f.endswith(".compact"):
            if n != start:
                continue
        elif n <= start:
            continue
        with open(os.path.join(log_dir, f)) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{"):
                    names.add(os.path.basename(json.loads(line)["path"]))
    return names


def _disk_part_names(sink_dir: str) -> set:
    return {f for f in os.listdir(sink_dir) if f.startswith("part-")}


def _counts_snapshot(spark, out: str) -> dict:
    from pyspark.sql import functions as F

    return {
        "entities": spark.read.parquet(f"{out}/entities")
        .filter(F.col("kind") <= 2).count(),
        "pages_geo": spark.read.parquet(f"{out}/pages_geo").count(),
        "dup_pairs": spark.read.parquet(f"{out}/dup_pairs")
        .select("a", "b").distinct().count(),
        "tiles": _tile_checksum(spark.read.parquet(f"{out}/tiles")),
    }


def run_continuous(spark, landing, out, ckpt, args, merge_stats):
    """Start all pipeline queries on processingTime triggers, feed the
    staged input files in one at a time WHILE downstream batches run,
    wait for quiescence, then stop. Returns (summary, failures)."""
    from pyspark.sql import functions as F

    from osm_pbf_convert_spark.streaming.dedup import configure_state_store
    from osm_pbf_convert_spark.streaming.pipeline import run_streaming_pipeline

    scratch = os.path.dirname(out)
    feed = os.path.join(scratch, "pipe_rehearsal_feed")
    shutil.rmtree(feed, ignore_errors=True)
    os.makedirs(feed)
    parts = sorted(f for f in os.listdir(landing) if f.startswith("part-"))
    failures = []
    t0 = time.time()
    queries = run_streaming_pipeline(
        spark, out=out, checkpoint=ckpt, pages_dir=feed,
        max_z=args.max_zoom, lsh=LSH, available_now=False,
        trigger_seconds=args.trigger_seconds,
        source_options={"maxFilesPerTrigger": 1},
        tile_anchor_z=args.anchor, merge_stats=merge_stats,
    )
    progress = {name: {} for name, _ in queries}

    def harvest():
        for name, q in queries:
            for p in q.recentProgress:
                if p is not None and _pp(p, "numInputRows") > 0:
                    progress[name][_pp(p, "batchId")] = _pp(p, "timestamp")

    try:
        for f in parts:
            # hardlink = the file appears in the landing dir atomically,
            # with downstream batches already running
            os.link(os.path.join(landing, f), os.path.join(feed, f))
            time.sleep(args.feed_interval)
            harvest()
        quiet, deadline = 0, time.time() + 3600
        while quiet < 3:
            if time.time() > deadline:
                raise TimeoutError("continuous rehearsal did not quiesce in 1h")
            time.sleep(max(2, args.trigger_seconds))
            harvest()
            quiet = (
                quiet + 1
                if all(
                    not q.status["isDataAvailable"]
                    and not q.status["isTriggerActive"]
                    for _, q in queries
                )
                else 0
            )
        harvest()
    finally:
        for _, q in queries:
            q.stop()
        for _, q in queries:
            q.awaitTermination(60)
        configure_state_store(spark, "hdfs")
    wall = round(time.time() - t0, 1)

    # gate: downstream batches ran WHILE input was still arriving --
    # the tiles stage's first data batch must predate decode's last one
    data_batches = {n: sorted(ts.values()) for n, ts in progress.items()}
    if len(data_batches.get("decode", [])) < 2:
        failures.append("continuous: decode ran < 2 data batches")
    for stage in ("tiles", "pages_geo", "dedup"):
        if not data_batches.get(stage):
            failures.append(f"continuous: {stage} processed no data batches")
    if data_batches.get("decode") and data_batches.get("tiles"):
        if not data_batches["tiles"][0] < data_batches["decode"][-1]:
            failures.append(
                "continuous: no overlap -- tiles first data batch "
                f"({data_batches['tiles'][0]}) not before decode's last "
                f"({data_batches['decode'][-1]})"
            )

    # gate: the continuous run consumed EVERYTHING -- a follow-up
    # availableNow drain on the same checkpoints must change nothing
    before = _counts_snapshot(spark, out)
    run_streaming_pipeline(
        spark, out=out, checkpoint=ckpt, pages_dir=feed,
        max_z=args.max_zoom, lsh=LSH, timeout=3600,
        source_options={"maxFilesPerTrigger": 1},
        tile_anchor_z=args.anchor, merge_stats=merge_stats,
    )
    after = _counts_snapshot(spark, out)
    if before != after:
        failures.append(f"continuous: drain found unprocessed input ({before} -> {after})")

    # gate: exactly-once file inventory -- each parquet sink's metadata
    # log lists exactly the part files on disk (no duplicate, none lost)
    for sink in ("entities", "pages_geo", "dup_pairs"):
        logged = _sink_log_names(os.path.join(out, sink))
        on_disk = _disk_part_names(os.path.join(out, sink))
        if logged != on_disk:
            failures.append(
                f"continuous: {sink} metadata log/disk mismatch "
                f"(+{len(on_disk - logged)} unlogged, {len(logged - on_disk)} missing)"
            )

    summary = {
        "out": out,
        "stages": [n for n, _ in queries],
        "mode": "continuous",
        "data_batches": {n: len(v) for n, v in data_batches.items()},
        "n_entities": after["entities"],
        "n_pages_geo": after["pages_geo"],
        "n_dup_pairs_distinct": after["dup_pairs"],
        "wall_s": wall,
    }
    if merge_stats:
        summary["tile_merge"] = {
            "batches": len(merge_stats),
            "changed_pz": [s["changed_pz"] for s in merge_stats],
            "bytes_written": [s["bytes_written"] for s in merge_stats],
        }
    return summary, failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--max-zoom", type=int, default=12)
    ap.add_argument("--no-append", action="store_true")
    ap.add_argument("--continuous", action="store_true",
                    help="processingTime triggers, all queries concurrent, "
                         "input fed DURING processing (r7 verdict item 5)")
    ap.add_argument("--trigger-seconds", type=int, default=2)
    ap.add_argument("--feed-interval", type=float, default=3.0,
                    help="seconds between input file drops (continuous mode)")
    ap.add_argument("--anchor", type=int, default=None,
                    help="tile_anchor_z: run the tile merge in the "
                         "incremental partition-pruned layout")
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

    merge_stats = []
    if args.continuous:
        summary, failures = run_continuous(
            spark, landing, out, ckpt, args, merge_stats
        )
        wall = summary["wall_s"]
        print(json.dumps(summary), flush=True)
    else:
        t0 = time.time()
        summary = run_streaming_pipeline(
            spark, out=out, checkpoint=ckpt, pages_dir=landing,
            max_z=args.max_zoom, lsh=LSH, timeout=3600,
            source_options={"maxFilesPerTrigger": 1},
            tile_anchor_z=args.anchor, merge_stats=merge_stats,
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
        "metric": f"composed streaming pipeline rehearsal x{args.replicate}"
        + (" [continuous]" if args.continuous else "")
        + (f" [incremental anchor={args.anchor}]" if args.anchor is not None else ""),
        "n_pages": n_pages,
        "batches": n_offsets,
        "wall_s": wall,
        "stage_walls": summary.get("stage_walls"),
        "data_batches": summary.get("data_batches"),
        "n_entities": summary.get("n_entities"),
        "n_tile_rows": summary.get("n_tile_rows"),
        "batch_pairs": n_batch_pairs,
        "distinct_pairs": summary.get("n_dup_pairs_distinct"),
        "tile_merge": summary.get("tile_merge"),
        "parity": not failures,
    }
    print(json.dumps(result))

    if not args.no_append and not failures and args.continuous:
        with open(os.path.join(REPO, "BENCH", "NOTES.md"), "a") as f:
            db = summary.get("data_batches") or {}
            tm = summary.get("tile_merge")
            tm_txt = ""
            if tm:
                mb = tm["bytes_written"]
                tm_txt = (
                    f" Incremental tile merge (anchor_z={args.anchor}): "
                    f"{tm['batches']} merge batches, per-batch bytes "
                    f"{min(mb):,}-{max(mb):,} (changed regions "
                    f"{min(tm['changed_pz'])}-{max(tm['changed_pz'])})."
                )
            f.write(
                f"\n## CONTINUOUS-trigger pipeline rehearsal: x{args.replicate} pages, "
                f"live feed (local[32])\n\n"
                f"{n_pages:,} pages fed file-by-file into the landing dir "
                f"WHILE all four processingTime-trigger queries ran "
                f"concurrently (trigger {args.trigger_seconds}s, feed every "
                f"{args.feed_interval}s; sink->source handoff live): wall "
                f"{wall} s; data batches per stage {db}; overlap gate held "
                f"(tiles consumed bronze output before decode finished); a "
                f"follow-up availableNow drain changed NOTHING (zero "
                f"unprocessed input); every sink's _spark_metadata log "
                f"lists exactly the part files on disk (no duplicate/lost "
                f"files); entities/tiles/pages_geo/dup-pairs parity "
                f"checksums all equal to the batch operators.{tm_txt}\n"
            )
    elif not args.no_append and not failures:
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
                f"tile count per batch."
                + (
                    f" Incremental tile merge (anchor_z={args.anchor}): "
                    f"{summary['tile_merge']['batches']} merge batches, "
                    f"changed regions {summary['tile_merge']['changed_pz']}, "
                    f"bytes {summary['tile_merge']['bytes_written']}.\n"
                    if summary.get("tile_merge")
                    else "\n"
                )
            )
    spark.stop()
    if failures:
        print("STREAM PIPELINE REHEARSAL FAILED:\n  " + "\n  ".join(failures))
        sys.exit(1)
    print("stream pipeline rehearsal PASS")


if __name__ == "__main__":
    main()
