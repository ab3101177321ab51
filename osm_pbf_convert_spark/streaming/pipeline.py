"""The composed streaming pipeline: ingest -> decode -> tile rollup ->
stateful dedup, as ONE documented product surface (the streaming twin of
jobs/run_pipeline.py; entry point jobs/run_stream_pipeline.py).

Until round 7 the streaming story was per-operator (streaming/
{pbf_extracts,tiles,dedup}.py each proven against its batch twin); this
module chains them the way a live crawl ingest actually runs, using the
standard bronze/silver multi-query pattern -- each stage is its own
streaming query with its own checkpoint, chained through the parquet
streaming sink's transaction log:

1. **decode** (bronze): pages parquet stream (url, warc_ts, html, text,
   lang -- the north-rule input shape) OR ``.osm.pbf`` extract drops
   (binaryFile source) -> ``decode_entities`` (stateless mapInArrow, the
   unchanged batch decoder) -> append-only ``{out}/entities``.
   Exactly-once per input file: the file source checkpoints which files
   it has consumed, the parquet sink logs which output files each batch
   committed (``_spark_metadata``), so a crashed/restarted query neither
   re-decodes nor double-writes.
2. **tiles** (silver): ``{out}/entities`` read AS A STREAM (the sink's
   metadata log makes the handoff exactly-once) -> node filter ->
   running per-finest-tile counts (update-mode stateful aggregation;
   state is bounded by the touched-tile count, <= 4^max_z keys, NOT by
   input rows) -> ``foreachBatch`` merge: changed tiles are upserted
   into ``{out}/tiles_finest`` and the z..min_z pyramid is re-derived
   from the merged finest table (``pyramid_from_finest`` -- input is the
   tile aggregate, never the node stream). The merge is idempotent
   (cumulative counts keyed by tile), so foreachBatch's at-least-once
   retry contract still yields exactly-once table contents. With plain
   parquet the upsert rewrites the finest table (bounded by tile count);
   on a lakehouse deployment the same fn is one Delta/Iceberg MERGE.
3. **pages_geo** (pages mode only): each page's geo extent computed
   PAGE-LOCALLY inside the decode pass (``decode_pages_geo`` -- a page's
   nodes come only from its own payload, so the per-url aggregate needs
   no shuffle and no state; the batch pipeline joins against the
   materialized entities table instead, row-for-row equal by pytest).
4. **dedup** (pages mode only -- extracts carry no text): page text ->
   ``stream_minhash_pairs`` (stateful LSH, RocksDB state store) ->
   append ``{out}/dup_pairs``. Pair emission is at-least-once per shared
   band (streaming/dedup.py contract); consumers take
   ``DISTINCT (a, b)``, which the replay test pins equal to the batch
   operator's pair set. Page identity: ``doc_id = xxhash64(url)`` --
   streams key documents by a 64-bit url hash because the stateful
   operator packs ids into fixed-width state (collision odds at crawl
   scale ~ n^2 / 2^65 -- negligible, and a collision costs one spurious
   candidate pair, not a correctness break downstream of verify).

``availableNow`` drains the three queries SEQUENTIALLY (decode fully
lands before tiles reads; the replay/test mode and the batch-parity
proof); continuous mode starts all three concurrently and lets the
sink->source chaining stream batches through as they commit.

Scale notes (100 TB): every stage is the already-rehearsed batch plan
lifted to streams -- decode is stateless Arrow, the tile state is the
pyramid's finest aggregate (the same bound as batch), dedup state is
8 B/doc/band in RocksDB. Nothing in the chain holds input-proportional
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pbf_convert_spark.operators.tiling import pyramid_from_finest
from osm_pbf_convert_spark.streaming.dedup import (
    configure_state_store,
    stream_minhash_pairs,
)

# decode_entities output with passthrough=("url",): the schema the tiles
# stage uses to re-read the entities sink as a stream (file sources do
# not infer schemas)
ENTITY_SCHEMA = (
    "url string, kind int, id bigint, lat double, lon double, ilat int,"
    " ilon int, tags map<string,string>, refs array<bigint>,"
    " members array<struct<member_type:int, ref:bigint, role:string>>"
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_stream(spark: SparkSession, pages_dir: str, schema: str = PAGES_SCHEMA,
                 **options) -> DataFrame:
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(pages_dir)


def decode_query(
    source: DataFrame,
    out: str,
    checkpoint: str,
    payload_col: str = "html",
    available_now: bool = True,
    trigger_seconds: int = 30,
):
    """Start the bronze decode query: payload stream -> entities parquet."""
    from osm_pbf_convert_spark.sources.pbf import decode_entities

    entities = decode_entities(
        source, payload_col=payload_col, passthrough=("url",), on_error="skip"
    )
    w = (
        entities.writeStream.format("parquet")
        .option("path", f"{out}/entities")
        .option("checkpointLocation", f"{checkpoint}/decode")
        .outputMode("append")
    )
    w = w.trigger(availableNow=True) if available_now else w.trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    return w.start()


def tile_rollup_query(
    spark: SparkSession,
    out: str,
    checkpoint: str,
    max_z: int = 12,
    min_z: int = 0,
    available_now: bool = True,
    trigger_seconds: int = 30,
):
    """Start the silver tile query: entities stream -> running finest-tile
    counts -> merged finest table + derived pyramid."""
    from osm_pbf_convert_spark.functions.cells import morton_cell_col, tile_col

    nodes = (
        spark.readStream.schema(ENTITY_SCHEMA)
        .parquet(f"{out}/entities")
        .filter(F.col("kind") == 0)
    )
    cell = morton_cell_col(F.col("ilat"), F.col("ilon"))
    finest = nodes.groupBy(tile_col(cell, max_z).alias("tile")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    finest_path = f"{out}/tiles_finest"
    tiles_path = f"{out}/tiles"
    tmp_path = f"{out}/_tiles_finest_tmp"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # update-mode rows are the CUMULATIVE count per changed tile, so
        # the merge is a keyed overwrite -- idempotent under foreachBatch
        # retries. Two bounded writes (tmp then swap) because plain
        # parquet cannot read and overwrite the same path in one job;
        # Delta/Iceberg deployments replace this body with MERGE INTO.
        sess = batch_df.sparkSession
        updated = batch_df.select("tile", "cnt")
        if not updated.take(1):
            return
        try:
            old = sess.read.parquet(finest_path)
            merged = old.join(updated.select("tile"), "tile", "left_anti").unionByName(updated)
        except Exception:
            merged = updated
        merged.write.mode("overwrite").parquet(tmp_path)
        sess.read.parquet(tmp_path).write.mode("overwrite").parquet(finest_path)
        pyramid_from_finest(
            sess.read.parquet(finest_path), max_z, min_z
        ).write.mode("overwrite").parquet(tiles_path)

    w = (
        finest.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", f"{checkpoint}/tiles")
    )
    w = w.trigger(availableNow=True) if available_now else w.trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    return w.start()


def pages_geo_query(
    source: DataFrame,
    out: str,
    checkpoint: str,
    available_now: bool = True,
    trigger_seconds: int = 30,
):
    """Start the pages_geo query: page -> its own geo extent, ZERO
    shuffle (``decode_pages_geo`` aggregates page-locally inside the
    decode pass -- the streaming replacement for the batch pipeline's
    join against the materialized entities table; text passes through
    byte-identical)."""
    from osm_pbf_convert_spark.sources.pbf import decode_pages_geo

    geo = decode_pages_geo(source, payload_col="html", on_error="skip")
    w = (
        geo.writeStream.format("parquet")
        .option("path", f"{out}/pages_geo")
        .option("checkpointLocation", f"{checkpoint}/pages_geo")
        .outputMode("append")
    )
    w = w.trigger(availableNow=True) if available_now else w.trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    return w.start()


def dedup_query(
    source: DataFrame,
    out: str,
    checkpoint: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int | None = None,
    state_ttl_minutes: int | None = None,
    available_now: bool = True,
    trigger_seconds: int = 30,
):
    """Start the dedup query: page text -> stateful LSH candidate pairs.
    Caller must have pointed the state store at RocksDB
    (``configure_state_store``) -- the orchestrator below does."""
    docs = source.select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    ).filter(F.col("text").isNotNull())
    pairs = stream_minhash_pairs(
        docs,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
        state_ttl_minutes=state_ttl_minutes,
    )
    w = (
        pairs.writeStream.format("parquet")
        .option("path", f"{out}/dup_pairs")
        .option("checkpointLocation", f"{checkpoint}/dedup")
        .outputMode("append")
    )
    w = w.trigger(availableNow=True) if available_now else w.trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    return w.start()


def _drain(q, timeout: int, name: str) -> None:
    try:
        if not q.awaitTermination(timeout):
            raise TimeoutError(
                f"streaming pipeline stage '{name}' did not drain within "
                f"{timeout}s (availableNow replay)"
            )
    finally:
        q.stop()


def run_streaming_pipeline(
    spark: SparkSession,
    out: str,
    checkpoint: str,
    pages_dir: str | None = None,
    watch_dir: str | None = None,
    pages_schema: str = PAGES_SCHEMA,
    max_z: int = 12,
    min_z: int = 0,
    lsh: dict | None = None,
    available_now: bool = True,
    trigger_seconds: int = 30,
    timeout: int = 600,
    source_options: dict | None = None,
):
    """Run the composed pipeline. Exactly one of ``pages_dir`` (crawl
    pages parquet stream; enables the dedup stage) / ``watch_dir``
    (``.osm.pbf`` extract drops; no text, so no dedup stage).

    ``available_now=True`` drains each stage sequentially and returns a
    summary dict -- the replay mode (idempotently resumable: re-running
    with the same checkpoint processes only files that arrived since).
    ``available_now=False`` starts the queries concurrently and returns
    them; the caller owns their lifecycle.
    """
    if bool(pages_dir) == bool(watch_dir):
        raise ValueError("exactly one of pages_dir / watch_dir is required")
    opts = source_options or {}
    if pages_dir:
        source = pages_stream(spark, pages_dir, pages_schema, **opts)
        payload_col = "html"
    else:
        from osm_pbf_convert_spark.streaming.pbf_extracts import pbf_extract_stream

        source = pbf_extract_stream(spark, watch_dir)
        payload_col = "payload"

    import time

    prev_provider = configure_state_store(spark, "rocksdb")
    stage_walls: dict[str, float] = {}
    try:
        queries = []
        t0 = time.time()
        q1 = decode_query(
            source, out, checkpoint, payload_col=payload_col,
            available_now=available_now, trigger_seconds=trigger_seconds,
        )
        queries.append(("decode", q1))
        if available_now:
            _drain(q1, timeout, "decode")
            stage_walls["decode"] = round(time.time() - t0, 1)
        t0 = time.time()
        q2 = tile_rollup_query(
            spark, out, checkpoint, max_z=max_z, min_z=min_z,
            available_now=available_now, trigger_seconds=trigger_seconds,
        )
        queries.append(("tiles", q2))
        if available_now:
            _drain(q2, timeout, "tiles")
            stage_walls["tiles"] = round(time.time() - t0, 1)
        if pages_dir:
            t0 = time.time()
            qg = pages_geo_query(
                source, out, checkpoint,
                available_now=available_now, trigger_seconds=trigger_seconds,
            )
            queries.append(("pages_geo", qg))
            if available_now:
                _drain(qg, timeout, "pages_geo")
                stage_walls["pages_geo"] = round(time.time() - t0, 1)
        q3 = None
        if pages_dir:
            t0 = time.time()
            q3 = dedup_query(
                source, out, checkpoint, **(lsh or {}),
                available_now=available_now, trigger_seconds=trigger_seconds,
            )
            queries.append(("dedup", q3))
            if available_now:
                _drain(q3, timeout, "dedup")
                stage_walls["dedup"] = round(time.time() - t0, 1)
        if not available_now:
            # concurrent mode: queries are still running against the
            # RocksDB conf -- the caller owns lifecycle AND conf restore
            return queries
    finally:
        if available_now:
            if prev_provider is None:
                configure_state_store(spark, "hdfs")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_provider
                )

    summary = {"out": out, "stages": [n for n, _ in queries],
               "stage_walls": stage_walls}
    try:
        summary["n_entities"] = spark.read.parquet(f"{out}/entities").count()
        summary["n_tile_rows"] = spark.read.parquet(f"{out}/tiles").count()
    except Exception:
        summary["n_entities"] = 0
        summary["n_tile_rows"] = 0
    if pages_dir:
        try:
            summary["n_pages_geo"] = spark.read.parquet(f"{out}/pages_geo").count()
        except Exception:
            summary["n_pages_geo"] = 0
        try:
            summary["n_dup_pairs_distinct"] = (
                spark.read.parquet(f"{out}/dup_pairs").select("a", "b").distinct().count()
            )
        except Exception:
            summary["n_dup_pairs_distinct"] = 0
    return summary
