"""Streaming ingest of ``.osm.pbf`` extracts: watch a directory, decode
each newly-arrived extract file into entity rows.

The reference processes one extract per invocation
(``PbfFileProcessor.Process``); a live pipeline instead receives
regional extract drops (Geofabrik-style dailies) and wants them decoded
as they land. Structured Streaming's ``binaryFile`` source provides
exactly-once per-file tracking (checkpointed file log), and the
existing ``sources.pbf`` mapInArrow decoders run UNCHANGED on the
streaming DataFrame -- the whole batch decode stack is reused, so the
batch DuckDB oracles validate the streaming semantics and the pytest
checks stream output == batch output under ``availableNow`` replay.

Scale shape: one input file per task (``binaryFile`` does not split
files) -- right for the extract-drop pattern where files arrive many at
a time; a single monolithic planet file is the batch reader's job
(``sources.pbf_file``, byte-range splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pbf_extract_stream(
    spark: SparkSession, watch_dir: str, glob: str = "*.osm.pbf"
) -> DataFrame:
    """Streaming DataFrame of (url, payload) per arriving extract file:
    the same (identity, framed-bytes) contract the decoders take, with
    the file path as the lineage identity."""
    return (
        spark.readStream.format("binaryFile")
        # the source's fixed schema, stated explicitly (streaming sources
        # do not infer)
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", glob)
        .load(watch_dir)
        .select(F.col("path").alias("url"), F.col("content").alias("payload"))
    )


def stream_decode_nodes(
    spark: SparkSession, watch_dir: str, glob: str = "*.osm.pbf",
    on_error: str = "skip",
) -> DataFrame:
    """Streaming node rows from arriving extracts -- `decode_nodes` on
    the file stream (mapInArrow is streaming-compatible; stateless, so
    no watermark is needed until an aggregation is stacked on top)."""
    from osm_pbf_convert_spark.sources.pbf import decode_nodes

    return decode_nodes(
        pbf_extract_stream(spark, watch_dir, glob),
        payload_col="payload", on_error=on_error,
    )


def stream_decode_entities(
    spark: SparkSession, watch_dir: str, glob: str = "*.osm.pbf",
    on_error: str = "skip",
) -> DataFrame:
    from osm_pbf_convert_spark.sources.pbf import decode_entities

    return decode_entities(
        pbf_extract_stream(spark, watch_dir, glob),
        payload_col="payload", on_error=on_error,
    )
