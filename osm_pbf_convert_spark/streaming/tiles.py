"""Streaming geo rollup: event-time windowed tile counts over a stream of
geo-tagged events (the streaming twin of operators/tiling.tile_counts).

The reference is single-pass batch (SURVEY.md); this is the engine
capability a live location-event feed needs: per-(window, zoom-z tile)
counts with watermark-bounded state. The same transformation runs on a
batch OR streaming DataFrame, so the batch DuckDB oracle (`tile_windows`
in the catalog) validates the streaming semantics; the streaming pytest
then checks stream output ⊆ batch output under `availableNow` replay.

Scale shape: state keyed by (window, tile) -- at z=8 that is at most 4^8
tiles per window and in practice the touched-tile set; the watermark
finalizes and evicts windows, so state is bounded regardless of stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pbf_convert_spark.functions.cells import morton_cell_col, tile_col


def windowed_tile_counts(points: DataFrame, z: int = 8, window: str = "1 hour") -> DataFrame:
    """points(ts, ilat, ilon) -> (window_start, tile, cnt) at zoom z.
    Works identically on batch and streaming inputs."""
    cell = morton_cell_col(F.col("ilat"), F.col("ilon"))
    return (
        points.groupBy(
            F.window("ts", window).alias("w"), tile_col(cell, z).alias("tile")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"), "tile", "cnt"
        )
    )


def stream_windowed_tile_counts(
    spark: SparkSession,
    points_dir: str,
    schema: str,
    z: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file source + watermark (late points beyond the
    watermark are dropped; per-(window, tile) state is finalized once the
    watermark passes the window end)."""
    stream = (
        spark.readStream.schema(schema).parquet(points_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return windowed_tile_counts(stream, z=z, window=window)
