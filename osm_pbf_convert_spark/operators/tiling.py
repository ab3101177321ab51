"""Raster / vector tiling: heat-map grid counts, per-zoom tile counts, and a
hierarchical tile pyramid (zooms 0-15).

- heat map (``OSM-pbf-convert/HeatMapProcessor.cs:24-47``): fixed
  16384x32768 grid, ``row=(uint)(ilat+int.MaxValue)>>18``,
  ``col=(uint)(ilon+int.MaxValue)>>17`` -- one groupBy/count, bit-exact
  cell math via ``heat_row_col``/``heat_col_col``.
- tile pyramid (north rule raster<->vector, zooms 0-15): aggregate ONCE at
  the finest zoom, then roll coarser levels up from the previous level
  (``tile_{z-1} = tile_z >> 2``). Each rollup shuffles only the previous
  level's aggregate (<= 4^z rows), never the input -- at 100 TB the input
  is scanned exactly once for all 16 zoom levels.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pbf_convert_spark.functions.cells import (
    heat_col_col,
    heat_row_col,
    morton_cell_col,
    tile_col,
)


def heat_map(nodes: DataFrame) -> DataFrame:
    """(row, col, cnt) counts on the reference's fixed raster grid."""
    return (
        nodes.groupBy(
            heat_row_col(F.col("ilat")).alias("row"),
            heat_col_col(F.col("ilon")).alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def tile_counts(nodes: DataFrame, z: int) -> DataFrame:
    """(tile, cnt) at zoom z from ilat/ilon via the Morton cell prefix."""
    cell = morton_cell_col(F.col("ilat"), F.col("ilon"))
    return nodes.groupBy(tile_col(cell, z).alias("tile")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def tile_pyramid(
    nodes: DataFrame, max_z: int = 15, min_z: int = 0, materialize: bool = True
) -> DataFrame:
    """(z, tile, cnt) for all zooms in [min_z, max_z].

    Single input scan: the base aggregate runs at max_z and is persisted;
    every coarser level rolls up directly from the cached base
    (parent tile = base tile >> 2*(max_z-z)), so all levels run as parallel
    branches of one job over tile aggregates orders of magnitude smaller
    than the input. Spark does not share common subplans across union
    branches, hence the explicit persist -- without it every level would
    re-aggregate the raw input.
    """
    if not 0 <= min_z <= max_z <= 15:
        raise ValueError("need 0 <= min_z <= max_z <= 15")
    base = tile_counts(nodes, max_z).withColumn("z", F.lit(max_z)).select("z", "tile", "cnt")
    if materialize:
        base = base.persist()
        base.count()  # ONE job scans the input; everything below reads cache
    levels = [base]
    for z in range(max_z - 1, min_z - 1, -1):
        levels.append(
            base.groupBy(F.shiftright(F.col("tile"), 2 * (max_z - z)).alias("tile"))
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("z", F.lit(z))
            .select("z", "tile", "cnt")
        )
    return reduce(lambda a, b: a.unionByName(b), levels)


def rasterize_tiles(tile_df: DataFrame, z: int) -> DataFrame:
    """Vector tile counts -> raster pixel coords at zoom z: decode the
    Morton tile id into (y, x) grid position (inverse interleave done with
    pure column bit-math, 5 compact rounds)."""
    def compact(c, shift):
        x = F.shiftrightunsigned(c, shift).bitwiseAND(F.lit(0x5555555555555555))
        x = (x.bitwiseOR(F.shiftright(x, 1))).bitwiseAND(F.lit(0x3333333333333333))
        x = (x.bitwiseOR(F.shiftright(x, 2))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        x = (x.bitwiseOR(F.shiftright(x, 4))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        x = (x.bitwiseOR(F.shiftright(x, 8))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        x = (x.bitwiseOR(F.shiftright(x, 16))).bitwiseAND(F.lit(0x00000000FFFFFFFF))
        return x

    return tile_df.select(
        compact(F.col("tile"), 1).alias("y"),
        compact(F.col("tile"), 0).alias("x"),
        "cnt",
    )
