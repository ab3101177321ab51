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

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pbf_convert_spark.codecs import decode_varints_msb

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


def tile_pyramid(nodes: DataFrame, max_z: int = 15, min_z: int = 0) -> DataFrame:
    """(z, tile, cnt) for all zooms in [min_z, max_z], rolled up from the
    finest zoom.

    Round-7 rework (previously GROUPING SETS): the old plan's Expand
    multiplied every INPUT row by the level count before the partial
    aggregate -- 16x the node rows flowing into hash aggregation, the
    single most expensive e2e stage at bench scale and 16x wasted work at
    100 TB node counts. Now the input is aggregated ONCE at ``max_z``
    (plain groupBy -- map-side combine, one shuffle of per-partition
    distinct finest tiles), and every coarser zoom is derived by
    truncating the finest tile's Morton prefix (``tile_z >> 2*(max_z-z)``)
    and re-aggregating the FINEST COUNTS -- the Expand now multiplies the
    (much smaller) finest aggregate, not the input. One input scan for
    all 16 levels (plan-pinned); the second shuffle carries levels x
    finest-tile partials, bounded by the pyramid size, never by input
    rows.

    (min_z == 0 still yields tile 0 = global count, from the same rollup.)
    """
    if not 0 <= min_z <= max_z <= 15:
        raise ValueError("need 0 <= min_z <= max_z <= 15")
    cell = morton_cell_col(F.col("ilat"), F.col("ilon"))
    finest = nodes.groupBy(tile_col(cell, max_z).alias("tile")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return pyramid_from_finest(finest, max_z, min_z)


def pyramid_from_finest(finest: DataFrame, max_z: int, min_z: int = 0) -> DataFrame:
    """(z, tile, cnt) for all zooms in [min_z, max_z], derived from a
    finest-zoom aggregate ``(tile, cnt)`` at ``max_z`` by truncating the
    Morton prefix and re-aggregating. Input is the (small) tile table, so
    this is also the per-micro-batch rollup step of the streaming pipeline
    (streaming/pipeline.py), where the finest counts are the running
    stateful aggregate."""
    zooms = list(range(min_z, max_z + 1))
    levels = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(z).alias("z"),
                    F.shiftrightunsigned(F.col("tile"), 2 * (max_z - z)).alias("tile"),
                )
                for z in zooms
            ]
        )
    )
    return (
        finest.select(levels.alias("e"), "cnt")
        .groupBy(F.col("e.z").alias("z"), F.col("e.tile").alias("tile"))
        .agg(F.sum("cnt").alias("cnt"))
    )


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


def export_heat_map_bytes(heat_df, rows: int = 16384, cols: int = 32768) -> bytes:
    """Serialize a heat-map count grid in the REFERENCE'S binary format:
    MSB-first 7-bit varint per cell, row-major, zeros included
    (``HeatMapProcessor.Finish``: Write7BitEncodedInt over int[16384,32768]).

    Driver-side materialization of the (sparse) aggregate into the dense
    dump -- intended for bounded grids / cropped regions; the full global
    grid at reference dimensions is a ~0.5 GB artifact: use the
    distributed band sink (``heat_map_bands`` / ``write_heat_map_file``
    below, byte-identical by golden test) for it. Kept as the byte-format
    parity bridge to the reference's `.heat.map` files.
    """
    import numpy as np

    from osm_pbf_convert_spark.codecs import encode_varints_msb

    pdf = heat_df.toPandas()
    grid = np.zeros((rows, cols), dtype=np.int64)
    grid[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["cnt"].to_numpy()
    return encode_varints_msb(grid.ravel().tolist())


def heat_map_bands(
    heat_df: DataFrame, rows: int = 16384, cols: int = 32768, band_rows: int = 512,
    on_out_of_range: str = "error",
) -> DataFrame:
    """Distributed encoder for the reference heat-map byte format: the grid
    is split into ``rows/band_rows`` horizontal bands, each band encoded to
    its exact byte slice ON AN EXECUTOR (vectorized MSB-varint, zeros
    included). Returns (band, n_bytes, data binary); concatenating ``data``
    in band order is byte-equal to ``export_heat_map_bytes`` of the whole
    grid -- without ever materializing the ~0.5 GB dense dump on the
    driver (the full-grid scale path the driver-side export is not).

    Empty bands are preserved (all-zero slices) via a range outer-join, so
    the band set is always complete.

    ``on_out_of_range``: "error" (default) fails the job if any cell falls
    outside [0, rows) x [0, cols) -- silently dropping cells would make
    the byte dump LOOK complete while under-counting; "drop" restores the
    old filter semantics for callers that crop a larger grid on purpose.
    """
    import pandas as pd

    from osm_pbf_convert_spark.codecs import encode_varints_msb_np

    if rows % band_rows:
        raise ValueError("band_rows must divide rows")
    if on_out_of_range not in ("error", "drop"):
        raise ValueError("on_out_of_range must be 'error' or 'drop'")
    n_bands = rows // band_rows
    spark = heat_df.sparkSession
    bands = spark.range(n_bands).select(F.col("id").cast("int").alias("band"))
    in_range = (
        (F.col("row") >= 0) & (F.col("row") < rows)
        & (F.col("col") >= 0) & (F.col("col") < cols)
    )
    if on_out_of_range == "drop":
        cells = heat_df.filter(in_range).withColumn(
            "band", (F.col("row") / band_rows).cast("int")
        )
    else:
        # out-of-range cells land in sentinel band -1 and fail the encode
        # task with a counted error (no extra pre-scan action needed)
        cells = heat_df.withColumn(
            "band", F.when(in_range, (F.col("row") / band_rows).cast("int")).otherwise(F.lit(-1))
        )
    full = bands.join(cells, "band", "left")
    if on_out_of_range == "error":
        full = full.unionByName(cells.filter(F.col("band") == -1))

    def encode_band(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        band = int(pdf["band"].iloc[0])
        if band < 0:
            bad = pdf[["row", "col"]].head(3).to_dict("records")
            raise ValueError(
                f"heat_map_bands: {len(pdf)} cell(s) outside [0,{rows})x[0,{cols}), "
                f"e.g. {bad}; pass on_out_of_range='drop' to crop"
            )
        grid = np.zeros((band_rows, cols), dtype=np.int64)
        hit = pdf.dropna(subset=["row"])
        if len(hit):
            r = hit["row"].to_numpy(np.int64) - band * band_rows
            grid[r, hit["col"].to_numpy(np.int64)] = hit["cnt"].to_numpy(np.int64)
        data = encode_varints_msb_np(grid.ravel())
        return pd.DataFrame({"band": [band], "n_bytes": [len(data)], "data": [data]})

    return full.groupBy("band").applyInPandas(
        encode_band, schema="band int, n_bytes long, data binary"
    )


def read_heat_map_file(
    spark, path: str, rows: int = 16384, cols: int = 32768,
    split_bytes: int = 32 * 1024 * 1024, sparse: bool = True,
) -> DataFrame:
    """Distributed reader for a reference ``.heat.map`` file -> DataFrame
    (row, col, cnt), the inverse of ``write_heat_map_file``.

    The format is a dense row-major run of rows*cols MSB varints with no
    index, so a byte split cannot know its starting CELL index locally.
    Two distributed passes fix that (the same trick Spark's text source
    uses for line offsets): pass 1 counts varint ends (bytes < 0x80) per
    byte range -- one vectorized popcount per split -- and a driver
    prefix-sum turns the counts into each split's absolute cell offset;
    pass 2 decodes each range (a varint belongs to the split where it
    ENDS; up to 9 continuation bytes are re-read from before the range
    start) and emits cells at offset + arange. ``sparse=True`` drops
    zero cells executor-side, so the returned frame is aggregate-sized,
    not grid-sized. Total varint count is validated against rows*cols.
    """
    import os

    import pandas as pd

    from osm_pbf_convert_spark.sources import fsio

    size = fsio.file_size(path)
    n_splits = max(1, -(-size // split_bytes))
    bounds = [(i * split_bytes, min((i + 1) * split_bytes, size)) for i in range(n_splits)]
    rdf = spark.createDataFrame(bounds, schema="start long, end long")

    def count_ends(batches):
        for pdf in batches:
            rows_out = []
            for s, e in zip(pdf["start"], pdf["end"]):
                from osm_pbf_convert_spark.sources import fsio

                with fsio.open_seekable(path) as f:
                    f.seek(int(s))
                    b = np.frombuffer(f.read(int(e) - int(s)), dtype=np.uint8)
                rows_out.append((int(s), int((b < 0x80).sum())))
            yield pd.DataFrame(rows_out, columns=["start", "n_vals"])

    counts = {
        r["start"]: r["n_vals"]
        for r in rdf.mapInPandas(count_ends, "start long, n_vals long").collect()
    }
    total = sum(counts.values())
    if total != rows * cols:
        raise ValueError(f"{path}: {total} varints, expected {rows * cols}")
    offsets = []
    acc = 0
    for s, e in bounds:
        offsets.append((s, e, acc))
        acc += counts[s]
    odf = spark.createDataFrame(offsets, schema="start long, end long, cell_off long")

    def decode(batches):
        for pdf in batches:
            for s, e, off in zip(pdf["start"], pdf["end"], pdf["cell_off"]):
                s, e, off = int(s), int(e), int(off)
                back = min(s, 9)  # a uint64 varint is <= 10 bytes
                from osm_pbf_convert_spark.sources import fsio

                with fsio.open_seekable(path) as f:
                    f.seek(s - back)
                    b = np.frombuffer(f.read(back + e - s), dtype=np.uint8)
                ends = np.nonzero(b < 0x80)[0]
                # first varint ending at/after s: may START before s --
                # include its continuation bytes from the backread
                first_end = int(np.searchsorted(ends, back))
                if first_end == ends.size:
                    continue  # no varint ends in this range
                begin = 0 if first_end == 0 else int(ends[first_end - 1]) + 1
                last = int(ends[np.searchsorted(ends, b.size) - 1])
                vals = decode_varints_msb(b[begin:last + 1])
                idx = off + np.arange(vals.size, dtype=np.int64)
                if sparse:
                    keep = vals != 0
                    vals, idx = vals[keep], idx[keep]
                yield pd.DataFrame({
                    "row": (idx // cols).astype(np.int32),
                    "col": (idx % cols).astype(np.int32),
                    "cnt": vals.astype(np.int64),
                })

    return odf.repartitionByRange(n_splits, "start").mapInPandas(
        decode, schema="row int, col int, cnt long"
    )


def write_heat_map_file(heat_df: DataFrame, out_file: str, rows: int = 16384,
                        cols: int = 32768, band_rows: int = 512) -> int:
    """Assemble the reference ``.heat.map`` byte stream: bands encode in
    parallel on executors; the driver only streams the (already encoded)
    slices to the target in order. ``out_file`` goes through the Hadoop
    FileSystem API, so object-store / HDFS URIs (s3a://, hdfs://) work the
    same as local paths -- consistent with checkpoint._exists. Returns
    total bytes written."""
    bands = heat_map_bands(heat_df, rows, cols, band_rows).orderBy("band")
    spark = heat_df.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(out_file)
    fs = path.getFileSystem(hconf)
    out = fs.create(path, True)
    total = 0
    try:
        for r in bands.toLocalIterator():
            out.write(bytearray(r["data"]))
            total += len(r["data"])
    finally:
        out.close()
    return total
