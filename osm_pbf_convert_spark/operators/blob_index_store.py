"""The reference's ``.blobs.dat`` per-blob id zone-map file -- the sixth
and last byte format, both directions.

The reference's ids-indexer pass accumulates one ``BlobIdsInfo`` per
blob (min/max node id, node/way/relation counts, blob start offset --
``OSM-pbf-convert/IdsIndexerBlobProcessor.cs:38-113``) and serializes
the list as fixed-width little-endian records via ``BinaryWriter``
(``BlobIdsInfo.cs:35-42`` ``WriteBlobInfo``; file-level
``WriteIdsIndex`` at ``BlobIdsInfo.cs:44-51``; read back by
``ReadBlobIdsInfo`` at ``BlobIdsInfo.cs:21-32``):

    int64 StartPosition | int32 NodesCount | int64 MinNodeId |
    int64 MaxNodeId     | int32 WaysCount  | int32 RelationsCount

36 bytes per record, no header, no padding. The engine's QUERY path
for zone maps stays the Parquet form (``queries.q_zone_maps``, CLI
``blob-index``); this module adds byte parity so reference-produced
``.blobs.dat`` files interop in both directions.

Spark-first shape: the format is fixed-width, so unlike the five
delta-chained formats it is PERFECTLY splittable -- the distributed
reader cuts byte ranges aligned to 36-byte multiples and each task
decodes its range with one ``numpy.frombuffer`` on a packed structured
dtype (no driver skim, no reseeding). The writer encodes partitions as
single ``tobytes()`` blobs executor-side; the driver only streams them
in record order (the single-file serial tail shared by all the byte
sinks). Both ends do IO through ``sources.fsio``, so local paths and
object-store URIs behave identically.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

# BinaryWriter field order, little-endian, packed (BlobIdsInfo.cs:35-42)
RECORD = struct.Struct("<qiqqii")
RECORD_BYTES = RECORD.size  # 36

# the same layout as a packed numpy structured dtype (vectorized path)
_DTYPE = np.dtype(
    [
        ("start_position", "<i8"),
        ("nodes_count", "<i4"),
        ("min_node_id", "<i8"),
        ("max_node_id", "<i8"),
        ("ways_count", "<i4"),
        ("rels_count", "<i4"),
    ]
)
assert _DTYPE.itemsize == RECORD_BYTES

COLUMNS = list(_DTYPE.names)
SCHEMA = (
    "start_position long, nodes_count int, min_node_id long, "
    "max_node_id long, ways_count int, rels_count int"
)


def encode_blob_ids_info_py(infos) -> bytes:
    """Golden pure-Python port of ``WriteIdsIndex``
    (``BlobIdsInfo.cs:35-51``): ``infos`` is an iterable of
    (start_position, nodes_count, min_node_id, max_node_id,
    ways_count, rels_count) tuples, one 36-byte record each."""
    return b"".join(RECORD.pack(*info) for info in infos)


def decode_blob_ids_info_py(data: bytes) -> list:
    """Sequential reader port (``ReadBlobIdsInfo``,
    ``BlobIdsInfo.cs:21-32``)."""
    if len(data) % RECORD_BYTES:
        raise ValueError(
            f"truncated .blobs.dat: {len(data)} is not a multiple of {RECORD_BYTES}"
        )
    return [RECORD.unpack_from(data, off) for off in range(0, len(data), RECORD_BYTES)]


def blob_index_segments(df: DataFrame, num_chunks: int | None = None) -> DataFrame:
    """Distributed encode stage: range-partition on ``start_position``
    (the reference writes infos in blob order), encode each partition
    as ONE packed-record blob via the structured dtype. Returns
    (first_pos, blob) rows -- the driver orders by first_pos and
    streams."""
    import pandas as pd
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n = num_chunks or spark.sparkContext.defaultParallelism
    types = {"i8": "long", "i4": "int"}
    part = (
        df.select(*[
            F.col(c).cast(types[_DTYPE[c].str.lstrip("<|")]).alias(c) for c in COLUMNS
        ])
        .repartitionByRange(n, "start_position")
        .sortWithinPartitions("start_position")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = []
        first = None
        for pdf in batches:
            if not len(pdf):
                continue
            rec = np.empty(len(pdf), dtype=_DTYPE)
            for c in COLUMNS:
                rec[c] = pdf[c].to_numpy()
            if first is None:
                first = int(rec["start_position"][0])
            parts.append(rec.tobytes())
        if parts:
            yield pd.DataFrame({"first_pos": [first], "blob": [b"".join(parts)]})

    return part.mapInPandas(encode, schema="first_pos long, blob binary")


def write_blobs_dat(df: DataFrame, out_path: str, num_chunks: int | None = None) -> int:
    """Single ``.blobs.dat`` byte sink: executor-parallel encode, driver
    splice in start-position order. Returns bytes written."""
    from osm_pbf_convert_spark.sources import fsio

    segments = blob_index_segments(df, num_chunks)
    total = 0
    with fsio.open_output(out_path) as out:
        for row in segments.orderBy("first_pos").toLocalIterator():
            blob = bytes(row["blob"])
            out.write(blob)
            total += len(blob)
    return total


def read_blobs_dat(
    spark: SparkSession, path: str, split_records: int = 1_000_000
) -> DataFrame:
    """Distributed ``.blobs.dat`` reader: 36-byte-aligned byte-range
    splits, one vectorized ``frombuffer`` decode per task."""
    import pandas as pd

    from osm_pbf_convert_spark.sources import fsio

    size = fsio.file_size(path)
    if size % RECORD_BYTES:
        raise ValueError(
            f"{path}: {size} bytes is not a multiple of {RECORD_BYTES}"
        )
    n_rec = size // RECORD_BYTES
    bounds = [
        (path, i * split_records * RECORD_BYTES,
         min((i + 1) * split_records, n_rec) * RECORD_BYTES)
        for i in range(max(1, -(-n_rec // split_records)))
    ]
    sdf = spark.createDataFrame(bounds, schema="path string, start long, end long")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                if e <= s:
                    continue
                with fsio.open_seekable(p) as f:
                    f.seek(int(s))
                    raw = f.read(int(e) - int(s))
                rec = np.frombuffer(raw, dtype=_DTYPE)
                yield pd.DataFrame({c: rec[c] for c in COLUMNS})

    return sdf.repartitionByRange(len(bounds), "path", "start").mapInPandas(
        scan, schema=SCHEMA
    )
