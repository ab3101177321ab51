"""Distributed READERS for the reference's byte formats -- the interop
direction the sinks don't cover: a user with reference-produced files
(``NodesIndex.cs`` / ``WaysDataFile.cs`` artifacts) loads them straight
into DataFrames, parallelized by the formats' OWN index structures.

- ``read_nodes_index``: the ``.idx`` sparse index marks, per 4 KB block,
  the byte offset of the first record that starts in it -- exactly where
  the writer reset its delta chains (``NodesIndex.cs:113-133``). Those
  sync points make every block range independently decodable, so each
  becomes one task: vectorized varint decode + cumsum, no sequential
  scan of the whole file.
- ``read_ways_file``: the info file stores every way's ABSOLUTE id and
  data offset, so any run of ways is a self-contained split (the first
  record's id delta is re-seeded from the info id).

Byte ranges are fetched per task with plain ``open`` -- local/NFS paths
(the formats are single-node artifacts; object-store reads would go
through fsspec). Roundtrip-tested against the engine's own sinks and the
pure-Python writer ports.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from osm_pbf_convert_spark.codecs import decode_varints_msb, zigzag_decode

BLOCK_SIZE = 4096


def _parse_nodes_idx(idx: bytes, block_size: int = BLOCK_SIZE):
    """(record_start_abs, first_id) per indexed block (``LoadIndex``)."""
    starts, ids = [], []
    pos = 0
    last_id = 0
    block = 0
    n = len(idx)
    while pos < n:
        offset = idx[pos]
        pos += 1
        if offset == 255:
            break
        v = 0
        while True:
            b = idx[pos]
            pos += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        last_id += v
        block += 1
        starts.append(block * block_size + offset)
        ids.append(last_id)
    return starts, ids


def read_nodes_index(
    spark: SparkSession, prefix: str, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """``{prefix}.nodes.dat`` + ``{prefix}.idx`` -> DataFrame(id, ilat,
    ilon). One task per index sync range; each range decodes with fresh
    delta state, exactly mirroring the writer's block resets."""
    import os

    dat_path = f"{prefix}.nodes.dat"
    with open(f"{prefix}.idx", "rb") as f:
        starts, _ = _parse_nodes_idx(f.read(), block_size)
    size = os.path.getsize(dat_path)
    bounds = [0] + [s for s in starts if s < size] + [size]
    ranges = [
        (bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]
    rdf = spark.createDataFrame(ranges, schema="start long, end long")

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for start, end in zip(pdf["start"], pdf["end"]):
                with open(dat_path, "rb") as f:
                    f.seek(int(start))
                    buf = f.read(int(end) - int(start))
                vals = decode_varints_msb(buf)
                if vals.size % 3:
                    raise ValueError("corrupt nodes.dat range (non-triplet varints)")
                trip = vals.reshape(-1, 3)
                ids = np.cumsum(trip[:, 0].astype(np.int64))
                lats = np.cumsum(zigzag_decode(trip[:, 1]))
                lons = np.cumsum(zigzag_decode(trip[:, 2]))
                yield pd.DataFrame({"id": ids, "ilat": lats, "ilon": lons})

    return rdf.repartition(len(ranges), "start").mapInPandas(
        decode, schema="id long, ilat long, ilon long"
    )


def _parse_ways_info(info: bytes):
    """(id, data_offset) per way from the info file (``FindWayInfo``
    layout: varint id, varint offset, 8 fixed bytes, 4 zigzag varints)."""
    ids, offs = [], []
    pos = 0
    n = len(info)

    def varint(p):
        v = 0
        while True:
            b = info[p]
            p += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v, p

    while pos < n:
        wid, pos = varint(pos)
        off, pos = varint(pos)
        pos += 8
        for _ in range(4):
            _, pos = varint(pos)
        ids.append(wid)
        offs.append(off)
    return ids, offs


def read_ways_file(
    spark: SparkSession, path: str, ways_per_split: int = 4096
) -> DataFrame:
    """``path`` + ``path + '.idx'`` -> DataFrame(id, nodes array<struct<
    id,ilat,ilon>>). The info file supplies absolute (id, offset) per
    way, so splits are arbitrary runs of ways: each task decodes its
    byte range and re-seeds the id chain from the split's first info
    id."""
    import os

    with open(path + ".idx", "rb") as f:
        ids, offs = _parse_ways_info(f.read())
    size = os.path.getsize(path)
    splits = []
    for i in range(0, len(ids), ways_per_split):
        j = min(i + ways_per_split, len(ids))
        end = offs[j] if j < len(ids) else size
        splits.append((offs[i], end, ids[i], j - i))
    rdf = spark.createDataFrame(
        splits, schema="start long, end long, first_id long, n_ways long"
    )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_nodes = [], []
            for start, end, first_id, n_ways in zip(
                pdf["start"], pdf["end"], pdf["first_id"], pdf["n_ways"]
            ):
                with open(path, "rb") as f:
                    f.seek(int(start))
                    buf = f.read(int(end) - int(start))
                vals = decode_varints_msb(buf)
                pos = 0
                last_id = None
                for _ in range(int(n_ways)):
                    did = int(vals[pos])
                    cnt = int(vals[pos + 1])
                    pos += 2
                    wid = int(first_id) if last_id is None else last_id + did
                    last_id = wid
                    trip = vals[pos : pos + 3 * cnt].reshape(-1, 3)
                    pos += 3 * cnt
                    nid = np.cumsum(zigzag_decode(trip[:, 0]))
                    nla = np.cumsum(zigzag_decode(trip[:, 1]))
                    nlo = np.cumsum(zigzag_decode(trip[:, 2]))
                    out_ids.append(wid)
                    out_nodes.append(
                        [
                            {"id": int(a), "ilat": int(b), "ilon": int(c)}
                            for a, b, c in zip(nid, nla, nlo)
                        ]
                    )
                if pos != vals.size:
                    raise ValueError("corrupt ways range (trailing varints)")
            yield pd.DataFrame({"id": out_ids, "nodes": out_nodes})

    return rdf.repartition(len(splits), "start").mapInPandas(
        decode, schema="id long, nodes array<struct<id:long,ilat:long,ilon:long>>"
    )
