"""Spatial block file sink: the reference's per-tile block format
(``SpatialBlock.cs:97-213``) -- the last of its five byte formats.

One file per spatial block, three ordered sections (the writer enforces
nodes -> ways -> rels; a single 0 byte separates sections, which the
readers consume as a zero id-delta terminator):

- node: ``zz(dId)`` (chain), ``zz(dLat)``, ``zz(dLon)`` (own chains),
  tags.
- way:  ``zz(dId)`` (chain), ``varint(type)``, ``varint(n)``, per node
  ``zz(dNodeId), zz(dLat), zz(dLon)`` (chains RESET per way), tags.
- rel:  ``zz(dId)`` (chain), ``varint(position)``, ``varint(relType)``,
  ``varint(roleId)``, ``zz(dMidLat)``, ``zz(dMidLon)`` -- both mid
  values go through the SAME delta chain (``SpatialBlock.cs:130-131``
  uses relLatWriter for lat AND lon; the lon delta is relative to the
  lat value -- reproduced for byte parity), ``varint(itemType)``,
  ``varint(itemId)``, tags.
- tags (``WriteTags``): ``varint(count)`` then per tag a marker byte:
  1 = ``varint(tagId)`` (full-tag dictionary hit), 2 = ``varint(keyId)``
  + .NET string value (key dictionary hit), 3 = .NET string key + .NET
  string value (no dictionary hit) -- the same three levels as
  ``operators/tags.TagDictionary``. .NET strings are LSB-7bit-length
  prefixed UTF-8 (``BinaryWriter.Write(string)``).

Every block file's delta chains are SELF-CONTAINED (they reset per
file), so unlike the node/ways/relations stores there is no cross-chunk
seam at all: each tile's file encodes independently on an executor
(groupBy(tile).applyInPandas), the natural Spark shape. The engine's
query-path spatial store remains the tile-partitioned Parquet table
(``plans/partitioning.py:write_spatial_table``); this sink is the
byte-parity bridge completing 5/5 reference formats.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from osm_pbf_convert_spark.codecs import encode_varints_msb

_U64 = 0xFFFFFFFFFFFFFFFF


def _zz1(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _U64


def _vint(out: bytearray, v: int) -> None:
    out += encode_varints_msb([v])


def _dotnet_string(s: str) -> bytes:
    b = s.encode("utf-8")
    n = len(b)
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            break
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes(out) + b


def _write_tags(out: bytearray, tags) -> None:
    """``SpatialBlock.WriteTags``: count + 3-level marker records."""
    tags = tags or []
    _vint(out, len(tags))
    for t in tags:
        tag_id = t.get("tag_id")
        key_id = t.get("key_id")
        key = t.get("key")
        value = t.get("value")
        if tag_id is not None:
            out.append(1)
            _vint(out, int(tag_id))
        elif key_id is not None and value is not None:
            out.append(2)
            _vint(out, int(key_id))
            out += _dotnet_string(value)
        elif key and value is not None:
            out.append(3)
            out += _dotnet_string(key)
            out += _dotnet_string(value)
        else:
            raise ValueError(f"invalid tag record {t!r}")


def encode_spatial_block_py(nodes=(), ways=(), rels=()) -> bytes:
    """Pure-Python reference writer port (golden) for ONE block file.

    nodes: (id, lat, lon, tags); ways: (id, type, node_list[(nid, lat,
    lon)], tags); rels: (id, position, rel_type, role_id, mid_lat,
    mid_lon, item_type, item_id, tags). tags = list of dicts with
    tag_id / key_id / key / value (exactly one of the 3 marker forms).
    """
    out = bytearray()
    lid = lla = llo = 0
    for nid, lat, lon, tags in nodes:
        _vint(out, _zz1(int(nid) - lid))
        _vint(out, _zz1(int(lat) - lla))
        _vint(out, _zz1(int(lon) - llo))
        lid, lla, llo = int(nid), int(lat), int(lon)
        _write_tags(out, tags)
    wid = 0
    first = True
    for w_id, wtype, wnodes, tags in ways:
        if first:
            out.append(0)
            first = False
        _vint(out, _zz1(int(w_id) - wid))
        wid = int(w_id)
        _vint(out, int(wtype))
        _vint(out, len(wnodes))
        ln = la = lo = 0
        for nid, lat, lon in wnodes:
            _vint(out, _zz1(int(nid) - ln))
            _vint(out, _zz1(int(lat) - la))
            _vint(out, _zz1(int(lon) - lo))
            ln, la, lo = int(nid), int(lat), int(lon)
        _write_tags(out, tags)
    rid = 0
    rmid = 0  # the shared lat/lon chain (reference quirk)
    first = True
    for r_id, position, rel_type, role_id, mid_lat, mid_lon, item_type, item_id, tags in rels:
        if first:
            out.append(0)
            first = False
        _vint(out, _zz1(int(r_id) - rid))
        rid = int(r_id)
        _vint(out, int(position))
        _vint(out, int(rel_type))
        _vint(out, int(role_id))
        _vint(out, _zz1(int(mid_lat) - rmid))
        rmid = int(mid_lat)
        _vint(out, _zz1(int(mid_lon) - rmid))
        rmid = int(mid_lon)
        _vint(out, int(item_type))
        _vint(out, int(item_id))
        _write_tags(out, tags)
    return bytes(out)


TAGS_SCHEMA = "array<struct<tag_id:int,key_id:int,key:string,value:string>>"


def spatial_block_blobs(
    nodes: DataFrame | None = None,
    ways: DataFrame | None = None,
    rels: DataFrame | None = None,
    z: int = 6,
) -> DataFrame:
    """Distributed per-tile block encode: entities are assigned their
    zoom-z tile (nodes by coords, ways/rels by mid), co-grouped by tile,
    and each tile's file is encoded WHOLE on an executor -- the block
    format's chains reset per file, so tiles are embarrassingly parallel.
    Returns (tile, n_bytes, data binary).

    Input schemas (nullable extras ignored):
    nodes(id, ilat, ilon, tags TAGS_SCHEMA?),
    ways(id, way_type, nodes array<struct<id,ilat,ilon>>, mid_ilat,
         mid_ilon, tags?),
    rels(id, position, rel_type, role_id, mid_ilat, mid_ilon,
         item_type, item_id, tags?).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from osm_pbf_convert_spark.functions.cells import morton_cell_col, tile_col

    def _tile(lat, lon):
        return tile_col(morton_cell_col(lat.cast("int"), lon.cast("int")), z)

    null_long = F.lit(None).cast("long")
    null_nodes = F.lit(None).cast("array<struct<id:long,ilat:long,ilon:long>>")

    def tags_col(src):
        return (F.col("tags") if "tags" in src.columns else F.lit(None)).cast(
            TAGS_SCHEMA
        ).alias("tags")

    frames = []
    if nodes is not None:
        frames.append(
            nodes.select(
                F.lit(0).alias("kind"),
                F.col("id").cast("long"),
                _tile(F.col("ilat"), F.col("ilon")).alias("tile"),
                F.col("ilat").cast("long").alias("v1"),
                F.col("ilon").cast("long").alias("v2"),
                null_long.alias("v3"), null_long.alias("v4"),
                null_long.alias("v5"), null_long.alias("v6"),
                null_long.alias("item_type"),
                null_nodes.alias("wnodes"),
                tags_col(nodes),
            )
        )
    if ways is not None:
        frames.append(
            ways.select(
                F.lit(1).alias("kind"),
                F.col("id").cast("long"),
                _tile(F.col("mid_ilat"), F.col("mid_ilon")).alias("tile"),
                F.col("way_type").cast("long").alias("v1"),
                null_long.alias("v2"), null_long.alias("v3"),
                null_long.alias("v4"), null_long.alias("v5"), null_long.alias("v6"),
                null_long.alias("item_type"),
                F.col("nodes").cast("array<struct<id:long,ilat:long,ilon:long>>").alias("wnodes"),
                tags_col(ways),
            )
        )
    if rels is not None:
        frames.append(
            rels.select(
                F.lit(2).alias("kind"),
                F.col("id").cast("long"),
                _tile(F.col("mid_ilat"), F.col("mid_ilon")).alias("tile"),
                F.col("position").cast("long").alias("v1"),
                F.col("rel_type").cast("long").alias("v2"),
                F.col("role_id").cast("long").alias("v3"),
                F.col("mid_ilat").cast("long").alias("v4"),
                F.col("mid_ilon").cast("long").alias("v5"),
                F.col("item_id").cast("long").alias("v6"),
                F.col("item_type").cast("long").alias("item_type"),
                null_nodes.alias("wnodes"),
                tags_col(rels),
            )
        )
    if not frames:
        raise ValueError("at least one of nodes/ways/rels required")
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        pdf = pdf.sort_values(["kind", "id"])
        nds, wys, rls = [], [], []
        for row in pdf.itertuples(index=False):
            # Arrow hands arrays/None, not lists -- explicit None checks
            raw_tags = row.tags if row.tags is not None else []
            tags = [
                {k: t[k] for k in ("tag_id", "key_id", "key", "value")}
                for t in raw_tags
            ]
            if row.kind == 0:
                nds.append((row.id, row.v1, row.v2, tags))
            elif row.kind == 1:
                wn = row.wnodes if row.wnodes is not None else []
                wys.append(
                    (row.id, row.v1,
                     [(nd["id"], nd["ilat"], nd["ilon"]) for nd in wn],
                     tags)
                )
            else:
                rls.append(
                    (row.id, row.v1, row.v2, row.v3, row.v4, row.v5,
                     row.item_type, row.v6, tags)
                )
        data = encode_spatial_block_py(nds, wys, rls)
        return pd.DataFrame({"tile": [tile], "n_bytes": [len(data)], "data": [data]})

    return df.groupBy("tile").applyInPandas(
        encode, schema="tile long, n_bytes long, data binary"
    )


def write_spatial_blocks(
    out_dir: str,
    nodes: DataFrame | None = None,
    ways: DataFrame | None = None,
    rels: DataFrame | None = None,
    z: int = 6,
) -> int:
    """Write one reference-format block file per zoom-z tile under
    ``out_dir`` (named ``block_<tile>.dat`` -- the reference names blocks
    by its split tree; tile ids are the stable analog). Returns the block
    count. Files stream through the Hadoop FileSystem API."""
    df = spatial_block_blobs(nodes, ways, rels, z)
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    count = 0
    for row in df.toLocalIterator():
        path = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/block_{row['tile']}.dat")
        out = path.getFileSystem(hconf).create(path, True)
        try:
            out.write(bytearray(row["data"]))
        finally:
            out.close()
        count += 1
    return count


def decode_spatial_block_py(blob: bytes):
    """Sequential reader port (mirrors ``ReadAllNodes/Ways/Rels``) for
    roundtrip tests and the distributed directory reader: returns
    ``(nodes, ways, rels)`` in the writer's tuple shapes, with tags as
    the 3-form dicts."""
    pos, n = 0, len(blob)

    def varint():
        nonlocal pos
        v = 0
        while True:
            b = blob[pos]
            pos += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v

    def unzz(v: int) -> int:
        return (v >> 1) ^ -(v & 1)

    def read_string() -> str:
        nonlocal pos
        ln = 0
        shift = 0
        while True:  # .NET LSB-first 7-bit length
            b = blob[pos]
            pos += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        s = blob[pos : pos + ln].decode("utf-8")
        pos += ln
        return s

    def read_tags():
        cnt = varint()
        tags = []
        for _ in range(cnt):
            marker = blob[pos_ref()]
            advance()
            if marker == 1:
                tags.append({"tag_id": varint(), "key_id": None, "key": None, "value": None})
            elif marker == 2:
                kid = varint()
                tags.append({"tag_id": None, "key_id": kid, "key": None, "value": read_string()})
            elif marker == 3:
                k = read_string()
                tags.append({"tag_id": None, "key_id": None, "key": k, "value": read_string()})
            else:
                raise ValueError(f"bad tag marker {marker}")
        return tags

    def pos_ref():
        return pos

    def advance():
        nonlocal pos
        pos += 1

    nodes, ways, rels = [], [], []
    # nodes section: terminated by a zero id-delta byte (the separator)
    lid = lla = llo = 0
    while pos < n:
        v = varint()
        if v == 0:
            break
        lid += unzz(v)
        lla += unzz(varint())
        llo += unzz(varint())
        nodes.append((lid, lla, llo, read_tags()))
    # ways section
    wid = 0
    while pos < n:
        v = varint()
        if v == 0:
            break
        wid += unzz(v)
        wtype = varint()
        cnt = varint()
        ln = la = lo = 0
        wnodes = []
        for _ in range(cnt):
            ln += unzz(varint())
            la += unzz(varint())
            lo += unzz(varint())
            wnodes.append((ln, la, lo))
        ways.append((wid, wtype, wnodes, read_tags()))
    # rels section (shared mid chain quirk mirrored)
    rid = 0
    rmid = 0
    while pos < n:
        rid += unzz(varint())
        position = varint()
        rel_type = varint()
        role_id = varint()
        rmid += unzz(varint())
        mid_lat = rmid
        rmid += unzz(varint())
        mid_lon = rmid
        item_type = varint()
        item_id = varint()
        rels.append((rid, position, rel_type, role_id, mid_lat, mid_lon,
                     item_type, item_id, read_tags()))
    return nodes, ways, rels


def read_spatial_blocks(spark, block_dir: str) -> DataFrame:
    """Distributed reader over a directory of reference block files: one
    task per block (tiles are independent by construction). Returns the
    unified entity frame (kind 0/1/2 with the writer's column roles)."""
    import glob as _glob
    import os
    import re as _re

    import pandas as pd

    files = sorted(_glob.glob(os.path.join(block_dir, "block_*.dat")))
    if not files:
        raise FileNotFoundError(f"no block_*.dat under {block_dir}")
    fdf = spark.createDataFrame(
        [(int(_re.search(r"block_(-?\d+)\.dat$", f).group(1)), f) for f in files],
        schema="tile long, path string",
    )

    def decode(batches):
        for pdf in batches:
            for tile, path in zip(pdf["tile"], pdf["path"]):
                with open(path, "rb") as f:
                    nds, wys, rls = decode_spatial_block_py(f.read())
                rows = []
                for i, la, lo, tags in nds:
                    rows.append((int(tile), 0, i, la, lo, None, None, None, None, None, None, None, tags))
                for i, ty, wn, tags in wys:
                    rows.append((int(tile), 1, i, ty, None, None, None, None, None,
                                 [{"id": a, "ilat": b, "ilon": c} for a, b, c in wn], None, None, tags))
                for i, p_, rt, ro, mla, mlo, it, ii, tags in rls:
                    rows.append((int(tile), 2, i, p_, rt, ro, mla, mlo, ii, None, it, None, tags))
                yield pd.DataFrame(
                    rows,
                    columns=["tile", "kind", "id", "v1", "v2", "v3", "v4", "v5",
                             "v6", "wnodes", "item_type", "pad", "tags"],
                ).drop(columns=["pad"])

    schema = (
        "tile long, kind int, id long, v1 long, v2 long, v3 long, v4 long, "
        "v5 long, v6 long, wnodes array<struct<id:long,ilat:long,ilon:long>>, "
        "item_type long, tags " + TAGS_SCHEMA
    )
    return fdf.repartition(len(files), "tile").mapInPandas(decode, schema=schema)
