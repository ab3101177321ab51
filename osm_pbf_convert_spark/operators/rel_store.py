"""Relations file sink: the reference's ``.rels`` + ``.rels.strs`` byte
formats (``RelationsProcessor.cs:46-147, 173-262``).

Per relation, ascending id (``RelationsFile.Add``; all varints MSB-first
7-bit, ``StorageHelpers.Write7BitEncodedInt``):

``varint(id - lastId)`` (increment chain across relations),
``varint(typeId)`` (always 0 -- the reference's type detection is a
ToDo, ``RelationsProcessor.cs:257``), the bounding rect
(``BoundingRect.WriteTo``: ``zz(minLat), zz(minLon),
varint(maxLat-minLat), varint(maxLon-minLon)`` -- the EMPTY rect is
int.MaxValue/int.MinValue and its negative size wraps through ulong),
``varint(n_members)``, then per member ``byte(type)`` (0 node / 1 way /
2 relation -- values < 128, so the raw byte equals its varint),
``zz(dMemberId)`` (chain reset per relation), ``varint(roleId)``,
``zz(dMidLat)``, ``zz(dMidLon)`` (each its own per-relation chain).

Mid semantics (``RelationsProcessor.ProcessPrimitives``): found node ->
its coords (extends rect); missing node -> int.MinValue; way members ->
int.MinValue ALWAYS (a found way extends the rect but still stores the
sentinel); relation members -> 0 (deferred recursion). This is exactly
``joins.assemble_relations``'s null/0 convention, so the sink consumes
its output directly.

``.rels.strs``: role dictionary in FIRST-APPEARANCE order (sequential
``GetRoleId``), one record per role: ``varint(id)`` then the .NET
length-prefixed string (LSB-first 7-bit length + UTF-8 bytes --
``BinaryWriter.Write(string)``, NOT the project's MSB varint).

Like the ways file there are no block resets: executors encode whole
records as flat varint sequences via mapInPandas (first-appearance role
ids are resolved by a tiny distributed pre-pass and broadcast); the
driver patches one id-delta varint per partition seam and streams the
file through the Hadoop FileSystem API.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame

from osm_pbf_convert_spark.codecs import encode_varints_msb, encode_varints_msb_np

INT_MIN = -(2**31)
INT_MAX = 2**31 - 1
_U64 = 0xFFFFFFFFFFFFFFFF


def _zz1(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _U64


def _dotnet_string(s: str) -> bytes:
    """BinaryWriter.Write(string): LSB-first 7-bit length + UTF-8."""
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


def encode_strings_file_py(roles_in_order) -> bytes:
    """``RelationsFile.WriteStrings``: varint(id) + .NET string, ordered
    by id (= first-appearance order)."""
    out = bytearray()
    for i, role in enumerate(roles_in_order):
        out += encode_varints_msb([i])
        out += _dotnet_string(role)
    return bytes(out)


def encode_rels_file_py(rels):
    """Pure-Python reference writer port (golden): ``rels`` is an
    ascending-id iterable of ``(rel_id, rect, members)`` with ``rect`` =
    (min_lat, min_lon, max_lat, max_lon) or None (empty), ``members`` =
    list of (type, member_id, role, mid_lat, mid_lon). Returns
    ``(rels_bytes, strings_bytes, roles_in_order)``."""
    dat = bytearray()
    role_ids: dict[str, int] = {}
    last_id = 0
    for rel_id, rect, members in rels:
        rel_id = int(rel_id)
        if rel_id < last_id:
            raise ValueError("relation ids must be ascending")
        if rect is None:
            min_lat, min_lon, max_lat, max_lon = INT_MAX, INT_MAX, INT_MIN, INT_MIN
        else:
            min_lat, min_lon, max_lat, max_lon = (int(v) for v in rect)
        vals = [
            rel_id - last_id, 0,
            _zz1(min_lat), _zz1(min_lon),
            (max_lat - min_lat) & _U64, (max_lon - min_lon) & _U64,
            len(members),
        ]
        last_id = rel_id
        lm = lla = llo = 0
        for mtype, mid, role, mid_lat, mid_lon in members:
            role = role or ""
            if role not in role_ids:
                role_ids[role] = len(role_ids)
            vals += [
                int(mtype), _zz1(int(mid) - lm), role_ids[role],
                _zz1(int(mid_lat) - lla), _zz1(int(mid_lon) - llo),
            ]
            lm, lla, llo = int(mid), int(mid_lat), int(mid_lon)
        dat += encode_varints_msb(vals)
    roles = [r for r, _ in sorted(role_ids.items(), key=lambda kv: kv[1])]
    return bytes(dat), encode_strings_file_py(roles), roles


def decode_rels_file_py(dat: bytes):
    """Sequential reader port for roundtrip tests: returns
    [(rel_id, (min_lat, min_lon, max_lat, max_lon), members)] with
    members = [(type, member_id, role_id, mid_lat, mid_lon)]."""
    from osm_pbf_convert_spark.codecs import zigzag_decode

    pos, n = 0, len(dat)

    def varint():
        nonlocal pos
        v = 0
        while True:
            b = dat[pos]
            pos += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v

    def zz():
        return int(zigzag_decode(np.array([varint()], dtype=np.uint64))[0])

    def signed(v):  # ulong-wrapped size back to int64
        return v - (1 << 64) if v >= 1 << 63 else v

    out = []
    last_id = 0
    while pos < n:
        last_id += varint()
        type_id = varint()
        assert type_id == 0
        min_lat, min_lon = zz(), zz()
        max_lat = min_lat + signed(varint())
        max_lon = min_lon + signed(varint())
        cnt = varint()
        lm = lla = llo = 0
        members = []
        for _ in range(cnt):
            mtype = varint()
            lm += zz()
            rid = varint()
            lla += zz()
            llo += zz()
            members.append((mtype, lm, rid, lla, llo))
        out.append((last_id, (min_lat, min_lon, max_lat, max_lon), members))
    return out


def role_dictionary(assembled: DataFrame) -> list:
    """Distributed first-appearance role dictionary: roles ordered by
    their first (rel_id, member position) in the serial stream -- exactly
    the order the reference's sequential GetRoleId assigns."""
    from pyspark.sql import functions as F

    first = (
        assembled.select(
            F.col("rel_id"), F.posexplode("members").alias("pos", "m")
        )
        .select(F.coalesce(F.col("m.role"), F.lit("")).alias("role"), "rel_id", "pos")
        .groupBy("role")
        .agg(F.min(F.struct("rel_id", "pos")).alias("first"))
        .orderBy("first")
        .select("role")
        .collect()
    )
    return [r["role"] for r in first]


def rel_segments(assembled: DataFrame, roles: list, num_chunks: int | None = None) -> DataFrame:
    """Distributed encode: one pre-encoded blob row per Arrow batch; the
    first relation of each partition has its id delta encoded vs 0
    (``fresh``), patched by the driver."""
    from pyspark.sql import functions as F
    import pandas as pd

    spark = assembled.sparkSession
    n = num_chunks or spark.sparkContext.defaultParallelism
    role_map = {r: i for i, r in enumerate(roles)}
    df = (
        assembled.select(
            F.col("rel_id").cast("long"), "members",
            F.col("min_ilat").cast("long"), F.col("min_ilon").cast("long"),
            F.col("max_ilat").cast("long"), F.col("max_ilon").cast("long"),
        )
        .repartitionByRange(n, "rel_id")
        .sortWithinPartitions("rel_id")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prev_id = 0
        fresh = True
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["rel_id"].to_numpy(np.int64)
            vals: list = []
            last = prev_id
            for rid, members, mnlat, mnlon, mxlat, mxlon in zip(
                pdf["rel_id"], pdf["members"], pdf["min_ilat"], pdf["min_ilon"],
                pdf["max_ilat"], pdf["max_ilon"],
            ):
                rid = int(rid)
                min_lat = INT_MAX if mnlat is None or np.isnan(mnlat) else int(mnlat)
                min_lon = INT_MAX if mnlon is None or np.isnan(mnlon) else int(mnlon)
                max_lat = INT_MIN if mxlat is None or np.isnan(mxlat) else int(mxlat)
                max_lon = INT_MIN if mxlon is None or np.isnan(mxlon) else int(mxlon)
                vals += [
                    rid - last, 0, _zz1(min_lat), _zz1(min_lon),
                    (max_lat - min_lat) & _U64, (max_lon - min_lon) & _U64,
                    len(members),
                ]
                last = rid
                lm = lla = llo = 0
                for m in members:
                    mtype = int(m["member_type"])
                    mid = int(m["ref"])
                    mid_lat = m["mid_ilat"]
                    mid_lon = m["mid_ilon"]
                    mid_lat = INT_MIN if mid_lat is None else int(mid_lat)
                    mid_lon = INT_MIN if mid_lon is None else int(mid_lon)
                    vals += [
                        mtype, _zz1(mid - lm), role_map[m["role"] or ""],
                        _zz1(mid_lat - lla), _zz1(mid_lon - llo),
                    ]
                    lm, lla, llo = mid, mid_lat, mid_lon
            blob = encode_varints_msb_np(np.array(vals, dtype=np.uint64))
            yield pd.DataFrame({"ids": [ids], "blob": [blob], "fresh": [fresh]})
            prev_id = int(ids[-1])
            fresh = False

    return df.mapInPandas(encode, schema="ids array<long>, blob binary, fresh boolean")


def write_rels_file(
    assembled: DataFrame, out_file: str, num_chunks: int | None = None
) -> tuple[int, int]:
    """Assemble ``out_file`` (+ ``out_file + '.strs'``) byte-identical to
    the reference writer (golden-tested vs ``encode_rels_file_py``).
    Returns (rels_bytes, strings_bytes)."""
    spark = assembled.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _create(path_str):
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(hconf).create(path, True)

    roles = role_dictionary(assembled)
    dat_out = _create(out_file)
    total = 0
    prev_id = 0
    seen = False
    try:
        for row in rel_segments(assembled, roles, num_chunks).toLocalIterator():
            ids = np.asarray(row["ids"], dtype=np.int64)
            blob = bytes(row["blob"])
            if seen and ids[0] <= prev_id:
                raise ValueError("relation ids must be globally unique ascending")
            seen = True
            if row["fresh"]:
                old = encode_varints_msb([int(ids[0])])
                new = encode_varints_msb([int(ids[0]) - prev_id])
                blob = new + blob[len(old):]
            dat_out.write(bytearray(blob))
            total += len(blob)
            prev_id = int(ids[-1])
    finally:
        dat_out.close()
    strs = encode_strings_file_py(roles)
    strs_out = _create(out_file + ".strs")
    try:
        strs_out.write(bytearray(strs))
    finally:
        strs_out.close()
    return total, len(strs)
