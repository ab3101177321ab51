"""Test-side PBF-style payload *encoder*.

Synthesizes byte-exact framed blob payloads by inverting the reference's
decode semantics (``OsmReader/PbfPrimitiveReader.cs`` field numbers,
``OsmReader/PrimitiveDecoder.cs`` delta/granularity math,
``OSM-pbf-convert/PbfBlobParser.cs:27-42`` framing). Used only by tests,
fixtures, and the deterministic pages-table synthesizer -- the engine itself
never encodes PBF.

Field numbers (from the reference reader's switch statements):

- BlobHeader: 1=type (string), 3=datasize (varint)
- Blob: 1=raw (bytes), 2=raw_size (varint), 3=zlib_data (bytes)
- PrimitiveBlock: 1=stringtable, 2=primitivegroup, 17=granularity,
  18=date_granularity, 19=lat_offset, 20=lon_offset
- StringTable: 1=repeated bytes
- PrimitiveGroup: 1=plain node (unsupported by reference decode), 2=dense,
  3=way, 4=relation
- DenseNodes: 1=ids (packed sint64), 8=lats (packed sint64),
  9=lons (packed sint64), 10=keys_vals (packed int64)
- Way: 1=id (varint), 2=keys (packed), 3=values (packed),
  8=refs (packed sint64)
- Relation: 1=id, 2=keys, 3=values, 8=roles (packed), 9=member_ids
  (packed sint64), 10=member_types (packed)

Framing: ``[4-byte big-endian length][BlobHeader][Blob]`` repeated.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

from osm_pbf_convert_spark.codecs import delta_encode, encode_varints, zigzag_encode


def _varint(v: int) -> bytes:
    return encode_varints([v])


def _key(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def field_varint(field_no: int, value: int) -> bytes:
    return _key(field_no, 0) + _varint(value)


def field_bytes(field_no: int, payload: bytes) -> bytes:
    return _key(field_no, 2) + _varint(len(payload)) + payload


def field_packed(field_no: int, values) -> bytes:
    return field_bytes(field_no, encode_varints(values))


def field_packed_sint(field_no: int, values) -> bytes:
    zz = zigzag_encode(np.asarray(list(values), dtype=np.int64))
    return field_bytes(field_no, encode_varints(zz.tolist()))


@dataclass
class DenseNodesSpec:
    ids: list
    lats_raw: list  # raw (pre-granularity) integer coordinate units
    lons_raw: list
    tags: list = field(default_factory=list)  # list[dict[str,str]] per node


@dataclass
class WaySpec:
    id: int
    refs: list
    tags: dict = field(default_factory=dict)


@dataclass
class RelationSpec:
    id: int
    members: list = field(default_factory=list)  # [(member_type, ref, role)]
    tags: dict = field(default_factory=dict)


class StringTable:
    """Index 0 is always the empty string (OSM convention the reference's
    0-terminated dense tag runs rely on)."""

    def __init__(self):
        self.strings = [""]
        self.index = {"": 0}

    def add(self, s: str) -> int:
        if s not in self.index:
            self.index[s] = len(self.strings)
            self.strings.append(s)
        return self.index[s]

    def encode(self) -> bytes:
        return b"".join(field_bytes(1, s.encode("utf-8")) for s in self.strings)


def encode_primitive_block(
    dense: DenseNodesSpec | None = None,
    ways: list[WaySpec] | None = None,
    relations: list[RelationSpec] | None = None,
    granularity: int = 100,
    lat_offset: int = 0,
    lon_offset: int = 0,
    date_granularity: int = 1000,
) -> bytes:
    st = StringTable()
    groups = []

    if dense is not None:
        ids = delta_encode(np.asarray(dense.ids, dtype=np.int64))
        lats = delta_encode(np.asarray(dense.lats_raw, dtype=np.int64))
        lons = delta_encode(np.asarray(dense.lons_raw, dtype=np.int64))
        kv: list[int] = []
        tag_lists = dense.tags or [{} for _ in dense.ids]
        for node_tags in tag_lists:
            for k, v in node_tags.items():
                kv.append(st.add(k))
                kv.append(st.add(v))
            kv.append(0)
        body = (
            field_packed_sint(1, ids.tolist())
            + field_packed_sint(8, lats.tolist())
            + field_packed_sint(9, lons.tolist())
            + field_packed(10, kv)
        )
        groups.append(field_bytes(2, body))

    if ways:
        body = b""
        for w in ways:
            keys = [st.add(k) for k in w.tags]
            vals = [st.add(v) for v in w.tags.values()]
            refs = delta_encode(np.asarray(w.refs, dtype=np.int64))
            wbody = (
                field_varint(1, w.id)
                + field_packed(2, keys)
                + field_packed(3, vals)
                + field_packed_sint(8, refs.tolist())
            )
            body += field_bytes(3, wbody)
        groups.append(body)

    if relations:
        body = b""
        for r in relations:
            keys = [st.add(k) for k in r.tags]
            vals = [st.add(v) for v in r.tags.values()]
            roles = [st.add(role) for (_, _, role) in r.members]
            mids = delta_encode(np.asarray([m[1] for m in r.members], dtype=np.int64))
            mtypes = [int(m[0]) for m in r.members]
            rbody = (
                field_varint(1, r.id)
                + field_packed(2, keys)
                + field_packed(3, vals)
                + field_packed(8, roles)
                + field_packed_sint(9, mids.tolist())
                + field_packed(10, mtypes)
            )
            body += field_bytes(4, rbody)
        groups.append(body)

    block = field_bytes(1, st.encode())
    for g in groups:
        block += field_bytes(2, g)
    block += field_varint(17, granularity)
    block += field_varint(18, date_granularity)
    block += field_varint(19, lat_offset)
    block += field_varint(20, lon_offset)
    return block


def frame_blob(block: bytes, blob_type: str = "OSMData", compress: bool = False) -> bytes:
    """One framed blob: [4B BE header-len][BlobHeader][Blob]."""
    if compress:
        blob_msg = field_bytes(3, zlib.compress(block)) + field_varint(2, len(block))
    else:
        blob_msg = field_bytes(1, block) + field_varint(2, len(block))
    header = field_bytes(1, blob_type.encode("utf-8")) + field_varint(3, len(blob_msg))
    return struct.pack(">I", len(header)) + header + blob_msg


def build_payload(frames: list[bytes]) -> bytes:
    return b"".join(frames)


def coords_to_raw(deg_values, granularity: int, offset: int) -> list[int]:
    """Inverse of ``coord = 1e-9 * (offset + granularity * raw)``: pick raw
    ints whose decode reproduces the intended degree values exactly in
    float64."""
    return [round((d * 1e9 - offset) / granularity) for d in deg_values]
