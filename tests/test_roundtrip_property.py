"""Property-based encode -> parse roundtrip over random entity content.

The encoder inverts the reference's decode semantics; if any random
combination of ids/coords/tags/refs/members survives the roundtrip
bit-exactly, the wire layer is trustworthy for arbitrary inputs (not just
the hand-picked fixtures)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osm_pbf_convert_spark.sources.pbf import parse_payload
from osm_pbf_convert_spark.sources.pbf_encoder import (
    DenseNodesSpec,
    RelationSpec,
    WaySpec,
    build_payload,
    encode_primitive_block,
    frame_blob,
)

ids_st = st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=20)
raw_st = st.integers(min_value=-(2**40), max_value=2**40)
tag_st = st.dictionaries(
    st.text(min_size=1, max_size=8).filter(lambda s: "\x00" not in s),
    st.text(max_size=8),
    max_size=3,
)


class TestDenseRoundtrip:
    @settings(max_examples=60, deadline=None)
    @given(
        ids=ids_st,
        gran=st.sampled_from([1, 100, 1000]),
        lat_off=st.integers(min_value=-(10**9), max_value=10**9),
        compress=st.booleans(),
        data=st.data(),
    )
    def test_nodes(self, ids, gran, lat_off, compress, data):
        n = len(ids)
        lats = [data.draw(raw_st) for _ in range(n)]
        lons = [data.draw(raw_st) for _ in range(n)]
        tags = [data.draw(tag_st) for _ in range(n)]
        spec = DenseNodesSpec(ids=ids, lats_raw=lats, lons_raw=lons, tags=tags)
        block = encode_primitive_block(dense=spec, granularity=gran, lat_offset=lat_off)
        out = parse_payload(build_payload([frame_blob(block, compress=compress)]))
        assert out.nodes.ids.tolist() == ids
        exp_lat = [1e-9 * (lat_off + gran * r) for r in lats]
        assert out.nodes.lat.tolist() == exp_lat  # bit-exact float64
        # tags: zero-index ("") keys terminate runs early by reference
        # semantics, so only compare when no empty-string keys were drawn
        if all("" not in t for t in tags):
            got = []
            pos = 0
            for c in out.nodes.tag_counts:
                got.append(
                    dict(zip(out.nodes.tag_keys[pos:pos + c], out.nodes.tag_vals[pos:pos + c]))
                )
                pos += c
            assert got == [dict(t) for t in tags]

    @settings(max_examples=40, deadline=None)
    @given(wid=st.integers(min_value=0, max_value=2**50), refs=ids_st, tags=tag_st)
    def test_ways(self, wid, refs, tags):
        block = encode_primitive_block(ways=[WaySpec(id=wid, refs=refs, tags=tags)])
        out = parse_payload(build_payload([frame_blob(block)]))
        assert out.ways.ids == [wid]
        assert out.ways.refs[0].tolist() == refs
        assert out.ways.tags[0] == tags

    @settings(max_examples=40, deadline=None)
    @given(
        rid=st.integers(min_value=0, max_value=2**50),
        members=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.integers(min_value=-(2**40), max_value=2**40),
                st.text(max_size=6),
            ),
            max_size=8,
        ),
    )
    def test_relations(self, rid, members):
        block = encode_primitive_block(relations=[RelationSpec(id=rid, members=members)])
        out = parse_payload(build_payload([frame_blob(block)]))
        assert out.relations.ids == [rid]
        assert out.relations.members[0] == members


class TestPbfFileSplitProperty:
    """Random blob sizes x random split sizes: byte-range splits of a
    standalone .pbf must partition the frame set exactly (each frame
    owned by the split holding its first byte, none lost, none doubled,
    bytes intact)."""

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_split_ownership_exact(self, data):
        import io

        from osm_pbf_convert_spark.sources.pbf_file import _walk_split

        n_blobs = data.draw(st.integers(min_value=1, max_value=8))
        frames = []
        for i in range(n_blobs):
            size = data.draw(st.integers(min_value=0, max_value=400))
            payload = bytes(data.draw(st.binary(min_size=size, max_size=size)))
            btype = data.draw(st.sampled_from(["OSMData", "OSMHeader"]))
            compress = data.draw(st.booleans())
            frames.append(frame_blob(payload, blob_type=btype, compress=compress))
        blob = b"".join(frames)
        split_bytes = data.draw(st.integers(min_value=1, max_value=len(blob) + 64))
        f = io.BytesIO(blob)
        got = []
        s = 0
        while s < len(blob):
            e = min(s + split_bytes, len(blob))
            got.extend((off, fr) for off, _, fr in _walk_split(f, s, e, len(blob)))
            s += split_bytes
        expect = []
        off = 0
        for fr in frames:
            expect.append((off, bytes(fr)))
            off += len(fr)
        assert [(o, bytes(fr)) for o, fr in got] == expect
