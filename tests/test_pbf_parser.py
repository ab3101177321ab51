"""Golden decode fixtures: synthetic PBF blobs -> exact decoded entities.

The encoder inverts reference decode semantics; these tests assert the
parser reproduces the exact (id, lat, lon, tags) the reference's
PrimitiveDecoder would emit (PrimitiveDecoder.cs:68-120), including
granularity/offset variants, negative deltas, 0-terminated tag runs, zlib
blobs, and non-OSMData blob filtering.
"""

import numpy as np
import pytest

from osm_pbf_convert_spark.sources.pbf import parse_payload
from osm_pbf_convert_spark.sources.pbf_encoder import (
    DenseNodesSpec,
    RelationSpec,
    WaySpec,
    build_payload,
    coords_to_raw,
    encode_primitive_block,
    frame_blob,
)


def make_dense_payload(granularity=100, lat_offset=0, lon_offset=0, compress=False):
    lats = [48.1, 48.2, -33.9]
    lons = [11.5, 11.6, 151.2]
    spec = DenseNodesSpec(
        ids=[100, 105, 103],  # non-monotonic id deltas on purpose
        lats_raw=coords_to_raw(lats, granularity, lat_offset),
        lons_raw=coords_to_raw(lons, granularity, lon_offset),
        tags=[{"amenity": "cafe", "name": "X"}, {}, {"highway": "bus_stop"}],
    )
    block = encode_primitive_block(
        dense=spec, granularity=granularity, lat_offset=lat_offset, lon_offset=lon_offset
    )
    return build_payload([frame_blob(block, compress=compress)]), lats, lons


class TestDenseNodes:
    @pytest.mark.parametrize("granularity,lat_off,lon_off", [(100, 0, 0), (1000, 5, -7), (100, -1000000, 123)])
    @pytest.mark.parametrize("compress", [False, True])
    def test_decode_exact(self, granularity, lat_off, lon_off, compress):
        payload, lats, lons = make_dense_payload(granularity, lat_off, lon_off, compress)
        out = parse_payload(payload)
        assert out.nodes.ids.tolist() == [100, 105, 103]
        # coord = 1e-9 * (offset + granularity * raw) in float64 -- exact
        raw_lat = coords_to_raw(lats, granularity, lat_off)
        raw_lon = coords_to_raw(lons, granularity, lon_off)
        exp_lat = [1e-9 * (lat_off + granularity * r) for r in raw_lat]
        exp_lon = [1e-9 * (lon_off + granularity * r) for r in raw_lon]
        assert out.nodes.lat.tolist() == exp_lat  # bit-identical, no tolerance
        assert out.nodes.lon.tolist() == exp_lon
        assert out.nodes.tag_counts.tolist() == [2, 0, 1]
        assert out.nodes.tag_keys == ["amenity", "name", "highway"]
        assert out.nodes.tag_vals == ["cafe", "X", "bus_stop"]

    def test_non_osmdata_blob_filtered(self):
        payload, _, _ = make_dense_payload()
        header_blob = frame_blob(b"\x00" * 10, blob_type="OSMHeader")
        out = parse_payload(header_blob + payload)
        assert out.n_blobs == 2 and out.n_data_blobs == 1
        assert len(out.nodes.ids) == 3

    def test_empty_payload(self):
        out = parse_payload(b"")
        assert len(out.nodes.ids) == 0 and out.n_blobs == 0
        out = parse_payload(None)
        assert len(out.nodes.ids) == 0

    def test_untagged_block_fast_path(self):
        spec = DenseNodesSpec(ids=[1, 2], lats_raw=[10, 20], lons_raw=[30, 40])
        payload = build_payload([frame_blob(encode_primitive_block(dense=spec))])
        out = parse_payload(payload)
        assert out.nodes.tag_counts.tolist() == [0, 0]

    def test_empty_string_value_falls_back_to_sequential_demux(self):
        """A tag VALUE can legitimately be string-table slot 0 (the empty
        string); its kv zero is NOT a terminator (zeros terminate only at
        key positions, PrimitiveDecoder.cs:102-109). This disables the
        vectorized demux fast path; the sequential path must keep exact
        semantics."""
        spec = DenseNodesSpec(
            ids=[1, 2, 3],
            lats_raw=[10, 20, 30],
            lons_raw=[40, 50, 60],
            tags=[{"name": "", "amenity": "cafe"}, {}, {"highway": ""}],
        )
        payload = build_payload([frame_blob(encode_primitive_block(dense=spec))])
        out = parse_payload(payload)
        assert out.nodes.tag_counts.tolist() == [2, 0, 1]
        assert out.nodes.tag_keys == ["name", "amenity", "highway"]
        assert out.nodes.tag_vals == ["", "cafe", ""]

    def test_demux_paths_agree_randomized(self):
        """Vectorized and sequential demux agree on random tag layouts
        without empty-string values (the fast-path precondition)."""
        import numpy as np

        rng = np.random.default_rng(23)
        for trial in range(10):
            n = int(rng.integers(1, 30))
            tags = []
            for _ in range(n):
                k = int(rng.integers(0, 4))
                tags.append({f"k{j}": f"v{int(rng.integers(1, 9))}" for j in range(k)})
            spec = DenseNodesSpec(
                ids=list(range(1, n + 1)),
                lats_raw=rng.integers(-10**6, 10**6, n).tolist(),
                lons_raw=rng.integers(-10**6, 10**6, n).tolist(),
                tags=tags,
            )
            payload = build_payload([frame_blob(encode_primitive_block(dense=spec))])
            out = parse_payload(payload)
            assert out.nodes.tag_counts.tolist() == [len(t) for t in tags]
            assert out.nodes.tag_keys == [k for t in tags for k in t]
            assert out.nodes.tag_vals == [v for t in tags for v in t.values()]

    def test_negative_delta_ids(self):
        spec = DenseNodesSpec(ids=[10**12, 5, 10**11], lats_raw=[0, -5, 5], lons_raw=[1, 1, -100])
        payload = build_payload([frame_blob(encode_primitive_block(dense=spec))])
        out = parse_payload(payload)
        assert out.nodes.ids.tolist() == [10**12, 5, 10**11]


class TestWays:
    def test_decode_ways(self):
        ways = [
            WaySpec(id=7, refs=[100, 105, 103], tags={"highway": "residential"}),
            WaySpec(id=9, refs=[50, -3, 1000000000000], tags={}),
        ]
        payload = build_payload([frame_blob(encode_primitive_block(ways=ways))])
        out = parse_payload(payload)
        assert out.ways.ids == [7, 9]
        assert out.ways.refs[0].tolist() == [100, 105, 103]
        assert out.ways.refs[1].tolist() == [50, -3, 1000000000000]
        assert out.ways.tags == [{"highway": "residential"}, {}]


class TestRelations:
    def test_decode_relations(self):
        rels = [
            RelationSpec(
                id=42,
                members=[(0, 100, "stop"), (1, 7, "outer"), (2, 41, "")],
                tags={"type": "route"},
            )
        ]
        payload = build_payload([frame_blob(encode_primitive_block(relations=rels))])
        out = parse_payload(payload)
        assert out.relations.ids == [42]
        assert out.relations.members[0] == [(0, 100, "stop"), (1, 7, "outer"), (2, 41, "")]
        assert out.relations.tags == [{"type": "route"}]


class TestMixedBlocks:
    def test_all_kinds_one_block(self):
        spec = DenseNodesSpec(ids=[1, 2, 3], lats_raw=[0, 1, 2], lons_raw=[0, 1, 2])
        ways = [WaySpec(id=1, refs=[1, 2, 3])]
        rels = [RelationSpec(id=1, members=[(1, 1, "outer")])]
        block = encode_primitive_block(dense=spec, ways=ways, relations=rels)
        out = parse_payload(build_payload([frame_blob(block)]))
        assert len(out.nodes.ids) == 3 and out.ways.ids == [1] and out.relations.ids == [1]

    def test_want_projection(self):
        spec = DenseNodesSpec(ids=[1], lats_raw=[0], lons_raw=[0])
        ways = [WaySpec(id=1, refs=[1])]
        block = encode_primitive_block(dense=spec, ways=ways)
        out = parse_payload(build_payload([frame_blob(block)]), want=("ways",))
        assert len(out.nodes.ids) == 0 and out.ways.ids == [1]

    def test_multi_frame_payload(self):
        blocks = []
        for base in (0, 1000):
            spec = DenseNodesSpec(ids=[base + 1, base + 2], lats_raw=[base, base + 1], lons_raw=[0, 1])
            blocks.append(frame_blob(encode_primitive_block(dense=spec), compress=base > 0))
        out = parse_payload(build_payload(blocks))
        assert out.nodes.ids.tolist() == [1, 2, 1001, 1002]
