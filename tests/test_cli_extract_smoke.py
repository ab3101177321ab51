"""End-to-end smoke: every CLI verb driven off one larger, MESSY
standalone extract -- the shapes a real region extract exhibits
(``PbfBlobParser.cs:44-102`` framing semantics):

- OSMHeader whose payload carries bbox / required_features /
  optional_features / writingprogram / source (all tolerated: the
  engine filters on blob type and never parses header payloads);
- BlobHeaders with the optional ``indexdata`` field (skipped by the
  strict parser, spec field 2);
- mixed raw and zlib blobs, interleaved entity kinds (dense-only,
  ways-only, rels-only, all-three) in one file;
- granularity variants (100 and 50 with non-zero lat/lon offsets).

One slow-marked test per verb family, all off the same fixture, with
output sanity asserts (counts, tag keys, byte artifacts)."""

import os
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

from osm_pbf_convert_spark.sources.pbf_encoder import (  # noqa: E402
    DenseNodesSpec,
    RelationSpec,
    WaySpec,
    coords_to_raw,
    encode_primitive_block,
    field_bytes,
    field_varint,
    frame_blob,
)

N_NODES = 3000
NODES_PER_BLOB = 250
N_WAYS = 300
N_RELS = 60


def _frame_with_indexdata(block: bytes, compress: bool) -> bytes:
    """A frame whose BlobHeader carries the optional ``indexdata``
    field (spec field 2) -- the strict parser must skip it."""
    import struct

    if compress:
        blob_msg = field_bytes(3, zlib.compress(block)) + field_varint(2, len(block))
    else:
        blob_msg = field_bytes(1, block) + field_varint(2, len(block))
    header = (
        field_bytes(1, b"OSMData")
        + field_bytes(2, b"\x13\x37\x00\xff")  # opaque indexdata
        + field_varint(3, len(blob_msg))
    )
    return struct.pack(">I", len(header)) + header + blob_msg


def _header_frame() -> bytes:
    """OSMHeader with the optional fields a Geofabrik extract carries."""
    import struct

    bbox = b"".join(
        field_varint(f, (v << 1) ^ (v >> 63))  # sint64 zigzag
        for f, v in ((1, -10_000_000_000), (2, 10_000_000_000),
                     (3, 60_000_000_000), (4, 35_000_000_000))
    )
    block = (
        field_bytes(1, bbox)
        + field_bytes(4, b"OsmSchema-V0.6")
        + field_bytes(4, b"DenseNodes")
        + field_bytes(5, b"Sort.Type_then_ID")
        + field_bytes(16, b"synthetic-messy-fixture")
        + field_bytes(17, b"unit test")
    )
    # zlib-compressed header blob (common in the wild)
    blob_msg = field_bytes(3, zlib.compress(block)) + field_varint(2, len(block))
    header = field_bytes(1, b"OSMHeader") + field_varint(3, len(blob_msg))
    return struct.pack(">I", len(header)) + header + blob_msg


@pytest.fixture(scope="module")
def messy_extract(tmp_path_factory):
    rng = np.random.default_rng(99)
    frames = [_header_frame()]
    node_ids = []
    way_ids = []
    rel_ids = []
    nid = 100
    n_blobs_dense = -(-N_NODES // NODES_PER_BLOB)
    dense_blobs = []
    for b in range(n_blobs_dense):
        ids = list(range(nid, nid + NODES_PER_BLOB))
        nid = ids[-1] + int(rng.integers(2, 40))
        node_ids.extend(ids)
        lats = (40.0 + rng.random(NODES_PER_BLOB) * 5).tolist()
        lons = (-5.0 + rng.random(NODES_PER_BLOB) * 10).tolist()
        gran, lat_off, lon_off = ((100, 0, 0), (50, 1000, -2000))[b % 2]
        tags = [
            {"amenity": "cafe"} if i % 7 == 0 else
            ({"natural": "tree", "height": str(i % 30)} if i % 11 == 0 else {})
            for i in range(NODES_PER_BLOB)
        ]
        dense_blobs.append((
            DenseNodesSpec(
                ids=ids,
                lats_raw=coords_to_raw(lats, gran, lat_off),
                lons_raw=coords_to_raw(lons, gran, lon_off),
                tags=tags,
            ),
            dict(granularity=gran, lat_offset=lat_off, lon_offset=lon_off),
        ))

    ways, wid = [], 500_000
    for i in range(N_WAYS):
        k = int(rng.integers(2, 9))
        lo = int(rng.integers(0, len(node_ids) - k))
        ways.append(WaySpec(id=wid, refs=node_ids[lo:lo + k],
                            tags={"highway": ["residential", "primary", "path"][i % 3]}))
        way_ids.append(wid)
        wid += int(rng.integers(1, 30))

    rels, rid = [], 900_000
    for i in range(N_RELS):
        members = [(0, node_ids[int(rng.integers(0, len(node_ids)))], "stop"),
                   (1, way_ids[int(rng.integers(0, len(way_ids)))], "outer")]
        rels.append(RelationSpec(id=rid, members=members, tags={"type": "route"}))
        rel_ids.append(rid)
        rid += int(rng.integers(1, 20))

    # interleave: dense / ways-only / all-three / rels-only, mixed
    # compression, every 5th frame with indexdata in its BlobHeader
    w_chunk = -(-len(ways) // 4)
    r_chunk = -(-len(rels) // 3)
    blocks = []
    wi = ri = 0
    for b, (dense, gkw) in enumerate(dense_blobs):
        blocks.append(encode_primitive_block(dense=dense, **gkw))
        if b % 2 == 0 and wi < len(ways):  # ways-only blob
            blocks.append(encode_primitive_block(ways=ways[wi:wi + w_chunk]))
            wi += w_chunk
        if b % 3 == 0 and ri < len(rels):  # all-three blob
            take_w = ways[wi:wi + 10]
            wi += len(take_w)
            blocks.append(encode_primitive_block(
                dense=None, ways=take_w, relations=rels[ri:ri + r_chunk]))
            ri += r_chunk
    if wi < len(ways):
        blocks.append(encode_primitive_block(ways=ways[wi:]))
    if ri < len(rels):
        blocks.append(encode_primitive_block(relations=rels[ri:]))  # rels-only

    for i, blk in enumerate(blocks):
        if i % 5 == 3:
            frames.append(_frame_with_indexdata(blk, compress=(i % 2 == 0)))
        else:
            frames.append(frame_blob(blk, compress=(i % 2 == 0)))

    path = str(tmp_path_factory.mktemp("messy") / "messy.osm.pbf")
    with open(path, "wb") as f:
        f.write(b"".join(frames))
    return {
        "path": path, "n_frames": len(frames),
        "node_ids": node_ids, "way_ids": way_ids, "rel_ids": rel_ids,
    }


def _run(verb, pbf, out, monkeypatch, spark, *extra):
    import cli

    monkeypatch.setattr(cli, "_spark", lambda app: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(
        sys, "argv", ["cli.py", verb, "--pbf", pbf, "--out", out, *extra]
    )
    cli.main()


@pytest.mark.spark
class TestMessyExtractAllVerbs:
    def test_decode_sees_every_entity(self, spark, messy_extract):
        """Baseline: the distributed reader decodes every entity of the
        messy file (strict mode -- the tolerated shapes must not trip
        it) across many small splits."""
        from osm_pbf_convert_spark.sources.pbf_file import (
            read_pbf_nodes,
            read_pbf_relations,
            read_pbf_ways,
        )

        p = messy_extract["path"]
        assert {r["id"] for r in read_pbf_nodes(spark, p, split_bytes=8192).collect()} \
            == set(messy_extract["node_ids"])
        assert {r["id"] for r in read_pbf_ways(spark, p, split_bytes=8192).collect()} \
            == set(messy_extract["way_ids"])
        assert {r["id"] for r in read_pbf_relations(spark, p, split_bytes=8192).collect()} \
            == set(messy_extract["rel_ids"])

    def test_blob_index(self, spark, messy_extract, tmp_path, monkeypatch):
        from osm_pbf_convert_spark.operators.blob_index_store import (
            decode_blob_ids_info_py,
        )

        out = str(tmp_path / "o")
        _run("blob-index", messy_extract["path"], out, monkeypatch, spark, "--dat")
        pq = spark.read.parquet(f"{out}/blobs")
        agg = pq.groupBy().sum("cnt").collect()[0][0]
        assert agg == N_NODES
        recs = decode_blob_ids_info_py(open(f"{out}/blobs.dat", "rb").read())
        # reference parity: only OSMData blobs get a record -- the
        # OSMHeader frame (offset 0) is skipped (PbfFileProcessor.cs
        # `if (blob.Header.Type != "OSMData") continue;`)
        assert len(recs) == messy_extract["n_frames"] - 1
        pos = [r[0] for r in recs]
        assert pos == sorted(pos) and pos[0] > 0
        assert sum(r[1] for r in recs) == N_NODES
        assert sum(r[4] for r in recs) == N_WAYS
        assert sum(r[5] for r in recs) == N_RELS

    def test_nodes_index(self, spark, messy_extract, tmp_path, monkeypatch):
        out = str(tmp_path / "o")
        prev_db = spark.catalog.currentDatabase()
        try:
            _run("nodes-index", messy_extract["path"], out, monkeypatch, spark, "--dat")
            assert spark.table("cli_out.nodes_index").count() == N_NODES
            assert os.path.getsize(f"{out}/nodes.nodes.dat") > 0
            assert os.path.getsize(f"{out}/nodes.idx") > 0
        finally:
            spark.catalog.setCurrentDatabase(prev_db)
            spark.sql("DROP TABLE IF EXISTS cli_out.nodes_index")
            spark.sql("DROP DATABASE IF EXISTS cli_out")

    def test_join(self, spark, messy_extract, tmp_path, monkeypatch):
        out = str(tmp_path / "o")
        _run("join", messy_extract["path"], out, monkeypatch, spark)
        got = spark.read.parquet(f"{out}/ways_resolved")
        assert got.count() == N_WAYS
        from pyspark.sql import functions as F

        # every ref resolved: no way lost a node
        assert got.filter(F.size("nodes") < 2).count() == 0

    def test_heat_map(self, spark, messy_extract, tmp_path, monkeypatch):
        from osm_pbf_convert_spark.operators.tiling import read_heat_map_file

        out = str(tmp_path / "o")
        _run("heat-map", messy_extract["path"], out, monkeypatch, spark)
        hm = f"{out}/messy.osm.pbf.heat.map"
        assert os.path.getsize(hm) > 0
        cells = read_heat_map_file(spark, hm)
        assert cells.groupBy().sum("cnt").collect()[0][0] == N_NODES

    def test_tags_and_stats(self, spark, messy_extract, tmp_path, monkeypatch):
        out = str(tmp_path / "o")
        _run("tags", messy_extract["path"], out, monkeypatch, spark)
        idx = spark.read.parquet(f"{out}/tags_index")
        keys = {r["key"] for r in idx.select("key").distinct().collect()}
        assert {"amenity", "natural", "highway"} <= keys

        out2 = str(tmp_path / "o2")
        _run("tags-stat", messy_extract["path"], out2, monkeypatch, spark)
        kc = {r["key"]: r["cnt"]
              for r in spark.read.parquet(f"{out2}/tags_stat/key_counts").collect()}
        n_cafes = sum(1 for _b in range(-(-N_NODES // NODES_PER_BLOB))
                      for i in range(NODES_PER_BLOB) if i % 7 == 0)
        assert kc["amenity"] == n_cafes

    def test_spatial(self, spark, messy_extract, tmp_path, monkeypatch):
        import glob

        out = str(tmp_path / "o")
        _run("spatial", messy_extract["path"], out, monkeypatch, spark, "--dat")
        assert spark.read.parquet(f"{out}/spatial").count() == N_NODES
        blocks = glob.glob(f"{out}/spatial_blocks/block_*.dat")
        assert blocks and all(os.path.exists(b + ".sections") for b in blocks)

    def test_ways_file(self, spark, messy_extract, tmp_path, monkeypatch):
        out = str(tmp_path / "o")
        _run("ways-file", messy_extract["path"], out, monkeypatch, spark, "--dat")
        assert spark.read.parquet(f"{out}/ways").count() == N_WAYS
        assert os.path.getsize(f"{out}/ways.dat") > 0
        assert os.path.getsize(f"{out}/ways.dat.idx") > 0

    def test_merge_rel(self, spark, messy_extract, tmp_path, monkeypatch):
        out = str(tmp_path / "o")
        _run("merge-rel", messy_extract["path"], out, monkeypatch, spark, "--dat")
        rel = spark.read.parquet(f"{out}/relations")
        assert rel.count() == N_RELS
        assert os.path.getsize(f"{out}/relations.rels") > 0
        assert os.path.getsize(f"{out}/relations.rels.strs") > 0
