"""Golden byte-parity tests for the ``.blobs.dat`` per-blob zone-map
file (``BlobIdsInfo.cs`` -- the sixth reference byte format)."""

import struct

import numpy as np
import pytest

from osm_pbf_convert_spark.operators.blob_index_store import (
    RECORD_BYTES,
    decode_blob_ids_info_py,
    encode_blob_ids_info_py,
    read_blobs_dat,
    write_blobs_dat,
)


def _synth_infos(n, seed=11):
    rng = np.random.default_rng(seed)
    infos = []
    pos = 0
    nid = 1
    for _ in range(n):
        nc = int(rng.integers(0, 8000))
        if nc:
            mn, mx = nid, nid + nc - 1
            nid = mx + int(rng.integers(1, 50))
        else:  # the C# accumulator sentinels for node-less blobs
            mn, mx = (1 << 63) - 1, -(1 << 63)
        infos.append((pos, nc, mn, mx,
                      int(rng.integers(0, 300)), int(rng.integers(0, 40))))
        pos += int(rng.integers(100, 1 << 24))
    return infos


class TestPurePython:
    def test_record_layout_is_binarywriter_exact(self):
        """One record == BinaryWriter field order, little-endian, 36 B
        (BlobIdsInfo.cs:35-42)."""
        blob = encode_blob_ids_info_py([(7, 3, 100, 102, 2, 1)])
        assert len(blob) == RECORD_BYTES == 36
        assert blob == (
            struct.pack("<q", 7) + struct.pack("<i", 3)
            + struct.pack("<q", 100) + struct.pack("<q", 102)
            + struct.pack("<i", 2) + struct.pack("<i", 1)
        )

    def test_roundtrip_with_sentinels(self):
        infos = _synth_infos(40)
        assert decode_blob_ids_info_py(encode_blob_ids_info_py(infos)) == infos

    def test_truncated_raises(self):
        with pytest.raises(ValueError):
            decode_blob_ids_info_py(b"\x00" * 35)


@pytest.mark.spark
class TestDistributedStore:
    def test_sink_golden_vs_py_writer(self, spark, tmp_path):
        """Distributed sink output is byte-identical to the cited
        pure-Python writer port, from shuffled input."""
        infos = _synth_infos(500)
        shuffled = list(infos)
        np.random.default_rng(3).shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled,
            schema="start_position long, nodes_count int, min_node_id long, "
                   "max_node_id long, ways_count int, rels_count int",
        )
        out = str(tmp_path / "ids.blobs.dat")
        n = write_blobs_dat(df, out, num_chunks=5)
        data = open(out, "rb").read()
        assert len(data) == n == len(infos) * RECORD_BYTES
        assert data == encode_blob_ids_info_py(infos)

    def test_reader_roundtrip_split_invariant(self, spark, tmp_path):
        infos = _synth_infos(700, seed=21)
        out = str(tmp_path / "r.blobs.dat")
        with open(out, "wb") as f:
            f.write(encode_blob_ids_info_py(infos))
        one = read_blobs_dat(spark, out, split_records=10**9)
        many = read_blobs_dat(spark, out, split_records=64)
        want = set(infos)
        assert {tuple(r) for r in one.collect()} == want
        assert {tuple(r) for r in many.collect()} == want

    def test_reader_rejects_misaligned_file(self, spark, tmp_path):
        out = tmp_path / "bad.blobs.dat"
        out.write_bytes(b"\x01" * 37)
        with pytest.raises(ValueError):
            read_blobs_dat(spark, str(out))

    def test_remote_scheme_both_directions(self, spark, tmp_path):
        from osm_pbf_convert_spark.sources import fsio

        infos = _synth_infos(120, seed=31)
        df = spark.createDataFrame(
            infos,
            schema="start_position long, nodes_count int, min_node_id long, "
                   "max_node_id long, ways_count int, rels_count int",
        )
        uri = fsio.mock_uri(str(tmp_path / "m.blobs.dat"))
        write_blobs_dat(df, uri, num_chunks=3)
        assert (tmp_path / "m.blobs.dat").read_bytes() == encode_blob_ids_info_py(infos)
        back = read_blobs_dat(spark, uri, split_records=50)
        assert {tuple(r) for r in back.collect()} == set(infos)
