"""Distributed standalone-.osm.pbf reader: split self-sync + roundtrip
against multi-blob files written by the project's own PBF encoder
(reference input mode: PbfFileProcessor.cs:24-83 / PbfBlobParser.cs)."""

import numpy as np
import pytest

from osm_pbf_convert_spark.sources.pbf_encoder import (
    DenseNodesSpec,
    WaySpec,
    RelationSpec,
    encode_primitive_block,
    frame_blob,
)
from osm_pbf_convert_spark.sources.pbf_file import (
    _frame_at,
    _parse_blob_header,
    _walk_split,
    pbf_blob_frames,
    read_pbf_nodes,
)


def _build_file(tmp_path, n_blobs=12, nodes_per_blob=200, seed=5):
    """Multi-blob .osm.pbf: OSMHeader first, then alternating raw and
    zlib-compressed OSMData blobs with dense nodes, ways, relations."""
    rng = np.random.default_rng(seed)
    frames = [frame_blob(b"\x00", blob_type="OSMHeader")]
    all_nodes = []
    all_ways = []
    next_id = 1
    for b in range(n_blobs):
        ids = list(range(next_id, next_id + nodes_per_blob))
        next_id += nodes_per_blob
        lats = rng.integers(-(10**9), 10**9, nodes_per_blob).tolist()
        lons = rng.integers(-(10**9), 10**9, nodes_per_blob).tolist()
        all_nodes.extend(zip(ids, lats, lons))
        ways = [WaySpec(id=10_000 + b * 10 + i, refs=ids[: 3 + i], tags={"highway": "x"})
                for i in range(3)]
        all_ways.extend(ways)
        rels = [RelationSpec(id=90_000 + b, members=[(0, ids[0], "stop")])]
        block = encode_primitive_block(
            DenseNodesSpec(ids=ids, lats_raw=lats, lons_raw=lons),
            ways=ways, relations=rels,
        )
        frames.append(frame_blob(block, compress=(b % 2 == 0)))
    path = str(tmp_path / "extract.osm.pbf")
    with open(path, "wb") as f:
        f.write(b"".join(frames))
    return path, frames, all_nodes, all_ways


class TestFraming:
    def test_strict_header_parse(self):
        hdr = frame_blob(b"x" * 10)  # tiny frame
        hlen = int.from_bytes(hdr[:4], "big")
        btype, dsize = _parse_blob_header(hdr[4:4 + hlen])
        assert btype == b"OSMData"
        assert dsize == len(hdr) - 4 - hlen
        # corrupting the type string must disqualify
        bad = bytearray(hdr[4:4 + hlen])
        bad[2] ^= 0xFF
        assert _parse_blob_header(bytes(bad)) is None
        # trailing garbage must disqualify (message must consume exactly)
        assert _parse_blob_header(hdr[4:4 + hlen] + b"\x01") is None

    def test_frame_at_rejects_interior_offsets(self, tmp_path):
        path, frames, _, _ = _build_file(tmp_path, n_blobs=3)
        data = open(path, "rb").read()

        def read_at(off, n):
            return data[off:off + n]

        # every true boundary validates; all offsets 1..40 after it do not
        off = 0
        bounds = []
        for fr in frames:
            bounds.append(off)
            off += len(fr)
        for b in bounds:
            assert _frame_at(read_at, b, len(data)) is not None
        for b in bounds[1:3]:
            for delta in range(1, 40):
                fr = _frame_at(read_at, b + delta, len(data))
                if fr is not None:
                    # a lucky parse must still fail the chain check
                    nxt = fr[0]
                    assert nxt != len(data) and _frame_at(read_at, nxt, len(data)) is None

    @pytest.mark.parametrize("split_bytes", [999, 4096, 10**9])
    def test_walk_splits_partition_exactly(self, tmp_path, split_bytes):
        """Every frame is owned by exactly one split, for split sizes
        smaller than a blob, mid-blob, and bigger than the file."""
        path, frames, _, _ = _build_file(tmp_path)
        size = sum(len(fr) for fr in frames)
        bounds = []
        s = 0
        while s < size:
            bounds.append((s, min(s + split_bytes, size)))
            s += split_bytes
        got = []
        with open(path, "rb") as f:
            for s, e in bounds:
                got.extend(off for off, _, _ in _walk_split(f, s, e, size))
        expect = []
        off = 0
        for fr in frames:
            expect.append(off)
            off += len(fr)
        assert got == expect


@pytest.mark.spark
class TestDistributedRead:
    def test_blob_frames_roundtrip(self, spark, tmp_path):
        path, frames, _, _ = _build_file(tmp_path)
        df = pbf_blob_frames(spark, path, split_bytes=4096)
        rows = {r["offset"]: r for r in df.collect()}
        off = 0
        for fr in frames:
            assert bytes(rows[off]["payload"]) == fr
            off += len(fr)
        assert rows[0]["blob_type"] == "OSMHeader"
        assert sum(1 for r in rows.values() if r["blob_type"] == "OSMData") == len(frames) - 1

    def test_nodes_decode_matches_specs(self, spark, tmp_path):
        """Distributed file decode == the node specs that built the file
        (including zlib blobs and blobs straddling split boundaries)."""
        path, _, all_nodes, _ = _build_file(tmp_path)
        nodes = read_pbf_nodes(spark, path, split_bytes=4096)
        got = {r["id"]: r for r in nodes.collect()}
        assert len(got) == len(all_nodes)
        # raw coords here use granularity=100: ilat quantizes the decoded
        # degree value; spot-check ids and per-id uniqueness is the strong
        # invariant (coordinate parity is covered by the payload decoder's
        # own oracled tests)
        assert set(got) == {i for i, _, _ in all_nodes}
        assert all(r["url"].endswith(f"{path}#0") is False for r in got.values())

    def test_single_split_equals_many_splits(self, spark, tmp_path):
        path, _, _, _ = _build_file(tmp_path, n_blobs=6)
        one = read_pbf_nodes(spark, path, split_bytes=10**9)
        many = read_pbf_nodes(spark, path, split_bytes=2048)
        a = {(r["id"], r["ilat"], r["ilon"]) for r in one.collect()}
        b = {(r["id"], r["ilat"], r["ilon"]) for r in many.collect()}
        assert a == b and len(a) > 0

    def test_scan_is_distributed(self, spark, tmp_path):
        path, _, _, _ = _build_file(tmp_path)
        df = pbf_blob_frames(spark, path, split_bytes=4096)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan


@pytest.mark.spark
class TestPbfWriteSink:
    def test_decode_write_decode_lossless(self, spark, tmp_path):
        """read_pbf_* -> write_pbf_file -> read_pbf_* is a lossless
        circle: ids, bit-exact coordinates, tags, way refs, relation
        members all survive (multiple blocks per kind, compressed)."""
        from osm_pbf_convert_spark.sources.pbf_file import (
            read_pbf_ways,
            read_pbf_relations,
            write_pbf_file,
        )

        path, _, _, _ = _build_file(tmp_path, n_blobs=6, nodes_per_blob=150)
        n0 = read_pbf_nodes(spark, path)
        w0 = read_pbf_ways(spark, path)
        r0 = read_pbf_relations(spark, path)

        out = str(tmp_path / "rewritten.osm.pbf")
        total = write_pbf_file(
            out, nodes=n0, ways=w0, relations=r0,
            entities_per_block=100,  # forces multiple blocks
        )
        import os
        assert total == os.path.getsize(out)

        n1 = read_pbf_nodes(spark, out)
        w1 = read_pbf_ways(spark, out)
        r1 = read_pbf_relations(spark, out)

        def rows(df, cols):
            return sorted(
                tuple(r[c] for c in cols) for r in df.select(*cols).collect()
            )

        assert rows(n1, ["id", "lat", "lon", "ilat", "ilon"]) == \
            rows(n0, ["id", "lat", "lon", "ilat", "ilon"])
        a = {r["id"]: (list(r["refs"]), dict(r["tags"] or {})) for r in w0.collect()}
        b = {r["id"]: (list(r["refs"]), dict(r["tags"] or {})) for r in w1.collect()}
        assert a == b
        ra = {r["id"]: [tuple(m) for m in r["members"]] for r in r0.collect()}
        rb = {r["id"]: [tuple(m) for m in r["members"]] for r in r1.collect()}
        assert ra == rb

    def test_written_file_has_header_and_ordering(self, spark, tmp_path):
        from osm_pbf_convert_spark.sources.pbf_file import write_pbf_file

        path, _, all_nodes, _ = _build_file(tmp_path, n_blobs=2)
        nodes = read_pbf_nodes(spark, path)
        out = str(tmp_path / "hdr.osm.pbf")
        write_pbf_file(out, nodes=nodes, entities_per_block=75)
        df = pbf_blob_frames(spark, out, split_bytes=2048)
        rows = sorted(df.collect(), key=lambda r: r["offset"])
        assert rows[0]["blob_type"] == "OSMHeader"
        assert all(r["blob_type"] == "OSMData" for r in rows[1:])
        # node ids ascend across the file (global (kind, id) range sort)
        got = read_pbf_nodes(spark, out).collect()
        assert {r["id"] for r in got} == {i for i, _, _ in all_nodes}


@pytest.mark.spark
class TestCorruptionResync:
    def test_resync_skips_damage_and_counts_bytes(self, spark, tmp_path):
        """A corrupted mid-file region is skipped by scanning to the next
        provable boundary; intact frames before AND after survive, and
        the damage is COUNTED via the accumulator (never silent)."""
        path, frames, _, _ = _build_file(tmp_path, n_blobs=6)
        data = bytearray(open(path, "rb").read())
        # corrupt frame 3 (0-indexed frames incl. header): smash its
        # header length bytes so the boundary no longer validates
        off = sum(len(fr) for fr in frames[:3])
        data[off:off + 4] = b"\xde\xad\xbe\xef"
        bad = str(tmp_path / "damaged.osm.pbf")
        with open(bad, "wb") as f:
            f.write(bytes(data))

        acc = spark.sparkContext.accumulator(0)
        df = pbf_blob_frames(spark, bad, split_bytes=4096,
                             on_error="resync", bad_bytes=acc)
        rows = df.collect()
        got = sorted(r["offset"] for r in rows)
        expect_offsets = []
        o = 0
        for i, fr in enumerate(frames):
            if i != 3:
                expect_offsets.append(o)
            o += len(fr)
        assert got == expect_offsets
        # exact global damage = file bytes not covered by decoded frames
        import os
        covered = sum(r["n_bytes"] for r in rows)
        assert os.path.getsize(bad) - covered == len(frames[3])
        # the accumulator is a per-split-provable LOWER bound
        assert 0 <= acc.value <= len(frames[3])

    def test_resync_counts_midsplit_damage(self, spark, tmp_path):
        """Damage strictly inside one split (valid frames before it in
        the same split) IS provable locally and must hit the
        accumulator exactly."""
        path, frames, _, _ = _build_file(tmp_path, n_blobs=4)
        data = bytearray(open(path, "rb").read())
        off = sum(len(fr) for fr in frames[:2])
        data[off:off + 4] = b"\xde\xad\xbe\xef"
        bad = str(tmp_path / "damaged_mid.osm.pbf")
        with open(bad, "wb") as f:
            f.write(bytes(data))
        acc = spark.sparkContext.accumulator(0)
        # single split: every frame before the damage decodes first
        df = pbf_blob_frames(spark, bad, split_bytes=10**9,
                             on_error="resync", bad_bytes=acc)
        got = sorted(r["offset"] for r in df.collect())
        o = 0
        expect = []
        for i, fr in enumerate(frames):
            if i != 2:
                expect.append(o)
            o += len(fr)
        assert got == expect
        assert acc.value == len(frames[2])

    def test_raise_mode_fails_loud(self, spark, tmp_path):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import PythonException

        path, frames, _, _ = _build_file(tmp_path, n_blobs=3)
        data = bytearray(open(path, "rb").read())
        off = sum(len(fr) for fr in frames[:2])
        data[off:off + 4] = b"\xff\xff\xff\xff"
        bad = str(tmp_path / "damaged2.osm.pbf")
        with open(bad, "wb") as f:
            f.write(bytes(data))
        with pytest.raises((PythonException, Py4JJavaError)):
            pbf_blob_frames(spark, bad, split_bytes=10**9).collect()


@pytest.mark.spark
class TestExtractStream:
    def test_stream_decode_equals_batch(self, spark, tmp_path):
        """availableNow streaming decode of a directory of extracts ==
        the batch decode of the same files (exactly-once per file via
        the binaryFile source's checkpointed log)."""
        from osm_pbf_convert_spark.streaming.pbf_extracts import stream_decode_nodes

        watch = tmp_path / "drops"
        watch.mkdir()
        all_ids = set()
        for i in range(3):
            p, _, nodes_i, _ = _build_file(
                watch, n_blobs=2, nodes_per_blob=40, seed=100 + i
            )
            newp = str(watch / f"region{i}.osm.pbf")
            import os
            os.rename(p, newp)
            all_ids |= {nid for nid, _, _ in nodes_i}

        sdf = stream_decode_nodes(spark, str(watch))
        assert sdf.isStreaming
        q = (
            sdf.writeStream.format("memory").queryName("pbfdrops")
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select id, url from pbfdrops").collect()
        # ids repeat across files (same generator seed base ids), so
        # compare per-file sets via the url lineage
        by_file = {}
        for r in got:
            by_file.setdefault(r["url"].rsplit("/", 1)[-1], set()).add(r["id"])
        assert set(by_file) == {f"region{i}.osm.pbf" for i in range(3)}
        assert set().union(*by_file.values()) == all_ids


class TestNotAPbf:
    def test_non_pbf_file_fails_loud(self, tmp_path):
        """Pointing the reader at a non-PBF file must raise, not silently
        return zero frames (first-contact behavior)."""
        import io

        p = tmp_path / "random.bin"
        p.write_bytes(np.random.default_rng(1).integers(0, 256, 5000).astype("u1").tobytes())
        with pytest.raises(ValueError, match="not a .osm.pbf"):
            list(_walk_split(io.BytesIO(p.read_bytes()), 0, 5000, 5000))

    def test_non_pbf_resync_counts_whole_file(self, tmp_path):
        import io

        class Acc:
            value = 0

            def add(self, v):
                self.value += v

        data = np.random.default_rng(2).integers(0, 256, 3000).astype("u1").tobytes()
        acc = Acc()
        frames = list(_walk_split(io.BytesIO(data), 0, 3000, 3000,
                                  on_error="resync", bad_bytes=acc))
        assert frames == []
        assert acc.value == 3000


@pytest.mark.spark
class TestWriteSinkEdges:
    def test_empty_nodes_writes_header_only(self, spark, tmp_path):
        from osm_pbf_convert_spark.sources.pbf_file import write_pbf_file

        empty = spark.createDataFrame(
            [], schema="id long, lat double, lon double, tags map<string,string>"
        )
        out = str(tmp_path / "empty.osm.pbf")
        total = write_pbf_file(out, nodes=empty)
        import os
        assert total == os.path.getsize(out) > 0
        df = pbf_blob_frames(spark, out, split_bytes=10**9)
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["blob_type"] == "OSMHeader"
        assert read_pbf_nodes(spark, out).count() == 0


@pytest.mark.spark
class TestMultiFile:
    def test_glob_and_list_inputs(self, spark, tmp_path):
        """A glob or list of extracts reads as one DataFrame; per-file
        lineage keeps identical entity ids apart."""
        import os

        ids_by_file = {}
        for i in range(3):
            p, _, nodes_i, _ = _build_file(tmp_path, n_blobs=2, nodes_per_blob=30,
                                           seed=200 + i)
            newp = str(tmp_path / f"part{i}.osm.pbf")
            os.rename(p, newp)
            ids_by_file[f"part{i}.osm.pbf"] = {nid for nid, _, _ in nodes_i}

        for src in (str(tmp_path / "part*.osm.pbf"),
                    [str(tmp_path / f"part{i}.osm.pbf") for i in range(3)]):
            nodes = read_pbf_nodes(spark, src, split_bytes=2048)
            got = {}
            for r in nodes.collect():
                got.setdefault(r["url"].rsplit("/", 1)[-1].split("#")[0], set()).add(r["id"])
            assert got == ids_by_file, src

    def test_empty_glob_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            pbf_blob_frames(spark, str(tmp_path / "nothing*.osm.pbf"))


@pytest.mark.spark
class TestRemoteScheme:
    """The object-store path: the same reader/writer through fsio's
    hermetic ``mock://`` scheme -- URI parse -> generic pyarrow
    FileSystem -> ranged reads on executors -- exactly the code path
    ``s3://``/``gs://`` take (only the fs object differs)."""

    def test_remote_read_equals_local(self, spark, tmp_path):
        from osm_pbf_convert_spark.sources import fsio

        path, frames, _, _ = _build_file(tmp_path, n_blobs=6)
        local = {r["offset"]: bytes(r["payload"])
                 for r in pbf_blob_frames(spark, path, split_bytes=4096).collect()}
        remote_df = pbf_blob_frames(spark, fsio.mock_uri(path), split_bytes=4096)
        remote = {r["offset"]: bytes(r["payload"]) for r in remote_df.collect()}
        assert remote == local and len(remote) == len(frames)
        # lineage keeps the URI the caller used
        assert all(r["url"].startswith("mock:///")
                   for r in remote_df.select("url").collect())

    def test_remote_glob(self, spark, tmp_path):
        import os

        from osm_pbf_convert_spark.sources import fsio

        expect = set()
        for i in range(3):
            p, _, nodes_i, _ = _build_file(tmp_path, n_blobs=2, nodes_per_blob=25,
                                           seed=300 + i)
            os.rename(p, str(tmp_path / f"rm{i}.osm.pbf"))
            expect |= {nid for nid, _, _ in nodes_i}
        got = read_pbf_nodes(
            spark, fsio.mock_uri(str(tmp_path)) + "/rm*.osm.pbf", split_bytes=2048
        )
        assert {r["id"] for r in got.collect()} == expect

    def test_remote_write_roundtrip(self, spark, tmp_path):
        from osm_pbf_convert_spark.sources import fsio
        from osm_pbf_convert_spark.sources.pbf_file import write_pbf_file

        src, _, all_nodes, _ = _build_file(tmp_path, n_blobs=3, nodes_per_blob=40)
        nodes = read_pbf_nodes(spark, src)
        out = fsio.mock_uri(str(tmp_path / "re.osm.pbf"))
        n = write_pbf_file(out, nodes=nodes, entities_per_block=50, granularity=1)
        assert n > 0 and (tmp_path / "re.osm.pbf").stat().st_size == n
        back = read_pbf_nodes(spark, out)
        assert {r["id"] for r in back.collect()} == {i for i, _, _ in all_nodes}
