"""Golden byte-parity tests for the relations file sink
(``RelationsProcessor.cs``)."""

import numpy as np
import pytest

from osm_pbf_convert_spark.operators.rel_store import (
    INT_MAX,
    INT_MIN,
    decode_rels_file_py,
    encode_rels_file_py,
    encode_strings_file_py,
    write_rels_file,
)


def _synth_rels(n, seed=17):
    """Ascending rel ids; members mix nodes (coords or missing), ways
    (always-sentinel mids), sub-relations (0 mids); roles drawn so
    first-appearance order differs from lexicographic."""
    rng = np.random.default_rng(seed)
    rid = np.cumsum(rng.integers(1, 1 << 16, size=n)) + 11
    roles = ["outer", "inner", "", "stop", "admin_centre", "label"]
    rels = []
    for i in range(n):
        k = int(rng.integers(1, 8))
        members = []
        pts = []
        for j in range(k):
            mtype = int(rng.integers(0, 3))
            mid = int(rng.integers(1, 1 << 40))
            role = roles[int(rng.integers(0, len(roles)))]
            if mtype == 0:
                if rng.random() < 0.7:  # found node
                    la, lo = int(rng.integers(-(2**31) + 1, 2**31 - 1)), int(rng.integers(-(2**31) + 1, 2**31 - 1))
                    pts.append((la, lo))
                    members.append((0, mid, role, la, lo))
                else:
                    members.append((0, mid, role, INT_MIN, INT_MIN))
            elif mtype == 1:
                if rng.random() < 0.7:  # found way extends rect, sentinel mids
                    la, lo = int(rng.integers(-(2**30), 2**30)), int(rng.integers(-(2**30), 2**30))
                    pts.append((la, lo))
                    pts.append((la + 100, lo + 250))
                members.append((1, mid, role, INT_MIN, INT_MIN))
            else:
                members.append((2, mid, role, 0, 0))
        rect = None
        if pts:
            rect = (
                min(p[0] for p in pts), min(p[1] for p in pts),
                max(p[0] for p in pts), max(p[1] for p in pts),
            )
        rels.append((int(rid[i]), rect, members))
    return rels


class TestPurePython:
    def test_roundtrip(self):
        rels = _synth_rels(200)
        dat, strs, roles = encode_rels_file_py(rels)
        back = decode_rels_file_py(dat)
        role_id = {r: i for i, r in enumerate(roles)}
        assert len(back) == len(rels)
        for (rid, rect, members), (bid, brect, bmembers) in zip(rels, back):
            assert bid == rid
            want = rect or (INT_MAX, INT_MAX, INT_MIN, INT_MIN)
            assert brect == want
            assert bmembers == [
                (t, m, role_id[r or ""], la, lo) for t, m, r, la, lo in members
            ]

    def test_roles_first_appearance_order(self):
        rels = [
            (1, None, [(2, 5, "zzz", 0, 0), (2, 6, "aaa", 0, 0)]),
            (2, None, [(2, 7, "mmm", 0, 0), (2, 8, "zzz", 0, 0)]),
        ]
        _, strs, roles = encode_rels_file_py(rels)
        assert roles == ["zzz", "aaa", "mmm"]  # NOT sorted: appearance order
        assert strs == encode_strings_file_py(roles)
        # .NET string record: LSB 7-bit length prefix then utf8
        assert strs[:2] == bytes([0, 3]) and strs[2:5] == b"zzz"

    def test_empty_rect_wraps_negative_size(self):
        rels = [(5, None, [(2, 1, "r", 0, 0)])]
        dat, _, _ = encode_rels_file_py(rels)
        back = decode_rels_file_py(dat)
        assert back[0][1] == (INT_MAX, INT_MAX, INT_MIN, INT_MIN)


@pytest.mark.spark
class TestDistributedSink:
    @staticmethod
    def _mk_df(spark, rels):
        rows = []
        for rid, rect, members in rels:
            mrows = [
                {
                    "member_type": t, "ref": m, "role": r,
                    "mid_ilat": None if (la == INT_MIN and t in (0, 1)) else la,
                    "mid_ilon": None if (lo == INT_MIN and t in (0, 1)) else lo,
                }
                for t, m, r, la, lo in members
            ]
            rows.append(
                (
                    rid, mrows,
                    rect[0] if rect else None, rect[1] if rect else None,
                    rect[2] if rect else None, rect[3] if rect else None,
                )
            )
        return spark.createDataFrame(
            rows,
            schema="rel_id long, "
                   "members array<struct<member_type:int,ref:long,role:string,mid_ilat:int,mid_ilon:int>>, "
                   "min_ilat int, min_ilon int, max_ilat int, max_ilon int",
        )

    @pytest.mark.parametrize("num_chunks", [1, 3, 6])
    def test_golden_byte_equal(self, spark, tmp_path, num_chunks):
        rels = _synth_rels(400, seed=23)
        golden_dat, golden_strs, _ = encode_rels_file_py(rels)
        out = str(tmp_path / f"r{num_chunks}.rels")
        n_dat, n_strs = write_rels_file(self._mk_df(spark, rels), out, num_chunks=num_chunks)
        assert open(out, "rb").read() == golden_dat
        assert open(out + ".strs", "rb").read() == golden_strs
        assert (n_dat, n_strs) == (len(golden_dat), len(golden_strs))

    def test_empty_member_relations_byte_equal(self, spark, tmp_path):
        """Relations with ZERO members (including a trailing one, whose
        reset index would alias a mid-chain member if handled naively)
        must still produce byte-identical output."""
        rels = _synth_rels(40, seed=77)
        rels = [
            (rid, rect, [] if i % 5 == 0 else members)
            for i, (rid, rect, members) in enumerate(rels)
        ]
        rels[-1] = (rels[-1][0], None, [])  # trailing empty relation
        golden_dat, golden_strs, _ = encode_rels_file_py(rels)
        out = str(tmp_path / "empty.rels")
        write_rels_file(self._mk_df(spark, rels), out, num_chunks=2)
        assert open(out, "rb").read() == golden_dat
        assert open(out + ".strs", "rb").read() == golden_strs

    def test_from_assemble_relations(self, spark, tmp_path):
        """End-to-end: sink consumes assemble_relations output and matches
        the golden built from the same assembled rows."""
        from osm_pbf_convert_spark.operators.joins import assemble_relations, resolve_ways

        rels = spark.createDataFrame(
            [
                (100, [{"member_type": 0, "ref": 1, "role": "stop"},
                       {"member_type": 1, "ref": 10, "role": "outer"},
                       {"member_type": 0, "ref": 99, "role": "stop"}]),  # missing node
                (200, [{"member_type": 2, "ref": 100, "role": "sub"},
                       {"member_type": 1, "ref": 20, "role": "outer"}]),
            ],
            schema="id long, members array<struct<member_type:int,ref:long,role:string>>",
        )
        nodes = spark.createDataFrame(
            [(1, 500, -700), (2, 100, 100), (3, 900, 50), (4, -20, 60)],
            schema="id long, ilat int, ilon int",
        )
        ways = spark.createDataFrame(
            [(10, [2, 3]), (20, [3, 4])], schema="id long, refs array<long>"
        )
        assembled = assemble_relations(rels, nodes, resolve_ways(ways, nodes, keep_tags=False))
        rows = assembled.orderBy("rel_id").collect()
        golden_rels = []
        for r in rows:
            rect = None
            if r["min_ilat"] is not None:
                rect = (r["min_ilat"], r["min_ilon"], r["max_ilat"], r["max_ilon"])
            members = [
                (
                    m["member_type"], m["ref"], m["role"],
                    INT_MIN if m["mid_ilat"] is None else m["mid_ilat"],
                    INT_MIN if m["mid_ilon"] is None else m["mid_ilon"],
                )
                for m in r["members"]
            ]
            golden_rels.append((r["rel_id"], rect, members))
        golden_dat, golden_strs, _ = encode_rels_file_py(golden_rels)
        out = str(tmp_path / "asm.rels")
        write_rels_file(assembled, out, num_chunks=2)
        assert open(out, "rb").read() == golden_dat
        assert open(out + ".strs", "rb").read() == golden_strs
