"""Property-based roundtrips for the reference byte-format writer/reader
ports: arbitrary (valid) inputs must survive encode -> decode exactly.
These are the pure-Python layers the distributed sinks are golden-tested
against, so fuzzing them fuzzes the byte formats themselves."""

from hypothesis import given, settings, strategies as st

from osm_pbf_convert_spark.operators.node_store import (
    decode_nodes_index_py,
    encode_nodes_index_py,
)
from osm_pbf_convert_spark.operators.rel_store import (
    INT_MIN,
    decode_rels_file_py,
    encode_rels_file_py,
)
from osm_pbf_convert_spark.operators.way_store import (
    decode_ways_file_py,
    encode_ways_file_py,
)

coord = st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1)
gap = st.integers(min_value=1, max_value=2**40)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(gap, coord, coord), min_size=1, max_size=400))
def test_nodes_index_roundtrip(rows):
    ids, lats, lons = [], [], []
    acc = 0
    for g, la, lo in rows:
        acc += g
        ids.append(acc)
        lats.append(la)
        lons.append(lo)
    dat, _ = encode_nodes_index_py(ids, lats, lons)
    rids, rlats, rlons = decode_nodes_index_py(dat)
    assert (rids, rlats, rlons) == (ids, lats, lons)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            gap,
            st.lists(
                st.tuples(st.integers(min_value=0, max_value=2**50), coord, coord),
                min_size=1, max_size=12,
            ),
        ),
        min_size=1, max_size=60,
    )
)
def test_ways_file_roundtrip(rows):
    acc = 0
    ways = []
    for g, nodes in rows:
        acc += g
        ways.append((acc, nodes))
    dat, _ = encode_ways_file_py(ways)
    assert decode_ways_file_py(dat) == ways


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            gap,
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=2),
                    st.integers(min_value=0, max_value=2**40),
                    st.sampled_from(["", "outer", "inner", "stop", "véry-ütf8"]),
                    st.one_of(st.just(INT_MIN), coord),
                    st.one_of(st.just(INT_MIN), coord),
                ),
                min_size=0, max_size=6,
            ),
        ),
        min_size=1, max_size=40,
    )
)
def test_rels_file_roundtrip(rows):
    acc = 0
    rels = []
    for g, members in rows:
        acc += g
        rect = (-(acc % 1000) - 1, 0, acc % 1000, 5) if members else None
        rels.append((acc, rect, list(members)))
    dat, _, roles = encode_rels_file_py(rels)
    role_id = {r: i for i, r in enumerate(roles)}
    back = decode_rels_file_py(dat)
    assert len(back) == len(rels)
    for (rid, rect, members), (bid, _, bmembers) in zip(rels, back):
        assert bid == rid
        assert bmembers == [
            (t, m, role_id[r], la, lo) for t, m, r, la, lo in members
        ]
