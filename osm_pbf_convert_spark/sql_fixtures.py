"""Shared derivation formulas used by BOTH the Spark queries and the DuckDB
oracle SQL, so the two sides are provably computing over identical inputs.

Node ids / coordinates are deterministic modular mixes of the driver's
TPC-H-ish keys (seeded tables, TESTDATA.md). The same strings are passed to
``F.expr`` on the Spark side and embedded into the oracle SQL -- only
integer ``* + %`` arithmetic, identical in both dialects.
"""

from __future__ import annotations

# node id for a lineitem row
def node_id_sql(okey: str, lineno: str) -> str:
    return f"(({okey}) * 8 + ({lineno}))"


# int32 coords from a node/part id (matches sources/pages.py ilat_np/ilon_np)
def ilat_sql(nid: str) -> str:
    return f"((({nid}) * 2654435761) % 4294967296 - 2147483648)"


def ilon_sql(nid: str) -> str:
    return f"((({nid}) * 2246822519 + 1013904223) % 4294967296 - 2147483648)"


# small-extent coords for the kNN fixture (everything in [0, 2^20))
def knn_ilat_sql(key: str) -> str:
    return f"((({key}) * 48271) % 1048576)"


def knn_ilon_sql(key: str) -> str:
    return f"((({key}) * 69621) % 1048576)"


def knn_q_ilat_sql(key: str) -> str:
    return f"((({key}) * 104729 + 7) % 1048576)"


def knn_q_ilon_sql(key: str) -> str:
    return f"((({key}) * 15485863 + 11) % 1048576)"


# deterministic cents conversion that is bit-identical across engines:
# floor(x*100 + 0.5) over the same input double
def cents_sql(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)"


HIGHWAY_VALUES = [
    "motorway", "motorway_link", "trunk", "trunk_link", "primary",
    "primary_link", "secondary", "secondary_link", "tertiary",
    "tertiary_link", "unclassified", "residential", "living_street",
    "service", "pedestrian", "track", "bus_guideway", "escape", "raceway",
    "road", "footway", "steps", "path", "cycleway", "bridleway",
]
HIGHWAY_CODES = [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22]
