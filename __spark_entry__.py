"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end pipeline at sf0.001 -- synthesize
  the Common-Crawl-style pages table (html = PBF-style framed payloads),
  decode nodes via the vectorized Arrow UDF, Morton-tile them, and return
  zoom-8 tile counts.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 + the
  training-data-pipeline extensions); see osm_pbf_convert_spark/queries.py.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_pbf_convert_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osm_pbf_convert_spark.queries import q_tile_counts_z8, _pages
    from osm_pbf_convert_spark.operators.tiling import tile_counts
    from osm_pbf_convert_spark.sources.pbf import decode_nodes

    pages = _pages(spark, "/root/testdata/sf0.001")
    nodes = decode_nodes(pages)
    return tile_counts(nodes, 8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
