"""Scale-discipline guards: no per-row Python anywhere, pushdown/pruning
reach the parquet scans, broadcasts where dimension tables are small."""

import os
import re

import pytest
from pyspark.sql import functions as F

PKG = os.path.join(os.path.dirname(__file__), "..", "osm_pbf_convert_spark")


class TestNoSlowPath:
    def test_no_rdd_no_row_udf(self):
        """The engine must never drop to RDDs or row-at-a-time Python UDFs
        (SURVEY.md §7 hard parts). pandas_udf / mapInArrow / mapInPandas
        are the sanctioned vectorized escape hatches."""
        bad = []
        for root, _, files in os.walk(PKG):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                src = open(os.path.join(root, fn)).read()
                for pat in (r"\.rdd\b", r"\bF\.udf\(", r"@udf\b", r"udf\.register", r"\.collect\(\)"):
                    for m in re.finditer(pat, src):
                        line = src[: m.start()].count("\n") + 1
                        bad.append(f"{fn}:{line} matches {pat}")
        assert not bad, f"slow-path constructs found: {bad}"

    def test_no_toPandas_in_hot_path(self):
        """toPandas only allowed in similarity.train_centroids (bounded
        driver-side sample, documented)."""
        hits = []
        for root, _, files in os.walk(PKG):
            for fn in files:
                if fn.endswith(".py"):
                    src = open(os.path.join(root, fn)).read()
                    n = src.count(".toPandas()")
                    if n and fn != "similarity.py":
                        hits.append(fn)
        assert not hits, hits


@pytest.mark.spark
class TestPlanShape:
    def test_filter_pushdown_reaches_scan(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        plan = (
            df.filter(F.col("l_orderkey") == 42)
            .select("l_orderkey", "l_quantity")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)" in plan
        assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan

    def test_decode_prunes_page_columns(self, spark):
        """decode_nodes over a wide pages table must only read url+html."""
        import pandas as pd

        from osm_pbf_convert_spark.sources.pbf import decode_nodes

        pages = spark.createDataFrame(
            pd.DataFrame({"url": ["u"], "html": [b""], "text": ["t" * 100], "lang": ["en"]})
        )
        plan = decode_nodes(pages)._jdf.queryExecution().optimizedPlan().toString()
        assert "text" not in plan and "lang" not in plan

    def test_tag_dict_broadcasts(self, spark):
        from osm_pbf_convert_spark.operators.tags import TagDictionary

        td = TagDictionary(
            {"KeyCodes": {"name": 1}, "NodeTagCodes": [], "WayTagCodes": [],
             "TagCodes": [{"Key": "a", "Value": "b", "TagId": 1}], "KeyStopList": []}
        )
        df = spark.createDataFrame([(1, {"a": "b"})], schema="id bigint, tags map<string,string>")
        plan = td.encode(spark, df, "node")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 3  # all 3 dict levels broadcast

    def test_knn_join_is_equijoin_not_nlj(self, spark):
        import pandas as pd

        from osm_pbf_convert_spark.operators.spatial import knn_join

        pts = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "ilat": [10, 20], "ilon": [10, 20]})
        )
        qs = spark.createDataFrame(pd.DataFrame({"query_id": [1], "ilat": [15], "ilon": [15]}))
        plan = knn_join(pts, qs, k=1, z=4)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_pyramid_rollups_read_cache(self, spark, sf_dir):
        """tile_pyramid scans the input once: the base aggregate is
        persisted and every coarser level reads InMemoryTableScan, never
        the input relation."""
        from osm_pbf_convert_spark import queries as Q

        df = Q.q_tile_pyramid(spark, sf_dir)  # max_z=8, min_z=4 -> 5 levels
        plan = df._jdf.queryExecution().executedPlan().toString()
        # base branch + 4 rollup branches all read the cached base
        assert plan.count("InMemoryTableScan") >= 5
