"""Morton cell / tile / heat-map grid: numpy vs C#-loop emulation vs Spark
Column expressions vs DuckDB SQL -- all four must agree bit-for-bit."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from osm_pbf_convert_spark.functions import cells as C


def csharp_block_index(latitude: int, longitude: int) -> int:
    """Direct emulation of NodesIndexBlobProcessor.CalcBlockIndex:259-279."""
    res, mask = 0, 1
    lat = ((latitude + (1 << 64)) if latitude < 0 else latitude) << 1 & 0xFFFFFFFFFFFFFFFF
    lon = (longitude + (1 << 64)) if longitude < 0 else longitude
    for _ in range(32):
        res |= lon & mask
        lon = (lon << 1) & 0xFFFFFFFFFFFFFFFF
        mask = (mask << 1) & 0xFFFFFFFFFFFFFFFF
        res |= lat & mask
        lat = (lat << 1) & 0xFFFFFFFFFFFFFFFF
        mask = (mask << 1) & 0xFFFFFFFFFFFFFFFF
    return res


KNOWN = [
    (0, 0),
    (1, 0),
    (0, 1),
    (-1, -1),
    (2147483647, 2147483647),
    (-2147483648, -2147483648),
    (12345678, -87654321),
]


class TestMortonNumpy:
    @pytest.mark.parametrize("ilat,ilon", KNOWN)
    def test_against_csharp_loop(self, ilat, ilon):
        got = int(C.morton_cell_np(np.array([ilat]), np.array([ilon]))[0])
        assert got & 0xFFFFFFFFFFFFFFFF == csharp_block_index(ilat, ilon)

    @settings(max_examples=200)
    @given(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
    )
    def test_property(self, ilat, ilon):
        got = int(C.morton_cell_np(np.array([ilat]), np.array([ilon]))[0])
        assert got & 0xFFFFFFFFFFFFFFFF == csharp_block_index(ilat, ilon)

    def test_decode_roundtrip(self):
        rng = np.random.default_rng(1)
        ilat = rng.integers(-(2**31), 2**31, 5000).astype(np.int32)
        ilon = rng.integers(-(2**31), 2**31, 5000).astype(np.int32)
        la, lo = C.morton_decode_np(C.morton_cell_np(ilat, ilon))
        assert (la == ilat).all() and (lo == ilon).all()

    def test_zorder_locality(self):
        # nearby points share tile prefixes: same ilat/ilon high bits -> same z-tile
        base_lat, base_lon = 573000000, 137000000
        cells = C.morton_cell_np(
            np.array([base_lat, base_lat + 3]), np.array([base_lon, base_lon + 3])
        )
        assert C.tile_np(cells, 10)[0] == C.tile_np(cells, 10)[1]


class TestDuckDBParity:
    def test_sql_forms_match_numpy(self):
        rng = np.random.default_rng(2)
        ilat = rng.integers(-(2**31), 2**31, 1000).astype(np.int32)
        ilon = rng.integers(-(2**31), 2**31, 1000).astype(np.int32)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"ilat": ilat, "ilon": ilon}))
        cell_sql = C.morton_cell_sql("ilat", "ilon")
        q = (
            f"select {cell_sql} cell, {C.tile_sql(cell_sql, 8)} t8, "
            f"{C.heat_row_sql('ilat')} hr, {C.heat_col_sql('ilon')} hc from pts"
        )
        res = con.execute(q).fetchnumpy()
        cells = C.morton_cell_np(ilat, ilon)
        hr, hc = C.heat_cell_np(ilat, ilon)
        assert (res["cell"] == cells).all()
        assert (res["t8"] == C.tile_np(cells, 8)).all()
        assert (res["hr"] == hr).all() and (res["hc"] == hc).all()


class TestHeatGrid:
    def test_grid_bounds(self):
        rng = np.random.default_rng(3)
        ilat = rng.integers(-(2**31), 2**31, 10000).astype(np.int32)
        ilon = rng.integers(-(2**31), 2**31, 10000).astype(np.int32)
        r, c = C.heat_cell_np(ilat, ilon)
        assert r.min() >= 0 and r.max() < 16384
        assert c.min() >= 0 and c.max() < 32768

    def test_csharp_wraparound(self):
        # ilat > 0 wraps in C# int32 addition before the uint cast
        for ilat in (1, 2147483647, -2147483648, 0, -1):
            r, _ = C.heat_cell_np(np.array([ilat]), np.array([0]))
            v = (ilat + 2147483647) & 0xFFFFFFFF
            assert int(r[0]) == v >> 18


@pytest.mark.spark
class TestSparkParity:
    def test_column_forms_match_numpy(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        rng = np.random.default_rng(4)
        n = 20000
        pdf = pd.DataFrame(
            {
                "ilat": rng.integers(-(2**31), 2**31, n).astype(np.int32),
                "ilon": rng.integers(-(2**31), 2**31, n).astype(np.int32),
            }
        )
        df = spark.createDataFrame(pdf)
        out = (
            df.select(
                "ilat",
                "ilon",
                C.morton_cell_col(F.col("ilat"), F.col("ilon")).alias("cell"),
                C.heat_row_col(F.col("ilat")).alias("hr"),
                C.heat_col_col(F.col("ilon")).alias("hc"),
            )
            .withColumn("t12", C.tile_col(F.col("cell"), 12))
            .toPandas()
            .sort_values(["ilat", "ilon"])
        )
        ref = pdf.sort_values(["ilat", "ilon"])
        cells = C.morton_cell_np(ref["ilat"].values, ref["ilon"].values)
        hr, hc = C.heat_cell_np(ref["ilat"].values, ref["ilon"].values)
        assert (out["cell"].values == cells).all()
        assert (out["t12"].values == C.tile_np(cells, 12)).all()
        assert (out["hr"].values == hr).all() and (out["hc"].values == hc).all()

    def test_quantize_col_truncation(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        degs = pd.DataFrame({"d": [0.0, 47.5, -47.5, 179.9999999, -179.9999999, 1e-9, -1e-9]})
        df = spark.createDataFrame(degs)
        got = df.select(C.quantize_col(F.col("d")).alias("i")).toPandas()["i"].values
        assert (got == C.quantize_np(degs["d"].values)).all()
