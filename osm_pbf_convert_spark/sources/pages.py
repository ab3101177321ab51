"""Deterministic Common-Crawl-style pages synthesizer.

Builds the engine's primary input shape (BASELINE.json input_hint):
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` where ``html`` carries PBF-style framed blob payloads.

Content derives deterministically from the driver's lineitem table
(seeded, no wall-clock, no external data): every lineitem row becomes one
dense node; every order becomes one way referencing its order's nodes;
orders are packed ``orders_per_page`` to a page. Coordinates are a fixed
modular mix of the orderkey/linenumber so Spark and DuckDB can re-derive
them exactly (see sql_fixtures.ILAT_SQL).

The synthesis itself runs distributed (groupBy page -> mapInArrow encode),
so bench setup scales with the input too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pbf_convert_spark.sources.pbf_encoder import (
    DenseNodesSpec,
    WaySpec,
    build_payload,
    encode_primitive_block,
    frame_blob,
)

# node id = orderkey * 8 + linenumber; coords = modular mix (must match
# sql_fixtures.ILAT_SQL / ILON_SQL exactly)
_A_LAT, _B_LAT = 2654435761, 0
_A_LON, _B_LON = 2246822519, 1013904223
_MOD = 4294967296


def node_id_np(okey: np.ndarray, lineno: np.ndarray) -> np.ndarray:
    return okey * 8 + lineno


def ilat_np(nid: np.ndarray) -> np.ndarray:
    return ((nid * _A_LAT + _B_LAT) % _MOD) - 2**31


def ilon_np(nid: np.ndarray) -> np.ndarray:
    return ((nid * _A_LON + _B_LON) % _MOD) - 2**31


def synth_pages(
    spark: SparkSession,
    sf_dir: str,
    orders_per_page: int = 20,
    granularity: int = 1,
    compress_every: int = 3,
    replicate: int = 1,
) -> DataFrame:
    """lineitem -> pages DataFrame (not yet written).

    Each page's html = one frame of dense nodes + one frame of ways (one
    way per order, refs = that order's node ids in linenumber order).
    Every ``compress_every``-th page is zlib-compressed (both paths stay
    exercised).

    ``replicate > 1`` unions K disjoint copies (orderkeys offset by
    k * 2^25, so node ids, pages, and coordinates are all distinct) --
    used to scale the bench input for compute-bound scaling studies.
    """
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").cast("long").alias("lineno"),
        )
    )
    if replicate > 1:
        base = li
        for k in range(1, replicate):
            li = li.unionByName(
                base.select((F.col("okey") + F.lit(k * (1 << 25))).alias("okey"), "lineno")
            )
    grouped = (
        li.withColumn("page", (F.col("okey") / F.lit(orders_per_page)).cast("long"))
        .groupBy("page")
        .agg(F.sort_array(F.collect_list(F.struct("okey", "lineno"))).alias("items"))
    )

    out_schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    langs = ["en", "de", "fr", "uk", "ja"]

    def encode_pages(batches):
        for batch in batches:
            pages = batch.column("page").to_numpy(zero_copy_only=False)
            items = batch.column("items").to_pylist()
            urls, tss, htmls, texts, langs_out = [], [], [], [], []
            for pg, its in zip(pages, items):
                okeys = np.array([x["okey"] for x in its], dtype=np.int64)
                linenos = np.array([x["lineno"] for x in its], dtype=np.int64)
                nids = node_id_np(okeys, linenos)
                ila = ilat_np(nids)
                ilo = ilon_np(nids)
                # aim at the CENTER of each int32 quantization bucket
                # (trunc-toward-zero buckets: [i, i+1) for i>=0, (i-1, i]
                # for i<0) so decode -> degrees -> re-quantize reproduces
                # ilat/ilon exactly. granularity=1 (1e-9 deg units) keeps
                # the raw grid ~84x finer than a quantization quantum.
                center_lat = ila + np.where(ila >= 0, 0.25, -0.25)
                center_lon = ilo + np.where(ilo >= 0, 0.25, -0.25)
                deg_lat = center_lat * 180.0 / 2147483647
                deg_lon = center_lon * 180.0 / 2147483647
                raw_lat = np.round(deg_lat * 1e9 / granularity).astype(np.int64)
                raw_lon = np.round(deg_lon * 1e9 / granularity).astype(np.int64)
                tags = [
                    {"amenity": "cafe"} if (int(n) % 10) == 0 else {}
                    for n in nids
                ]
                dense = DenseNodesSpec(
                    ids=nids.tolist(),
                    lats_raw=raw_lat.tolist(),
                    lons_raw=raw_lon.tolist(),
                    tags=tags,
                )
                ways = []
                for ok in np.unique(okeys):
                    sel = okeys == ok
                    refs = nids[sel][np.argsort(linenos[sel])]
                    ways.append(
                        WaySpec(
                            id=int(ok),
                            refs=refs.tolist(),
                            tags={"highway": "residential"} if ok % 2 == 0 else {"building": "yes"},
                        )
                    )
                compress = (int(pg) % compress_every) == 0
                payload = build_payload(
                    [
                        frame_blob(encode_primitive_block(dense=dense, granularity=granularity), compress=compress),
                        frame_blob(encode_primitive_block(ways=ways, granularity=granularity), compress=compress),
                    ]
                )
                urls.append(f"https://example.org/p/{int(pg):010d}")
                tss.append(1577836800_000000 + int(pg) * 1_000_000)  # 2020-01-01 + page sec
                htmls.append(payload)
                texts.append(f"document body {int(pg)} ✓ " + "x" * (int(pg) % 64))
                langs_out.append(langs[int(pg) % len(langs)])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array(texts, pa.string()),
                    pa.array(langs_out, pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    return grouped.mapInArrow(encode_pages, out_schema)


def write_pages(spark: SparkSession, sf_dir: str, out_path: str, **kw) -> str:
    synth_pages(spark, sf_dir, **kw).write.mode("overwrite").parquet(out_path)
    return out_path
