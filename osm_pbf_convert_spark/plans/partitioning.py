"""Spatial partitioning: the Spark-native replacement for the reference's
adaptive KD-tree (`SpatialIndex.cs:25-191`) + external Morton sort
(`NodesIndexBlobProcessor.cs:36-241`) + spatial block store
(`SpatialBlock.cs:48-537`).

- ``spatial_sort`` / ``spatial_repartition``: ``repartitionByRange`` on the
  Morton cell. Spark's range partitioner samples the key distribution --
  exactly the reference's quickselect-median splits, done by the shuffle
  machinery with spill (the reference's 10M-key runs + 4-way cascaded
  merges are an external merge sort, which IS Spark's shuffle sort).
- ``salt_hot_cells``: explicit skew handling for web-scale inputs where a
  few cells (cities) dominate (SURVEY.md §4 lists this as the one physical
  decision Catalyst cannot make alone). Hot cells get a salt column so a
  downstream repartition/groupBy spreads them across ``salt_buckets``
  reducers; AQE's skew-join split covers the join side.
- ``write_spatial_table``: partitioned-Parquet leaf layout keyed by a
  zoom-z tile prefix -- the analog of KD leaf files, with Parquet
  row-group min/max stats standing in for the reference's 4KB sparse
  block indexes (`NodesIndex.cs:113-133`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pbf_convert_spark.functions.cells import morton_cell_col, tile_col


def with_cell(df: DataFrame, ilat: str = "ilat", ilon: str = "ilon") -> DataFrame:
    return df.withColumn("cell", morton_cell_col(F.col(ilat), F.col(ilon)))


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Scale-adaptive input fan-out for per-row-HEAVY stages (guide §2.5,
    "input skew: one huge unsplittable file ... repartition immediately
    after the read").

    A small table scanned as fewer splits than the cluster has cores runs
    its entire map side (shingle hashing, Arrow passes, regex scans) on
    those few cores -- measured at bench scale: the 594 KB documents table
    plans ONE split under a 1 MB ``openCostInBytes`` floor, so every
    signature stage ran single-threaded on a 32-core box (md5 minhash
    5.6 s -> 2.5 s from this alone). Repartitioning costs one exchange of
    the RAW rows (cheap: raw text, not exploded shingles).

    Scale-adaptive by construction: fires only when the planned scan
    parallelism is BELOW ``defaultParallelism`` -- a 100 TB table already
    scans as tens of thousands of splits and passes through untouched, so
    this is never a cap, only a floor. Hash-partitions on ``key`` when
    given (deterministic under retries, no sort-before-repartition pass);
    round-robin otherwise.

    The partition-count probe (``getNumPartitions`` on the planned RDD,
    metadata only) plans the scan on the driver (~0.1 s); it is memoized per
    semantic plan so repeated constructions of the same query pay it
    once per session. A memo hit can go stale only if the SAME plan's
    underlying files change mid-session, and then only the fan-out
    decision is stale -- never results.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        memo_key = (id(df.sparkSession), df.semanticHash(), target)
        n = _FAN_OUT_MEMO.get(memo_key)
        if n is None:
            n = df.rdd.getNumPartitions()
            _FAN_OUT_MEMO[memo_key] = n
    except Exception:  # non-queryable plan (e.g. streaming): leave as-is
        return df
    if n >= target:
        return df
    return df.repartition(target, F.col(key)) if key else df.repartition(target)


_FAN_OUT_MEMO: dict = {}


def spatial_sort(df: DataFrame) -> DataFrame:
    """Globally order by Morton cell (reference entry point 2: nodes-index).
    Range shuffle + per-partition sort; spill handled by Spark."""
    d = df if "cell" in df.columns else with_cell(df)
    return d.sort("cell")


def spatial_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Range-partition by cell WITHOUT a per-partition sort -- the KD-tree
    leaf assignment. Neighboring cells land in the same partition (Z-order
    locality), so downstream per-partition spatial ops stay local."""
    d = df if "cell" in df.columns else with_cell(df)
    return d.repartitionByRange(num_partitions, "cell")


def hot_cells(df: DataFrame, z: int, threshold: int) -> DataFrame:
    """Tiles (at zoom z) whose row count exceeds threshold -- the skew set.
    One cheap aggregate; at 100 TB run it on a sample or reuse the tile
    pyramid base."""
    d = df if "cell" in df.columns else with_cell(df)
    return (
        d.groupBy(tile_col(F.col("cell"), z).alias("tile"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .select("tile")
    )


def salt_hot_cells(
    df: DataFrame, z: int, threshold: int, salt_buckets: int = 16
) -> DataFrame:
    """Add ``salt`` (0 for cold rows, hash-spread for rows in hot tiles).

    Downstream: ``repartition("tile", "salt")`` or group on (tile, salt)
    with a second cold-side merge -- a hot city tile fans out over
    ``salt_buckets`` reducers instead of one straggler.
    """
    d = df if "cell" in df.columns else with_cell(df)
    d = d.withColumn("tile", tile_col(F.col("cell"), z))
    hot = hot_cells(df, z, threshold).withColumn("is_hot", F.lit(True))
    joined = d.join(F.broadcast(hot), "tile", "left")
    return joined.withColumn(
        "salt",
        F.when(
            F.col("is_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col("cell"), F.lit(7)), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop("is_hot")


def write_spatial_table(df: DataFrame, path: str, z: int = 6) -> None:
    """Leaf layout: Parquet partitioned by zoom-z tile, rows sorted by cell
    within files (sortWithinPartitions -> Parquet row-group min/max on cell
    become the sparse index)."""
    d = df if "cell" in df.columns else with_cell(df)
    (
        d.withColumn("tile", tile_col(F.col("cell"), z))
        .repartition("tile")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .partitionBy("tile")
        .parquet(path)
    )


def write_bucketed_nodes(
    df: DataFrame, table: str, buckets: int = 64, id_col: str = "id"
) -> None:
    """Persist nodes as a bucketed+sorted table on the join key -- the
    durable analog of the reference's clustered node store
    (`NodesIndex.cs`: delta-coded blocks clustered by node id + sparse
    index). Every future ways⋈nodes run against this table skips the
    nodes-side shuffle AND sort: Catalyst sees the bucketing and plans a
    one-sided exchange only. Worth it when the node table is joined many
    times (the reference's exact access pattern)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, id_col)
        .sortBy(id_col)
        .format("parquet")
        .saveAsTable(table)
    )
