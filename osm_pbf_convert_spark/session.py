"""SparkSession builder with the engine's scale-oriented defaults.

Single place for configuration so tests, bench, and the driver contract all
run the same way. Defaults are tuned for local[N] testing but chosen to be
the right *shape* for a 1000-executor cluster:

- AQE on (runtime coalesce + skew-join splitting -- the skew story for
  hot spatial cells, SURVEY.md §4);
- Arrow execution on with a capped batch size (decode UDF memory bound);
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by --conf (or left to AQE's coalescing from a high initial);
- broadcast threshold bumped: polygon sets / tag dictionaries are small
  dimension tables that must broadcast, never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm-pbf-convert-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    executors: int | None = None,
    executor_cores: int = 2,
    executor_mem_mb: int = 8192,
) -> SparkSession:
    """``executors=E`` switches to ``local-cluster[E, executor_cores,
    executor_mem_mb]``: E real executor JVMs (own heap, own GC, own Python
    workers) on this box -- the faithful miniature of adding executors to a
    cluster, used for the N -> 4N scaling evidence. Plain ``local[cores]``
    otherwise."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if executors is not None:
        master = f"local-cluster[{executors},{executor_cores},{executor_mem_mb}]"
        cores = executors * executor_cores
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep the AUTO threshold at the stock 10MB: every dimension table
        # that must broadcast (polygon index, tag dictionary, query sets)
        # carries an explicit broadcast() hint, which ignores this threshold
        # -- a high auto threshold instead lets a compressed FACT side (e.g.
        # the nodes table in ways⋈nodes) sneak under it and build a
        # hundreds-of-MB hash relation on every executor (OOM on small
        # executors, wrong plan at 100 TB)
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b.getOrCreate()
