"""Custom stateful streaming operator: per-user session windows via
``applyInPandasWithState``.

A new engine capability (the reference has no streaming at all): sessions
close after ``gap_seconds`` of inactivity per user; state = the open
session (start, last-seen, count); a processing-time timeout flushes idle
sessions. The batch twin of this logic lives in
``queries.q_sessionization`` (lag + running-sum windows, DuckDB-oracled),
so the stateful operator's semantics are cross-checked against an exact
batch computation.

Scale shape: state is keyed by user_id -- partitioned across executors by
the state-store; memory is bounded by open sessions only (closed sessions
are emitted and dropped).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, t_start bigint, t_end bigint, n_events bigint"
STATE_SCHEMA = "t_start bigint, t_end bigint, n_events bigint"


def _session_fn(gap_seconds: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            (t_start, t_end, n) = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "t_start": t_start, "t_end": t_end, "n_events": n}]
            )
            return
        ts = sorted(int(t) for pdf in pdfs for t in pdf["t"])
        if not ts:
            return
        if state.exists:
            t_start, t_end, n = state.get
        else:
            t_start, t_end, n = ts[0], ts[0], 0
        closed = []
        for t in ts:
            if t - t_end > gap_seconds and n > 0:
                closed.append({"user_id": user_id, "t_start": t_start, "t_end": t_end, "n_events": n})
                t_start, n = t, 0
            t_end = max(t_end, t)
            n += 1
        state.update((t_start, t_end, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """File-source stream -> closed sessions (open sessions flush on
    timeout or at stream end via the final empty microbatch)."""
    stream = (
        spark.readStream.schema(schema).parquet(events_dir)
        .selectExpr("user_id", "CAST(FLOOR(unix_timestamp(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t")
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
