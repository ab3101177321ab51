"""Distributed connected components over near-duplicate pair graphs.

The dedup family (operators/dedup.py) emits PAIRS (a, b) of near-duplicate
documents; a training-data pipeline needs GROUPS -- "keep one document per
duplicate cluster" is a connected-components problem over the pair graph
(a ~ b and b ~ c must collapse into ONE group even though (a, c) was never
emitted as a pair).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014) -- the
standard shuffle-bounded CC for massive graphs:

- large-star: every node connects its LARGER neighbors to the minimum of
  its closed neighborhood;
- small-star: every node connects its smaller-or-equal neighbors (and
  itself) to that minimum.

Each operation is one groupBy + one join on the node id (two shuffles);
the pair converges in O(log^2 n) rounds worst-case. Measured law on the
adversarial path graph (tools/scale_rehearsal.py --cc-adversarial):
round count ~= ceil(log2(diameter)) + 1 -- 18 rounds for a 100,000-edge
chain, 23 rounds for a 4,000,000-edge chain (both measured) -- so the
default ``max_iter=25`` covers any diameter up to ~2^23;
near-dup components in practice are shallow (a handful of rounds). This
beats naive label propagation, whose round count follows the diameter
itself: the same 100k chain would need 100k propagation rounds.

Scale notes (100 TB):
- Edges are deduplicated every half-round, so the working set shrinks
  monotonically toward one star per component.
- Each round's result is checkpointed to truncate lineage -- otherwise
  the plan doubles per round and the driver OOMs on plan serialization
  long before data is the problem. Local mode uses localCheckpoint();
  on a cluster set a reliable checkpoint dir (spark.sparkContext
  .setCheckpointDir on HDFS/S3) and pass use_local_checkpoint=False.
- Convergence is detected with an order-independent edge-set checksum
  (count + sum of xxhash64(u, v)) -- one tiny all-to-driver aggregate per
  round, never a collect of the edges themselves.

No reference counterpart (the reference is a spatial engine); this is a
training-data-pipeline extension, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """(u, v) with u = smaller endpoint, self-loops dropped, deduped."""
    return (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor v of u to
    m = min(N(u) + {u}).

    Round 8 (guide §2.4 "window functions partitioned by the same key as
    a preceding aggregation do not need a second shuffle"): the
    per-center minimum is a window MIN over the same ``u`` partitioning
    the old groupBy+self-join pair re-shuffled for -- one exchange per
    star instead of two, same output."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("mn", F.min("v").over(w))
        .filter(F.col("v") > F.col("u"))
        .select(F.least("u", "mn").alias("u"), F.col("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Directed so u >= v; connect every small neighbor (and u itself) to
    m = min(N_small(u) + {u}). Window-min form, one exchange (see
    ``_large_star``); the (m, u) self rows ride the same windowed frame,
    deduped by the final distinct."""
    d = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    w = Window.partitionBy("u")
    wd = d.withColumn("m", F.min("v").over(w))
    out = wd.select(F.col("m").alias("u"), F.col("v")).union(
        wd.select(F.col("m").alias("u"), F.col("u").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple:
    # decimal(38,0) sum: exact and overflow-free under ANSI mode for any
    # realistic edge count (long sums of 64-bit hashes would overflow)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    use_local_checkpoint: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Labels (id, component) for every node appearing in ``pairs``;
    component = the minimum node id of its connected component.

    ``max_iter`` bounds the star rounds (O(log^2 n) needed; 25 covers any
    graph that fits in a cluster). Raises if not converged -- a silent
    partial labeling would merge dedup groups incorrectly.

    ``stats``: pass a dict to receive {"rounds": star rounds executed,
    "final_edges": fixpoint edge count} -- the adversarial-graph
    rehearsal gates on the round count (tools/scale_rehearsal.py).
    """
    def _ckpt(df: DataFrame) -> DataFrame:
        # local: executor-storage blocks, zero write latency, but blocks
        # stay pinned for the run -- at deep-graph round counts that
        # evicted executors (measured, 20M edges x 23 rounds), which is
        # why use_local_checkpoint=False + setCheckpointDir is the
        # cluster deployment mode (measured equal wall at the adversarial
        # rehearsal: an eager reliable checkpoint materializes once).
        return (
            df.localCheckpoint(eager=True)
            if use_local_checkpoint
            else df.checkpoint(eager=True)
        )

    edges = _ckpt(_canonical_edges(pairs, a_col, b_col))
    prev = _checksum(edges)
    rounds = 0
    for _ in range(max_iter):
        nxt = _ckpt(_small_star(_large_star(edges)))
        cur = _checksum(nxt)
        edges = nxt
        rounds += 1
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
        stats["final_edges"] = prev[0]
    # fixpoint edges form stars: every non-root points at its component
    # minimum; roots (the minima) label themselves
    nonroot = edges.select(F.col("v").alias("id"), F.col("u").alias("component"))
    roots = edges.select(F.col("u").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return nonroot.union(roots)


def near_dup_groups(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", id_name: str = "doc_id",
    stats: dict | None = None, use_local_checkpoint: bool = True,
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, component) labels over a near-dup pair stream -- the
    grouping step between pair emission (minhash/simhash/ngram/embedding
    operators) and survivor selection.

    ``use_local_checkpoint=False`` switches the per-round checkpoints to
    the RELIABLE checkpoint dir (``spark.sparkContext.setCheckpointDir``
    first): local checkpoints pin every round's edge set in executor
    storage for the run's lifetime, which at deep-graph round counts
    (log2(diameter) rounds x full edge set) evicts executors -- measured
    at the 20M-edge adversarial rehearsal; disk checkpoints hold each
    round on stable storage instead."""
    return connected_components(
        pairs, a_col, b_col, stats=stats,
        use_local_checkpoint=use_local_checkpoint, max_iter=max_iter,
    ).select(F.col("id").alias(id_name), "component")


def dedup_survivors(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One survivor per duplicate component: the LONGEST text (ties -> min
    id) -- the usual "keep the most complete copy" training-data policy.

    Returns (component, survivor_id, n_docs). Documents absent from
    ``labels`` are singletons and survive by definition; callers drop dups
    with an anti-join of (labels minus survivors) against the corpus.
    One window over the component key -- a single shuffle after the join.
    """
    from pyspark.sql import Window

    j = labels.join(docs.select(id_col, F.length(text_col).alias("_len")), id_col)
    w = Window.partitionBy("component")
    ranked = j.select(
        "component",
        F.col(id_col),
        F.row_number()
        .over(w.orderBy(F.col("_len").desc(), F.col(id_col)))
        .alias("_rn"),
        F.count(F.lit(1)).over(w).alias("n_docs"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "component", F.col(id_col).alias("survivor_id"), "n_docs"
    )
