"""Deduplication operators for large-scale text corpora.

All shapes are shuffle-conscious:

- exact: hash-groupBy on a content digest -- one shuffle, map-side partial
  agg; survivor = min(doc_id) for determinism.
- MinHash + LSH: signature stage = a zero-shuffle Arrow Karp-Rabin
  window pass (production default "rolling", operators/rolling.py;
  JVM flavors: explode -> per-shingle hash -> ONE groupBy with H min()
  aggregates) -> band keys -> bucket self-join emits candidate pairs
  -> optional exact Jaccard verify. Band/bucket join is equi-join on the
  band hash: broadcast-free, AQE handles hot buckets; oversized
  boilerplate buckets can be capped (max_bucket_size).
- SimHash: 64-bit signature from token hashes; bit-majority computed with
  64 JVM-side conditional sums -- no Python in the hot path.
- n-gram Jaccard: candidate pairs from shared shingles (inverted index),
  Jaccard = |common| / (|a|+|b|-|common|).
- embedding cosine near-dup: random-hyperplane LSH buckets, exact cosine
  inside buckets.

No reference counterpart (the reference is a spatial engine); these are the
training-data-pipeline extensions the engine needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct content digest."""
    digest = F.md5(F.col(content_col).cast("binary")).alias("_digest")
    w = df.select(F.col(id_col), digest)
    keep = w.groupBy("_digest").agg(F.min(id_col).alias(id_col))
    # merge hint: `keep` is corpus-sized (one row per distinct digest) but
    # DERIVED, so Catalyst's size estimate undershoots and auto-broadcasts
    # it -- the exit-52 OOM class the 16x rehearsal exposed in the LSH
    # joins. A fact-sized side must shuffle, never broadcast.
    return df.join(keep.select(id_col).hint("merge"), id_col, "left_semi")


def shingles_col(text, k: int = 5):
    """Character k-gram shingle array (distinct) of the lower-cased text.
    JVM-only: substring via transform over an index sequence."""
    t = F.lower(text)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n)
    return F.when(
        n > 0, F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))
    ).otherwise(F.array().cast("array<string>"))


MERSENNE31 = (1 << 31) - 1


def minhash_coeffs(i: int) -> tuple[int, int]:
    """Deterministic Carter-Wegman coefficients (a_i, b_i) in Z_p,
    p = 2^31-1, a_i != 0 -- shared by the Spark md5-variant minhash and
    its generated DuckDB oracle SQL."""
    a = (2654435761 * (i + 1) + 0x9E3779B9) % MERSENNE31 or 1
    b = (40503 * (i + 7) * 2654435789 + i) % MERSENNE31
    return a, b


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_k: int = 5, hash_fn: str = "rolling",
) -> DataFrame:
    """(id, sig array[num_hashes]) -- min over shingle hashes per seed.
    One explode + one groupBy with num_hashes min() aggregates (JVM
    flavors), or a zero-shuffle Arrow window-hash pass ("rolling").

    hash_fn: "rolling" (no-substring Karp-Rabin window hashes + affine
    mod-2^64 permutation family -- the scale flavor, see
    ``_minhash_signatures_rolling``), "xxhash64" (JVM default) or "md5"
    (the DuckDB-replayable oracle variant): ONE md5 per shingle supplies
    a 60-bit base hash x (first 15 hex chars), and the seed family is
    Carter-Wegman universal hashing h_i = (a_i*x + b_i) mod (2^31-1) --
    textbook-valid for minhash, pure long arithmetic with no overflow
    under ANSI mode (a_i, x < 2^31), and replayed bit-identically in SQL.

    Round 8: the md5 flavor is computed like the rolling one -- a
    zero-shuffle Arrow pass (``operators/md5win.py``: numpy window
    extraction, one ``hashlib.md5`` per globally unique window, vectorized
    Carter-Wegman mins) replacing explode -> per-shingle md5 expression ->
    groupBy with ``num_hashes`` min() aggregates. Same values bit-for-bit
    (oracle-gated); ``hash_fn="md5_jvm"`` keeps the old expression chain
    for A/B tests. Crucially the JVM flavors' mins aggregate over LONGS:
    min(string) has no fixed-width agg buffer and silently degrades
    HashAggregate to SortAggregate (measured 3x slower at sf0.1)."""
    if hash_fn == "rolling":
        return _minhash_signatures_rolling(df, id_col, text_col, num_hashes, shingle_k)
    if hash_fn == "md5":
        return _minhash_signatures_md5(df, id_col, text_col, num_hashes, shingle_k)
    if hash_fn == "md5_jvm":
        hash_fn = "md5"
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_k)).alias("sh")
    )
    if hash_fn == "xxhash64":
        # hash the STRING once; derive the permutation family by re-hashing
        # the fixed-width long (8-byte xxhash64 is ~free next to string
        # hashing; affine mod-2^64 mixing would be cheaper still but ANSI
        # mode rejects the intentional overflow)
        sh = sh.withColumn("h0", F.xxhash64("sh"))
        aggs = [
            F.min(F.xxhash64(F.col("h0"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
        ]
    elif hash_fn == "md5":
        sh = sh.withColumn(
            "x",
            F.conv(F.substring(F.md5(F.col("sh").cast("binary")), 1, 15), 16, 10).cast("long")
            % F.lit(MERSENNE31),
        )
        aggs = [
            F.min(
                (F.lit(minhash_coeffs(i)[0]) * F.col("x") + F.lit(minhash_coeffs(i)[1]))
                % F.lit(MERSENNE31)
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _kr_hash_arrays(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shs array<long>): each doc's unique Karp-Rabin window
    hashes (operators/rolling.py) -- the substring-free stand-in for
    ``shingles_col`` in exact-jaccard verification (set semantics are
    identical up to ~|S|^2/2^64 within-doc collisions)."""
    import numpy as np
    import pandas as pd

    from osm_pbf_convert_spark.operators.rolling import batch_window_hashes

    def batches(it):
        for pdf in it:
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "shs": [u.astype(np.int64) for u in batch_window_hashes(pdf[text_col], k)],
            })

    from osm_pbf_convert_spark.plans.partitioning import fan_out

    id_type = df.schema[id_col].dataType.simpleString()
    return fan_out(df.select(id_col, text_col), key=id_col).mapInPandas(
        batches, schema=f"{id_col} {id_type}, shs array<long>"
    )


def _minhash_signatures_rolling(df: DataFrame, id_col: str, text_col: str,
                                num_hashes: int, shingle_k: int,
                                bands: int | None = None) -> DataFrame:
    """The no-substring signature stage (``hash_fn="rolling"``): one
    Karp-Rabin window pass per Arrow batch (operators/rolling.py)
    replaces explode + hash-per-shingle + groupBy-min ENTIRELY -- a
    narrow map with ZERO shuffle, where the JVM flavors shuffle every
    (doc, shingle) row into the aggregate. sig_i = min over the doc's
    unique window hashes w of A_i*w + B_i mod 2^64 (odd A_i: a
    bijection on Z_2^64, a textbook permutation family). Same output
    shape (id, sig array<long>); docs with no window (shorter than k)
    emit NO row, matching the JVM flavors where empty-shingle docs
    vanish at the explode. Measured vs the JVM stage at 50k docs in
    BENCH/NOTES.md.

    Peak memory is bounded regardless of document length: the window x
    seed product matrix is chunked with a running minimum
    (``rolling.segment_affine_min``), so a single multi-MB document
    costs the same ~32 MB transient as a batch of tweets.

    ``bands``: when given, additionally emits ``bnds array<long>`` --
    the per-band Horner bucket keys (``rolling.band_buckets``) computed
    in the SAME Arrow pass, so the LSH banding stage adds no second
    scan and stays DuckDB-replayable."""
    import numpy as np
    import pandas as pd

    from osm_pbf_convert_spark.operators import rolling

    A, B = rolling.affine_family(num_hashes)

    def batches(it):
        for pdf in it:
            flat, off = rolling.batch_window_hash_segments(pdf[text_col], shingle_k)
            nonempty = np.nonzero(np.diff(off) > 0)[0]
            if not nonempty.size:
                continue  # parity with JVM flavors: no shingles -> no row
            sig = rolling.segment_affine_min(flat, off, A, B)[nonempty]
            out = {
                id_col: pdf[id_col].to_numpy()[nonempty],
                "sig": list(sig.astype(np.int64)),
            }
            if bands is not None:
                out["bnds"] = list(
                    rolling.band_buckets(sig, bands).astype(np.int64)
                )
            yield pd.DataFrame(out)

    from osm_pbf_convert_spark.plans.partitioning import fan_out

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, sig array<long>"
    if bands is not None:
        schema += ", bnds array<long>"
    return fan_out(df.select(id_col, text_col), key=id_col).mapInPandas(
        batches, schema=schema
    )


def _minhash_signatures_md5(df: DataFrame, id_col: str, text_col: str,
                            num_hashes: int, shingle_k: int) -> DataFrame:
    """The md5 oracle flavor as ONE zero-shuffle Arrow pass (round 8):
    distinct k-char window md5 digests per doc (``md5win``), 60-bit base
    hash x = first 15 hex chars, vectorized Carter-Wegman mins -- value-
    identical to the old explode -> md5 expression -> groupBy(num_hashes
    mins) chain, which shuffled every (doc, shingle) row. Docs with no
    window emit NO row (parity with the explode, where empty-shingle docs
    vanish). Input is fanned out first (``plans.partitioning.fan_out``):
    the heavy per-row work must not run on one or two scan splits."""
    import numpy as np
    import pandas as pd

    from osm_pbf_convert_spark.operators import md5win
    from osm_pbf_convert_spark.plans.partitioning import fan_out

    A = np.array([minhash_coeffs(i)[0] for i in range(num_hashes)], dtype=np.int64)
    B = np.array([minhash_coeffs(i)[1] for i in range(num_hashes)], dtype=np.int64)

    def batches(it):
        for pdf in it:
            digs, off = md5win.batch_window_md5_segments(pdf[text_col], shingle_k)
            nonempty = np.nonzero(np.diff(off) > 0)[0]
            if not nonempty.size:
                continue
            x = md5win.digests_to_x60(digs)
            sig = md5win.segment_cw_min(x, off, A, B)[nonempty]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[nonempty],
                "sig": list(sig),
            })

    id_type = df.schema[id_col].dataType.simpleString()
    return fan_out(df.select(id_col, text_col), key=id_col).mapInPandas(
        batches, schema=f"{id_col} {id_type}, sig array<long>"
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
    hash_fn: str = "rolling", max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing >= 1 LSH band.

    rows_per_band = num_hashes // bands; two docs collide in a band iff all
    its rows agree -> P(collide) = s^rows per band (s = true Jaccard).
    hash_fn as in minhash_signatures ("md5" = the DuckDB-replayable oracle
    variant; band buckets become the joined hex strings).

    ``max_bucket_size`` is the LSH-at-scale guard: band buckets holding
    more than this many docs are EXCLUDED from the self-join. Oversized
    buckets are boilerplate-band collisions (shared template shingles)
    whose pair count grows quadratically with corpus size while real
    near-dup groups stay small -- measured at 64x bench volume, 450
    buckets >64 docs carried ~1/3 of all raw candidate slots and drove
    superlinear shuffle/spill. Recall cost: only pairs colliding in NO
    small bucket are lost; each true pair has ``bands`` independent
    chances (verified zero loss on the rehearsal corpus -- see
    BENCH/NOTES.md). None (default) keeps exact banding semantics --
    callers at corpus scale should set it deliberately, not silently."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    if hash_fn == "rolling":
        # band buckets come out of the SAME zero-shuffle Arrow pass as
        # the signatures (rolling.band_buckets: 8-byte Horner keys, a
        # 10x byte win over joined-string buckets AND replayable in
        # DuckDB HUGEINT -- the production default carries the oracle)
        sig = _minhash_signatures_rolling(
            df, id_col, text_col, num_hashes, shingle_k, bands=bands
        )
        banded = sig.select(id_col, F.posexplode("bnds").alias("band", "bucket"))
        return _bucket_join_pairs(banded, id_col, max_bucket_size)
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, hash_fn)
    if hash_fn in ("md5", "md5_jvm"):
        # bucket = the band's hash values joined as a string -- band id is
        # already a separate join column, so no re-hash is needed (and
        # DuckDB replays string concatenation exactly)
        band_arr = F.array(
            *[
                F.concat_ws(
                    "|", *[F.element_at("sig", b * r + i + 1).cast("string") for i in range(r)]
                )
                for b in range(bands)
            ]
        )
    else:
        band_arr = F.array(
            *[
                F.xxhash64(
                    F.concat_ws("|", *[F.element_at("sig", b * r + i + 1).cast("string") for i in range(r)]),
                    F.lit(b),
                )
                for b in range(bands)
            ]
        )
    banded = sig.select(id_col, F.posexplode(band_arr).alias("band", "bucket"))
    return _bucket_join_pairs(banded, id_col, max_bucket_size)


def _bucket_join_pairs(banded: DataFrame, id_col: str,
                       max_bucket_size: int | None) -> DataFrame:
    """(band, bucket) self-join -> distinct (a < b) candidate pairs,
    with the optional oversized-bucket guard (see minhash_lsh_pairs)."""
    if max_bucket_size is not None:
        # window count shuffles by (band, bucket) -- the SAME key the
        # self-join below uses, so the exchange is reused, not added
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("_sz", F.count(F.lit(1)).over(w))
            .filter(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    a = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    # merge hint: both sides are the corpus-sized banded table -- the
    # compressed-columnar scan estimate can sneak a side under the
    # auto-broadcast threshold, and the row-format hash relation then
    # explodes ~100x on every executor (measured: exit-52 OOM at 16x bench
    # volume). A fact-fact self-join must shuffle, never broadcast.
    pairs = (
        a.join(b.hint("merge"), ["band", "bucket"])
        .filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.8, min_common: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share >= min_common
    shingles (inverted-index join).

    Scale guard: ``max_doc_freq`` drops shingles appearing in more than
    that many docs from CANDIDATE GENERATION only (stop-shingles produce
    O(df^2) pairs); sizes still count every shingle, so the jaccard value
    of surviving pairs is exact -- only recall on pairs related solely
    through ultra-common shingles is traded away.

    The guard defaults OFF (``None``): exact recall by default, opt in at
    call sites (the catalog passes 400; anything unbounded should) --
    silently losing recall in a dedup pipeline retains duplicates, the
    worse failure. For corpora where candidate generation is the wall,
    ``ngram_jaccard_lsh_pairs`` is the scale path."""
    if max_doc_freq is None:
        # plan-time pointer, not a data-dependent check: measuring the
        # actual shingle doc-frequency here would trigger an eager job
        # inside a lazy transformation
        import warnings

        warnings.warn(
            "ngram_jaccard_pairs without max_doc_freq generates O(df^2) "
            "candidate pairs per stop-shingle; set max_doc_freq or use "
            "ngram_jaccard_lsh_pairs on large/templated corpora",
            UserWarning,  # visible by default (ResourceWarning is filtered)
            stacklevel=2,
        )
    sh = df.select(F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_k)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    cand_sh = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("sh")
        )
        cand_sh = sh.join(rare, "sh", "left_semi")
    a = cand_sh.select(F.col(id_col).alias("a"), "sh")
    b = cand_sh.select(F.col(id_col).alias("b"), "sh")
    common = (
        a.join(b.hint("merge"), "sh").filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sa.hint("merge"), "a").join(sb.hint("merge"), "b")
        .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def ngram_jaccard_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.8,
    num_hashes: int = 64, bands: int = 16, hash_fn: str = "rolling",
    max_bucket_size: int | None = None, verify_on_hashes: bool = False,
    verify_prefilter: bool = False,
) -> DataFrame:
    """Scale path for n-gram Jaccard: MinHash-LSH candidate generation +
    EXACT Jaccard verify on the candidates.

    The inverted-index path (ngram_jaccard_pairs) generates O(df^2) pairs
    per shared shingle -- quadratic on template-heavy corpora where most
    shingles are corpus-common. LSH banding collides pairs with probability
    1-(1-s^r)^b driven by the PAIR's similarity s, independent of shingle
    document frequency; surviving jaccard values are exact (computed on the
    full shingle sets), so only recall is probabilistic. This is the shape
    that holds at 100 TB: candidates scale with true duplicates.

    ``max_bucket_size`` (see minhash_lsh_pairs) additionally guards the
    band join against boilerplate buckets, whose pair count -- and the
    shingle-array bytes the verify join ships per pair -- otherwise
    grows quadratically with corpus size (measured 9x wall at 4x volume
    without it; the exact-verify stage keeps precision unchanged, the
    cap affects recall only through pairs with no small-bucket
    collision).

    ``verify_on_hashes`` intersects 64-bit xxhash64 shingle hashes
    instead of shingle strings: the verify join must carry one shingle
    array per CANDIDATE through its second merge-join sort, so array
    bytes -- not pair count -- dominate its shuffle/spill at scale;
    long arrays halve them (measured at 64x volume). Jaccard stays
    exact up to within-doc hash collisions (~|S|^2 / 2^64 -- odds of
    one affected doc per ~10^9 docs), so this is the 100 TB recipe
    alongside ``max_bucket_size``; default False preserves bit-exact
    string-set semantics (the oracled flavor).

    ``verify_prefilter`` (round 8, guide §3.2 "reduce the big side before
    shuffling it"): the exact-verify join only ever reads the shingle
    sets of docs that appear in a candidate pair, but the old plan built
    and shuffled one shingle array for EVERY corpus doc through two
    merge-join sorts. Now the candidate pairs are materialized once
    (``localCheckpoint`` -- they are near-dup-proportional, the same
    class the CC operator checkpoints per round), their id set
    semi-join-prunes the corpus BEFORE any shingle array is built, and
    only candidate docs' arrays enter the verify joins. Candidate
    volume, not corpus volume, then drives the verify stage; jaccard
    values are unchanged (each doc's full shingle set is still computed
    independently). Default OFF: at bench scale the eager checkpoint +
    prune joins cost MORE than corpus-wide array building saves
    (measured +1.2 s at sf0.1); opt in at corpus scale, where shuffling
    every doc's shingle arrays through two merge-join sorts is the wall
    (the same measured tradeoff class as ``max_bucket_size``)."""
    cands = minhash_lsh_pairs(df, id_col, text_col, num_hashes, bands, shingle_k,
                              hash_fn, max_bucket_size)
    base = df
    if verify_prefilter:
        # eager checkpoint: `cands` feeds the id prune AND the verify
        # join; without it the whole signature+banding subtree would be
        # recomputed per consumer. Post-checkpoint size stats are ACTUAL,
        # so Catalyst broadcasts the id set only when it truly is small.
        cands = cands.localCheckpoint(eager=True)
        ids = (
            cands.select(F.col("a").alias(id_col))
            .union(cands.select(F.col("b").alias(id_col)))
            .distinct()
        )
        base = df.join(ids, id_col, "left_semi")
    if verify_on_hashes and hash_fn == "rolling":
        # the fully substring-free path: verify sets are the SAME
        # Karp-Rabin window hashes the signatures minimized over
        sh = _kr_hash_arrays(base, id_col, text_col, shingle_k)
    else:
        from osm_pbf_convert_spark.plans.partitioning import fan_out

        shs_expr = shingles_col(F.col(text_col), shingle_k)
        if verify_on_hashes:
            shs_expr = F.transform(shs_expr, lambda x: F.xxhash64(x))
        # fan out BEFORE the substring materialization: shingles_col is
        # the per-row-heavy step here (guide §2.5 input skew)
        sh = fan_out(base, key=id_col).select(F.col(id_col), shs_expr.alias("shs"))
    # merge hints: the shingle-ARRAY side is corpus-sized (candidate-sized
    # under verify_prefilter, still unbounded); its columnar scan estimate
    # undershoots the exploded row format by ~100x, so the auto-broadcast
    # threshold would hash-build it on every executor (measured exit-52
    # OOM at 16x bench volume, 8 GB executors)
    return (
        cands
        .join(sh.select(F.col(id_col).alias("a"), F.col("shs").alias("sha")).hint("merge"), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("shs").alias("shb")).hint("merge"), "b")
        .withColumn("common", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sha") + F.size("shb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _simhash_signatures_rolling(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The no-token-row SimHash stage (``hash_fn="rolling"``): one Arrow
    pass per batch computes every token occurrence's Karp-Rabin Horner
    hash and the per-doc 64-bit majority (``rolling.batch_token_hash_
    segments`` + ``segment_bit_majority``) -- ZERO shuffle and zero
    per-token rows, where the JVM flavors explode every (doc, token)
    occurrence through a 64-conditional-sum aggregate (the biggest
    remaining dedup wall at the 64x rehearsal: 56.9 s / 6.8 GB spill).
    Tokens split on the ASCII ``\\s`` class exactly like the JVM
    ``split(lower(text), '\\s+')``; majority ties -> 0, zero-token docs
    -> 0, both matching the JVM flavors. Deterministic integer math mod
    2^64 -- replayed by the DuckDB ``simhash_rolling`` oracle entry."""
    import numpy as np
    import pandas as pd

    from osm_pbf_convert_spark.operators import rolling

    def batches(it):
        for pdf in it:
            hashes, off = rolling.batch_token_hash_segments(pdf[text_col])
            sig = rolling.segment_bit_majority(hashes, off)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "simhash": sig.astype(np.int64),
            })

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        batches, schema=f"{id_col} {id_type}, simhash long"
    )


def _simhash_signatures_md5(df: DataFrame, id_col: str, text_col: str,
                            bits: int) -> DataFrame:
    """The md5 oracle SimHash as ONE zero-shuffle Arrow pass (round 8):
    60-bit md5 token hashes per occurrence (``md5win``, one real md5 per
    distinct token per batch) + the shared numpy bit-majority
    (``rolling.segment_bit_majority``) -- value-identical to the old
    explode -> md5 expression -> 60-conditional-SUM aggregate ->
    empties anti-join union, including token-less docs getting 0 (the
    majority of an empty segment) and ties -> 0. The signature is masked
    to the low ``bits`` bits, matching the JVM assemble loop's range."""
    import numpy as np
    import pandas as pd

    from osm_pbf_convert_spark.operators import md5win, rolling
    from osm_pbf_convert_spark.plans.partitioning import fan_out

    mask = np.uint64((1 << bits) - 1)

    def batches(it):
        for pdf in it:
            h60, off = md5win.batch_token_md5_segments(pdf[text_col])
            sig = rolling.segment_bit_majority(h60, off) & mask
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "simhash": sig.astype(np.int64),
            })

    id_type = df.schema[id_col].dataType.simpleString()
    return fan_out(df.select(id_col, text_col), key=id_col).mapInPandas(
        batches, schema=f"{id_col} {id_type}, simhash long"
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 64, token_pattern: str = r"\s+", hash_fn: str = "rolling",
    agg_mode: str = "bits",
) -> DataFrame:
    """(id, simhash long) via explode + ONE groupBy with `bits` conditional
    sums -- each token is hashed once (simhash_col as a single Column
    expression re-evaluates the token array per bit; use this for bulk).

    hash_fn: "rolling" (production default: zero-shuffle Arrow pass, no
    per-token rows -- see ``_simhash_signatures_rolling``; requires
    bits=64 and the default token_pattern), "xxhash64" (JVM flavor,
    64-bit token hashes) or "md5" (token hash = first 15 hex chars of
    md5 as a 60-bit long, so bits must be <= 60; DuckDB replays it via
    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) -- a correctness-oracle
    variant; the sign bit stays clear, so signed and unsigned shifts
    agree across engines).

    agg_mode: "bits" aggregates one conditional SUM per bit (`bits`
    aggregate columns); "packed" packs 4 x 15-bit set-bit counters per
    long and aggregates bits/4 packed SUMs + COUNT -- 4x fewer aggregate
    expressions for the codegen stage, exact same majority semantics
    (sum(+-1) > 0  <=>  2*count_set > n_tokens). 15-bit fields keep the
    packed SUM below 2^63 under ANSI mode and cap docs at 32767 tokens;
    longer docs raise at runtime (the guard is exact, not probabilistic).
    Measured at sf0.1 before choosing the default -- see BENCH/NOTES.md."""
    if hash_fn == "rolling":
        if bits != 64 or token_pattern != r"\s+":
            raise ValueError("rolling simhash is 64-bit over \\s+ tokens; "
                             "pass hash_fn='xxhash64' for other shapes")
        return _simhash_signatures_rolling(df, id_col, text_col)
    if hash_fn in ("md5", "md5_jvm") and bits > 60:
        raise ValueError("md5 variant carries 60 hash bits; pass bits<=60")
    if hash_fn == "md5" and token_pattern == r"\s+":
        # round 8: same values from one Arrow pass (md5_jvm = old chain)
        return _simhash_signatures_md5(df, id_col, text_col, bits)
    if hash_fn == "md5_jvm":
        hash_fn = "md5"
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), token_pattern), lambda t: t != "")
        ).alias("tok"),
    )
    if hash_fn == "xxhash64":
        tok = tok.withColumn("h", F.xxhash64("tok"))
    elif hash_fn == "md5":
        tok = tok.withColumn(
            "h",
            F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10).cast("long"),
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    if agg_mode == "bits":
        aggs = [
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
        sums = tok.groupBy(id_col).agg(*aggs)
        acc = None
        for i in range(bits):
            bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            acc = bit if acc is None else acc.bitwiseOR(bit)
        sig = sums.select(F.col(id_col), acc.alias("simhash"))
    elif agg_mode == "packed":
        # word w packs set-bit counters for bits (4w..4w+3) into 15-bit
        # fields: per-token contribution = bit<<{0,15,30,45}; the packed
        # SUM peaks at 32767*(2^45+2^30+2^15+1) < 2^63 (no ANSI overflow)
        # and fields never carry into each other while n_tokens < 2^15
        # (enforced below)
        n_words = (bits + 3) // 4
        def packed_word(w):
            parts = []
            for f_ in range(min(4, bits - 4 * w)):
                i = 4 * w + f_
                parts.append(
                    F.shiftleft(
                        F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1).cast("long")), 15 * f_
                    )
                )
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            return acc

        aggs = [F.sum(packed_word(w)).alias(f"w{w}") for w in range(n_words)]
        sums = tok.groupBy(id_col).agg(*aggs, F.count(F.lit(1)).alias("n_tok"))
        # exact overflow guard: 15-bit counter fields cap docs at 32767
        # tokens (raise_error keeps the check inside the same job)
        guard = F.when(
            F.col("n_tok") >= F.lit(1 << 15),
            F.raise_error(F.lit("simhash packed: doc exceeds 32767 tokens; use agg_mode='bits'")),
        ).otherwise(F.col("n_tok"))
        sums = sums.withColumn("n_tok", guard)
        acc = None
        for i in range(bits):
            w, f_ = divmod(i, 4)
            cnt = F.shiftright(F.col(f"w{w}"), 15 * f_).bitwiseAND(F.lit(0x7FFF).cast("long"))
            bit = F.when(
                cnt * 2 > F.col("n_tok"), F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            acc = bit if acc is None else acc.bitwiseOR(bit)
        sig = sums.select(F.col(id_col), acc.alias("simhash"))
    else:
        raise ValueError(f"unknown agg_mode {agg_mode!r}")
    # docs with zero tokens never reach the groupBy: give them simhash 0
    # (matches simhash_col, where the empty aggregate yields all bit_sum=0)
    # merge hint: sig is the corpus-sized signature relation (derived ->
    # underestimated -> auto-broadcast risk, same class as exact_dedup)
    empties = df.join(sig.select(id_col).hint("merge"), id_col, "left_anti").select(
        F.col(id_col), F.lit(0).cast("long").alias("simhash")
    )
    return sig.unionByName(empties)


def simhash_col(text, bits: int = 64, token_pattern: str = r"\s+"):
    """64-bit SimHash as a LongType column, fully JVM-side:
    tokens -> xxhash64 -> per-bit majority via conditional sums."""
    tokens = F.filter(F.split(F.lower(text), token_pattern), lambda t: t != "")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    acc = None
    for i in range(bits):
        bit_sum = F.aggregate(
            hashes,
            F.lit(0),
            lambda a, h: a + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit = F.when(bit_sum > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        acc = bit if acc is None else acc.bitwiseOR(bit)
    return acc


def simhash_hamming_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, bands: int | None = None,
    bits: int = 64, hash_fn: str = "rolling",
) -> DataFrame:
    """Near-duplicate pairs with simhash Hamming distance <= max_hamming.

    Pigeonhole banding: split the signature into max_hamming+1 chunks --
    any pair within distance d agrees exactly on >= 1 chunk, so an
    equi-join per chunk finds ALL such pairs (no recall loss; bits the
    chunks don't cover only ADD candidates -- fewer covered differences
    need even fewer clean chunks -- and the exact popcount verify uses
    every bit); exact popcount (bit_count, JVM) verifies candidates.

    bits/hash_fn as in simhash_signatures (md5 = 60-bit oracle variant).
    """
    b = bands or (max_hamming + 1)
    width = bits // b
    s = simhash_signatures(df, id_col, text_col, bits=bits, hash_fn=hash_fn)
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1) if width < 64 else F.lit(-1))
                .alias("chunk"),
            )
            for i in range(b)
        ]
    )
    banded = s.select(id_col, "simhash", F.explode(chunk_arr).alias("c")).select(
        id_col, "simhash", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk")
    )
    a = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"), "band", "chunk")
    b_ = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"), "band", "chunk")
    # merge hint: corpus-sized self-join (see minhash_lsh_pairs)
    pairs = (
        a.join(b_.hint("merge"), ["band", "chunk"]).filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )
    return pairs


def simhash_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 64, hash_fn: str = "rolling",
) -> DataFrame:
    """Groups of docs with IDENTICAL simhash (near-dup at hamming 0); for
    hamming <= d banding, split the bits into d+1 chunks upstream."""
    s = simhash_signatures(df, id_col, text_col, bits=bits, hash_fn=hash_fn)
    return (
        s.groupBy("simhash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def _hyperplane_sign_matrix(spark, planes: int, dim: int, seed: int) -> list:
    """The xxhash64-derived +-1.0 normals as a literal matrix: evaluated
    IN Spark with the exact expression the pre-round-7 Catalyst path used
    (``pmod(xxhash64(seed, plane, dim_index), 2)`` over INT inputs), so
    production bucket assignment is unchanged. planes x dim values -- a
    bounded driver collect (16 x 64 = 1 KB at the defaults), same class
    as similarity.py's centroid sample."""
    rows = (
        spark.range(dim)
        .select(
            F.col("id").cast("int").alias("d"),
            *[
                (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), F.col("id").cast("int")), F.lit(2)) == 1)
                .alias(f"p{p}")
                for p in range(planes)
            ],
        )
        .orderBy("d")
        .collect()
    )
    return [
        [1.0 if r[f"p{p}"] else -1.0 for r in rows] for p in range(planes)
    ]


def _assign_hyperplane_buckets(
    df: DataFrame, id_col: str, vec_col: str, signs: list
) -> DataFrame:
    """(id, vec, bucket) via one Arrow pass: all plane dots per batch,
    accumulated dimension-by-dimension so each row's float64 sum order is
    the sequential left fold (bit-identical to the Catalyst/DuckDB
    replays). Zero shuffle -- a map-only stage like rolling.py's."""
    import numpy as np
    import pandas as pd

    S = np.asarray(signs, dtype=np.float64)  # planes x dim
    planes = S.shape[0]
    weights = (np.int64(1) << np.arange(planes, dtype=np.int64))

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = pdf[vec_col].to_numpy()
            # robustness (ADVICE r7): a single null/ragged embedding must
            # not crash the whole job -- name the offending id instead
            # (the pre-r7 zip_with expression silently nulled such rows;
            # an explicit error is the safer dedup-pipeline behavior)
            lens = {len(v) if v is not None else -1 for v in vecs}
            if len(lens) > 1 or -1 in lens:
                bad = next(
                    i for v, i in zip(vecs, pdf[id_col])
                    if v is None or len(v) != max(lens)
                )
                raise ValueError(
                    f"embedding_neardup: null or ragged embedding at {id_col}={bad!r}"
                )
            V = np.stack(vecs)  # n x dim float64
            n, d = V.shape
            k = min(d, S.shape[1])  # zip_with semantics: shorter side wins
            acc = np.zeros((n, planes), dtype=np.float64)
            for j in range(k):
                # SEQUENTIAL over dims: ((0 + v0*s0) + v1*s1) + ...
                acc += V[:, j, None] * S[None, :, j]
            bucket = ((acc > 0.0).astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col], "bucket": bucket}
            )

    in_schema = df.select(id_col, vec_col).schema
    out_schema = T.StructType(
        list(in_schema.fields) + [T.StructField("bucket", T.LongType())]
    )
    return df.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)


def embedding_neardup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, planes: int = 16, seed: int = 42,
    hyperplanes: list | None = None,
) -> DataFrame:
    """Cosine near-duplicates via random-hyperplane LSH.

    Hyperplane normals are derived deterministically from xxhash64(seed,
    plane, dim) -- no driver-side RNG state to ship. Docs sharing the full
    sign-pattern bucket get exact cosine; pairs >= threshold survive.
    Recall note: single-table LSH; OR-construction = union over several
    seeds.

    ``hyperplanes``: optional explicit sign matrix (planes x dim of +-1.0
    floats) replacing the xxhash64-derived normals -- the
    DuckDB-replayable oracle variant (literal signs make bucket
    assignment a plain +- sum both engines evaluate in the same float64
    order); `planes`/`seed` are ignored when given.

    Bucket assignment is ONE Arrow ``mapInPandas`` pass computing all
    plane dots per batch (round-7 rework; the previous per-plane Catalyst
    ``aggregate``/``zip_with`` chains evaluated planes x dim expression
    nodes per row). The accumulation loops over dimensions SEQUENTIALLY
    (``acc += V[:, j] * s[j]``), so every float64 add happens in the same
    left-to-right order as the old Catalyst fold and as DuckDB's ``+``
    chain -- bucket bits are bit-identical across all three
    (pytest-pinned). Embeddings must be fixed-dimension (they are by the
    table contract).
    """
    # all arithmetic in float64: float32 inputs are widened BEFORE any
    # multiply, so products/sums round identically in Spark and DuckDB
    df = df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    if hyperplanes is not None:
        signs = [[float(s) for s in row] for row in hyperplanes]
    else:
        row = df.select(F.size(vec_col)).first()  # one-row driver probe
        if row is None:  # empty input: no pairs (ADVICE r7 guard)
            return df.sparkSession.createDataFrame(
                [], schema="a long, b long, cosine double"
            ).select(
                F.col("a").cast(df.schema[id_col].dataType).alias("a"),
                F.col("b").cast(df.schema[id_col].dataType).alias("b"),
                "cosine",
            )
        dim = row[0]
        signs = _hyperplane_sign_matrix(df.sparkSession, planes, dim, seed)
    withb = _assign_hyperplane_buckets(df, id_col, vec_col, signs)
    a = withb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b_ = withb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    # merge hint: corpus-sized self-join carrying full embedding vectors
    pairs = a.join(b_.hint("merge"), "bucket").filter(F.col("a") < F.col("b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return (
        pairs.withColumn("cosine", dot / (na * nb))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .distinct()
    )
