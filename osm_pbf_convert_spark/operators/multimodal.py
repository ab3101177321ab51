"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is REAL and tested: schemas, Arrow batch shapes,
``mapInPandas`` partition flow, deterministic partitioning. The actual
media decode is STUBBED (image/audio libraries are not in this container):
``decoder="stub"`` raises NotImplementedError, ``decoder="fake"`` produces
deterministic features from the raw bytes so pipelines are end-to-end
testable. Swapping in a real decoder (PIL/ffmpeg) is a one-function change
inside the UDF -- the plan shape does not move.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: sha256-seeded uniform floats."""
    if content is None:
        content = b""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float64).astype(np.float32)


def extract_features(
    df: DataFrame, dim: int = 32, content_col: str = "content", decoder: str = "stub"
) -> DataFrame:
    """media -> (all columns..., feature array<float>).

    ``mapInPandas`` with Arrow batches; batch shape = input batch rows, one
    feature vector per row. decoder='stub' raises (documents the missing
    native dependency); decoder='fake' is the deterministic test double.
    """
    if decoder not in ("stub", "fake"):
        raise ValueError("decoder must be 'stub' or 'fake'")
    out_schema = df.schema.simpleString()[7:-1] + f", feature array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this container); "
                    "use decoder='fake' for deterministic plumbing tests"
                )
            pdf = pdf.copy()
            pdf["feature"] = [ _fake_feature(c, dim) for c in pdf[content_col] ]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "stub") -> DataFrame:
    """Image resize plumbing: output schema mirrors input with updated meta
    and re-encoded content. fake: content = sha256 tag + target dims."""
    out_schema = df.schema.simpleString()[7:-1]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError("real image resize requires PIL")
            pdf = pdf.copy()
            pdf["content"] = [
                hashlib.sha256((c or b"") + f"{width}x{height}".encode()).digest()
                for c in pdf["content"]
            ]
            pdf["meta"] = [
                {**(m if isinstance(m, dict) else m.asDict() if m is not None else {}),
                 "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10, decoder: str = "stub") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (media_id, frame_index, frame binary). fake: n_frames//every_n rows of
    deterministic bytes."""
    out_schema = "media_id bigint, frame_index int, frame binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError("real frame extraction requires ffmpeg")
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                n = (meta.get("n_frames") if isinstance(meta, dict) else meta["n_frames"]) or 0
                for fi in range(0, int(n), every_n):
                    rows.append(
                        (r["media_id"], fi,
                         hashlib.sha256((r["content"] or b"") + fi.to_bytes(4, "big")).digest())
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame"])

    return df.mapInPandas(fn, out_schema)
