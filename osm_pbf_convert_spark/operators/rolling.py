"""Shared no-substring Karp-Rabin window-hash core.

Round-4 profiling showed ~90% of the shingle family's cost is the JVM
materializing every k-char substring before hashing (`shingles_col`).
This module computes the k-byte window hashes of a whole Arrow batch
WITHOUT building a single substring: the batch's lower-cased texts are
concatenated into ONE uint8 buffer, every window hash is a Karp-Rabin
polynomial computed with k vectorized shifted multiply-adds (mod 2^64
by natural uint64 wrap), and windows crossing document boundaries are
simply never selected by the per-doc slices. Measured 30x on the
fingerprint operator (BENCH/NOTES.md); consumed by
``text.fingerprint(hash_fn="rolling")`` and
``dedup.minhash_signatures(hash_fn="rolling")``.
"""

from __future__ import annotations

import random

import numpy as np

KR_BASE = 1000003  # classic string-hash prime; any odd multiplier works


def window_powers(k: int) -> np.ndarray:
    return np.array([pow(KR_BASE, k - 1 - j, 1 << 64) for j in range(k)],
                    dtype=np.uint64)


def batch_window_hashes(texts, k: int):
    """For a pandas Series of strings: yields one ``np.ndarray`` of
    UNIQUE uint64 window hashes per row (sorted ascending, possibly
    empty), matching distinct-shingle set semantics over the
    lower-cased UTF-8 bytes."""
    powers = window_powers(k)
    raw = texts.fillna("").str.lower().str.encode("utf-8")
    lens = raw.str.len().to_numpy(np.int64)
    buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
    n = buf.size
    empty = np.empty(0, dtype=np.uint64)
    if n < k:
        for _ in range(len(lens)):
            yield empty
        return
    h = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h += buf[j:n - k + 1 + j].astype(np.uint64) * powers[j]
    starts = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    for i in range(lens.size):
        lo, hi = starts[i], starts[i + 1] - k + 1
        yield np.unique(h[lo:hi]) if hi > lo else empty


def affine_family(num_hashes: int, seed: int = 42):
    """(A, B) uint64 arrays: h_i(x) = A_i*x + B_i mod 2^64. Odd A_i
    makes each h_i a bijection on Z_2^64 -- a valid minhash
    permutation family; deterministic across runs."""
    rng = random.Random(seed)
    A = np.array([rng.getrandbits(64) | 1 for _ in range(num_hashes)],
                 dtype=np.uint64)
    B = np.array([rng.getrandbits(64) for _ in range(num_hashes)],
                 dtype=np.uint64)
    return A, B
