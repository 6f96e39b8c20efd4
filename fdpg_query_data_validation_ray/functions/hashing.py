"""Deterministic hashing kernels.

- sha256 per row over `content` is the per-row invariant mandated by
  BASELINE.json input_hint ("per-row invariant vs the reference: content sha256
  equality").
- hash64 is the engine's workhorse for shuffling/bucketing/salting/sketching:
  pandas' SipHash-based `hash_array` with a fixed key — deterministic across
  processes and machines (unlike Python's builtin `hash`), vectorized in C.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "fdpgqdvray012345"  # must be exactly 16 bytes
assert len(_HASH_KEY) == 16


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an array of scalars (strings or numerics).

    Nulls hash to a fixed value. `seed` derives independent hash families
    (minhash permutations, salting) by mixing into the result with
    splitmix64-style finalization.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    arr = np.asarray(values, dtype=object) if not isinstance(values, np.ndarray) else values
    if arr.dtype == object:
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)
    else:
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY)
    if seed:
        h = mix64(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return h


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, branch-free avalanche."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex sha256 per row (None for null rows). hashlib releases the GIL into
    C; the Python loop is the mandated invariant's cost, paid once per row."""
    out: list[str | None] = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        for v in chunk:
            s = v.as_py()
            out.append(None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())


def md5_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex md5 per row — matches DuckDB's md5() for oracle-checked dedup keys."""
    out: list[str | None] = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        for v in chunk:
            s = v.as_py()
            out.append(None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())
