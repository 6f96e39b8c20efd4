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


_NULL_HASH = np.uint64(0x8C58_F183_DD02_9F41)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an array of scalars (strings or numerics).

    Nulls hash to a fixed value. CRITICAL batch-stability property: the hash of
    a value must not depend on which batch it arrived in — in particular an
    int64 column must hash identically whether or not its batch happens to
    contain nulls (a naive to_pandas turns int64-with-null into float64 and
    the same key silently hashes differently across batches, making the
    uniqueness sieve miss duplicates). Integer Arrow columns therefore keep
    their integer dtype via fill_null + explicit null-mask overwrite.

    `seed` derives independent hash families (minhash permutations, salting)
    via splitmix64-style finalization.
    """
    null_mask = None
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if pa.types.is_integer(values.type):
            if values.null_count:
                null_mask = values.is_null().to_numpy(zero_copy_only=False)
                values = values.fill_null(0)  # dtype stays integer
            values = values.to_numpy(zero_copy_only=False)
        else:
            values = values.to_pandas()
    arr = np.asarray(values, dtype=object) if not isinstance(values, np.ndarray) else values
    if arr.dtype == object:
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)
    else:
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY)
    if null_mask is not None:
        h = h.copy()
        h[null_mask] = _NULL_HASH
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
