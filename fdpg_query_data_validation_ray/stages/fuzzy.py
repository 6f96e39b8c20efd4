"""Fuzzy string self-join at edit distance ≤ 1 — the SymSpell deletion-
neighborhood algorithm (Garbe 2012; same family as FastSS, Bocek et al.
2007) expressed as Ray Data exchanges.

Exactness: two strings s ≠ t have Levenshtein distance ≤ 1 iff their
deletion neighborhoods D(s) = {s} ∪ {s minus one char} intersect:
  - |s| = |t|, one substitution at i → deleting i from both gives the same
    string;
  - |s| = |t| + 1, one deletion → t ∈ D(s) and t ∈ D(t).
The converse does NOT hold (e.g. "ab"/"ba" share variants but ED = 2), so
every candidate pair is verified by an exact vectorized ED ≤ 1 kernel —
the bucket join only prunes.

Scale posture: the explode is |term|+1 rows per DISTINCT term (vocabulary-
bounded, never corpus-bounded), variants co-partition by hash so candidate
generation is per-part, and pair dedup + verification ride one pair-hash
exchange. No driver-side state. `max_len` bounds the explode per term;
longer terms are excluded (replay the same length filter in any oracle).

Reference analog: the reference validates codes by exact value-set
membership (terminology server); approximate matching has no counterpart
there — this is the entity-resolution / near-duplicate-key operator a
large-scale pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64
from fdpg_query_data_validation_ray.stages.cluster import _ccf_parts, _next_pow2

_PAIR_SCHEMA = pa.schema(
    [("part", pa.int32()), ("w1", pa.string()), ("w2", pa.string())]
)


def _ed1_exact(a: np.ndarray, b: np.ndarray, max_len: int) -> np.ndarray:
    """Vectorized exact ED ≤ 1 check for same-or-off-by-one-length string
    pairs (code-point semantics, matching DuckDB's levenshtein on the
    ASCII/BMP inputs this engine feeds it). Returns a bool mask."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    A = np.array(a, dtype=f"U{max_len}")
    B = np.array(b, dtype=f"U{max_len}")
    la = np.char.str_len(A)
    lb = np.char.str_len(B)
    Au = A.view(np.uint32).reshape(n, max_len)
    Bu = B.view(np.uint32).reshape(n, max_len)
    # orient so X is the longer (or equal) side
    swap = lb > la
    Xu = np.where(swap[:, None], Bu, Au)
    Yu = np.where(swap[:, None], Au, Bu)
    lx = np.where(swap, lb, la)
    ly = np.where(swap, la, lb)
    neq = Xu != Yu
    nmis = neq.sum(axis=1)
    same_len_sub = (lx == ly) & (nmis == 1)
    # deletion case: lx == ly + 1; j = first mismatch; valid iff
    # X[j+1:] == Y[j:] (padding included)
    del_len = lx == ly + 1
    j = np.argmax(neq, axis=1)  # first mismatch; lengths differ ⇒ exists
    eq_shift = Xu[:, 1:] == Yu[:, :-1]
    # suffix_all[i, p] = eq_shift[i, p:].all(); extra True column so
    # j == max_len - 1 (drop the final char) indexes validly
    suffix_all = np.ones((n, max_len), dtype=bool)
    suffix_all[:, :-1] = np.flip(
        np.cumprod(np.flip(eq_shift, axis=1), axis=1), axis=1
    ).astype(bool)
    del_ok = del_len & suffix_all[np.arange(n), j]
    return same_len_sub | del_ok


def fuzzy_pairs_ed1(
    ds,
    column: str,
    max_len: int = 32,
    num_partitions: int | None = None,
    lowercase: bool = False,
):
    """All unordered pairs (w1 < w2) of DISTINCT values of `column` with
    Levenshtein distance ≤ 1. Values longer than `max_len` code points are
    excluded (bound the per-term explode; replay `len(x) <= max_len` in
    oracles). Returns a Dataset (w1, w2)."""
    import ray.data as rd

    n_parts = (
        _next_pow2(int(num_partitions))
        if num_partitions is not None
        else _ccf_parts()
    )

    # ---- pass 1: distinct terms (per-batch unique → hash exchange) -------
    def batch_terms(t: pa.Table) -> pa.Table:
        col = pc.cast(t[column], pa.string())
        if lowercase:
            col = pc.utf8_lower(col)
        col = col.drop_null()
        keep = pc.less_equal(pc.utf8_length(col), max_len)
        vals = pc.filter(col, keep).to_numpy(zero_copy_only=False)
        vals = np.unique(vals.astype("U")).astype(object)
        return pa.table(
            {
                "part": (hash64(vals) & np.uint64(n_parts - 1)).astype(
                    np.int32
                ),
                "term": pa.array(vals, pa.string()),
            }
        )

    def dedup_terms(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"term": g["term"].drop_duplicates()})

    terms = (
        ds.map_batches(batch_terms, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(dedup_terms, batch_format="pandas")
    )

    # ---- pass 2: deletion-neighborhood explode, bucket by variant --------
    def variants(t: pa.Table) -> pa.Table:
        tv = t["term"].to_numpy(zero_copy_only=False)
        out_v: list[str] = []
        out_t: list[str] = []
        for s in tv:
            out_v.append(s)
            out_t.append(s)
            for i in range(len(s)):
                out_v.append(s[:i] + s[i + 1 :])
                out_t.append(s)
        va = np.array(out_v, dtype=object)
        return pa.table(
            {
                "part": (hash64(va) & np.uint64(n_parts - 1)).astype(np.int32),
                "variant": pa.array(va, pa.string()),
                "term": pa.array(out_t, pa.string()),
            }
        )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "part": pd.Series(dtype="int32"),
                    "w1": pd.Series(dtype="object"),
                    "w2": pd.Series(dtype="object"),
                }
            )
        s = g[["variant", "term"]].drop_duplicates()
        m = s.merge(s, on="variant", suffixes=("_a", "_b"))
        m = m[m["term_a"] < m["term_b"]][["term_a", "term_b"]].drop_duplicates()
        w1 = m["term_a"].to_numpy(object)
        w2 = m["term_b"].to_numpy(object)
        joined = np.array(
            [x + "\x1f" + y for x, y in zip(w1, w2)], dtype=object
        )
        return pd.DataFrame(
            {
                "part": (hash64(joined) & np.uint64(n_parts - 1)).astype(
                    np.int32
                ),
                "w1": w1,
                "w2": w2,
            }
        )

    # ---- pass 3: global pair dedup + exact ED ≤ 1 verification -----------
    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["w1", "w2"])
        if len(g) == 0:
            return pd.DataFrame(
                {"w1": pd.Series(dtype="object"), "w2": pd.Series(dtype="object")}
            )
        ok = _ed1_exact(
            g["w1"].to_numpy(object), g["w2"].to_numpy(object), max_len
        )
        return pd.DataFrame(
            {"w1": g["w1"].to_numpy(object)[ok], "w2": g["w2"].to_numpy(object)[ok]}
        )

    out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string())])
    pairs = (
        terms.map_batches(variants, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(candidates, batch_format="pandas")
        .map_batches(
            lambda t: t.cast(_PAIR_SCHEMA)
            if t.num_columns
            else _PAIR_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(verify, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["w1", "w2"]).cast(out_schema)
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
    import ray.data as rd

    return rd.from_arrow(out_schema.empty_table()).union(pairs)
