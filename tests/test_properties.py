"""Property-based tests (hypothesis): sketch merge laws, key hashing, rules.

The reference has no property tests (SURVEY.md §5); the engine's correctness
under ANY partitioning rests on commutative-associative merges, so those laws
are checked explicitly here.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fdpg_query_data_validation_ray.functions.sketches import HLL, KLL

floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=25, deadline=None)
@given(st.lists(floats, min_size=1, max_size=500), st.integers(1, 5))
def test_kll_merge_equals_single_stream(values, n_splits):
    """Quantiles from split-then-merged sketches stay within rank error of the
    single-stream sketch, and n is exact."""
    whole = KLL()
    whole.add_values(np.array(values, dtype=np.float64))
    parts = [KLL() for _ in range(n_splits)]
    for i, v in enumerate(values):
        parts[i % n_splits].add_values(np.array([v], dtype=np.float64))
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == whole.n == len(values)
    s = sorted(values)
    for q in (0.0, 0.5, 1.0):
        est = merged.quantile(q)
        # rank-error bound: the estimate must be a value within ±15% rank
        lo = s[max(0, int(q * (len(s) - 1)) - max(3, len(s) // 6))]
        hi = s[min(len(s) - 1, int(q * (len(s) - 1)) + max(3, len(s) // 6))]
        assert lo <= est <= hi


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=300))
def test_hll_merge_commutative_and_bounded(values):
    from fdpg_query_data_validation_ray.functions.hashing import hash64

    h = hash64(np.array(values, dtype=object))
    a, b = HLL(), HLL()
    a.add_hashes(h[: len(h) // 2])
    b.add_hashes(h[len(h) // 2 :])
    ab = HLL.from_bytes(a.to_bytes())
    ab.merge(b)
    ba = HLL.from_bytes(b.to_bytes())
    ba.merge(a)
    assert ab.estimate() == ba.estimate()  # merge is commutative
    truth = len(set(values))
    est = ab.estimate()
    assert 0.5 * truth <= est <= 1.5 * truth + 2  # sane accuracy envelope


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=6), st.integers(-1000, 1000)),
        min_size=1,
        max_size=100,
    )
)
def test_key_hash_equality_iff_same_key_almost_surely(pairs):
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.unique import key_hash

    t = pa.table(
        {
            "a": [p[0] for p in pairs],
            "b": [p[1] for p in pairs],
        }
    )
    h = key_hash(t, ["a", "b"])
    seen: dict[tuple, int] = {}
    for i, p in enumerate(pairs):
        if p in seen:
            assert h[i] == h[seen[p]]  # equal keys → equal hashes, always
        else:
            seen[p] = i


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=200))
def test_issue_dedup_counts_partition_invariant(assignments):
    """dedup_issues totals are identical under any grouping of the violation
    stream (IssueSet count semantics, commutative)."""
    from fdpg_query_data_validation_ray.pipelines.report import dedup_issues

    rows = [
        {
            "rule_id": f"r{a}",
            "severity": "error",
            "location": "c",
            "diagnostics": "d",
            "row_key": f"k{i}",
        }
        for i, a in enumerate(assignments)
    ]
    base = {g["rule_id"]: g["count"] for g in dedup_issues(rows)}
    shuffled = list(reversed(rows))
    again = {g["rule_id"]: g["count"] for g in dedup_issues(shuffled)}
    assert base == again
    assert sum(base.values()) == len(rows)


def test_hash64_integer_batch_stability():
    """Regression: an int64 key must hash identically whether or not its batch
    contains nulls (a float64 fallback would split duplicate keys across
    batches and the uniqueness sieve would miss them)."""
    import pyarrow as pa

    from fdpg_query_data_validation_ray.functions.hashing import hash64

    clean = hash64(pa.array([7, 8], pa.int64()))
    with_null = hash64(pa.array([7, None], pa.int64()))
    assert clean[0] == with_null[0]
    chunked = hash64(pa.chunked_array([pa.array([7]), pa.array([None, 8])]))
    assert chunked[0] == clean[0] and chunked[2] == clean[1]


def test_duplicate_keys_across_null_batches(ray_session):
    """End-to-end: duplicate int keys split between a null-free and a
    null-containing batch are still found."""
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.unique import duplicate_keys

    t1 = pa.table({"k": pa.array([7, 1, 2], pa.int64())})
    t2 = pa.table({"k": pa.array([7, None, 3], pa.int64())})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    dups = duplicate_keys(ds, ["k"]).to_pandas()
    assert len(dups) == 1 and dups.iloc[0]["dup_count"] == 2


# ---------------- DDSketch laws (hypothesis) ----------------

from fdpg_query_data_validation_ray.functions.sketches import DDSketch  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(st.lists(floats, min_size=1, max_size=400), st.integers(1, 7), st.randoms())
def test_dd_state_is_pure_function_of_multiset(values, n_splits, rnd):
    """STRONGER than KLL's law: serialized bytes are IDENTICAL for any
    batching, any input order, and any merge shuffle of the same multiset."""
    whole = DDSketch()
    whole.add_values(np.array(values, dtype=np.float64))
    shuffled = list(values)
    rnd.shuffle(shuffled)
    parts = [DDSketch() for _ in range(n_splits)]
    for i, v in enumerate(shuffled):
        parts[i % n_splits].add_values(np.array([v], dtype=np.float64))
    rnd.shuffle(parts)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.to_bytes() == whole.to_bytes()
    assert merged.n == len(values)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=1e-6, max_value=1e9), min_size=5, max_size=400))
def test_dd_relative_error_law(values):
    """Every quantile estimate is within alpha (+ rank slack) of a value
    actually in the data's bucket neighbourhood: |est - true|/true <= ~2a."""
    arr = np.sort(np.array(values, dtype=np.float64))
    s = DDSketch(alpha=0.01)
    s.add_values(arr)
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        true = arr[int(q * (len(arr) - 1))]
        est = s.quantile(q)
        assert abs(est - true) / true < 0.021
