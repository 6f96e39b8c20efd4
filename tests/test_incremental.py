"""Incremental new-key filter (stages/incremental.py): exactness of both
physical plans against a brute-force truth set, bloom-sieve internals, budget
fallback, and partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk(rng, n, n_keys, payload_from=0):
    """A (k1, k2, payload) table with controllably overlapping keys."""
    k1 = rng.integers(0, n_keys, size=n)
    k2 = rng.integers(0, 7, size=n)
    return pa.table(
        {
            "k1": pa.array(k1, pa.int64()),
            "k2": pa.array(k2, pa.int64()),
            "payload": pa.array(np.arange(payload_from, payload_from + n), pa.int64()),
        }
    )


def _truth(incoming: pa.Table, seen: pa.Table) -> set:
    seen_keys = set(zip(seen["k1"].to_pylist(), seen["k2"].to_pylist()))
    out = set()
    for a, b, p in zip(
        incoming["k1"].to_pylist(), incoming["k2"].to_pylist(), incoming["payload"].to_pylist()
    ):
        if (a, b) not in seen_keys:
            out.add((a, b, p))
    return out


def _result_set(ds) -> set:
    t = ds.to_pandas()
    return set(zip(t["k1"], t["k2"], t["payload"]))


@pytest.mark.parametrize("mode", ["auto", "shuffle"])
def test_filter_new_keys_matches_bruteforce(ray_session, mode):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    rng = np.random.default_rng(7)
    seen_t = _mk(rng, 4000, 900)
    inc_t = _mk(rng, 3000, 1800, payload_from=10_000)  # ~half the keyspace unseen
    got = _result_set(
        filter_new_keys(
            rd.from_arrow(inc_t).repartition(5),
            rd.from_arrow(seen_t).repartition(7),
            ["k1", "k2"],
            mode=mode,
        )
    )
    want = _truth(inc_t, seen_t)
    assert got == want and len(want) > 0


def test_exact_even_with_tiny_bloom_high_fp(ray_session):
    """A deliberately undersized bloom (huge fp rate) must not change the
    answer — false positives are resolved by the exact value intersect."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    rng = np.random.default_rng(3)
    seen_t = _mk(rng, 2000, 400)
    inc_t = _mk(rng, 1500, 800, payload_from=50_000)
    got = _result_set(
        filter_new_keys(
            rd.from_arrow(inc_t).repartition(3),
            rd.from_arrow(seen_t).repartition(4),
            ["k1", "k2"],
            n_seen_hint=8,  # ~64-bit filter for 2000 keys → fp ≈ 1
            mode="auto",
        )
    )
    assert got == _truth(inc_t, seen_t)


def test_budget_overflow_falls_back_to_shuffle_plan(ray_session, monkeypatch):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    monkeypatch.setenv("QDV_INCR_MAX_DRIVER_ROWS", "10")  # force overflow
    rng = np.random.default_rng(9)
    seen_t = _mk(rng, 1000, 200)
    inc_t = _mk(rng, 800, 400, payload_from=90_000)
    got = _result_set(
        filter_new_keys(
            rd.from_arrow(inc_t).repartition(3),
            rd.from_arrow(seen_t).repartition(3),
            ["k1", "k2"],
            mode="auto",
        )
    )
    assert got == _truth(inc_t, seen_t)


def test_empty_seen_and_empty_incoming(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    rng = np.random.default_rng(1)
    inc_t = _mk(rng, 300, 100)
    empty = inc_t.slice(0, 0)
    # empty seen → everything new
    got = _result_set(
        filter_new_keys(rd.from_arrow(inc_t), rd.from_arrow(empty), ["k1", "k2"])
    )
    assert got == _truth(inc_t, empty)
    # empty incoming → empty out
    out = filter_new_keys(
        rd.from_arrow(empty), rd.from_arrow(inc_t), ["k1", "k2"]
    ).to_pandas()
    assert len(out) == 0


def test_partition_invariance(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    rng = np.random.default_rng(21)
    seen_t = _mk(rng, 2500, 600)
    inc_t = _mk(rng, 2000, 1200, payload_from=7_000)
    results = [
        _result_set(
            filter_new_keys(
                rd.from_arrow(inc_t).repartition(p),
                rd.from_arrow(seen_t).repartition(q),
                ["k1", "k2"],
            )
        )
        for p, q in [(1, 1), (4, 9), (13, 2)]
    ]
    assert results[0] == results[1] == results[2]


def test_exact_under_forced_hash_collisions(ray_session, monkeypatch):
    """Degenerate 2-bit key hash → massive collision runs in the pair set.
    The stage callables (driven in-process so the monkeypatch applies) must
    still resolve membership exactly via the string comparison."""
    import ray

    from fdpg_query_data_validation_ray.stages import incremental as inc

    # a stable degenerate hash of k1 alone, mod 4
    monkeypatch.setattr(
        inc,
        "key_hash",
        lambda t, cols: (
            t.column(cols[0]).combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
            & np.uint64(3)
        ),
    )
    rng = np.random.default_rng(11)
    seen_t = _mk(rng, 600, 150)
    inc_t = _mk(rng, 500, 300, payload_from=1_000)

    # pair set: every distinct seen key, hashed degenerately (cand = all 4 hashes)
    cand = np.array([0, 1, 2, 3], dtype=np.uint64)
    pairs_stage = inc._HashMatchPairs(("k1", "k2"), ray.put(cand))
    pt = pairs_stage(seen_t)
    h = pt["h"].combine_chunks().to_numpy(zero_copy_only=False)
    k = pt["k"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    drop = inc._DropSeenExact(("k1", "k2"), ray.put((h[order], k[order])))
    out = drop(inc_t)
    got = set(zip(out["k1"].to_pylist(), out["k2"].to_pylist(), out["payload"].to_pylist()))
    assert got == _truth(inc_t, seen_t)
    # sanity: the degenerate hash really produced multi-key runs
    assert len(np.unique(h)) <= 4 and len(k) > 4


def test_bloom_build_fan_in_tree(ray_session):
    """Many input blocks → the fan-in merge tree still produces a bloom that
    contains every seen key (no false negatives end-to-end)."""
    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.incremental import build_seen_bloom
    from fdpg_query_data_validation_ray.stages.unique import key_hash

    rng = np.random.default_rng(5)
    seen_t = _mk(rng, 3000, 2000)
    ref = build_seen_bloom(
        rd.from_arrow(seen_t).repartition(40),
        ["k1", "k2"],
        n_items=3000,
        fan_in=4,  # force multiple merge levels
        build_batch_size=64,
    )
    bloom = ray.get(ref)
    h = key_hash(seen_t, ["k1", "k2"])
    assert bool(bloom.contains_hashes(h).all())
