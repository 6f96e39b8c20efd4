"""HLL / KLL sketch accuracy, mergeability, serialization (pure numpy)."""

from __future__ import annotations

import numpy as np

from fdpg_query_data_validation_ray.functions.hashing import hash64
from fdpg_query_data_validation_ray.functions.sketches import HLL, KLL


def test_hll_accuracy_within_2pct():
    for true_n in (100, 10_000, 200_000):
        vals = np.array([f"v{i}" for i in range(true_n)], dtype=object)
        h = HLL(p=12).add_hashes(hash64(vals))
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    a_vals = hash64(np.arange(50_000))
    b_vals = hash64(np.arange(25_000, 75_000))
    single = HLL().add_hashes(np.concatenate([a_vals, b_vals]))
    merged = HLL().add_hashes(a_vals).merge(HLL().add_hashes(b_vals))
    assert np.array_equal(single.registers, merged.registers)
    assert abs(merged.estimate() - 75_000) / 75_000 < 0.05


def test_hll_duplicates_dont_inflate():
    vals = hash64(np.array(["x", "y", "z"] * 10_000, dtype=object))
    assert HLL().add_hashes(vals).estimate() < 10


def test_hll_serde():
    h = HLL().add_hashes(hash64(np.arange(1000)))
    h2 = HLL.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)


def test_kll_rank_error():
    rng = np.random.default_rng(0)
    data = rng.lognormal(3, 1, 100_000)
    s = KLL(k=200)
    for chunk in np.array_split(data, 37):
        s.add_values(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        # rank of the estimate must be within ~2% of the target rank
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < 0.025, (q, rank)


def test_kll_merge_rank_error():
    rng = np.random.default_rng(1)
    parts = [rng.normal(i, 1, 20_000) for i in range(5)]
    merged = KLL()
    for p in parts:
        merged.merge(KLL().add_values(p))
    data = np.sort(np.concatenate(parts))
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(data, merged.quantile(q)) / len(data)
        assert abs(rank - q) < 0.03
    assert merged.n == 100_000


def test_kll_cdf_and_serde():
    s = KLL().add_values(np.arange(10_000, dtype=float))
    assert abs(s.cdf(5000) - 0.5) < 0.03
    s2 = KLL.from_bytes(s.to_bytes())
    assert s2.n == s.n
    assert abs(s2.quantile(0.5) - s.quantile(0.5)) < 1e-9


def test_kll_deterministic():
    a = KLL().add_values(np.arange(50_000, dtype=float))
    b = KLL().add_values(np.arange(50_000, dtype=float))
    assert a.quantiles([0.1, 0.5, 0.9]) == b.quantiles([0.1, 0.5, 0.9])
