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


# ---------------- DDSketch ----------------

from fdpg_query_data_validation_ray.functions.sketches import DDSketch  # noqa: E402


def _dd_data(seed=0):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [rng.lognormal(3, 2, 40_000), -rng.lognormal(1, 1, 8_000), np.zeros(2_000)]
    )


def test_dd_relative_error_bound():
    data = _dd_data()
    s = DDSketch(alpha=0.01)
    s.add_values(data)
    sd = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        true = sd[int(q * (len(sd) - 1))]
        est = s.quantile(q)
        if true == 0:
            assert est == 0.0
        else:
            # alpha value error + the sketch's rank discretisation slack
            assert abs(est - true) / abs(true) < 0.02


def test_dd_split_order_and_merge_shape_invariance():
    """The property KLL lacks: identical bytes for ANY batching / ordering /
    merge tree over the same value multiset."""
    data = _dd_data(1)
    whole = DDSketch().add_values(data)

    shuffled = data.copy()
    np.random.default_rng(7).shuffle(shuffled)
    chunked = DDSketch()
    for c in np.array_split(shuffled, 53):
        chunked.add_values(c)

    merged = DDSketch()
    for part in reversed([DDSketch().add_values(c) for c in np.array_split(data, 9)]):
        merged.merge(part)

    assert whole.to_bytes() == chunked.to_bytes() == merged.to_bytes()


def test_dd_serde_and_edge_values():
    s = DDSketch()
    s.add_values(np.array([np.nan, np.inf, -np.inf, 0.0, 5e-324, 1e308, -1e-300]))
    assert s.n == 6  # NaN dropped, everything else counted
    s2 = DDSketch.from_bytes(s.to_bytes())
    assert s2.to_bytes() == s.to_bytes()
    assert s2.quantile(0.5) == s.quantile(0.5)
    empty = DDSketch.from_bytes(DDSketch().to_bytes())
    assert np.isnan(empty.quantile(0.5))


def test_dd_extreme_quantiles_hit_min_max_buckets():
    s = DDSketch().add_values(np.array([-100.0, 1.0, 2.0, 3.0, 1000.0]))
    assert abs(s.quantile(0.0) + 100.0) / 100.0 < 0.01
    assert abs(s.quantile(1.0) - 1000.0) / 1000.0 < 0.01
