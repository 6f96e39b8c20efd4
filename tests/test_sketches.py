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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (MG + mg_truncate + the two-pass exact plan)
# ---------------------------------------------------------------------------


def test_mg_guarantee_and_bounds():
    import numpy as np

    from fdpg_query_data_validation_ray.functions.sketches import MG

    rng = np.random.default_rng(3)
    # zipf-ish stream with a fat head, k small enough to force truncation
    items = np.array([f"t{int(v)}" for v in rng.zipf(1.3, size=20000)], object)
    k = 16
    mg = MG(k)
    for lo in range(0, len(items), 1700):  # uneven batch splits
        chunk = items[lo : lo + 1700]
        u, c = np.unique(chunk, return_counts=True)
        mg.add_counts(u.astype(object), c)
    vals, true = np.unique(items, return_counts=True)
    n = len(items)
    assert mg.n == n
    bound = n / (k + 1)
    truth = dict(zip(vals.tolist(), true.tolist()))
    # every item above the bound is PRESENT
    for v, t in truth.items():
        if t > bound:
            assert v in set(mg.keys.tolist()), v
    # estimates never overshoot and undershoot by at most the bound
    for key, est in zip(mg.keys.tolist(), mg.counts.tolist()):
        assert est <= truth[key]
        assert truth[key] - est <= bound


def test_mg_merge_tree_preserves_containment():
    import numpy as np

    from fdpg_query_data_validation_ray.functions.sketches import MG

    rng = np.random.default_rng(9)
    items = np.array([f"w{int(v)}" for v in rng.zipf(1.5, size=12000)], object)
    k = 8
    parts = np.array_split(items, 13)
    sketches = []
    for p in parts:
        u, c = np.unique(p, return_counts=True)
        sketches.append(MG(k).add_counts(u.astype(object), c))
    # pairwise random-shape merge tree
    while len(sketches) > 1:
        i = int(rng.integers(0, len(sketches) - 1))
        a = sketches.pop(i)
        b = sketches.pop(int(rng.integers(0, len(sketches))))
        sketches.append(a.merge(b))
    mg = sketches[0]
    vals, true = np.unique(items, return_counts=True)
    n = len(items)
    assert mg.n == n
    for v, t in zip(vals.tolist(), true.tolist()):
        if t > n / (k + 1):
            assert v in set(mg.keys.tolist()), v


def test_mg_roundtrip_and_estimate():
    import numpy as np

    from fdpg_query_data_validation_ray.functions.sketches import MG

    mg = MG(4).add_counts(
        np.array(["a", "b", "a", "c"], object), np.array([10, 2, 5, 1])
    )
    mg2 = MG.from_bytes(mg.to_bytes())
    assert mg2.estimate("a") == mg.estimate("a") >= 15 - mg.n / 5
    assert mg2.n == mg.n
    assert mg2.estimate("zzz") == 0


def test_heavy_terms_two_pass_exact_under_truncation(ray_session):
    """Force pass-1 MG truncation (k far below the vocab) and check the
    two-pass plan still returns the EXACT heavy set — the containment
    guarantee is what makes the lossy sketch safe."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.pipelines.queries import (
        q_heavy_terms_docs,
    )

    rng = np.random.default_rng(17)
    vocab = [f"v{i}" for i in range(500)]
    texts, counter = [], collections.Counter()
    for _ in range(300):
        toks = list(rng.choice(vocab, size=40))
        toks += ["hot1", "hot2"] * 3  # planted heavies
        counter.update(toks)
        texts.append(" ".join(toks))
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="qdv_heavy_")
    pq.write_table(
        pa.table({"doc_id": list(range(300)), "text": texts,
                  "lang": ["en"] * 300, "source": ["s"] * 300,
                  "n_chars": [len(t) for t in texts]}),
        os.path.join(d, "documents.parquet"),
    )
    # k=64 << vocab (forces truncation) but k+1 >= denom=50, so the MG
    # bound n/65 sits below the n/50 threshold — containment holds.
    got = (
        q_heavy_terms_docs(d, k=64, denom=50)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    n = sum(counter.values())
    want = sorted((t, c) for t, c in counter.items() if c * 50 > n)
    import pytest

    with pytest.raises(ValueError):
        q_heavy_terms_docs(d, k=30, denom=50)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert "hot1" in set(got.term) and "hot2" in set(got.term)


# ---------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_fp_rate():
    from fdpg_query_data_validation_ray.functions.sketches import Bloom

    rng = np.random.default_rng(11)
    added = hash64(rng.integers(0, 2**62, size=20000).astype("uint64"))
    n_bits, k = Bloom.size_for(len(added), 0.01)
    bl = Bloom(n_bits, k).add_hashes(added)
    # the hard guarantee: every added hash reports present
    assert bool(bl.contains_hashes(added).all())
    # fp rate on disjoint probes stays near the target (generous 3x slack)
    probes = hash64(rng.integers(0, 2**62, size=50000).astype("uint64"), seed=7)
    fresh = probes[~np.isin(probes, added)]
    fp = bl.contains_hashes(fresh).mean()
    assert fp < 0.03, fp


def test_bloom_merge_equals_single_pass_and_serde():
    from fdpg_query_data_validation_ray.functions.sketches import Bloom

    rng = np.random.default_rng(5)
    h = hash64(rng.integers(0, 2**62, size=9000).astype("uint64"))
    one = Bloom(1 << 17, 5).add_hashes(h)
    # partials over uneven splits, OR-merged in a scrambled order
    parts = [Bloom(1 << 17, 5).add_hashes(h[lo : lo + 1234]) for lo in range(0, len(h), 1234)]
    merged = parts[3]
    for p in parts[4:] + parts[:3]:
        merged.merge(p)
    assert np.array_equal(one.words, merged.words)
    rt = Bloom.from_bytes(merged.to_bytes())
    assert rt.n_bits == merged.n_bits and rt.k == merged.k
    assert np.array_equal(rt.words, merged.words)


def test_bloom_validation_and_size_for():
    import pytest

    from fdpg_query_data_validation_ray.functions.sketches import Bloom

    with pytest.raises(ValueError):
        Bloom(1000, 4)  # not a power of two
    with pytest.raises(ValueError):
        Bloom(1 << 10, 0)
    with pytest.raises(ValueError):
        Bloom(1 << 10, 4).merge(Bloom(1 << 11, 4))
    with pytest.raises(ValueError):
        Bloom.size_for(0, 0.01)
    n_bits, k = Bloom.size_for(1000, 0.01)
    assert n_bits >= 1000 * 9 and 1 <= k <= 16  # ~9.6 bits/item at 1%
