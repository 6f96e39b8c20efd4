"""Skew stress: one giant hot key / hot bucket must not blow up memory or
miscount (north_rule: skew-key handling explicit; SURVEY.md §4.2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fdpg_query_data_validation_ray.stages.unique import duplicate_keys


def test_uniqueness_one_hot_key_dominating(ray_session):
    import ray.data as rd

    n, hot = 60_000, 20_000
    rng = np.random.default_rng(1)
    repo = np.array([f"r{i}" for i in rng.integers(0, 10_000, n)], dtype=object)
    path = np.array([f"p{i}" for i in range(n)], dtype=object)
    # one key occupies a third of the table — worst-case shuffle skew for a
    # naive key groupby; the sieve moves only int64 hashes + the hot rows
    repo[:hot] = "hot/repo"
    path[:hot] = "same/path"
    t = pa.table({"repo": repo, "path": path})
    ds = rd.from_arrow(t).repartition(16)
    dups = duplicate_keys(ds, ["repo", "path"]).to_pandas()
    assert len(dups) == 1
    assert dups.iloc[0]["dup_count"] == hot
    assert dups.iloc[0]["repo"] == "hot/repo"


def test_minhash_identical_clique_bounded(ray_session):
    """A clique of identical documents (every band collides) completes and
    emits each pair exactly once (canonical-band uniqueness)."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import minhash_near_duplicates

    n_clique, n_noise = 60, 500
    texts = ["alpha beta gamma delta epsilon zeta eta theta " * 4] * n_clique + [
        f"unique document number {i} with its own words {i * 7} {i * 13}"
        for i in range(n_noise)
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ds = rd.from_arrow(t).repartition(8)
    pairs = minhash_near_duplicates(ds, "text", "doc_id", threshold=0.9).to_pandas()
    clique_pairs = pairs[(pairs.id_a < n_clique) & (pairs.id_b < n_clique)]
    expected = n_clique * (n_clique - 1) // 2
    assert len(clique_pairs) == expected
    assert not clique_pairs.duplicated(["id_a", "id_b"]).any()


def test_duplicate_keys_shuffle_mode_matches_sieve(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    repo = np.array([f"r{i}" for i in rng.integers(0, 500, 5000)], dtype=object)
    path = np.array([f"p{i}" for i in rng.integers(0, 40, 5000)], dtype=object)
    t = pa.table({"repo": repo, "path": path})
    a = duplicate_keys(rd.from_arrow(t).repartition(8), ["repo", "path"]).to_pandas()
    b = duplicate_keys(
        rd.from_arrow(t).repartition(8), ["repo", "path"], mode="shuffle"
    ).to_pandas()
    assert a.equals(b)
    assert len(a) > 0  # this density guarantees collisions
