"""range_rank (stages/topk.py): exact ROW_NUMBER over unbounded-cardinality
keys via KLL-sampled range boundaries + exact per-range counts.

Correctness must hold for ANY boundary placement (bases come from exact
counts; ties never straddle ranges because routing is monotone in the key),
so the tests sweep n_ranges including degenerate values.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fdpg_query_data_validation_ray.stages.topk import range_rank


def _expected(df: pd.DataFrame, descending: bool) -> pd.DataFrame:
    d = df[df["k"].notna() & ~np.isnan(df["k"].fillna(0.0)) & df["i"].notna()]
    d = d.sort_values(["k", "i"], ascending=[not descending, True])
    return pd.DataFrame(
        {"i": d["i"].to_numpy(np.int64),
         "rank": np.arange(1, len(d) + 1, dtype=np.int64)}
    )


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("n_ranges", [1, 3, 16])
def test_range_rank_matches_row_number(ray_session, descending, n_ranges):
    import ray

    rng = np.random.default_rng(11)
    n = 5000
    k = rng.normal(size=n)
    k[rng.choice(n, 200, replace=False)] = 0.5  # a heavy tie group
    df = pd.DataFrame({"i": np.arange(n, dtype=np.int64), "k": k})
    df.loc[10, "k"] = np.nan
    df.loc[11, "k"] = None
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        range_rank(ds, "k", "i", descending=descending, n_ranges=n_ranges)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = _expected(df, descending).sort_values("rank").reset_index(drop=True)
    assert got["i"].tolist() == want["i"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_range_rank_degenerate_and_empty(ray_session):
    import ray

    # every key identical → everything collapses into one range; ranks are
    # then pure id order
    df = pd.DataFrame({"i": np.arange(100, dtype=np.int64), "k": 3.14})
    ds = ray.data.from_pandas(df).repartition(5)
    got = range_rank(ds, "k", "i", n_ranges=8).to_pandas().sort_values("rank")
    assert got["i"].tolist() == list(range(100))

    empty = ray.data.from_pandas(pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                                               "k": pd.Series([], dtype=float)}))
    assert range_rank(empty, "k", "i").count() == 0


def test_range_rank_auto_ranges_int_key(ray_session):
    """Integer keys route through the monotone float cast; auto n_ranges
    derives from the sketch's exact count."""
    import ray

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {"i": np.arange(n, dtype=np.int64),
         "k": rng.integers(0, 1_000_000, n).astype(np.int64)}
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        range_rank(ds, "k", "i", descending=True, rows_per_range=500)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    d = df.sort_values(["k", "i"], ascending=[False, True])
    assert got["i"].tolist() == d["i"].tolist()
    assert got["rank"].tolist() == list(range(1, n + 1))


def test_take_top_fraction_matches_pandas(ray_session):
    """Percentile cut keeps exactly ceil(n·numer/denom) rows — the top ones
    under (key DESC, id) — for any partitioning; integer threshold math."""
    import ray

    from fdpg_query_data_validation_ray.stages.topk import take_top_fraction

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame(
        {"i": np.arange(n, dtype=np.int64),
         "k": rng.normal(size=n)}
    )
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            take_top_fraction(ds, "k", "i", 1, 10, descending=True)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        thr = (n * 1 + 10 - 1) // 10
        want = df.sort_values(["k", "i"], ascending=[False, True]).head(thr)
        assert got["i"].tolist() == want["i"].tolist()
        assert got["rank"].tolist() == list(range(1, thr + 1))
    # degenerate fractions: 1/1 keeps everything; tiny n never keeps 0
    ds = ray.data.from_pandas(df.head(3))
    assert take_top_fraction(ds, "k", "i", 1, 1).count() == 3
    assert take_top_fraction(ds, "k", "i", 1, 10).count() == 1  # ceil(0.3)


def test_sample_k_deterministic_and_uniformish(ray_session):
    """sample_k: exactly k rows, identical under re-runs and repartitioning,
    stable as the corpus GROWS (hash-rank: old winners only displaced by
    better hashes, never reshuffled)."""
    import ray

    from fdpg_query_data_validation_ray.stages.sampling import sample_k

    ids = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    outs = [
        sample_k(ray.data.from_pandas(ids).repartition(p), 50, "doc_id")
        .to_pandas()["doc_id"].tolist()
        for p in (1, 6, 13)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) == 50
    # growth stability: the winning set over a SUPERSET is a superset-rank
    # re-cut — every survivor of the big corpus present in the small corpus
    # must also have won there
    big = sample_k(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": np.arange(4000, dtype=np.int64)})
        ),
        50,
        "doc_id",
    ).to_pandas()
    small_set = set(outs[0])
    for d in big["doc_id"]:
        if d < 2000:
            assert d in small_set


def test_ntile_distribution_and_edge_cases(ray_session):
    """NTILE(k): first n%k buckets get the extra row; n<k degenerates to
    bucket==rank; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.topk import ntile

    rng = np.random.default_rng(31)
    n = 1003                      # 1003 = 4*250 + 3 -> sizes 251,251,251,250
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.normal(0, 1, n), pa.float64()),
    })

    def run(parts):
        return (
            ntile(rd.from_arrow(t).repartition(parts), 4, "v", "id")
            .to_pandas().sort_values("rank").reset_index(drop=True)
        )

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a, b)
    sizes = a.groupby("bucket").size()
    assert sizes.tolist() == [251, 251, 251, 250]
    # bucket is monotone in rank and matches the integer NTILE formula
    q, r = divmod(n, 4)
    cut = r * (q + 1)
    rk = a["rank"].to_numpy()
    want = np.where(rk <= cut, (rk - 1) // (q + 1) + 1,
                    r + (rk - 1 - cut) // q + 1)
    assert (a["bucket"].to_numpy() == want).all()
    # order agrees with a full sort
    df = t.to_pandas().sort_values(["v", "id"]).reset_index(drop=True)
    assert (a["id"].to_numpy() == df["id"].to_numpy()).all()

    # n < k: one row per bucket, bucket == rank
    small = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "v": pa.array([5.0, 1.0], pa.float64())})
    s = (ntile(rd.from_arrow(small), 7, "v", "id")
         .to_pandas().sort_values("rank"))
    assert s["bucket"].tolist() == [1, 2]
    assert s["id"].tolist() == [2, 1]
