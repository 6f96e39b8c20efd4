"""budget_take_per_key (stages/sampling.py): per-key budgeted prefix under
a deterministic order — exactness vs a brute-force reference, partition
invariance, and the budget-horizon pruning invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.sampling import budget_take_per_key


def _toy(n=3000, seed=13):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "key": pa.array(rng.choice(["a", "b", "c"], n)),
            "cost": pa.array(rng.integers(1, 50, n), pa.int64()),
            "h": pa.array(rng.integers(0, 1 << 60, n), pa.int64()),
            "rid": pa.array(np.arange(n), pa.int64()),
        }
    )


def _brute(t: pa.Table, budget: int) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["key", "h", "rid"], kind="mergesort")
    df["cum_cost"] = df.groupby("key", sort=False)["cost"].cumsum()
    return (
        df[df["cum_cost"] <= budget]
        .sort_values(["key", "h", "rid"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_matches_brute_force_and_partition_invariant():
    import ray.data as rd

    t = _toy()
    budget = 4000

    def run(ds):
        out = budget_take_per_key(
            ds, "key", "cost", "h", budget, "rid", n_buckets=16
        ).to_pandas()
        return (
            out[["key", "cost", "h", "rid", "cum_cost"]]
            .sort_values(["key", "h", "rid"])
            .reset_index(drop=True)
        )

    a = run(rd.from_arrow(t))
    b = run(rd.from_arrow(t).repartition(11))
    pd.testing.assert_frame_equal(a, b)
    exp = _brute(t, budget)[["key", "cost", "h", "rid", "cum_cost"]]
    exp["cum_cost"] = exp["cum_cost"].astype("int64")
    pd.testing.assert_frame_equal(a, exp, check_dtype=False)
    # per-key totals within budget, and maximal (adding the next row in
    # order would cross it) — check via the brute frame
    for k, g in a.groupby("key"):
        assert g["cum_cost"].max() <= budget


@pytest.mark.usefixtures("ray_session")
def test_budget_zero_and_tiny_budget():
    import ray.data as rd

    t = _toy(200, seed=5)
    out = budget_take_per_key(
        rd.from_arrow(t), "key", "cost", "h", 0, "rid", n_buckets=4
    ).to_pandas()
    assert len(out) == 0
    # budget = smallest first cost keeps exactly the keys whose first
    # ordered row fits
    exp = _brute(t, 7)
    got = budget_take_per_key(
        rd.from_arrow(t), "key", "cost", "h", 7, "rid", n_buckets=4
    ).to_pandas()
    assert len(got) == len(exp)
