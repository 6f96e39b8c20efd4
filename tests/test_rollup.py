"""Grouping-sets / ROLLUP / CUBE (stages/rollup.py): level enumeration,
SQL GROUPING bitmask parity, and the decomposability invariant — every
coarser level must equal the re-aggregation of the finest level, and the
result must be partition-invariant."""

import pandas as pd
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.rollup import (
    cube_sets, grouping_level, grouping_sets, rollup_sets,
)


def test_rollup_and_cube_set_enumeration():
    assert rollup_sets(["a", "b"]) == [("a", "b"), ("a",), ()]
    assert cube_sets(["a", "b"]) == [("a", "b"), ("a",), ("b",), ()]
    assert len(cube_sets(["a", "b", "c"])) == 8


def test_grouping_level_matches_sql_bitmask():
    keys = ["a", "b"]
    # SQL GROUPING(a, b): leftmost arg is the most significant bit
    assert grouping_level(keys, ("a", "b")) == 0
    assert grouping_level(keys, ("a",)) == 1
    assert grouping_level(keys, ("b",)) == 2
    assert grouping_level(keys, ()) == 3


def _toy_table(n=2000, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k1": pa.array(rng.choice(["x", "y", "z"], n)),
            "k2": pa.array(rng.integers(0, 4, n)),
            "v": pa.array(rng.integers(-50, 50, n), pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_grouping_sets_decomposability_and_partition_invariance():
    import ray.data as rd

    t = _toy_table()

    def run(ds):
        out = grouping_sets(
            ds, keys=["k1", "k2"], value_cols=["v"], batch_size=256
        ).to_pandas()
        return out.sort_values(["lvl", "k1", "k2"], na_position="last").reset_index(
            drop=True
        )

    a = run(rd.from_arrow(t))
    b = run(rd.from_arrow(t).repartition(7))
    pd.testing.assert_frame_equal(a, b)

    df = t.to_pandas()
    finest = a[a.lvl == 0]
    # level (k1): re-aggregation of the finest level
    lvl1 = a[a.lvl == 1].set_index("k1")
    exp1 = finest.groupby("k1")[["n_rows", "sum_v"]].sum()
    pd.testing.assert_frame_equal(
        lvl1[["n_rows", "sum_v"]].sort_index(), exp1.sort_index()
    )
    # grand total equals the raw data's totals
    top = a[a.lvl == 3]
    assert len(top) == 1
    assert int(top.n_rows.iloc[0]) == len(df)
    assert int(top.sum_v.iloc[0]) == int(df.v.sum())
    # finest equals a plain pandas groupby
    exp0 = (
        df.groupby(["k1", "k2"])
        .agg(n_rows=("v", "size"), sum_v=("v", "sum"))
        .reset_index()
    )
    got0 = finest[["k1", "k2", "n_rows", "sum_v"]].reset_index(drop=True)
    got0["k2"] = got0["k2"].astype(exp0["k2"].dtype)
    pd.testing.assert_frame_equal(
        got0.sort_values(["k1", "k2"]).reset_index(drop=True),
        exp0.sort_values(["k1", "k2"]).reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_grouping_sets_requires_finest():
    import ray.data as rd

    ds = rd.from_arrow(_toy_table(50))
    with pytest.raises(ValueError):
        grouping_sets(ds, ["k1", "k2"], ["v"], sets=[("k1",), ()])
