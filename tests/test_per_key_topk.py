"""Per-key TOP-K (first_n_per_key with descending order columns)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_first_n_per_key_descending_topk(ray_session):
    """Top-k per key by value DESC with id tiebreak: matches the pandas
    ROW_NUMBER brute force and is invariant to partitioning/batching."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    rng = np.random.default_rng(29)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c", "d"], n), pa.string()),
            "id": pa.array(np.arange(n), pa.int64()),
            # coarse values -> plenty of exact ties for the id tiebreak
            "v": pa.array(rng.integers(0, 40, n), pa.int64()),
        }
    )

    def run(parts):
        return (
            first_n_per_key(
                rd.from_arrow(t).repartition(parts), 7, "k", ["v", "id"],
                rank_column="rnk", ascending=[False, True])
            .to_pandas().sort_values(["k", "rnk"]).reset_index(drop=True)
        )

    a, b = run(2), run(19)
    pd.testing.assert_frame_equal(a, b)

    df = t.to_pandas().sort_values(["v", "id"], ascending=[False, True])
    ref = df.groupby("k", sort=False).head(7)
    ref = ref.assign(rnk=ref.groupby("k", sort=False).cumcount() + 1)
    ref = ref.sort_values(["k", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["k", "id", "v", "rnk"]], ref[["k", "id", "v", "rnk"]]
    )


def test_first_n_per_key_scalar_ascending_back_compat(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    t = pa.table(
        {
            "k": pa.array(["x", "x", "x", "y"], pa.string()),
            "id": pa.array([3, 1, 2, 9], pa.int64()),
        }
    )
    out = (
        first_n_per_key(rd.from_arrow(t), 2, "k", ["id"])
        .to_pandas().sort_values(["k", "rank"]).reset_index(drop=True)
    )
    assert out["id"].tolist() == [1, 2, 9]
    assert out["rank"].tolist() == [1, 2, 1]
