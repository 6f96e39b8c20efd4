"""DedupLinesStage (intra-doc line dedup), multiset_intersect (INTERSECT
ALL with counts), and the unpivot melt shape."""

import pyarrow as pa
import pytest


def test_dedup_lines_keeps_first_occurrence(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import DedupLinesStage

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a\nb\na\nc\nb", "x\nx\nx", None], pa.string()
            ),
        }
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in rd.from_arrow(t)
        .map_batches(DedupLinesStage(), batch_format="pyarrow")
        .take_all()
    }
    assert out[1] == ("a\nb\nc", 2)
    assert out[2] == ("x", 2)
    assert out[3] == ("", 0)


def test_dedup_lines_batch_split_invariant(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import DedupLinesStage

    texts = [f"l{i%3}\nl{i%2}\nl{i%3}" for i in range(40)]
    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    one = (
        rd.from_arrow(t)
        .map_batches(DedupLinesStage(), batch_format="pyarrow", batch_size=40)
        .take_all()
    )
    many = (
        rd.from_arrow(t)
        .repartition(8)
        .map_batches(DedupLinesStage(), batch_format="pyarrow", batch_size=3)
        .take_all()
    )
    key = lambda rows: sorted((r["doc_id"], r["text_clean"], r["n_removed"]) for r in rows)
    assert key(one) == key(many)


def test_multiset_intersect_min_multiplicity(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import multiset_intersect

    a = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["x", "x", "x", "y", "z", None], pa.string()),
                "j": pa.array([1, 1, 1, 2, 3, 4], pa.int64()),
            }
        )
    )
    b = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["x", "x", "y", "y", None, None], pa.string()),
                "j": pa.array([1, 1, 2, 2, 4, 4], pa.int64()),
            }
        )
    )
    rows = {
        (r["k"], r["j"]): r["n_common"]
        for r in multiset_intersect(a, b, ["k", "j"]).take_all()
    }
    # (z,3) only in a → absent; nulls group as equal (1 in a, 2 in b → 1)
    assert rows == {("x", 1): 2, ("y", 2): 1, (None, 4): 1}


def test_grouped_median_matches_numpy_lower_median(ray_session, tmp_path):
    """q_median_value_by_type vs a numpy lower-median reference on a synthetic
    events table with ties, including an even-count group."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.queries import (
        q_median_value_by_type,
    )

    rng = np.random.RandomState(5)
    n = 4000
    types = rng.choice(["a", "b", "c"], n)
    value = np.round(rng.uniform(0, 50, n), 2)
    value[types == "c"] = np.round(value[types == "c"] * 0 + 7.77, 2)  # all ties
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array([0] * n, pa.int64()),
            "user_id": pa.array(np.zeros(n), pa.float64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_median_value_by_type(str(tmp_path))
    got = dict(
        zip(
            out["event_type"].to_pylist(), out["median_cents"].to_pylist()
        )
    )
    want = {}
    for ty in ["a", "b", "c"]:
        vc = np.sort(np.round(value[types == ty] * 100).astype(np.int64))
        want[ty] = int(vc[(len(vc) + 1) // 2 - 1])
    assert got == want


def test_weighted_sample_statistics_and_determinism(ray_session):
    """weighted_sample_k: inclusion frequency tracks weight (10x weight →
    ~10x inclusion under repeated salts), deterministic per salt,
    partition-invariant, superset-stable under k growth."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.sampling import (
        weighted_sample_k,
    )

    n = 400
    w = np.where(np.arange(n) < 40, 50, 5)  # 40 heavy rows (10x weight)
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )

    def run(salt, k=60, parts=3):
        ds = rd.from_arrow(t).repartition(parts)
        rows = weighted_sample_k(ds, k, "id", "w", salt=salt).take_all()
        return [r["id"] for r in rows]

    assert run("a") == run("a")  # deterministic
    assert run("a", parts=1) == run("a", parts=7)  # partition-invariant
    assert set(run("a", k=30)) <= set(run("a", k=60))  # nested samples
    heavy = 0
    total = 0
    for salt in ("s0", "s1", "s2", "s3", "s4"):
        ids = run(salt)
        heavy += sum(1 for i in ids if i < 40)
        total += len(ids)
    # heavy rows hold 2000/3800 of the mass; expect ~53% of inclusions.
    # Loose band (5 salts x 60 draws): statistical, not flaky.
    frac = heavy / total
    assert 0.35 < frac < 0.7, frac
