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
