"""Error-channel partition failure + snapshot/drift round trip."""

from __future__ import annotations

import json
import os

import pyarrow as pa

import fdpg_query_data_validation_ray as qdv
from fdpg_query_data_validation_ray.pipelines.validate import (
    ValidationPlan,
    run_validation,
    snapshot_from_run,
)
from fdpg_query_data_validation_ray.sources.corpus import (
    DefectSpec,
    generate_corpus,
    write_corpus_partitioned,
)


def _suite():
    return qdv.Suite(
        "code",
        [qdv.not_null("content")],
        key_columns=["repo", "path", "commit"],
    )


def test_unreadable_partition_becomes_error_channel(ray_session, tmp_path):
    t = generate_corpus(2000, seed=3)
    files = write_corpus_partitioned(t, str(tmp_path / "in"), 4)
    # corrupt ONE input file: that partition fails, the run continues
    with open(files[1], "wb") as f:
        f.write(b"this is not parquet")
    plan = ValidationPlan(suite=_suite(), stats_columns=["lang"])
    report = run_validation(files, str(tmp_path / "out"), plan, num_partitions=4)

    assert not report["passed"]
    verdicts = report["verdicts"]
    assert len(verdicts) == 4  # all partitions have verdicts, incl. the failed one
    failed = [pid for pid, v in verdicts.items() if not v["passed"]]
    assert len(failed) == 1
    err = [g for g in report["error"] if g["rule_id"] == "error:partition_failed"]
    assert len(err) == 1 and err[0]["count"] == 1
    # the three healthy partitions processed their rows
    assert report["total_rows_checked"] == 1500

    # transient-failure recovery: restore the file and resume — ONLY the
    # failed partition reruns, the verdict heals, the report turns green
    import pyarrow.parquet as pq

    n = t.num_rows
    bounds = [i * n // 4 for i in range(5)]
    pq.write_table(t.slice(bounds[1], bounds[2] - bounds[1]), files[1])
    report2 = run_validation(files, str(tmp_path / "out"), plan, num_partitions=4)
    assert report2["passed"]
    assert report2["total_rows_checked"] == 2000
    assert not [g for g in report2["error"] if g["rule_id"] == "error:partition_failed"]


def test_snapshot_then_drift_round_trip(ray_session, tmp_path):
    # run 1: clean corpus → snapshot
    t1 = generate_corpus(3000, seed=11)
    files1 = write_corpus_partitioned(t1, str(tmp_path / "in1"), 2)
    plan1 = ValidationPlan(
        suite=_suite(), stats_columns=["lang", "content"], categorical=["lang"]
    )
    run_validation(files1, str(tmp_path / "out1"), plan1, num_partitions=2)
    snap_path = snapshot_from_run(str(tmp_path / "out1"))
    assert os.path.exists(snap_path)

    # run 2: same distribution + drift rules → NO drift violations
    t2 = generate_corpus(3000, seed=12)
    files2 = write_corpus_partitioned(t2, str(tmp_path / "in2"), 2)
    plan2 = ValidationPlan(
        suite=_suite(),
        stats_columns=["lang", "content"],
        categorical=["lang"],
        drift_rules=[qdv.drift("lang"), qdv.drift("content", kind="length")],
        snapshot_json=open(snap_path).read(),
    )
    rep2 = run_validation(files2, str(tmp_path / "out2"), plan2, num_partitions=2)
    assert not any(
        g["rule_id"].startswith("drift") for g in rep2["general"] + rep2["validation"]
    )

    # run 3: lang distribution collapsed to one value → PSI drift fires
    t3_tab = generate_corpus(3000, seed=13)
    langs = pa.array(["python"] * t3_tab.num_rows, pa.string())
    t3 = t3_tab.set_column(t3_tab.schema.get_field_index("lang"), "lang", langs)
    files3 = write_corpus_partitioned(t3, str(tmp_path / "in3"), 2)
    rep3 = run_validation(
        files3,
        str(tmp_path / "out3"),
        ValidationPlan(
            suite=_suite(),
            stats_columns=["lang", "content"],
            categorical=["lang"],
            drift_rules=[qdv.drift("lang")],
            snapshot_json=open(snap_path).read(),
        ),
        num_partitions=2,
    )
    drifted = [
        g
        for g in rep3["general"] + rep3["validation"]
        if g["rule_id"].startswith("drift")
    ]
    assert len(drifted) == 1 and drifted[0]["location"] == "lang"


def test_empty_input_partition(ray_session, tmp_path):
    """A zero-row input file produces a passing verdict with 0 rows, no crash."""
    import pyarrow.parquet as pq

    t = generate_corpus(400, seed=9)
    files = write_corpus_partitioned(t, str(tmp_path / "in"), 2)
    empty = t.slice(0, 0)
    extra = str(tmp_path / "in" / "part-00002.parquet")
    pq.write_table(empty, extra)
    plan = ValidationPlan(
        suite=_suite(),
        unique_keys=["repo", "path", "commit"],
        stats_columns=["lang"],
        content_column="content",
    )
    report = run_validation(
        files + [extra], str(tmp_path / "out"), plan, num_partitions=3
    )
    assert report["passed"]
    assert report["total_rows_checked"] == 400
    assert len(report["verdicts"]) == 3
    zero = [v for v in report["verdicts"].values() if v["rows_checked"] == 0]
    assert len(zero) == 1 and zero[0]["passed"]
