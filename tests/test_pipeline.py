"""Flagship checkpointed validation pipeline: goldens, resume, determinism.

Mirrors the reference's end-to-end assertion tests
(/root/reference/extraction/test/test_profiles.py:7-215): curated defect
corpora → assert specific issues with exact severity/location/counts; plus the
resume and determinism fixtures from FIXTURES.md (no reference analog — the
reference is one-shot, extraction/main.py:296-304).
"""

from __future__ import annotations

import copy
import json
import os

import pytest

import fdpg_query_data_validation_ray as qdv
from fdpg_query_data_validation_ray.sources.corpus import (
    LANGS,
    DefectSpec,
    generate_corpus,
    repo_dim,
    write_corpus_partitioned,
)
from fdpg_query_data_validation_ray.pipelines.validate import (
    ValidationPlan,
    read_digests,
    read_violations,
    run_validation,
)

DEFECTS = DefectSpec(
    null_content=10,
    null_commit=2,
    bad_commit=8,
    bad_lang=15,
    dup_groups=(2, 3, 50),
    dangling_repo=7,
    missing_suite_lang=4,
)


def make_plan(dim_keys) -> ValidationPlan:
    suite = qdv.Suite(
        "code",
        [
            qdv.not_null("content"),
            qdv.not_null("commit"),
            qdv.regex("commit", "[0-9a-f]{40}"),
        ],
        key_columns=["repo", "path", "commit"],
    )
    registry = qdv.SuiteRegistry(
        routing_column="lang",
        routes={l: suite for l in (*LANGS, "klingon", "cobol77")},
    )
    return ValidationPlan(
        registry=registry,
        unique_keys=["repo", "path", "commit"],
        fk_broadcast=[{"columns": ["repo"], "dim_keys": dim_keys, "name": "repos"}],
        stats_columns=["repo", "lang", "content"],
        categorical=["lang"],
        content_column="content",
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    t = generate_corpus(2000, seed=42, defects=DEFECTS)
    d = tmp_path_factory.mktemp("corpus")
    files = write_corpus_partitioned(t, str(d), 6)
    return t, files, repo_dim(t)["repo"].to_pylist()


def run(files, dim_keys, out, **kw):
    return run_validation(files, out, make_plan(dim_keys), num_partitions=4, **kw)


def test_flagship_report_goldens(ray_session, corpus, tmp_path):
    t, files, dim = corpus
    report = run(files, dim, str(tmp_path / "run1"))

    assert report["passed"] is False
    assert report["total_rows_checked"] == 2000
    by_rule = {g["rule_id"]: g for g in report["validation"]}
    assert by_rule["not_null(content)"]["count"] == 10
    assert by_rule["not_null(commit)"]["count"] == 2
    assert by_rule["regex(commit)"]["count"] == 8
    assert by_rule["foreign_key(repo->repos)"]["count"] == 7
    # dup groups: 3 duplicate-key issues (2,3,50) dedup-counted into one group
    assert by_rule["unique(repo,path,commit)"]["count"] == 3
    # missing-suite warnings: 4 fortran rows in the general channel
    gen = {g["rule_id"]: g for g in report["general"]}
    assert gen["missing_suite"]["count"] == 4
    assert gen["missing_suite"]["severity"] == "warning"
    # distribution channel present with stats
    assert report["distribution"]["lang"]["count"] == 2000
    # verdicts: 4 partitions, all rows covered
    assert len(report["verdicts"]) == 4
    assert sum(v["rows_checked"] for v in report["verdicts"].values()) == 2000
    for v in report["verdicts"].values():
        assert v["lineage"]["config_hash"] == report["config_hash"]


def test_violations_and_digests_readable(ray_session, corpus, tmp_path):
    t, files, dim = corpus
    out = str(tmp_path / "run2")
    run(files, dim, out)
    v = read_violations(out)
    assert set(v.column_names) == {
        "rule_id", "severity", "location", "diagnostics", "row_key", "actual"
    }
    # sha256 invariant per row (digests emitted because content_column is set)
    import hashlib

    d = read_digests(out).to_pylist()
    assert len(d) == 2000
    content_by_key = {}
    import pyarrow.parquet as pq

    for f in files:
        tt = pq.read_table(f)
        for r in tt.to_pylist():
            content_by_key[f"{r['repo']}|{r['path']}|{r['commit'] or ''}"] = r["content"]
    for row in d[:200]:
        c = content_by_key[row["row_key"]]
        expect = None if c is None else hashlib.sha256(c.encode()).hexdigest()
        assert row["content_sha256"] == expect


def test_resume_after_kill_is_byte_identical(ray_session, corpus, tmp_path, monkeypatch):
    # threads dispatch: the simulated crash is injected by monkeypatching
    # RunManifest.commit_partition, which only reaches code running in THIS
    # process — task dispatch runs partitions in worker processes where the
    # patch does not exist. Resume semantics are dispatch-independent (same
    # _run_one_partition, same manifest); worker-side failure handling is
    # covered by the error-channel tests.
    monkeypatch.setenv("QDV_PARTITION_DISPATCH", "threads")
    t, files, dim = corpus
    out_full = str(tmp_path / "full")
    report_full = run(files, dim, out_full)

    # interrupted run: die after 2 committed partitions
    out_resume = str(tmp_path / "resumed")
    from fdpg_query_data_validation_ray.state import checkpoint as cp

    orig = cp.RunManifest.commit_partition
    calls = {"n": 0}

    def dying(self, pid, verdict, tmp_dir):
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return orig(self, pid, verdict, tmp_dir)

    monkeypatch.setattr(cp.RunManifest, "commit_partition", dying)
    with pytest.raises(RuntimeError):
        run(files, dim, out_resume)
    monkeypatch.setattr(cp.RunManifest, "commit_partition", orig)

    m = cp.RunManifest(out_resume)
    assert len(m.completed_partitions()) == 2  # partial progress persisted

    report_resumed = run(files, dim, out_resume)
    # byte-identical merged reports (volatile metrics excluded by design)
    assert json.dumps(report_resumed, sort_keys=True) == json.dumps(
        report_full, sort_keys=True
    )


def test_resume_with_changed_config_refuses(ray_session, corpus, tmp_path):
    t, files, dim = corpus
    out = str(tmp_path / "guard")
    run(files, dim, out)
    with pytest.raises(ValueError, match="different config"):
        run_validation(files, out, make_plan(dim[:-1]), num_partitions=4)


def test_determinism_across_batch_sizes(ray_session, corpus, tmp_path):
    t, files, dim = corpus
    r1 = run(files, dim, str(tmp_path / "d1"), batch_size=128)
    r2 = run(files, dim, str(tmp_path / "d2"), batch_size=977)
    # the WHOLE report — including quantiles_approx, now DDSketch-backed and
    # therefore a pure function of the input multiset — is bit-identical
    # under different batch splits
    assert json.dumps(r1, sort_keys=True) == json.dumps(r2, sort_keys=True)

    # sorted per-row violation sets identical
    def vset(o):
        t = read_violations(o)
        return sorted(map(str, sorted(t.to_pylist(), key=str)))

    assert vset(str(tmp_path / "d1")) == vset(str(tmp_path / "d2"))


def test_export_violations_ndjson_matches_parquet(ray_session, corpus, tmp_path):
    """NDJSON export is a faithful projection of the parquet artifacts:
    same multiset of violation rows; empty runs produce an empty shard."""
    import glob
    import json as _json

    from fdpg_query_data_validation_ray.pipelines.validate import (
        export_violations_ndjson,
    )

    t, files, dim = corpus
    out = str(tmp_path / "run_nd")
    run(files, dim, out)
    dest = export_violations_ndjson(out)
    rows = []
    for f in sorted(glob.glob(dest + "/*.json")):
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    rows.append(_json.loads(line))
    want = read_violations(out).to_pylist()

    def key(r):
        return tuple(sorted((k, str(v)) for k, v in r.items()))

    assert sorted(map(key, rows)) == sorted(map(key, want))
    assert len(rows) > 0
