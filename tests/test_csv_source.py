"""CSV source: read → normalize → validate end-to-end parity with the
parquet path, plus job-CLI staging (the lowest-common-denominator
interchange format next to the NDJSON wire format)."""

from __future__ import annotations

import pyarrow as pa


def test_csv_roundtrip_and_validation_parity(ray_session, tmp_path):
    import ray.data as rd

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.sources.corpus import (
        DefectSpec,
        generate_corpus,
    )
    from fdpg_query_data_validation_ray.sources.csvsrc import (
        csv_to_parquet,
        read_csv,
        write_csv,
    )
    from fdpg_query_data_validation_ray.stages.row_checks import RowChecker

    t = generate_corpus(500, seed=9, defects=DefectSpec(null_content=5, bad_commit=4))
    f1, f2 = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    write_csv(t.slice(0, 250), f1)
    write_csv(t.slice(250), f2)

    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]
    )
    suite = qdv.Suite(
        "code",
        [qdv.not_null("content"), qdv.regex("commit", "[0-9a-f]{40}")],
        key_columns=["repo", "path", "commit"],
    )

    def violations(ds):
        out = ds.map_batches(
            RowChecker(suite=suite), batch_format="pyarrow"
        ).to_pandas()
        return out.sort_values(["rule_id", "row_key"]).reset_index(drop=True)

    v_csv = violations(read_csv([f1, f2], schema=schema))
    assert (v_csv.groupby("rule_id").size().to_dict()
            == {"not_null(content)": 5, "regex(commit)": 4})

    # parity with the parquet path over the converted copy
    pq_dir = csv_to_parquet([f1, f2], str(tmp_path / "pq"), schema=schema)
    v_parquet = violations(rd.read_parquet(pq_dir))
    assert v_csv.equals(v_parquet)

    # missing columns normalize to typed nulls; inferred ints pin to schema
    f3 = str(tmp_path / "ragged.csv")
    write_csv(pa.table({"repo": ["r1"], "path": ["p"]}), f3)
    ragged = read_csv([f3], schema=schema).to_pandas()
    assert list(ragged.columns) == [f.name for f in schema]
    assert ragged["content"].isna().all()


def test_job_cli_from_csv(ray_session, tmp_path):
    """Job CLI end-to-end from CSV shards: staged once to parquet (manifest
    fingerprint), full validation, and a re-submit that reuses the staged
    parquet without reconversion."""
    import json as json_mod
    import os

    from fdpg_query_data_validation_ray.sources.corpus import (
        DefectSpec,
        generate_corpus,
    )
    from fdpg_query_data_validation_ray.sources.csvsrc import write_csv
    from jobs.validate_job import main as job_main

    t = generate_corpus(400, seed=13, defects=DefectSpec(null_content=5, bad_commit=3))
    half = t.num_rows // 2
    write_csv(t.slice(0, half), str(tmp_path / "shard0.csv"))
    write_csv(t.slice(half), str(tmp_path / "shard1.csv"))
    out = tmp_path / "out"

    args = [
        "--input", str(tmp_path / "shard*.csv"),
        "--input-format", "csv",
        "--out", str(out),
        "--config", "configs/code_suite.json",
        "--partitions", "2",
    ]
    rc = job_main(args)
    assert rc == 1  # defects injected → failed verdict
    report = json_mod.load(open(out / "report.json"))
    assert report["total_rows_checked"] == 400
    # every route checks not_null(content); bad commits only surface in
    # routes that carry the regex rule, so 5 is the guaranteed floor
    assert report["total_violations"] >= 5
    staged = sorted((out / "_staged_parquet").glob("*.parquet"))
    assert staged
    mtimes = [p.stat().st_mtime_ns for p in staged]

    # unchanged inputs → staging skipped (same parquet files), run resumes
    rc2 = job_main(args)
    assert rc2 == 1
    assert [p.stat().st_mtime_ns for p in staged] == mtimes
    report2 = json_mod.load(open(out / "report.json"))
    assert report2 == report
