"""Round-2 ADVICE regression tests: resume plan guard, verdict-content cache
key, jsonfield duplicate-key parity."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest


def test_resume_refuses_changed_partition_plan(tmp_path):
    from fdpg_query_data_validation_ray.state.checkpoint import RunManifest

    m = RunManifest(str(tmp_path))
    cfg = {
        "config_hash": "abc",
        "partitions": {"p00000": ["a.parquet"]},
        "input_files": ["a.parquet"],
    }
    m.write_run_config(cfg)
    m.write_run_config(cfg)  # identical resume is fine
    with pytest.raises(ValueError, match="partitions"):
        m.write_run_config(dict(cfg, partitions={"p00000": ["b.parquet"]}))
    with pytest.raises(ValueError, match="input_files"):
        m.write_run_config(dict(cfg, input_files=["a.parquet", "b.parquet"]))


def test_extract_int_field_duplicate_keys_internally_consistent():
    """A flat object with a repeated key must return the LAST value (the
    json.loads fallback's semantics) on EVERY path — the regex fast path used
    to return the first occurrence for flat rows. Duplicate keys are
    undefined JSON (DuckDB's json_extract keeps the first); what matters is
    that the operator's answer does not depend on which path a row takes."""
    from fdpg_query_data_validation_ray.functions.jsonfield import extract_int_field

    col = pa.array(
        [
            '{"k": 1, "k": 2}',
            '{"k": 5}',
            '{"a": 1, "k": 7, "b": 2}',
            '{"kk": 3, "k": 9}',  # substring '"k"' appears once; fast path ok
            None,
        ]
    )
    out = extract_int_field(col, "k").to_pylist()
    assert out == [2, 5, 7, 9, None]


def test_global_phase_cache_key_uses_verdict_content(tmp_path):
    """Two different verdict files must produce different partitions_hash even
    when neither carries wall_s (the old timing-proxy key collided)."""
    import hashlib
    import os

    from fdpg_query_data_validation_ray.state.checkpoint import RunManifest

    def key_for(verdict: dict) -> str:
        m = RunManifest(str(tmp_path))
        pd_dir = m.partition_dir("p00000")
        os.makedirs(pd_dir, exist_ok=True)
        with open(os.path.join(pd_dir, "verdict.json"), "w") as f:
            json.dump(verdict, f)
        with open(os.path.join(pd_dir, "verdict.json"), "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    fail_a = {"complete": True, "failed": True, "metrics": {"failed": True},
              "lineage": {}, "passed": False, "error": "TypeError: x"}
    fail_b = {"complete": True, "failed": True, "metrics": {"failed": True},
              "lineage": {}, "passed": False, "error": "ValueError: y"}
    assert key_for(fail_a) != key_for(fail_b)
