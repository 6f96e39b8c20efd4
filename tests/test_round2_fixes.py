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


def test_in_set_values_file_and_lineage(ray_session, tmp_path):
    """Value-set file loader (reference: value_sets/ mounted into the
    terminology service): in_set resolves file + literal union, and the run's
    config_hash tracks the file CONTENT, not just the path."""
    import pyarrow as pa

    from fdpg_query_data_validation_ray.pipelines.validate import ValidationPlan
    from fdpg_query_data_validation_ray.rules import Suite, in_set
    from fdpg_query_data_validation_ray.stages.row_checks import RowChecker

    vf = tmp_path / "langs.txt"
    vf.write_text("en\nde\n")
    suite = Suite(
        "s", [in_set("lang", values=["fr"], values_file=str(vf))],
        key_columns=("doc_id",),
    )
    checker = RowChecker(suite=suite)
    t = pa.table({"doc_id": [1, 2, 3, 4], "lang": ["en", "de", "fr", "xx"]})
    v = checker(t)
    assert v.num_rows == 1 and v["actual"].to_pylist() == ["xx"]

    h1 = ValidationPlan(suite=suite).config_hash()
    vf.write_text("en\nde\nxx\n")  # republished set, same path
    h2 = ValidationPlan(suite=suite).config_hash()
    assert h1 != h2
    # and the checker picks up the new content (mtime-keyed memo)
    v2 = RowChecker(suite=suite)(t)
    assert v2.num_rows == 0

    # json array format
    vj = tmp_path / "langs.json"
    vj.write_text('["en", "de"]')
    s2 = Suite("s2", [in_set("lang", values_file=str(vj))], key_columns=("doc_id",))
    v3 = RowChecker(suite=s2)(t)
    assert sorted(v3["actual"].to_pylist()) == ["fr", "xx"]


def test_distribution_by_system_report(ray_session, tmp_path):
    """Per-code-system distribution split (reference analyse_distribution's
    nested path → system → count shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.rules import Rule, Suite

    t = pa.table(
        {
            "doc_id": list(range(8)),
            "lang": ["en", "en", "de", "fr", "fr", "fr", "xx", "yy"],
        }
    )
    f = str(tmp_path / "in.parquet")
    pq.write_table(t, f)
    vs = tmp_path / "romance.txt"
    vs.write_text("fr\nes\n")
    plan = ValidationPlan(
        suite=Suite("s", [Rule("not_null", "lang")], key_columns=("doc_id",)),
        stats_columns=["lang"],
        categorical=["lang"],
        code_systems={"lang": {"germanic": ["en", "de"], "romance": str(vs)}},
    )
    report = run_validation([f], str(tmp_path / "out"), plan, num_partitions=1)
    d = report["distribution_by_system"]["lang"]
    assert d["germanic"] == {"count": 3, "values": {"de": 1, "en": 2}}
    assert d["romance"] == {"count": 3, "values": {"fr": 3}}
    assert d["__unmatched__"] == {"count": 2, "values": {"xx": 1, "yy": 1}}


def test_pdf_report_sink(tmp_path):
    """The dependency-free PDF sink emits a structurally valid PDF 1.4:
    correct xref byte offsets, one page per 72 lines, deterministic bytes,
    content = the markdown report (escaped)."""
    from fdpg_query_data_validation_ray.pipelines.report_pdf import (
        render_pdf_bytes,
        write_pdf_report,
    )

    report = {
        "passed": False,
        "total_rows_checked": 123,
        "total_violations": 2,
        "config_hash": "abc (1) \\ test",
        "verdicts": {"p00000": {"passed": False, "rows_checked": 123,
                                 "violation_count": 2, "warning_count": 0}},
        "validation": [
            {"severity": "error", "rule_id": "not_null(x)", "location": "x",
             "diagnostics": "minimum required = 1, but only found 0",
             "count": 2, "sample_row_keys": ["a|b"]}
        ],
        "general": [], "error": [], "distribution": {},
        "quantiles_approx": {},
    }
    data = render_pdf_bytes(report)
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # xref offsets must point exactly at their "N 0 obj" headers
    xref_at = int(data.rstrip().rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    assert data[xref_at : xref_at + 4] == b"xref"
    lines = data[xref_at:].split(b"\n")
    n_obj = int(lines[1].split()[1])
    for oid, entry in enumerate(lines[2 : 2 + n_obj]):
        off, _gen, kind = entry.split()
        if kind == b"n":
            assert data[int(off) :].startswith(f"{oid} 0 obj".encode()), oid
    assert b"/Type /Catalog" in data and b"/BaseFont /Courier" in data
    # deterministic
    assert render_pdf_bytes(report) == data
    # escaping: parens and backslash in config hash must be escaped in stream
    assert rb"abc \(1\) \\ test" in data
    p = write_pdf_report(report, str(tmp_path / "r.pdf"))
    assert open(p, "rb").read() == data


def test_decode_key_display():
    from fdpg_query_data_validation_ray.pipelines.validate import decode_key_display

    assert decode_key_display("3:abc;2:xy") == "abc|xy"
    assert decode_key_display("3:abc;N;2:xy") == "abc||xy"
    assert decode_key_display("N") == ""
    assert decode_key_display("1:N") == "N"
    assert decode_key_display("0:;0:") == "|"
    # value containing the separators round-trips
    assert decode_key_display("5:a;b:c;1:d") == "a;b:c|d"
    # legacy raw row_keys (not encodings) pass through verbatim
    assert decode_key_display("repo|path|commit") == "repo|path|commit"
    assert decode_key_display("") == ""
    assert decode_key_display("3:ab") == "3:ab"  # truncated → verbatim


def test_pdf_severity_coloring():
    """Issue-table rows render with severity colors (the reference's colored
    LongTable rows): tint rectangle + colored text for error/warning rows,
    black for prose even when it mentions 'error'."""
    from fdpg_query_data_validation_ray.pipelines.report_pdf import (
        _line_severity,
        render_pdf_bytes,
    )

    assert _line_severity("| 2 | error | not_null(x) | x |") == "error"
    assert _line_severity("| 1 | warning | in_set(lang) | lang |") == "warning"
    assert _line_severity("the error count is 2") is None
    assert _line_severity("| rule mentions error in name | info | r | l |") == "info"

    report = {
        "passed": False,
        "total_rows_checked": 10,
        "total_violations": 2,
        "config_hash": "h",
        "verdicts": {},
        "validation": [
            {"severity": "error", "rule_id": "not_null(x)", "location": "x",
             "diagnostics": "d", "count": 1, "sample_row_keys": ["k"]},
            {"severity": "warning", "rule_id": "in_set(l)", "location": "l",
             "diagnostics": "d", "count": 1, "sample_row_keys": ["k"]},
        ],
        "general": [], "error": [], "distribution": {}, "quantiles_approx": {},
    }
    data = render_pdf_bytes(report)
    assert b"0.70 0.00 0.00 rg" in data      # error text color
    assert b"0.65 0.42 0.00 rg" in data      # warning text color
    assert b"1.00 0.89 0.89 rg" in data      # error row tint rect
    assert b" re f Q" in data
    assert render_pdf_bytes(report) == data  # still deterministic
