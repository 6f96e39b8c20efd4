"""Two-level suite routing, markdown report, and issue helper tests."""

from __future__ import annotations

import pyarrow as pa

import fdpg_query_data_validation_ray as qdv
from fdpg_query_data_validation_ray.rules import SuiteRegistry
from fdpg_query_data_validation_ray.pipelines.report_md import (
    filter_issues_by_location,
    issues_by_severity,
    normalize_location,
    render_markdown,
    sorted_by_severity,
)
from fdpg_query_data_validation_ray.stages.row_checks import RowChecker


def _suites():
    keys = ["repo", "path", "commit"]
    strict = qdv.Suite("strict", [qdv.not_null("content"),
                                  qdv.regex("commit", "[0-9a-f]{40}")], keys)
    lax = qdv.Suite("lax", [qdv.not_null("content")], keys)
    return strict, lax


def _table():
    return pa.table(
        {
            "repo": ["a/r1", "a/r1", "b/r2", "b/r2"],
            "path": ["f1", "f2", "f3", "f4"],
            "commit": ["zz", "zz", "zz", "zz"],  # always fails the regex rule
            "lang": ["python", "python", "python", "fortran"],
            "content": ["x", None, "y", "z"],
        }
    )


def test_two_level_routing_resolves_by_sub_value():
    strict, lax = _suites()
    reg = SuiteRegistry(
        routing_column="lang",
        routes={"python": strict},
        sub_column="repo",
        sub_routes={"python": {"b/r2": lax}},
    )
    checker = RowChecker(registry=reg)
    v = checker(_table()).to_pandas()
    # a/r1 rows take the level-1 strict suite: regex violations on both rows
    assert len(v[(v.rule_id == "regex(commit)")]) == 2
    # b/r2 python row routed to lax by sub value: no regex violation for f3
    assert not any(v[(v.rule_id == "regex(commit)")]["row_key"].str.contains("b/r2"))
    # null content caught regardless of route
    assert len(v[v.rule_id == "not_null(content)"]) == 1
    # fortran has no route at all → missing_suite warning
    miss = v[v.rule_id == "missing_suite"]
    assert len(miss) == 1 and miss.iloc[0]["severity"] == "warning"


def test_two_level_routing_json_roundtrip():
    strict, lax = _suites()
    reg = SuiteRegistry(
        routing_column="lang",
        routes={"python": strict},
        sub_column="repo",
        sub_routes={"python": {"b/r2": lax}},
    )
    reg2 = SuiteRegistry.from_json(reg.to_json())
    assert reg2.sub_column == "repo"
    assert reg2.resolve("python", "b/r2").name == "lax"
    assert reg2.resolve("python", "other").name == "strict"
    assert reg.to_json() == reg2.to_json()


ISSUES = [
    {"rule_id": "r1", "severity": "warning", "location": "files[3].name",
     "diagnostics": "d", "count": 2, "sample_row_keys": ["k1"]},
    {"rule_id": "r2", "severity": "fatal", "location": "content",
     "diagnostics": "d", "count": 1, "sample_row_keys": []},
    {"rule_id": "r3", "severity": "error", "location": "commit",
     "diagnostics": "d", "count": 5, "sample_row_keys": ["k2", "k3"]},
]


def test_issue_helpers():
    assert normalize_location("files[3].name") == "files[*].name"
    assert normalize_location("a[12].b[0]") == "a[*].b[*]"
    assert [i["rule_id"] for i in sorted_by_severity(ISSUES)] == ["r2", "r3", "r1"]
    assert filter_issues_by_location(ISSUES, "commit") == [ISSUES[2]]
    assert issues_by_severity(ISSUES, "fatal") == [ISSUES[1]]


def test_render_markdown_shape():
    report = {
        "passed": False,
        "total_rows_checked": 10,
        "total_violations": 6,
        "config_hash": "abc",
        "validation": [ISSUES[1], ISSUES[2]],
        "general": [ISSUES[0]],
        "error": [],
        "verdicts": {"p00000": {"passed": False, "rows_checked": 10,
                                "violation_count": 6, "warning_count": 2}},
        "distribution": {"lang": {"count": 10, "nulls": 0, "null_ratio": 0.0,
                                  "distinct_hll": 3.0, "min": "de", "max": "python"}},
        "quantiles_approx": {"n_chars": {"p50": 100.0, "p99": 400.0}},
    }
    md = render_markdown(report)
    assert "FAILED" in md
    assert "| p00000 |" in md
    assert "files[*].name" in md  # normalized location
    assert "## Column statistics" in md
    assert "## Quantiles" in md


def test_multimodal_query(ray_session):
    from fdpg_query_data_validation_ray.pipelines.queries import q_multimodal_decode

    out = q_multimodal_decode("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500  # one row per sf0.001 document
    assert out["width"].notna().all()
    # resize by factor 2 halves (ceil) the original 8..31 × 8..23 dims
    assert out["width"].between(4, 16).all()
    assert out["height"].between(4, 12).all()
    assert out["mean_intensity"].between(0, 255).all()


def test_empty_string_routing_value_not_dropped():
    """Regression: rows whose routing (or sub-routing) column holds an actual
    empty string must still be validated / warned, not silently skipped."""
    strict, lax = _suites()
    reg = SuiteRegistry(
        routing_column="lang",
        routes={"python": strict},
        sub_column="repo",
        sub_routes={"python": {"b/r2": lax}},
    )
    t = pa.table(
        {
            "repo": ["", "a/r1"],
            "path": ["f1", "f2"],
            "commit": ["zz", "zz"],
            "lang": ["python", ""],       # row 2: empty routing value
            "content": [None, None],      # both violate not_null under a suite
        }
    )
    v = RowChecker(registry=reg)(t).to_pandas()
    # row 1: lang=python, repo="" → no sub route for "" → falls back to strict
    assert (v["rule_id"] == "not_null(content)").sum() == 1
    assert (v["rule_id"] == "regex(commit)").sum() == 1
    # row 2: lang="" has no route → missing_suite warning, NOT silence
    miss = v[v.rule_id == "missing_suite"]
    assert len(miss) == 1 and miss.iloc[0]["actual"] == ""
    # every row accounted for: no row escaped both branches
    assert set(v["row_key"]) == {"|f1|zz", "a/r1|f2|zz"}


def test_routing_breakdown_golden():
    """Two-level (suite → sub-route) report breakdown — reference parity
    with the per-type + per-LOINC sub-table rendering
    (latex_report/report_visualizer.py:144-230): routes render in REGISTRY
    order (never alphabetized), a sub-routed key expands into one row per
    sub value plus the level-1 '(other)' fallback row, and missing-route
    warnings roll up into '(unrouted)'. Golden snapshot of the markdown
    section."""
    from fdpg_query_data_validation_ray.pipelines.report_md import (
        routing_breakdown,
    )

    strict, lax = _suites()
    reg = SuiteRegistry(
        routing_column="lang",
        # 'zeta' before 'python' on purpose: the breakdown must keep THIS
        # order, not sort
        routes={"zeta": lax, "python": strict},
        sub_column="repo",
        sub_routes={"python": {"b/r2": lax}},
    )
    report = {
        "passed": False,
        "total_rows_checked": 4,
        "total_violations": 3,
        "config_hash": "deadbeef",
        "validation": [
            {"rule_id": "regex(commit)", "severity": "error",
             "location": "commit", "diagnostics": "d", "count": 2,
             "sample_row_keys": []},
            {"rule_id": "not_null(content)", "severity": "error",
             "location": "content", "diagnostics": "d", "count": 1,
             "sample_row_keys": []},
        ],
        "general": [
            {"rule_id": "missing_suite", "severity": "warning",
             "location": "lang", "diagnostics": "d", "count": 5,
             "sample_row_keys": []},
        ],
    }
    rows = routing_breakdown(report, reg)
    assert rows == [
        {"route": "zeta", "sub_route": None, "suite": "lax", "n_issues": 1},
        {"route": "python", "sub_route": "b/r2", "suite": "lax", "n_issues": 1},
        {"route": "python", "sub_route": "(other)", "suite": "strict",
         "n_issues": 3},
        {"route": "(unrouted)", "sub_route": None, "suite": None,
         "n_issues": 5},
    ]

    md = render_markdown(report, registry=reg)
    golden = """## Routing breakdown (suite → sub-route)
| route | sub-route | suite | issues |
|---|---|---|---|
| zeta |  | lax | 1 |
| python | b/r2 | lax | 1 |
| python | (other) | strict | 3 |
| (unrouted) |  |  | 5 |"""
    assert golden in md
    # without a registry the section is absent (backward compatible)
    assert "Routing breakdown" not in render_markdown(report)

    # the PDF sink inherits the section (its text IS the markdown)
    from fdpg_query_data_validation_ray.pipelines.report_pdf import (
        render_pdf_bytes,
    )

    pdf = render_pdf_bytes(report, registry=reg)
    assert b"Routing breakdown" in pdf and pdf.startswith(b"%PDF-1.4")
