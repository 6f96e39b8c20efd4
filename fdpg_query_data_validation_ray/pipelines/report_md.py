"""Markdown report emitter + issue filter/normalize helpers.

Reference analog: the PDF report generator (latex_report/report_visualizer.py
— DataQualityReport.generate_report :397-447 renders distribution tables,
severity-sorted issue tables per type, FDPG/general splits). The engine keeps
report rendering at the driver over the small merged report dict; markdown
replaces LaTeX/PDF (S6 in SURVEY.md §2.1 — PDF toolchain out of engine
scope).

Helpers mirror the reference's issue post-processing:
- filter_issues_by_location  — substring filter on location
  (report_visualizer.py:267-279, F1)
- issues_by_severity         — equality filter (report_visualizer.py:342-344, F3)
- normalize_location         — generic-path collapse `[3]` → `[*]`
  (IssueSet.py:39-40, M5; the resource-type rewrite of
  report_visualizer.py:325-340, M6, is the same idea)
- sorted_by_severity         — fatal < error < warning < information
  (report_visualizer.py:472-491, O1)
"""

from __future__ import annotations

import re

from fdpg_query_data_validation_ray.schema import SEVERITY_RANK

_INDEX_RE = re.compile(r"\[\d+\]")


def normalize_location(location: str) -> str:
    """Collapse per-index path segments so per-row locations dedup into one
    generic location: 'files[3].name' → 'files[*].name'."""
    return _INDEX_RE.sub("[*]", location)


def filter_issues_by_location(issues: list[dict], location: str) -> list[dict]:
    return [i for i in issues if location in (i.get("location") or "")]


def issues_by_severity(issues: list[dict], severity: str) -> list[dict]:
    return [i for i in issues if i.get("severity") == severity]


def semi_join_issues_by_paths(issues: list[dict], allowed_locations: set[str]) -> list[dict]:
    """Keep issues whose normalized location is in the relevance allowlist
    (reference: filter_issues_by_fdpg_query_paths — semi-join of issues vs the
    type's relevant FHIR paths, report_visualizer.py:364-395, F2)."""
    allowed = {normalize_location(loc) for loc in allowed_locations}
    return [i for i in issues if normalize_location(i.get("location") or "") in allowed]


def drop_known_issues(issues: list[dict], known_rule_ids: set[str]) -> list[dict]:
    """Anti-join issues vs a known-issue allowlist by rule_id (reference:
    expected-noise filtering before asserting emptiness,
    extraction/test/test_profiles.py:166-180, F5)."""
    return [i for i in issues if i.get("rule_id") not in known_rule_ids]


def sorted_by_severity(issues: list[dict]) -> list[dict]:
    return sorted(
        issues,
        key=lambda i: (
            SEVERITY_RANK.get(i.get("severity", "information"), 99),
            i.get("rule_id", ""),
            i.get("location", ""),
        ),
    )


def _md_table(headers: list[str], rows: list[list]) -> str:
    out = ["| " + " | ".join(headers) + " |", "|" + "---|" * len(headers)]
    for r in rows:
        out.append("| " + " | ".join("" if v is None else str(v) for v in r) + " |")
    return "\n".join(out)


def routing_breakdown(report: dict, registry) -> list[dict]:
    """Two-level (route → sub-route) issue rollup in REGISTRY ORDER.

    Reference parity: the LaTeX report orders resource types by the
    configured test_type list and renders per-LOINC Observation sub-tables
    (latex_report/report_visualizer.py:144-230). Here the route order is
    the registry's insertion order (never alphabetized), and a route with
    sub_routes expands into one row per sub value. Issues attribute to a
    route via suite membership of their rule_id; a rule shared between
    suites counts under each (documented, matches the reference's
    per-profile duplicate listing). Missing-route warnings
    (rule_id 'missing_suite') roll up into an '(unrouted)' row."""
    issues = list(report.get("validation", [])) + list(report.get("general", []))
    by_rule: dict[str, int] = {}
    unrouted = 0
    for i in issues:
        rid = i.get("rule_id", "")
        cnt = int(i.get("count", 1))
        if rid == "missing_suite":
            unrouted += cnt
        else:
            by_rule[rid] = by_rule.get(rid, 0) + cnt

    def suite_total(suite) -> int:
        return sum(by_rule.get(r.rule_id, 0) for r in suite.rules)

    rows: list[dict] = []
    for key, suite in registry.routes.items():
        if registry.has_sub_routes(key):
            for skey, ssuite in registry.sub_routes[key].items():
                rows.append(
                    {"route": key, "sub_route": skey, "suite": ssuite.name,
                     "n_issues": suite_total(ssuite)}
                )
            # level-1 fallback row for sub values not in the sub table
            rows.append(
                {"route": key, "sub_route": "(other)", "suite": suite.name,
                 "n_issues": suite_total(suite)}
            )
        else:
            rows.append(
                {"route": key, "sub_route": None, "suite": suite.name,
                 "n_issues": suite_total(suite)}
            )
    if unrouted:
        rows.append(
            {"route": "(unrouted)", "sub_route": None, "suite": None,
             "n_issues": unrouted}
        )
    return rows


def render_markdown(report: dict, title: str = "Data Quality Report",
                    registry=None) -> str:
    """report dict (pipelines/report.py build_report shape) → markdown.
    With a `registry`, a two-level routing-breakdown section is rendered
    (suite → sub-route, reference report parity)."""
    lines = [f"# {title}", ""]
    lines.append(f"**Verdict: {'PASSED' if report.get('passed') else 'FAILED'}**  ")
    lines.append(f"Rows checked: {report.get('total_rows_checked', 0):,}  ")
    lines.append(f"Blocking violations: {report.get('total_violations', 0):,}  ")
    lines.append(f"Config hash: `{report.get('config_hash', '')}`")
    lines.append("")

    verdicts = report.get("verdicts", {})
    if verdicts:
        lines.append("## Partitions")
        lines.append(
            _md_table(
                ["partition", "passed", "rows", "violations", "warnings"],
                [
                    [pid, "✓" if v["passed"] else "✗", v["rows_checked"],
                     v["violation_count"], v["warning_count"]]
                    for pid, v in sorted(verdicts.items())
                ],
            )
        )
        lines.append("")

    if registry is not None:
        rows = routing_breakdown(report, registry)
        if rows:
            lines.append("## Routing breakdown (suite → sub-route)")
            lines.append(
                _md_table(
                    ["route", "sub-route", "suite", "issues"],
                    [
                        [r["route"], r["sub_route"] or "", r["suite"] or "",
                         r["n_issues"]]
                        for r in rows
                    ],
                )
            )
            lines.append("")

    for channel, heading in (
        ("validation", "Validation issues"),
        ("general", "General (warnings)"),
        ("error", "Error channel"),
    ):
        issues = report.get(channel, [])
        if not issues:
            continue
        lines.append(f"## {heading}")
        lines.append(
            _md_table(
                ["severity", "rule", "location", "diagnostics", "count", "sample keys"],
                [
                    [i["severity"], i["rule_id"], normalize_location(i["location"]),
                     i["diagnostics"], i["count"],
                     "; ".join(i.get("sample_row_keys", [])[:2])]
                    for i in sorted_by_severity(issues)
                ],
            )
        )
        lines.append("")

    dist = report.get("distribution", {})
    if dist:
        lines.append("## Column statistics")
        rows = []
        for col, s in sorted(dist.items()):
            rows.append(
                [col, s.get("count"), s.get("nulls"),
                 round(s.get("null_ratio", 0.0), 4), s.get("distinct_hll"),
                 s.get("min"), s.get("max")]
            )
        lines.append(_md_table(["column", "rows", "nulls", "null ratio",
                                "distinct (HLL)", "min", "max"], rows))
        lines.append("")

    q = report.get("quantiles_approx", {})
    if q:
        lines.append("## Quantiles (KLL, approximate)")
        cols = sorted(q)
        qkeys = sorted({k for v in q.values() for k in v})
        lines.append(
            _md_table(
                ["column", *qkeys],
                [[c, *[q[c].get(k) for k in qkeys]] for c in cols],
            )
        )
        lines.append("")
    return "\n".join(lines)


def write_markdown_report(report: dict, path: str,
                          title: str = "Data Quality Report",
                          registry=None) -> str:
    md = render_markdown(report, title, registry=registry)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(md)
    import os

    os.replace(tmp, path)
    return path
