"""Merged run report — the reference's raw report shape, deterministic.

Reference: write_raw_report (extraction/main.py:296-304) emits
{distribution, validation: {type: {count, issues}}, general, error}; issues
are dedup-counted by (severity, code, diagnostics, generic path)
(IssueSet.add, extraction/IssueSet.py:9-26) and the report sorts issues
fatal < error < warning < information (report_visualizer.py:472-491).

This report keeps those channels:
- distribution  → per-column stats (count / null_ratio / min / max / HLL
                  distinct / KLL quantiles / value counts),
- validation    → dedup-counted issues: key = (rule_id, severity, location,
                  diagnostics) → count + up to 3 sample row_keys,
- general       → warning-severity issues (missing_suite fallback etc.),
- error         → error-channel issues (rule_id prefixed "error:"),
- verdicts      → per-partition pass/fail + lineage (no volatile metrics, so
                  a resumed run's report is byte-identical to an
                  uninterrupted one — FIXTURES.md resume fixture).
"""

from __future__ import annotations

from collections import defaultdict

from fdpg_query_data_validation_ray.schema import SEVERITY_RANK
from fdpg_query_data_validation_ray.stages.stats import ColumnPartial, finalize
from fdpg_query_data_validation_ray.state.checkpoint import RunManifest

MAX_SAMPLE_KEYS = 3


def dedup_issues(violation_rows) -> list[dict]:
    """IssueSet semantics: group by (rule_id, severity, location, diagnostics),
    count, keep sorted sample row keys; sorted by severity rank then rule_id."""
    groups: dict[tuple, dict] = {}
    for r in violation_rows:
        key = (r["rule_id"], r["severity"], r["location"], r["diagnostics"])
        g = groups.setdefault(
            key,
            {
                "rule_id": r["rule_id"],
                "severity": r["severity"],
                "location": r["location"],
                "diagnostics": r["diagnostics"],
                "count": 0,
                "sample_row_keys": [],
            },
        )
        g["count"] += 1
        rk = r.get("row_key") or ""
        if rk:
            g["sample_row_keys"].append(rk)
    out = []
    for g in groups.values():
        g["sample_row_keys"] = sorted(g["sample_row_keys"])[:MAX_SAMPLE_KEYS]
        out.append(g)
    out.sort(key=lambda g: (SEVERITY_RANK[g["severity"]], g["rule_id"], g["location"]))
    return out


def merge_deduped_issues(parts: list[list[dict]]) -> list[dict]:
    """Merge per-partition dedup_issues partials into the exact global
    result: counts add, and because each partial keeps its SORTED first
    MAX_SAMPLE_KEYS row keys, the global sorted-first-K is a subset of the
    union of the partials' — byte-identical to dedup_issues over all rows."""
    groups: dict[tuple, dict] = {}
    for part in parts:
        for g in part:
            key = (g["rule_id"], g["severity"], g["location"], g["diagnostics"])
            acc = groups.get(key)
            if acc is None:
                groups[key] = dict(g, sample_row_keys=list(g["sample_row_keys"]))
            else:
                acc["count"] += g["count"]
                acc["sample_row_keys"].extend(g["sample_row_keys"])
    out = []
    for g in groups.values():
        g["sample_row_keys"] = sorted(g["sample_row_keys"])[:MAX_SAMPLE_KEYS]
        out.append(g)
    out.sort(key=lambda g: (SEVERITY_RANK[g["severity"]], g["rule_id"], g["location"]))
    return out


def distribution_by_system(
    merged_partials: dict[str, ColumnPartial], code_systems: dict
) -> dict:
    """Nested per-code-system distribution (reference analyse_distribution's
    path-template → code-system → count shape, extraction/main.py:270-293):
    each configured column's value counts are split by which value set each
    value belongs to, with an __unmatched__ bucket. Deterministic: all keys
    sorted; a value in several systems is counted under each.

    When the stats pass truncated the column's value counts to
    MAX_CATEGORICAL (lossy partial merges), every count here is a lower
    bound — the column's entry then carries `"approximate": true` instead of
    silently undercounting vs the reference's exact analyse_distribution."""
    from fdpg_query_data_validation_ray.pipelines.validate import ValidationPlan

    out: dict = {}
    for col, systems in sorted(code_systems.items()):
        p = merged_partials.get(col)
        counts = dict(p.cat_counts) if p is not None and p.cat_counts else {}
        rep: dict = {}
        matched: set = set()
        for name, spec in sorted(systems.items()):
            vs = set(ValidationPlan._resolve_system_values(spec))
            sub = {v: c for v, c in sorted(counts.items()) if v in vs}
            matched |= set(sub)
            rep[name] = {"count": sum(sub.values()), "values": sub}
        um = {v: c for v, c in sorted(counts.items()) if v not in matched}
        rep["__unmatched__"] = {"count": sum(um.values()), "values": um}
        if p is not None and p.cat_overflow:
            rep["approximate"] = True
        out[col] = rep
    return out


def build_report(
    manifest: RunManifest,
    merged_partials: dict[str, ColumnPartial],
    global_violations: list[dict],
    config_hash: str,
    code_systems: dict | None = None,
    violation_partials: dict[str, object] | None = None,
) -> dict:

    from fdpg_query_data_validation_ray.pipelines.validate import (
        scan_partition_artifacts,
    )

    pids = manifest.completed_partitions()
    verdicts = {}
    for pid in pids:
        v = manifest.load_verdict(pid)
        verdicts[pid] = {
            "passed": v["passed"],
            "rows_checked": v["rows_checked"],
            "violation_count": v["violation_count"],
            "warning_count": v["warning_count"],
            "lineage": v["lineage"],
        }

    # per-partition pre-dedup INSIDE scan tasks (counts + sorted first-K
    # samples are exactly mergeable), so the driver merges a few groups per
    # partition instead of deserializing every violation row. When the run
    # kicked those tasks off incrementally at each partition's commit
    # (violation_partials refs covering every completed pid), the scans are
    # already done by now; otherwise scan on demand.
    parts = None
    if violation_partials and all(pid in violation_partials for pid in pids):
        try:
            import ray

            parts = ray.get([violation_partials[pid] for pid in pids])
        except Exception:
            parts = None
    if parts is None:
        parts = scan_partition_artifacts(
            manifest,
            "violation",
            ["rule_id", "severity", "location", "diagnostics", "row_key"],
            transform=lambda t: dedup_issues(t.to_pylist()),
        )
    issues = merge_deduped_issues(parts + [dedup_issues(list(global_violations))])

    general = [g for g in issues if g["severity"] == "warning"]
    error_channel = [g for g in issues if g["rule_id"].startswith("error:")]
    validation = [
        g
        for g in issues
        if g["severity"] != "warning" and not g["rule_id"].startswith("error:")
    ]
    n_blocking = sum(
        g["count"] for g in issues
        if g["severity"] in ("fatal", "error")
    )
    # KLL quantiles are rank-error-bounded approximations whose exact values
    # depend on the batch split; they live in their own section so the rest of
    # the report is bit-deterministic under any parallelism (FIXTURES.md
    # determinism fixture). Resumed runs reuse persisted partials, so even
    # quantiles_approx is byte-stable across resume.
    dist = finalize(list(merged_partials.values()))
    quantiles = {c: s.pop("quantiles") for c, s in dist.items() if "quantiles" in s}
    return {
        "config_hash": config_hash,
        "distribution": dist,
        "distribution_by_system": distribution_by_system(
            merged_partials, code_systems or {}
        ),
        "quantiles_approx": quantiles,
        "validation": validation,
        "general": general,
        "error": error_channel,
        "verdicts": verdicts,
        "passed": n_blocking == 0,
        "total_rows_checked": sum(v["rows_checked"] for v in verdicts.values()),
        "total_violations": n_blocking,
    }
