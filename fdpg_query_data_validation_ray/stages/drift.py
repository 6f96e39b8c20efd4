"""Distribution drift: PSI over categorical histograms, KS over KLL sketches.

Reference analog: the distribution tests — per-type totals and per-code-system
counts against distribution_tests.json (extraction/main.py:270-293,
distribution_tests/distribution_tests.json) — upgraded per the north_star to
statistical drift tests against a *reference snapshot*:

- categorical columns (e.g. `lang`): Population Stability Index over the
  value-count histograms (standard credit-scoring PSI; > 0.2 = significant
  shift is the conventional threshold);
- numeric columns / content length: two-sample Kolmogorov–Smirnov statistic
  computed from two KLL sketches (sup |cdf₁ − cdf₂| evaluated on the union of
  both sketches' quantile grids).

Snapshots are tiny (histogram dicts + serialized KLLs) — built from the same
mergeable partials as column_stats, persisted as JSON+base64, compared at the
driver (SURVEY.md §7.3: drift tests are driver-side, no shuffle).
"""

from __future__ import annotations

import base64
import json

import numpy as np

from fdpg_query_data_validation_ray.functions.sketches import KLL
from fdpg_query_data_validation_ray.rules import DIAGNOSTICS, Rule
from fdpg_query_data_validation_ray.stages.stats import ColumnPartial

_EPS = 1e-6


def psi(expected: dict[str, int], actual: dict[str, int]) -> float:
    """Population Stability Index between two categorical count histograms."""
    keys = sorted(set(expected) | set(actual))
    e_tot = max(1, sum(expected.values()))
    a_tot = max(1, sum(actual.values()))
    val = 0.0
    for k in keys:
        e = max(expected.get(k, 0) / e_tot, _EPS)
        a = max(actual.get(k, 0) / a_tot, _EPS)
        val += (a - e) * np.log(a / e)
    return float(val)


def ks_from_kll(a: KLL, b: KLL, grid: int = 256) -> float:
    """Two-sample KS statistic estimated from two KLL sketches."""
    if a.n == 0 or b.n == 0:
        return 0.0
    qs = np.linspace(0.0, 1.0, grid + 1)
    pts = np.unique(np.concatenate([a.quantiles(list(qs)), b.quantiles(list(qs))]))
    return float(max(abs(a.cdf(x) - b.cdf(x)) for x in pts))


class Snapshot:
    """Reference distribution snapshot: per column either a categorical
    histogram or a KLL sketch. JSON-serializable (KLL as base64)."""

    def __init__(self, columns: dict[str, dict] | None = None):
        self.columns = columns or {}

    @staticmethod
    def from_partials(partials: list[ColumnPartial]) -> "Snapshot":
        cols = {}
        for p in partials:
            if p.cat_counts is not None:
                cols[p.column] = {"kind": "categorical", "counts": dict(p.cat_counts)}
            elif p.kll.n:
                cols[p.column] = {"kind": "numeric", "kll": p.kll}
        return Snapshot(cols)

    def to_json(self) -> str:
        enc = {}
        for name, spec in self.columns.items():
            if spec["kind"] == "categorical":
                enc[name] = {"kind": "categorical", "counts": spec["counts"]}
            else:
                enc[name] = {
                    "kind": "numeric",
                    "kll_b64": base64.b64encode(spec["kll"].to_bytes()).decode(),
                }
        return json.dumps(enc, indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        raw = json.loads(s)
        cols = {}
        for name, spec in raw.items():
            if spec["kind"] == "categorical":
                cols[name] = {"kind": "categorical", "counts": dict(spec["counts"])}
            else:
                cols[name] = {
                    "kind": "numeric",
                    "kll": KLL.from_bytes(base64.b64decode(spec["kll_b64"])),
                }
        return Snapshot(cols)


def drift_violations(
    current: list[ColumnPartial] | Snapshot,
    reference: Snapshot,
    rules: list[Rule],
) -> list[dict]:
    """Evaluate drift rules; returns violation dicts (VIOLATION_SCHEMA keys —
    one per drifted column; driver-side, the inputs are tiny sketches)."""
    cur = current if isinstance(current, Snapshot) else Snapshot.from_partials(current)
    out = []
    for rule in rules:
        if rule.kind != "drift":
            continue
        name = rule.column
        ref_spec = reference.columns.get(name)
        cur_spec = cur.columns.get(name)
        if ref_spec is None or cur_spec is None:
            out.append(
                {
                    "rule_id": f"error:{rule.rule_id}",
                    "severity": "error",
                    "location": name,
                    "diagnostics": "KeyError: column missing from snapshot",
                    "row_key": "",
                    "actual": None,
                }
            )
            continue
        if ref_spec["kind"] == "categorical":
            stat, thresh, label = (
                psi(ref_spec["counts"], cur_spec["counts"]),
                rule.params.get("psi_threshold", 0.2),
                "psi",
            )
        else:
            stat, thresh, label = (
                ks_from_kll(ref_spec["kll"], cur_spec["kll"]),
                rule.params.get("ks_threshold", 0.2),
                "ks",
            )
        if stat > thresh:
            out.append(
                {
                    "rule_id": rule.rule_id,
                    "severity": rule.severity,
                    "location": name,
                    "diagnostics": DIAGNOSTICS["drift"],
                    "row_key": "",
                    "actual": f"{label}={stat:.4f}",
                }
            )
    return out
