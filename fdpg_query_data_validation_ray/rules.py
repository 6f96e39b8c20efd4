"""Declarative constraint DSL + suite registry.

Reference analog: StructureDefinition differentials (declarative element
constraints, e.g. fhir_profiles/FDPG_Einwilligung.json — `min` cardinality on
three elements) routed per record class via maps/validation_mapping.json
(consumed at extraction/main.py:159).  Here a `Suite` is a JSON-serializable
list of `Rule`s and a `SuiteRegistry` routes a record's `lang` (reference:
resourceType / LOINC code) to a suite.  Missing routes degrade to a warning
issue, never an exception (reference fallback: extraction/main.py:183-214 —
empty profile query → warning issue + retry without profile).

Diagnostics strings deliberately echo the reference validator's wording so the
issue texts are recognizable (e.g. "minimum required = 1, but only found 0",
extraction/test/test_profiles.py:35-37; "Value is 'a' but must be 'e'",
test_profiles.py:213; "None of the codings provided are in the value set",
test_profiles.py:190).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any

from fdpg_query_data_validation_ray.schema import SEVERITIES

RULE_KINDS = (
    "not_null",
    "dtype",
    "regex",
    "in_set",
    "length_range",
    "range",
    "unique",
    "foreign_key",
    "drift",
    "custom",
)

# Constant per-kind diagnostics (reference wording; constants keep the oracle
# SQL trivially equivalent).
DIAGNOSTICS = {
    "not_null": "minimum required = 1, but only found 0",
    "regex": "value does not match required pattern",
    "in_set": "none of the values provided are in the value set",
    "length_range": "length out of allowed range",
    "range": "value out of allowed range",
    "dtype": "column type does not match declared type",
    "unique": "duplicate key",
    "foreign_key": "referenced key does not exist",
    "drift": "distribution drift versus reference snapshot",
    "custom": "custom check failed",
}


@dataclass(frozen=True)
class Rule:
    """One declarative constraint on one column.

    kind       one of RULE_KINDS
    column     target column ("" for table-level rules like unique/drift)
    severity   fatal | error | warning | information
    params     kind-specific parameters (JSON-serializable)
    rule_id    stable identity used for issue dedup-counting
               (reference: IssueSet key hash, extraction/IssueSet.py:27-32)
    """

    kind: str
    column: str = ""
    severity: str = "error"
    params: dict[str, Any] = field(default_factory=dict)
    rule_id: str = ""

    def __post_init__(self) -> None:
        if self.kind not in RULE_KINDS:
            raise ValueError(f"unknown rule kind {self.kind!r}")
        if self.severity not in SEVERITIES:
            raise ValueError(f"unknown severity {self.severity!r}")
        if not self.rule_id:
            object.__setattr__(self, "rule_id", f"{self.kind}({self.column})")

    @property
    def diagnostics(self) -> str:
        return DIAGNOSTICS[self.kind]

    def to_dict(self) -> dict[str, Any]:
        return {
            "kind": self.kind,
            "column": self.column,
            "severity": self.severity,
            "params": self.params,
            "rule_id": self.rule_id,
        }

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Rule":
        return Rule(
            kind=d["kind"],
            column=d.get("column", ""),
            severity=d.get("severity", "error"),
            params=d.get("params", {}),
            rule_id=d.get("rule_id", ""),
        )


# -- constructors (the user-facing DSL) --------------------------------------


def not_null(column: str, severity: str = "error") -> Rule:
    return Rule("not_null", column, severity)


def dtype(column: str, arrow_type: str, severity: str = "error") -> Rule:
    """arrow_type: textual Arrow type name, e.g. 'string', 'int64', 'large_string'."""
    return Rule("dtype", column, severity, {"arrow_type": arrow_type})


def regex(column: str, pattern: str, severity: str = "error") -> Rule:
    """Violation when the full value does not match `pattern` (anchored)."""
    return Rule("regex", column, severity, {"pattern": pattern})


def in_set(
    column: str,
    values: list | None = None,
    severity: str = "error",
    values_file: str | None = None,
) -> Rule:
    """Membership in a value set: literal `values`, a `values_file`, or both
    (union). The file analog of the reference's ValueSet expansions mounted
    into the terminology service (docker-compose.yml:40-42,
    value_sets/README.md): .json holds a JSON array, anything else is one
    value per line. File CONTENT is hashed into the run's config_hash
    (ValidationPlan.config_hash), so lineage changes when the set changes."""
    if values is None and values_file is None:
        raise ValueError("in_set needs values and/or values_file")
    params: dict = {"values": list(values or [])}
    if values_file is not None:
        params["values_file"] = values_file
    return Rule("in_set", column, severity, params)


def load_value_set(path: str) -> tuple[str, ...]:
    """Load (and memoize per path+mtime) a value-set file. Memoization keys
    on mtime so long-lived actors pick up republished sets on restart while
    never re-reading per batch."""
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    return _load_value_set_cached(path, mtime)


@lru_cache(maxsize=128)
def _load_value_set_cached(path: str, _mtime: int) -> tuple[str, ...]:
    with open(path) as f:
        if path.endswith(".json"):
            vals = json.load(f)
        else:
            vals = [ln.strip() for ln in f if ln.strip()]
    return tuple(str(v) for v in vals)


def resolve_in_set_values(rule: Rule) -> list[str]:
    """Literal values + file values for an in_set rule (file loaded once per
    process via the memo)."""
    vals = [str(v) for v in rule.params.get("values", [])]
    vf = rule.params.get("values_file")
    if vf:
        vals = vals + list(load_value_set(vf))
    return vals


def length_range(
    column: str,
    min_len: int | None = None,
    max_len: int | None = None,
    severity: str = "error",
) -> Rule:
    return Rule("length_range", column, severity, {"min": min_len, "max": max_len})


def value_range(
    column: str,
    min_value: float | None = None,
    max_value: float | None = None,
    severity: str = "error",
) -> Rule:
    return Rule("range", column, severity, {"min": min_value, "max": max_value})


def unique(key_columns: list[str], severity: str = "error") -> Rule:
    cols = list(key_columns)
    return Rule("unique", ",".join(cols), severity, {"key_columns": cols})


def foreign_key(
    columns: list[str],
    dim_name: str,
    dim_columns: list[str] | None = None,
    severity: str = "error",
) -> Rule:
    cols = list(columns)
    return Rule(
        "foreign_key",
        ",".join(cols),
        severity,
        {"columns": cols, "dim": dim_name, "dim_columns": list(dim_columns or cols)},
    )


def drift(
    column: str,
    kind: str = "categorical",  # categorical (PSI) | numeric (KS) | length (KS over utf8_length)
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    severity: str = "warning",
) -> Rule:
    return Rule(
        "drift",
        column,
        severity,
        {"hist_kind": kind, "psi_threshold": psi_threshold, "ks_threshold": ks_threshold},
    )


ROW_LEVEL_KINDS = ("not_null", "regex", "in_set", "length_range", "range", "custom")
TABLE_LEVEL_KINDS = ("unique", "foreign_key", "drift", "dtype")


@dataclass(frozen=True)
class Suite:
    """A named, routable set of rules over one table.

    key_columns: lineage columns concatenated (with "|") into each violation's
    row_key — the reference's resource URL attachment (extraction/main.py:68-83),
    mandatory here.
    """

    name: str
    rules: tuple[Rule, ...]
    key_columns: tuple[str, ...]

    def __init__(self, name: str, rules: list[Rule], key_columns: list[str]):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "rules", tuple(rules))
        object.__setattr__(self, "key_columns", tuple(key_columns))

    @property
    def row_rules(self) -> list[Rule]:
        return [r for r in self.rules if r.kind in ROW_LEVEL_KINDS]

    @property
    def table_rules(self) -> list[Rule]:
        return [r for r in self.rules if r.kind in TABLE_LEVEL_KINDS]

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "key_columns": list(self.key_columns),
                "rules": [r.to_dict() for r in self.rules],
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "Suite":
        d = json.loads(s)
        return Suite(
            name=d["name"],
            rules=[Rule.from_dict(r) for r in d["rules"]],
            key_columns=d["key_columns"],
        )


@dataclass
class SuiteRegistry:
    """Routing table: value of `routing_column` → suite, with optional
    TWO-LEVEL routing — (routing value, sub value) → suite.

    Reference analog: maps/validation_mapping.json — resourceType → profile URL
    at level 1, and for Observation a second level LOINC code → profile (827
    entries), consumed at extraction/main.py:159.  Here level 2 is
    `sub_column`: a routing value present in `sub_routes` is resolved by the
    row's sub-column value first, falling back to the level-1 route, then
    `default`.  A route miss yields a warning-channel issue per affected row
    group, never a crash (extraction/main.py:191-206).

    The registry is a small plain object: broadcast it by closure capture /
    `ray.put`; never shuffled.
    """

    routing_column: str
    routes: dict[str, Suite]
    default: Suite | None = None
    sub_column: str | None = None
    sub_routes: dict[str, dict[str, Suite]] = field(default_factory=dict)

    def resolve(self, key: str, sub: str | None = None) -> Suite | None:
        if self.sub_column and key in self.sub_routes:
            hit = self.sub_routes[key].get(sub or "")
            if hit is not None:
                return hit
        return self.routes.get(key, self.default)

    def has_sub_routes(self, key: str) -> bool:
        return bool(self.sub_column) and key in self.sub_routes

    def to_json(self) -> str:
        return json.dumps(
            {
                "routing_column": self.routing_column,
                "routes": {k: json.loads(s.to_json()) for k, s in self.routes.items()},
                "default": json.loads(self.default.to_json()) if self.default else None,
                "sub_column": self.sub_column,
                "sub_routes": {
                    k: {sk: json.loads(s.to_json()) for sk, s in sub.items()}
                    for k, sub in self.sub_routes.items()
                },
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "SuiteRegistry":
        d = json.loads(s)

        def mk(sd: dict) -> Suite:
            return Suite(
                name=sd["name"],
                rules=[Rule.from_dict(r) for r in sd["rules"]],
                key_columns=sd["key_columns"],
            )

        return SuiteRegistry(
            routing_column=d["routing_column"],
            routes={k: mk(v) for k, v in d["routes"].items()},
            default=mk(d["default"]) if d.get("default") else None,
            sub_column=d.get("sub_column"),
            sub_routes={
                k: {sk: mk(sv) for sk, sv in sub.items()}
                for k, sub in d.get("sub_routes", {}).items()
            },
        )
