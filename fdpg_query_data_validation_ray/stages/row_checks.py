"""Row-level check engine: vectorized per-batch rule evaluation → violation rows.

Reference analog: the per-bundle validate call (simple_test POST →
OperationOutcome, extraction/main.py:45-51,249-267) becomes
`ds.map_batches(RowChecker(...), batch_format="pyarrow")`; the validator's
compiled-profile state (fhir-marshal, docker-compose.yml:47-66) becomes the
compiled rule set held by the stage instance — build once, apply per batch.

Semantics kept from the reference:
- every violation carries severity + location + diagnostics
  (Issue shape, extraction/IssueSet.py:14-24);
- lineage (row_key from the suite's key columns) is attached to every issue
  (the reference's add_resource_url_to_issue, main.py:73-83 — dead there,
  mandatory here);
- a routing miss (lang with no suite) degrades to per-row *warning* issues,
  never an exception (fallback path, extraction/main.py:191-206);
- a rule that errors at runtime emits error-channel issues instead of failing
  the run (error channel, extraction/main.py:90-93,140-141).

Determinism: all emissions are per-row, so violation multisets are identical
under any batch/partition split (required by the determinism fixture,
FIXTURES.md).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.rules import Rule, Suite, SuiteRegistry
from fdpg_query_data_validation_ray.schema import VIOLATION_SCHEMA
from fdpg_query_data_validation_ray.functions.hashing import sha256_column

MISSING_SUITE_RULE_ID = "missing_suite"
ERROR_CHANNEL_PREFIX = "error:"


def row_key_array(table: pa.Table, key_columns: tuple[str, ...]) -> pa.Array:
    """Concatenate key columns with '|' into one lineage string per row
    (SQL equivalent: CONCAT_WS('|', ...))."""
    cols = []
    for name in key_columns:
        col = table.column(name)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        cols.append(pc.fill_null(col, ""))
    if len(cols) == 1:
        return cols[0].combine_chunks() if isinstance(cols[0], pa.ChunkedArray) else cols[0]
    return pc.binary_join_element_wise(*cols, "|")


def key_encode_array(table: pa.Table, key_columns: tuple[str, ...]) -> pa.Array:
    """Unambiguous composite-key encoding: each part is length-prefixed
    (`<len>:<value>`, nulls as `N`), parts joined with ';'. Unlike the
    display-oriented row_key_array (CONCAT_WS), distinct composite keys can
    never collide — values containing the separator are disambiguated by the
    length prefix, and null is distinct from empty string. Used as the exact
    grouping key for uniqueness verification."""
    parts = []
    for name in key_columns:
        col = table.column(name)
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        enc = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(col), pa.string()), col, ":"
        )
        parts.append(pc.fill_null(enc, "N"))
    if len(parts) == 1:
        p = parts[0]
        return p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
    return pc.binary_join_element_wise(*parts, ";")


def _stringify(col: pa.ChunkedArray) -> pa.ChunkedArray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return pc.cast(col, pa.string()) if pa.types.is_large_string(col.type) else col
    return pc.cast(col, pa.string())


def rule_violation_mask(rule: Rule, table: pa.Table) -> pa.ChunkedArray:
    """Boolean mask, True where the row violates `rule`. Nulls violate only
    not_null (other rules skip nulls, mirroring how the reference validator
    reports a missing element once as a cardinality issue, not per-constraint:
    extraction/test/test_profiles.py:35-51)."""
    col = table.column(rule.column)
    if rule.kind == "not_null":
        return pc.is_null(col)
    valid = pc.is_valid(col)
    if rule.kind == "regex":
        pattern = rule.params["pattern"]
        anchored = pattern if pattern.startswith("^") else f"^(?:{pattern})$"
        ok = pc.match_substring_regex(col, anchored)
        return pc.and_(valid, pc.invert(pc.fill_null(ok, True)))
    if rule.kind == "in_set":
        from fdpg_query_data_validation_ray.rules import resolve_in_set_values

        vals = pa.array(resolve_in_set_values(rule), type=pa.string())
        target = _stringify(col)
        ok = pc.is_in(target, value_set=vals)
        return pc.and_(valid, pc.invert(ok))
    if rule.kind == "length_range":
        ln = pc.utf8_length(col)
        return _range_mask(ln, valid, rule.params.get("min"), rule.params.get("max"))
    if rule.kind == "range":
        return _range_mask(col, valid, rule.params.get("min"), rule.params.get("max"))
    if rule.kind == "custom":
        fn = rule.params["fn"]  # fn(table) -> boolean mask; UDF extension surface
        return fn(table)
    raise ValueError(f"rule kind {rule.kind!r} is not a row-level rule")


def _range_mask(col, valid, lo, hi):
    bad = pa.chunked_array([pa.array(np.zeros(len(col), dtype=bool))])
    if lo is not None:
        bad = pc.or_(bad, pc.less(col, lo))
    if hi is not None:
        bad = pc.or_(bad, pc.greater(col, hi))
    return pc.and_(valid, pc.fill_null(bad, False))


def _violations_from_mask(
    mask, table: pa.Table, rule_id: str, severity: str, location: str,
    diagnostics: str, row_keys, actual_col=None,
) -> pa.Table | None:
    mask = pc.fill_null(mask, False)
    n_bad = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
    if n_bad == 0:
        return None
    keys = pc.filter(row_keys, mask)
    actual = (
        pc.filter(_stringify(actual_col), mask)
        if actual_col is not None
        else pa.nulls(n_bad, pa.string())
    )
    n = len(keys)
    return pa.table(
        {
            "rule_id": pa.array([rule_id] * n, pa.string()),
            "severity": pa.array([severity] * n, pa.string()),
            "location": pa.array([location] * n, pa.string()),
            "diagnostics": pa.array([diagnostics] * n, pa.string()),
            "row_key": pc.cast(keys, pa.string()),
            "actual": pc.cast(actual, pa.string()),
        },
        schema=VIOLATION_SCHEMA,
    )


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def schema_violations(schema: pa.Schema, suite: Suite, source: str = "") -> pa.Table:
    """Schema-level dtype rules evaluated against ONE schema (a parquet
    file's footer schema — dtype mismatch is file-level schema drift). One
    violation per (file, rule) with the file name as row_key: the count is a
    function of the INPUT FILES alone, never of batch size or parallelism
    (the determinism invariant below would break if dtype were emitted per
    batch)."""
    out = []
    for rule in suite.table_rules:
        if rule.kind != "dtype":
            continue
        declared = rule.params.get("arrow_type", "")
        if rule.column not in schema.names:
            actual = "<missing>"
        else:
            actual = str(schema.field(rule.column).type)
        if actual != declared:
            out.append(
                {
                    "rule_id": rule.rule_id,
                    "severity": rule.severity,
                    "location": rule.column,
                    "diagnostics": rule.diagnostics,
                    "row_key": source,
                    "actual": actual,
                }
            )
    if not out:
        return VIOLATION_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=VIOLATION_SCHEMA)


def check_batch(table: pa.Table, suite: Suite) -> pa.Table:
    """Apply all row-level rules of `suite` to one Arrow batch; return the
    violation table (possibly empty). Fully vectorized; error-channel on
    per-rule failure. Schema-level dtype rules are NOT evaluated here — they
    are per input file (`schema_violations`), keeping violation multisets
    independent of the batch split."""
    out: list[pa.Table] = []
    row_keys = row_key_array(table, suite.key_columns)
    for rule in suite.row_rules:
        try:
            if rule.column and rule.column not in table.column_names:
                raise KeyError(f"column {rule.column!r} not in batch schema")
            mask = rule_violation_mask(rule, table)
            actual_col = None
            if rule.kind != "not_null" and rule.column in table.column_names:
                actual_col = table.column(rule.column)
            v = _violations_from_mask(
                mask, table, rule.rule_id, rule.severity, rule.column,
                rule.diagnostics, row_keys, actual_col,
            )
            if v is not None:
                out.append(v)
        except Exception as exc:  # error channel: emit, never crash the run
            n = table.num_rows
            out.append(
                pa.table(
                    {
                        "rule_id": pa.array([f"{ERROR_CHANNEL_PREFIX}{rule.rule_id}"] * n),
                        "severity": pa.array(["error"] * n),
                        "location": pa.array([rule.column] * n),
                        "diagnostics": pa.array(
                            [f"{type(exc).__name__}: rule could not be evaluated"] * n
                        ),
                        "row_key": pc.cast(row_keys, pa.string()),
                        "actual": pa.nulls(n, pa.string()),
                    },
                    schema=VIOLATION_SCHEMA,
                )
            )
    if not out:
        return empty_violations()
    return pa.concat_tables(out)


class RowChecker:
    """Actor-pool stage: compiled suites held once per actor, applied per batch.

    Use:  ds.map_batches(RowChecker, fn_constructor_kwargs=dict(registry=reg),
                         batch_format="pyarrow", concurrency=N)
    Emits the violation table per batch. With a `registry`, rows are routed by
    registry.routing_column (reference: profile substitution per
    validation_mapping, docker-compose.yml:66-83 + main.py:159); unrouted rows
    get per-row `missing_suite` warnings (main.py:191-206 fallback).
    """

    def __init__(
        self,
        suite: Suite | None = None,
        registry: SuiteRegistry | None = None,
        registry_json: str | None = None,
    ):
        if registry_json is not None:
            registry = SuiteRegistry.from_json(registry_json)
        if (suite is None) == (registry is None):
            raise ValueError("pass exactly one of suite / registry")
        self.suite = suite
        self.registry = registry
        # pre-compile regexes once per actor (reference: profiles compiled once
        # in the marshal JVM, docker-compose.yml:47-66)
        sub_suites = (
            [s for sub in registry.sub_routes.values() for s in sub.values()]
            if registry
            else []
        )
        for s in [suite] if suite else list((registry.routes or {}).values()) + (
            [registry.default] if registry and registry.default else []
        ) + sub_suites:
            for r in s.row_rules:
                if r.kind == "regex":
                    re.compile(r.params["pattern"])
                elif r.kind == "in_set" and r.params.get("values_file"):
                    # load value-set files once per actor (memoized)
                    from fdpg_query_data_validation_ray.rules import (
                        resolve_in_set_values,
                    )

                    resolve_in_set_values(r)

    def __call__(self, table: pa.Table) -> pa.Table:
        if self.suite is not None:
            return check_batch(table, self.suite)
        reg = self.registry
        # null routing values are normalized to "" BEFORE computing both the
        # key set and the per-key masks, so null and ""-valued rows route
        # together (usually to the missing-suite warning) and NO row can fall
        # between the masks — an is_null mask for key "" would silently skip
        # rows whose routing column holds an actual empty string
        rnorm = pc.fill_null(_stringify(table.column(reg.routing_column)), "")
        keys = pc.unique(rnorm).to_pylist()
        out: list[pa.Table] = []
        for key in sorted(keys):
            sub = table.filter(pc.equal(rnorm, key))
            if reg.has_sub_routes(key) and reg.sub_column in sub.column_names:
                # level-2 routing (reference: Observation → LOINC → profile,
                # maps/validation_mapping.json): split this slice again by the
                # sub-column and resolve per (key, sub value)
                snorm = pc.fill_null(_stringify(sub.column(reg.sub_column)), "")
                for skey in sorted(pc.unique(snorm).to_pylist()):
                    ssub = sub.filter(pc.equal(snorm, skey))
                    out.append(
                        self._check_or_warn(ssub, reg.resolve(key, skey), f"{key}/{skey}")
                    )
                continue
            out.append(self._check_or_warn(sub, reg.resolve(key), key))
        if not out:
            return empty_violations()
        return pa.concat_tables(out)

    def _check_or_warn(self, sub: pa.Table, suite: Suite | None, label: str) -> pa.Table:
        """Check `sub` against `suite`; a missing route degrades to per-row
        warnings (reference fallback, extraction/main.py:191-206)."""
        if suite is not None:
            return check_batch(sub, suite)
        rk = row_key_array(sub, self._any_key_columns())
        n = sub.num_rows
        return pa.table(
            {
                "rule_id": pa.array([MISSING_SUITE_RULE_ID] * n),
                "severity": pa.array(["warning"] * n),
                "location": pa.array([self.registry.routing_column] * n),
                "diagnostics": pa.array(
                    ["no constraint suite routed for value"] * n
                ),
                "row_key": pc.cast(rk, pa.string()),
                "actual": pa.array([label] * n, pa.string()),
            },
            schema=VIOLATION_SCHEMA,
        )

    def _any_key_columns(self) -> tuple[str, ...]:
        reg = self.registry
        if reg.default is not None:
            return reg.default.key_columns
        for s in reg.routes.values():
            return s.key_columns
        return ()


def add_sha256(table: pa.Table, column: str = "content", out: str = "content_sha256") -> pa.Table:
    """Append the per-row sha256 invariant column (BASELINE.json input_hint)."""
    return table.append_column(out, sha256_column(table.column(column)))
