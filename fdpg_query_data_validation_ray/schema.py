"""Frozen schemas for the engine.

Reference analogs:
- the input corpus schema comes from BASELINE.json `input_hint` (the reference's
  schemaless FHIR JSON rows, extraction/fhir.py:6-7, become a fixed Arrow schema);
- the violation row is the reference's Issue
  (extraction/IssueSet.py:14-24: severity, code, diagnostics, location, count)
  plus mandatory lineage columns (the reference's add_resource_url_to_issue,
  extraction/main.py:73-83, is dead code; ours is load-bearing);
- severity ordering follows the reference's report sort
  (latex_report/report_visualizer.py:472-491: fatal < error < warning < information).
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint: (repo, path, commit, lang, content)
CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

# One violation per offending row per rule. `row_key` joins the suite's
# key_columns with "|" so lineage survives any projection; `actual` is the
# stringified offending value (NULL for not_null violations).
VIOLATION_SCHEMA = pa.schema(
    [
        ("rule_id", pa.string()),
        ("severity", pa.string()),
        ("location", pa.string()),  # column name (reference: generic FHIR path, IssueSet.py:39-40)
        ("diagnostics", pa.string()),
        ("row_key", pa.string()),
        ("actual", pa.string()),
    ]
)

# fatal < error < warning < information (report_visualizer.py:483-491)
SEVERITIES = ("fatal", "error", "warning", "information")
SEVERITY_RANK = {s: i for i, s in enumerate(SEVERITIES)}

# Per-partition verdict (reference: per-type report entry with count + issues,
# extraction/main.py:153-155; pass iff the only issue is the sentinel
# "No issues detected during validation", main.py:174-177).
VERDICT_FIELDS = (
    "partition_id",
    "passed",
    "rows_checked",
    "violation_count",
    "warning_count",
    "lineage",
    "metrics",
)
