"""JSON field extraction over a string column.

Reference analog: JSON parse/serialize at every HTTP boundary
(extraction/fhir.py:33, extraction/main.py:254) — here a columnar operator:
extract one scalar field from a JSON-string column.

pyarrow has no JSON kernel, so the hot path is a vectorized regex
(`pc.extract_regex`) matching the common flat encoding; rows the regex cannot
handle (nested/escaped/reordered/overflowing) fall back to real `json.loads`
on ONLY those rows — correctness of a JSON parser, throughput of a C regex
for the typical shape.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_I64_MIN = -(2**63)
_I64_MAX = 2**63 - 1


def extract_int_field(col: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """int64 value of `field` from each JSON string (null on null / missing /
    out-of-int64-range)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # ≤18 digits always fits int64, so the fast-path cast can never overflow;
    # longer runs simply don't match and take the bounds-checked fallback
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d{{1,18}})\s*[,}}]'
    extracted = pc.extract_regex(col, pattern)  # struct<v: string> or null
    vals = pc.struct_field(extracted, "v")
    out = pc.cast(vals, pa.int64())
    # the regex is only trusted on FLAT objects (exactly one '{', no '[')
    # whose field token appears at most once — with nesting, a nested
    # occurrence of the field could shadow the top-level one, and with a
    # repeated key ({"k":1,"k":2}) the regex would return the FIRST
    # occurrence while the json.loads fallback keeps the LAST; such rows go
    # to the real parser so the operator is internally consistent
    # (last-wins, json.loads semantics) regardless of which path a row takes.
    # Duplicate keys are undefined JSON; DuckDB's json_extract happens to
    # keep the FIRST — divergence exists only on that undefined case.
    flat = pc.and_(
        pc.and_(
            pc.equal(pc.count_substring(col, "{"), 1),
            pc.equal(pc.count_substring(col, "["), 0),
        ),
        pc.less_equal(pc.count_substring(col, f'"{field}"'), 1),
    )
    out = pc.if_else(pc.fill_null(flat, False), out, pa.nulls(len(col), pa.int64()))
    # fallback: ONLY the rows without a trusted fast-path value get a parse —
    # the rest of the batch stays columnar
    need = pc.and_(pc.is_valid(col), pc.is_null(out))
    idx = np.flatnonzero(need.to_numpy(zero_copy_only=False))
    if len(idx):
        subset = col.take(pa.array(idx)).to_pylist()
        # fill_null keeps int64 (to_numpy on a nullable int column degrades
        # to float64 — same dtype trap as hash64)
        patched = out.fill_null(0).to_numpy(zero_copy_only=False).copy()
        valid = out.is_valid().to_numpy(zero_copy_only=False).copy()
        for pos, s in zip(idx, subset):
            try:
                v = json.loads(s).get(field)
                iv = int(v)
                if _I64_MIN <= iv <= _I64_MAX:
                    patched[pos] = iv
                    valid[pos] = True
            except (ValueError, TypeError, AttributeError):
                pass
        out = pa.array(patched, pa.int64(), mask=~valid)
    return out
