"""JSON field extraction over a string column.

Reference analog: JSON parse/serialize at every HTTP boundary
(extraction/fhir.py:33, extraction/main.py:254) — here a columnar operator:
extract one scalar field from a JSON-string column.

pyarrow has no JSON kernel, so the hot path is a vectorized regex
(`pc.extract_regex`) matching the common flat encoding; rows the regex cannot
handle (nested/escaped/reordered) fall back to real `json.loads` — correctness
of a JSON parser, throughput of a C regex for the typical shape.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc


def extract_int_field(col: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """int64 value of `field` from each JSON string (null on null/missing)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)\s*[,}}]'
    extracted = pc.extract_regex(col, pattern)  # struct<v: string> or null
    vals = pc.struct_field(extracted, "v")
    out = pc.cast(vals, pa.int64())
    # the regex is only trusted on FLAT objects (exactly one '{', no '[') —
    # with nesting, a nested occurrence of the field could shadow the
    # top-level one; such rows go to the real parser
    flat = pc.and_(
        pc.equal(pc.count_substring(col, "{"), 1),
        pc.equal(pc.count_substring(col, "["), 0),
    )
    out = pc.if_else(pc.fill_null(flat, False), out, pa.nulls(len(col), pa.int64()))
    # fallback: rows with a JSON string but no trusted regex value get a parse
    need = pc.and_(pc.is_valid(col), pc.is_null(out))
    if pc.any(need).as_py():
        mask = need.to_numpy(zero_copy_only=False)
        py = col.to_pylist()
        fixed = out.to_pylist()
        for i, m in enumerate(mask):
            if not m:
                continue
            try:
                v = json.loads(py[i]).get(field)
                fixed[i] = int(v) if v is not None else None
            except (ValueError, TypeError, AttributeError):
                fixed[i] = None
        out = pa.array(fixed, pa.int64())
    return out
