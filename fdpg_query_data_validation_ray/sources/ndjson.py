"""NDJSON (newline-delimited JSON) corpus source.

Reference analog: the reference's wire format IS newline-delimited JSON —
FHIR bundles POSTed to Blaze and paged back out (extraction/fhir.py:26-45,
blaze-upload/). A reference user migrating real exports therefore often has
NDJSON, not parquet; this source reads it into the same Arrow schema the rest
of the engine expects, with the same column-pruning discipline.

Built on `ray.data.read_json` (streaming block reads, one task per file
chunk); schema normalization happens per batch in Arrow. For repeated runs
over the same corpus, convert once with `ndjson_to_parquet` — parquet reads
prune columns at the storage layer, NDJSON cannot.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_ndjson(paths, columns: list[str] | None = None, schema: pa.Schema | None = None):
    """Streaming NDJSON read → Ray Dataset.

    columns: projection applied per batch right after parse (NDJSON has no
    storage-level pruning — the parse cost is paid, the downstream exchange
    cost is not).
    schema: optional target Arrow schema; present columns are cast, missing
    ones filled null (ragged/evolving exports normalize to one shape)."""
    import ray.data as rd

    ds = rd.read_json(
        paths,
        # Ray's default extension filter omits .ndjson — the very extension
        # NDJSON exports typically use
        file_extensions=["json", "jsonl", "ndjson",
                         "json.gz", "jsonl.gz", "ndjson.gz"],
    )

    if columns is None and schema is None:
        return ds
    want = list(columns) if columns is not None else [f.name for f in schema]

    def normalize(t: pa.Table) -> pa.Table:
        cols = {}
        for name in want:
            target = schema.field(name).type if schema is not None else None
            if name in t.column_names:
                col = t[name]
                if target is not None and col.type != target:
                    col = pc.cast(col, target)
                cols[name] = col
            else:
                cols[name] = pa.nulls(
                    t.num_rows, target if target is not None else pa.string()
                )
        return pa.table(cols)

    return ds.map_batches(normalize, batch_format="pyarrow")


def ndjson_to_parquet(paths, out_dir: str, columns: list[str] | None = None,
                      schema: pa.Schema | None = None) -> str:
    """One-shot conversion: NDJSON → partitioned parquet (zstd) so subsequent
    runs get storage-level column pruning and cheap re-reads."""
    ds = read_ndjson(paths, columns=columns, schema=schema)
    ds.write_parquet(out_dir, compression="zstd")
    return out_dir


def write_ndjson(table: pa.Table, path: str) -> str:
    """Small-table NDJSON writer (test fixtures / interchange)."""
    import json

    with open(path, "w") as f:
        for row in table.to_pylist():
            f.write(json.dumps(row) + "\n")
    return path
