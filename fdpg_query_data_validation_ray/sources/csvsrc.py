"""CSV corpus source.

Reference analog: the reference's tabular side-inputs are flat files mounted
into its services (docker-compose.yml volume mounts; the value-set and config
CSV/JSON files under data_quality_check/). A reference user migrating ad-hoc
exports often has CSV — the lowest-common-denominator interchange format —
so the engine accepts it with the same projection/normalization discipline
as the NDJSON source (sources/ndjson.py).

Built on `ray.data.read_csv` (Arrow CSV reader, streaming block reads, one
task per file chunk). CSV has no storage-level column pruning and no
embedded types beyond inference — for repeated runs convert once with
`csv_to_parquet`; the job CLI does exactly that via its staging manifest.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_csv(paths, columns: list[str] | None = None,
             schema: pa.Schema | None = None):
    """Streaming CSV read → Ray Dataset.

    columns: projection applied per batch right after parse (CSV cannot
    prune at the storage layer — the parse cost is paid once, the downstream
    exchange cost is not).
    schema: optional target Arrow schema; present columns are cast, missing
    ones filled null — ragged/evolving exports normalize to one shape, and
    inference artifacts (e.g. an all-empty column read as null type, or ints
    widened from a header-only sample) are pinned to the declared types.

    Empty string fields read as NULL (strings_can_be_null) — the convention
    pandas/Spark default to, and the inverse of write_csv, which writes
    nulls as empty fields. CSV cannot distinguish "" from null; a corpus
    where that distinction matters must not round-trip through CSV."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    ds = rd.read_csv(
        paths,
        convert_options=pacsv.ConvertOptions(strings_can_be_null=True),
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
                cols[name] = (
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                )
            else:
                cols[name] = pa.nulls(
                    t.num_rows, target if target is not None else pa.string()
                )
        return pa.table(cols)

    return ds.map_batches(normalize, batch_format="pyarrow")


def csv_to_parquet(paths, out_dir: str, columns: list[str] | None = None,
                   schema: pa.Schema | None = None) -> str:
    """One-shot conversion: CSV → partitioned parquet (zstd) so subsequent
    runs get storage-level column pruning and cheap re-reads."""
    ds = read_csv(paths, columns=columns, schema=schema)
    ds.write_parquet(out_dir, compression="zstd")
    return out_dir


def write_csv(table: pa.Table, path: str) -> str:
    """Small-table CSV writer (test fixtures / interchange)."""
    import pyarrow.csv as pacsv

    pacsv.write_csv(table, path)
    return path
