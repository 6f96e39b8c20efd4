"""Flagship pipeline: checkpointed, partitioned validation of a Parquet corpus.

Reference analog: the extraction run (extraction/main.py:121-143,325-336) —
for each record class: fetch pages → validate each bundle → IssueSet dedup →
report — re-expressed as Ray Data:

    per partition (group of input files), skipped when already complete:
      read_parquet(files)                                  [streaming blocks]
        → map_batches(CheckAndProfile, actor pool)         [ONE pass emits
             row-check violations + stats partials (+ optional sha256 row
             digests) as a tagged union table]
        → write_parquet(partition tmp dir)                 [atomic rename]
      verdict.json: pass/fail + counts + lineage + metrics + stats partials

    global phase (after all partitions; cross-partition semantics):
      uniqueness groupby over projected key columns        [only shuffle]
      drift tests over merged partition sketches vs snapshot   [driver, tiny]

    report.json: deterministic merged report (reference raw_report shape,
    extraction/main.py:296-304) — byte-identical across resumed runs.

Scale notes: the union output is violations+partials, ≪ input (digests off by
default); uniqueness re-reads ONLY the key columns (column pruning) rather than
checkpointing a half-finished shuffle; stats partials persist in verdicts so
resume never re-streams finished partitions (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.rules import Rule, Suite, SuiteRegistry
from fdpg_query_data_validation_ray.schema import VIOLATION_SCHEMA
from fdpg_query_data_validation_ray.stages.drift import Snapshot, drift_violations
from fdpg_query_data_validation_ray.stages.row_checks import RowChecker, row_key_array
from fdpg_query_data_validation_ray.stages.stats import (
    ColumnPartial,
    PartialStats,
    _partials_from_table,
    _partials_to_table,
    finalize,
)

from fdpg_query_data_validation_ray.state.checkpoint import RunManifest
from fdpg_query_data_validation_ray.functions.hashing import sha256_column

def _shim_fsspec_http() -> None:
    """fsspec's http module hard-requires aiohttp (absent in this env). Ray
    probes `from fsspec.implementations.http import HTTPFileSystem` on every
    path resolve and only catches ModuleNotFoundError; with concurrent
    partition threads the repeatedly-failing import can also surface as a
    partial-module ImportError race. Register a minimal stub once so the probe
    import succeeds deterministically — HTTP filesystems are never used here,
    and isinstance() against the stub class is always False for real
    filesystems."""
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        import aiohttp  # noqa: F401

        return
    except ImportError:
        pass

    mod = types.ModuleType(name)

    class HTTPFileSystem:
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


_shim_fsspec_http()


# tagged-union output schema of the single-pass stage
UNION_SCHEMA = pa.schema(
    [("record_type", pa.string())]
    + list(VIOLATION_SCHEMA)
    + [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("sum_num", pa.float64()),
        ("sum_sq", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("hll", pa.binary()),
        ("kll", pa.binary()),
        ("dd", pa.binary()),
        ("cat_counts", pa.binary()),
        ("content_sha256", pa.string()),
        ("khash", pa.int64()),
        # per-batch khash sieve partials (record_type="khashagg"): one row
        # per checked batch carrying np.unique(key hashes) + counts as packed
        # bytes — the partition's npz sieve partial derives from these in the
        # commit tail, so uniqueness evidence costs NO extra input scan
        ("khash_uniq", pa.binary()),
        ("khash_counts", pa.binary()),
        # unambiguous composite-key encoding (length-prefixed; see
        # row_checks.key_encode_array) — the exact uniqueness-verify grouping
        # key; row_key stays the human-readable display form
        ("key_enc", pa.string()),
    ]
)


def _pad_to_union(t: pa.Table, record_type: str) -> pa.Table:
    cols = {}
    n = t.num_rows
    cols["record_type"] = pa.array([record_type] * n, pa.string())
    for f in UNION_SCHEMA:
        if f.name == "record_type":
            continue
        if f.name in t.column_names:
            cols[f.name] = pc.cast(t[f.name], f.type)
        else:
            cols[f.name] = pa.nulls(n, f.type)
    return pa.table(cols, schema=UNION_SCHEMA)


@dataclass
class ValidationPlan:
    """Everything declarative about a run (hashable → lineage / resume guard)."""

    registry: SuiteRegistry | None = None
    suite: Suite | None = None
    unique_keys: list[str] | None = None
    fk_broadcast: list[dict] = field(default_factory=list)  # {columns, dim_keys, name}
    drift_rules: list[Rule] = field(default_factory=list)
    snapshot_json: str | None = None
    stats_columns: list[str] | None = None
    categorical: list[str] = field(default_factory=list)
    content_column: str | None = None  # set → per-row sha256 digests emitted
    # per-code-system distribution split (reference: analyse_distribution
    # counts per search-path per code system, extraction/main.py:270-293):
    # {column: {system_name: [values...] | "path/to/value_set_file"}} — the
    # column must also be listed in `categorical` so its value counts exist
    code_systems: dict = field(default_factory=dict)

    def key_columns(self) -> tuple[str, ...]:
        s = self.suite or self.registry.default
        if s is None:
            s = next(iter(self.registry.routes.values()))
        return s.key_columns

    def config_hash(self) -> str:
        payload = {
            "registry": self.registry.to_json() if self.registry else None,
            "suite": self.suite.to_json() if self.suite else None,
            "unique_keys": self.unique_keys,
            "fk": [
                {"columns": f["columns"], "name": f.get("name", "dim"),
                 "dim_sha": hashlib.sha256(
                     "\n".join(sorted(map(str, f["dim_keys"]))).encode()
                 ).hexdigest()}
                for f in self.fk_broadcast
            ],
            "drift": [r.to_dict() for r in self.drift_rules],
            "snapshot": self.snapshot_json,
            "stats_columns": self.stats_columns,
            "categorical": self.categorical,
            "content_column": self.content_column,
            # value-set FILES hash by content (not path): republishing a set
            # changes the config hash → resume refuses stale checkpoints
            "value_set_files": self._value_set_file_hashes(),
            "code_systems": {
                col: {name: list(self._resolve_system_values(spec))
                      for name, spec in sorted(systems.items())}
                for col, systems in sorted(self.code_systems.items())
            },
        }
        return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]

    @staticmethod
    def _resolve_system_values(spec) -> list[str]:
        from fdpg_query_data_validation_ray.rules import load_value_set

        if isinstance(spec, str):
            return list(load_value_set(spec))
        return [str(v) for v in spec]

    def _value_set_file_hashes(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for s in _plan_suites(self):
            for r in s.rules:
                vf = r.params.get("values_file") if r.kind == "in_set" else None
                if vf and vf not in out:
                    try:
                        with open(vf, "rb") as f:
                            out[vf] = hashlib.sha256(f.read()).hexdigest()[:16]
                    except OSError:
                        out[vf] = "missing"
        return out


class CheckAndProfile:
    """The one-pass per-batch stage: row checks + broadcast FK + stats
    partials (+ optional sha256 digests), all from a single read of the block.
    Actor pool: suites/regexes/dim sets compiled or fetched once per actor."""

    def __init__(self, plan: ValidationPlan):
        from fdpg_query_data_validation_ray.stages.fk import BroadcastFKChecker
        from fdpg_query_data_validation_ray.stages.unique import key_hash

        self._key_hash = key_hash
        self.plan = plan
        self.checker = (
            RowChecker(suite=plan.suite)
            if plan.suite is not None
            else RowChecker(registry=plan.registry)
        )
        self.profiler = PartialStats(
            columns=plan.stats_columns, categorical=plan.categorical
        )
        self.fk_checkers = [
            BroadcastFKChecker(
                columns=f["columns"],
                key_columns=list(self.plan.key_columns()),
                dim_keys=list(f["dim_keys"]),
                dim_name=f.get("name", "dim"),
            )
            for f in plan.fk_broadcast
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = [
            _pad_to_union(self.checker(batch), "violation"),
            _pad_to_union(self.profiler(batch), "partial"),
        ]
        for fk in self.fk_checkers:
            parts.append(_pad_to_union(fk(batch), "violation"))
        if self.plan.content_column:
            digest = pa.table(
                {
                    "row_key": pc.cast(
                        row_key_array(batch, self.plan.key_columns()), pa.string()
                    ),
                    "content_sha256": sha256_column(
                        batch.column(self.plan.content_column)
                    ),
                }
            )
            parts.append(_pad_to_union(digest, "digest"))
        if self.plan.unique_keys:
            # khash sieve partial for this batch: unique 64-bit key hashes +
            # counts, packed — rides the union so the partition's uniqueness
            # evidence needs no second input scan (n_rows cross-checks
            # coverage at commit time)
            kh = self._key_hash(batch, list(self.plan.unique_keys)).view(np.int64)
            u, c = np.unique(kh, return_counts=True)
            parts.append(
                _pad_to_union(
                    pa.table(
                        {
                            "khash_uniq": pa.array([u.tobytes()], pa.binary()),
                            "khash_counts": pa.array(
                                [c.astype(np.int64).tobytes()], pa.binary()
                            ),
                            "n_rows": pa.array([len(kh)], pa.int64()),
                        }
                    ),
                    "khashagg",
                )
            )
        return pa.concat_tables(parts)


_STAGE_CACHE: dict[str, "CheckAndProfile"] = {}
"""Per-WORKER-PROCESS cache for the task-based check stage: one compiled
CheckAndProfile per run, keyed by the run's broadcast plan ref. Bounded to a
single entry (a worker serves one run's tasks at a time; a new run evicts)."""


def make_check_and_profile_fn(plan: "ValidationPlan"):
    """Task-based CheckAndProfile: the plan ships ONCE via ray.put; every
    worker process compiles the stage on its first batch and caches it for
    the rest of the run (module-level cache, same once-per-worker cost as an
    actor's __init__). Plain tasks beat an actor pool here: no pool startup
    latency per partition (~1.5 s of the flagship's wave-1 walls), no
    reserved-CPU quantization between concurrently-running partitions — Ray
    packs the whole cluster fluidly across all partitions' tasks — and no
    actor-restart edge cases. The memory cost is one compiled stage per
    worker, identical to the pool it replaces."""
    import ray

    plan_ref = ray.put(plan)
    key = plan_ref.hex()

    def check_and_profile(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            stage = CheckAndProfile(ray.get(plan_ref))
            _STAGE_CACHE.clear()
            _STAGE_CACHE[key] = stage
        return stage(batch)

    return check_and_profile


def _keyrec_table(batch: pa.Table, unique_keys: list[str]) -> pa.Table:
    """Per-row uniqueness record: unambiguous key_enc + the 64-bit key hash.
    The display row_key is NOT stored — it is derived from key_enc at report
    time (decode_key_display) for only the rare duplicate groups; the keyhash
    artifact is a non-scaling disk-write cost inside every partition, so each
    byte per row matters."""
    import numpy as np

    from fdpg_query_data_validation_ray.stages.row_checks import key_encode_array
    from fdpg_query_data_validation_ray.stages.unique import key_hash

    kh = key_hash(batch, list(unique_keys))
    return pa.table(
        {
            "key_enc": pc.cast(
                key_encode_array(batch, tuple(unique_keys)), pa.string()
            ),
            "khash": pa.array(kh.view(np.int64)),
        }
    )


_ENC_LEN_RE = None


def decode_key_display(enc: str) -> str:
    """key_enc ('3:abc;N;2:xy') → the display row_key form ('abc||xy' —
    CONCAT_WS semantics, nulls as empty). A string that does not parse as an
    encoding (legacy artifacts group by raw row_key) is returned verbatim."""
    import re as _re

    global _ENC_LEN_RE
    if _ENC_LEN_RE is None:
        _ENC_LEN_RE = _re.compile(r"(\d+):")
    parts = []
    i, n = 0, len(enc)
    while i < n:
        if enc[i] == "N" and (i + 1 == n or enc[i + 1] == ";"):
            parts.append("")
            i += 2
            continue
        m = _ENC_LEN_RE.match(enc, i)
        if not m:
            return enc
        ln = int(m.group(1))
        start = m.end()
        if start + ln > n:
            return enc
        parts.append(enc[start : start + ln])
        i = start + ln
        if i < n:
            if enc[i] != ";":
                return enc
            i += 1
            if i == n:  # trailing separator → dangling empty part: invalid
                return enc
    if not parts:
        return enc
    return "|".join(parts)


def decode_key_display_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized decode_key_display over a string array — same semantics,
    element for element (fuzz-tested against the scalar parser), but numpy
    over the flat Arrow char buffer instead of a Python char loop per key.
    Dense-duplicate corpora hit this with one key per duplicate GROUP
    (500k+ rows), where the scalar parse dominated the report tail.

    The loop count is data-bound, not row-bound: one iteration per key PART
    (= len(unique_keys)) plus one per digit of the longest length prefix —
    every iteration is a full-array numpy op."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    if arr.null_count:  # rare (callers never pass nulls today): decode the
        # null-filled array, then restore the input validity — null in,
        # null out, matching the scalar parser's contract
        mask = pc.is_null(arr)
        out = decode_key_display_array(pc.fill_null(arr, ""))
        return pc.if_else(mask, pa.scalar(None, pa.string()), out)
    arr = arr.cast(pa.large_string())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=arr.offset + n + 1)
    base = arr.offset  # slice-safety: logical element 0 may not be buffer 0
    starts_all = off[base : base + n].copy()
    ends_all = off[base + 1 : base + n + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    # the encoding's length prefixes count CHARACTERS (key_encode_array uses
    # pc.utf8_length); this parser walks BYTES, so the two agree only for
    # pure-ASCII rows. Rows containing any multi-byte char (rare in key
    # columns) are decoded by the scalar parser instead — exact parity at
    # the cost of a Python call per non-ASCII row.
    hi = buf >= 0x80
    if hi.any():
        hcum = np.zeros(len(buf) + 1, dtype=np.int64)
        np.cumsum(hi, out=hcum[1:])
        nonascii = (hcum[ends_all] - hcum[starts_all]) > 0
        if nonascii.any():
            # merge by permutation take — one scalar decode per non-ASCII
            # row, the ASCII majority stays Arrow end to end (a 500k-group
            # report with ONE accented key must not round-trip through
            # Python lists)
            ascii_mask = ~nonascii
            sub = (
                decode_key_display_array(arr.filter(pa.array(ascii_mask)))
                if ascii_mask.any()
                else pa.array([], pa.string())
            )
            hard = pa.array(
                [decode_key_display(v) for v in arr.filter(pa.array(nonascii)).to_pylist()],
                pa.string(),
            )
            combined = pa.concat_arrays([sub, hard])
            perm = np.empty(n, dtype=np.int64)
            perm[ascii_mask] = np.arange(len(sub), dtype=np.int64)
            perm[nonascii] = len(sub) + np.arange(len(hard), dtype=np.int64)
            return combined.take(pa.array(perm))
    valid = np.ones(n, dtype=bool)

    cur = starts_all.copy()
    ok = valid.copy()
    active = valid & (cur < ends_all)  # empty string → 0 parts → verbatim
    SEMI, COLON, CHAR_N, D0, D9 = (
        np.uint8(ord(";")), np.uint8(ord(":")), np.uint8(ord("N")),
        np.uint8(ord("0")), np.uint8(ord("9")),
    )
    part_starts: list[np.ndarray] = []  # per part-index: src start (int64)
    part_lens: list[np.ndarray] = []    # per part-index: length, -1 = absent
    while active.any():
        ps = np.full(n, 0, dtype=np.int64)
        pl = np.full(n, -1, dtype=np.int64)
        a = active.copy()
        c = cur
        nxt = np.minimum(c + 1, ends_all - 1)
        is_null_part = a & (buf[np.minimum(c, len(buf) - 1)] == CHAR_N) & (
            (c + 1 == ends_all) | (buf[nxt] == SEMI)
        )
        # null part: empty display text, cursor skips "N;"
        pl[is_null_part] = 0
        cur = np.where(is_null_part, c + 2, cur)
        lp = a & ~is_null_part  # rows that must parse a length prefix here
        # digit run: ln accumulates; rows whose first char isn't a digit fail
        ln = np.zeros(n, dtype=np.int64)
        dcount = np.zeros(n, dtype=np.int64)
        run = lp.copy()
        # length cap 2^55: a prefix that big can never satisfy start+len<=end
        # (buffers are <2^31), so the row lands on the scalar parser's
        # verbatim outcome — and 10*2^55+9 still fits int64 (no wraparound
        # into a NEGATIVE cursor, which would crash the gather)
        LEN_CAP = np.int64(1 << 55)
        while run.any():
            p = np.minimum(cur + dcount, ends_all - 1)
            ch = buf[p]
            isd = run & (cur + dcount < ends_all) & (ch >= D0) & (ch <= D9)
            ln[isd] = np.minimum(ln[isd] * 10 + (ch[isd] - D0), LEN_CAP)
            dcount[isd] += 1
            run = isd
        bad = lp & (dcount == 0)
        colon_at = np.minimum(cur + dcount, ends_all - 1)
        bad |= lp & ~bad & ~((cur + dcount < ends_all) & (buf[colon_at] == COLON))
        dstart = cur + dcount + 1
        bad |= lp & ~bad & (dstart + ln > ends_all)
        good = lp & ~bad
        ps[good] = dstart[good]
        pl[good] = ln[good]
        cur = np.where(good, dstart + ln, cur)
        # separator after a length-prefixed part: required unless at end;
        # trailing separator (";$") is invalid
        more = good & (cur < ends_all)
        sep_at = np.minimum(cur, len(buf) - 1)
        bad |= more & (buf[sep_at] != SEMI)
        cur = np.where(more & ~bad, cur + 1, cur)
        bad |= more & ~bad & (cur == ends_all)
        ok &= ~(active & bad)
        part_starts.append(ps)
        part_lens.append(pl)
        active = ok & valid & (cur < ends_all) & (pl >= 0) & active
        # null-part rows whose "N" was the last char: cursor overshot to end+1
        active &= cur < ends_all

    nparts = sum((pl >= 0).astype(np.int64) for pl in part_lens) if part_lens else np.zeros(n, np.int64)
    decoded = ok & valid & (nparts > 0)
    # output text: decoded rows → parts joined by '|'; everything else (bad
    # parse, zero parts) → the original string verbatim; nulls stay null
    lens_mat = (
        np.stack([np.maximum(pl, 0) for pl in part_lens])
        if part_lens
        else np.zeros((0, n), np.int64)
    )
    out_len = np.where(
        decoded,
        lens_mat.sum(axis=0) + nparts - 1,
        np.where(valid, ends_all - starts_all, 0),
    )
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out_buf = np.full(int(out_off[-1]), ord("|"), dtype=np.uint8)

    seg_dst, seg_src, seg_len = [], [], []
    # verbatim rows: one segment each
    verb = valid & ~decoded
    if verb.any():
        seg_dst.append(out_off[:-1][verb])
        seg_src.append(starts_all[verb])
        seg_len.append((ends_all - starts_all)[verb])
    # decoded rows: one segment per non-empty part; separators are already
    # in the buffer (prefilled '|'), parts land between them
    dst_cursor = out_off[:-1].copy()
    for k in range(len(part_lens)):
        pl, ps = part_lens[k], part_starts[k]
        has = decoded & (pl >= 0)
        nz = has & (pl > 0)
        if nz.any():
            seg_dst.append(dst_cursor[nz])
            seg_src.append(ps[nz])
            seg_len.append(pl[nz])
        dst_cursor[has] += np.maximum(pl[has], 0) + 1  # +1 skips the '|'
    if seg_dst:
        d = np.concatenate(seg_dst)
        s = np.concatenate(seg_src)
        L = np.concatenate(seg_len)
        keep = L > 0
        d, s, L = d[keep], s[keep], L[keep]
        if len(L):
            tot = int(L.sum())
            # int32 index math when it fits (always, for <2 GB buffers):
            # int64 arange/repeat/cumsum are ~20-30x slower on this host
            # class (first-touch cost scales with bytes)
            idt = np.int32 if max(tot, len(buf), len(out_buf)) < 2**31 - 1 else np.int64
            d, s, L = d.astype(idt), s.astype(idt), L.astype(idt)
            cs = np.zeros(len(L), dtype=idt)
            np.cumsum(L[:-1], out=cs[1:])
            within = np.arange(tot, dtype=idt) - np.repeat(cs, L)
            out_buf[np.repeat(d, L) + within] = buf[np.repeat(s, L) + within]

    return pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_buf.tobytes())],
    ).cast(pa.string())


def _plan_partitions(
    files: list[str], num_partitions: int, pid_offset: int = 0
) -> dict[str, list[str]]:
    files = sorted(files)
    num_partitions = max(1, min(num_partitions, len(files)))
    out: dict[str, list[str]] = {
        f"p{i + pid_offset:05d}": [] for i in range(num_partitions)
    }
    for i, f in enumerate(files):
        out[f"p{(i % num_partitions) + pid_offset:05d}"].append(f)
    return out


def _plan_append(
    old: dict, input_files: list[str], num_partitions: int
) -> dict[str, list[str]]:
    """Append-mode plan: existing partitions keep their exact file lists and
    committed verdicts; files not in the old input set become NEW partitions
    (numbered after the old ones, same files-per-partition density). Removed
    files are refused — a shrunk input would silently keep validating rows
    that no longer exist in the corpus."""
    import math

    old_parts: dict[str, list[str]] = old.get("partitions", {})
    old_files = {f for fl in old_parts.values() for f in fl}
    new_files = sorted(set(input_files) - old_files)
    removed = sorted(old_files - set(input_files))
    if removed:
        raise ValueError(
            f"append with {len(removed)} input file(s) removed (e.g. "
            f"{removed[0]}) — delete the output dir to start fresh"
        )
    plan = {pid: list(fl) for pid, fl in old_parts.items()}
    if new_files:
        per_part = max(
            1, math.ceil(max(1, len(old_files)) / max(1, len(old_parts)))
        )
        n_new = min(max(1, math.ceil(len(new_files) / per_part)), num_partitions)
        plan.update(_plan_partitions(new_files, n_new, pid_offset=len(old_parts)))
    return plan


def _scan_union(dir_path: str, record_type: str, columns: list[str]) -> pa.Table:
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    # select only files that actually carry union records: an EMPTY partition
    # (zero input rows) may leave no files or a schemaless placeholder, and a
    # placeholder must not mask sibling files (e.g. schema_violations.parquet)
    # by polluting the dataset-level inferred schema
    files = sorted(glob.glob(os.path.join(glob.escape(dir_path), "*.parquet")))
    good = []
    for f in files:
        # a footer READ failure raises: a corrupt artifact must fail loudly
        # (error channel / failed run), never silently shrink the violation
        # set; only genuinely record_type-less files (empty-write
        # placeholders) are skipped
        if "record_type" in pq.read_schema(f).names:
            good.append(f)
    if not good:
        return pa.table(
            {c: pa.array([], UNION_SCHEMA.field(c).type) for c in columns}
        )
    dset = pads.dataset(good, format="parquet")
    return dset.to_table(
        columns=columns, filter=pads.field("record_type") == record_type
    )


def _file_stamps(files: list[str]) -> dict[str, tuple[int, int]]:
    """(mtime_ns, size) per input file — cheap identity snapshot used to
    detect a file being swapped between the check pass and the concurrent
    column-pruned keyhash re-read (the two must see identical bytes)."""
    out = {}
    for f in files:
        st = os.stat(f)
        out[f] = (st.st_mtime_ns, st.st_size)
    return out


def _run_one_partition(
    pid: str,
    files: list[str],
    out_dir: str,
    plan: ValidationPlan,
    cfg_hash: str,
    manifest: RunManifest,
    batch_size: int,
    concurrency,
    check_fn=None,
    read_blocks: int | None = None,
    in_worker: bool = False,
    keyhash_mode: str | None = None,
) -> None:
    import ray.data as rd

    if in_worker:
        # dispatched as a Ray task → this body owns a fresh worker process:
        # quiet the nested executor's per-dataset INFO chatter and progress
        # bars. NEVER on the threads path — that would permanently mutate
        # the embedding application's logging/DataContext.
        import logging

        logging.getLogger("ray.data").setLevel(logging.WARNING)
        rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.monotonic()
    tmp_dir = os.path.join(out_dir, f".tmp_{pid}")
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "combined"), exist_ok=True)

    # snapshot input identity BEFORE any scan: the keyhash pass re-reads the
    # same files concurrently with the check pass, and a file swapped mid-
    # partition would silently diverge the keyhash rows from the rows checked
    stamps = _file_stamps(files)

    rb = {"override_num_blocks": read_blocks} if read_blocks else {}
    ds = rd.read_parquet(files, **rb)
    if concurrency is None:
        # default: task-based stage (see make_check_and_profile_fn) — fluid
        # CPU packing across concurrently-running partitions
        combined = ds.map_batches(
            check_fn if check_fn is not None else make_check_and_profile_fn(plan),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        # explicit concurrency: caller wants the actor pool (e.g. to bound
        # the stage's share of a shared cluster)
        combined = ds.map_batches(
            CheckAndProfile,
            fn_constructor_kwargs=dict(plan=plan),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def write_combined():
        # zstd: the union artifact (violations + partials + per-row digests)
        # is the pipeline's largest disk write — a non-CPU-scaling cost on a
        # single box; compression trades a little parallel CPU for it
        combined.write_parquet(
            os.path.join(tmp_dir, "combined"), compression="zstd"
        )

    def write_keyhash():
        # keyhash records live in their OWN compact parquet (2 columns, big
        # row groups), NOT in the tagged union: the global uniqueness phase
        # scans them twice, and the union's mixed row groups made that scan
        # decode every digest row's strings too (~8x the bytes). Built from a
        # column-pruned re-read of the input (only the key columns leave
        # storage — far cheaper than fattening every union block).
        changed = [f for f, s in _file_stamps(files).items() if stamps.get(f) != s]
        if changed:
            # fail the partition (error channel, is_complete=False) rather
            # than commit keyhash rows derived from different bytes than the
            # rows the check pass validated
            raise RuntimeError(
                f"input files changed mid-partition before keyhash pass: {changed}"
            )
        uk = list(plan.unique_keys)
        rd.read_parquet(files, columns=uk, **rb).map_batches(
            lambda t: _keyrec_table(t, uk), batch_format="pyarrow"
        ).write_parquet(
            os.path.join(tmp_dir, "keyhash"),
            # few fat files per partition: the global phase scans these twice,
            # and per-file open/metadata cost dominated with block-sized files
            min_rows_per_file=1_000_000,
            # the write is the pipeline's one disk-bound (non-CPU-scaling)
            # cost; zstd cuts the key_enc bytes ~40% vs snappy at equal speed
            compression="zstd",
        )

    # Two uniqueness-evidence modes (QDV_KEYHASH_MODE=auto|partial|artifact):
    # within the per-partition driver budget the check pass itself carries
    # the evidence — per-batch khashagg rows in the union collapse to one
    # compact khash_partial.npz in the commit tail (no second input scan, no
    # per-row keyhash parquet), and the global exact verify re-reads the
    # INPUT key columns of just the candidate partitions. Beyond the budget
    # the per-row keyhash artifact is still written (the distributed shuffle
    # verify consumes it), overlapped with the union write.
    use_partial = bool(plan.unique_keys) and _keyhash_partial_mode(
        files, keyhash_mode
    )
    if plan.unique_keys and not use_partial:
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=2) as _ex:
            fc = _ex.submit(write_combined)
            fk = _ex.submit(write_keyhash)
            fc.result()
            fk.result()
    else:
        write_combined()
    if os.environ.get("QDV_TIMING"):
        import sys as _sys

        print(
            f"[qdv-timing] partition[{pid}].pipelines: {time.monotonic() - t0:.3f}s",
            file=_sys.stderr,
        )

    # schema-level dtype rules: one check per input FILE (footer schema read,
    # no data IO) — deterministic under any batch size / parallelism
    sv = _schema_violations_for_files(files, plan)
    if sv.num_rows:
        import pyarrow.parquet as pq

        pq.write_table(
            _pad_to_union(sv, "violation"),
            os.path.join(tmp_dir, "combined", "schema_violations.parquet"),
        )

    # small, column-pruned reads of the partition artifact — three
    # independent scans (severity, stats partials, khashagg), overlapped: the
    # commit tail sits on the job's critical path for the last partition
    combined_dir = os.path.join(tmp_dir, "combined")
    from concurrent.futures import ThreadPoolExecutor as _TailTPE

    with _TailTPE(max_workers=3) as _tex:
        f_sev = _tex.submit(_scan_union, combined_dir, "violation", ["severity"])
        f_part = _tex.submit(
            _scan_union,
            combined_dir,
            "partial",
            [
                f.name
                for f in UNION_SCHEMA
                if f.name
                not in (
                    "record_type",
                    *VIOLATION_SCHEMA.names,
                    "content_sha256",
                    "khash_uniq",
                    "khash_counts",
                )
            ],
        )
        f_kh = (
            _tex.submit(_scan_khashagg, combined_dir) if plan.unique_keys else None
        )
        sev = f_sev.result()["severity"]
        partial_t = f_part.result()
    partials = finalize_partials(_partials_from_table(partial_t))
    rows_checked = max((p.n_rows for p in partials.values()), default=0)
    if plan.unique_keys:
        try:
            uniq_arr, counts_arr, n_agg = f_kh.result()
            if n_agg != rows_checked:
                raise RuntimeError(
                    f"khash sieve partial covers {n_agg} rows but the check "
                    f"pass saw {rows_checked} — refusing inconsistent "
                    "uniqueness evidence"
                )
            _khash_partial_write(
                tmp_dir,
                uniq_arr,
                counts_arr,
                n_agg,
                # partial mode: also resolve within-partition duplicate
                # groups NOW (pruned page-hot re-read, parallel phase) so the
                # global verify re-reads only cross-partition candidates
                input_files=files if use_partial else None,
                unique_keys=list(plan.unique_keys) if use_partial else None,
                # the sidecar derives from a RE-READ: it must see the exact
                # bytes the check pass hashed (same guard as write_keyhash)
                stamps=stamps if use_partial else None,
            )
        except Exception:
            if use_partial:
                # the npz IS this partition's only uniqueness evidence in
                # partial mode — a partition without it must fail (error
                # channel) rather than silently drop out of the global verify
                raise
            # artifact mode: the per-row keyhash parquet remains the
            # authoritative evidence; the npz is only a pass-A shortcut
            # (never written on failure — coverage is validated above)
    n_err = int(
        pc.sum(
            pc.cast(pc.is_in(sev, value_set=pa.array(["fatal", "error"])), pa.int64())
        ).as_py()
        or 0
    )
    n_warn = len(sev) - n_err
    verdict = {
        "partition_id": pid,
        "passed": n_err == 0,
        "rows_checked": rows_checked,
        "violation_count": n_err,
        "warning_count": n_warn,
        "lineage": {
            "input_files": files,
            "config_hash": cfg_hash,
            # identity of the exact bytes this verdict was computed from —
            # the global uniqueness verify re-reads input key columns for
            # candidate partitions and must refuse silently-changed files
            "file_stamps": {f: list(s) for f, s in stamps.items()},
        },
        "metrics": {"wall_s": round(time.monotonic() - t0, 3)},
        "stats_partials": _encode_partials(partials),
    }
    manifest.commit_partition(pid, verdict, tmp_dir)
    if os.environ.get("QDV_TIMING"):
        import sys as _sys

        print(
            f"[qdv-timing] partition[{pid}].total: {time.monotonic() - t0:.3f}s",
            file=_sys.stderr,
        )


def _default_pool(partition_threads: int) -> tuple[int, int]:
    """Actor-pool bounds for CheckAndProfile, sized from the cluster so the
    pools of concurrently-running partitions together can use every CPU
    without one pool starving the read/write stages."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    per = max(2, (cpus - 2) // max(1, partition_threads))
    return (1, per)


def run_validation(
    input_files: list[str],
    out_dir: str,
    plan: ValidationPlan,
    num_partitions: int = 8,
    batch_size: int = 4096,
    concurrency=None,
    partition_threads: int | None = None,
    append: bool = False,
) -> dict:
    """Execute (or resume) a checkpointed validation run; returns the merged
    report dict (also written to out_dir/report.json).

    Partitions run `partition_threads` at a time (driver threads, each
    executing its own streaming Dataset): one partition's actor-pool warm-up
    and sink latency overlaps another's compute, while the checkpoint unit —
    one verdict + artifact dir per partition, committed atomically — stays
    intact. Verdict merge order is sorted, so the report is byte-identical
    regardless of completion order (resume-safe determinism, SURVEY.md §7.4).
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    manifest = RunManifest(out_dir)
    cfg_hash = plan.config_hash()
    run_cfg_path = os.path.join(out_dir, "run.json")
    if append and os.path.exists(run_cfg_path):
        # incremental validation: new input files become NEW partitions;
        # committed partitions and their verdicts are untouched (the global
        # phase re-runs over ALL partitions, so cross old↔new duplicates are
        # still caught). Same config only — the guard below enforces it.
        old_cfg = json.load(open(run_cfg_path))
        if old_cfg.get("config_hash") != cfg_hash:
            raise ValueError(
                "append with a different config: "
                f"{old_cfg.get('config_hash')} != {cfg_hash} "
                "(delete the output dir to start fresh)"
            )
        partitions = _plan_append(old_cfg, list(input_files), num_partitions)
        RunManifest._atomic_json(
            run_cfg_path,
            {
                "config_hash": cfg_hash,
                "partitions": partitions,
                "input_files": sorted(input_files),
            },
        )
    else:
        partitions = _plan_partitions(list(input_files), num_partitions)
        manifest.write_run_config(
            {"config_hash": cfg_hash, "partitions": partitions, "input_files": sorted(input_files)}
        )

    todo = [pid for pid in sorted(partitions) if not manifest.is_complete(pid)]
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if partition_threads is None:
        # concurrent partitions hide each other's serial segments (executor
        # startup, write finalization, commit tails) — measured 45→33 s at
        # 8 CPUs (1→2 threads) and 21→15 s at 32 CPUs (4→8 threads) on the
        # 12M-row flagship corpus. Task-based check stages pack fluidly, so
        # oversubscription deadlock (the old actor-pool concern) is gone;
        # the cap only bounds driver-thread overhead.
        partition_threads = min(8, max(1, cpus // 4), max(1, len(todo)))
    # read-task granularity: with concurrent partitions each pipeline should
    # produce ~its CPU share of blocks — inheriting the files' raw row-group
    # fragmentation either caps parallelism (1 fat row group per file) or
    # shatters the partition into tiny blocks (tiny row groups → one small
    # zstd output file + scan-tail open per block)
    # partition dispatch: by default each partition's pipeline runs inside a
    # RAY TASK (its own worker process drives the nested Dataset execution)
    # — N streaming executors on one driver process serialize their
    # scheduling loops on the GIL, which stretched every concurrent
    # partition's wall at high CPU counts. Driver threads remain for the
    # explicit actor-pool path (pools + nested dispatch interact with
    # placement) and as QDV_PARTITION_DISPATCH=threads. Artifacts/manifest
    # live on storage every node can read-write — the same assumption
    # checkpoint resume already makes.
    use_task_dispatch = False
    if todo and concurrency is None and os.environ.get(
        "QDV_PARTITION_DISPATCH", "tasks"
    ) == "tasks":
        try:
            use_task_dispatch = ray.is_initialized()
        except Exception:
            use_task_dispatch = False
    # 2× oversubscription: read→check is NOT operator-fused (the map stage
    # consumes read blocks via the object store), so a partition with
    # exactly cpu-share blocks leaves bubbles while reads hand off; extra
    # blocks keep every slot fed. Divided by how many partitions actually
    # run CONCURRENTLY — all of them under the dispatch mode that will
    # really be used, the thread-pool width otherwise.
    # QDV_READ_BLOCKS overrides for tuning.
    n_concurrent = (
        max(1, len(todo)) if use_task_dispatch else max(1, partition_threads)
    )
    env_rb = os.environ.get("QDV_READ_BLOCKS")
    read_blocks = int(env_rb) if env_rb else max(2, 4 * cpus // n_concurrent)
    # concurrency=None (default) → task-based check stage: the compiled plan
    # is broadcast once and cached per worker; partitions share the whole
    # cluster fluidly. An explicit concurrency tuple restores the actor pool
    # (_default_pool sizes it when callers want that path).
    check_fn = make_check_and_profile_fn(plan) if concurrency is None and todo else None
    # resolved HERE (driver env) — workers' env snapshots predate the caller
    keyhash_mode = os.environ.get("QDV_KEYHASH_MODE", "auto")
    t_part = time.monotonic()
    _preloaded_partials: dict[str, object] = {}
    _sieve_within: dict[str, object] = {}
    # pairwise mode: list of pair-intersect refs; tree mode (beyond the
    # pairwise cap): _sieve_pairs becomes None and _sieve_tree holds the
    # binary counter's level → node refs
    _sieve_pairs: list | None = []
    _sieve_tree: dict[int, object] = {}
    _report_partials: dict[str, object] = {}
    if todo and use_task_dispatch:
        import ray

        # zero-CPU launchers: a launcher only drives its nested Dataset
        # execution (scheduling + driver-side commit tail) — reserving CPU
        # for it starves the real work on small clusters (8 × 0.25 CPU ate
        # HALF of a 4-CPU cluster). max_retries=0 keeps the error-channel
        # semantics (a failed partition commits a FAILED verdict; resume
        # retries it).
        part_task = ray.remote(num_cpus=0, max_retries=0)(_run_one_partition)
        refs = {
            pid: part_task.remote(
                pid,
                partitions[pid],
                out_dir,
                plan,
                cfg_hash,
                manifest,
                batch_size,
                concurrency,
                check_fn,
                read_blocks,
                in_worker=True,
                keyhash_mode=keyhash_mode,
            )
            for pid in todo
        }
        # harvest completions as they land and immediately kick off each
        # partition's khash-partial load — the global sieve's pass A then
        # finds its inputs already in the object store instead of paying a
        # serial load tail after the LAST partition finishes
        load_task = (
            ray.remote(num_cpus=0.5)(_load_khash_partial)
            if plan.unique_keys
            else None
        )
        # incremental sieve: within-dup and pairwise-intersect tasks chain on
        # the load refs (Ray dereferences task args), so the candidate-set
        # work overlaps the remaining partitions. O(P²) pairs — only viable
        # for modest partition counts; beyond the cap the global phase uses
        # the sort-merge path over the same partials.
        # cap on the TOTAL partition count (todo + already-committed): the
        # pre-feed loop pairs completed partitions too, so a resume/append
        # of a large run must not explode into O(P²) pair tasks
        pairwise_ok = load_task is not None and len(partitions) <= int(
            os.environ.get("QDV_PAIRWISE_MAX_PARTS", "40")
        )
        if load_task is not None:
            within_task = ray.remote(num_cpus=0.25)(_khash_within_dups)
            if pairwise_ok:
                pair_task = ray.remote(num_cpus=0.25)(_khash_pair_intersect)
            else:
                _sieve_pairs = None
                # beyond the O(P²) pairwise cap: incremental binary-counter
                # merge tree — O(P) tasks, O(total·log P) work, still fully
                # overlapped with the partition phase; the global phase folds
                # the ≤log₂(P) counter nodes in one root task
                tree_leaf = ray.remote(num_cpus=0.25)(_khash_tree_leaf)
                tree_merge = ray.remote(num_cpus=0.5)(_khash_tree_merge)
        viol_task = ray.remote(num_cpus=0.5)(_violation_dedup_partial)

        def _sieve_feed(pid: str) -> None:
            """Chain this partition's sieve/report tasks on its load ref."""
            if load_task is not None:
                lref = load_task.remote(manifest.partition_dir(pid))
                _sieve_within[pid] = within_task.remote(lref)
                if pairwise_ok:
                    for prev_ref in _preloaded_partials.values():
                        _sieve_pairs.append(pair_task.remote(prev_ref, lref))
                else:
                    node, level = tree_leaf.remote(lref), 0
                    while level in _sieve_tree:
                        node = tree_merge.remote(_sieve_tree.pop(level), node)
                        level += 1
                    _sieve_tree[level] = node
                _preloaded_partials[pid] = lref
            _report_partials[pid] = viol_task.remote(
                os.path.join(manifest.partition_dir(pid), "combined")
            )

        # partitions already committed by an earlier run (resume/append):
        # feed their partials into the incremental sieve up front so the
        # global phase stays on the fast path
        for pid in sorted(partitions):
            if pid not in refs and manifest.is_complete(pid):
                _sieve_feed(pid)
        pending = {r: pid for pid, r in refs.items()}
        while pending:
            done, _ = ray.wait(list(pending.keys()), num_returns=1)
            r = done[0]
            pid = pending.pop(r)
            try:
                ray.get(r)
            except Exception as exc:
                _commit_failed_partition(
                    manifest, pid, partitions[pid], cfg_hash, out_dir, exc
                )
                continue
            _sieve_feed(pid)
    elif todo:
        with ThreadPoolExecutor(max_workers=partition_threads) as pool:
            futures = {
                pid: pool.submit(
                    _run_one_partition,
                    pid,
                    partitions[pid],
                    out_dir,
                    plan,
                    cfg_hash,
                    manifest,
                    batch_size,
                    concurrency,
                    check_fn,
                    read_blocks,
                    False,
                    keyhash_mode,
                )
                for pid in todo
            }
            for pid, f in futures.items():
                try:
                    f.result()
                except Exception as exc:
                    # error channel (reference: request failure → error issue,
                    # run continues, extraction/main.py:90-93,140-141): the
                    # partition commits a FAILED verdict carrying an
                    # error-channel issue; other partitions keep running and
                    # the merged report shows the failure as data. Failed
                    # verdicts are NOT treated as complete by resume — a
                    # re-run retries the partition and overwrites the failure
                    # on success (transient infra errors heal themselves).
                    _commit_failed_partition(
                        manifest, pid, partitions[pid], cfg_hash, out_dir, exc
                    )

    # ---- global phase: cross-partition checks ------------------------------
    # cache: the global phase is a pure function of (config, completed
    # partition verdict set); if the existing report was built from exactly
    # this state, re-running uniqueness/drift/report is a no-op — return it
    # (repeat resumes become metadata-only). The key hashes each verdict
    # FILE's bytes (a content guarantee), not a timing proxy like wall_s —
    # a retried-and-failed-differently partition changes the key.
    def _verdict_bytes_sha(pid: str) -> str:
        p = os.path.join(manifest.partition_dir(pid), "verdict.json")
        with open(p, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    partitions_hash = hashlib.sha256(
        json.dumps(
            [(pid, _verdict_bytes_sha(pid))
             for pid in manifest.completed_partitions()],
            sort_keys=True,
        ).encode()
    ).hexdigest()[:16]
    # the cache key lives in a SIDECAR (report.meta.json), never inside
    # report.json itself: wall_s feeds the key, and reports must stay
    # byte-identical between interrupted-and-resumed and uninterrupted runs
    report_path = os.path.join(out_dir, "report.json")
    meta_path = os.path.join(out_dir, "report.meta.json")
    if os.path.exists(report_path) and os.path.exists(meta_path):
        try:
            meta = json.load(open(meta_path))
            if (
                meta.get("config_hash") == cfg_hash
                and meta.get("partitions_hash") == partitions_hash
            ):
                return json.load(open(report_path))
        except (OSError, json.JSONDecodeError):
            pass

    def _tmark(label: str, since: float) -> float:
        now = time.monotonic()
        if os.environ.get("QDV_TIMING"):
            import sys as _sys

            print(f"[qdv-timing] {label}: {now - since:.3f}s", file=_sys.stderr)
        return now

    _tmark("partitions.total", t_part)
    tg = time.monotonic()
    global_violations: list[dict] = []
    if plan.unique_keys:
        global_violations.extend(
            _uniqueness_from_artifacts(
                manifest,
                list(plan.unique_keys),
                preloaded=_preloaded_partials,
                within_refs=_sieve_within,
                pair_refs=_sieve_pairs,
                tree_refs=list(_sieve_tree.values()) or None,
            )
        )
    tg = _tmark("global.uniqueness", tg)
    merged_partials = _merge_all_partials(manifest)
    tg = _tmark("global.merge_partials", tg)
    if plan.drift_rules and plan.snapshot_json:
        global_violations.extend(
            drift_violations(
                Snapshot.from_partials(list(merged_partials.values())),
                Snapshot.from_json(plan.snapshot_json),
                plan.drift_rules,
            )
        )

    from fdpg_query_data_validation_ray.pipelines.report import build_report
    from fdpg_query_data_validation_ray.pipelines.report_md import write_markdown_report

    report = build_report(
        manifest, merged_partials, global_violations, cfg_hash,
        code_systems=plan.code_systems,
        violation_partials=_report_partials,
    )
    tg = _tmark("global.build_report", tg)
    RunManifest._atomic_json(report_path, report)
    RunManifest._atomic_json(
        meta_path, {"config_hash": cfg_hash, "partitions_hash": partitions_hash}
    )
    write_markdown_report(
        report, os.path.join(out_dir, "report.md"), registry=plan.registry
    )
    from fdpg_query_data_validation_ray.pipelines.report_pdf import write_pdf_report

    write_pdf_report(
        report, os.path.join(out_dir, "report.pdf"), registry=plan.registry
    )
    _tmark("global.write_reports", tg)
    return report


def _plan_suites(plan: ValidationPlan) -> list[Suite]:
    suites: list[Suite] = []
    if plan.suite is not None:
        suites.append(plan.suite)
    if plan.registry is not None:
        suites.extend(plan.registry.routes.values())
        if plan.registry.default is not None:
            suites.append(plan.registry.default)
        for sub in plan.registry.sub_routes.values():
            suites.extend(sub.values())
    return suites


def _schema_violations_for_files(files: list[str], plan: ValidationPlan) -> pa.Table:
    """dtype rules from EVERY suite in the plan (deduped by rule identity)
    evaluated against each file's parquet footer schema."""
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.row_checks import schema_violations

    rules = {}
    for s in _plan_suites(plan):
        for r in s.table_rules:
            if r.kind == "dtype":
                rules[(r.rule_id, r.column, r.params.get("arrow_type"), r.severity)] = r
    if not rules:
        return VIOLATION_SCHEMA.empty_table()
    synth = Suite("schema", list(rules.values()), key_columns=())
    parts = []
    for f in sorted(files):
        try:
            schema = pq.read_schema(f)
        except Exception:
            continue  # unreadable files surface via the error channel instead
        parts.append(schema_violations(schema, synth, source=os.path.basename(f)))
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts) if parts else VIOLATION_SCHEMA.empty_table()


def _commit_failed_partition(
    manifest: RunManifest,
    pid: str,
    files: list[str],
    cfg_hash: str,
    out_dir: str,
    exc: Exception,
) -> None:
    import shutil

    tmp_dir = os.path.join(out_dir, f".tmp_fail_{pid}")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "combined"), exist_ok=True)
    err_row = pa.table(
        {
            "rule_id": ["error:partition_failed"],
            "severity": ["error"],
            "location": [""],
            "diagnostics": [f"{type(exc).__name__}: partition could not be processed"],
            "row_key": [pid],
            "actual": [str(exc)[:200]],
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(
        _pad_to_union(err_row, "violation"),
        os.path.join(tmp_dir, "combined", "error.parquet"),
    )
    verdict = {
        "partition_id": pid,
        "passed": False,
        "failed": True,  # resumable: is_complete() stays False, re-runs retry
        "rows_checked": 0,
        "violation_count": 1,
        "warning_count": 0,
        "lineage": {"input_files": files, "config_hash": cfg_hash},
        "metrics": {"failed": True},
        "stats_partials": _encode_partials({}),
    }
    manifest.commit_partition(pid, verdict, tmp_dir)


def snapshot_from_run(out_dir: str) -> str:
    """Build a drift Snapshot JSON from a finished run's persisted sketch
    partials and write it to out_dir/snapshot.json — the reference baseline a
    later run's `drift_rules` compare against (completes the drift loop:
    run 1 snapshots, run 2 drifts)."""
    manifest = RunManifest(out_dir)
    merged = _merge_all_partials(manifest)
    snap = Snapshot.from_partials(list(merged.values()))
    path = os.path.join(out_dir, "snapshot.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(snap.to_json())
    os.replace(tmp, path)
    return path


def scan_partition_artifacts(
    manifest: RunManifest,
    record_type: str,
    columns: list[str],
    transform=None,
) -> list:
    """Pruned scan of every committed partition's combined/ artifact for one
    record type, run in a capped driver thread pool (parquet decode releases
    the GIL). `transform` runs per table INSIDE the worker thread so callers
    can reduce each partition's rows before anything accumulates."""
    from concurrent.futures import ThreadPoolExecutor

    dirs = [
        os.path.join(manifest.partition_dir(pid), "combined")
        for pid in manifest.completed_partitions()
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return []

    def one(d: str):
        t = _scan_union(d, record_type, columns)
        return transform(t) if transform else t

    # cluster dispatch when up (decode on every core, not ≤8 GIL-sharing
    # driver threads); artifacts are on cluster-readable storage (same
    # assumption as checkpoint resume)
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(dirs) > 1
    except Exception:
        pass
    if use_ray:
        task = ray.remote(num_cpus=1)(one)
        return ray.get([task.remote(d) for d in dirs])
    with ThreadPoolExecutor(max_workers=min(8, len(dirs))) as pool:
        return list(pool.map(one, dirs))


def _grouping_key(t: pa.Table) -> pa.Table:
    """Exact verify grouping key: the unambiguous length-prefixed key_enc
    (distinct composite keys can never collide, unlike the '|'-joined
    row_key); artifacts from older runs without key_enc fall back to raw
    row_key grouping. Output: (gkey, genc, khash) — genc records PROVENANCE
    (1 = value came from key_enc, 0 = legacy raw row_key) so the display
    decode never has to sniff the format: a legacy key that coincidentally
    parses as an encoding ('3:abc') must NOT be rewritten."""
    if "genc" in t.column_names:  # provenance pre-computed (e.g. by
        # _keyhash_dataset, whose legacy reader bakes the coalesce in)
        gkey = t["key_enc"] if "key_enc" in t.column_names else t["row_key"]
        genc = t["genc"]
    elif "key_enc" in t.column_names and "row_key" in t.column_names:
        enc_valid = pc.is_valid(t["key_enc"])
        gkey = pc.coalesce(t["key_enc"], t["row_key"])
        genc = pc.cast(enc_valid, pa.int8())
    elif "key_enc" in t.column_names:
        gkey = t["key_enc"]
        genc = pa.array(np.ones(t.num_rows, dtype=np.int8))
    else:
        gkey = t["row_key"]
        genc = pa.array(np.zeros(t.num_rows, dtype=np.int8))
    return pa.table(
        {"gkey": pc.cast(gkey, pa.string()), "genc": genc, "khash": t["khash"]}
    )


def _uniqueness_violation_rows(g: pa.Table, unique_keys: list[str]) -> list[dict]:
    """(gkey, genc, count_all) dup groups → violation dicts. The display
    row_key is decoded ONLY for keys whose provenance is key_enc (genc=1);
    legacy raw row_keys pass through verbatim even when they coincidentally
    parse as an encoding. Sorted deterministically by (row_key, gkey)."""
    from fdpg_query_data_validation_ray.rules import DIAGNOSTICS

    gkey = g["gkey"]
    decoded = decode_key_display_array(gkey)
    if "genc" in g.column_names:
        # provenance: decode ONLY key_enc-sourced keys (genc=1); legacy raw
        # row_keys pass through verbatim even when they parse as an encoding
        is_enc = pc.cast(pc.equal(g["genc"], 1), pa.bool_())
        row_key = pc.if_else(is_enc, decoded, gkey)
    else:
        row_key = decoded  # pre-provenance callers: all keys are key_enc
    g = g.append_column("row_key", row_key)
    g = g.sort_by([("row_key", "ascending"), ("gkey", "ascending")])
    rule_id = f"unique({','.join(unique_keys)})"
    location = ",".join(unique_keys)
    return [
        {
            "rule_id": rule_id,
            "severity": "error",
            "location": location,
            "diagnostics": DIAGNOSTICS["unique"],
            "row_key": rk,
            "actual": str(c),
        }
        for rk, c in zip(g["row_key"].to_pylist(), g["count_all"].to_pylist())
    ]


def _khash_partial_from_union(
    combined_dir: str,
    out_dir: str,
    expect_rows: int,
    input_files: list[str] | None = None,
    unique_keys: list[str] | None = None,
    stamps: dict | None = None,
) -> None:
    """Collapse the check pass's per-batch khashagg rows to ONE (sorted
    unique khash, count) partial and persist it as khash_partial.npz
    (committed atomically with the partition — written into the pre-commit
    tmp dir). Coverage is validated against the partition's checked row
    count BEFORE anything is persisted: a partial that does not account for
    every row must not exist (pass A would silently under-count with it).

    When input_files/unique_keys are given, hashes duplicated WITHIN this
    partition are also resolved to exact (gkey, count) aggregates right here
    — a pruned re-read while the files are page-hot, inside the PARALLEL
    partition phase — and stored as the wd_* sidecar arrays, so the global
    phase only re-reads partitions for genuinely CROSS-partition
    candidates."""
    uniq, counts, n = _scan_khashagg(combined_dir)
    if n != expect_rows:
        raise RuntimeError(
            f"khash sieve partial covers {n} rows but the check pass saw "
            f"{expect_rows} — refusing inconsistent uniqueness evidence"
        )
    _khash_partial_write(
        out_dir, uniq, counts, n, input_files, unique_keys, stamps
    )


def _scan_khashagg(combined_dir: str):
    """Scan + collapse the per-batch khashagg rows: (sorted unique khash,
    counts, total rows covered). Pure read — safe to overlap with the other
    commit-tail scans; the coverage check happens at write time."""
    import numpy as np

    t = _scan_union(
        combined_dir, "khashagg", ["khash_uniq", "khash_counts", "n_rows"]
    )
    n = int(pc.sum(t["n_rows"]).as_py() or 0)
    us = [np.frombuffer(b.as_py(), np.int64) for b in t["khash_uniq"]]
    cs = [np.frombuffer(b.as_py(), np.int64) for b in t["khash_counts"]]
    if us:
        u0 = np.concatenate(us)
        c0 = np.concatenate(cs)
        order = np.argsort(u0, kind="stable")
        u0, c0 = u0[order], c0[order]
        starts = np.flatnonzero(np.r_[True, u0[1:] != u0[:-1]])
        uniq = u0[starts]
        counts = np.add.reduceat(c0, starts)
    else:
        uniq = np.array([], np.int64)
        counts = np.array([], np.int64)
    return uniq, counts, n


def _khash_partial_write(
    out_dir: str,
    uniq,
    counts,
    n: int,
    input_files: list[str] | None = None,
    unique_keys: list[str] | None = None,
    stamps: dict | None = None,
) -> None:
    import numpy as np
    wd_gkey = np.array([], dtype=np.str_)
    wd_count = np.array([], np.int64)
    wd_khash = np.array([], np.int64)
    have_sidecar = input_files is not None and unique_keys is not None
    if have_sidecar:
        wd = uniq[counts > 1]
        if len(wd):
            if stamps is not None:
                changed = [
                    f
                    for f, s in _file_stamps(list(input_files)).items()
                    if stamps.get(f) != s
                ]
                if changed:
                    # a silently-swapped file would make the sidecar disagree
                    # with the khashagg hashes — duplicate groups could
                    # VANISH without error; fail the partition instead
                    raise RuntimeError(
                        "input files changed mid-partition before the "
                        f"within-dup sidecar pass: {changed}"
                    )
            g = _aggregate_candidate_keys(input_files, list(unique_keys), wd)
            if g is None or not g.num_rows:
                # wd hashes came from the check pass over these same bytes —
                # a re-read that finds NO candidate rows is evidence of
                # inconsistency, never a valid empty result
                raise RuntimeError(
                    "within-dup sidecar re-read found no candidate rows for "
                    f"{len(wd)} duplicated hashes — refusing inconsistent "
                    "uniqueness evidence"
                )
            wd_gkey = np.array(g["gkey"].to_pylist(), dtype=np.str_)
            wd_count = g["count_all"].to_numpy().astype(np.int64)
            wd_khash = g["khash"].to_numpy().astype(np.int64)
    np.savez(
        os.path.join(out_dir, "khash_partial.npz"),
        uniq=uniq,
        counts=counts.astype(np.int64),
        n_rows=np.int64(n),
        has_sidecar=np.bool_(have_sidecar),
        wd_gkey=wd_gkey,
        wd_count=wd_count,
        wd_khash=wd_khash,
    )


def _sidecar_file_agg(f: str, unique_keys: list[str], cand) -> pa.Table | None:
    """Per-file piece of _aggregate_candidate_keys: rows whose key hash is
    in sorted `cand` → (gkey, khash) table; key_enc is built only for
    surviving rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.row_checks import key_encode_array
    from fdpg_query_data_validation_ray.stages.unique import key_hash

    tbl = pq.read_table(f, columns=unique_keys)
    if not tbl.num_rows:
        return None
    kh = key_hash(tbl, unique_keys).view(np.int64)
    ix = np.searchsorted(cand, kh)
    ix[ix == len(cand)] = 0
    mask = cand[ix] == kh
    if not mask.any():
        return None
    part = tbl.filter(pa.array(mask))
    return pa.table(
        {
            "gkey": pc.cast(
                key_encode_array(part, tuple(unique_keys)), pa.string()
            ),
            "khash": pa.array(kh[mask]),
        }
    )


def _aggregate_candidate_keys(
    files: list[str], unique_keys: list[str], cand: "np.ndarray"
) -> pa.Table | None:
    """Exact (gkey, count_all, khash) aggregates for rows whose key hash is
    in sorted `cand`, from a pruned read of the given input files."""
    from concurrent.futures import ThreadPoolExecutor

    # this runs inside one partition's launcher, usually at the very END of
    # the job (the defect-heavy partition finishes last) — dispatch per-file
    # work to the cluster when it is up (cand broadcast once), else a small
    # thread pool (parquet decode releases the GIL)
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(files) > 1
    except Exception:
        pass
    if use_ray:
        uk = list(unique_keys)
        task = ray.remote(num_cpus=1)(_sidecar_file_agg)
        cref = ray.put(cand)
        parts = [
            p
            for p in ray.get([task.remote(f, uk, cref) for f in files])
            if p is not None
        ]
    else:
        with ThreadPoolExecutor(max_workers=min(4, len(files))) as pool:
            parts = [
                p
                for p in pool.map(
                    lambda f: _sidecar_file_agg(f, unique_keys, cand), files
                )
                if p is not None
            ]
    if not parts:
        return None
    allt = pa.concat_tables(parts).combine_chunks()
    g = allt.group_by(["gkey"]).aggregate([([], "count_all"), ("khash", "max")])
    return g.select(["gkey", "count_all", "khash_max"]).rename_columns(
        ["gkey", "count_all", "khash"]
    )


def _keyhash_partial_mode(files: list[str], mode: str | None = None) -> bool:
    """True → this partition persists only the compact khash partial (no
    per-row keyhash parquet). Auto mode keeps the per-partition driver cost
    bounded: the partial is O(distinct keys) × 16 B at the driver, so it is
    used only when the partition's row count (exact, from parquet footers)
    fits a quarter of the global sieve budget — beyond that the per-row
    artifact is written and the distributed shuffle verify consumes it."""
    # mode is resolved by the DRIVER (run_validation) and passed through:
    # task-dispatched partitions run in workers whose env snapshot predates
    # the caller's — a worker-side env read would silently ignore the flag
    if mode is None:
        mode = os.environ.get("QDV_KEYHASH_MODE", "auto")
    if mode == "artifact":
        return False
    if mode == "partial":
        return True
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.unique import SIEVE_MAX_DRIVER_ROWS

    try:
        est = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return False
    return est <= SIEVE_MAX_DRIVER_ROWS // 4


REPORT_VIOLATION_COLUMNS = ["rule_id", "severity", "location", "diagnostics", "row_key"]


def _violation_dedup_partial(combined_dir: str) -> list[dict]:
    """Task helper: one partition's violations pre-deduped to IssueSet
    partials (counts + sorted first-K samples — exactly mergeable). Kicked
    off the moment the partition commits so the report build finds its
    inputs ready."""
    from fdpg_query_data_validation_ray.pipelines.report import dedup_issues

    t = _scan_union(combined_dir, "violation", REPORT_VIOLATION_COLUMNS)
    return dedup_issues(t.to_pylist())


def _khash_within_dups(partial):
    """Task helper: hashes duplicated WITHIN one partition's partial.
    Returns None when the partition has no usable partial (caller must fall
    back to the full merge path for correctness)."""
    if partial is None:
        return None
    u, c = partial[0], partial[1]
    return u[c > 1]


def _khash_pair_intersect(p1, p2):
    """Task helper: hashes present in BOTH partitions' sorted partials —
    cross-partition duplicate candidates, one pair at a time (each pair is a
    single vectorized searchsorted; submitted incrementally as partitions
    commit, so almost all pairs are done before the global phase starts)."""
    import numpy as np

    if p1 is None or p2 is None:
        return np.array([], np.int64)
    a, b = p1[0], p2[0]
    if len(a) == 0 or len(b) == 0:
        return np.array([], np.int64)
    if len(b) < len(a):
        a, b = b, a
    ix = np.searchsorted(b, a)
    ix[ix == len(b)] = len(b) - 1
    return a[b[ix] == a]


def _khash_tree_leaf(partial):
    """Tree-sieve leaf: (sorted unique hashes, empty candidate set), or None
    when the partition has no usable partial (poisons the tree → the global
    phase falls back to the general merge)."""
    import numpy as np

    if partial is None:
        return None
    return partial[0], np.array([], np.int64)


def _khash_tree_merge(n1, n2):
    """Tree-sieve internal node: merge two (uniq, cand) nodes. uniq arrays
    are sorted-unique per node, so cross-partition duplicate candidates are
    exactly the adjacent-equal values of the merged sort (np.sort value sort
    — the argsort/np.unique gather path is ~20x slower at these sizes).
    O(total·log P) work across the tree, but each merge is its own Ray task
    chained on its inputs, so the tree builds INCREMENTALLY as partitions
    commit — the root is one small task by the time the global phase runs.
    Replaces the O(P²) pairwise sieve beyond QDV_PAIRWISE_MAX_PARTS."""
    import numpy as np

    if n1 is None or n2 is None:
        return None
    u1, c1 = n1
    u2, c2 = n2
    s = np.sort(np.concatenate([u1, u2]))
    dup = s[:-1][s[1:] == s[:-1]] if len(s) > 1 else s[:0]
    cand = np.sort(np.concatenate([c1, c2, dup]))
    if len(cand) > 1:
        keep = np.ones(len(cand), bool)
        keep[1:] = cand[1:] != cand[:-1]
        cand = cand[keep]
    if len(s) > 1:
        keep = np.ones(len(s), bool)
        keep[1:] = s[1:] != s[:-1]
        s = s[keep]
    return s, cand


def _khash_tree_root(*nodes):
    """Fold the binary counter's remaining ≤log₂(P) nodes and return ONLY
    the cross-partition candidate array (result-bound — the big unions never
    reach the driver). None when any subtree was poisoned."""
    import numpy as np

    acc = None
    for nd in nodes:
        if nd is None:
            return None
        acc = nd if acc is None else _khash_tree_merge(acc, nd)
        if acc is None:
            return None
    return acc[1] if acc is not None else np.array([], np.int64)


def _khash_shares(partial, cand):
    """Task helper: does this partition's partial intersect the candidate
    set? (pass-B pruning without shipping the full partial to the driver)"""
    import numpy as np

    if partial is None:
        return True
    u = partial[0]
    if len(u) == 0 or len(cand) == 0:
        return False
    ix = np.searchsorted(cand, u)
    ix[ix == len(cand)] = len(cand) - 1
    return bool(np.any(cand[ix] == u))


def _load_khash_partial(pdir: str):
    """Return (uniq, counts, sidecar) from a partition's cached sieve
    partial, or None when absent/inconsistent (reader falls back to scanning
    the artifact). sidecar = (gkey strings, counts, khashes) of rows whose
    hash duplicates WITHIN this partition — already exactly resolved — or
    None when the partial predates sidecars."""
    import numpy as np

    p = os.path.join(pdir, "khash_partial.npz")
    if not os.path.exists(p):
        return None
    try:
        z = np.load(p)
        uniq, counts = z["uniq"], z["counts"]
        if int(counts.sum()) != int(z["n_rows"]):
            return None
        sidecar = None
        if "has_sidecar" in z.files and bool(z["has_sidecar"]):
            sidecar = (z["wd_gkey"], z["wd_count"], z["wd_khash"])
        return uniq, counts, sidecar
    except Exception:
        return None


def _khash_sidecar(partial):
    """Task helper: extract the (small) within-dup sidecar without shipping
    the full hash arrays to the driver. None → caller must keep the full
    candidate set for pass B."""
    if partial is None or len(partial) < 3:
        return None
    return partial[2]


def _uniqueness_from_artifacts(
    manifest: RunManifest,
    unique_keys: list[str],
    preloaded: dict[str, object] | None = None,
    within_refs: dict[str, object] | None = None,
    pair_refs: list | None = None,
    tree_refs: list | None = None,
) -> list[dict]:
    """Cross-partition uniqueness from the persisted per-row
    (row_key, key_enc, khash) records — the input is never re-scanned (the
    check pass already hashed every row while it was hot). Candidate sieve +
    exact verify on the unambiguous key_enc encoding; strategy auto-selects
    (stages/unique.py split) on the total artifact row count:

    - driver sieve (within QDV_SIEVE_MAX_DRIVER_ROWS): np.unique over the
      int64 hashes (8 B/row at the driver), then a pruned candidate re-scan;
    - distributed (beyond the driver budget, or QDV_SIEVE_MODE=shuffle): the
      partition artifacts are read as a Ray Dataset (they are already
      partition-split parquet) and both the candidate sieve and the exact
      verify run as salted partial-aggregate + groupby shuffles — nothing
      O(rows) reaches the driver.

    64-bit collisions between distinct keys drop out at the exact verify in
    both strategies."""
    import numpy as np

    total_rows = 0
    for pid in manifest.completed_partitions():
        try:
            total_rows += int(manifest.load_verdict(pid).get("rows_checked", 0))
        except (OSError, json.JSONDecodeError, ValueError, TypeError):
            pass
    env_mode = os.environ.get("QDV_SIEVE_MODE")
    from fdpg_query_data_validation_ray.stages.unique import SIEVE_MAX_DRIVER_ROWS

    if env_mode in ("sieve", "shuffle"):
        mode = env_mode
    else:
        mode = "sieve" if total_rows <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
    if mode == "shuffle":
        return _uniqueness_from_artifacts_distributed(manifest, unique_keys)

    # pass A: merge per-partition sieve partials (sorted unique hashes +
    # counts, cached at commit time INSIDE the parallel partition phase —
    # this pass used to re-decode every keyhash file serially after the last
    # partition finished, pure Amdahl tail at high CPU counts). Partitions
    # without a consistent cached partial (legacy artifacts) are scanned on
    # the spot by a thread pool (parquet decode releases the GIL).
    _tt = time.monotonic()

    def _umark(label: str) -> None:
        nonlocal _tt
        now = time.monotonic()
        if os.environ.get("QDV_TIMING"):
            import sys as _sys

            print(f"[qdv-timing] uniq.{label}: {now - _tt:.3f}s", file=_sys.stderr)
        _tt = now

    part_uniq: dict[str, np.ndarray] = {}
    partials: list[tuple[np.ndarray, np.ndarray]] = []
    fallback_pids: list[str] = []
    completed = manifest.completed_partitions()
    preloaded = preloaded or {}
    within_refs = within_refs or {}
    # FAST PATH — incremental pairwise sieve: when the run submitted
    # within-dup and pair-intersect tasks as partitions committed, the
    # candidate set is (almost) already computed; nothing O(rows) ever
    # reaches the driver and the 12M-hash sort-merge disappears from the
    # critical path. Falls through to the general merge on any gap (missing
    # refs, a partition without a usable partial, >cap partition counts).
    if (pair_refs is not None or tree_refs) and within_refs and all(
        pid in within_refs and pid in preloaded for pid in completed
    ):
        try:
            import ray as _ray

            within = _ray.get([within_refs[pid] for pid in completed])
            if all(w is not None for w in within):
                if pair_refs is not None:
                    pair_vals = [p for p in _ray.get(list(pair_refs)) if len(p)]
                    cross = (
                        np.unique(np.concatenate(pair_vals))
                        if pair_vals
                        else np.array([], np.int64)
                    )
                else:
                    # tree sieve (beyond the pairwise partition cap): one
                    # root task folds the counter's remaining nodes; only
                    # the candidate array crosses to the driver
                    root = _ray.remote(num_cpus=1)(_khash_tree_root)
                    cross = _ray.get(root.remote(*tree_refs))
                    if cross is None:  # poisoned leaf → general merge
                        raise ValueError("tree sieve gap")
                within_pieces = [w for w in within if len(w)]
                within_all = (
                    np.unique(np.concatenate(within_pieces))
                    if within_pieces
                    else np.array([], np.int64)
                )
                cand = np.union1d(within_all, cross)
                _umark("passA.pairwise")
                if len(cand) == 0:
                    return []
                # within-partition duplicate groups were exactly resolved at
                # commit time (sidecars); pass B then only re-reads
                # partitions holding a genuinely CROSS-partition candidate.
                # Any partition without a sidecar → full candidate set.
                sidecar_task = _ray.remote(num_cpus=0.25)(_khash_sidecar)
                sidecars = _ray.get(
                    [sidecar_task.remote(preloaded[pid]) for pid in completed]
                )
                g_parts: list[pa.Table] = []
                passb_cand = cand
                if all(s is not None for s in sidecars):
                    passb_cand = cross
                    for gkeys, cnts, khs in sidecars:
                        if len(gkeys) == 0:
                            continue
                        khs = np.asarray(khs, np.int64)
                        if len(cross):
                            ix = np.searchsorted(cross, khs)
                            ix[ix == len(cross)] = len(cross) - 1
                            keep = cross[ix] != khs
                        else:
                            keep = np.ones(len(khs), bool)
                        keep &= np.asarray(cnts, np.int64) > 1
                        if not keep.any():
                            continue
                        g_parts.append(
                            pa.table(
                                {
                                    "gkey": pa.array(
                                        [str(x) for x in np.asarray(gkeys)[keep]],
                                        pa.string(),
                                    ),
                                    "count_all": pa.array(
                                        np.asarray(cnts, np.int64)[keep]
                                    ),
                                    "genc": pa.array(
                                        np.ones(int(keep.sum()), np.int8)
                                    ),
                                }
                            )
                        )
                if len(passb_cand):
                    shares_task = _ray.remote(num_cpus=0.25)(_khash_shares)
                    hits = _ray.get(
                        [
                            shares_task.remote(preloaded[pid], passb_cand)
                            for pid in completed
                        ]
                    )
                    passb_pids = [pid for pid, h in zip(completed, hits) if h]
                    _umark("passA.prune")
                    g_pb = _uniqueness_passb_agg(
                        manifest, unique_keys, passb_cand, passb_pids, _umark
                    )
                    if g_pb is not None and g_pb.num_rows:
                        g_parts.append(g_pb)
                if not g_parts:
                    return []
                g_all = pa.concat_tables(g_parts).combine_chunks()
                rows = _uniqueness_violation_rows(g_all, unique_keys)
                _umark(f"passB.rows({len(rows)} groups)")
                return rows
        except Exception:
            pass

    # npz decompress+copy is ~150 ms per 1.5M-key partial — loads were
    # kicked off the moment each partition committed (preloaded refs), any
    # stragglers parallelize across the cluster now (driver fallback
    # otherwise)
    loaded: list = []
    todo_pids = [pid for pid in completed if pid not in preloaded]
    fetched: dict[str, object] = {}
    try:
        import ray as _ray

        if _ray.is_initialized():
            if todo_pids:
                task = _ray.remote(num_cpus=1)(_load_khash_partial)
                got = _ray.get(
                    [task.remote(manifest.partition_dir(pid)) for pid in todo_pids]
                )
                fetched.update(dict(zip(todo_pids, got)))
            if preloaded:
                keys = [pid for pid in completed if pid in preloaded]
                got = _ray.get([preloaded[pid] for pid in keys])
                fetched.update(dict(zip(keys, got)))
            loaded = [fetched[pid] for pid in completed]
    except Exception:
        loaded = []
    if not loaded:
        loaded = [
            _load_khash_partial(manifest.partition_dir(pid)) for pid in completed
        ]
    for pid, got in zip(completed, loaded):
        if got is None:
            fallback_pids.append(pid)
        else:
            partials.append(got)
            part_uniq[pid] = got[0]
    if fallback_pids:
        chunks = [
            c
            for c in _keyhash_scan_threaded(
                manifest,
                ["khash"],
                lambda t: t["khash"].to_numpy(),
                pids=fallback_pids,
                unique_keys=unique_keys,
            )
            if len(c)
        ]
        if chunks:
            u_fb, c_fb = np.unique(np.concatenate(chunks), return_counts=True)
            partials.append((u_fb, c_fb, None))
    _umark("passA.load")
    if not partials:
        return []
    # candidate set only — pass B recounts candidates exactly from the
    # artifact rows, so the merge needs no count arithmetic: a hash is a
    # candidate iff duplicated WITHIN one partial (count>1) or present in
    # ≥2 partials (adjacent equal after a value sort — np.sort on int64 is
    # ~20x cheaper than the argsort/np.unique gather path at these sizes)
    cand_within = [p[0][p[1] > 1] for p in partials]
    s = np.sort(np.concatenate([p[0] for p in partials]))
    cand_cross = s[:-1][s[1:] == s[:-1]] if len(s) > 1 else s[:0]
    cand = np.unique(np.concatenate(cand_within + [cand_cross]))
    _umark("passA.merge")
    if len(cand) == 0:
        return []

    def _shares_hash(sorted_uniq: np.ndarray) -> bool:
        ix = np.searchsorted(cand, sorted_uniq)
        ix[ix == len(cand)] = len(cand) - 1
        return bool(np.any(cand[ix] == sorted_uniq))

    # pass B only needs partitions that can actually hold a candidate key:
    # ones whose partial intersects the candidate set, plus every partition
    # we could not prove anything about
    passb_pids = fallback_pids + [
        pid for pid, u in part_uniq.items() if _shares_hash(u)
    ]

    return _uniqueness_exact_verify(manifest, unique_keys, cand, passb_pids, _umark)


def _uniqueness_exact_verify(
    manifest: RunManifest,
    unique_keys: list[str],
    cand: "np.ndarray",
    passb_pids: list[str],
    _umark,
) -> list[dict]:
    g = _uniqueness_passb_agg(manifest, unique_keys, cand, passb_pids, _umark)
    if g is None or not g.num_rows:
        return []
    rows = _uniqueness_violation_rows(g, unique_keys)
    _umark(f"passB.rows({len(rows)} groups)")
    return rows


def _uniqueness_passb_agg(
    manifest: RunManifest,
    unique_keys: list[str],
    cand: "np.ndarray",
    passb_pids: list[str],
    _umark,
):
    """Pass B: re-scan ONLY the candidate partitions, keep only candidate
    rows' key strings, per-file exact grouping partials → tiny driver
    merge. 64-bit collisions between distinct keys drop out here. Returns a
    (gkey, count_all, genc) table of groups with count > 1, or None."""
    import numpy as np

    def pick(t: pa.Table):
        if not t.num_rows:
            return None
        kh = t["khash"].to_numpy()
        ix = np.searchsorted(cand, kh)
        ix[ix == len(cand)] = 0
        part = t.filter(pa.array(cand[ix] == kh))
        if not part.num_rows:
            return None
        if "key_enc" not in part.column_names and "row_key" not in part.column_names:
            # input re-read path defers encoding: build key_enc for only the
            # surviving candidate rows
            from fdpg_query_data_validation_ray.stages.row_checks import (
                key_encode_array,
            )

            part = pa.table(
                {
                    "key_enc": pc.cast(
                        key_encode_array(part, tuple(unique_keys)), pa.string()
                    ),
                    "khash": part["khash"],
                }
            )
        gk = _grouping_key(part)
        return gk.group_by(["gkey"]).aggregate([([], "count_all"), ("genc", "max")])

    picked_parts = [
        p
        for p in _keyhash_scan_threaded(
            manifest, ["key_enc", "khash"], pick, pids=passb_pids,
            unique_keys=unique_keys,
        )
        if p is not None
    ]
    _umark(f"passB.scan({len(passb_pids)} pids)")
    if not picked_parts:
        return None
    picked = pa.concat_tables(picked_parts).combine_chunks()
    g = picked.group_by(["gkey"]).aggregate(
        [("count_all", "sum"), ("genc_max", "max")]
    )
    return g.filter(pc.greater(g["count_all_sum"], 1)).rename_columns(
        ["gkey", "count_all", "genc"]
    )


def _keyhash_scan_threaded(
    manifest: RunManifest,
    columns: list[str],
    transform,
    pids: list[str] | None = None,
    unique_keys: list[str] | None = None,
):
    """Thread-pool scan of keyhash records: one task per compact
    `keyhash/*.parquet` file (this version's layout); partitions that carry
    only the khash sieve partial re-derive the records from a column-pruned
    read of their INPUT files (stamp-checked against the verdict lineage —
    the verify must refuse bytes that differ from what the check pass saw);
    one task per legacy partition's union dir (filtered; key_enc padded null
    when the old schema predates it). `transform(table) -> Any` runs inside
    the worker thread. `pids` restricts the scan (default: all completed)."""
    import glob
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    work: list[tuple[str, object]] = []
    for pid in (pids if pids is not None else manifest.completed_partitions()):
        pdir = manifest.partition_dir(pid)
        kf = sorted(
            glob.glob(os.path.join(glob.escape(os.path.join(pdir, "keyhash")), "*.parquet"))
        )
        if kf:
            work.extend(("compact", f) for f in kf)
        elif (
            unique_keys
            and os.path.exists(os.path.join(pdir, "khash_partial.npz"))
        ):
            lin = manifest.load_verdict(pid).get("lineage", {})
            st = lin.get("file_stamps") or {}
            for f in lin.get("input_files", []):
                work.append(("input", (f, st.get(f))))
        elif os.path.isdir(os.path.join(pdir, "combined")):
            work.append(("legacy", os.path.join(pdir, "combined")))
    if not work:
        return []

    def one(item, tf):
        kind, p = item
        if kind == "compact":
            t = pq.read_table(p, columns=columns)
        elif kind == "input":
            f, stamp = p
            if stamp is not None:
                cur = list(_file_stamps([f])[f])
                if cur != list(stamp):
                    raise RuntimeError(
                        f"input file changed since its partition was checked; "
                        f"uniqueness cannot be verified from a re-read: {f}"
                    )
            from fdpg_query_data_validation_ray.stages.unique import key_hash

            tbl = pq.read_table(f, columns=list(unique_keys))
            kh = pa.array(key_hash(tbl, list(unique_keys)).view(np.int64))
            if columns == ["khash"]:
                t = pa.table({"khash": kh})
            else:
                # key_enc is DEFERRED: the consumer filters by khash first
                # and encodes only the few surviving candidate rows — the
                # length-prefixed string build over every row was the bulk
                # of the re-read cost
                t = tbl.append_column("khash", kh)
        else:
            # legacy union artifacts: also read row_key so _grouping_key can
            # fall back when key_enc is null/absent (round-1 schema)
            want = (
                ["khash"]
                if columns == ["khash"]
                else ["row_key", "key_enc", "khash"]
            )
            try:
                t = _scan_union(p, "keyhash", want)
            except (KeyError, pa.lib.ArrowInvalid):
                t = _scan_union(
                    p, "keyhash", [c for c in want if c != "key_enc"]
                )
        return tf(t)

    # dispatch as Ray tasks when a cluster is up (parquet decode + key
    # re-derivation use every core instead of ≤16 GIL-sharing driver
    # threads; artifacts and inputs live on storage every node can read —
    # the same assumption checkpoint resume already makes). Driver threads
    # remain the fallback for pre-init callers. The transform closure can be
    # fat (pass B's `pick` carries the full candidate array) — ship it to
    # the object store ONCE and deref per task, never pickle per item.
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(work) > 1
    except Exception:
        pass
    if use_ray:
        task = ray.remote(num_cpus=1)(one)
        tref = ray.put(transform)
        return ray.get([task.remote(item, tref) for item in work])
    with ThreadPoolExecutor(max_workers=min(16, len(work))) as pool:
        return list(pool.map(lambda item: one(item, transform), work))


def _keyhash_dataset(
    manifest: RunManifest, columns: list[str], unique_keys: list[str] | None = None
):
    """Ray Dataset over every committed partition's keyhash records,
    projected to `columns` (subset of row_key / key_enc / khash).

    Partitions written by this version carry either a compact 3-column
    `keyhash/*.parquet` (fast: no union padding, no digest-row decode) or
    only the khash sieve partial — the latter re-derive their records from a
    column-pruned read of their INPUT files (stamp-checked); legacy
    partitions fall back to filtering the tagged union (key_enc synthesized
    as null when the old schema predates it). Returns None when no partition
    has keyhash records."""
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    compact_files, union_files, input_files = [], [], []
    for pid in manifest.completed_partitions():
        pdir = manifest.partition_dir(pid)
        kd = os.path.join(pdir, "keyhash")
        kf = sorted(glob.glob(os.path.join(glob.escape(kd), "*.parquet")))
        if kf:
            compact_files.extend(kf)
            continue
        if unique_keys and os.path.exists(os.path.join(pdir, "khash_partial.npz")):
            lin = manifest.load_verdict(pid).get("lineage", {})
            st = lin.get("file_stamps") or {}
            for f in lin.get("input_files", []):
                if f in st and list(_file_stamps([f])[f]) != list(st[f]):
                    raise RuntimeError(
                        "input file changed since its partition was checked; "
                        f"uniqueness cannot be verified from a re-read: {f}"
                    )
                input_files.append(f)
            continue
        d = os.path.join(pdir, "combined")
        if not os.path.isdir(d):
            continue
        for f in sorted(glob.glob(os.path.join(glob.escape(d), "*.parquet"))):
            if "record_type" in pq.read_schema(f).names:
                union_files.append(f)
    parts = []
    if input_files:
        uk = list(unique_keys)

        def rederive(t: pa.Table) -> pa.Table:
            rec = _keyrec_table(t, uk).select(columns)
            if "key_enc" in columns:
                rec = rec.append_column(
                    "genc", pa.array(np.ones(rec.num_rows, dtype=np.int8))
                )
            return rec

        parts.append(
            rd.read_parquet(input_files, columns=uk).map_batches(
                rederive, batch_format="pyarrow"
            )
        )
    if compact_files:
        compact = rd.read_parquet(compact_files, columns=columns)
        if "key_enc" in columns:
            # align with the legacy part's provenance column: compact
            # artifacts always carry a real key_enc
            compact = compact.map_batches(
                lambda t: t.append_column(
                    "genc", pa.array(np.ones(t.num_rows, dtype=np.int8))
                ),
                batch_format="pyarrow",
            )
        parts.append(compact)
    if union_files:
        legacy_want = ["row_key", "key_enc", "khash"]
        legacy_cols = [
            c for c in legacy_want if c in pq.read_schema(union_files[0]).names
        ]

        def project(t: pa.Table) -> pa.Table:
            cols = {}
            for c in columns:
                if c == "key_enc":
                    # bake the legacy fallback in: key_enc := coalesce(
                    # key_enc, row_key) so downstream grouping is uniform —
                    # but record PROVENANCE in genc so the display decode
                    # never rewrites a raw row_key that happens to parse as
                    # an encoding
                    enc = (
                        t["key_enc"] if "key_enc" in t.column_names
                        else pa.nulls(t.num_rows, pa.string())
                    )
                    cols[c] = pc.coalesce(enc, t["row_key"])
                    cols["genc"] = pc.cast(pc.is_valid(enc), pa.int8())
                elif c in t.column_names:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, UNION_SCHEMA.field(c).type)
            return pa.table(cols)

        parts.append(
            rd.read_parquet(
                union_files,
                columns=["record_type"] + legacy_cols,
                filter=pads.field("record_type") == "keyhash",
            ).map_batches(project, batch_format="pyarrow")
        )
    if not parts:
        return None
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _uniqueness_from_artifacts_distributed(
    manifest: RunManifest, unique_keys: list[str]
) -> list[dict]:
    """Beyond-driver uniqueness: the per-partition keyhash artifacts become a
    Ray Dataset; candidate sieve and exact verify are both salted
    partial-aggregate + groupby shuffles. Only the (rare) duplicate groups
    materialize at the driver."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Sum

    ds = _keyhash_dataset(manifest, ["key_enc", "khash"], unique_keys)
    if ds is None:
        return []

    def hash_partial(t: pa.Table) -> pa.Table:
        return t.select(["khash"]).group_by(["khash"]).aggregate([([], "count_all")])

    totals = (
        ds.map_batches(hash_partial, batch_format="pyarrow")
        .groupby("khash")
        .aggregate(Sum("count_all", alias_name="n"))
    )
    cand_chunks = [
        b["khash"].to_numpy()
        for b in totals.map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)).select(["khash"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    cand_chunks = [c for c in cand_chunks if len(c)]
    if not cand_chunks:
        return []
    cand = np.sort(np.concatenate(cand_chunks))
    cand_ref = ray.put(cand)

    def pick_keyhash(t: pa.Table) -> pa.Table:
        # task fn: ray.get of the broadcast array is a zero-copy local read
        c = ray.get(cand_ref)
        kh = t["khash"].to_numpy()
        ix = np.searchsorted(c, kh)
        ix[ix == len(c)] = 0
        part = t.filter(pa.array(c[ix] == kh))
        if not part.num_rows:
            return pa.table(
                {"gkey": pa.array([], pa.string()),
                 "count_all": pa.array([], pa.int64()),
                 "genc_max": pa.array([], pa.int8())}
            )
        gk = _grouping_key(part)
        return gk.group_by(["gkey"]).aggregate([([], "count_all"), ("genc", "max")])

    g_ds = (
        ds.map_batches(pick_keyhash, batch_format="pyarrow")
        .groupby("gkey")
        .aggregate(
            Sum("count_all", alias_name="count_all"),
            Max("genc_max", alias_name="genc"),
        )
    )
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in g_ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return []
    g = pa.concat_tables(parts).combine_chunks()
    g = g.filter(pc.greater(g["count_all"], 1))
    if not g.num_rows:
        return []
    return _uniqueness_violation_rows(g, unique_keys)


def finalize_partials(partials: list[ColumnPartial]) -> dict[str, ColumnPartial]:
    """Merge per-batch partials per column in a CONTENT-derived order: the
    KLL merge result depends on merge order, and the natural artifact-scan
    order follows Ray's per-run write UUID file names — sorting by a content
    key removes file naming as a nondeterminism source, so quantiles_approx
    is stable whenever the batch split is too (it remains a rank-error-
    bounded approximation that varies with the split, per the report
    contract; resumes reuse persisted partials and stay byte-identical)."""

    def content_key(p: ColumnPartial):
        return (
            p.column,
            p.n_rows,
            p.n_nulls,
            repr(p.sum_num),
            repr(p.sum_sq),
            repr(p.min_num),
            repr(p.max_num),
            repr(p.min_str),
            repr(p.max_str),
            hashlib.sha256(p.kll.to_bytes() + p.hll.to_bytes()).hexdigest(),
            json.dumps(
                sorted(p.cat_counts.items()) if p.cat_counts is not None else None
            ),
        )

    by_col: dict[str, ColumnPartial] = {}
    for p in sorted(partials, key=content_key):
        if p.column in by_col:
            by_col[p.column].merge(p)
        else:
            by_col[p.column] = p
    return by_col


def _encode_partials(partials: dict[str, ColumnPartial]) -> str:
    import base64

    t = _partials_to_table([partials[k] for k in sorted(partials)])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return base64.b64encode(sink.getvalue().to_pybytes()).decode()


def _decode_partials(s: str) -> list[ColumnPartial]:
    import base64

    buf = base64.b64decode(s)
    with pa.ipc.open_stream(buf) as r:
        t = r.read_all()
    return _partials_from_table(t)


def _merge_all_partials(manifest: RunManifest) -> dict[str, ColumnPartial]:
    """Global stats from persisted per-partition sketches, merged in sorted
    partition order — resume-safe: never re-streams finished partitions and is
    deterministic regardless of which partitions ran in which process."""
    merged: dict[str, ColumnPartial] = {}
    for pid in manifest.completed_partitions():
        v = manifest.load_verdict(pid)
        for p in _decode_partials(v["stats_partials"]):
            if p.column in merged:
                merged[p.column].merge(p)
            else:
                merged[p.column] = p
    return merged


def read_violations(out_dir: str) -> pa.Table:
    """All per-row violations of a run (partition artifacts, pruned scan)."""
    tables = scan_partition_artifacts(
        RunManifest(out_dir), "violation", list(VIOLATION_SCHEMA.names)
    )
    if not tables:
        return VIOLATION_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def read_digests(out_dir: str) -> pa.Table:
    tables = scan_partition_artifacts(
        RunManifest(out_dir), "digest", ["row_key", "content_sha256"]
    )
    return pa.concat_tables(tables) if tables else pa.table({"row_key": [], "content_sha256": []})


def export_violations_ndjson(out_dir: str, dest: str | None = None) -> str:
    """Stream a run's per-row violations out as sharded NDJSON — the
    interchange format downstream issue trackers / spreadsheets ingest
    (reference analog: the raw json report consumed by the LaTeX renderer,
    latex_report/report_visualizer.py). The parquet artifacts stay the
    source of truth; this is a WRITE-SIDE projection: ray.data reads every
    committed partition's combined artifact with column pruning, filters
    the violation records, and write_json streams shards — nothing
    collects at the driver, output is resumable-by-rerun (the export is a
    pure function of committed artifacts)."""
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data as rd

    manifest = RunManifest(out_dir)
    files = []
    for pid in manifest.completed_partitions():
        d = os.path.join(manifest.partition_dir(pid), "combined")
        for f in sorted(_glob.glob(os.path.join(_glob.escape(d), "*.parquet"))):
            if "record_type" in _pq.read_schema(f).names:
                files.append(f)
    dest = dest or os.path.join(out_dir, "violations_ndjson")
    cols = list(VIOLATION_SCHEMA.names)

    def only_violations(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.equal(t["record_type"], "violation")
        return t.filter(m).select(cols)

    if not files:
        os.makedirs(dest, exist_ok=True)
        open(os.path.join(dest, "part-empty.json"), "w").close()
        return dest
    (
        rd.read_parquet(files, columns=["record_type"] + cols)
        .map_batches(only_violations, batch_format="pyarrow")
        .write_json(dest)
    )
    return dest
