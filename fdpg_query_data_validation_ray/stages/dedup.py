"""Deduplication operators for large-scale text corpora.

Beyond the reference's issue-level dedup (IssueSet, extraction/IssueSet.py:9-26)
these are the document-level dedup families a training-data pipeline needs
(exact, MinHash+LSH, SimHash, n-gram Jaccard), built from the published
algorithms (Broder 1997 resemblance/minhash; Leskovec-Rajaraman-Ullman MMDS
ch.3 banding; Charikar 2002 simhash).

Scale shapes:
- exact: content-hash per batch (vectorized) → candidate sieve (the
  stages/unique.py driver/shuffle strategy split) → only rows whose md5 is a
  duplicate CANDIDATE ever enter an exchange; unique-text rows stream
  straight through. Neither the text nor the full hash set shuffles.
- MinHash+LSH: per-batch vectorized shingle→128-perm signature (numpy
  reduceat, no per-row Python loops on the hot path) → explode to
  (band, band_hash, id, sig) rows → groupby((band, band_hash)) → candidate
  pairs verified against the full signature → pair dedup groupby.
- SimHash: 64-bit signature per doc; candidates from 4×16-bit band buckets;
  verify with vectorized Hamming distance.
- n-gram Jaccard: the exact verifier; offered standalone as within-group
  all-pairs for small groups (use after LSH bucketing at scale).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64, md5_column, mix64

_TOKEN_RE = re.compile(r"\S+")


def _multi_bucket_ids_driver(exploded, bucket_column: str) -> np.ndarray:
    """Bucket ids seen >1 times, via driver np.unique over 8 B/row. NOTE the
    driver envelope here is 8 B × bands × rows (the EXPLODED row count — 32×
    the doc count for MinHash, ~770 MB at 3M docs); auto mode switches to the
    shuffle strategy beyond QDV_SIEVE_MAX_DRIVER_ROWS exploded rows."""
    ids = exploded.select_columns([bucket_column])
    chunks = [
        b[bucket_column].to_numpy()
        for b in ids.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not chunks:
        return np.array([], dtype=np.int64)
    uniq, counts = np.unique(np.concatenate(chunks), return_counts=True)
    return uniq[counts > 1]


def _multi_bucket_ids_shuffle(exploded, bucket_column: str) -> np.ndarray:
    """Bucket ids seen >1 times, via salted per-batch pre-aggregate +
    groupby(bucket) — the scale-safe strategy: only the (rare) multi-member
    bucket ids ever reach the driver, never the exploded id stream."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select([bucket_column]).group_by([bucket_column]).aggregate(
            [([], "count_all")]
        )

    totals = (
        exploded.map_batches(partial, batch_format="pyarrow")
        .groupby(bucket_column)
        .aggregate(Sum("count_all", alias_name="n"))
    )
    cand = totals.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select([bucket_column]),
        batch_format="pyarrow",
    )
    chunks = [
        b[bucket_column].to_numpy() for b in cand.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not chunks:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(chunks))


def _sieve_multi_buckets(exploded, bucket_column: str, mode: str = "auto"):
    """Drop rows whose bucket has only one member. LSH explosions are
    overwhelmingly singleton buckets; grouping them costs per-group Python
    overhead for nothing (measured: 252s CPU over 1.6M groups at sf0.1 vs
    ~0 after the sieve). The multi-member bucket-id set (small — real
    collisions only) is broadcast as a sorted array for a binary-search
    membership filter.

    mode auto-selects how the multi-member set is found (stages/unique.py
    strategy split): driver np.unique within the driver budget, salted
    shuffle groupby beyond it — QDV_SIEVE_MODE forces either.

    The explosion is materialized first: the sieve consumes the dataset once
    for bucket ids and the filtered groupby consumes it again — without
    materialization Ray would re-run the signature computation (the dominant
    cost) from scratch on the second pass. Blocks live in the object store
    and spill if needed. Materializing also makes the exploded row count
    exact, so auto mode decides on real numbers."""
    import ray

    from fdpg_query_data_validation_ray.stages.unique import (
        SIEVE_MAX_DRIVER_ROWS,
    )

    exploded = exploded.materialize()
    env = os.environ.get("QDV_SIEVE_MODE")
    if env in ("sieve", "shuffle"):
        mode = env
    if mode == "auto":
        mode = "sieve" if exploded.count() <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
    if mode == "shuffle":
        multi = _multi_bucket_ids_shuffle(exploded, bucket_column)
    else:
        multi = _multi_bucket_ids_driver(exploded, bucket_column)
    if len(multi) == 0:
        return None, 0
    multi_ref = ray.put(multi)

    def keep_multi(batch: pa.Table) -> pa.Table:
        # task fn: ray.get of the broadcast array is a zero-copy local
        # object-store read (no actor-pool startup latency)
        m = ray.get(multi_ref)
        kh = batch[bucket_column].to_numpy()
        ix = np.searchsorted(m, kh)
        ix[ix == len(m)] = 0
        return batch.filter(pa.array(m[ix] == kh))

    return exploded.map_batches(keep_multi, batch_format="pyarrow"), len(multi)


def _verify_parts() -> int:
    """Partition count for the bucket-verify stage: the verify groupby runs
    over COARSE partitions (bucket & mask), not raw buckets — Ray's per-group
    map_groups overhead across hundreds of thousands of tiny LSH buckets
    dominated round 2's verify (measured ~55 s of a 68 s 100k-doc run). Each
    part processes its buckets with one lexsort + slice loop instead.
    Power of two ~8× cluster CPUs; QDV_VERIFY_PARTS pins it (scale it with
    survivor volume on a real cluster)."""
    env = os.environ.get("QDV_VERIFY_PARTS")
    if env:
        return int(env)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    p = 1
    while p < 8 * cpus:
        p <<= 1
    return p


def _with_part(t: pa.Table, n_parts: int) -> pa.Table:
    # two's-complement AND keeps the result in [0, n_parts) for negative
    # int64 buckets too
    part = pc.bit_wise_and(t["bucket"], n_parts - 1)
    return t.append_column("part", pc.cast(part, pa.int32()))


def _iter_bucket_groups(bucket: np.ndarray, ids: np.ndarray):
    """Yield per-bucket row-index arrays (sorted by id, duplicate ids
    dropped, multi-member only) for one part's columns: ONE lexsort for the
    whole part, then plain slice arithmetic per bucket — no per-group Ray
    machinery."""
    order = np.lexsort((ids, bucket))
    b_sorted = bucket[order]
    n = len(order)
    if n == 0:
        return
    starts = np.flatnonzero(np.concatenate([[True], b_sorted[1:] != b_sorted[:-1]]))
    ends = np.append(starts[1:], n)
    for s, e in zip(starts.tolist(), ends.tolist()):
        if e - s < 2:
            continue
        rows = order[s:e]
        gids = ids[rows]
        keep = np.concatenate([[True], gids[1:] != gids[:-1]])
        rows = rows[keep]
        if len(rows) >= 2:
            yield rows


def _attach_payload(bucket_rows, payload_ds, key: str, payload_columns: list[str],
                    payload_schema: pa.Schema, payload_width: int = 256):
    """Attach per-doc payload columns (signatures / vectors) to SIEVED bucket
    rows. The explode stage ships only (band, bucket, id) triples — ~28 B/row
    instead of replicating the payload into every band row (the round-2 LSH
    exchange carried bands× the necessary bytes) — so the payload must be
    re-attached to the small post-sieve survivor set here.

    Within the driver budget (survivor payload rows × width), the survivor id
    set is collected, the payload table pruned to it and broadcast via
    ray.put for a searchsorted+take attach inside tasks: zero additional
    exchange. Beyond it, one native inner hash join ships each surviving
    payload row ONCE — still bands× less than the old explode."""
    import ray

    from fdpg_query_data_validation_ray.stages.unique import SIEVE_MAX_DRIVER_ROWS

    bucket_rows = bucket_rows.materialize()
    n_rows = bucket_rows.count()
    env = os.environ.get("QDV_SIEVE_MODE")
    # budget in BYTES: the sieve budget constant is denominated in 8-B rows,
    # payload rows are payload_width B each
    within = n_rows * payload_width <= SIEVE_MAX_DRIVER_ROWS * 8
    broadcast = within if env is None else env == "sieve"
    if not broadcast:
        from fdpg_query_data_validation_ray.stages.cluster import _join_partitions

        payload_ds = drop_schemaless_empty_blocks(payload_ds, empty_schema=payload_schema)
        return bucket_rows.join(payload_ds, "inner", _join_partitions(), on=(key,))

    ids = np.unique(
        np.concatenate(
            [
                b[key].to_numpy(zero_copy_only=False)
                for b in bucket_rows.select_columns([key]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
        )
    )
    ids_ref = ray.put(ids)

    def prune(t: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        kk = t[key].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(want, kk)
        ix[ix == len(want)] = 0
        return t.filter(pa.array(want[ix] == kk))

    pruned = pa.concat_tables(
        list(payload_ds.map_batches(prune, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ))
    )
    order = pc.sort_indices(pruned[key])
    pruned = pruned.take(order).combine_chunks()
    pruned_ref = ray.put(pruned)

    def attach(batch: pa.Table) -> pa.Table:
        p = ray.get(pruned_ref)
        pkeys = p[key].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(pkeys, batch[key].to_numpy(zero_copy_only=False))
        out = batch
        for c in payload_columns:
            out = out.append_column(c, pc.take(p[c], pa.array(ix)))
        return out

    return bucket_rows.map_batches(attach, batch_format="pyarrow")


def drop_schemaless_empty_blocks(ds, empty_schema: pa.Schema | None = None):
    """Ray 2.49's hash-shuffle aggregate emits SCHEMA-LESS 0-row blocks for
    empty output partitions; a downstream Acero join that receives one fails
    with "No match or multiple matches for key field reference". Strip them
    by object ref (zero-copy — the surviving blocks are not touched).
    Materializes the input (callers sit right before a join, which
    materializes the build side anyway).

    When EVERY block is a schema-less empty, the poison blocks are all there
    is — returning the input unchanged would hand them to the consumer.
    Build a schema-bearing empty dataset instead: from `empty_schema` if the
    caller supplied one, else from the dataset's own recoverable schema."""
    import ray.data as rd
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        ds = ds.materialize()
    refs, dropped = [], 0
    for bundle in ds.iter_internal_ref_bundles():
        for blk, meta in bundle.blocks:
            if meta.num_rows == 0:
                dropped += 1
            else:
                refs.append(blk)
    if not dropped:
        return ds
    if refs:
        return rd.from_arrow_refs(refs)
    schema = empty_schema
    if schema is None:
        try:
            s = ds.schema(fetch_if_missing=True)
            schema = s.base_schema if s is not None else None
        except Exception:
            schema = None
    if schema is None or not isinstance(schema, pa.Schema):
        return ds  # nothing recoverable — degenerate, caller's schema unknown
    return rd.from_arrow(schema.empty_table())


def _empty_pairs(metric: str, dtype: str) -> pd.DataFrame:
    """Typed empty pair frame — keeps the map_groups output schema stable
    across empty and non-empty buckets (Arrow unification)."""
    return pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            metric: pd.Series(dtype=dtype),
        }
    )


def _empty_pairs_arrow(metric: str, ptype: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            metric: pa.array([], ptype),
        }
    )


def _first_per_sorted_id(ids: np.ndarray) -> np.ndarray:
    """Indices selecting the first occurrence of each id, ordered by id —
    the vectorized equivalent of drop_duplicates(id).sort_values(id)."""
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    keep = np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]])
    return order[keep]

# -- exact ------------------------------------------------------------------


def exact_duplicate_groups(ds, text_column: str, id_column: str):
    """Duplicate content groups: (text_md5, keep_id = min id, n_copies > 1).
    The kept representative is the minimum id (deterministic).

    Sieve plan: only rows whose md5-hash is a duplicate CANDIDATE (driver
    np.unique within the budget, salted shuffle groupby beyond —
    stages/unique.py split) enter the final groupby; on a typical corpus
    that is a tiny fraction, so the old full-width groupby over every
    (md5, min-id, count) partial disappears. Exact under 64-bit collisions:
    falsely-flagged groups fall out at the n_copies > 1 filter."""
    import ray
    from ray.data.aggregate import Min, Sum

    from fdpg_query_data_validation_ray.stages.unique import (
        SIEVE_MAX_DRIVER_ROWS,
        candidate_dup_hashes,
        candidate_dup_hashes_shuffle,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_md5": md5_column(batch.column(text_column)),
                id_column: batch.column(id_column).combine_chunks(),
            }
        )

    # two consumers (sieve + pick): materialize the 40 B/row projection so
    # the md5 pass runs once
    proj = ds.map_batches(project, batch_format="pyarrow").materialize()

    env_mode = os.environ.get("QDV_SIEVE_MODE")
    if env_mode in ("sieve", "shuffle"):
        sieve_mode = env_mode
    else:
        sieve_mode = "sieve" if proj.count() <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
    if sieve_mode == "shuffle":
        cand = candidate_dup_hashes_shuffle(proj, ["text_md5"])
    else:
        cand = candidate_dup_hashes(proj, ["text_md5"])
    empty = pa.table(
        {
            "text_md5": pa.array([], pa.string()),
            "keep_id": pa.array([], proj.schema().base_schema.field(id_column).type),
            "n_copies": pa.array([], pa.int64()),
        }
    )
    if not len(cand):
        import ray.data as rd

        return rd.from_arrow(empty)
    cand_ref = ray.put(cand)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        kh = hash64(batch["text_md5"]).view(np.int64)
        ix = np.searchsorted(c, kh)
        ix[ix == len(c)] = 0
        t = batch.filter(pa.array(c[ix] == kh))
        return t.group_by(["text_md5"]).aggregate(
            [(id_column, "min"), ([], "count_all")]
        )

    totals = (
        proj.map_batches(partial, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(
            Min(f"{id_column}_min", alias_name="keep_id"),
            Sum("count_all", alias_name="n_copies"),
        )
    )
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t["n_copies"], 1))
        if t.num_rows
        else empty,
        batch_format="pyarrow",
    )


_NULL_TEXT_MD5 = "__null_text__"  # sentinel: null texts form ONE dedup group
                                  # (matches ROW_NUMBER over a NULL partition)


def exact_dedup(ds, text_column: str, id_column: str, num_partitions: int = 16):
    """Keep exactly one row per distinct text (the min id). Returns the
    deduplicated Dataset (all original columns).

    Sieve-split plan — NO full-width shuffle or join at all:
    - per-batch md5 (null text → sentinel, so null-text rows keep one
      representative) with same-batch (md5, id) dedup;
    - candidate sieve over the md5 column (driver np.unique within the
      budget, salted shuffle groupby beyond it — stages/unique.py split):
      rows whose md5-hash is NOT a candidate are provably unique texts and
      pass straight through as keepers — that is ~all rows on a typical
      corpus, and they never touch an exchange;
    - only the (rare) candidate rows go through a Ray groupby(md5) where one
      representative per md5 survives (min id; full-row double-ingest copies
      of that id collapse to one row in the same step).

    The old plan shuffled EVERY (md5, id) pair into a groupby and then hash-
    joined keepers back against the full dataset (two full-width exchanges,
    7.7 s at sf0.01); this one does zero. Exact under 64-bit sieve
    collisions: a falsely-flagged unique md5 forms its own 1-row group and
    keeps itself."""
    import ray

    from fdpg_query_data_validation_ray.stages.unique import (
        SIEVE_MAX_DRIVER_ROWS,
        candidate_dup_hashes,
        candidate_dup_hashes_shuffle,
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        md5 = pc.fill_null(md5_column(batch.column(text_column)), _NULL_TEXT_MD5)
        t = batch.append_column("__md5", md5)
        # same-batch exact full-row duplicates collapse here
        return _first_per_key(t, ["__md5", id_column])

    # two downstream consumers (sieve + split): materialize so the per-row
    # md5 pass doesn't re-execute (same reasoning as the LSH sieve)
    hashed = ds.map_batches(add_hash, batch_format="pyarrow").materialize()

    env_mode = os.environ.get("QDV_SIEVE_MODE")
    if env_mode in ("sieve", "shuffle"):
        sieve_mode = env_mode
    else:
        sieve_mode = (
            "sieve" if hashed.count() <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
        )
    if sieve_mode == "shuffle":
        cand = candidate_dup_hashes_shuffle(hashed, ["__md5"])
    else:
        cand = candidate_dup_hashes(hashed, ["__md5"])
    if not len(cand):
        return hashed.map_batches(
            lambda t: t.drop_columns(["__md5"]), batch_format="pyarrow"
        )
    cand_ref = ray.put(cand)

    def _hit_mask(batch: pa.Table) -> np.ndarray:
        c = ray.get(cand_ref)
        kh = hash64(batch["__md5"]).view(np.int64)
        ix = np.searchsorted(c, kh)
        ix[ix == len(c)] = 0
        return c[ix] == kh

    def keep_unique(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~_hit_mask(batch))).drop_columns(["__md5"])

    def keep_candidates(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_hit_mask(batch)))

    # winners resolve per COARSE md5-hash partition, not per md5 group: a
    # dense-dup corpus (50% dup rate → 500k groups at 1M rows) would pay Ray's
    # per-group machinery 500k times; one factorize+lexsort per part picks
    # every group's winner (min id, deterministic under shuffle arrival
    # order; duplicate (md5, id) double-ingest copies collapse here too)
    n_parts = _verify_parts()

    def with_part(t: pa.Table) -> pa.Table:
        part = (hash64(t["__md5"]) & np.uint64(n_parts - 1)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def pick_part(part: pa.Table) -> pa.Table:
        import pandas as pd

        part = part.drop_columns(["part"])
        if part.num_rows == 0:
            return part.drop_columns(["__md5"])
        codes, _ = pd.factorize(part["__md5"].to_pandas(), sort=False)
        ids = part[id_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        codes_s = codes[order]
        first = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        return part.take(pa.array(order[first])).drop_columns(["__md5"])

    clean = hashed.map_batches(keep_unique, batch_format="pyarrow")
    winners = (
        hashed.map_batches(keep_candidates, batch_format="pyarrow")
        .map_batches(with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pick_part, batch_format="pyarrow")
    )
    # map_groups emits schema-less empty blocks for empty shuffle partitions;
    # strip them (winners are rare → the materialize is tiny) or a downstream
    # consumer's join/groupby would trip over them
    base = hashed.schema().base_schema
    winners_schema = pa.schema(
        [base.field(n) for n in base.names if n != "__md5"]
    )
    winners = drop_schemaless_empty_blocks(winners, empty_schema=winners_schema)
    return clean.union(winners)


def _first_per_key(t: pa.Table, key_columns: list[str]) -> pa.Table:
    """Vectorized 'first row per key' within one table (stable: lowest index)."""
    if t.num_rows == 0:
        return t
    import pandas as pd  # noqa: F811 — local alias for clarity

    df_keys = t.select(key_columns).to_pandas()
    keep = ~df_keys.duplicated(keep="first")
    if keep.all():
        return t
    return t.filter(pa.array(keep.to_numpy()))


# -- MinHash + LSH ----------------------------------------------------------

N_PERMS = 128
# 32 bands × 4 rows → LSH threshold ≈ (1/32)^(1/4) ≈ 0.42: high recall for
# pairs at jaccard ≥ 0.6 (P(≥1 band) = 1−(1−s⁴)³² ≈ 0.99 at s=0.6); the
# full-signature verification prunes the extra candidates
DEFAULT_BANDS = 32


def _shingle_hashes(texts: list[str | None], n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word-n-gram hashes concatenated + per-doc offsets (len = docs+1).

    Shingle strings are never materialized: tokens are hashed once, then each
    n-gram's hash is a position-weighted mix of its n consecutive token hashes
    (vectorized shifted slices) — same random-hash-per-shingle semantics,
    ~3× less Python string work. Windows never span documents: a doc with
    t tokens contributes max(t − n + 1, 1) window positions of its own."""
    all_tokens: list[str] = []
    tok_offsets = [0]
    for t in texts:
        toks = _TOKEN_RE.findall(t.lower()) if t else []
        all_tokens.extend(toks)
        tok_offsets.append(len(all_tokens))
    tok_offsets = np.asarray(tok_offsets)
    th = hash64(np.array(all_tokens, dtype=object)) if all_tokens else np.empty(0, np.uint64)

    n_docs = len(texts)
    tok_counts = tok_offsets[1:] - tok_offsets[:-1]
    sh_counts = np.maximum(tok_counts - (n - 1), 1)
    offsets = np.concatenate([[0], np.cumsum(sh_counts)])
    out = np.empty(int(sh_counts.sum()), dtype=np.uint64)
    with np.errstate(over="ignore"):
        # global rolling combine over the token stream, then per-doc slices
        if len(th):
            comb = np.zeros(len(th), dtype=np.uint64)
            for j in range(n):
                shifted = np.empty_like(th)
                if j == 0:
                    shifted[:] = th
                else:
                    shifted[: len(th) - j] = th[j:]
                    shifted[len(th) - j :] = 0
                comb ^= mix64(shifted ^ np.uint64((j + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
            comb = mix64(comb)
        for d in range(n_docs):
            t0, t1 = tok_offsets[d], tok_offsets[d + 1]
            o0, o1 = offsets[d], offsets[d + 1]
            cnt = t1 - t0
            if cnt == 0:
                out[o0] = np.uint64(0)  # empty doc: single sentinel shingle
            elif cnt < n:
                # short doc: one shingle over all its tokens (mix them all)
                acc = np.uint64(0)
                for j in range(cnt):
                    acc ^= mix64(
                        th[t0 + j]
                        ^ np.uint64((j + 1) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
                    )
                out[o0] = mix64(np.array([acc], dtype=np.uint64))[0]
            else:
                out[o0:o1] = comb[t0 : t1 - (n - 1)]
    return out, offsets


_PERM_SEEDS = np.arange(1, N_PERMS + 1, dtype=np.uint64) * np.uint64(
    0x9E3779B97F4A7C15
)


def minhash_signatures(texts: list[str | None], shingle_n: int = 3) -> np.ndarray:
    """(docs × N_PERMS) uint64 minhash signature matrix, fully vectorized:
    one hash64 pass over all shingles, then per-permutation mix + reduceat."""
    h, offsets = _shingle_hashes(texts, shingle_n)
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, N_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(h) == 0:
        return sig
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    for i in range(N_PERMS):
        hp = mix64(h ^ _PERM_SEEDS[i])
        mins = np.minimum.reduceat(hp, starts[nonempty])
        sig[nonempty, i] = mins
    return sig


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(docs × bands) uint64: hash of each band's rows (chained mix). Accepts
    any unsigned integer signature matrix (full uint64 or truncated uint16)."""
    docs, perms = sig.shape
    r = perms // bands
    out = np.zeros((docs, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            acc = np.full(docs, np.uint64(b + 1))
            for j in range(r):
                acc = mix64(
                    acc * np.uint64(0x100000001B3) ^ sig[:, b * r + j].astype(np.uint64)
                )
            out[:, b] = acc
    return out


class MinHashSignatureStage:
    """Text batch → compact (doc_id, sig) rows: ONE row per doc, the b-bit
    truncated 128-perm signature as 256 B of binary. Computed once; both the
    band explode and the post-sieve verify read from this table."""

    def __init__(self, text_column: str, id_column: str, shingle_n: int = 3):
        self.text_column = text_column
        self.id_column = id_column
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        sig = minhash_signatures(texts, self.shingle_n)
        # b-bit minwise truncation (Li & König 2010): 16 low bits per perm
        # keep the jaccard estimator within +1/65536 bias at 4× less payload
        sig16 = (sig & np.uint64(0xFFFF)).astype(np.uint16)
        return pa.table(
            {
                "doc_id": batch.column(self.id_column).cast(pa.int64()),
                "sig": pa.array([sig16[i].tobytes() for i in range(len(sig16))],
                                pa.binary()),
            }
        )


class BandExplodeStage:
    """(doc_id, sig) → exploded (band, bucket, doc_id) rows — 28 B/row. The
    signature itself is NOT replicated into the explosion (round 2 shipped
    bands× the payload through the exchange); _attach_payload re-joins it to
    the post-sieve survivors."""

    def __init__(self, bands: int = DEFAULT_BANDS):
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig_col = batch["sig"].combine_chunks()
        n = len(sig_col)
        sig16 = (
            np.frombuffer(b"".join(sig_col.to_pylist()), dtype=np.uint16).reshape(n, N_PERMS)
            if n
            else np.empty((0, N_PERMS), np.uint16)
        )
        bh = _band_hashes(sig16, self.bands)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands_col = np.repeat(np.arange(self.bands, dtype=np.uint64), n)
        with np.errstate(over="ignore"):
            bucket = mix64(bh.T.reshape(-1) ^ (bands_col + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table(
            {
                "band": pa.array(bands_col.astype(np.int32)),
                "bucket": pa.array(bucket.view(np.int64)),
                "doc_id": pa.array(np.tile(ids, self.bands)),
            }
        )


def minhash_near_duplicates(
    ds,
    text_column: str,
    id_column: str,
    threshold: float = 0.7,
    shingle_n: int = 3,
    bands: int = DEFAULT_BANDS,
    concurrency=(1, 4),
):
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    signature → band explode → groupby((band, band_hash)) → within-bucket
    candidate pairs verified on the FULL 128-perm signature.

    Canonical-band emission: a pair is emitted ONLY by the first band in which
    it collides — later bands suppress it by re-deriving the earlier band
    hashes from the signatures already in the bucket. This (a) makes the pair
    set exactly unique with NO pair-level dedup shuffle, and (b) skips the
    expensive full-signature verify for a hot near-identical clique in all but
    one band (~bands× less quadratic work on skewed corpora).
    """
    # task-based: the stage instance is a few ints/strings, so plain tasks
    # avoid actor-pool startup latency (the old pool cost ~1.5s per query).
    # Signatures land in a compact 1-row-per-doc table (the dominant compute,
    # materialized once); the explosion ships bare (band, bucket, id) triples.
    sig_schema = pa.schema([("doc_id", pa.int64()), ("sig", pa.binary())])
    sigs = ds.map_batches(
        MinHashSignatureStage(
            text_column=text_column, id_column=id_column, shingle_n=shingle_n
        ),
        batch_format="pyarrow",
        # coalesce small reader blocks: the per-batch shingle+perm kernel has
        # fixed setup cost that tiny batches multiply
        batch_size=1024,
    ).materialize()
    exploded = sigs.map_batches(BandExplodeStage(bands=bands), batch_format="pyarrow")

    def part_pairs(part: pa.Table) -> pa.Table:
        # one part = many buckets: decode sigs + band hashes ONCE for the
        # whole part (vectorized), then a slice loop over bucket boundaries
        n = part.num_rows
        if n == 0:
            return _empty_pairs_arrow("est_jaccard", pa.float64())
        ids_all = part["doc_id"].to_numpy()
        bucket = part["bucket"].to_numpy()
        band_all = part["band"].to_numpy()
        sig_col = part["sig"].combine_chunks()
        raw = np.frombuffer(b"".join(sig_col.to_pylist()), dtype=np.uint16).reshape(
            n, N_PERMS
        )
        bh_all = _band_hashes(raw, bands)
        out_a, out_b, out_e = [], [], []
        for rows in _iter_bucket_groups(bucket, ids_all):
            band = int(band_all[rows[0]])
            ia, ib = np.triu_indices(len(rows), k=1)
            if band > 0:
                bh = bh_all[rows][:, :band]
                fresh = ~(bh[ia] == bh[ib]).any(axis=1)
                ia, ib = ia[fresh], ib[fresh]
            if not len(ia):
                continue
            sg = raw[rows]
            est = (sg[ia] == sg[ib]).mean(axis=1)
            keep = est >= threshold
            if keep.any():
                ids = ids_all[rows]
                out_a.append(ids[ia[keep]])
                out_b.append(ids[ib[keep]])
                out_e.append(est[keep])
        if not out_a:
            return _empty_pairs_arrow("est_jaccard", pa.float64())
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "est_jaccard": pa.array(np.concatenate(out_e).astype(np.float64)),
            }
        )

    sieved, n_multi = _sieve_multi_buckets(exploded, "bucket")
    if sieved is None:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_arrow("est_jaccard", pa.float64()))
    sieved = _attach_payload(
        sieved, sigs, key="doc_id", payload_columns=["sig"],
        payload_schema=sig_schema, payload_width=2 * N_PERMS + 8,
    )
    n_parts = _verify_parts()
    return (
        sieved.map_batches(lambda t: _with_part(t, n_parts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )


# -- SimHash ----------------------------------------------------------------


def simhash_signatures(texts: list[str | None]) -> np.ndarray:
    """64-bit simhash per doc (Charikar 2002): sum ±1 per bit over token
    hashes, sign → bit. Vectorized via reduceat over the token stream."""
    all_tokens: list[str] = []
    offsets = [0]
    for t in texts:
        toks = _TOKEN_RE.findall(t.lower()) if t else []
        all_tokens.extend(toks)
        offsets.append(len(all_tokens))
    offsets = np.asarray(offsets)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if not all_tokens:
        return out
    h = hash64(np.array(all_tokens, dtype=object))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int32
    ) * 2 - 1  # tokens × 64 in {-1, +1}
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    sums = np.add.reduceat(bits, starts[nonempty], axis=0)
    sig_bits = (sums > 0).astype(np.uint64)
    packed = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    for b in range(64):
        packed |= sig_bits[:, b] << np.uint64(b)
    out[nonempty] = packed
    return out


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(-1, 8)
    return _POPCOUNT_TABLE[x].sum(axis=1).astype(np.int32)


class SimHashSignatureStage:
    """Text batch → compact (doc_id, simhash) rows: ONE row per doc. The
    explode ships bare band triples; _attach_payload re-joins the signature
    to post-sieve survivors (same payload-free discipline as minhash)."""

    def __init__(self, text_column: str, id_column: str):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        sig = simhash_signatures(texts)
        return pa.table(
            {
                "doc_id": batch.column(self.id_column).cast(pa.int64()),
                "simhash": pa.array(sig.view(np.int64)),
            }
        )


class SimHashBandExplodeStage:
    """(doc_id, simhash) → exploded (band, bucket, doc_id) rows — the 8-byte
    simhash is NOT replicated into the 4 band rows. 4 bands × 16 bits:
    ≤3-bit-distant signatures always share ≥1 band (pigeonhole)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands_col = np.repeat(np.arange(4, dtype=np.uint64), n)
        shifts = np.repeat(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        vals = (np.tile(sig, 4) >> shifts) & np.uint64(0xFFFF)
        with np.errstate(over="ignore"):
            bucket = mix64(vals ^ (bands_col + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table(
            {
                "band": pa.array(bands_col.astype(np.int32)),
                "bucket": pa.array(bucket.view(np.int64)),
                "doc_id": pa.array(np.tile(ids, 4)),
            }
        )


def simhash_near_duplicates(
    ds, text_column: str, id_column: str, max_hamming: int = 3, concurrency=(1, 4)
):
    """Near-duplicate pairs by simhash: bucket on 4×16-bit bands (pigeonhole:
    any pair within Hamming distance 3 collides in ≥1 band), verify exact
    Hamming distance within buckets.

    Canonical-band emission (same trick as minhash_near_duplicates): a pair is
    emitted only by its first colliding band — earlier-band values are
    re-derived from the full simhash carried in the bucket — so the pair set
    is unique with no pair-dedup shuffle and hot cliques cost quadratic verify
    in one band instead of four.

    Payload-free explode (round 4): signatures land in a compact 1-row-per-doc
    table; the explosion ships bare (band, bucket, doc_id) triples and the
    8-byte simhash is re-attached to the post-sieve survivors only."""
    sig_schema = pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())])
    sigs = ds.map_batches(
        SimHashSignatureStage(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        batch_size=1024,
    ).materialize()
    exploded = sigs.map_batches(SimHashBandExplodeStage(), batch_format="pyarrow")

    def part_pairs(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return _empty_pairs_arrow("hamming", pa.int64())
        ids_all = part["doc_id"].to_numpy()
        bucket = part["bucket"].to_numpy()
        band_all = part["band"].to_numpy()
        sig_all = part["simhash"].to_numpy().view(np.uint64)
        out_a, out_b, out_d = [], [], []
        for rows in _iter_bucket_groups(bucket, ids_all):
            band = int(band_all[rows[0]])
            sig = sig_all[rows]
            ia, ib = np.triu_indices(len(rows), k=1)
            if band > 0:
                shifts = (np.arange(band) * 16).astype(np.uint64)
                bands_lo = (sig[:, None] >> shifts) & np.uint64(0xFFFF)
                fresh = ~(bands_lo[ia] == bands_lo[ib]).any(axis=1)
                ia, ib = ia[fresh], ib[fresh]
            if len(ia) == 0:
                continue
            dist = hamming64(sig[ia], sig[ib]).astype(np.int64)
            keep = dist <= max_hamming
            if keep.any():
                ids = ids_all[rows]
                out_a.append(ids[ia[keep]])
                out_b.append(ids[ib[keep]])
                out_d.append(dist[keep])
        if not out_a:
            return _empty_pairs_arrow("hamming", pa.int64())
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "hamming": pa.array(np.concatenate(out_d)),
            }
        )

    sieved, n_multi = _sieve_multi_buckets(exploded, "bucket")
    if sieved is None:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_arrow("hamming", pa.int64()))
    sieved = _attach_payload(
        sieved, sigs, key="doc_id", payload_columns=["simhash"],
        payload_schema=sig_schema, payload_width=16,
    )
    n_parts = _verify_parts()
    return (
        sieved.map_batches(lambda t: _with_part(t, n_parts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )


# -- n-gram Jaccard (exact verifier) ----------------------------------------


def ngram_set(text: str | None, n: int = 3) -> set:
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def ngram_jaccard_pairs(
    ds,
    text_column: str,
    id_column: str,
    group_column: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
):
    """Exact n-gram Jaccard near-dup pairs via within-group all-pairs.
    O(n²) per group — the exact verifier; at scale feed it LSH buckets
    (minhash_near_duplicates) instead of raw groups."""

    def group_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_column)
        ids = g[id_column].to_numpy()
        sets = [ngram_set(t, shingle_n) for t in g[text_column]]
        out = {"id_a": [], "id_b": [], "jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                s = jaccard(sets[i], sets[j])
                if s >= threshold:
                    out["id_a"].append(ids[i])
                    out["id_b"].append(ids[j])
                    out["jaccard"].append(s)
        return pd.DataFrame(out)

    return ds.select_columns([id_column, text_column, group_column]).groupby(
        group_column
    ).map_groups(group_pairs, batch_format="pandas")


# 64 bands × 2 rows for the EXACT-verify path: P(miss) at signature agreement
# s=0.5 is (1−0.25)^64 ≈ 1e−8, effectively zero above it, so the exact
# verifier sees every pair the whole-corpus O(n²) pass would see; the extra
# false-positive candidates r=2 admits are free (the verify is exact).
VERIFY_BANDS = 64


def jaccard_verify_buckets(
    ds,
    text_column: str,
    id_column: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    group_column: str | None = None,
    bands: int = VERIFY_BANDS,
    payload_width: int = 2048,
):
    """Scale path for EXACT n-gram-Jaccard near-dup pairs: the same verifier
    as ngram_jaccard_pairs, but run inside MinHash-LSH buckets instead of
    whole-`group_column` all-pairs groups — no worker ever holds a whole
    language's corpus, and the quadratic work is per-bucket, not per-group.

    Shape (reusing the minhash machinery end to end):
      signatures (1 row/doc, materialized once)
      → BandExplodeStage: bare (band, bucket, doc_id) 28 B rows
      → _sieve_multi_buckets: singleton buckets never reach an exchange
      → _attach_payload: text (+ group) re-attached to the small survivor set
      → coarse-part verify: ONE lexsort per part; per bucket, canonical-band
        suppression (band hashes re-derived from the attached texts, so a
        pair is emitted by exactly one band — no pair-dedup shuffle) then the
        EXACT ngram-set Jaccard with a per-part set cache.

    `group_column` constrains pairs to equal group values (the oracle's
    `ON a.lang = b.lang` join); candidates from cross-group bucket
    collisions are dropped in the verify. Output (id_a, id_b, jaccard) is
    exactly the ≥-threshold subset of the LSH candidates — with the default
    64×2 banding that is the full exact pair set up to a ~1e−8 per-pair
    miss probability (see VERIFY_BANDS).
    """
    import ray.data as rd

    payload_columns = [text_column] + ([group_column] if group_column else [])
    try:
        in_schema = ds.schema().base_schema
        payload_fields = [(id_column, pa.int64())] + [
            (c, in_schema.field(c).type) for c in payload_columns
        ]
    except Exception:
        payload_fields = [(id_column, pa.int64())] + [
            (c, pa.string()) for c in payload_columns
        ]
    payload_schema = pa.schema(
        [("doc_id" if n == id_column else n, t) for n, t in payload_fields]
    )

    sigs = ds.map_batches(
        MinHashSignatureStage(
            text_column=text_column, id_column=id_column, shingle_n=shingle_n
        ),
        batch_format="pyarrow",
        # coalesce small reader blocks: the per-batch shingle+perm kernel has
        # fixed setup cost that tiny batches multiply
        batch_size=1024,
    ).materialize()
    exploded = sigs.map_batches(BandExplodeStage(bands=bands), batch_format="pyarrow")
    sieved, n_multi = _sieve_multi_buckets(exploded, "bucket")
    if sieved is None:
        return rd.from_arrow(_empty_pairs_arrow("jaccard", pa.float64()))

    def to_payload(batch: pa.Table) -> pa.Table:
        t = batch.select([id_column] + payload_columns)
        return t.rename_columns(["doc_id"] + payload_columns)

    payload_ds = ds.map_batches(to_payload, batch_format="pyarrow")
    attached = _attach_payload(
        sieved, payload_ds, key="doc_id", payload_columns=payload_columns,
        payload_schema=payload_schema, payload_width=payload_width,
    )

    def part_pairs(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return _empty_pairs_arrow("jaccard", pa.float64())
        ids_all = part["doc_id"].to_numpy()
        bucket = part["bucket"].to_numpy()
        band_all = part["band"].to_numpy()
        # unique docs in this part: texts / band hashes / ngram sets are
        # computed once per doc, not once per (band, bucket) appearance
        uniq_ids, first_ix = np.unique(ids_all, return_index=True)
        texts_u = part[text_column].take(pa.array(first_ix)).to_pylist()
        groups_u = (
            np.asarray(part[group_column].take(pa.array(first_ix)).to_pylist(),
                       dtype=object)
            if group_column
            else None
        )
        sig16_u = (
            minhash_signatures(texts_u, shingle_n) & np.uint64(0xFFFF)
        ).astype(np.uint16)
        bh_u = _band_hashes(sig16_u, bands)
        u_of_row = np.searchsorted(uniq_ids, ids_all)
        set_cache: dict[int, set] = {}

        def nset(ui: int) -> set:
            s = set_cache.get(ui)
            if s is None:
                s = ngram_set(texts_u[ui], shingle_n)
                set_cache[ui] = s
            return s

        out_a, out_b, out_j = [], [], []
        for rows in _iter_bucket_groups(bucket, ids_all):
            band = int(band_all[rows[0]])
            u = u_of_row[rows]
            ia, ib = np.triu_indices(len(rows), k=1)
            if band > 0:
                bh = bh_u[u][:, :band]
                fresh = ~(bh[ia] == bh[ib]).any(axis=1)
                ia, ib = ia[fresh], ib[fresh]
            if groups_u is not None and len(ia):
                g = groups_u[u]
                same = g[ia] == g[ib]
                ia, ib = ia[same], ib[same]
            if not len(ia):
                continue
            ids = ids_all[rows]
            for i, j in zip(ia.tolist(), ib.tolist()):
                s = jaccard(nset(int(u[i])), nset(int(u[j])))
                if s >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(s)
        if not out_a:
            return _empty_pairs_arrow("jaccard", pa.float64())
        return pa.table(
            {
                "id_a": pa.array(np.asarray(out_a, dtype=np.int64)),
                "id_b": pa.array(np.asarray(out_b, dtype=np.int64)),
                "jaccard": pa.array(np.asarray(out_j, dtype=np.float64)),
            }
        )

    n_parts = _verify_parts()
    return (
        attached.map_batches(lambda t: _with_part(t, n_parts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )
