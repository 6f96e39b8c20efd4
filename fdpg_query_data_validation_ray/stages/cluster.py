"""Pair → cluster resolution for near-duplicate deduplication.

The LSH families (stages/dedup.py: minhash/simhash, stages/similarity.py:
cosine) emit VERIFIED PAIRS (id_a, id_b). A real training-data dedup run
needs one more step: connected components over the pair graph plus a
keep-one-representative filter — the fuzzy analog of `exact_dedup`
(stages/dedup.py). The reference has no such operator (its dedup is
issue-level set membership, extraction/IssueSet.py:9-26); this is part of
the mandated LLM-pipeline surface.

Two strategies, following the engine-wide sieve split (stages/unique.py):

- "driver" (default within budget): the pair set is O(duplicate pairs) —
  tiny relative to the corpus — so stream the two int64 id columns to the
  driver (16 B/pair) and run vectorized min-label propagation with pointer
  doubling (O(E) numpy sweeps, O(log n) rounds). The ORIGINAL corpus never
  leaves the cluster; only pair ids do.

- "shuffle" (beyond budget / forced): alternating large-star / small-star
  rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
  Beyond") expressed in Ray Data. Each phase is one all-to-all exchange:
  edges are routed map-side by hash of the grouping endpoint into coarse
  partitions (large-star symmetrizes first so a group holds the node's
  FULL neighborhood; small-star routes each canonical (big, small) edge to
  its larger endpoint), then a single vectorized kernel per part (lexsort
  + group-boundary masks) performs the whole star step — large-star
  re-attaches every larger neighbor to min(N ∪ {u}); small-star collapses
  a node's smaller neighbors onto their minimum. The per-part min IS the
  global per-node min (hash routing), so no join and no global aggregate
  are needed. The load-bearing property vs plain min-rewiring CCF (Kardes
  et al. 2014): per-phase output EDGE COUNT NEVER EXCEEDS THE INPUT edge
  count (large-star emits exactly one edge per symmetrized row with
  v > u = |E| rows; small-star one per group row) — min-rewiring CCF
  DOUBLES the edge set per round on path graphs (the distance-halving
  closure: a 1M-edge chain+giant-component graph reached 100M+
  intermediate pairs by round 9, 33 GB of object-store spill, measured),
  while large/small-star holds the same graph at exactly 1.05M edges for
  all 16 rounds. Convergence = a full LS+SS round re-attaching nothing
  (both kernels' `new` counters zero) ⇔ the graph is a union of
  min-rooted stars. O(log² n) rounds worst case, ~log₂(diameter)
  observed. Nothing O(nodes) ever reaches the driver.

Labels are (node, cluster_id) with cluster_id = MIN node id of the
component, so "keep the representative" == "keep rows whose id equals
their cluster_id, plus all unpaired rows".
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.stages.unique import SIEVE_MAX_DRIVER_ROWS

LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("cluster_id", pa.int64())])

# rounds (large-star + small-star pairs) the last _labels_ccf call took to
# converge — observability for the at-scale evidence scripts/tests
# (~log₂(diameter) observed, O(log² n) worst case)
LAST_CCF_ROUNDS: int = 0


def _join_partitions() -> int:
    """Hash-join partition count sized to the session: Ray 2.49's hash
    shuffle runs one 1-CPU aggregator per partition concurrently, so asking
    for more partitions than cluster CPUs DEADLOCKS a small session (the
    join backpressures forever waiting for infeasible actors). At real
    cluster scale pin QDV_CC_JOIN_PARTITIONS to ~2× total cores."""
    env = os.environ.get("QDV_CC_JOIN_PARTITIONS")
    if env:
        return int(env)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus)


def _labels_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Vectorized min-label propagation + pointer doubling over edge arrays.

    Each sweep relaxes every edge (parent[x] ← min of endpoint parents, via
    np.minimum.at which handles repeated indices) then shortcuts parent
    chains (parent ← parent[parent] to fixpoint). Converges to the
    component-minimum label in O(log n) sweeps of O(E) work — no Python
    per-edge loop, so 50M pairs stay in the driver budget's time envelope.
    """
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = parent.copy()
        pa_, pb_ = parent[ia], parent[ib]
        np.minimum.at(parent, ia, pb_)
        np.minimum.at(parent, ib, pa_)
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if np.array_equal(parent, old):
            break
    # nodes is sorted ascending, so the min parent INDEX is the min node id
    return pa.table({"node": nodes, "cluster_id": nodes[parent]}, schema=LABEL_SCHEMA)


def _ccf_parts() -> int:
    """Coarse partition count for the per-round CCF kernel: every sym row
    routes to hash(src) & (parts-1), so one part holds complete per-src
    neighbor sets. Power of two ~4× cluster CPUs balances kernel parallelism
    against per-group machinery; QDV_CCF_PARTS pins it (scale with edge
    volume on a real cluster — each part must hold its slice in worker
    heap)."""
    env = os.environ.get("QDV_CCF_PARTS")
    if env:
        return _next_pow2(int(env))
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return _next_pow2(4 * cpus)


def _next_pow2(n: int) -> int:
    """Round up to a power of two ≥ 1 — the hash routing is `& (parts-1)`,
    so any other count silently leaves part-space gaps (correct labels,
    degraded parallelism). Caller/env-supplied counts go through here too."""
    if n < 1:
        raise ValueError(f"partition count must be >= 1, got {n}")
    p = 1
    while p < n:
        p <<= 1
    return p


def _batch_unique_pairs(a: np.ndarray, b: np.ndarray, new: np.ndarray):
    """Within-batch pair dedup (lexsort) to cut the global dedup shuffle."""
    if len(a) == 0:
        return a, b, new
    order = np.lexsort((b, a))
    a, b, new = a[order], b[order], new[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    np.not_equal(a[1:], a[:-1], out=keep[1:])
    keep[1:] |= b[1:] != b[:-1]
    # a kept pair is "new" if ANY duplicate of it was new
    grp = np.cumsum(keep) - 1
    newmax = np.zeros(int(grp[-1]) + 1, dtype=new.dtype)
    np.maximum.at(newmax, grp, new)
    return a[keep], b[keep], newmax


def _sorted_groups(t: pa.Table):
    """(src asc, dst asc)-sorted, pair-deduped edge arrays plus group masks.

    Returns (a, b, newgrp) where newgrp marks each src group's first row —
    so b[newgrp] is every group's MIN dst and a[newgrp] its key. None for an
    empty part."""
    a = t["src"].to_numpy(zero_copy_only=False)
    b = t["dst"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return None
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    np.not_equal(a[1:], a[:-1], out=keep[1:])
    keep[1:] |= b[1:] != b[:-1]
    a, b = a[keep], b[keep]
    newgrp = np.empty(len(a), dtype=bool)
    newgrp[0] = True
    np.not_equal(a[1:], a[:-1], out=newgrp[1:])
    return a, b, newgrp


_CCF_OUT_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("new", pa.int64())]
)


def _large_star_kernel(t: pa.Table) -> pa.Table:
    """Large-star over one coarse part of SYMMETRIZED rows (every
    neighborhood complete by hash routing).

    For each group u with neighbors N and m = min(N ∪ {u}): emit (v, m) for
    every v ∈ N with v > u — exactly one output row per input row with
    v > u, so the phase's edge count never grows. new=1 when m != u (the
    larger neighbor was re-attached below its old anchor). Output edges are
    canonical (first > second) since v > u ≥ m."""
    g = _sorted_groups(t)
    if g is None:
        return _CCF_OUT_SCHEMA.empty_table()
    a, b, newgrp = g
    grp = np.cumsum(newgrp) - 1
    m = np.minimum(b[newgrp], a[newgrp])
    m_row = m[grp]
    sel = b > a
    src_out = b[sel]
    dst_out = m_row[sel]
    new = (m_row[sel] != a[sel]).astype(np.int64)
    src_out, dst_out, new = _batch_unique_pairs(src_out, dst_out, new)
    return pa.table(
        {"src": src_out, "dst": dst_out, "new": new}, schema=_CCF_OUT_SCHEMA
    )


def _small_star_kernel(t: pa.Table) -> pa.Table:
    """Small-star over one coarse part of CANONICAL (src > dst) rows routed
    by hash(src) — a group holds ALL of node u's smaller neighbors.

    For each group u with smaller neighbors N and m = min(N): emit (u, m)
    [new=0] plus (w, m) for every w ∈ N \\ {m} [new=1] — one output row per
    group row, so the phase's edge count never grows. Output stays
    canonical: u > m and w > m (m is the strict group minimum)."""
    g = _sorted_groups(t)
    if g is None:
        return _CCF_OUT_SCHEMA.empty_table()
    a, b, newgrp = g
    grp = np.cumsum(newgrp) - 1
    u = a[newgrp]
    m = b[newgrp]
    m_row = m[grp]
    rest = b != m_row
    src_out = np.concatenate([u, b[rest]])
    dst_out = np.concatenate([m, m_row[rest]])
    new = np.concatenate(
        [
            np.zeros(len(u), dtype=np.int64),
            np.ones(int(rest.sum()), dtype=np.int64),
        ]
    )
    src_out, dst_out, new = _batch_unique_pairs(src_out, dst_out, new)
    return pa.table(
        {"src": src_out, "dst": dst_out, "new": new}, schema=_CCF_OUT_SCHEMA
    )


def _label_kernel(t: pa.Table) -> pa.Table:
    """Converged edges → (node, cluster_id): label = min(min dst, node), so
    members point at the root and the root (whose neighbors are all larger)
    pins to itself."""
    g = _sorted_groups(t)
    if g is None:
        return LABEL_SCHEMA.empty_table()
    a, b, newgrp = g
    k = a[newgrp]
    return pa.table(
        {"node": k, "cluster_id": np.minimum(b[newgrp], k)}, schema=LABEL_SCHEMA
    )


def _labels_ccf(pairs, col_a: str, col_b: str, num_partitions: int | None = None,
                max_iters: int = 64):
    """Distributed large-star/small-star over a Ray Dataset of pairs →
    Dataset(node, cluster_id).

    Per round TWO all-to-all exchanges, each bounded by the INITIAL edge
    count (see module docstring): large-star (symmetrize + hash-route
    map-side, groupby(part), `_large_star_kernel`) then small-star (route
    canonical edges by their larger endpoint, `_small_star_kernel`). Stops
    when a full round re-attaches nothing — both kernels' `new` sums are
    zero — which holds iff the graph is a union of min-rooted stars."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import (
        drop_schemaless_empty_blocks,
    )

    from fdpg_query_data_validation_ray.functions.hashing import hash64

    n_parts = (
        _next_pow2(int(num_partitions)) if num_partitions is not None else _ccf_parts()
    )
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    E = pairs.map_batches(
        lambda t: pa.table(
            {"src": t[col_a].cast(pa.int64()), "dst": t[col_b].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    # pairs usually come out of a groupby.map_groups — strip the schema-less
    # empty blocks Ray 2.49 emits for empty partitions before counting
    E = drop_schemaless_empty_blocks(E, empty_schema=edge_schema)
    if E.count() == 0:
        return rd.from_arrow(LABEL_SCHEMA.empty_table())

    def route_sym(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks()
        dst = t["dst"].combine_chunks()
        a = pa.concat_arrays([src, dst])
        b = pa.concat_arrays([dst, src])
        part = (hash64(a) & np.uint64(n_parts - 1)).astype(np.int32)
        return pa.table({"src": a, "dst": b, "part": pa.array(part)})

    def route_canon(t: pa.Table) -> pa.Table:
        # edges are already canonical (src > dst) coming out of either star
        # kernel; small-star groups by the larger endpoint, no symmetrize
        src = t["src"].combine_chunks()
        part = (hash64(src) & np.uint64(n_parts - 1)).astype(np.int32)
        return pa.table({"src": src, "dst": t["dst"].combine_chunks(),
                         "part": pa.array(part)})

    global LAST_CCF_ROUNDS
    for _round in range(max_iters):
        LAST_CCF_ROUNDS = _round + 1
        ls = (
            E.map_batches(route_sym, batch_format="pyarrow",
                          batch_size=65536)
            .groupby("part")
            .map_groups(_large_star_kernel, batch_format="pyarrow")
        )
        ls = drop_schemaless_empty_blocks(
            ls, empty_schema=_CCF_OUT_SCHEMA
        ).materialize()
        ls_new = ls.sum("new") or 0
        ss = (
            ls.select_columns(["src", "dst"])
            .map_batches(route_canon, batch_format="pyarrow",
                          batch_size=65536)
            .groupby("part")
            .map_groups(_small_star_kernel, batch_format="pyarrow")
        )
        ss = drop_schemaless_empty_blocks(
            ss, empty_schema=_CCF_OUT_SCHEMA
        ).materialize()
        ss_new = ss.sum("new") or 0
        E = ss.select_columns(["src", "dst"])
        if ls_new == 0 and ss_new == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: CCF did not converge in {max_iters} rounds"
        )

    # At convergence E == {(member, root)} (possibly with cross-part
    # duplicates, collapsed by the kernel's group masks).
    final = (
        E.map_batches(route_sym, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(_label_kernel, batch_format="pyarrow")
    )
    return drop_schemaless_empty_blocks(final, empty_schema=LABEL_SCHEMA)


def connected_components(pairs, col_a: str = "id_a", col_b: str = "id_b",
                         mode: str = "auto"):
    """Dataset(node, cluster_id) over the undirected pair graph; cluster_id =
    min node id of the component. Every node that appears in a pair gets a
    row; unpaired corpus rows are implicitly their own singleton cluster
    (callers treat absence as node == cluster_id).

    mode: 'driver' (vectorized union via min-label propagation on the pair
    arrays, within QDV_SIEVE_MAX_DRIVER_ROWS pairs), 'shuffle' (distributed
    CCF, see _labels_ccf), or 'auto'. QDV_SIEVE_MODE forces ('sieve' maps to
    'driver')."""
    import ray.data as rd

    env = os.environ.get("QDV_SIEVE_MODE")
    if env == "sieve":
        mode = "driver"
    elif env == "shuffle":
        mode = "shuffle"
    if mode == "auto":
        pairs = pairs.materialize()
        mode = "driver" if pairs.count() <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
    if mode == "shuffle":
        return _labels_ccf(pairs, col_a, col_b)

    ids = pairs.select_columns([col_a, col_b])
    chunks_a, chunks_b = [], []
    for b in ids.iter_batches(batch_format="pyarrow", batch_size=None):
        chunks_a.append(b[col_a].to_numpy(zero_copy_only=False).astype(np.int64))
        chunks_b.append(b[col_b].to_numpy(zero_copy_only=False).astype(np.int64))
    if not chunks_a or sum(len(c) for c in chunks_a) == 0:
        return rd.from_arrow(LABEL_SCHEMA.empty_table())
    return rd.from_arrow(
        _labels_driver(np.concatenate(chunks_a), np.concatenate(chunks_b))
    )


def dedup_keep_representative(ds, pairs, id_column: str, mode: str = "auto"):
    """Filter `ds` down to one representative row per near-dup cluster: drop
    every row whose id is a NON-minimum member of a component; unpaired rows
    pass through untouched. The loser id set is O(duplicate rows); within
    the driver budget it broadcasts (ray.put + binary-search membership),
    beyond it the native LEFT ANTI hash join keeps everything distributed."""
    import ray
    import ray.data as rd

    labels = connected_components(pairs, mode=mode)
    losers = labels.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["cluster_id"])).select(["node"]),
        batch_format="pyarrow",
    ).materialize()
    n_losers = losers.count()
    if n_losers == 0:
        return ds

    env = os.environ.get("QDV_SIEVE_MODE")
    broadcast = n_losers <= SIEVE_MAX_DRIVER_ROWS if env is None else env == "sieve"
    if not broadcast:
        from fdpg_query_data_validation_ray.stages.dedup import (
            drop_schemaless_empty_blocks,
        )

        anti = drop_schemaless_empty_blocks(
            losers.map_batches(
                lambda t: t.rename_columns([id_column]), batch_format="pyarrow"
            ),
            empty_schema=pa.schema([(id_column, pa.int64())]),
        )
        return ds.join(anti, "left_anti", _join_partitions(), on=(id_column,))

    arr = np.sort(
        np.concatenate(
            [
                b["node"].to_numpy(zero_copy_only=False)
                for b in losers.iter_batches(batch_format="pyarrow", batch_size=None)
            ]
        )
    )
    drop_ref = ray.put(arr)

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(drop, ids)
        ix[ix == len(drop)] = 0
        return batch.filter(pa.array(drop[ix] != ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def minhash_dedup_keep(ds, text_column: str, id_column: str,
                       threshold: float = 0.7, shingle_n: int = 3,
                       mode: str = "auto"):
    """Materializing fuzzy dedup: MinHash+LSH verified pairs → connected
    components → keep the min-id representative of each near-dup cluster.
    The fuzzy analog of exact_dedup (stages/dedup.py). Returns the
    deduplicated Dataset with ds's schema."""
    from fdpg_query_data_validation_ray.stages.dedup import minhash_near_duplicates

    ds = ds.materialize()  # consumed twice: pair mining + final filter
    pairs = minhash_near_duplicates(
        ds, text_column, id_column, threshold=threshold, shingle_n=shingle_n
    )
    return dedup_keep_representative(ds, pairs, id_column, mode=mode)
