"""Fixed-point PageRank over a distributed edge list — the iterative
join+aggregate showcase beside connected components (stages/cluster.py).

PageRank (Page et al. 1999) is the canonical BSP graph computation:
every iteration each node divides its rank among its out-edges and
collects damped contributions from its in-edges. The standard distributed
form is exactly two data exchanges per iteration, and that is the plan
here, expressed entirely in Ray Data:

  exchange A (by hash(src)):  rank rows and edge rows co-partition; each
      part maps src → contribution = rank // out_degree and emits one
      (dst, contribution) row per edge — no node's state is ever global.
  exchange B (by hash(dst)):  contribution rows and node rows
      co-partition; each part sums contributions per node and applies
      rank' = base + damp_num * Σ // damp_den, re-emitting node rows
      (node, out_degree, rank) already keyed for the next iteration's
      exchange A.

ALL arithmetic is int64 fixed-point (rank scaled by `scale`, floor
division everywhere), so sums are order-independent and the result is
hash-exact against a DuckDB oracle that unrolls the same iterations as
CTEs — no float summation drift, no convergence tolerance in the
correctness contract.

Scale posture: per iteration the exchanges move O(E) edge/contribution
rows plus O(V) node rows — the same asymptotics as any Pregel/BSP
engine; no stage holds more than its hash part; the driver holds nothing.
Edges are re-routed each iteration (Dataset groupby has no partition
pinning) — a real cluster run amortizes that by materializing the routed
edge dataset once; correctness is identical either way.

Dangling nodes (no out-edges) receive contributions but emit none; nodes
appearing only as a source still get base rank. Parallel edges are
honored (multigraph): a doubled edge carries double contribution, in both
engine and oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64
from fdpg_query_data_validation_ray.stages.cluster import _ccf_parts, _next_pow2

_KIND_EDGE = 0   # k = src,  v1 = dst,  v2 unused
_KIND_NODE = 1   # k = node, v1 = rank, v2 = out-degree
_KIND_CONTRIB = 0  # exchange B reuses kind 0: k = dst, v1 = contribution

_ROW_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),
        ("k", pa.int64()),
        ("v1", pa.int64()),
        ("v2", pa.int64()),
    ]
)

def _empty_rows() -> pa.Table:
    return _ROW_SCHEMA.empty_table()


def _rows_table(part, kind_val, k, v1, v2) -> pa.Table:
    n = len(k)
    return pa.table(
        {
            "part": np.asarray(part, np.int32),
            "kind": np.full(n, kind_val, np.int8),
            "k": np.asarray(k, np.int64),
            "v1": np.asarray(v1, np.int64),
            "v2": np.asarray(v2, np.int64),
        },
        schema=_ROW_SCHEMA,
    )


def _part_of(arr: pa.Array, n_parts: int) -> pa.Array:
    return pa.array((hash64(arr) & np.uint64(n_parts - 1)).astype(np.int32))


def pagerank_int(
    edges,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 1_000_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    num_partitions: int | None = None,
    mode: str = "auto",
    broadcast_node_budget: int = 4_000_000,
):
    """PageRank on an edge-list Dataset; returns a Dataset (node, rank).

    rank₀ = scale for every node; per iteration
    rank' = (den-num)*scale//den + num * Σ_in (rank_src // deg_src) // den.

    Two physical plans with identical (hash-exact) results:

    - mode="broadcast": the O(V) rank vector is ray.put-broadcast each
      iteration; edge blocks compute per-block dst partials with zero
      sorting and ONE part exchange reduces them. Driver state = three
      int64 arrays of length V — budget-guarded by
      `broadcast_node_budget` (QDV_PR_BROADCAST_NODES overrides).
    - mode="exchange": fully distributed two-exchange BSP (no driver
      state beyond scheduling) — the 100-TB path where V itself exceeds
      any single node's memory.
    - mode="auto" (default): broadcast iff node count ≤ the budget.
    """
    import os

    n_parts = (
        _next_pow2(int(num_partitions)) if num_partitions is not None else _ccf_parts()
    )
    base = (damp_den - damp_num) * scale // damp_den
    if mode not in ("auto", "broadcast", "exchange"):
        raise ValueError(mode)
    env_budget = os.environ.get("QDV_PR_BROADCAST_NODES")
    if env_budget:
        broadcast_node_budget = int(env_budget)

    # ---- initial node rows: out-degree per src, plus sink-only nodes -----
    def edge_rows(t: pa.Table) -> pa.Table:
        s = pc.cast(t[src], pa.int64()).combine_chunks()
        d = pc.cast(t[dst], pa.int64()).combine_chunks()
        m = pc.and_(pc.is_valid(s), pc.is_valid(d))
        s, d = pc.filter(s, m), pc.filter(d, m)
        n = len(s)
        return pa.table(
            {
                "part": _part_of(s, n_parts),
                "kind": pa.array(np.zeros(n, np.int8)),
                "k": s,
                "v1": d,
                "v2": pa.array(np.zeros(n, np.int64)),
            },
            schema=_ROW_SCHEMA,
        )

    # Edge rows feed the degree pass plus every iteration's exchange A, and
    # each iteration's rank state feeds TWO consumers — without pinning,
    # lazy fan-out re-executes the whole upstream chain per consumer,
    # doubling work per iteration (2^iters blowup). Materializing the edge
    # rows once and the O(V) rank state per iteration is the iterative
    # algorithm's working set, not a mid-pipeline driver pull: blocks stay
    # in the object store.
    e = edges.map_batches(
        edge_rows, batch_format="pyarrow", batch_size=65536
    ).materialize()

    # degree pass: per-batch (node, count) partials — including degree-0
    # entries for sink-only nodes — routed by node hash and summed inside
    # parts. A Ray-native per-node groupby here measured 19 s on a 2M-edge
    # graph vs 0.3 s for the part exchange (the repo-wide coarse-partition
    # lesson); the kernel emits initial node rows (rank = scale) directly,
    # already keyed for exchange A.
    def deg_partials(t: pa.Table) -> pa.Table:
        srcs = t.group_by("k").aggregate([([], "count_all")])
        s_nodes = srcs["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_cnt = srcs["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = np.unique(t["v1"].to_numpy(zero_copy_only=False).astype(np.int64))
        node = np.concatenate([s_nodes, dsts])
        d = np.concatenate([s_cnt, np.zeros(len(dsts), np.int64)])
        return pa.table(
            {
                "part": (hash64(node) & np.uint64(n_parts - 1)).astype(np.int32),
                "node": node,
                "d": d,
            }
        )

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        s = g.groupby("node", sort=False)["d"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy().astype(np.int64),
             "d": s.to_numpy().astype(np.int64)}
        )

    deg = (
        e.map_batches(deg_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(deg_sum, batch_format="pandas")
        .materialize()  # consumed by count() probe + the chosen plan
    )

    if mode == "auto":
        mode = "broadcast" if deg.count() <= broadcast_node_budget else "exchange"
    if mode == "broadcast":
        return _pagerank_broadcast(
            e, deg, iters, scale, base, damp_num, damp_den, n_parts
        )

    def deg_to_node_rows(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _rows_table(
            (hash64(nodes) & np.uint64(n_parts - 1)).astype(np.int32),
            _KIND_NODE,
            nodes,
            np.full(len(nodes), scale, np.int64),
            t["d"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    ranks = deg.map_batches(deg_to_node_rows, batch_format="pyarrow")

    # ---- iterations: exchange A (by src) then exchange B (by dst) --------
    def spread(g: pd.DataFrame) -> pa.Table:
        """Per src-hash part: contribution = rank // deg mapped onto edges."""
        nodes = g[g["kind"] == _KIND_NODE]
        ed = g[g["kind"] == _KIND_EDGE]
        if len(ed) == 0 or len(nodes) == 0:
            return _empty_rows()
        pos = nodes[nodes["v2"] > 0]
        contrib = pd.Series(
            (pos["v1"].to_numpy() // pos["v2"].to_numpy()),
            index=pos["k"].to_numpy(),
        )
        c = ed["k"].map(contrib)
        keep = c.notna().to_numpy()
        dsts = ed["v1"].to_numpy()[keep]
        cv = c.to_numpy()[keep].astype(np.int64)
        # combiner: contributions to the same dst collapse before the
        # exchange — on hub-heavy (power-law) graphs this cuts exchange-B
        # volume by the part's average in-degree
        agg = pd.Series(cv).groupby(dsts, sort=False).sum()
        dsts = agg.index.to_numpy().astype(np.int64)
        cv = agg.to_numpy().astype(np.int64)
        return _rows_table(
            (hash64(dsts) & np.uint64(n_parts - 1)).astype(np.int32),
            _KIND_CONTRIB, dsts, cv, np.zeros(len(dsts), np.int64),
        )

    def collect(g: pd.DataFrame) -> pa.Table:
        """Per dst-hash part: rank' per node row, degree carried through."""
        nodes = g[g["kind"] == _KIND_NODE]
        if len(nodes) == 0:
            return _empty_rows()
        contribs = g[g["kind"] == _KIND_CONTRIB]
        s = contribs.groupby("k", sort=False)["v1"].sum()
        sums = nodes["k"].map(s).fillna(0).astype(np.int64).to_numpy()
        r_new = base + damp_num * sums // damp_den
        return _rows_table(
            nodes["part"].to_numpy(), _KIND_NODE, nodes["k"].to_numpy(),
            r_new, nodes["v2"].to_numpy(),
        )

    for _ in range(iters):
        # Coalesce the O(V) rank state to n_parts blocks before pinning it:
        # groupby().map_groups() emits one block per INPUT block, and union
        # concatenates block lists, so without this the block count grows
        # every iteration (measured 93 → 1395 blocks over 3 iterations at
        # 12M edges, inflating exchange sort time 4.8 s → 80 s).
        ranks = ranks.repartition(n_parts).materialize()
        contribs = (
            ranks.union(e).groupby("part").map_groups(spread, batch_format="pandas")
        )
        # node rows re-enter exchange B carrying rank (ignored) + degree
        ranks = (
            ranks.union(contribs)
            .groupby("part")
            .map_groups(collect, batch_format="pandas")
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["k"].combine_chunks(), "rank": t["v1"].combine_chunks()}
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


def _pagerank_broadcast(e, deg, iters, scale, base, damp_num, damp_den, n_parts):
    """Broadcast-rank plan: per iteration, ray.put the (nodes, contribution)
    arrays once, map edge blocks with a searchsorted lookup + per-block dst
    combiner (NO sort of the edge set), reduce partials in one part
    exchange, and apply the damped update at the driver over the O(V)
    arrays. Integer arithmetic identical to the exchange plan — results are
    byte-equal. Caller guarantees V fits the driver budget."""
    import ray
    import ray.data as rd

    dd = deg.to_pandas()  # O(V); budget-guarded by pagerank_int's mode gate
    nodes = dd["node"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    nodes = nodes[order]
    d = dd["d"].to_numpy().astype(np.int64)[order]
    r = np.full(len(nodes), scale, np.int64)

    def part_sum(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        s = g.groupby("dst", sort=False)["s"].sum()
        return pd.DataFrame(
            {"dst": s.index.to_numpy().astype(np.int64),
             "s": s.to_numpy().astype(np.int64)}
        )

    for _ in range(iters):
        contrib = np.where(d > 0, r // np.maximum(d, 1), 0).astype(np.int64)
        ref = ray.put((nodes, contrib))

        def spread_b(t: pa.Table, _ref=ref) -> pa.Table:
            nds, ctr = ray.get(_ref)
            s = t["k"].to_numpy(zero_copy_only=False)
            dstv = t["v1"].to_numpy(zero_copy_only=False)
            cv = ctr[np.searchsorted(nds, s)]  # every src is in nodes
            ud, inv = np.unique(dstv, return_inverse=True)
            sums = np.zeros(len(ud), np.int64)
            np.add.at(sums, inv, cv)  # exact int64 block combiner
            return pa.table(
                {
                    "part": (hash64(ud) & np.uint64(n_parts - 1)).astype(
                        np.int32
                    ),
                    "dst": ud,
                    "s": sums,
                }
            )

        sums_df = (
            e.map_batches(spread_b, batch_format="pyarrow")
            .groupby("part")
            .map_groups(part_sum, batch_format="pandas")
            .to_pandas()  # O(V) reduced sums back to the driver
        )
        r = np.full(len(nodes), base, np.int64)
        pos = np.searchsorted(nodes, sums_df["dst"].to_numpy().astype(np.int64))
        r[pos] += (
            damp_num * sums_df["s"].to_numpy().astype(np.int64)
        ) // damp_den

    return rd.from_arrow(pa.table({"node": nodes, "rank": r}))


# --------------------------------------------------------------------------
# Triangle counting (node-iterator with degree ordering)
# --------------------------------------------------------------------------

_EDGE_SCHEMA = pa.schema(
    [("part", pa.int32()), ("u", pa.int64()), ("v", pa.int64())]
)

_WEDGE_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),  # 0 = canonical edge, 1 = wedge
        ("lo", pa.int64()),
        ("hi", pa.int64()),
        ("src", pa.int64()),  # wedge apex; unused (0) for edge rows
    ]
)


def _pair_part(u: np.ndarray, v: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic routing hash for an (u, v) pair — same recipe as the
    copurchase pair exchange (queries.py): int64 wrap-around mix, then
    hash64. Collisions only affect partition balance, never correctness
    (each part dedups/merges on the exact (u, v) values)."""
    return (
        hash64(u * np.int64(1_000_003) + v) & np.uint64(n_parts - 1)
    ).astype(np.int32)


def _canon_edges(edges, a: str, b: str, n_parts: int):
    """Undirected edge canonicalization: drop nulls and self-loops, key every
    edge (min, max) by node id, route by pair hash, per-part exact dedup.
    Output: one (part, u, v) row per distinct undirected edge."""

    def canon(t: pa.Table) -> pa.Table:
        x = pc.cast(t[a], pa.int64()).combine_chunks()
        y = pc.cast(t[b], pa.int64()).combine_chunks()
        m = pc.and_(
            pc.and_(pc.is_valid(x), pc.is_valid(y)), pc.not_equal(x, y)
        )
        m = pc.fill_null(m, False)
        xv = pc.filter(x, m).to_numpy(zero_copy_only=False)
        yv = pc.filter(y, m).to_numpy(zero_copy_only=False)
        u = np.minimum(xv, yv)
        v = np.maximum(xv, yv)
        # per-batch dedup combiner: sorted first-occurrence mask
        if len(u):
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            first = np.empty(len(u), dtype=bool)
            first[0] = True
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v = u[first], v[first]
        return pa.table(
            {"part": _pair_part(u, v, n_parts), "u": u, "v": v},
            schema=_EDGE_SCHEMA,
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "v"])
        return pd.DataFrame(
            {"u": g["u"].to_numpy(np.int64), "v": g["v"].to_numpy(np.int64)}
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )


def triangle_counts(
    edges,
    a: str = "a",
    b: str = "b",
    num_partitions: int | None = None,
    mode: str = "auto",
    broadcast_node_budget: int = 4_000_000,
    broadcast_edge_budget: int = 20_000_000,
):
    """Per-node triangle counts over an undirected edge-list Dataset.

    Node-iterator algorithm with DEGREE ORDERING (Schank & Wagner 2005 /
    Suri & Vassilvitskii WWW'11 MapReduce form): orient every edge from the
    endpoint with smaller (degree, node) to the larger, enumerate wedges
    from each node's out-neighborhood, and close wedges against the edge
    set. Orientation bounds every out-degree by O(sqrt(m)), so total wedge
    volume is O(m^1.5) — the hub-node quadratic blow-up of naive neighbor
    pairing never happens.

    Returns a Dataset (node, n_triangles) covering nodes in ≥ 1 triangle.
    Exact for multigraph inputs (parallel edges collapse in the canonical
    dedup) and orientation-invariant: the triangle SET is a property of the
    undirected graph, so results hash-match any SQL triple-join oracle.

    Two physical plans with identical results:
    - broadcast (distinct edges ≤ `broadcast_edge_budget`, nodes ≤
      `broadcast_node_budget`, ids in [0, 2^31)): the canonical edge set is
      streamed to the driver ONCE with a hard budget (overflow falls back
      mid-stream, the _dangling_sieve pattern); degrees, (degree, id)
      orientation and the packed-uint64 closure keys all compute driver-
      side from that one pull, so the only distributed work left is ONE
      wedge exchange + ONE count exchange. QDV_TRI_BROADCAST_EDGES /
      QDV_TRI_BROADCAST_NODES override the budgets.
    - exchange: degrees attach by two node-hash exchanges, wedges and edge
      rows co-partition by pair hash and close per part — no O(E) driver
      state; the 100-TB path.

    Reference analog: the reference has no graph operators; this extends the
    engine's dedup-cluster family (stages/cluster.py) with the standard
    triangle/clustering-coefficient feature used in corpus graph analysis.
    """
    import os

    import ray
    import ray.data as rd

    if mode not in ("auto", "broadcast", "exchange"):
        raise ValueError(mode)
    n_parts = (
        _next_pow2(int(num_partitions))
        if num_partitions is not None
        else _ccf_parts()
    )
    env_budget = os.environ.get("QDV_TRI_BROADCAST_NODES")
    if env_budget:
        broadcast_node_budget = int(env_budget)
    env_ebudget = os.environ.get("QDV_TRI_BROADCAST_EDGES")
    if env_ebudget:
        broadcast_edge_budget = int(env_ebudget)

    edges_c = _canon_edges(edges, a, b, n_parts)

    def count_rows(frames):
        """Final exchange: per-part (node, c) partials → per-node sum. A
        triangle-free graph produces ZERO groups (map_groups never runs and
        the dataset loses its schema), so every block is normalized to the
        typed schema and an empty typed anchor block is unioned in."""
        out_schema = pa.schema(
            [("node", pa.int64()), ("n_triangles", pa.int64())]
        )

        def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame(
                    {
                        "node": pd.Series(dtype="int64"),
                        "n_triangles": pd.Series(dtype="int64"),
                    }
                )
            s = g.groupby("node", sort=False)["c"].sum()
            return pd.DataFrame(
                {
                    "node": s.index.to_numpy(np.int64),
                    "n_triangles": s.to_numpy(np.int64),
                }
            )

        def norm(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return out_schema.empty_table()
            return t.select(["node", "n_triangles"]).cast(out_schema)

        import ray.data as rd

        reduced = (
            frames.groupby("part")
            .map_groups(reduce_part, batch_format="pandas")
            .map_batches(norm, batch_format="pyarrow")
        )
        return rd.from_arrow(out_schema.empty_table()).union(reduced)

    def node_partials(src_v, lo_v, hi_v) -> pa.Table:
        nodes = np.concatenate([src_v, lo_v, hi_v])
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": (hash64(un) & np.uint64(n_parts - 1)).astype(np.int32),
                "node": un,
                "c": cnt.astype(np.int64),
            }
        )

    if mode != "exchange":
        pulled = _try_pull_edges(edges_c, broadcast_edge_budget)
        ok = pulled is not None
        if ok:
            u, v = pulled
            nodes = np.unique(np.concatenate([u, v])) if len(u) else u
            ok = (
                len(nodes) <= broadcast_node_budget
                and (len(nodes) == 0
                     or (int(nodes[0]) >= 0 and int(nodes[-1]) < (1 << 31)))
            )
        if ok:
            return _triangles_broadcast(
                u, v, nodes, n_parts, count_rows, node_partials
            )
        if mode == "broadcast":
            raise ValueError(
                "triangle_counts: broadcast plan requires edges/nodes within "
                "budget and ids in [0, 2^31); use mode='auto' or 'exchange'"
            )
        # fall through to the exchange plan (budget exceeded / wide ids)

    return _triangles_exchange(edges_c, n_parts, count_rows, node_partials)


def _try_pull_edges(edges_c, budget: int):
    """Stream the canonical edge set to the driver with a hard row budget
    (whole blocks via batch_size=None); return (u, v) int64 arrays or None
    the moment the budget overflows (caller falls back to the exchange
    plan — the _dangling_sieve pattern)."""
    us, vs, total = [], [], 0
    for b in edges_c.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        total += b.num_rows
        if total > budget:
            return None
        us.append(b["u"].to_numpy(zero_copy_only=False))
        vs.append(b["v"].to_numpy(zero_copy_only=False))
    if not us:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return (
        np.concatenate(us).astype(np.int64),
        np.concatenate(vs).astype(np.int64),
    )


def _triangles_broadcast(u, v, nodes, n_parts, count_rows, node_partials):
    """Broadcast plan from the one driver pull: degrees, orientation and
    the packed closure keys all compute here (vectorized O(E)); the
    oriented edges upload as ready-routed blocks, so the edge pipeline
    never re-executes. Distributed work: one wedge exchange (closure keys
    read from the object store per part) + one count exchange."""
    import ray
    import ray.data as rd

    # exact degrees from the pulled arrays (bincount, not np.add.at — the
    # unbuffered ufunc costs ~7 s at 10M edges vs ~0.3 s here); the two
    # endpoint index arrays are reused as gathers below instead of fresh
    # searchsorteds
    idx_u = np.searchsorted(nodes, u)
    idx_v = np.searchsorted(nodes, v)
    d_per_node = np.bincount(
        np.concatenate([idx_u, idx_v]), minlength=len(nodes)
    ).astype(np.int64)

    # canonical edge keys packed (lo << 32 | hi): exact membership via ONE
    # searchsorted — valid because the caller's gate pinned ids to [0, 2^31)
    ekeys = np.sort((u.astype(np.uint64) << np.uint64(32))
                    | v.astype(np.uint64))
    keys_ref = ray.put(ekeys)

    # (degree, id) total order: u first iff (du, u) < (dv, v)
    du = d_per_node[idx_u]
    dv = d_per_node[idx_v]
    u_first = (du < dv) | ((du == dv) & (u < v))
    s = np.where(u_first, u, v)
    t_ = np.where(u_first, v, u)

    # wedge generation needs all of a src's out-edges in one block — and we
    # hold the oriented arrays right here, so partition BY SRC driver-side
    # and upload ready-grouped blocks: the Ray sort exchange disappears
    # entirely from this plan. Block count = min(n_parts, 64) keeps upload
    # granularity coarse; each block still holds complete src groups.
    n_blocks = max(1, min(n_parts, 64))
    bpart = (hash64(s) & np.uint64(n_blocks - 1)).astype(np.int32)
    order = np.argsort(bpart)  # within-block order is irrelevant
    s, t_, bpart = s[order], t_[order], bpart[order]
    bounds = np.searchsorted(bpart, np.arange(n_blocks + 1))
    blocks = [
        pa.table({"src": s[lo:hi], "dst": t_[lo:hi]})
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ] or [
        pa.table(
            {"src": np.zeros(0, np.int64), "dst": np.zeros(0, np.int64)}
        )
    ]
    oriented = rd.from_arrow(blocks)

    def wedges_close(g: pd.DataFrame, _kref=keys_ref) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "part": pd.Series(dtype="int32"),
                    "node": pd.Series(dtype="int64"),
                    "c": pd.Series(dtype="int64"),
                }
            )
        ek = ray.get(_kref)
        sl = g[["src", "dst"]]
        m = sl.merge(sl, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        lo = m["dst_x"].to_numpy(np.int64)
        hi = m["dst_y"].to_numpy(np.int64)
        key = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)
        pos = np.searchsorted(ek, key)
        pos_c = np.minimum(pos, len(ek) - 1) if len(ek) else pos
        closed = (len(ek) > 0) & (ek[pos_c] == key) if len(ek) else np.zeros(
            len(key), bool
        )
        src_v = m["src"].to_numpy(np.int64)[closed]
        return node_partials(src_v, lo[closed], hi[closed]).to_pandas()

    # blocks already hold complete src groups — a plain map, no exchange
    partials = oriented.map_batches(
        wedges_close, batch_format="pandas", batch_size=None
    )
    return count_rows(partials)


def _triangles_exchange(edges_c, n_parts, count_rows, node_partials):
    """Fully distributed plan: degrees attach via two node-hash exchanges,
    wedges + canonical edges co-partition by pair hash and close per part.
    No driver state beyond scheduling."""

    # ---- degree rows (node, d) from a part exchange ----------------------
    def deg_partials(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
            ]
        )
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": (hash64(un) & np.uint64(n_parts - 1)).astype(np.int32),
                "kind": np.full(len(un), 1, np.int8),
                "lo": un,
                "hi": cnt.astype(np.int64),
                "src": np.zeros(len(un), np.int64),
            },
            schema=_WEDGE_SCHEMA,
        )

    def edge_rows_by(col: str):
        def f(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            key = u if col == "u" else v
            return pa.table(
                {
                    "part": (hash64(key) & np.uint64(n_parts - 1)).astype(
                        np.int32
                    ),
                    "kind": np.zeros(len(u), np.int8),
                    "lo": u,
                    "hi": v,
                    "src": np.zeros(len(u), np.int64),
                },
                schema=_WEDGE_SCHEMA,
            )

        return f

    def attach(which: str):
        """Per part: degree rows (kind 1: lo=node, hi=count partial → summed
        here) + edge rows (kind 0). Attach the keyed endpoint's degree into
        `src` (stage 1) or orient (stage 2)."""

        def f(g: pd.DataFrame) -> pd.DataFrame:
            dg = g[g["kind"] == 1]
            ed = g[g["kind"] == 0]
            if len(ed) == 0:
                return pd.DataFrame(
                    {
                        "part": pd.Series(dtype="int32"),
                        "kind": pd.Series(dtype="int8"),
                        "lo": pd.Series(dtype="int64"),
                        "hi": pd.Series(dtype="int64"),
                        "src": pd.Series(dtype="int64"),
                    }
                )
            ds_ = dg.groupby("lo", sort=True)["hi"].sum()
            dnodes = ds_.index.to_numpy(np.int64)
            dcnt = ds_.to_numpy(np.int64)
            u = ed["lo"].to_numpy(np.int64)
            v = ed["hi"].to_numpy(np.int64)
            if which == "u":
                du = dcnt[np.searchsorted(dnodes, u)]
                # re-route by hash(v) for the second attach; carry du in src
                return pd.DataFrame(
                    {
                        "part": (hash64(v) & np.uint64(n_parts - 1)).astype(
                            np.int32
                        ),
                        "kind": np.zeros(len(u), np.int8),
                        "lo": u,
                        "hi": v,
                        "src": du,
                    }
                )
            dvv = dcnt[np.searchsorted(dnodes, v)]
            du = ed["src"].to_numpy(np.int64)
            u_first = (du < dvv) | ((du == dvv) & (u < v))
            s = np.where(u_first, u, v)
            t_ = np.where(u_first, v, u)
            return pd.DataFrame(
                {
                    "part": (hash64(s) & np.uint64(n_parts - 1)).astype(
                        np.int32
                    ),
                    "kind": np.zeros(len(s), np.int8),
                    "lo": s,
                    "hi": t_,
                    "src": np.zeros(len(s), np.int64),
                }
            )

        return f

    deg_rows = edges_c.map_batches(deg_partials, batch_format="pyarrow")
    e_by_u = edges_c.map_batches(edge_rows_by("u"), batch_format="pyarrow")
    stage1 = (
        e_by_u.union(deg_rows)
        .groupby("part")
        .map_groups(attach("u"), batch_format="pandas")
    )
    deg_rows2 = edges_c.map_batches(deg_partials, batch_format="pyarrow")
    oriented = (
        stage1.map_batches(
            lambda t: t.cast(_WEDGE_SCHEMA), batch_format="pyarrow"
        )
        .union(deg_rows2)
        .groupby("part")
        .map_groups(attach("v"), batch_format="pandas")
    )

    # ---- wedge generation per src part, routed by pair hash --------------
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["kind"] == 0]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "part": pd.Series(dtype="int32"),
                    "kind": pd.Series(dtype="int8"),
                    "lo": pd.Series(dtype="int64"),
                    "hi": pd.Series(dtype="int64"),
                    "src": pd.Series(dtype="int64"),
                }
            )
        sl = g[["lo", "hi"]].rename(columns={"lo": "s", "hi": "t"})
        m = sl.merge(sl, on="s")
        m = m[m["t_x"] < m["t_y"]]
        lo = m["t_x"].to_numpy(np.int64)
        hi = m["t_y"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": _pair_part(lo, hi, n_parts),
                "kind": np.ones(len(lo), np.int8),
                "lo": lo,
                "hi": hi,
                "src": m["s"].to_numpy(np.int64),
            }
        )

    def edge_pair_rows(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _pair_part(u, v, n_parts),
                "kind": np.zeros(len(u), np.int8),
                "lo": u,
                "hi": v,
                "src": np.zeros(len(u), np.int64),
            },
            schema=_WEDGE_SCHEMA,
        )

    wedge_rows = (
        oriented.map_batches(
            lambda t: t.cast(_WEDGE_SCHEMA), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(lambda t: t.cast(_WEDGE_SCHEMA), batch_format="pyarrow")
    )
    edge_rows = edges_c.map_batches(edge_pair_rows, batch_format="pyarrow")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["kind"] == 1]
        e = g[g["kind"] == 0]
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame(
                {
                    "part": pd.Series(dtype="int32"),
                    "node": pd.Series(dtype="int64"),
                    "c": pd.Series(dtype="int64"),
                }
            )
        m = w.merge(e[["lo", "hi"]], on=["lo", "hi"], how="inner")
        return node_partials(
            m["src"].to_numpy(np.int64),
            m["lo"].to_numpy(np.int64),
            m["hi"].to_numpy(np.int64),
        ).to_pandas()

    partials = (
        wedge_rows.union(edge_rows)
        .groupby("part")
        .map_groups(close, batch_format="pandas")
    )
    return count_rows(partials)


# --------------------------------------------------------------------------
# k-core decomposition (fixed peeling rounds)
# --------------------------------------------------------------------------

_KC_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),  # 0 = edge (lo=u, hi=v), 1 = dead node (lo)
        ("lo", pa.int64()),
        ("hi", pa.int64()),
    ]
)


def k_core(
    edges,
    k: int,
    rounds: int = 4,
    a: str = "a",
    b: str = "b",
    num_partitions: int | None = None,
):
    """k-core peeling over an undirected edge-list Dataset: up to `rounds`
    times, drop every node with degree < k (and its edges), then report the
    surviving nodes with their degrees — Seidman (1983) cores, the standard
    graph-densification/pruning step.

    `rounds` is part of the semantics (a SQL oracle unrolls the same fixed
    rounds); the engine stops early when a round peels nothing, which
    leaves the result identical because further rounds are no-ops. On any
    graph, rounds ≥ |V| guarantees the true k-core.

    Fully distributed, one degree exchange + two endpoint-filter exchanges
    per round (the triangle-counting attach pattern): dead-node rows
    co-partition with edges by hash(u) then hash(v), so no node set ever
    sits at the driver. The shrinking edge set is materialized once per
    round — it is the iteration's working state (the pagerank lesson:
    without pinning, lazy fan-out re-executes the whole upstream chain per
    consumer). Returns a Dataset (node, degree)."""
    import ray.data as rd

    n_parts = (
        _next_pow2(int(num_partitions))
        if num_partitions is not None
        else _ccf_parts()
    )
    out_schema = pa.schema([("node", pa.int64()), ("degree", pa.int64())])

    cur = (
        _canon_edges(edges, a, b, n_parts)
        .map_batches(
            lambda t: t.select(["u", "v"])
            if t.num_columns >= 2
            else pa.table(
                {"u": np.zeros(0, np.int64), "v": np.zeros(0, np.int64)}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def deg_partials(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
            ]
        )
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": (hash64(un) & np.uint64(n_parts - 1)).astype(np.int32),
                "node": un,
                "c": cnt.astype(np.int64),
            }
        )

    def deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "degree": pd.Series(dtype="int64")}
            )
        s = g.groupby("node", sort=False)["c"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy(np.int64),
             "degree": s.to_numpy(np.int64)}
        )

    def degrees(es):
        return (
            es.map_batches(deg_partials, batch_format="pyarrow")
            .groupby("part")
            .map_groups(deg_reduce, batch_format="pandas")
        )

    def filt(which: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            ed = g[g["kind"] == 0]
            if len(ed) == 0:
                return pd.DataFrame(
                    {"part": pd.Series(dtype="int32"),
                     "kind": pd.Series(dtype="int8"),
                     "lo": pd.Series(dtype="int64"),
                     "hi": pd.Series(dtype="int64")}
                )
            dead = g.loc[g["kind"] == 1, "lo"].to_numpy(np.int64)
            dead = np.unique(dead)
            u = ed["lo"].to_numpy(np.int64)
            v = ed["hi"].to_numpy(np.int64)
            key = u if which == "u" else v
            if len(dead):
                pos = np.searchsorted(dead, key)
                pos_c = np.minimum(pos, len(dead) - 1)
                alive = dead[pos_c] != key
                u, v = u[alive], v[alive]
            nxt = v if which == "u" else u  # re-route by the other endpoint
            return pd.DataFrame(
                {
                    "part": (hash64(nxt) & np.uint64(n_parts - 1)).astype(
                        np.int32
                    ) if which == "u" else (
                        hash64(u) & np.uint64(n_parts - 1)
                    ).astype(np.int32),
                    "kind": np.zeros(len(u), np.int8),
                    "lo": u,
                    "hi": v,
                }
            )

        return f

    for _ in range(rounds):
        deg = degrees(cur).materialize()
        dead_rows = deg.map_batches(
            lambda t: pa.table(
                {
                    "part": pc.cast(
                        pa.array(
                            (
                                hash64(
                                    t["node"].to_numpy(zero_copy_only=False)
                                )
                                & np.uint64(n_parts - 1)
                            ).astype(np.int32)
                        ),
                        pa.int32(),
                    ),
                    "kind": pa.array(
                        np.ones(t.num_rows, np.int8), pa.int8()
                    ),
                    "lo": pc.cast(t["node"], pa.int64()),
                    "hi": pa.array(np.zeros(t.num_rows, np.int64)),
                }
            ).filter(pc.less(t["degree"], k)),
            batch_format="pyarrow",
        ).materialize()
        if dead_rows.count() == 0:
            break  # converged; remaining rounds are no-ops

        def edge_rows_by_u(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "part": (hash64(u) & np.uint64(n_parts - 1)).astype(
                        np.int32
                    ),
                    "kind": np.zeros(len(u), np.int8),
                    "lo": u,
                    "hi": v,
                },
                schema=_KC_SCHEMA,
            )

        stage1 = (
            cur.map_batches(edge_rows_by_u, batch_format="pyarrow")
            .union(dead_rows)
            .groupby("part")
            .map_groups(filt("u"), batch_format="pandas")
            .map_batches(
                lambda t: t.cast(_KC_SCHEMA)
                if t.num_columns
                else _KC_SCHEMA.empty_table(),
                batch_format="pyarrow",
            )
        )
        cur = (
            stage1.union(dead_rows)
            .groupby("part")
            .map_groups(filt("v"), batch_format="pandas")
            .map_batches(
                lambda t: pa.table(
                    {"u": t["lo"], "v": t["hi"]}
                ).cast(
                    pa.schema([("u", pa.int64()), ("v", pa.int64())])
                )
                if t.num_columns
                else pa.schema(
                    [("u", pa.int64()), ("v", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            )
            # block-count pinning (the pagerank lesson): union+map_groups
            # grow the block list ~3x per round (measured 351 -> 1053 at
            # 1M rows) and exchange sort time tracks block count — one
            # repartition per round keeps it flat
            .repartition(min(n_parts, 64))
            .materialize()
        )

    final = degrees(cur).map_batches(
        lambda t: t.select(["node", "degree"]).cast(out_schema)
        if t.num_columns
        else out_schema.empty_table(),
        batch_format="pyarrow",
    )
    return rd.from_arrow(out_schema.empty_table()).union(final)
