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
