"""Mergeable streaming sketches: HyperLogLog (distinct count), KLL and
DDSketch (quantiles), Misra-Gries (heavy hitters).

Built from the published algorithms only:
- HLL: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  cardinality estimation algorithm" (AofA 2007), with the standard
  small-range linear-counting correction.
- KLL: Karnin, Lang, Liberty, "Optimal Quantile Approximation in Streams"
  (FOCS 2016) — compactor hierarchy with exponentially decaying capacities.
- DDSketch: Masson, Rim, Lee, "DDSketch: A Fast and Fully-Mergeable Quantile
  Sketch with Relative-Error Guarantees" (VLDB 2019) — log-spaced buckets
  whose index is a PURE FUNCTION of the value, so the sketch state depends
  only on the input MULTISET: invariant to batch splits, input order and
  merge-tree shape (KLL is only merge-ORDER deterministic). This is what
  makes the report's quantiles_approx section input-deterministic.

All are:
- mergeable (partial per batch → merge in aggregator actors → final merge at
  the driver; this is the no-shuffle aggregation path for column stats,
  SURVEY.md §2.5 A7),
- deterministic (HLL exactly; KLL via a counter-seeded compaction offset, so
  the same inputs in the same merge order give the same sketch — resume
  recomputes from persisted per-partition sketches in sorted partition order),
- serializable to bytes (actor-restart-safe, checkpointable).

Reference analog: the reference's only aggregation state is the IssueSet dict
and distribution count queries (extraction/IssueSet.py:4-32,
extraction/main.py:270-293); sketches are the scale path for the same
"describe this column" intent at 10^12 rows.
"""

from __future__ import annotations

import pickle

import numpy as np


class HLL:
    """Dense HyperLogLog over uint64 hashes. p=12 → 4096 registers, ~1.6% rse."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # top 64-p bits of the remainder, left-aligned
        # rho = leading zeros of `rest` + 1 (capped when rest == 0)
        nz = rest != 0
        rho = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            # log2 of a left-aligned uint64: values ≥ 2^(63-52) keep exact
            # leading-bit position under float64 (mantissa only matters for
            # floor(log2), which needs the top bit — always exact here)
            top = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
            # clip guards the float64 round-up at 2^k boundaries (e.g. 2^64-1
            # rounds to 2^64 → top=64): worst case rho off by one, never <1
            rho[nz] = np.clip(63 - top + 1, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HLL":
        p = b[0]
        return HLL(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


class KLL:
    """KLL quantile sketch over float64 values.

    Compactor at level i holds items of weight 2^i; when a level exceeds its
    capacity it sorts and keeps every other item (offset alternating via a
    deterministic counter), promoting survivors one level up. k=200 →
    ~1.3% rank error at 99% confidence per the KLL paper's constants.
    """

    __slots__ = ("k", "compactors", "n", "_compactions")

    def __init__(self, k: int = 200):
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._compactions = 0

    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        depth = height - level - 1
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    def add_values(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.compactors[0].extend(v.tolist())
        self.n += len(v)
        self._compress()
        return self

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for level in range(len(self.compactors)):
                if len(self.compactors[level]) > self._capacity(level):
                    if level + 1 == len(self.compactors):
                        self.compactors.append([])
                    items = sorted(self.compactors[level])
                    offset = self._compactions & 1
                    self._compactions += 1
                    self.compactors[level + 1].extend(items[offset::2])
                    self.compactors[level] = []
                    break
            else:
                break

    def merge(self, other: "KLL") -> "KLL":
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
        for i, c in enumerate(other.compactors):
            self.compactors[i].extend(c)
        self.n += other.n
        self._compactions += other._compactions
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for level, c in enumerate(self.compactors):
            vals.extend(c)
            wts.extend([1 << level] * len(c))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(wts, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        v, w = self._weighted()
        cw = np.cumsum(w)
        target = q * cw[-1]
        ix = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(ix, len(v) - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        """Estimated fraction of items ≤ x (used by the KS drift test)."""
        if self.n == 0:
            return 0.0
        v, w = self._weighted()
        ix = int(np.searchsorted(v, x, side="right"))
        return float(np.sum(w[:ix]) / np.sum(w))

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            (self.k, self.n, self._compactions, [np.asarray(c) for c in self.compactors]),
            protocol=4,
        )

    @staticmethod
    def from_bytes(b: bytes) -> "KLL":
        k, n, comps, arrays = pickle.loads(b)
        s = KLL(k)
        s.n = n
        s._compactions = comps
        s.compactors = [list(map(float, a)) for a in arrays]
        return s

class DDSketch:
    """Relative-error quantile sketch with split/order/merge-shape-invariant
    state (Masson et al., VLDB 2019, the unbounded-store variant).

    Bucket index of a value v>0 is ceil(log(v)/log(gamma)) with
    gamma=(1+alpha)/(1-alpha); the bucket midpoint 2*gamma^k/(gamma+1)
    reconstructs v within relative error alpha. Zero and negative values get
    an exact zero counter and a mirrored negative store. Because the index is
    a pure function of the value, two sketches built from the same multiset
    of values are IDENTICAL (bucket-count dicts), however the values were
    batched, ordered, or merged — unlike KLL, whose compaction history
    depends on batch boundaries. Serialization is canonical (key-sorted), so
    equal sketches have equal bytes.

    No bucket collapsing: at alpha=0.01 the entire float64 range spans
    ~75k buckets (ln-range ±745 / ln(gamma)≈0.02) and real columns span a few
    hundred, so the paper's lowest-bucket collapse — which would reintroduce
    order dependence — is deliberately omitted; worst-case memory is ~1.2 MB.
    """

    __slots__ = ("alpha", "_inv_log_gamma", "_log_gamma", "pos", "neg", "zero", "n")

    # key clip bound: covers every finite float64 (|key| < 40000 at
    # alpha=0.01) while mapping ±inf to finite sentinel buckets
    _KEY_CLIP = 1 << 30

    def __init__(self, alpha: float = 0.01):
        self.alpha = alpha
        gamma = (1.0 + alpha) / (1.0 - alpha)
        self._log_gamma = float(np.log(gamma))
        self._inv_log_gamma = 1.0 / self._log_gamma
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero = 0
        self.n = 0

    def _keys_of(self, mag: np.ndarray) -> np.ndarray:
        # The quantiles_nchars hash-exact oracle replays this exact formula
        # in DuckDB SQL; it holds only while numpy and DuckDB resolve
        # ln/exp/ceil to the same libm (see __ray_entry__.py oracle note).
        raw = np.ceil(np.log(mag) * self._inv_log_gamma)
        return np.clip(raw, -self._KEY_CLIP, self._KEY_CLIP).astype(np.int64)

    def add_values(self, values: np.ndarray) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.zero += int(np.count_nonzero(v == 0.0))
        for store, mag in ((self.pos, v[v > 0]), (self.neg, -v[v < 0])):
            if len(mag):
                keys, counts = np.unique(self._keys_of(mag), return_counts=True)
                for k, c in zip(keys.tolist(), counts.tolist()):
                    store[k] = store.get(k, 0) + c
        return self

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert self.alpha == other.alpha
        for mine, theirs in ((self.pos, other.pos), (self.neg, other.neg)):
            for k, c in theirs.items():
                mine[k] = mine.get(k, 0) + c
        self.zero += other.zero
        self.n += other.n
        return self

    def _value_of(self, key: int) -> float:
        # midpoint of (gamma^(k-1), gamma^k]; exp-form avoids gamma**k overflow
        return 2.0 * np.exp(key * self._log_gamma) / (np.exp(self._log_gamma) + 1.0)

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        rank = q * (self.n - 1)
        cum = 0
        # ascending value order: most-negative first = descending |key| in neg
        for k in sorted(self.neg, reverse=True):
            cum += self.neg[k]
            if cum > rank:
                return -self._value_of(k)
        cum += self.zero
        if cum > rank:
            return 0.0
        for k in sorted(self.pos):
            cum += self.pos[k]
            if cum > rank:
                return self._value_of(k)
        # rank == n-1 falls through on float round-up: max bucket
        return self._value_of(max(self.pos)) if self.pos else 0.0

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def to_bytes(self) -> bytes:
        def pack(store: dict[int, int]) -> np.ndarray:
            items = sorted(store.items())
            return np.asarray(items, dtype=np.int64).reshape(-1, 2)

        return pickle.dumps(
            (self.alpha, self.zero, self.n, pack(self.pos), pack(self.neg)),
            protocol=4,
        )

    @staticmethod
    def from_bytes(b: bytes) -> "DDSketch":
        alpha, zero, n, pos, neg = pickle.loads(b)
        s = DDSketch(alpha)
        s.zero, s.n = zero, n
        s.pos = {int(k): int(c) for k, c in pos}
        s.neg = {int(k): int(c) for k, c in neg}
        return s


def mg_truncate(keys: np.ndarray, counts: np.ndarray, k: int):
    """Bulk Misra-Gries step: combine duplicate keys, then — if more than k
    survive — subtract the (k+1)-th largest combined count from every
    counter and drop the non-positives (at most k counters can strictly
    exceed the (k+1)-th largest, so ≤ k remain). Returns
    (keys, counts, decrement). Deterministic: the kept set and counts are
    pure functions of the input multiset."""
    if len(keys) == 0:
        return keys, counts.astype(np.int64, copy=False), 0
    order = np.argsort(keys, kind="stable")
    ks, cs = keys[order], counts[order].astype(np.int64, copy=False)
    first = np.empty(len(ks), dtype=bool)
    first[0] = True
    first[1:] = ks[1:] != ks[:-1]
    idx = np.flatnonzero(first)
    sums = np.add.reduceat(cs, idx)
    uk = ks[idx]
    if len(uk) <= k:
        return uk, sums, 0
    kth = np.partition(sums, -(k + 1))[-(k + 1)]  # (k+1)-th largest
    keep = sums > kth
    return uk[keep], sums[keep] - kth, int(kth)


class MG:
    """Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable
    form per Agarwal et al., "Mergeable Summaries", PODS 2012 §3): at most
    k counters; after ANY merge tree over a weight-W stream, every kept
    estimate satisfies  true - W/(k+1) <= est <= true,  and every key with
    true count > W/(k+1) is PRESENT. That containment guarantee is what the
    two-pass exact heavy-hitters pipeline relies on: pass 1 merges MG
    partials into a ≤ k candidate superset, pass 2 re-counts only the
    candidates exactly — so the final output is exact even though the
    sketch is lossy. Tracks the exact total weight `n` alongside."""

    __slots__ = ("k", "keys", "counts", "n")

    def __init__(self, k: int = 4096):
        self.k = k
        self.keys = np.empty(0, dtype=object)
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0

    def add_counts(self, keys: np.ndarray, counts: np.ndarray) -> "MG":
        self.n += int(np.sum(counts)) if len(counts) else 0
        self.keys, self.counts, _ = mg_truncate(
            np.concatenate([self.keys, np.asarray(keys, dtype=object)]),
            np.concatenate(
                [self.counts, np.asarray(counts, dtype=np.int64)]
            ),
            self.k,
        )
        return self

    def merge(self, other: "MG") -> "MG":
        self.n += other.n
        n = self.n  # add_counts re-adds other's kept weight; restore after
        self.add_counts(other.keys, other.counts)
        self.n = n
        return self

    def candidates(self) -> np.ndarray:
        return self.keys

    def estimate(self, key) -> int:
        hit = np.flatnonzero(self.keys == key)
        return int(self.counts[hit[0]]) if len(hit) else 0

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.keys, self.counts, self.n))

    @staticmethod
    def from_bytes(b: bytes) -> "MG":
        k, keys, counts, n = pickle.loads(b)
        mg = MG(k)
        mg.keys, mg.counts, mg.n = keys, counts, n
        return mg


class Bloom:
    """Bloom filter (Bloom 1970) over uint64 key hashes, with
    Kirsch–Mitzenmacher double hashing (probe_i = h1 + i·h2, h2 forced odd)
    so k probes derive from one hash pass. `n_bits` must be a power of two
    (probes mask, not mod). Mergeable by bitwise OR — partial blooms built
    on different batches/nodes union exactly — and serializable, so it
    follows the same partial→merge→broadcast lifecycle as HLL/KLL/MG.

    Guarantee: NO false negatives (contains_hashes is True for every added
    hash); false-positive rate ≈ (1 − e^{−k·n/m})^k for n items in m bits.
    size_for() picks (m, k) for a target rate."""

    def __init__(self, n_bits: int, k: int, words: np.ndarray | None = None):
        if n_bits <= 0 or (n_bits & (n_bits - 1)) != 0 or n_bits % 64:
            raise ValueError(f"n_bits must be a power of two >= 64: {n_bits}")
        if not 1 <= k <= 16:
            raise ValueError(f"k must be in [1, 16]: {k}")
        self.n_bits = n_bits
        self.k = k
        self.words = (
            words
            if words is not None
            else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    def _probes(self, h: np.ndarray, i: int) -> np.ndarray:
        from fdpg_query_data_validation_ray.functions.hashing import mix64

        h = np.asarray(h, dtype=np.uint64)
        h2 = mix64(h) | np.uint64(1)
        return (h + np.uint64(i) * h2) & np.uint64(self.n_bits - 1)

    # bool-scatter fast path bound: a transient n_bits-byte buffer per call.
    # 2^31 bits → 256 MB; above that fall back to the in-place scatter-OR
    # (unbuffered ufunc.at — ~20× slower per probe but O(words) memory).
    _BOOL_PATH_MAX_BITS = 1 << 31

    def add_hashes(self, h: np.ndarray) -> "Bloom":
        h = np.asarray(h, dtype=np.uint64)
        if self.n_bits <= self._BOOL_PATH_MAX_BITS:
            # scatter constant True into a bool plane (buffered stores,
            # duplicate indices harmless), then packbits → uint64 words.
            # bitorder='little' + little-endian view keeps bit j of word w
            # at plane index 64w+j, matching contains_hashes' idx&63 probe.
            bits = np.zeros(self.n_bits, dtype=bool)
            for i in range(self.k):
                bits[self._probes(h, i).astype(np.int64)] = True
            packed = np.packbits(bits, bitorder="little")
            np.bitwise_or(
                self.words, packed.view(np.uint64), out=self.words
            )
            return self
        for i in range(self.k):
            idx = self._probes(h, i)
            np.bitwise_or.at(
                self.words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            idx = self._probes(h, i)
            bit = (
                self.words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))
            ) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        if other.n_bits != self.n_bits or other.k != self.k:
            raise ValueError("cannot merge blooms with different (n_bits, k)")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.n_bits, self.k, self.words.tobytes()))

    @staticmethod
    def from_bytes(b: bytes) -> "Bloom":
        n_bits, k, raw = pickle.loads(b)
        return Bloom(n_bits, k, np.frombuffer(raw, dtype=np.uint64).copy())

    @staticmethod
    def size_for(n_items: int, fp_rate: float) -> tuple[int, int]:
        """(n_bits rounded up to a power of two, k) for a target FP rate:
        m = −n·ln p / ln²2, k = (m/n)·ln 2 — the standard optimum."""
        if not 0.0 < fp_rate < 1.0 or n_items <= 0:
            raise ValueError(f"need n_items > 0, 0 < fp_rate < 1")
        m = -n_items * np.log(fp_rate) / (np.log(2.0) ** 2)
        n_bits = 1 << max(6, int(np.ceil(np.log2(m))))
        k = max(1, min(16, round(n_bits / n_items * np.log(2.0))))
        return n_bits, int(k)
