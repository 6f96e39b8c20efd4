"""Mergeable streaming sketches: HyperLogLog (distinct count) and KLL (quantiles).

Built from the published algorithms only:
- HLL: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  cardinality estimation algorithm" (AofA 2007), with the standard
  small-range linear-counting correction.
- KLL: Karnin, Lang, Liberty, "Optimal Quantile Approximation in Streams"
  (FOCS 2016) — compactor hierarchy with exponentially decaying capacities.

Both are:
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
