"""Mergeable sketches, pure numpy/stdlib (SURVEY.md §7.5 — datasketch/
tdigest/scipy are not installed in the sealed sandbox, so these are
from-scratch implementations of the published algorithms):

- ``HLL``       — dense HyperLogLog, p=14 (16384 registers, ~1.3% rel
                  err), per the Flajolet et al. HLL paper with the
                  small-range (linear counting) correction.
- ``TDigest``   — Dunning's merging t-digest, k1 scale function,
                  compression δ=200; quantile + CDF queries (CDF is
                  needed for the KS drift statistic).
- ``Histogram`` — fixed-bin histogram; bins are FROZEN in the baseline
                  profile so PSI comparisons always align (FIXTURES §4).

Every sketch supports: update (vectorized), merge (associative +
commutative — required for parallelism-invariant results, SURVEY §4.3),
serialize/deserialize (bytes payloads carried through Arrow binary
columns between partial and final aggregation stages).

Exact twins (§5.3 duality) live in vald.aggregates; never
oracle-compare a sketch.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["HLL", "TDigest", "Histogram", "hash64_values"]

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash64_values(values) -> np.ndarray:
    """Stable uint64 hashes for HLL input — pandas fixed-key siphash
    via vald.hashing for strings/objects, bit-mixed for numerics."""
    from . import hashing

    arr = np.asarray(values)
    if arr.dtype.kind in "iuf":
        x = arr.astype(np.float64).view(np.uint64).copy()
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD) & _M64
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53) & _M64
            return x ^ (x >> np.uint64(33))
    return hashing.stable_hash64(values)


class HLL:
    """Dense HyperLogLog distinct-count sketch."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.reg = (
            registers
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)) & _M64
        # vectorized count-leading-zeros (exact integer ops, 6 passes)
        clz = np.zeros(len(w), dtype=np.uint8)
        x = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - s))
            clz[mask] += s
            x[mask] = (x[mask] << np.uint64(s)) & _M64
        rank = np.minimum(clz.astype(np.uint8) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)
        return self

    def update(self, values) -> "HLL":
        return self.update_hashes(hash64_values(values))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)  # p >= 7
        inv = np.exp2(-self.reg.astype(np.float64))
        E = alpha * m * m / inv.sum()
        if E <= 2.5 * m:
            zeros = int((self.reg == 0).sum())
            if zeros:
                E = m * math.log(m / zeros)  # linear counting
        return float(E)

    def serialize(self) -> bytes:
        return struct.pack("<B", self.p) + self.reg.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HLL":
        p = struct.unpack_from("<B", b)[0]
        reg = np.frombuffer(b, dtype=np.uint8, offset=1).copy()
        return cls(p=p, registers=reg)


class TDigest:
    """Merging t-digest (Dunning), k1 scale: k(q) = δ/2π · asin(2q−1)."""

    def __init__(self, compression: float = 200.0):
        self.delta = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_m: list[float] = []
        self._buf_w: list[float] = []

    # --- updates ---
    def update(self, values, weights=None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        w = np.ones(len(v)) if weights is None else np.asarray(weights, dtype=np.float64)
        self._buf_m.extend(v.tolist())
        self._buf_w.extend(w.tolist())
        if len(self._buf_m) > 8192:
            self._flush()
        return self

    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.delta / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _flush(self) -> None:
        if not self._buf_m:
            return
        means = np.concatenate([self.means, np.asarray(self._buf_m)])
        weights = np.concatenate([self.weights, np.asarray(self._buf_w)])
        self._buf_m, self._buf_w = [], []
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        W = weights.sum()
        new_m: list[float] = []
        new_w: list[float] = []
        cum = 0.0  # weight before current centroid
        cur_m, cur_w = means[0], weights[0]
        for i in range(1, len(means)):
            q0 = cum / W
            q_new = (cum + cur_w + weights[i]) / W
            if self._k(q_new) - self._k(q0) <= 1.0:
                tot = cur_w + weights[i]
                cur_m += (means[i] - cur_m) * weights[i] / tot
                cur_w = tot
            else:
                new_m.append(cur_m)
                new_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = means[i], weights[i]
        new_m.append(cur_m)
        new_w.append(cur_w)
        self.means = np.asarray(new_m)
        self.weights = np.asarray(new_w)

    def merge(self, other: "TDigest") -> "TDigest":
        other._flush()
        if len(other.means):
            self.update(other.means, other.weights)
        self._flush()
        return self

    # --- queries ---
    @property
    def total_weight(self) -> float:
        self._flush()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        self._flush()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        W = w.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2
        target = q * W
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def cdf(self, x: float) -> float:
        self._flush()
        if len(self.means) == 0:
            return float("nan")
        w = self.weights
        W = w.sum()
        cum = np.cumsum(w) - w / 2
        if x <= self.means[0]:
            return 0.0 if x < self.means[0] else float(cum[0] / W)
        if x >= self.means[-1]:
            return 1.0 if x > self.means[-1] else float(cum[-1] / W)
        i = np.searchsorted(self.means, x, side="right") - 1
        i = min(i, len(self.means) - 2)
        span = self.means[i + 1] - self.means[i]
        frac = 0.5 if span == 0 else (x - self.means[i]) / span
        return float((cum[i] + frac * (cum[i + 1] - cum[i])) / W)

    def serialize(self) -> bytes:
        self._flush()
        n = len(self.means)
        return (
            struct.pack("<dI", self.delta, n)
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def deserialize(cls, b: bytes) -> "TDigest":
        delta, n = struct.unpack_from("<dI", b)
        td = cls(compression=delta)
        off = struct.calcsize("<dI")
        td.means = np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy()
        td.weights = np.frombuffer(
            b, dtype=np.float64, count=n, offset=off + 8 * n
        ).copy()
        return td


class Histogram:
    """Fixed-bin histogram over [lo, hi] with under/overflow bins."""

    def __init__(self, lo: float, hi: float, nbins: int = 32, counts: np.ndarray | None = None):
        self.lo, self.hi, self.nbins = float(lo), float(hi), int(nbins)
        # counts[0] = underflow, counts[1..nbins] = bins, counts[-1] = overflow
        self.counts = (
            counts if counts is not None else np.zeros(nbins + 2, dtype=np.int64)
        )

    def update(self, values) -> "Histogram":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        span = self.hi - self.lo or 1.0
        idx = np.floor((v - self.lo) / span * self.nbins).astype(np.int64) + 1
        idx = np.clip(idx, 0, self.nbins + 1)
        np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "Histogram") -> "Histogram":
        assert (self.lo, self.hi, self.nbins) == (other.lo, other.hi, other.nbins)
        self.counts += other.counts
        return self

    def probs(self, eps: float = 1e-6) -> np.ndarray:
        """ε-floored bin probabilities (for PSI)."""
        total = self.counts.sum()
        if total == 0:
            return np.full(len(self.counts), 1.0 / len(self.counts))
        p = self.counts / total
        return np.clip(p, eps, None)

    def psi(self, other: "Histogram", eps: float = 1e-6) -> float:
        """Population Stability Index vs another histogram with the SAME
        frozen bins: Σ (p−q)·ln(p/q)."""
        p, q = self.probs(eps), other.probs(eps)
        return float(np.sum((p - q) * np.log(p / q)))

    def serialize(self) -> bytes:
        return (
            struct.pack("<ddI", self.lo, self.hi, self.nbins) + self.counts.tobytes()
        )

    @classmethod
    def deserialize(cls, b: bytes) -> "Histogram":
        lo, hi, nbins = struct.unpack_from("<ddI", b)
        off = struct.calcsize("<ddI")
        counts = np.frombuffer(b, dtype=np.int64, count=nbins + 2, offset=off).copy()
        return cls(lo, hi, nbins, counts)


def ks_statistic(a: TDigest, b: TDigest, grid_points: int = 256) -> float:
    """Two-sample KS statistic approximated on a merged quantile grid
    from the two t-digests (SURVEY.md §7.5): max |CDF_a − CDF_b|."""
    qs = np.linspace(0.002, 0.998, grid_points)
    xs = np.unique(
        np.concatenate([[a.quantile(q) for q in qs], [b.quantile(q) for q in qs]])
    )
    xs = xs[~np.isnan(xs)]
    if len(xs) == 0:
        return 0.0
    gaps = [abs(a.cdf(x) - b.cdf(x)) for x in xs]
    return float(max(gaps))
