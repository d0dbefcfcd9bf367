"""Cardinality / frequency sketches: HyperLogLog and Count-Min.

The north rule frames this engine as a "distributed sketch /
approximate-aggregation library ... as mergeable UDAFs"; alongside the AMQ
filters these two round out the classic mergeable-sketch family:

- **HyperLogLog** (Flajolet et al. 2007, with the HLL++ small-range linear
  counting correction): 2^p uint8 registers, merge = elementwise max,
  standard error ≈ 1.04/sqrt(2^p).
- **Count-Min** (Cormode & Muthukrishnan 2005): depth×width int64 counters,
  point estimate = min over rows (one-sided: est ≥ true, est ≤ true + εN
  w.h.p.), merge = elementwise add.
- **Quantiles**: :class:`BottomKQuantile` (KMV sample), :class:`KLLSketch`
  (uniform rank band), and :class:`TDigest` (asin-scale merging digest —
  tight EXTREME quantiles); the north rule names KLL and t-digest
  explicitly.
- **MisraGries**: deterministic heavy-hitter superset with a one-sided
  undercount bound (drives the exact two-pass heavy-hitter pipeline).

Both follow the engine's distributed-merge discipline (SURVEY.md §4.3.1):
explicit shared seeds, no process-local randomness, vectorized adds.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED, mix_split

U64 = np.uint64


class HyperLogLog:
    """Dense HLL over uint64 keys (p ∈ [4, 18])."""

    KIND = "hll"

    __slots__ = ("p", "m", "seed", "registers")

    def __init__(self, p: int = 12, seed: int = DEFAULT_SEED):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_batch(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        h = mix_split(keys, self.seed)
        j = (h >> U64(64 - self.p)).astype(np.int64)
        w = h & U64((1 << (64 - self.p)) - 1)
        # rho = position of the leftmost 1-bit of w within 64-p bits, 1-based;
        # w fits 64-p ≤ 60 bits — too wide for exact float log2, so split:
        # high 32 bits first, low 32 as fallback (each ≤ 2^32 is float-exact)
        q = 64 - self.p
        hi = (w >> U64(32)).astype(np.float64)
        lo = (w & U64(0xFFFFFFFF)).astype(np.float64)
        msb = np.where(
            hi > 0, 32 + np.floor(np.log2(np.maximum(hi, 1.0))),
            np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1.0))), -1.0))
        rho = (q - msb).astype(np.int64)          # w==0 → q+1
        np.maximum.at(self.registers, j, np.minimum(rho, 255).astype(np.uint8))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.seed) != (other.p, other.seed):
            raise ValueError("HLL merge requires identical (p, seed)")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
            self.m, 0.7213 / (1 + 1.079 / m))
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:                       # small-range linear counting
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return float(e)

    def rel_error_bound(self, sigmas: float = 3.0) -> float:
        return sigmas * 1.04 / np.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int, seed: int) -> "HyperLogLog":
        h = cls(p=p, seed=seed)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


class BottomKQuantile:
    """Mergeable quantile sketch: a bottom-k (KMV) uniform row sample.

    Each row gets priority ``mix_split(uid, seed)``; the sketch keeps the k
    pairs with smallest priority.  Merge = bottom-k of the union —
    associative, commutative and idempotent, so it composes as a UDAF like
    the other sketches.  Quantile estimates are sample quantiles with rank
    error O(1/sqrt(k)); the k-th smallest priority also yields a KMV
    distinct-count estimate for free.
    """

    KIND = "bottomk"

    __slots__ = ("k", "seed", "prio", "vals")

    def __init__(self, k: int = 4096, seed: int = DEFAULT_SEED):
        self.k = int(k)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.prio = np.empty(0, dtype=np.uint64)
        self.vals = np.empty(0, dtype=np.float64)

    def _trim(self) -> None:
        if len(self.prio) > self.k:
            keep = np.argpartition(self.prio, self.k - 1)[:self.k]
            self.prio = self.prio[keep]
            self.vals = self.vals[keep]

    def add_batch(self, uids, values) -> None:
        uids = np.asarray(uids, dtype=np.uint64)
        if len(uids) == 0:
            return
        p = mix_split(uids, self.seed)
        self.prio = np.concatenate([self.prio, p])
        self.vals = np.concatenate(
            [self.vals, np.asarray(values, dtype=np.float64)])
        self._trim()

    def merge(self, other: "BottomKQuantile") -> "BottomKQuantile":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("bottom-k merge requires identical (k, seed)")
        self.prio = np.concatenate([self.prio, other.prio])
        self.vals = np.concatenate([self.vals, other.vals])
        self._trim()
        return self

    def quantile(self, q) -> np.ndarray:
        if len(self.vals) == 0:
            return np.full(np.shape(q), np.nan)
        return np.quantile(self.vals, q)

    def rank_error_bound(self, sigmas: float = 3.0) -> float:
        """Rank error of a sample quantile: ~sigmas·sqrt(q(1-q)/k) ≤ that at
        q=0.5."""
        return sigmas * 0.5 / np.sqrt(max(1, min(self.k, len(self.vals))))

    def distinct_estimate(self) -> float:
        """KMV: (k-1) / max_kept_priority (normalized)."""
        if len(self.prio) < self.k:
            return float(len(np.unique(self.prio)))
        return (self.k - 1) / (float(self.prio.max()) / float(2**64))

    def to_bytes(self) -> bytes:
        return len(self.prio).to_bytes(8, "little") + \
            self.prio.tobytes() + self.vals.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int, seed: int) -> "BottomKQuantile":
        s = cls(k=k, seed=seed)
        n = int.from_bytes(data[:8], "little")
        s.prio = np.frombuffer(data[8:8 + 8 * n], dtype=np.uint64).copy()
        s.vals = np.frombuffer(data[8 + 8 * n:8 + 16 * n], dtype=np.float64).copy()
        return s


class KLLSketch:
    """Mergeable KLL quantile sketch (Karnin–Lall–Liberty, FOCS 2016).

    Levels of compactors; an item at level i carries weight 2^i.  Level
    capacities shrink geometrically from the TOP level with c = 2/3 (the
    paper's recommended constant), floored at 8.  A level at capacity
    sorts, keeps every other item (seeded coin picks the even/odd offset,
    so weight is conserved in expectation) and promotes the survivors one
    level up; the rest are discarded — that is the lossy step.  Normalized
    rank error is ~2.3/k^0.9 w.h.p. (the Apache DataSketches calibration
    of the paper's O(1/k) bound).  Merge concatenates per-level buffers
    then re-compacts — valid under ANY merge tree, which is what makes it
    a UDAF like the engine's other sketches.  Built from the public paper
    + DataSketches documentation only.
    """

    KIND = "kll"

    #: geometric capacity decay (paper's c) and smallest compactor
    C = 2.0 / 3.0
    MINCAP = 8

    __slots__ = ("k", "seed", "levels", "_nc")

    def __init__(self, k: int = 256, seed: int = DEFAULT_SEED):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._nc = 0                    # compaction counter → coin stream

    # ------------------------------------------------------------ internals

    def _cap(self, lev: int, nlevels: int) -> int:
        return max(self.MINCAP,
                   int(np.ceil(self.k * self.C ** (nlevels - 1 - lev))))

    def _coin(self) -> int:
        from .hashing import splitmix64
        b = int(splitmix64(1, seed=(self.seed ^ 0x6B11) + self._nc)[0]) & 1
        self._nc += 1
        return b

    def _compress(self) -> None:
        while True:
            nl = len(self.levels)
            total = sum(len(b) for b in self.levels)
            capacity = sum(self._cap(i, nl) for i in range(nl))
            if total <= capacity:
                return
            for i in range(nl):
                if len(self.levels[i]) >= self._cap(i, nl):
                    srt = np.sort(self.levels[i])
                    promoted = srt[self._coin()::2]
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], promoted])
                    break
            else:
                return                  # over budget but no full level

    # ----------------------------------------------------------------- adds

    def add_batch(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        # feed level 0 in LARGE slices (64 compactor widths): compaction
        # error is per-compaction (±w_i/2 each), so fewer, bigger level-0
        # compactions are both faster (1.4 → 25 M values/s at k=256; the
        # Python-level while loop runs 64x less) and tighter (measured
        # rank errors shrink ~4x) — the buffered bulk-update form
        step = max(64 * self.k, self.MINCAP)
        for s in range(0, len(vals), step):
            self.levels[0] = np.concatenate([self.levels[0],
                                             vals[s:s + step]])
            self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("KLL merge requires identical (k, seed)")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self._nc = max(self._nc, other._nc)   # keep coin streams divergent
        self._compress()
        return self

    # ---------------------------------------------------------------- query

    def total_weight(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantile(self, q) -> np.ndarray:
        """Smallest stored value whose cumulative weight reaches q·W."""
        vals = np.concatenate(self.levels) if self.levels else \
            np.empty(0, dtype=np.float64)
        if len(vals) == 0:
            return np.full(np.shape(q), np.nan)
        wts = np.concatenate([np.full(len(b), 1 << i, dtype=np.int64)
                              for i, b in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vs, cw = vals[order], np.cumsum(wts[order])
        target = np.asarray(q, dtype=np.float64) * cw[-1]
        pos = np.minimum(np.searchsorted(cw, target, side="left"),
                         len(vs) - 1)
        return vs[pos] if np.ndim(q) else float(vs[int(pos)])

    def rank_error_bound(self) -> float:
        """Normalized rank error at high confidence — the DataSketches
        calibration eps ≈ 2.296/k^0.9, doubled for margin (merge trees in a
        distributed aggregate are deeper than the calibration's stream)."""
        return 2.0 * 2.296 / (self.k ** 0.9)

    # ----------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        lens = np.array([len(b) for b in self.levels], dtype=np.int64)
        return (len(self.levels).to_bytes(4, "little") +
                int(self._nc).to_bytes(8, "little") + lens.tobytes() +
                np.concatenate(self.levels).tobytes())

    @classmethod
    def from_bytes(cls, data: bytes, k: int, seed: int) -> "KLLSketch":
        s = cls(k=k, seed=seed)
        if not data:
            return s
        nl = int.from_bytes(data[:4], "little")
        s._nc = int.from_bytes(data[4:12], "little")
        lens = np.frombuffer(data[12:12 + 8 * nl], dtype=np.int64)
        flat = np.frombuffer(data[12 + 8 * nl:], dtype=np.float64)
        s.levels, off = [], 0
        for n in lens:
            s.levels.append(flat[off:off + int(n)].copy())
            off += int(n)
        return s


class CountMin:
    """Count-Min frequency sketch over uint64 keys."""

    KIND = "countmin"

    __slots__ = ("depth", "width", "seed", "counts", "total")

    def __init__(self, depth: int = 5, width: int = 2048,
                 seed: int = DEFAULT_SEED):
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) column indices, one seeded hash row each."""
        return np.stack([
            (mix_split(keys, self.seed + 0x9E37 * (d + 1))
             & U64(self.width - 1)).astype(np.int64)
            for d in range(self.depth)])

    def add_batch(self, keys, weights=None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        cols = self._cols(keys)
        if weights is None:
            # bincount is the buffered form of np.add.at (~60x at 2 M keys)
            for d in range(self.depth):
                self.counts[d] += np.bincount(cols[d],
                                              minlength=self.width)
            self.total += len(keys)
        else:
            w = np.asarray(weights, dtype=np.int64)
            # bincount's weighted sums are float64: exact while every
            # per-(row, bin) block sum stays < 2^53, which any sane block
            # size satisfies; rounded back to the int64 counters
            for d in range(self.depth):
                self.counts[d] += np.round(np.bincount(
                    cols[d], weights=w.astype(np.float64),
                    minlength=self.width)).astype(np.int64)
            self.total += int(w.sum())

    def estimate_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(keys)
        ests = np.stack([self.counts[d][cols[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.depth, self.width, self.seed) != \
                (other.depth, other.width, other.seed):
            raise ValueError("CountMin merge requires identical (depth, width, seed)")
        self.counts += other.counts
        self.total += other.total
        return self

    def error_bound(self) -> float:
        """ε·N with ε = e/width (overestimate bound w.p. ≥ 1 - e^-depth)."""
        return float(np.e / self.width * self.total)

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, depth: int, width: int, seed: int,
                   total: int = 0) -> "CountMin":
        c = cls(depth=depth, width=width, seed=seed)
        c.counts = np.frombuffer(data, dtype=np.int64) \
            .reshape(depth, width).copy()
        c.total = total
        return c


class MisraGries:
    """Misra-Gries frequent-items ("heavy hitters") summary over uint64
    keys, k counters.

    Completes the classic mergeable-summary family next to HLL / Count-Min
    / KLL: after n items, every key with true frequency > n/(k+1) is
    retained, and each retained estimate is one-sided with bounded slack:
    ``est ≤ true ≤ est + offset`` where ``offset`` is the accumulated
    decrement, ``offset ≤ n/(k+1)`` (Misra & Gries 1982).  The merge rule
    — add counters pairwise, subtract the (k+1)-th largest, drop
    non-positives — preserves the same bound over the union (Agarwal et
    al., "Mergeable Summaries", PODS 2012, §3), which is what makes it a
    sound distributed UDAF: block partials combine in any tree shape.

    Vectorized: a batch is folded as its exact (unique, counts) pairs —
    equivalent to item-at-a-time MG with a lazier (never larger) decrement
    schedule, so the same guarantees hold with offset at most the
    item-at-a-time value.
    """

    KIND = "misragries"

    __slots__ = ("k", "keys", "counts", "n", "offset")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = np.zeros(0, dtype=np.uint64)     # sorted ascending
        self.counts = np.zeros(0, dtype=np.int64)
        self.n = 0          # total items folded in
        self.offset = 0     # accumulated decrement (max over-undercount)

    def _fold(self, ukeys: np.ndarray, ucounts: np.ndarray) -> None:
        """Union-sum (ukeys sorted, unique) into the summary, then shrink
        to ≤ k counters by subtracting the (k+1)-th largest count."""
        if len(self.keys):
            allk = np.concatenate([self.keys, ukeys])
            allc = np.concatenate([self.counts, ucounts])
            order = np.argsort(allk, kind="stable")
            allk, allc = allk[order], allc[order]
            bound = np.flatnonzero(np.diff(allk)) + 1
            starts = np.concatenate([[0], bound])
            keys = allk[starts]
            counts = np.add.reduceat(allc, starts)
        else:
            keys, counts = ukeys, ucounts.astype(np.int64, copy=False)
        if len(keys) > self.k:
            # (k+1)-th largest count; subtracting it leaves ≤ k positives
            dec = int(np.partition(counts, len(counts) - self.k - 1)
                      [len(counts) - self.k - 1])
            counts = counts - dec
            keep = counts > 0
            keys, counts = keys[keep], counts[keep]
            self.offset += dec
        self.keys, self.counts = keys, np.ascontiguousarray(counts)

    def add_batch(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        ukeys, ucounts = np.unique(keys, return_counts=True)
        self._fold(ukeys, ucounts.astype(np.int64))
        self.n += len(keys)

    def estimate_batch(self, keys) -> np.ndarray:
        """Lower-bound counts (0 for untracked); true ≤ est + offset."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(self.keys) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        pos = np.searchsorted(self.keys, keys)
        pos[pos >= len(self.keys)] = 0
        hit = self.keys[pos] == keys
        out = np.where(hit, self.counts[pos], 0)
        return out.astype(np.int64)

    def candidates(self, threshold: float) -> np.ndarray:
        """Keys that COULD have true frequency > threshold (est + offset
        > threshold).  Superset of the true heavy hitters by the one-sided
        bound — the refinement pass counts exactly over this set."""
        if len(self.keys) == 0:
            return self.keys
        return self.keys[self.counts + self.offset > threshold]

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("MisraGries merge requires identical k")
        # other's offset carries even when its counter set is EMPTY (a
        # tie-heavy shrink can subtract every counter to zero while the
        # slack is still real — dropping it breaks the one-sided bound)
        self.offset += other.offset
        if len(other.keys):
            self._fold(other.keys, other.counts)
        self.n += other.n
        return self

    def error_bound(self) -> float:
        """Worst-case undercount of any estimate: min(offset, n/(k+1))."""
        return float(min(self.offset, self.n / (self.k + 1)))

    def to_bytes(self) -> bytes:
        head = np.array([self.k, self.n, self.offset, len(self.keys)],
                        dtype=np.int64).tobytes()
        return head + self.keys.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        k, n, offset, m = np.frombuffer(data[:32], dtype=np.int64)
        s = cls(k=int(k))
        s.n, s.offset = int(n), int(offset)
        s.keys = np.frombuffer(data[32:32 + 8 * m], dtype=np.uint64).copy()
        s.counts = np.frombuffer(data[32 + 8 * m:32 + 16 * m],
                                 dtype=np.int64).copy()
        return s


class TDigest:
    """Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
    extremely accurate quantiles using t-digests", 2019 — public paper /
    reference Java implementation; built from the paper only).

    The merging-digest variant with the asin scale function
    ``k1(q) = delta/(2*pi) * asin(2q - 1)``: clusters are narrow near the
    tails (k1's derivative blows up at q -> 0, 1) and wide at the median,
    so extreme quantiles are much more accurate than uniform-width
    sketches at equal space.  Compaction here is the fully vectorized
    k-space BINNING form of the paper's greedy merge: sort points by
    value, take each point's weight-midpoint rank q_mid, and fuse every
    run whose floor(k1(q_mid)) agrees into one weighted-mean centroid
    (one argsort + cumsum + reduceat, no Python loop).  A fused run spans
    < 1 unit in midpoint-k, so a cluster's (q_lo, q_hi) k-width is < 2 —
    the digest behaves like the paper's greedy merge at compression
    delta/2, which :meth:`rank_error_bound` accounts for.

    Merge concatenates centroid sets and re-compacts — associative in the
    size bound (like KLL, the exact centroid set depends on merge order;
    the rank-error band holds under any merge tree), which is what makes
    it a UDAF like the engine's other sketches.  Total weight is conserved
    EXACTLY (sums, never resampled), min/max are tracked exactly, and
    quantiles interpolate linearly between centroid weight-midpoints with
    the true min/max as the end anchors.
    """

    KIND = "tdigest"

    __slots__ = ("delta", "buf_cap", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 200, buf_cap: int | None = None):
        if delta < 20:
            raise ValueError("delta must be >= 20")
        self.delta = int(delta)
        #: pending points are compacted in chunks of this size so one
        #: add_batch of N values costs O(N log buf_cap) with ~N/buf_cap
        #: vectorized passes (the paper's buffer)
        self.buf_cap = int(buf_cap or 16 * delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    # ------------------------------------------------------------ internals

    def _kbin(self, qmid: np.ndarray) -> np.ndarray:
        k = self.delta / (2 * np.pi) * np.arcsin(2.0 * qmid - 1.0)
        return np.floor(k).astype(np.int64)

    def _compact(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        cw = np.cumsum(w)
        qmid = (cw - 0.5 * w) / cw[-1]
        bins = self._kbin(qmid)
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(bins)) + 1])
        wsum = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(m * w, starts) / wsum
        self.weights = wsum

    # ----------------------------------------------------------------- adds

    def add_batch(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        step = self.buf_cap
        for s in range(0, len(vals), step):
            chunk = vals[s:s + step]
            self._compact(np.concatenate([self.means, chunk]),
                          np.concatenate([self.weights,
                                          np.ones(len(chunk))]))

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("t-digest merge requires identical delta")
        if len(other.weights):
            self._compact(np.concatenate([self.means, other.means]),
                          np.concatenate([self.weights, other.weights]))
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
        return self

    # ---------------------------------------------------------------- query

    def total_weight(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q) -> np.ndarray:
        """Linear interpolation through centroid weight-midpoints, anchored
        at the exact min (rank 0) and max (rank W)."""
        if len(self.weights) == 0:
            return np.full(np.shape(q), np.nan) if np.ndim(q) \
                else float("nan")
        cw = np.cumsum(self.weights)
        mids = cw - 0.5 * self.weights
        xp = np.concatenate([[0.0], mids, [cw[-1]]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        t = np.asarray(q, dtype=np.float64) * cw[-1]
        out = np.interp(t, xp, fp)
        return out if np.ndim(q) else float(out)

    def cdf(self, x) -> np.ndarray:
        """Normalized rank of value(s) x — the inverse of :meth:`quantile`
        (same centroid weight-midpoint interpolation, tied means collapsed
        so the interpolation grid is strictly increasing)."""
        if len(self.weights) == 0:
            return np.full(np.shape(x), np.nan) if np.ndim(x) \
                else float("nan")
        m, w = self.means, self.weights
        if len(m) > 1 and (np.diff(m) <= 0).any():   # duplicate-heavy data
            uniq, start = np.unique(m, return_index=True)
            w = np.add.reduceat(w, start)
            m = uniq
        cw = np.cumsum(w)
        mids = cw - 0.5 * w
        xp = np.concatenate([[self.vmin], m, [self.vmax]])
        fp = np.concatenate([[0.0], mids, [cw[-1]]])
        # vmin/vmax can coincide with the first/last mean (singleton tail
        # clusters); nudge the anchors out so xp is strictly increasing
        if xp[0] >= xp[1]:
            xp = xp[1:]
            fp = fp[1:]
        if len(xp) > 1 and xp[-1] <= xp[-2]:
            xp = xp[:-1]
            fp = fp[:-1]
        xa = np.asarray(x, dtype=np.float64)
        if len(xp) == 1:                 # all mass at one value: step cdf
            out = np.where(xa < xp[0], 0.0, np.where(xa > xp[0], 1.0, 0.5))
        else:
            out = np.interp(xa, xp, fp) / cw[-1]
        return out if np.ndim(x) else float(out)

    def rank_error_bound(self, q) -> np.ndarray:
        """Worst-case normalized rank error at quantile q: half the widest
        cluster that can cover q.  Binned compaction keeps a cluster's
        k-width < 2 (effective compression delta/2), so the q-width there
        is <= 2 * k1'^{-1} = 4*pi*sqrt(q(1-q))/delta; half of it is the
        midpoint-interpolation error, doubled again for merge-tree slack
        and floored at 3/delta for the tails (the extra 1/delta absorbs
        the data's own rank quantization on heavily duplicated streams,
        where a centroid mean can land in a gap between value runs —
        observed as a ~5% floor overage at delta=1000 on a ~300-distinct-
        value stream in fuzzing; continuous data sits far inside 2/delta)."""
        q = np.asarray(q, dtype=np.float64)
        band = 4.0 * np.pi * np.sqrt(np.clip(q * (1.0 - q), 0.0, None)) \
            / self.delta
        return np.maximum(band, 3.0 / self.delta)

    # ----------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        head = np.array([len(self.weights)], dtype=np.int64).tobytes()
        mm = np.array([self.vmin, self.vmax], dtype=np.float64)
        return head + mm.tobytes() + self.means.tobytes() + \
            self.weights.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, delta: int = 200) -> "TDigest":
        s = cls(delta=delta)
        if not data:
            return s
        n = int(np.frombuffer(data[:8], dtype=np.int64)[0])
        s.vmin, s.vmax = np.frombuffer(data[8:24], dtype=np.float64)
        s.means = np.frombuffer(data[24:24 + 8 * n],
                                dtype=np.float64).copy()
        s.weights = np.frombuffer(data[24 + 8 * n:24 + 16 * n],
                                  dtype=np.float64).copy()
        return s
