"""GenericCrate — pocket-dictionary (Elias–Fano) filter, from
``/root/reference/src/crate.h`` ("Fully-Dynamic Space-Efficient
Dictionaries and Filters", arXiv:1911.05060; degenerate single-crate form).

Reference semantics (crate.h):

- a **pocket dictionary** (PD) is one 64-byte block holding up to 51
  fingerprints over 50 quotients: a 101-bit header (50 one-bit quotient
  terminators interleaved with one zero per stored fingerprint — the
  Elias–Fano upper part) followed by 51 sorted 8-bit remainders
  (crate.h:8-10,331-392);
- key → PD fields use RAW key bits, no hash family (crate.h:432-445):
  ``quot = ((key >> 40) * 50) >> 24``, ``rem = uint8(key >> 32)``,
  ``bucket = (uint32(key) * bucket_count) >> 32`` (Lemire reduce on the
  LOW 32 bits) — the engine feeds already-hashed 64-bit keys;
- sizing ``bucket_count = add_count / 44`` (crate.h:420) — mean 44 keys
  per 51-slot PD;
- a full PD overflows to a **spare** exact set of uint32-truncated keys
  (``SimdSizedDict(0.013 * add_count)``, crate.h:401,417-423,438);
- batch lookup ``Contain64`` (crate.h:447-484): PD probe; on miss with a
  FULL PD, fall back to the spare (key 0 via its ``has_zero`` flag).
  (The scalar ``Contain`` skips the spare entirely — the benchmarks use
  Contain64; the engine implements Contain64 semantics.)

Engine form: the PD is value-wise a SORTED multiset of ``quot*256 + rem``
fingerprints, so the whole filter probes as one ``searchsorted`` over the
combined ``bucket*12800 + fp`` int64 array — fully vectorized, no bit
surgery in the hot path.  ``pack_blocks`` emits the reference's exact
64-byte block layout (byte-parity pinned vs a g++ build of crate.h); the
spare is :class:`~.dict.SimdSizedDict` (byte-parity, dict.py).

Engine deviation (documented): a key with ``uint32(key) == 0`` but
``key != 0`` answers via ``has_zero`` — the reference's
``ContainsKeyWithHash(0, ...)`` scans for a zero lane instead, which can
false-NEGATIVE with probability ~2^-32; the engine keeps the zero-FN
invariant.  The spare also upsizes instead of spinning when overfull.
"""

from __future__ import annotations

import numpy as np

from .cuckoo import BulkResult
from .dict import SimdSizedDict

U64 = np.uint64
QUOTS = 50
SLOTS = 51
KEYS_PER_BUCKET = 44          # crate.h:420
SPARE_FRACTION = 0.013        # crate.h:401-409 ("0.013 for fill 43/44")
FP_SPACE = QUOTS * 256        # 12800 fingerprint values per PD
HEADER_BITS = QUOTS + SLOTS   # 101
HEADER_BYTES = 13             # ceil(101/8); remainders start here
_CHUNK = 1 << 20              # buckets per pack/unpack chunk


def _fields(keys: np.ndarray, bucket_count: int
            ) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, fp) per key — crate.h:432-445 raw-bit field extraction."""
    k = np.asarray(keys, dtype=np.uint64)
    b = ((k & U64(0xFFFFFFFF)) * U64(bucket_count)) >> U64(32)
    quot = ((k >> U64(40)) * U64(QUOTS)) >> U64(24)
    rem = (k >> U64(32)) & U64(0xFF)
    fp = quot * U64(256) + rem
    return b.astype(np.int64), fp.astype(np.int64)


class CrateFilter:
    KIND = "crate"

    __slots__ = ("capacity", "bucket_count", "seed", "fps", "counts",
                 "spare", "num_items")

    def __init__(self, capacity: int, seed: int = 0):
        self.capacity = max(1, int(capacity))
        self.bucket_count = max(1, self.capacity // KEYS_PER_BUCKET)
        self.seed = int(seed)                      # schema compat; unused
        self.fps = np.zeros(0, dtype=np.int64)     # sorted bucket*12800+fp
        self.counts = np.zeros(self.bucket_count, dtype=np.uint8)
        self.spare = SimdSizedDict(int(SPARE_FRACTION * self.capacity))
        self.num_items = 0

    @classmethod
    def create(cls, capacity: int, seed: int = 0, **_ignored):
        return cls(capacity, seed=seed)

    # ------------------------------------------------------------------ build

    def add_batch(self, keys) -> BulkResult:
        """Vectorized bulk Add in arrival order: per bucket, the first
        ``51 - fill`` arrivals land in the PD (crate.h:331-392 pd_add_50),
        the rest go to the spare (crate.h:438)."""
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return BulkResult(ok=0, overflow=0)
        b, fp = _fields(keys, self.bucket_count)
        order = np.argsort(b, kind="stable")
        sb = b[order]
        group_start = np.zeros(n, dtype=np.int64)
        new_group = np.ones(n, dtype=bool)
        new_group[1:] = sb[1:] != sb[:-1]
        group_start[new_group] = np.flatnonzero(new_group)
        np.maximum.accumulate(group_start, out=group_start)
        occ = np.arange(n, dtype=np.int64) - group_start
        room = (SLOTS - self.counts[sb].astype(np.int64))
        pd_sorted = occ < room
        pd_mask = np.empty(n, dtype=bool)
        pd_mask[order] = pd_sorted
        comb = b * FP_SPACE + fp
        new_fps = comb[pd_mask]
        if len(new_fps):
            self.fps = np.sort(np.concatenate([self.fps, new_fps]))
            self.counts += np.bincount(
                b[pd_mask], minlength=self.bucket_count
            ).astype(np.uint8)
        n_spare = int(n - pd_mask.sum())
        if n_spare:
            for k in keys[~pd_mask]:               # rare (~1.3% at fill 44)
                self.spare.insert(int(k))
        self.num_items += n
        return BulkResult(ok=n, overflow=n_spare)

    # ------------------------------------------------------------------ query

    def contain_batch(self, keys) -> np.ndarray:
        """Contain64 semantics (crate.h:447-484), fully vectorized."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        b, fp = _fields(keys, self.bucket_count)
        want = b * FP_SPACE + fp
        if len(self.fps):
            pos = np.minimum(np.searchsorted(self.fps, want),
                             len(self.fps) - 1)
            found = self.fps[pos] == want
        else:
            found = np.zeros(len(keys), dtype=bool)
        fallback = ~found & (self.counts[b] == SLOTS)
        if fallback.any():
            idx = np.flatnonzero(fallback)
            found[idx] = self.spare.contains_batch(keys[idx])
        return found

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    # ------------------------------------------------------------ block codec

    def pack_blocks(self) -> bytes:
        """The reference's exact at-rest form: one 64-byte PD per bucket —
        101-bit little-endian header (one-bits at ``cumcount[q] + q``) ++
        sorted remainder bytes from offset 13 (crate.h:331-392 layout;
        byte-parity pinned by tests)."""
        nb = self.bucket_count
        bucket = self.fps // FP_SPACE
        quot = (self.fps % FP_SPACE) >> 8
        rem = (self.fps & 255).astype(np.uint8)
        fill = np.bincount(bucket, minlength=nb).astype(np.int64)
        first = np.repeat(np.cumsum(fill) - fill, fill)
        within = np.arange(len(self.fps), dtype=np.int64) - first
        out = []
        qcols = np.arange(QUOTS, dtype=np.int64)
        for lo in range(0, nb, _CHUNK):
            hi = min(lo + _CHUNK, nb)
            m = hi - lo
            sel = (bucket >= lo) & (bucket < hi)
            hist = np.bincount((bucket[sel] - lo) * QUOTS + quot[sel],
                               minlength=m * QUOTS).reshape(m, QUOTS)
            one_pos = np.cumsum(hist, axis=1) + qcols
            bits = np.zeros((m, HEADER_BYTES * 8), dtype=np.uint8)
            bits[np.repeat(np.arange(m), QUOTS), one_pos.ravel()] = 1
            blocks = np.zeros((m, 64), dtype=np.uint8)
            blocks[:, :HEADER_BYTES] = np.packbits(bits, axis=1,
                                                   bitorder="little")
            blocks[bucket[sel] - lo, HEADER_BYTES + within[sel]] = rem[sel]
            out.append(blocks.tobytes())
        return b"".join(out)

    @classmethod
    def from_blocks(cls, blob: bytes, capacity: int, seed: int = 0
                    ) -> "CrateFilter":
        """Rebuild the probe state from packed 64-byte PD blocks (spare is
        restored separately by serde)."""
        f = cls(capacity, seed=seed)
        arr = np.frombuffer(blob, dtype=np.uint8).reshape(-1, 64)
        nb = len(arr)
        if nb != f.bucket_count:
            f.bucket_count = nb
            f.counts = np.zeros(nb, dtype=np.uint8)
        fps_parts = []
        qcols = np.arange(QUOTS, dtype=np.int64)
        for lo in range(0, nb, _CHUNK):
            hi = min(lo + _CHUNK, nb)
            m = hi - lo
            chunk = arr[lo:hi]
            bits = np.unpackbits(chunk[:, :HEADER_BYTES], axis=1,
                                 bitorder="little")[:, :HEADER_BITS]
            _, cols = np.nonzero(bits)
            cum = cols.reshape(m, QUOTS) - qcols          # cumcount per quot
            hist = np.diff(cum, prepend=0, axis=1)
            fill = cum[:, -1]
            f.counts[lo:hi] = fill.astype(np.uint8)
            total = int(fill.sum())
            if total == 0:
                continue
            quot = np.repeat(np.tile(qcols, m), hist.ravel())
            buck = np.repeat(np.arange(lo, hi, dtype=np.int64), fill)
            first = np.repeat(np.cumsum(fill) - fill, fill)
            within = np.arange(total, dtype=np.int64) - first
            rem = chunk[buck - lo, HEADER_BYTES + within].astype(np.int64)
            fps_parts.append(buck * FP_SPACE + quot * 256 + rem)
        if fps_parts:
            f.fps = np.concatenate(fps_parts)             # already sorted
        return f

    # ------------------------------------------------------------------ stats

    def size(self) -> int:
        return self.num_items

    def load_factor(self) -> float:
        return len(self.fps) / (self.bucket_count * SLOTS)

    def size_in_bytes(self) -> int:
        """At-rest bytes (crate.h:414-416): 64 per PD + the spare blocks."""
        return 64 * self.bucket_count + self.spare.size_in_bytes()

    def merge(self, other):
        raise NotImplementedError(
            "crate filters are not mergeable (overflow keys cannot be "
            "re-routed to the spare from fingerprints alone; the reference "
            "has no crate merge either) — bulk-build per group instead")

    def info(self) -> dict:
        return {"kind": self.KIND, "num_items": self.num_items,
                "bucket_count": self.bucket_count,
                "pd_fingerprints": len(self.fps),
                "spare_ndv": self.spare.ndv,
                "load_factor": self.load_factor(),
                "size_in_bytes": self.size_in_bytes()}
