"""Xor-filter kernel: immutable 3-wise XOR AMQ (value-level port of
``/root/reference/src/xorfilter.h``).

Reference semantics reproduced:

- sizing ``arrayLength = 32 + 1.23·n`` split into 3 equal blocks
  (``src/xorfilter.h:74-77``); the three probe positions live one per block
  (``src/xorfilter.h:37-53``).
- fingerprint = folded hash masked to ``bits`` (``src/xorfilter.h:60-64``),
  ``Contain``: ``fp ^ B[h0] ^ B[h1] ^ B[h2] == 0`` (``src/xorfilter.h:283-295``).
- peeling construction with retry on a fresh seed when a 2-core remains
  (``AddAll`` ``src/xorfilter.h:122-279``, retry at ``:246-251``).

Engine deviations (SURVEY.md §7.5 fidelity contract):

- peeling runs in **vectorized rounds** (all current singleton cells peel at
  once — correct because a round-peeled key's other cells are, by the
  singleton property, owned by later-peeled keys, so reverse-round assignment
  sees only final values) instead of the reference's scalar queue.
- seeds are explicit and deterministic (attempt i uses ``mix(seed, i)``), not
  ``std::random_device``.
- the filter is **bulk-build-only and NOT mergeable** (as in the reference —
  no ``qf_merge`` analog exists for xor filters); the distributed build path
  therefore shuffles raw keys per group (sparse accumulators all the way
  down) rather than partial filters.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED, mix_split, murmur64

U64 = np.uint64
MAX_ATTEMPTS = 100


class XorFilter:
    """Immutable xor filter over uint64 keys (8- or 16-bit fingerprints)."""

    KIND = "xor"

    __slots__ = ("block_length", "bits_per_tag", "seed", "build_seed",
                 "fingerprints", "num_items", "_built")

    def __init__(self, capacity: int, bits_per_tag: int = 8,
                 seed: int = DEFAULT_SEED):
        if bits_per_tag not in (8, 16):
            raise ValueError("xor filter supports 8- or 16-bit fingerprints")
        array_length = 32 + int(1.23 * max(1, int(capacity)))
        self.block_length = (array_length + 2) // 3
        self.bits_per_tag = int(bits_per_tag)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.build_seed = self.seed
        dtype = np.uint8 if bits_per_tag == 8 else np.uint16
        self.fingerprints = np.zeros(3 * self.block_length, dtype=dtype)
        self.num_items = 0
        self._built = False

    # ------------------------------------------------------------- hash bits

    def _hash(self, keys: np.ndarray, seed: int) -> np.ndarray:
        return mix_split(keys, seed)

    def _positions(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Three cells, one per block (src/xorfilter.h:37-53 reduce+rotl)."""
        bl = U64(self.block_length)
        r0 = h
        r1 = np.bitwise_or(h << U64(21), h >> U64(43))   # rotl64(h, 21)
        r2 = np.bitwise_or(h << U64(42), h >> U64(22))   # rotl64(h, 42)
        # positions stay uint64 (numpy fancy-indexes uint64 directly): the
        # three int64 astype copies were ~25% of the 1 M-key build
        h0 = ((r0 >> U64(32)) * bl) >> U64(32)
        h1 = (((r1 >> U64(32)) * bl) >> U64(32)) + U64(self.block_length)
        h2 = (((r2 >> U64(32)) * bl) >> U64(32)) + U64(2 * self.block_length)
        return h0, h1, h2

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        f = (h ^ (h >> U64(32))) & U64((1 << self.bits_per_tag) - 1)
        return f.astype(self.fingerprints.dtype)

    # ----------------------------------------------------------------- build

    def add_all(self, keys) -> None:
        """Bulk construction (AddAll, src/xorfilter.h:122-279).  One-shot."""
        if self._built:
            raise RuntimeError("xor filter is immutable once built")
        keys = np.unique(np.asarray(keys, dtype=np.uint64))
        n = len(keys)
        ncells = 3 * self.block_length
        for attempt in range(MAX_ATTEMPTS):
            bseed = int(murmur64(np.array(
                [(self.seed + attempt * 0x9E3779B97F4A7C15) & (2 ** 64 - 1)],
                dtype=np.uint64))[0])
            h = self._hash(keys, bseed)
            if len(np.unique(h)) != n:     # 64-bit hash collision: reseed
                continue
            h0, h1, h2 = self._positions(h)
            # initial degree counts via ONE bincount over the concatenated
            # cell ids (np.add.at's per-element loop was ~10x slower)
            # (bincount rejects uint64; cell ids < 2^63 so the int64 view
            # is value-preserving and copy-free)
            counts = np.bincount(
                np.concatenate((h0, h1, h2)).view(np.int64),
                minlength=ncells)
            xors = np.zeros(ncells, dtype=np.uint64)
            # parallel xor of key INDICES: a count-1 cell then yields its
            # lone key's index directly — no hash->index lookup (a sorted-
            # array searchsorted here was 45% of the build: random binary
            # search is a cache-miss per level)
            ixors = np.zeros(ncells, dtype=np.uint64)
            ival = np.arange(n, dtype=np.uint64)
            for pos in (h0, h1, h2):
                np.bitwise_xor.at(xors, pos, h)
                np.bitwise_xor.at(ixors, pos, ival)
            # vectorized peeling rounds.  Positions were computed ONCE for
            # all keys; each round reads its singleton key INDICES straight
            # out of ``ixors`` and gathers their cells — no per-round
            # re-hash, no sort (marker dedup instead of np.unique).
            seen = np.zeros(n, dtype=bool)
            scratch = np.empty(n, dtype=np.int64)
            peel_rounds = []        # (key_hashes, cells, p0, p1, p2)
            remaining = n
            priority = getattr(self, "PEEL_SEGMENT_PRIORITY", False)
            frontier = None         # cells touched by the previous round
            pend = None             # priority mode: count-1 cells/segment
            while remaining:
                if priority:
                    # xor+ bias (xorfilter_plus.h:286-305): drain singles in
                    # segment order so few keys get ASSIGNED to segment 2 —
                    # that is what makes its rank-compression pay.  Pending
                    # lists carry deferred higher-segment singles across
                    # rounds (a cell reaching count 1 stays there until
                    # drained or its key peels elsewhere — the stale filter
                    # below drops the latter), so each round appends only
                    # the cells it touched instead of rescanning all three
                    # segments; the drained set per round is IDENTICAL to
                    # the full-scan rule (same fingerprints, bit for bit).
                    if pend is None:
                        bl = self.block_length
                        pend = [np.flatnonzero(
                            counts[s * bl:(s + 1) * bl] == 1)
                            .astype(np.int64) + s * bl for s in range(3)]
                    elif len(frontier):
                        fr = frontier.astype(np.int64)
                        fr = fr[counts[fr] == 1]
                        sid = fr // self.block_length
                        for s in range(3):
                            add = fr[sid == s]
                            if len(add):
                                pend[s] = np.concatenate((pend[s], add))
                    single = np.zeros(0, dtype=np.int64)
                    for s in range(3):
                        live = pend[s][counts[pend[s]] == 1]
                        pend[s] = live
                        if len(live):
                            # sorted => same drain order as the full scan,
                            # so the duplicate-lone-key marker race picks
                            # the same winners (bit-identical fingerprints)
                            single = np.sort(live)
                            break
                elif frontier is None:
                    single = np.flatnonzero(counts == 1)
                else:
                    # only cells decremented last round can become new
                    # singles (every count-1 cell is drained in the round
                    # it appears), so the full ncells==1 scan per round is
                    # needed only once
                    single = frontier[counts[frontier] == 1]
                if len(single) == 0:
                    break
                ki = ixors[single].astype(np.int64)    # lone key per cell
                # a key can be the lone entry of up to 3 cells at once:
                # keep one cell per key (first-writer marker race), and
                # drop keys already peeled in an earlier round
                cand = np.flatnonzero(~seen[ki])
                kic = ki[cand]
                scratch[kic] = cand
                win = cand[scratch[kic] == cand]
                ki_w = ki[win]
                seen[ki_w] = True
                kh_u = h[ki_w]
                cells = single[win]                    # one cell per key
                p0, p1, p2 = h0[ki_w], h1[ki_w], h2[ki_w]
                kiw_u = ki_w.astype(np.uint64)
                for pos in (p0, p1, p2):
                    np.add.at(counts, pos, -1)
                    np.bitwise_xor.at(xors, pos, kh_u)
                    np.bitwise_xor.at(ixors, pos, kiw_u)
                # positions carry to the reverse pass (skip re-hash there)
                peel_rounds.append((kh_u, cells, p0, p1, p2))
                remaining -= len(kh_u)
                frontier = np.concatenate((p0, p1, p2))
            if remaining:
                continue                               # 2-core left: retry
            # reverse-round assignment: B[c] = fp(k) ^ B[o0] ^ B[o1] ^ B[o2] ^ B[c]
            B = self.fingerprints
            B[:] = 0
            for kh_u, cells, p0, p1, p2 in reversed(peel_rounds):
                fp = self._fingerprint(kh_u)
                B[cells] = 0
                B[cells] = fp ^ B[p0] ^ B[p1] ^ B[p2]
            self.build_seed = bseed
            self.num_items = n
            self._built = True
            return
        raise RuntimeError(f"xor filter construction failed after {MAX_ATTEMPTS} seeds")

    # alias so the generic group-build path (filt.add_batch(keys)) works
    def add_batch(self, keys):
        from .cuckoo import BulkResult
        self.add_all(keys)
        return BulkResult(ok=self.num_items, overflow=0)

    # ---------------------------------------------------------------- lookup

    def contain_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        h = self._hash(keys, self.build_seed)
        h0, h1, h2 = self._positions(h)
        f = self._fingerprint(h)
        B = self.fingerprints
        return (f ^ B[h0] ^ B[h1] ^ B[h2]) == 0

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    # ----------------------------------------------------------------- stats

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        return self.fingerprints.nbytes

    def bits_per_item(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.num_items)

    def merge(self, other):
        raise NotImplementedError("xor filters are not mergeable "
                                  "(build-once, src/xorfilter.h AddAll)")

    def info(self) -> dict:
        return {"kind": self.KIND, "bits_per_tag": self.bits_per_tag,
                "block_length": self.block_length, "num_items": self.num_items,
                "size_in_bytes": self.size_in_bytes()}


class XorFilter2(XorFilter):
    """``XorFilter2`` (src/xorfilter_2.h:56-100): the xor filter with tight
    ``3 + 1.23·n`` sizing (:76, vs the base's ``32 + 1.23·n``) and a
    pluggable n-bit fingerprint storage (``src/nbit_array.h``) — the
    reference benches 10/14-bit ``NBitArray`` and 12-bit ``UInt12Array``
    (bulk-insert-and-query.cc:784,937,944).

    Engine form: the hot in-memory array is uint16 (probe = 3 random
    gathers; unpacking at load keeps those gathers single-instruction); the
    at-rest/serde form is the reference's packed layout via
    :mod:`.nbit` — ``size_in_bytes`` reports the packed footprint, exactly
    ``FingerprintStorageType::getByteCount`` (:99).

    Fingerprint = the reference's RAW low hash bits
    (``fingerprints->mask(hash)``, xorfilter_2.h:69-70).  Unlike
    ``XorFilter2n`` (whose pow2-mask positions reuse those same low bits and
    measured 31% FPR, forcing a documented fix), this variant's multiply-high
    position derivation decorrelates fine: measured FPR 0.093% at 10 bits ≈
    the advertised ``2^-bits``, so the reference's choice is kept verbatim.
    """

    KIND = "xor2"

    __slots__ = ("layout",)

    def __init__(self, capacity: int, bits_per_tag: int = 12,
                 seed: int = DEFAULT_SEED, layout: str = "auto"):
        if not 4 <= int(bits_per_tag) <= 16:
            raise ValueError("xor2 supports 4..16-bit fingerprints")
        if layout not in ("auto", "nbit", "uint12"):
            raise ValueError(f"unknown layout {layout!r}")
        array_length = 3 + int(1.23 * max(1, int(capacity)))
        # xorfilter_2.h:77 floor-divides; at capacity<=2 that yields
        # blockLength 1, where every key maps to cells (0,1,2) and peeling
        # can never succeed (the reference would retry forever).  Floor at
        # 2 so tiny builds terminate; sizes >=3 keys match the reference.
        self.block_length = max(array_length // 3,
                                1 if capacity <= 1 else 2)
        self.bits_per_tag = int(bits_per_tag)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.build_seed = self.seed
        dtype = np.uint8 if bits_per_tag <= 8 else np.uint16
        self.fingerprints = np.zeros(3 * self.block_length, dtype=dtype)
        self.num_items = 0
        self._built = False
        self.layout = layout

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        """mask(hash) — raw low bits (xorfilter_2.h:69-70, nbit mask)."""
        f = h & U64((1 << self.bits_per_tag) - 1)
        return f.astype(self.fingerprints.dtype)

    def packed_storage(self):
        """At-rest form: the reference's packed layout, filled in one
        vectorized ``bulk_set`` (the analog of AddAll's final bulkSet,
        xorfilter_2.h:240-247)."""
        from .nbit import storage_for
        store = storage_for(self.bits_per_tag, len(self.fingerprints),
                            self.layout)
        store.bulk_set(self.fingerprints.astype(np.uint16, copy=False))
        return store

    def size_in_bytes(self) -> int:
        from .nbit import storage_for
        return storage_for(self.bits_per_tag, len(self.fingerprints),
                           self.layout).get_byte_count()
