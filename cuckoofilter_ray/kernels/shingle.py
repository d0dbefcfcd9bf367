"""Shingle — overlapping-bucket (3.5-way) cuckoo filter.

Value-level re-expression of ``/root/reference/src/shingle.h`` (Lehman &
Panigrahy, "3.5-way cuckoo hashing for the price of 2-and-a-bit", ESA 2009):

- two arrays A and B, each with ``2^(log2_slots-1)`` base slots (+2 overflow
  slots so ``idx+1..idx+3`` never run off the end — shingle.h:163-166);
- a 12-bit slot = 11-bit fingerprint << 1 | offset bit (the slot is one past
  the key's base index when the bit is set — shingle.h:26-37);
- a key hashes to ``idx = (h >> 11) & imask``, ``fp = h & 0x7FF`` (0 remapped
  to 1), occupying A[idx] / A[idx+1] or, via the delta-universal reindex
  ``idx ^ ((fp_hash * fp) >> 11)``, B[idx2] / B[idx2+1] (shingle.h:77-79,
  173-179);
- Add refuses past load 12/12.75 (shingle.h:172-175), tries the two A slots,
  then a robin-hood local shift (push the offsettable neighbor right,
  shingle.h:112-128), then kicks a random resident and recurses on the other
  array (shingle.h:130-136);
- Contain checks exactly the four slots (shingle.h:181-200's SWAR probe);
  Delete clears the first match in A-then-B precedence (shingle.h:139-151).

The engine keeps A/B as uint16 arrays (bit-packed to 12 bits at rest,
3 bytes/slot-pair parity with ``SizeInBytes`` — shingle.h:170).  ``add_batch``
resolves the common empty-A-slot case with the vectorized scatter race used
by the cuckoo kernel; chains that miss it (both slots full) run the faithful
sequential robin-hood/kick path — the reference's own Add is sequential, and
those chains are the minority until high load.

Randomness is deterministic: ``fp_hash_`` derives from the seed (the
reference draws it from ``std::random_device``, shingle.h:157-161) and the
kick coin replaces ``std::rand() % 2`` (shingle.h:131) with a counted
splitmix64 stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cuckoo import BulkResult
from .hashing import DEFAULT_SEED, hash_key64, splitmix64

U64 = np.uint64

FP_BITS = 11
SLOT_BITS = 12
#: Add() load ceiling (shingle.h:173)
MAX_LOAD = 12.0 / 12.75


class ShingleFilter:
    KIND = "shingle"

    __slots__ = ("log2_slots", "imask", "seed", "hash_family", "fp_hash",
                 "A", "B", "filled", "num_items", "_coin_n", "_scratch",
                 "victims", "_coin_buf", "_coin_start")

    def __init__(self, log2_slots: int, seed: int = DEFAULT_SEED,
                 hash_family: str = "tims"):
        if log2_slots < 1:
            raise ValueError("log2_slots must be >= 1")
        self.log2_slots = int(log2_slots)
        self.imask = (1 << (log2_slots - 1)) - 1
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        # the reference templates on HashFamily with TIMS default
        # (shingle.h:15); "mix" is accepted for symmetry with the other kernels
        self.hash_family = hash_family
        self.fp_hash = int(splitmix64(1, seed=self.seed ^ 0x5417)[0])
        n = self.imask + 3          # +2 overflow slots (shingle.h:163-166)
        self.A = np.zeros(n, dtype=np.uint16)
        self.B = np.zeros(n, dtype=np.uint16)
        self.filled = 0
        self.num_items = 0
        self._coin_n = 0
        self._coin_buf = None
        self._coin_start = 0
        self._scratch = None
        # parked chain tails: (A-side base index, fp) pairs whose insertion
        # chain failed to terminate (e.g. >4 copies of one key share the same
        # 4 candidate slots).  The reference recurses forever on such inputs
        # (shingle.h:135); the engine parks them — queryable, no false
        # negatives — mirroring the cuckoo kernel's victim slot.
        self.victims: list[tuple[int, int]] = []

    # ------------------------------------------------------------------ sizing

    @classmethod
    def create(cls, capacity: int, seed: int = DEFAULT_SEED,
               hash_family: str = "tims") -> "ShingleFilter":
        """Smallest ``log2_slots`` whose load ceiling admits ``capacity``."""
        capacity = max(1, int(capacity))
        log2 = 1
        while (1 << log2) * MAX_LOAD < capacity:
            log2 += 1
        return cls(log2, seed=seed, hash_family=hash_family)

    # ------------------------------------------------------------------- hash

    def _idx_fp(self, keys) -> tuple[np.ndarray, np.ndarray]:
        h = hash_key64(keys, self.seed, self.hash_family)
        idx = ((h >> U64(FP_BITS)) & U64(self.imask)).astype(np.int64)
        fp = (h & U64((1 << FP_BITS) - 1)).astype(np.uint16)
        fp = fp + (fp == 0)         # 0 marks empty (shingle.h:177)
        return idx, fp

    def reindex(self, idx, fp) -> np.ndarray:
        """Delta-universal partner index (shingle.h:77-79) — an involution."""
        mix = (np.asarray(fp, dtype=np.uint64) * U64(self.fp_hash)) >> U64(FP_BITS)
        return ((np.asarray(idx, dtype=np.uint64) ^ mix) & U64(self.imask)) \
            .astype(np.int64)

    # ------------------------------------------------------------------ insert

    def _coin(self) -> int:
        """Counted coin stream, pooled: value i is bit 0 of
        ``splitmix64(1, seed=(seed^0xC01)+i)`` exactly (the pooled state
        ``(S & M) + GOLDEN + i`` ≡ ``((S+i) & M) + GOLDEN`` mod 2^64), but
        computed 4096 at a time — the per-call scalar splitmix64 dominated
        infeasible duplicate-heavy chains (~10 µs/kick, 38 s at 4 k keys)."""
        i = self._coin_n - self._coin_start
        if self._coin_buf is None or not (0 <= i < len(self._coin_buf)):
            state = (U64(self.seed ^ 0xC01) + U64(0x9E3779B97F4A7C15)
                     + np.arange(self._coin_n, self._coin_n + 4096,
                                 dtype=np.uint64))
            z = state
            z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
            z ^= z >> U64(31)
            self._coin_buf = (z & U64(1)).astype(np.int64)
            self._coin_start = self._coin_n
            i = 0
        c = int(self._coin_buf[i])
        self._coin_n += 1
        return c

    def _add_chain(self, isa: bool, idx: int, fp: int) -> bool:
        """Sequential AddHelp (shingle.h:99-137): empty slot, robin-hood
        local shift, else random kick and recurse on the other array.

        The reference recurses with NO termination bound (shingle.h:135
        "TODO: replace recursion with iteration") and spins forever on
        infeasible inputs (e.g. more copies of overlapping keys than their
        slot union holds — duplicates share the same 4 candidate slots).
        The engine bounds the walk and parks the carried fingerprint in
        ``self.victims`` (still queryable — zero false negatives), returning
        False so callers can count it in ``BulkResult.overflow``."""
        for _ in range(5_000):      # unbounded in the reference; backstop
                                    # (ceiling-load legal chains have been
                                    # observed needing >600 steps; at most
                                    # 63 chains reach this path per batch,
                                    # and iterations are pooled-coin cheap)
            arr = self.A if isa else self.B
            placed = False
            for off in (0, 1):
                if arr[idx + off] == 0:
                    arr[idx + off] = off | (fp << 1)
                    self.filled += 1
                    placed = True
                    break
            if placed:
                return True
            v1, v2 = int(arr[idx + 1]), int(arr[idx + 2])
            if (v1 & 1) == 0:
                if v2 == 0:
                    arr[idx + 2] = 1 | v1
                    arr[idx + 1] = 1 | (fp << 1)
                    self.filled += 1
                    return True
                if (v2 & 1) == 0 and idx + 3 < len(arr) \
                        and arr[idx + 3] == 0:
                    arr[idx + 3] = 1 | v2
                    arr[idx + 2] = 1 | v1
                    arr[idx + 1] = 1 | (fp << 1)
                    self.filled += 1
                    return True
            off = self._coin()
            slot = idx + off
            old = int(arr[slot])
            arr[slot] = off | (fp << 1)
            old_idx = slot - (old & 1)
            old_fp = old >> 1
            isa = not isa
            # inline int reindex (identical to self.reindex; the numpy
            # scalar version cost ~4.5 µs/kick on infeasible chains)
            idx = (old_idx ^ (((old_fp * self.fp_hash)
                               & 0xFFFFFFFFFFFFFFFF) >> FP_BITS)) & self.imask
            fp = old_fp
        # chain did not terminate: park the carried (side-canonicalized)
        # fingerprint so it stays queryable (reindex is an involution, so the
        # A-side base index is recoverable from either side)
        a_idx = idx if isa else int(self.reindex(idx, fp))
        self.victims.append((a_idx, fp))
        return False

    def add_batch(self, keys) -> BulkResult:
        """Vectorized fast path (scatter race on empty A slots), sequential
        faithful slow path; refuses keys past the 12/12.75 load ceiling
        (counted as overflow — the reference's Add() == false)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return BulkResult(ok=0, overflow=0)
        cap = 2 * (self.imask + 1)
        budget = int(MAX_LOAD * cap) - self.filled
        overflow = max(0, len(keys) - max(0, budget))
        keys = keys[:max(0, budget)]
        idx, fp = self._idx_fp(keys)
        if self._scratch is None:
            self._scratch = np.empty(len(self.A), dtype=np.int64)
        # chain state: current side (True = A), current base index on that
        # side, current fingerprint (changes when a kick evicts a resident)
        n = len(keys)
        on_a = np.ones(n, dtype=bool)
        cur = idx.copy()
        cfp = fp.astype(np.uint16).copy()
        pend = np.arange(n)
        # Vectorized rounds, mirroring the cuckoo kernel's scatter-race
        # kickout: each round tries the chain's two slots on its current
        # side (empty-slot placement, shingle.h:101-108), then kicks a
        # coin-chosen resident and flips sides (shingle.h:130-136).  Same-
        # slot contention within the batch resolves by scatter race; losers
        # simply retry.  The rare stubborn tail falls back to the faithful
        # sequential path (which also has the robin-hood local shift).
        stall = 0
        for _ in range(600):
            if len(pend) == 0:
                break
            filled0 = self.filled
            # empty-slot placement on the chain's current side
            for side, arr in ((True, self.A), (False, self.B)):
                for off in (0, 1):
                    sel = pend[on_a[pend] == side]
                    if len(sel) == 0:
                        continue
                    q = cur[sel] + off
                    empty = arr[q] == 0
                    cand = sel[empty]
                    qe = q[empty]
                    self._scratch[qe] = cand
                    win = self._scratch[qe] == cand
                    w = cand[win]
                    arr[qe[win]] = off | (cfp[w] << 1)
                    self.filled += len(w)
                    keep = np.ones(len(pend), dtype=bool)
                    keep[np.searchsorted(pend, w)] = False
                    pend = pend[keep]
            if len(pend) == 0:
                break
            # robin-hood local shift (shingle.h:109-128), vectorized (r5 —
            # previously sequential-tail-only): shift the base-position
            # resident at q+1 (and possibly q+2) one slot right and claim
            # q+1.  A chain's READ set equals its WRITE set (q+1..q+2/3),
            # so the scatter race marks every involved slot and a chain
            # wins only if it holds ALL its marks — overlapping windows
            # (including cross-side aliases of the same buffer indices)
            # cannot partially interleave.
            for side, arr in ((True, self.A), (False, self.B)):
                sel = pend[on_a[pend] == side]
                if len(sel) == 0:
                    continue
                q = cur[sel]
                v1 = arr[q + 1].astype(np.int64)
                v2 = arr[q + 2].astype(np.int64)
                base1 = (v1 != 0) & ((v1 & 1) == 0)
                cond1 = base1 & (v2 == 0)
                in3 = q + 3 < len(arr)        # idx+3 exists only off the
                v3 = np.where(in3, arr[np.minimum(q + 3, len(arr) - 1)], 1)
                cond2 = base1 & (v2 != 0) & ((v2 & 1) == 0) & (v3 == 0) & in3
                c1 = np.flatnonzero(cond1)
                c2 = np.flatnonzero(cond2)
                if not (len(c1) or len(c2)):
                    continue
                s1, s2 = sel[c1], sel[c2]
                q1, q2 = q[c1], q[c2]
                self._scratch[q1 + 1] = s1
                self._scratch[q1 + 2] = s1
                self._scratch[q2 + 1] = s2
                self._scratch[q2 + 2] = s2
                self._scratch[q2 + 3] = s2
                ok1 = (self._scratch[q1 + 1] == s1) & \
                      (self._scratch[q1 + 2] == s1)
                ok2 = (self._scratch[q2 + 1] == s2) & \
                      (self._scratch[q2 + 2] == s2) & \
                      (self._scratch[q2 + 3] == s2)
                done = []
                if ok1.any():
                    w, qw = s1[ok1], q1[ok1]
                    arr[qw + 2] = (1 | v1[c1][ok1]).astype(np.uint16)
                    arr[qw + 1] = (1 | (cfp[w].astype(np.int64) << 1)) \
                        .astype(np.uint16)
                    done.append(w)
                if ok2.any():
                    w, qw = s2[ok2], q2[ok2]
                    arr[qw + 3] = (1 | v2[c2][ok2]).astype(np.uint16)
                    arr[qw + 2] = (1 | v1[c2][ok2]).astype(np.uint16)
                    arr[qw + 1] = (1 | (cfp[w].astype(np.int64) << 1)) \
                        .astype(np.uint16)
                    done.append(w)
                if done:
                    w = np.concatenate(done)
                    self.filled += len(w)
                    keep = np.ones(len(pend), dtype=bool)
                    keep[np.searchsorted(pend, np.sort(w))] = False
                    pend = pend[keep]
            if len(pend) == 0:
                break
            if len(pend) < 64:      # tiny tail: sequential is cheaper
                break
            # kick round per side
            coins = (splitmix64(len(pend),
                                seed=(self.seed ^ 0xC01) + self._coin_n)
                     & np.uint64(1)).astype(np.int64)
            self._coin_n += len(pend)
            for side, arr in ((True, self.A), (False, self.B)):
                mask = on_a[pend] == side
                sel = pend[mask]
                if len(sel) == 0:
                    continue
                off = coins[mask]
                slot = cur[sel] + off
                self._scratch[slot] = sel
                win = self._scratch[slot] == sel
                w, sw, ow = sel[win], slot[win], off[win]
                old = arr[sw].astype(np.int64)
                arr[sw] = (ow | (cfp[w] << 1)).astype(np.uint16)
                # a chain that flipped sides this round may land on a slot
                # the empty pass never saw: an empty "eviction" is really a
                # placement (evicting fp=0 would plant a garbage entry)
                was_empty = old == 0
                done = w[was_empty]
                if len(done):
                    self.filled += len(done)
                    keep = np.ones(len(pend), dtype=bool)
                    keep[np.searchsorted(pend, done)] = False
                    pend = pend[keep]
                w, sw, old = w[~was_empty], sw[~was_empty], old[~was_empty]
                old_base = sw - (old & 1)
                old_fp = (old >> 1).astype(np.uint16)
                cur[w] = self.reindex(old_base, old_fp)
                cfp[w] = old_fp
                on_a[w] = not side
            # stall escape: a large pend set whose rounds place NOTHING for
            # 16 consecutive rounds is an infeasible duplicate pile-up —
            # fall through to the bulk park instead of kicking to 600
            stall = stall + 1 if self.filled == filled0 else 0
            if stall >= 16:
                break
        parked = 0
        if len(pend) >= 64:
            # a LARGE set that survived 600 vectorized rounds is an
            # infeasible duplicate pile-up (>4 copies of overlapping keys
            # demanding more than their slot union) — park the carried
            # fingerprints directly (side-canonicalized, same as
            # _add_chain's park; queryable, zero false negatives) instead
            # of burning the sequential budget per chain
            a_idx = np.where(on_a[pend], cur[pend],
                             self.reindex(cur[pend], cfp[pend]))
            self.victims.extend(
                zip((int(x) for x in a_idx), (int(x) for x in cfp[pend])))
            parked = len(pend)
        else:
            for i in pend:          # faithful sequential tail
                if not self._add_chain(bool(on_a[i]), int(cur[i]),
                                       int(cfp[i])):
                    parked += 1
        self.num_items += len(keys)
        return BulkResult(ok=len(keys) - parked, overflow=overflow + parked)

    def add(self, key: int) -> bool:
        res = self.add_batch(np.array([key], dtype=np.uint64))
        return res.overflow == 0

    # ------------------------------------------------------------------- query

    def contain_batch(self, keys) -> np.ndarray:
        """Vectorized 4-slot probe (shingle.h:181-200)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx, fp = self._idx_fp(keys)
        idx2 = self.reindex(idx, fp)
        v0 = (fp.astype(np.uint16) << 1)
        v1 = v0 | 1
        hit = ((self.A[idx] == v0) | (self.A[idx + 1] == v1) |
               (self.B[idx2] == v0) | (self.B[idx2 + 1] == v1))
        for vi, vf in self.victims:     # parked chain tails (rare)
            hit |= (idx == vi) & (fp == vf)
        return hit

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    # ------------------------------------------------------------------ delete

    def delete(self, key: int) -> bool:
        """DeleteHelp precedence: A[idx], A[idx+1], then B (shingle.h:139-151)."""
        idx, fp = self._idx_fp(np.array([key], dtype=np.uint64))
        idx, fp = int(idx[0]), int(fp[0])
        for arr, base in ((self.A, idx), (self.B, int(self.reindex(idx, fp)))):
            for off in (0, 1):
                if arr[base + off] == (off | (fp << 1)):
                    arr[base + off] = 0
                    self.filled -= 1
                    self.num_items -= 1
                    return True
        if (idx, fp) in self.victims:   # parked chain tails drain last
            self.victims.remove((idx, fp))
            self.num_items -= 1
            return True
        return False

    def delete_batch(self, keys) -> np.ndarray:
        """Per-key sequential deletes (duplicate keys must drain one slot
        each, like the reference's repeated Delete calls)."""
        keys = np.asarray(keys, dtype=np.uint64)
        return np.array([self.delete(int(k)) for k in keys], dtype=bool)

    # ------------------------------------------------------------------- merge

    def merge(self, other: "ShingleFilter") -> BulkResult:
        """Re-insert the other's occupied slots (side-preserving chain
        starts) — same associative-merge contract as the cuckoo kernel."""
        if (self.log2_slots, self.seed, self.hash_family, self.fp_hash) != \
                (other.log2_slots, other.seed, other.hash_family,
                 other.fp_hash):
            raise ValueError("shingle merge requires identical geometry/seed")
        ok, parked = 0, 0
        for arr, isa in ((other.A, True), (other.B, False)):
            for slot in np.flatnonzero(arr):
                v = int(arr[slot])
                if self._add_chain(isa, int(slot - (v & 1)), v >> 1):
                    ok += 1
                else:
                    parked += 1
        self.victims.extend(other.victims)
        self.num_items += other.num_items
        return BulkResult(ok=ok, overflow=parked)

    # ------------------------------------------------------------------- stats

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        """3 bytes per (A,B) cell pair (shingle.h:170)."""
        return 3 * (self.imask + 3)

    def load_factor(self) -> float:
        return self.filled / (2 * (self.imask + 1))

    def info(self) -> dict:
        return {"kind": self.KIND, "log2_slots": self.log2_slots,
                "num_items": self.num_items, "filled": self.filled,
                "load_factor": self.load_factor(),
                "size_in_bytes": self.size_in_bytes()}
