"""Cuckoo-filter kernel: partial-key cuckoo hashing over NumPy arrays.

Value-level re-implementation (SURVEY.md §7.5) of the reference C++ filter:

- 4-way set-associative buckets (``/root/reference/src/singletable.h:25``),
  in-memory as a ``uint16[num_buckets, 4]`` tag matrix (0 = empty slot).
- tag = low ``bits_per_tag`` bits of the 64-bit hash, with 0 remapped to 1
  (``src/cuckoofilter.h:59-64``).
- 2-choice buckets with kickout relocation, up to 500 kicks, then a one-slot
  victim cache (``src/cuckoofilter.h:23,141-181``).
- two index variants:
  * ``pow2``   — power-of-2 buckets, ``i1 = (h>>32) & (nb-1)``,
                 ``i2 = (i1 ^ tag*0x5bd1e995) & (nb-1)`` (an involution)
                 (``src/cuckoofilter.h:66-81,91-100``).
  * ``stable`` — exact-capacity buckets via Lemire reduce; ``i1`` from the
                 LOW 32 hash bits, tag from the HIGH bits; involution
                 ``i2 = (nb - i - r) mod nb`` with odd ``r``
                 (``src/cuckoofilter_stable.h:15-18,60-102,115``).

Deviations from the reference, by design (documented in SURVEY.md §4.3 / §7.4):

- **Seeded everywhere.** The reference seeds hashes from ``std::random_device``
  and kicks via global ``rand()`` (``src/singletable.h:223``); distributed
  merge + reproducibility require one explicit seed per logical filter, so the
  hash seed is a constructor argument and the kick RNG is
  ``np.random.default_rng`` derived from it.
- **Bulk operations are vectorized.** ``add_batch`` places a whole key batch
  with grouped empty-slot scatter rounds + vectorized kick rounds instead of
  one sequential kick chain per key.  Status algebra is preserved: a chain
  exceeding 500 kicks parks in the victim cache (first) or counts as
  ``NotEnoughSpace`` overflow (rest); slot *placement* may differ from the
  sequential reference, which is fine — fidelity is query-answer-level
  (no false negatives; FPR bound ~ 2·4/2^bits), not byte-level.
- **Merge** (no cuckoo merge exists in the reference; contract taken from the
  CQF's ``qf_merge``, ``src/gqf.h:307-310``): for equal ``(seed, num_buckets,
  bits_per_tag, variant)``, re-insert every stored ``(bucket, tag)`` pair —
  valid because ``AltIndex`` depends only on ``(i, tag)`` (the partial-key
  property, ``src/cuckoofilter.h:75-81``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .hashing import DEFAULT_SEED, hash_key64, mix_split

U64 = np.uint64
_MURMUR_C = 0x5BD1E995
_STABLE_C = 0xC4CEB9FE1A85EC53

MAX_KICKS = 500  # kMaxCuckooCount, src/cuckoofilter.h:23
TAGS_PER_BUCKET = 4  # src/singletable.h:25

OK = "Ok"
NOT_FOUND = "NotFound"
NOT_ENOUGH_SPACE = "NotEnoughSpace"


def upperpower2(x: int) -> int:
    """Round up to a power of two (src/bitsutil.h:21-31)."""
    if x <= 1:
        return 1
    return 1 << (int(x - 1).bit_length())


def _reduce32(h: np.ndarray, n: int) -> np.ndarray:
    """Lemire reduce: ((h & 0xffffffff) * n) >> 32 (src/cuckoofilter_stable.h:15-18)."""
    return ((h & U64(0xFFFFFFFF)) * U64(n)) >> U64(32)


@dataclass
class BulkResult:
    ok: int
    overflow: int  # chains lost past victim (NotEnoughSpace)


class CuckooFilter:
    """A single cuckoo-filter shard (one logical filter or one partition of one)."""

    KIND = "cuckoo"

    __slots__ = ("num_buckets", "bits_per_tag", "seed", "variant", "tags",
                 "num_items", "victim_index", "victim_tag", "victim_used",
                 "_rng", "_kick_counter", "occ", "_scratch", "hash_family",
                 "_rand_pool", "_rand_pos")

    def __init__(self, num_buckets: int, bits_per_tag: int = 12,
                 seed: int = DEFAULT_SEED, variant: str = "pow2",
                 hash_family: str = "mix"):
        if bits_per_tag > 16:
            raise ValueError("kernel stores tags as uint16; bits_per_tag <= 16")
        if variant == "pow2" and num_buckets & (num_buckets - 1):
            raise ValueError("pow2 variant requires power-of-two num_buckets")
        if variant == "stable" and num_buckets % 2:
            raise ValueError("stable variant requires even num_buckets")
        self.num_buckets = int(num_buckets)
        self.bits_per_tag = int(bits_per_tag)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.variant = variant
        # selectable item-hash family (src/cuckoofilter.h:32-35 templates on
        # HashFamily, default TwoIndependentMultiplyShift): "mix" | "tims"
        self.hash_family = hash_family
        self.tags = np.zeros((self.num_buckets, TAGS_PER_BUCKET), dtype=np.uint16)
        # Compact-slot invariant: the nonzero tags of bucket b are exactly
        # tags[b, :occ[b]].  Contain doesn't care about slot order (the
        # reference probes all four, src/singletable.h:148-173), so inserts
        # fill left-to-right and deletes swap the last tag into the hole —
        # this removes the per-row empty-slot search from the insert path.
        self.occ = np.zeros(self.num_buckets, dtype=np.uint8)
        self._scratch = None  # lazy per-bucket scatter-race cells (bulk adds)
        self.num_items = 0
        self.victim_index = 0
        self.victim_tag = 0
        self.victim_used = False
        # Deterministic kick RNG (replaces the reference's global rand()).
        self._rng = np.random.default_rng((self.seed, self.num_buckets, self.bits_per_tag))
        self._kick_counter = 0
        self._rand_pool = None   # pre-drawn kick-slot picks (see _rand_slots)
        self._rand_pos = 0

    # ------------------------------------------------------------------ sizing

    @classmethod
    def create(cls, capacity: int, bits_per_tag: int = 12,
               seed: int = DEFAULT_SEED, variant: str = "pow2",
               hash_family: str = "mix") -> "CuckooFilter":
        """Size per the reference constructors.

        pow2:   num_buckets = upperpower2(max(1, n/4)), doubled if the load
                would exceed 0.94 (src/cuckoofilter.h:91-100).
        stable: bucketCount = int(10 + n/0.94/4) / 2 * 2
                (src/cuckoofilter_stable.h:115).
        """
        capacity = max(0, int(capacity))
        if variant == "pow2":
            nb = upperpower2(max(1, capacity // TAGS_PER_BUCKET))
            if capacity / (nb * TAGS_PER_BUCKET) > 0.94:
                nb <<= 1
        elif variant == "stable":
            nb = int((10 + capacity / 0.94 / TAGS_PER_BUCKET) / 2) * 2
        else:
            raise ValueError(f"unknown variant {variant!r}")
        return cls(nb, bits_per_tag=bits_per_tag, seed=seed, variant=variant,
                   hash_family=hash_family)

    # ------------------------------------------------------------- hash stages

    def _index_tag(self, keys) -> tuple[np.ndarray, np.ndarray]:
        """(i1, tag) per key — src/cuckoofilter.h:66-73 / cuckoofilter_stable.h:60-65."""
        h = hash_key64(keys, self.seed, self.hash_family)
        mask = U64((1 << self.bits_per_tag) - 1)
        if self.variant == "pow2":
            i1 = (h >> U64(32)) & U64(self.num_buckets - 1)
            tag = h & mask
        else:
            i1 = _reduce32(h, self.num_buckets)
            tag = (h >> U64(32)) & mask
        tag = tag + (tag == 0)  # 0 means empty slot; remap (src/cuckoofilter.h:62)
        return i1.astype(np.int64), tag.astype(np.uint16)

    def alt_index(self, idx: np.ndarray, tag: np.ndarray) -> np.ndarray:
        """Partial-key alternate bucket; an involution in both variants."""
        idx = np.asarray(idx, dtype=np.int64)
        t = np.asarray(tag, dtype=np.uint64)
        if self.variant == "pow2":
            # uint32 arithmetic: (i ^ tag*0x5bd1e995) & (nb-1)  (cuckoofilter.h:75-81)
            x = (idx.astype(np.uint64) ^ (t * U64(_MURMUR_C))) & U64(0xFFFFFFFF)
            return (x & U64(self.num_buckets - 1)).astype(np.int64)
        h = t * U64(_STABLE_C)
        r = (_reduce32(h, self.num_buckets >> 1).astype(np.int64) << 1) + 1
        b2 = self.num_buckets - idx - r
        return np.where(b2 < 0, b2 + self.num_buckets, b2)

    # --------------------------------------------------------------- bulk core

    def _place_empty(self, buckets: np.ndarray,
                     tags: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized InsertTagToBucket(empty-slot path) via a scatter race —
        O(n), no sort.

        Every chain writes its index into a persistent per-bucket scratch
        cell; the last writer per bucket ("winner") claims slot ``occ[b]``
        (compact-slot invariant).  Losers — same-bucket collisions within the
        batch, rare since buckets ≫ batch — simply retry next round.  Returns
        ``(placed, full)`` masks: ``full`` marks winners whose bucket had no
        free slot (those chains must advance to alt/kick; losers must NOT).
        """
        n = len(buckets)
        if n == 0:
            z = np.zeros(0, dtype=bool)
            return z, z
        if n == 1:      # victim re-insertion / scalar adds: skip the scratch
            b = int(buckets[0])
            o = int(self.occ[b])
            if o < TAGS_PER_BUCKET:
                self.tags[b, o] = tags[0]
                self.occ[b] = o + 1
                return np.ones(1, dtype=bool), np.zeros(1, dtype=bool)
            return np.zeros(1, dtype=bool), np.ones(1, dtype=bool)
        if self._scratch is None:
            self._scratch = np.empty(self.num_buckets, dtype=np.int64)
        scratch = self._scratch
        idx = np.arange(n)
        scratch[buckets] = idx
        winner = scratch[buckets] == idx
        occ_w = self.occ[buckets]
        placed = winner & (occ_w < TAGS_PER_BUCKET)
        bw = buckets[placed]
        self.tags[bw, occ_w[placed]] = tags[placed]
        self.occ[bw] = occ_w[placed] + 1
        full = winner & (occ_w >= TAGS_PER_BUCKET)
        return placed, full

    def _rand_slots(self, n: int) -> np.ndarray:
        """Kick-slot picks from a pre-drawn pool (one Generator call per
        ~4096 picks instead of one per kick round)."""
        pool = self._rand_pool
        if pool is None or self._rand_pos + n > len(pool):
            self._rand_pool = pool = self._rng.integers(
                0, TAGS_PER_BUCKET, size=max(4096, n), dtype=np.int64)
            self._rand_pos = 0
        out = pool[self._rand_pos:self._rand_pos + n]
        self._rand_pos += n
        return out

    # below this chain count the fixed cost of a vectorized round (~15 numpy
    # calls) exceeds a scalar walk over every remaining chain
    _SEQ_TAIL = 64

    def _finish_chains(self, cur_i, cur_t, kicks, phase) -> tuple[int, int, int]:
        """Scalar AddImpl walk (cuckoofilter.h:156-181) for the residual
        chains once the vectorized rounds have thinned the batch — the long
        kick cascades near full load are inherently sequential, and plain
        int arithmetic beats a 15-op numpy round at <~64 chains."""
        ok = parked = overflow = 0
        tags, occ = self.tags, self.occ
        nb = self.num_buckets
        pow2 = self.variant == "pow2"
        mask_nb = nb - 1
        half = nb >> 1
        m64 = (1 << 64) - 1
        rand = self._rand_slots
        for j in range(len(cur_i)):
            i, t = int(cur_i[j]), int(cur_t[j])
            kc, ph = int(kicks[j]), int(phase[j])
            while True:
                # budget check FIRST: the chain parks at the alt bucket of the
                # kick that exhausted the budget, with no placement attempt
                # there — matching the vectorized dead-check above and the
                # reference loop bound (src/cuckoofilter.h:156-181).
                if kc >= MAX_KICKS:
                    if not self.victim_used:
                        self.victim_index, self.victim_tag = i, t
                        self.victim_used = True
                        parked += 1   # Ok but not in num_items_
                                      # (src/cuckoofilter.h:177-181)
                    else:
                        overflow += 1
                    break
                o = occ[i]
                if o < TAGS_PER_BUCKET:
                    tags[i, o] = t
                    occ[i] = o + 1
                    ok += 1
                    break
                if ph == 1:           # kick a random resident, carry it
                    r = int(rand(1)[0])
                    old = int(tags[i, r])
                    tags[i, r] = t
                    t = old
                    kc += 1
                else:
                    ph = 1
                # scalar alt_index (involutions identical to the vector form)
                if pow2:
                    i = (i ^ (t * _MURMUR_C)) & mask_nb
                else:
                    h = (t * _STABLE_C) & m64
                    r2 = (((h & 0xFFFFFFFF) * half) >> 32) * 2 + 1
                    i = nb - i - r2
                    if i < 0:
                        i += nb
        return ok, parked, overflow

    def _insert_pairs(self, idx: np.ndarray, tags: np.ndarray) -> BulkResult:
        """AddImpl over vectors of (first-choice bucket, tag) (cuckoofilter.h:156-181).

        Chains run in vectorized rounds: grouped empty-slot placement, then a
        move to the alternate bucket, then kick rounds (one kick per distinct
        bucket per round).  Once the batch thins below _SEQ_TAIL the residual
        chains finish on the scalar walk.  Chains whose kick count exceeds
        MAX_KICKS park in the victim cache (one) or overflow (NotEnoughSpace).
        """
        cur_i = np.asarray(idx, dtype=np.int64).copy()
        cur_t = np.asarray(tags, dtype=np.uint16).copy()
        kicks = np.zeros(len(cur_i), dtype=np.int32)
        phase = np.zeros(len(cur_i), dtype=np.int8)  # 0: at i1, 1: kick-on-full
        ok = 0
        parked = 0
        overflow = 0
        while len(cur_i):
            if len(cur_i) <= self._SEQ_TAIL:
                o, p, of = self._finish_chains(cur_i, cur_t, kicks, phase)
                ok += o
                parked += p
                overflow += of
                break
            placed, full = self._place_empty(cur_i, cur_t)
            ok += int(placed.sum())
            if placed.all():
                break
            keep = ~placed
            full = full[keep]
            cur_i, cur_t, kicks, phase = cur_i[keep], cur_t[keep], kicks[keep], phase[keep]
            # chains whose FIRST bucket is confirmed full: move to the
            # alternate and retry (scatter-race losers keep full=False and
            # simply retry the same bucket next round)
            fresh = full & (phase == 0)
            if fresh.any():
                cur_i[fresh] = self.alt_index(cur_i[fresh], cur_t[fresh])
                phase[fresh] = 1
            # kick step: one chain per distinct confirmed-full alt bucket
            # (dedup by scatter race — O(n), no sort; the arbitrary winner
            # replaces np.unique's first-occurrence pick, equally valid)
            kickable = full & (phase == 1) & ~fresh
            if kickable.any():
                kidx = np.flatnonzero(kickable)
                b_all = cur_i[kidx]
                self._scratch[b_all] = kidx
                sel = kidx[self._scratch[b_all] == kidx]
                b = cur_i[sel]
                r = self._rand_slots(len(sel))
                old = self.tags[b, r].copy()
                self.tags[b, r] = cur_t[sel]
                cur_t[sel] = old
                cur_i[sel] = self.alt_index(b, old)
                kicks[sel] += 1
            # retire chains past the kick budget → victim / overflow
            dead = kicks >= MAX_KICKS
            if dead.any():
                for pos in np.flatnonzero(dead):
                    if not self.victim_used:
                        self.victim_index = int(cur_i[pos])
                        self.victim_tag = int(cur_t[pos])
                        self.victim_used = True
                        parked += 1  # park returns Ok but does NOT count in
                                     # num_items_ (src/cuckoofilter.h:177-181)
                    else:
                        overflow += 1
                keep = ~dead
                cur_i, cur_t, kicks, phase = cur_i[keep], cur_t[keep], kicks[keep], phase[keep]
        self.num_items += ok
        return BulkResult(ok=ok + parked, overflow=overflow)

    # ------------------------------------------------------------- public bulk

    # Bulk calls self-chunk: one giant batch pays O(n log n) argsorts and
    # blows the cache with (n,4) gather temporaries — ~32-64k chunks measured
    # 4-6x faster than a single 600k-key call on this kernel.
    _ADD_CHUNK = 32768
    _PROBE_CHUNK = 65536

    def add_batch(self, keys) -> BulkResult:
        """Vectorized Add of a key batch.  Keys are NotEnoughSpace-blocked
        once the victim cache is occupied (matching sequential Add,
        src/cuckoofilter.h:148-150, at chunk granularity)."""
        keys = np.asarray(keys, dtype=np.uint64)
        ok = overflow = 0
        for s in range(0, max(1, len(keys)), self._ADD_CHUNK):
            chunk = keys[s:s + self._ADD_CHUNK]
            if self.victim_used:
                overflow += len(keys) - s
                break
            i1, tag = self._index_tag(chunk)
            r = self._insert_pairs(i1, tag)
            ok += r.ok
            overflow += r.overflow
        return BulkResult(ok=ok, overflow=overflow)

    _LANES = np.uint64(0x0001000100010001)
    _HIGHS = np.uint64(0x8000800080008000)

    def contain_batch(self, keys) -> np.ndarray:
        """Vectorized Contain (src/cuckoofilter.h:183-204). Returns bool array.

        Each 4×uint16 bucket row is gathered as ONE uint64 and probed with
        the reference's SWAR ``hasvalue16`` (src/singletable.h:148-173,
        src/bitsutil.h:8-19) — two 8-byte gathers per key instead of two
        (n, 4) comparisons.
        """
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        tags64 = self.tags.view(np.uint64).reshape(-1)
        found = np.empty(n, dtype=bool)
        for s in range(0, n, self._PROBE_CHUNK):
            chunk = keys[s:s + self._PROBE_CHUNK]
            i1, tag = self._index_tag(chunk)
            i2 = self.alt_index(i1, tag)
            pat = tag.astype(np.uint64) * self._LANES
            w1 = tags64[i1] ^ pat
            w2 = tags64[i2] ^ pat
            hit = (((w1 - self._LANES) & ~w1 & self._HIGHS) != 0) | \
                  (((w2 - self._LANES) & ~w2 & self._HIGHS) != 0)
            if self.victim_used:
                hit |= (tag == self.victim_tag) & (
                    (i1 == self.victim_index) | (i2 == self.victim_index))
            found[s:s + self._PROBE_CHUNK] = hit
        return found

    def delete_batch(self, keys) -> np.ndarray:
        """Vectorized Delete (src/cuckoofilter.h:206-238) in scatter-race
        rounds, like the insert path: per round, one delete per contested
        bucket wins and consumes one matching slot (compact-remove); losers
        retry, misses advance i1→i2, i2-misses are NotFound.  Duplicate
        deletes in one batch each consume their own copy.  Falls back to the
        sequential loop when a victim is parked (resurrection is
        order-dependent, src/cuckoofilter.h:230-237 — and rare).
        Returns bool array: True = deleted, False = NotFound.
        """
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if n > self._ADD_CHUNK:         # self-chunk like the other bulk ops
            return np.concatenate([
                self.delete_batch(keys[s:s + self._ADD_CHUNK])
                for s in range(0, n, self._ADD_CHUNK)])
        i1s, tags = self._index_tag(keys)
        i2s = self.alt_index(i1s, tags)
        out = np.zeros(n, dtype=bool)
        if self.victim_used or n == 1:
            for k in range(n):
                out[k] = self._delete_one(int(i1s[k]), int(i2s[k]), int(tags[k]))
            return out
        if self._scratch is None:
            self._scratch = np.empty(self.num_buckets, dtype=np.int64)
        cur_b = i1s.copy()
        phase = np.zeros(n, dtype=np.int8)
        active = np.arange(n)
        n_deleted = 0
        while len(active):
            b = cur_b[active]
            pos = np.arange(len(active))
            self._scratch[b] = pos
            winner = self._scratch[b] == pos
            wpos = np.flatnonzero(winner)
            w = active[wpos]
            bw = cur_b[w]                      # unique buckets this round
            occ_w = self.occ[bw].astype(np.int64)
            rows = self.tags[bw]               # (m, 4)
            hits = (rows == tags[w][:, None]) & \
                (np.arange(TAGS_PER_BUCKET)[None, :] < occ_w[:, None])
            has_hit = hits.any(axis=1)
            slot = hits.argmax(axis=1)
            # compact-remove for winners with a hit (bw unique ⇒ safe scatter)
            hb, hs, ho = bw[has_hit], slot[has_hit], occ_w[has_hit]
            self.tags[hb, hs] = self.tags[hb, ho - 1]
            self.tags[hb, ho - 1] = 0
            self.occ[hb] = (ho - 1).astype(np.uint8)
            n_deleted += len(hb)
            out[w[has_hit]] = True
            # winners that missed at i1 advance to i2; i2-misses are NotFound
            was0 = phase[w] == 0
            adv = w[~has_hit & was0]
            cur_b[adv] = i2s[adv]
            phase[adv] = 1
            # keep losers (retry same bucket) and advanced winners; drop
            # successes and phase-1 misses
            keep_mask = np.ones(len(active), dtype=bool)
            keep_mask[wpos[has_hit | ~was0]] = False
            active = active[keep_mask]
        self.num_items -= n_deleted
        return out

    def _delete_one(self, i1: int, i2: int, tag: int) -> bool:
        for b in (i1, i2):
            o = int(self.occ[b])
            row = self.tags[b]
            hit = np.flatnonzero(row[:o] == tag)
            if len(hit):
                # compact-slot invariant: swap the last occupied tag into the hole
                row[hit[0]] = row[o - 1]
                row[o - 1] = 0
                self.occ[b] = o - 1
                self.num_items -= 1
                self._try_eliminate_victim()
                return True
        if self.victim_used and tag == self.victim_tag and \
                (i1 == self.victim_index or i2 == self.victim_index):
            self.victim_used = False
            return True
        return False

    def _try_eliminate_victim(self) -> None:
        """After a successful delete, re-insert a parked victim
        (src/cuckoofilter.h:230-237)."""
        if self.victim_used:
            self.victim_used = False
            res = self._insert_pairs(np.array([self.victim_index], dtype=np.int64),
                                     np.array([self.victim_tag], dtype=np.uint16))
            # _insert_pairs bumps num_items on success; reference's AddImpl does
            # the same after Delete's num_items_-- so counts stay consistent.
            del res

    # ----------------------------------------------------------------- scalar

    def add(self, key: int) -> str:
        """Scalar Add with exact reference status algebra."""
        if self.victim_used:
            return NOT_ENOUGH_SPACE
        res = self.add_batch(np.array([key], dtype=np.uint64))
        return OK if (res.ok == 1 or self.victim_used) else NOT_ENOUGH_SPACE

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    def delete(self, key: int) -> str:
        return OK if self.delete_batch(np.array([key], dtype=np.uint64))[0] else NOT_FOUND

    # ------------------------------------------------------------------ merge

    def merge(self, other: "CuckooFilter") -> BulkResult:
        """Associative merge by fingerprint re-insertion (SURVEY.md §4.3.2;
        contract modeled on qf_merge, src/gqf.h:307-310)."""
        if (self.seed, self.num_buckets, self.bits_per_tag, self.variant,
                self.hash_family) != \
                (other.seed, other.num_buckets, other.bits_per_tag,
                 other.variant, other.hash_family):
            raise ValueError("merge requires identical (seed, num_buckets, "
                             "bits_per_tag, variant, hash_family)")
        bs, ss = np.nonzero(other.tags)
        res = self._insert_pairs(bs.astype(np.int64), other.tags[bs, ss])
        if other.victim_used:
            vres = self._insert_pairs(np.array([other.victim_index], dtype=np.int64),
                                      np.array([other.victim_tag], dtype=np.uint16))
            res = BulkResult(ok=res.ok + vres.ok, overflow=res.overflow + vres.overflow)
        return res

    # ------------------------------------------------------------------ stats

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        """SingleTable: ceil(4*bits/8) bytes per bucket (src/singletable.h:26-36)."""
        return ((self.bits_per_tag * TAGS_PER_BUCKET + 7) // 8) * self.num_buckets

    def load_factor(self) -> float:
        return self.num_items / (self.num_buckets * TAGS_PER_BUCKET)

    def bits_per_item(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.num_items)

    def recompact(self) -> None:
        """Restore the compact-slot invariant after a raw ``tags`` load
        (deserialization; the semisort codec reorders slots within a bucket)."""
        nz = self.tags != 0
        self.occ = nz.sum(axis=1).astype(np.uint8)
        order = np.argsort(~nz, axis=1, kind="stable")
        self.tags = np.ascontiguousarray(np.take_along_axis(self.tags, order, axis=1))

    def info(self) -> dict:
        return {
            "kind": self.KIND,
            "variant": self.variant,
            "bits_per_tag": self.bits_per_tag,
            "num_buckets": self.num_buckets,
            "num_items": self.num_items,
            "load_factor": self.load_factor(),
            "size_in_bytes": self.size_in_bytes(),
        }
