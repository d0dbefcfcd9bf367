"""Exact linear-probing hash sets — ``Dict`` / ``SizedDict`` /
``SimdSizedDict`` from ``/root/reference/src/linear-probing.h``.

Layout-parity kernels: for an identical insertion order the payload arrays
are **byte-identical** to the reference (same 128-bit multiply-shift home
slots, same probe walk, same doubling Upsize at 3/4 load for ``Dict``,
same 16-lane block placement for ``SimdSizedDict``) — pinned by tests
against a g++ build of linear-probing.h.

Role in the engine: the reference uses these as exact ground truth and as
the crate filter's spare structure (src/crate.h:401,438).  The engine's
production exact-set paths are Arrow joins / sorted-array verifies
(stages/aggregate.py ExactDistinct, stages/membership.py semijoin) — this
kernel exists for reference parity and as :class:`CrateFilter`'s spare.
Inserts are sequential by contract (linear probing's final layout depends
on arrival order); batch ``contains_batch`` is vectorized round-lockstep
(gather the k-th probe position of every active key at once).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
MASK64 = 0xFFFFFFFFFFFFFFFF

#: linear-probing.h:18-21 kSeed (128-bit); Dict/SizedDict use the full
#: constant, SimdSizedDict the uint64 truncation (linear-probing.h:158-162)
KSEED128 = (0x7EBD4829C30942CF << 64) | 0xAFAAF09F73E01172
KSEED64 = 0xAFAAF09F73E01172


def _dict_hash(x: int) -> int:
    """Dict::Hash — high 64 bits of kSeed128 * x (linear-probing.h:17-22)."""
    return ((KSEED128 * x) >> 64) & MASK64


def _dict_hash_vec(keys: np.ndarray) -> np.ndarray:
    """Vectorized _dict_hash: hi64(kSeed128 * x) = hi64(lo64(kSeed) * x)
    + lo64(hi64(kSeed) * x) (mod 2^64)."""
    from .hashing import two_independent_multiply_shift
    k = np.asarray(keys, dtype=np.uint64)
    hi_part = two_independent_multiply_shift(k, KSEED64, 0)
    return hi_part + k * U64(KSEED128 >> 64)


class Dict:
    """Power-of-two linear-probing set (linear-probing.h:7-82): doubling
    Upsize at ``4*ndv > 3*mask``, home slot = hash & mask, wrap by mask."""

    __slots__ = ("mask", "payload", "ndv", "has_zero")

    def __init__(self, mask: int = 0b1111):
        assert (mask & (mask + 1)) == 0
        self.mask = mask
        self.payload = np.zeros(mask + 1, dtype=np.uint64)
        self.ndv = 0
        self.has_zero = False

    def size_in_bytes(self) -> int:
        return 8 * (self.mask + 1)                    # payload array only

    def _upsize(self) -> None:                        # linear-probing.h:44-51
        old = self.payload
        self.mask = self.mask * 2 + 1
        self.payload = np.zeros(self.mask + 1, dtype=np.uint64)
        self.ndv = 0
        for v in old[old != 0]:
            self._insert_one(int(v))

    def _insert_one(self, x: int) -> bool:
        i = _dict_hash(x) & self.mask
        p = self.payload
        while True:
            v = int(p[i])
            if v == 0:
                p[i] = x
                self.ndv += 1
                return True
            if v == x:
                return False
            i = (i + 1) & self.mask

    def insert(self, x: int) -> bool:                 # linear-probing.h:53-68
        if 4 * self.ndv > 3 * self.mask:
            self._upsize()
        if x == 0:
            self.has_zero = True
            return True
        return self._insert_one(x)

    def add_batch(self, keys) -> int:
        """Sequential inserts in array order (layout is order-dependent);
        returns the number of NEW keys."""
        return sum(self.insert(int(k)) for k in np.asarray(keys).ravel())

    def contains_batch(self, keys) -> np.ndarray:
        """Vectorized probe: round-lockstep — gather every active key's k-th
        probe slot at once; resolve on zero (miss) or match (hit)."""
        k = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(k), dtype=bool)
        zero = k == U64(0)
        out[zero] = self.has_zero
        active = np.flatnonzero(~zero)
        pos = _dict_hash_vec(k[active]) & U64(self.mask)
        while len(active):
            got = self.payload[pos.astype(np.int64)]
            hit = got == k[active]
            out[active[hit]] = True
            cont = ~hit & (got != 0)
            active = active[cont]
            pos = (pos[cont] + U64(1)) & U64(self.mask)
        return out

    def contains(self, x: int) -> bool:
        return bool(self.contains_batch(np.array([x], dtype=np.uint64))[0])


class SizedDict:
    """Fixed-capacity variant (linear-probing.h:84-141): capacity =
    ``max_ndv / 0.5``, home slot = (capacity * hash) >> 64, wrap to 0."""

    __slots__ = ("capacity", "payload", "ndv", "has_zero")

    def __init__(self, max_ndv: int):
        self.capacity = int(max_ndv / 0.5)            # double-arithmetic parity
        self.payload = np.zeros(self.capacity + 1, dtype=np.uint64)
        self.ndv = 0
        self.has_zero = False

    def size_in_bytes(self) -> int:
        return 8 * self.capacity

    def _home(self, x: int) -> int:
        return (self.capacity * _dict_hash(x)) >> 64

    def insert(self, x: int) -> bool:                 # linear-probing.h:113-127
        if x == 0:
            self.has_zero = True
            return True
        if self.ndv >= self.capacity:                 # engine guard: the
            raise RuntimeError("SizedDict overfull")  # reference spins forever
        i = self._home(x)
        p = self.payload
        while True:
            v = int(p[i])
            if v == 0:
                p[i] = x
                self.ndv += 1
                return True
            if v == x:
                return False
            i = 0 if i + 1 >= self.capacity else i + 1

    def add_batch(self, keys) -> int:
        return sum(self.insert(int(k)) for k in np.asarray(keys).ravel())

    def contains_batch(self, keys) -> np.ndarray:
        k = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(k), dtype=bool)
        zero = k == U64(0)
        out[zero] = self.has_zero
        active = np.flatnonzero(~zero)
        h = _dict_hash_vec(k[active])
        # (capacity * hash) >> 64 via the 128-bit limb helper
        from .hashing import two_independent_multiply_shift
        pos = two_independent_multiply_shift(h, self.capacity, 0) \
            .astype(np.int64)
        cap = self.capacity
        while len(active):
            got = self.payload[pos]
            hit = got == k[active]
            out[active[hit]] = True
            cont = ~hit & (got != 0)
            active = active[cont]
            pos = pos[cont] + 1
            pos[pos >= cap] = 0
        return out

    def contains(self, x: int) -> bool:
        return bool(self.contains_batch(np.array([x], dtype=np.uint64))[0])


class SimdSizedDict:
    """16-lane blocked variant (linear-probing.h:143-212) — uint32 keys,
    blocks of 16 lanes (one __m512i in the reference), home BLOCK =
    (capacity * ((kSeed64 * x) >> 32)) >> 32, first zero lane within the
    block; the crate filter's spare (src/crate.h:401).

    ``payload`` is a ``(capacity, 16)`` uint32 array — byte-identical to the
    reference's ``payload_512_`` for the same insertion order."""

    __slots__ = ("capacity", "payload", "ndv", "has_zero")

    def __init__(self, max_ndv: int, _grow: bool = False):
        # double-arithmetic parity with linear-probing.h:168-171
        self.capacity = max(1, int((max_ndv / 0.8 + 15) / 16))
        self.payload = np.zeros((self.capacity, 16), dtype=np.uint32)
        self.ndv = 0
        self.has_zero = False

    def size_in_bytes(self) -> int:
        return 64 * self.capacity

    def _home_vec(self, x: np.ndarray) -> np.ndarray:
        partial = (U64(KSEED64) * x.astype(np.uint64)) >> U64(32)
        return ((U64(self.capacity) * partial) >> U64(32)).astype(np.int64)

    def _upsize(self) -> None:
        """Engine-only guard: the reference spins forever on a full dict;
        we double capacity and re-insert (arrival order is lost, which is
        fine — parity tests never trigger this path)."""
        old = self.payload
        old_zero = self.has_zero
        self.capacity *= 2
        self.payload = np.zeros((self.capacity, 16), dtype=np.uint32)
        self.ndv = 0
        self.has_zero = old_zero
        for v in old.ravel()[old.ravel() != 0]:
            self.insert(int(v))

    def insert(self, x: int) -> bool:                 # linear-probing.h:179-195
        x &= 0xFFFFFFFF
        if x == 0:
            self.has_zero = True
            return True
        if 10 * self.ndv >= 9 * self.capacity * 16:
            self._upsize()
        i = int(self._home_vec(np.array([x], dtype=np.uint32))[0])
        p = self.payload
        while True:
            block = p[i]
            if (block == x).any():
                return False
            zeros = np.flatnonzero(block == 0)
            if len(zeros):
                p[i, zeros[0]] = x
                self.ndv += 1
                return True
            i = 0 if i + 1 >= self.capacity else i + 1

    def add_batch(self, keys) -> int:
        return sum(self.insert(int(k)) for k in np.asarray(keys).ravel())

    def contains_batch(self, keys) -> np.ndarray:
        """Vectorized ContainsKeyWithHash over every key at once: gather the
        k-th probe block ((m,16) per round), hit on any lane match, miss on
        any zero lane (linear-probing.h:204-211)."""
        k = np.asarray(keys, dtype=np.uint64).astype(np.uint32)
        out = np.zeros(len(k), dtype=bool)
        zero = k == np.uint32(0)
        out[zero] = self.has_zero
        active = np.flatnonzero(~zero)
        pos = self._home_vec(k[active])
        cap = self.capacity
        while len(active):
            blocks = self.payload[pos]                      # (m, 16)
            hit = (blocks == k[active][:, None]).any(axis=1)
            out[active[hit]] = True
            cont = ~hit & ~(blocks == 0).any(axis=1)
            active = active[cont]
            pos = pos[cont] + 1
            pos[pos >= cap] = 0
        return out

    def contains(self, x: int) -> bool:
        return bool(self.contains_batch(np.array([x], dtype=np.uint64))[0])
