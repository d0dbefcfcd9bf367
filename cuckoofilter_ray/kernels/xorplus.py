"""Xor+ filter — xor filter with a rank-compressed third segment.

Value-level re-expression of ``/root/reference/src/xorfilter_plus.h``
(XorFilterPlus):

- same 3-segment peeling construction as the xor filter, but with the
  plus-variant's position derivation (LOW 32 bits of ``hash``/``rotl21``/
  ``rotl42`` Lemire-reduced onto a block, xorfilter_plus.h:449-455) and a
  low-bits fingerprint (``(FingerprintType) hash``, :197-199);
- after construction, the third segment's ZERO cells are dropped: a
  ``block_length``-bit bitmap marks the nonzero cells and a Rank9
  rank-select structure (:36-120) maps a cell index to its position in the
  dense array (:410-441).  Contain XORs ``fp ^ seg[h0] ^ seg[h1]`` and, only
  if the bitmap bit is set, the dense third-segment entry at
  ``rank(h2a)`` (:445-464) — membership iff the result is 0;
- ``SizeInBytes`` = (2·block_length + set_bits) fingerprints + the rank
  structure (:440-441) — the ~19% empty cells of one segment bought back,
  ≈ 8.6 bits/key at 8-bit fingerprints vs the xor filter's 9.84.

The engine stores the packed bitmap + dense segment at rest and expands
only an int32 rank-prefix array (``cumsum`` of the bitmap) per worker at
load — the vectorized stand-in for Rank9, whose block counts are a
memory-layout device, not semantics.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED
from .xor import XorFilter

U64 = np.uint64


class XorFilterPlus(XorFilter):
    KIND = "xorplus"
    #: peel lower segments first so segment 2 stays sparse (see xor.py)
    PEEL_SEGMENT_PRIORITY = True

    __slots__ = ("bitmap_bits", "dense3", "_rank_prefix", "_bitmap")

    def __init__(self, capacity: int, bits_per_tag: int = 8,
                 seed: int = DEFAULT_SEED):
        super().__init__(capacity, bits_per_tag=bits_per_tag, seed=seed)
        self.bitmap_bits = np.zeros(0, dtype=np.uint8)   # packed bitmap
        self.dense3 = np.zeros(0, dtype=self.fingerprints.dtype)
        self._rank_prefix = None
        self._bitmap = None

    # plus-variant position derivation: LOW 32 bits of the rotations
    # (xorfilter_plus.h:449-455), vs the xor filter's high 32
    def _positions(self, h: np.ndarray):
        bl = U64(self.block_length)
        r1 = np.bitwise_or(h << U64(21), h >> U64(43))
        r2 = np.bitwise_or(h << U64(42), h >> U64(22))
        m = U64(0xFFFFFFFF)
        # uint64 positions, no astype copies (see XorFilter._positions)
        h0 = ((h & m) * bl) >> U64(32)
        h1 = (((r1 & m) * bl) >> U64(32)) + U64(self.block_length)
        h2 = (((r2 & m) * bl) >> U64(32)) + U64(2 * self.block_length)
        return h0, h1, h2

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        # (FingerprintType) hash — low bits (xorfilter_plus.h:197-199)
        return (h & U64((1 << self.bits_per_tag) - 1)) \
            .astype(self.fingerprints.dtype)

    # ----------------------------------------------------------------- build

    def add_all(self, keys) -> None:
        super().add_all(keys)            # peel + assign into self.fingerprints
        bl = self.block_length
        seg3 = self.fingerprints[2 * bl:]
        nz = seg3 != 0
        self.bitmap_bits = np.packbits(nz.astype(np.uint8), bitorder="little")
        self.dense3 = seg3[nz].copy()
        # keep only the first two segments dense; third lives compressed
        self.fingerprints = self.fingerprints[:2 * bl].copy()
        self._rank_prefix = None
        self._bitmap = None

    # ----------------------------------------------------------------- query

    def _ranks(self) -> tuple[np.ndarray, np.ndarray]:
        """(bool bitmap, exclusive rank prefix) — expanded once per worker."""
        if self._rank_prefix is None:
            bits = np.unpackbits(self.bitmap_bits,
                                 bitorder="little")[:self.block_length]
            self._bitmap = bits.astype(bool)
            b32 = bits.astype(np.int32)
            self._rank_prefix = np.cumsum(b32, dtype=np.int32) - b32
        return self._bitmap, self._rank_prefix

    def contain_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        if not self._built:
            return np.zeros(len(keys), dtype=bool)
        h = self._hash(keys, self.build_seed)
        f = self._fingerprint(h)
        h0, h1, h2 = self._positions(h)
        f = f ^ self.fingerprints[h0] ^ self.fingerprints[h1]
        h2a = h2 - 2 * self.block_length
        bitmap, rank = self._ranks()
        setm = bitmap[h2a]
        if setm.any() and len(self.dense3):
            f[setm] ^= self.dense3[rank[h2a[setm]]]
        return f == 0

    # ----------------------------------------------------------------- stats

    def size_in_bytes(self) -> int:
        """(2·bl + set_bits)·fp_bytes + Rank9 bit count (bitmap + 25% counts
        overhead, xorfilter_plus.h:440-441)."""
        fp_bytes = self.fingerprints.dtype.itemsize
        rank_bits = int(self.block_length * 1.25)
        return (2 * self.block_length + len(self.dense3)) * fp_bytes \
            + (rank_bits + 7) // 8

    def bits_per_item(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.num_items)


class XorFilter2n(XorFilter):
    """Xor filter with power-of-two blocks — mask instead of Lemire reduce.

    Value-level re-expression of /root/reference/src/xorfilter_2n.h:
    ``blockLength`` rounds UP to a power of two (:72-77, paying up to 2x
    slots for a cheaper position derivation); positions are the LOW bits of
    ``hash`` / ``rotl21`` / ``rotl42`` masked by ``blockLength - 1``
    (:119-121, :32-46).

    DELIBERATE DEVIATION: the reference fingerprints with the hash's low
    bits (:63-65), which are a SUBSET of the ``h0`` position bits under the
    pow2 mask — the fingerprint cancels out of the membership equation for
    any negative landing on a member's ``h0`` cell and measured FPR
    collapses to ~30%.  The engine keeps the base xor filter's decorrelated
    ``(h ^ h>>32) & mask`` fingerprint; everything else follows the 2n
    construction.
    """

    KIND = "xor2n"

    __slots__ = ()

    def __init__(self, capacity: int, bits_per_tag: int = 8,
                 seed: int = DEFAULT_SEED):
        super().__init__(capacity, bits_per_tag=bits_per_tag, seed=seed)
        bl = 1
        while bl < self.block_length:
            bl *= 2
        self.block_length = bl
        self.fingerprints = np.zeros(3 * bl, dtype=self.fingerprints.dtype)

    def _positions(self, h: np.ndarray):
        m = U64(self.block_length - 1)
        r1 = np.bitwise_or(h << U64(21), h >> U64(43))
        r2 = np.bitwise_or(h << U64(42), h >> U64(22))
        return ((h & m),
                (r1 & m) + U64(self.block_length),
                (r2 & m) + U64(2 * self.block_length))
