"""N-bit packed fingerprint storage — value-level port of
``/root/reference/src/nbit_array.h`` (the ``XorFilter2`` storage variants
benched in ``benchmarks/bulk-insert-and-query.cc:784,937,944``).

Two at-rest layouts, byte-identical to the reference (parity pinned in
``tests/test_kernels_nbit.py`` via FNV-1a digests of a g++ build's buffer):

- :class:`NBitArray` — MSB-first packed bit stream (``nbit_array.h:87-124``):
  entry ``i`` occupies stream bits ``[i*b, (i+1)*b)``, where stream bit ``p``
  is bit ``7-(p&7)`` of byte ``p>>3`` (the reference reads a byte-swapped
  24-bit window; an MSB-first stream is the same layout).  Any width 1-16.
- :class:`UInt12Array` — the 12-bit special case (``nbit_array.h:37-84``):
  little-endian nibble packing, 3 bytes per entry pair
  (``lo(a) | hi(a)+lo4(b) | hi8(b)``).

Engine deviations: ``bulk_set`` builds the whole buffer in one vectorized
pass (``np.packbits`` / strided scatter) instead of the reference's per-entry
``set`` loop; reads are batch gathers (``get_batch``) — there is no scalar
path.  Sizing formulas (including the reference's slack bytes) are kept so
``getByteCount`` parity holds.
"""

from __future__ import annotations

import numpy as np


class NBitArray:
    """Packed ``bits``-wide entries, reference MSB-first layout."""

    __slots__ = ("size", "bits", "byte_count", "data")

    def __init__(self, size: int, bits: int):
        if not 1 <= int(bits) <= 16:
            raise ValueError("NBitArray supports 1..16-bit entries")
        self.size = int(size)
        self.bits = int(bits)
        # nbit_array.h:92 — pad to a 64-bit boundary + 128 slack bits so the
        # 24-bit read window never runs off the end
        self.byte_count = (self.size * self.bits + 63 + 128) // 64 * 64 // 8
        self.data = np.zeros(self.byte_count, dtype=np.uint8)

    def bulk_set(self, values: np.ndarray) -> None:
        """Write entries 0..len-1 (bulkSet, nbit_array.h:104-108)."""
        v = np.asarray(values, dtype=np.uint16)
        if len(v) > self.size:
            raise ValueError("more values than entries")
        shifts = np.arange(self.bits - 1, -1, -1, dtype=np.uint16)
        bits = ((v[:, None] >> shifts) & np.uint16(1)).astype(np.uint8)
        packed = np.packbits(bits.ravel())          # MSB-first
        self.data[:len(packed)] = packed

    def get_batch(self, idx: np.ndarray) -> np.ndarray:
        """Gather entries at ``idx`` (get, nbit_array.h:98-103)."""
        idx = np.asarray(idx, dtype=np.int64)
        bitpos = idx * self.bits
        b0 = bitpos >> 3
        d = self.data
        word = ((d[b0].astype(np.uint32) << np.uint32(16))
                | (d[b0 + 1].astype(np.uint32) << np.uint32(8))
                | d[b0 + 2].astype(np.uint32))
        sh = (24 - self.bits - (bitpos & 7)).astype(np.uint32)
        mask = np.uint32((1 << self.bits) - 1)
        return ((word >> sh) & mask).astype(np.uint16)

    def mask(self, fp: np.ndarray) -> np.ndarray:
        return fp & ((1 << self.bits) - 1)

    def get_byte_count(self) -> int:
        return self.byte_count


class UInt12Array:
    """12-bit entries, reference little-endian nibble layout."""

    __slots__ = ("size", "byte_count", "data")

    bits = 12

    def __init__(self, size: int):
        self.size = int(size)
        self.byte_count = self.size * 3 // 2 + 32   # nbit_array.h:42
        self.data = np.zeros(self.byte_count, dtype=np.uint8)

    def bulk_set(self, values: np.ndarray) -> None:
        """bulkSet (nbit_array.h:56-64): 3 bytes per (a, b) pair."""
        v = np.asarray(values, dtype=np.uint16)
        if len(v) > self.size:
            raise ValueError("more values than entries")
        if len(v) % 2:
            v = np.concatenate([v, np.zeros(1, dtype=np.uint16)])
        a = v[0::2].astype(np.uint32)
        b = v[1::2].astype(np.uint32)
        out = np.empty(3 * len(a), dtype=np.uint8)
        out[0::3] = a & 0xFF
        out[1::3] = ((a >> 8) | (b << 4)) & 0xFF
        out[2::3] = (b >> 4) & 0xFF
        self.data[:len(out)] = out

    def get_batch(self, idx: np.ndarray) -> np.ndarray:
        """get (nbit_array.h:49-55): LE window >> 4*(idx&1), 12-bit mask."""
        idx = np.asarray(idx, dtype=np.int64)
        p = (idx >> 1) + idx                        # first byte of the pair
        d = self.data
        word = (d[p].astype(np.uint32)
                | (d[p + 1].astype(np.uint32) << np.uint32(8)))
        sh = ((idx & 1) << 2).astype(np.uint32)
        return ((word >> sh) & np.uint32(0xFFF)).astype(np.uint16)

    def mask(self, fp: np.ndarray) -> np.ndarray:
        return fp & 0xFFF

    def get_byte_count(self) -> int:
        return self.byte_count


def storage_for(bits: int, size: int, layout: str = "auto"):
    """The reference benchmark's storage choice per width
    (bulk-insert-and-query.cc:784,930,937,944): UInt12Array at 12 bits,
    NBitArray otherwise; ``layout`` forces one."""
    if layout == "uint12" or (layout == "auto" and bits == 12):
        if bits != 12:
            raise ValueError("uint12 layout is 12-bit only")
        return UInt12Array(size)
    return NBitArray(size, bits)
