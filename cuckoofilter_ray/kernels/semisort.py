"""Semi-sorted bucket codec — the packed 13-bit-fingerprint variant.

Re-expresses ``/root/reference/src/permencoding.h`` + ``src/packedtable.h`` at
value level.  A 4-slot bucket of 13-bit tags is stored as:

- the four low 4-bit nibbles, sorted ascending, encoded as a 12-bit codeword
  indexing the 3876 sorted 4-multisets over 0..15
  (``src/permencoding.h:47-50`` — same table size), saving 4 bits/bucket
  (1 bit/item); and
- four 9-bit "direct bits" (tag >> 4), stored in the sorted order of their
  nibbles (``src/packedtable.h:103-115`` sorts the full tags by low nibble).

Bucket layout: 12-bit codeword | 4 × 9 direct bits = 48 bits = 6 bytes
(``src/packedtable.h:19`` kBytesPerBucket for the 13-bit table).

The codec is lossless on the **multiset** of tags per bucket (slot order is
not preserved — membership semantics are order-independent), so a
``CuckooFilter`` with ``bits_per_tag=13`` round-trips through this codec with
identical query answers; only the at-rest bytes shrink from 8 to 6 per bucket.
Encoding/decoding is fully vectorized (one ``take`` per direction).
"""

from __future__ import annotations

import itertools

import numpy as np

DIR_BITS = 9          # 13 - 4 (src/packedtable.h:21 kDirBitsPerTag)
BITS_PER_TAG = 13
BYTES_PER_BUCKET = 6  # (12 + 4*9) / 8 (src/packedtable.h:19)
N_CODEWORDS = 3876    # C(16+4-1, 4) sorted multisets (src/permencoding.h:47)


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    """decode_table[codeword] -> 4 sorted nibbles; encode_table[packed16] -> codeword.

    Mirrors PermEncoding::genTables' enumeration of non-decreasing 4-tuples
    (src/permencoding.h:56-85), generated at import instead of recursion.
    """
    decode = np.zeros((N_CODEWORDS, 4), dtype=np.uint8)
    encode = np.zeros(1 << 16, dtype=np.uint16)
    for idx, combo in enumerate(itertools.combinations_with_replacement(range(16), 4)):
        decode[idx] = combo
        key = combo[0] | (combo[1] << 4) | (combo[2] << 8) | (combo[3] << 12)
        encode[key] = idx
    assert idx + 1 == N_CODEWORDS
    return decode, encode


DECODE_TABLE, ENCODE_TABLE = _build_tables()


def pack_buckets(tags: np.ndarray) -> bytes:
    """uint16[num_buckets, 4] (13-bit tags, 0 = empty) → 6 bytes per bucket."""
    if tags.ndim != 2 or tags.shape[1] != 4:
        raise ValueError("expected (num_buckets, 4) tag matrix")
    t = tags.astype(np.uint16, copy=False)
    lows = (t & 0xF).astype(np.uint16)
    # sort full tags by low nibble within each bucket (packedtable.h:103-115)
    order = np.argsort(lows, axis=1, kind="stable")
    sorted_tags = np.take_along_axis(t, order, axis=1)
    slows = (sorted_tags & 0xF).astype(np.uint64)
    highs = (sorted_tags >> 4).astype(np.uint64)  # 9 direct bits each
    key = (slows[:, 0] | (slows[:, 1] << 4) | (slows[:, 2] << 8) |
           (slows[:, 3] << 12)).astype(np.int64)
    cw = ENCODE_TABLE[key].astype(np.uint64)
    word = (cw | (highs[:, 0] << np.uint64(12)) | (highs[:, 1] << np.uint64(21))
            | (highs[:, 2] << np.uint64(30)) | (highs[:, 3] << np.uint64(39)))
    raw = word.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :BYTES_PER_BUCKET]
    return np.ascontiguousarray(raw).tobytes()


def unpack_buckets(data: bytes, num_buckets: int) -> np.ndarray:
    """Inverse of :func:`pack_buckets` (multiset-exact, slot order = sorted)."""
    raw = np.frombuffer(data, dtype=np.uint8).reshape(num_buckets, BYTES_PER_BUCKET)
    padded = np.zeros((num_buckets, 8), dtype=np.uint8)
    padded[:, :BYTES_PER_BUCKET] = raw
    word = padded.view("<u8").ravel().astype(np.uint64)
    cw = (word & np.uint64(0xFFF)).astype(np.int64)
    lows = DECODE_TABLE[cw].astype(np.uint16)            # (n, 4) sorted nibbles
    tags = np.empty((num_buckets, 4), dtype=np.uint16)
    for j in range(4):
        high = ((word >> np.uint64(12 + DIR_BITS * j)) & np.uint64(0x1FF)).astype(np.uint16)
        tags[:, j] = (high << 4) | lows[:, j]
    return tags
