"""Bloom-filter kernel (the reference's baseline AMQ) + a blocked variant.

Value-level re-implementation of ``/root/reference/src/bloom.h``:

- ``k = max(1, round(bits_per_item * ln 2))`` (bloom.h:28-30)
- bit count = ``nextPrime(n * bits_per_item)``, word array of
  ``(bitCount + 63) // 64`` uint64 (bloom.h:58-62,76-79)
- double hashing: ``a = high32(h), b = low32(h); probe i uses word
  reduce(a, arrayLength) and in-word bit (a & 63); a += b`` (bloom.h:103-138)
- merge = bitwise OR of equal-parameter filters (trivially associative; the
  reference has no merge — this is the engine's mergeable-UDAF extension,
  SURVEY.md §2.1 "Merge").

``BlockedBloomFilter`` re-expresses the register-blocked Bloom
(``src/simd-block.h:158-207``, Impala's design): one 32-byte block per key,
one bit in each of 8 uint32 lanes chosen by 8 odd-constant multiply-shifts.
NumPy vectorizes the whole batch instead of AVX2 vectorizing one key.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED, hash_key64, mix_split

U64 = np.uint64
U32 = np.uint32

#: probe chunk: the (chunk, k) index temporaries stay L2-resident.  At the
#: old 128 Ki chunk the ~50 MB of per-chunk temporaries were DRAM traffic —
#: measured 4.7x slower under 8 concurrent single-core builds and 1.4x
#: slower solo than this cache-sized chunk.
_CHUNK = 1 << 14


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    if n in (2, 3):
        return True
    if n % 2 == 0 or n % 3 == 0:
        return False
    d = 5
    while d * d <= n:
        if n % d == 0 or n % (d + 2) == 0:
            return False
        d += 6
    return True


def next_prime(a: int) -> int:
    """Smallest prime > a (bloom.h:52-55)."""
    a += 1
    while not is_prime(a):
        a += 1
    return a


class BloomFilter:
    KIND = "bloom"

    __slots__ = ("bits_per_item", "k", "bit_count", "array_length", "words",
                 "seed", "num_items", "hash_family")

    def __init__(self, capacity: int, bits_per_item: int = 8,
                 seed: int = DEFAULT_SEED, *, array_length: int | None = None,
                 hash_family: str = "mix"):
        self.bits_per_item = int(bits_per_item)
        self.k = max(1, round(bits_per_item * np.log(2)))
        if array_length is None:
            self.bit_count = next_prime(max(64, int(capacity) * bits_per_item))
            self.array_length = (self.bit_count + 63) // 64
        else:
            self.array_length = int(array_length)
            self.bit_count = self.array_length * 64
        self.words = np.zeros(self.array_length, dtype=np.uint64)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.num_items = 0
        self.hash_family = hash_family

    @classmethod
    def create(cls, capacity: int, bits_per_item: int = 8,
               seed: int = DEFAULT_SEED,
               hash_family: str = "mix") -> "BloomFilter":
        return cls(capacity, bits_per_item=bits_per_item, seed=seed,
                   hash_family=hash_family)

    def _probes(self, keys) -> tuple[np.ndarray, np.ndarray]:
        """(word_index, bit_mask) arrays of shape (n, k) — bloom.h:103-115."""
        h = hash_key64(keys, self.seed, self.hash_family)
        a = (h >> U64(32)).astype(np.uint64)
        b = (h & U64(0xFFFFFFFF)).astype(np.uint64)
        steps = np.arange(self.k, dtype=np.uint64)
        av = (a[:, None] + b[:, None] * steps[None, :]) & U64(0xFFFFFFFF)  # a += b, 32-bit wrap
        words = (av * U64(self.array_length)) >> U64(32)                   # Lemire reduce
        bidx = av & U64(63)
        masks = U64(1) << bidx
        return words.astype(np.int64), masks, bidx.astype(np.int64)

    def add_batch(self, keys) -> int:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return 0
        if len(keys) * self.k * 8 >= self.array_length:
            # big batch: every probe sets ONE bit, so a plain boolean
            # scatter (duplicate-safe: pure stores) + packbits replaces
            # ufunc.at, whose per-element C loop is ~10x slower and
            # collapses under concurrent memory traffic.  Keys chunk so the
            # (n, k) probe temporaries stay cache-sized; the bit array is
            # shared across chunks and packs once.
            bits = np.zeros(self.array_length * 64, dtype=bool)
            CH = _CHUNK
            for s in range(0, len(keys), CH):
                words, _, bidx = self._probes(keys[s:s + CH])
                bits[(words * 64 + bidx).ravel()] = True
            neww = np.packbits(bits, bitorder="little").view(np.uint64)
            np.bitwise_or(self.words, neww, out=self.words)
        else:
            words, masks, _ = self._probes(keys)
            np.bitwise_or.at(self.words, words.ravel(), masks.ravel())
        self.num_items += len(keys)
        return len(keys)

    def contain_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if n <= _CHUNK:
            words, masks, _ = self._probes(keys)
            return ((self.words[words] & masks) == masks).all(axis=1)
        out = np.empty(n, dtype=bool)
        for s in range(0, n, _CHUNK):
            words, masks, _ = self._probes(keys[s:s + _CHUNK])
            out[s:s + _CHUNK] = \
                ((self.words[words] & masks) == masks).all(axis=1)
        return out

    def add(self, key: int) -> str:
        self.add_batch(np.array([key], dtype=np.uint64))
        return "Ok"

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    def merge(self, other: "BloomFilter") -> None:
        """OR-merge; requires identical (seed, array_length, bits_per_item)."""
        if (self.seed, self.array_length, self.bits_per_item,
                self.hash_family) != \
                (other.seed, other.array_length, other.bits_per_item,
                 other.hash_family):
            raise ValueError("bloom merge requires identical parameters")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.num_items += other.num_items

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        return self.array_length * 8


# Odd multiply constants from the reference's MakeMask (src/simd-block.h:158-166).
_BLOCK_SALTS = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31], dtype=np.uint64)


class BlockedBloomFilter:
    """Register-blocked Bloom: 8 lanes × 32 bits per 256-bit block
    (src/simd-block.h:35-207).  One cache line touched per key."""

    KIND = "blockedbloom"

    __slots__ = ("num_blocks", "lanes", "seed", "num_items", "bits_per_item")

    def __init__(self, num_blocks: int, seed: int = DEFAULT_SEED,
                 bits_per_item: int = 8):
        self.num_blocks = int(num_blocks)
        self.lanes = np.zeros((self.num_blocks, 8), dtype=np.uint32)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.num_items = 0
        self.bits_per_item = bits_per_item

    @classmethod
    def create(cls, capacity: int, bits_per_item: int = 8,
               seed: int = DEFAULT_SEED) -> "BlockedBloomFilter":
        # bits_per_item * n total bits / 256 bits per block, like the Fixed
        # variant's log2(n*8/CHAR_BIT...) sizing (src/simd-block-fixed-fpp.h:70-89)
        nb = max(1, (int(capacity) * bits_per_item + 255) // 256)
        return cls(next_prime(nb), seed=seed, bits_per_item=bits_per_item)

    @classmethod
    def create_fixed(cls, capacity: int,
                     seed: int = DEFAULT_SEED) -> "BlockedBloomFilter":
        """``SimdBlockFilterFixed`` sizing: ``bucketCount = max(1, n/24)``
        non-power-of-two 256-bit blocks (src/simd-block-fixed-fpp.h:70-89;
        ~10.7 bits/key, published fpp 0.98%).  Addressing is already the
        Fixed variant's Lemire reduce on the high 32 bits — only the
        block-count rule differs from :meth:`create`."""
        nb = max(1, int(capacity) // 24)
        return cls(nb, seed=seed, bits_per_item=11)

    def _block_and_masks(self, keys) -> tuple[np.ndarray, np.ndarray]:
        h = mix_split(keys, self.seed)
        block = ((h >> U64(32)) * U64(self.num_blocks)) >> U64(32)  # Lemire on high 32
        lanes_in = (h & U64(0xFFFFFFFF)).astype(np.uint64)
        # per-lane odd-constant multiply then take top 5 bits → bit position
        prod = (lanes_in[:, None] * _BLOCK_SALTS[None, :]) & U64(0xFFFFFFFF)
        bitpos = (prod >> U64(27)).astype(np.uint32)
        masks = (np.uint32(1) << bitpos).astype(np.uint32)
        return block.astype(np.int64), masks, bitpos.astype(np.int64)

    def add_batch(self, keys) -> int:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return 0
        if len(keys) * 64 >= self.num_blocks * 8:
            # boolean scatter + packbits (see BloomFilter.add_batch): each
            # key sets ONE bit per lane, duplicate stores are idempotent;
            # chunked so the (n, 8) temporaries stay cache-sized
            bits = np.zeros(self.num_blocks * 256, dtype=bool)
            lane8 = np.arange(8)[None, :]
            CH = _CHUNK
            for s in range(0, len(keys), CH):
                block, _, bitpos = self._block_and_masks(keys[s:s + CH])
                gpos = (block[:, None] * 8 + lane8) * 32 + bitpos
                bits[gpos.ravel()] = True
            neww = np.packbits(bits, bitorder="little").view(np.uint32) \
                .reshape(self.num_blocks, 8)
            np.bitwise_or(self.lanes, neww, out=self.lanes)
        else:
            block, masks, _ = self._block_and_masks(keys)
            lane_idx = np.broadcast_to(np.arange(8), masks.shape)
            np.bitwise_or.at(self.lanes, (block.repeat(8), lane_idx.ravel()),
                             masks.ravel())
        self.num_items += len(keys)
        return len(keys)

    def contain_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if n <= _CHUNK:
            block, masks, _ = self._block_and_masks(keys)
            return ((self.lanes[block] & masks) == masks).all(axis=1)
        out = np.empty(n, dtype=bool)
        for s in range(0, n, _CHUNK):
            block, masks, _ = self._block_and_masks(keys[s:s + _CHUNK])
            out[s:s + _CHUNK] = \
                ((self.lanes[block] & masks) == masks).all(axis=1)
        return out

    def add(self, key: int) -> str:
        self.add_batch(np.array([key], dtype=np.uint64))
        return "Ok"

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    def merge(self, other: "BlockedBloomFilter") -> None:
        if (self.seed, self.num_blocks) != (other.seed, other.num_blocks):
            raise ValueError("blocked-bloom merge requires identical parameters")
        np.bitwise_or(self.lanes, other.lanes, out=self.lanes)
        self.num_items += other.num_items

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        return self.num_blocks * 32
