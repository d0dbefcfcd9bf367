"""Growable blocked-Bloom filter — AMQ for sets of unknown size.

Value-level re-expression of ``/root/reference/src/growable-simd-block.h``
(GrowSimdBlockFilter), the warm-up construction of Pagh, Segev & Wieder,
"How to Approximate A Set Without Knowing Its Size In Advance":

- a list of blocked-Bloom levels of doubling byte size; level i gets error
  budget ``ε·(6/π²)/i²`` (the Basel split, growable-simd-block.h:36,48);
- each level admits ``ttl = bits · (-1/8) · ln(1 - ε_i^(1/8))`` keys — the
  insert count at which an 8-probe blocked Bloom reaches ε_i
  (growable-simd-block.h:38-40, 46-50);
- ``AddUnique`` inserts into the NEWEST level, opening a doubled level when
  the TTL runs out (:44-54); ``AddAny`` skips keys already found (:56-60);
- ``Find`` ORs the per-level probes (:62-67).

Level seeds derive from (seed, level) — the reference draws a fresh random
HashFamily per level; distributed determinism needs them derivable.
"""

from __future__ import annotations

import math

import numpy as np

from .bloom import BlockedBloomFilter
from .hashing import DEFAULT_SEED

_BASEL = 6.0 / math.pi ** 2


def _level_ttl(nbytes: int, eps_i: float) -> int:
    return max(1, int(8 * nbytes * (-1.0 / 8) *
                      math.log(1.0 - eps_i ** (1.0 / 8))))


class GrowBlockedBloomFilter:
    KIND = "growbloom"

    __slots__ = ("initial_bytes", "epsilon", "seed", "levels", "ttl",
                 "num_items")

    def __init__(self, initial_bytes: int = 1 << 14, epsilon: float = 0.01,
                 seed: int = DEFAULT_SEED):
        self.initial_bytes = 1 << int(math.floor(math.log2(max(64, initial_bytes))))
        self.epsilon = float(epsilon) * _BASEL
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.levels: list[BlockedBloomFilter] = []
        self.num_items = 0
        self._open_level()

    def _open_level(self) -> None:
        i = len(self.levels)
        nbytes = self.initial_bytes << i
        eps_i = self.epsilon / ((i + 1) ** 2)
        self.ttl = _level_ttl(nbytes, eps_i)
        self.levels.append(BlockedBloomFilter(
            max(1, nbytes // 32), seed=self.seed + 0x9E37 * (i + 1)))

    # ----------------------------------------------------------------- insert

    def add_batch(self, keys):
        """AddUnique per row (growable-simd-block.h:44-54), vectorized by
        filling the open level up to its TTL, then doubling."""
        from .cuckoo import BulkResult
        keys = np.asarray(keys, dtype=np.uint64)
        pos = 0
        while pos < len(keys):
            take = min(self.ttl, len(keys) - pos)
            self.levels[-1].add_batch(keys[pos:pos + take])
            self.ttl -= take
            pos += take
            if self.ttl <= 0:
                self._open_level()
        self.num_items += len(keys)
        return BulkResult(ok=len(keys), overflow=0)

    def add_any_batch(self, keys) -> np.ndarray:
        """AddAny (growable-simd-block.h:56-60): skip keys already found
        (within-batch duplicates dedup against the state as they land)."""
        keys = np.asarray(keys, dtype=np.uint64)
        added = np.zeros(len(keys), dtype=bool)
        # batch form: one Find pass, insert the misses, then re-check the
        # skipped ones against the fresh inserts (duplicates inside the
        # batch must count once, like the sequential loop)
        fresh = ~self.contain_batch(keys)
        uniq, first = np.unique(keys[fresh], return_index=True)
        self.add_batch(uniq)
        added_idx = np.flatnonzero(fresh)[first]
        added[added_idx] = True
        return added

    def add(self, key: int) -> str:
        self.add_batch(np.array([key], dtype=np.uint64))
        return "Ok"

    # ------------------------------------------------------------------ query

    def contain_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        for f in self.levels:
            rest = ~out
            if not rest.any():
                break
            out[rest] = f.contain_batch(keys[rest])
        return out

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    # ------------------------------------------------------------------ stats

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        return sum(f.lanes.nbytes for f in self.levels)

    def load_factor(self) -> float:
        return 0.0

    def merge(self, other):
        raise NotImplementedError(
            "growable filters merge by level concatenation only when level "
            "seeds align; rebuild instead")

    def info(self) -> dict:
        return {"kind": self.KIND, "num_items": self.num_items,
                "levels": len(self.levels),
                "size_in_bytes": self.size_in_bytes()}
