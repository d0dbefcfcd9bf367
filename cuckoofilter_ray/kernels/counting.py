"""Counting quotient filter (CQF) — multiset membership with exact counts.

Value-level re-expression of the reference's GQF wrapper
(/root/reference/src/gqf_cpp.h:44-137 over src/gqf.h):

- sizing (gqf_cpp.h:44-52): smallest ``qbits`` with ``2^qbits * 0.9 >= n``;
  ``nhashbits = qbits + 8`` (8-bit remainder), keys hashed then masked to
  ``nhashbits`` bits — false positives come ONLY from 64->nhashbits masking
  collisions, exactly as in the reference (QF_HASH_NONE over hasher(key)).
- ``qf_insert(count)`` (gqf.h:144): adds ``count`` to the key's tally.
- ``qf_count_key_value`` (gqf.h:200): exact stored count for the masked
  hash (an overcount for a colliding foreign key — never an undercount).
- ``qf_remove``/``qf_delete_key_value`` (gqf.h:162-166): counted /
  full removal.
- ``qf_merge`` (gqf.h:307): union with summed counts.

The CQF's rank-select slot encoding is a single-machine memory-layout
device; the engine keeps the same *value domain* (masked hashes with exact
counts) in a sorted columnar pair (hashes uint64, counts int64), which makes
every operation a vectorized merge/searchsorted and the structure trivially
mergeable for the distributed UDAF path.  Answers are value-identical to the
reference for every Add/Count/Remove/Merge sequence.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED, hash_key64

U64 = np.uint64


class NotEnoughSpaceError(RuntimeError):
    """QF_NO_SPACE (gqf.h:133): distinct masked hashes exceeded capacity."""


class CountingQuotientFilter:
    """One counting-filter shard (exact counts per masked hash)."""

    KIND = "counting"

    __slots__ = ("qbits", "nslots", "nhashbits", "mask", "seed",
                 "hash_family", "hashes", "counts", "num_items")

    #: the CQF refuses inserts past ~95% slot occupancy (gqf.c NO_SPACE)
    MAX_LOAD = 0.95

    def __init__(self, qbits: int, seed: int = DEFAULT_SEED,
                 hash_family: str = "mix"):
        self.qbits = int(qbits)
        self.nslots = 1 << self.qbits
        self.nhashbits = self.qbits + 8          # gqf_cpp.h:51
        self.mask = (1 << self.nhashbits) - 1    # gqf_cpp.h:52
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.hash_family = hash_family
        self.hashes = np.empty(0, dtype=np.uint64)   # sorted, unique
        self.counts = np.empty(0, dtype=np.int64)    # > 0, aligned
        self.num_items = 0                           # total count added

    # ------------------------------------------------------------------ sizing

    @classmethod
    def create(cls, capacity: int, seed: int = DEFAULT_SEED,
               hash_family: str = "mix") -> "CountingQuotientFilter":
        """qbits loop per gqf_cpp.h:44-50: grow until nslots*0.9 >= n."""
        n = max(1, int(capacity))
        qbits, nslots = 0, 1
        while nslots * 0.9 < n:
            qbits += 1
            nslots = 1 << qbits
        return cls(qbits, seed=seed, hash_family=hash_family)

    # ------------------------------------------------------------------- hash

    def _hash(self, keys) -> np.ndarray:
        h = hash_key64(keys, self.seed, self.hash_family)
        return h & U64(self.mask)

    # ----------------------------------------------------------------- mutate

    def _merge_sorted(self, add_h: np.ndarray, add_c: np.ndarray) -> None:
        """Union-sum (add_h unique+sorted) into the stored table."""
        if len(self.hashes) == 0:
            uh, uc = add_h, add_c
        else:
            all_h = np.concatenate([self.hashes, add_h])
            all_c = np.concatenate([self.counts, add_c])
            uh, inv = np.unique(all_h, return_inverse=True)
            uc = np.bincount(inv, weights=all_c).astype(np.int64)
        keep = uc > 0
        if not keep.all():
            uh, uc = uh[keep], uc[keep]
        if len(uh) > self.MAX_LOAD * self.nslots:
            raise NotEnoughSpaceError(
                f"CQF full: {len(uh)} distinct > {self.MAX_LOAD} * "
                f"{self.nslots} slots")
        self.hashes, self.counts = uh, uc

    def add_batch(self, keys, counts=None) -> None:
        """qf_insert(key, count) for a key vector (gqf.h:144)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return
        h = self._hash(keys)
        if counts is None:
            uh, uc = np.unique(h, return_counts=True)
            uc = uc.astype(np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64)
            if (c < 0).any():
                raise ValueError("counts must be non-negative")
            uh, inv = np.unique(h, return_inverse=True)
            uc = np.bincount(inv, weights=c).astype(np.int64)
        self._merge_sorted(uh, uc)
        self.num_items += int(uc.sum())

    def remove_batch(self, keys, counts=None) -> np.ndarray:
        """qf_remove(key, count) (gqf.h:162): subtract up to ``count``
        (saturating at zero, like removing more than present); ``counts=None``
        removes ONE occurrence per row.  Returns the number actually removed
        per input row."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        h = self._hash(keys)
        want = np.ones(len(keys), dtype=np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        if (want < 0).any():
            # np.clip(avail - prior, 0, w) with negative w would return w,
            # silently INCREASING stored counts — reject loudly (matching
            # add_batch's validation)
            raise ValueError("counts must be non-negative")
        # resolve per-row removable amounts against current counts, honoring
        # duplicates within the batch (sequential semantics per masked hash)
        removed = np.zeros(len(keys), dtype=np.int64)
        uh, inv = np.unique(h, return_inverse=True)
        pos = np.searchsorted(self.hashes, uh)
        pos_ok = np.minimum(pos, max(0, len(self.hashes) - 1))
        present = np.zeros(len(uh), dtype=np.int64)
        if len(self.hashes):
            hit = self.hashes[pos_ok] == uh
            present[hit] = self.counts[pos_ok[hit]]
        # within-batch order: rows sharing a masked hash drain the available
        # count in index order
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        w_sorted = want[order]
        grp_start = np.searchsorted(inv_s, np.arange(len(uh)))
        excl = np.cumsum(w_sorted) - w_sorted      # global demand before row
        prior = excl - excl[grp_start][inv_s]      # within-group demand
        avail = present[inv_s]
        take = np.clip(avail - prior, 0, w_sorted)
        removed[order] = take
        dec = np.zeros(len(uh), dtype=np.int64)
        np.subtract.at(dec, inv_s, take)
        self._merge_sorted(uh, dec)
        self.num_items -= int(take.sum())
        return removed

    def delete_batch(self, keys) -> np.ndarray:
        """qf_delete_key_value (gqf.h:166): remove the key entirely.
        Returns the count that was removed per row."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        h = self._hash(keys)
        uh = np.unique(h)
        pos = np.searchsorted(self.hashes, uh)
        pos_ok = np.minimum(pos, max(0, len(self.hashes) - 1))
        dec = np.zeros(len(uh), dtype=np.int64)
        if len(self.hashes):
            hit = self.hashes[pos_ok] == uh
            dec[hit] = -self.counts[pos_ok[hit]]
        before = self.count_batch(keys)
        self._merge_sorted(uh, dec)
        self.num_items += int(dec.sum())
        return before

    # ------------------------------------------------------------------ query

    def count_batch(self, keys) -> np.ndarray:
        """qf_count_key_value per row (gqf.h:200)."""
        keys = np.asarray(keys)
        out = np.zeros(len(keys), dtype=np.int64)
        if len(keys) == 0 or len(self.hashes) == 0:
            return out
        h = self._hash(keys)
        pos = np.searchsorted(self.hashes, h)
        pos_ok = np.minimum(pos, len(self.hashes) - 1)
        hit = self.hashes[pos_ok] == h
        out[hit] = self.counts[pos_ok[hit]]
        return out

    def contain_batch(self, keys) -> np.ndarray:
        """Contain == count > 0 (gqf_cpp.h:117-123)."""
        return self.count_batch(keys) > 0

    # ------------------------------------------------------------------ merge

    def merge(self, other: "CountingQuotientFilter") -> "CountingQuotientFilter":
        """qf_merge (gqf.h:307): union with summed counts.  Requires matching
        geometry + hash parameters (the distributed-merge precondition)."""
        if (other.qbits, other.seed, other.hash_family) != \
                (self.qbits, self.seed, self.hash_family):
            raise ValueError("CQF merge requires identical qbits/seed/family")
        self._merge_sorted(other.hashes, other.counts)
        self.num_items += other.num_items
        return self

    # ------------------------------------------------------------------ stats

    @property
    def n_distinct(self) -> int:
        return len(self.hashes)

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        return int(self.hashes.nbytes + self.counts.nbytes)

    def load_factor(self) -> float:
        return len(self.hashes) / self.nslots

    # ------------------------------------------------------- at-rest codec

    # 512-hash chunks: the verbatim first + uint32 lane offset cost ~0.12
    # bits/item (vs 0.95 at 64), bringing counting8 to 10.82 bits/item —
    # within 0.3 of the Rice stream's geometric-entropy floor (~10.5) and
    # of the C CQF's slotted layout (~10.6 at its ideal 95% load, gqf.c).
    # Decode stays lane-lockstep vectorized (rounds = CHUNK-1, time flat vs
    # 256; 1024 would shave 0.05 more at +50% decode time — not worth it).
    CHUNK = 512

    def pack_payload(self) -> bytes:
        """Compressed at-rest form: chunked Golomb-Rice.

        The CQF's point is memory; the columnar (uint64, int64) pairs are a
        probe format, not a storage format.  At rest:
        - every CHUNK-th hash stored verbatim, bit-packed at ``nhashbits``;
        - within-chunk hash DELTAS Rice-coded (shift ≈ log2(mean gap), raised
          if any quotient would overflow);
        - (count - 1) values Rice-coded the same chunked way (shift 1).
        Decoding is the vectorized lane-lockstep of :func:`gcs.rice_unpack`
        (lanes = chunks), so deserialize stays O(n) with ~CHUNK rounds.
        ~12-14 bits/item at 8-bit-remainder sizing vs 128 for the raw pairs.
        """
        import pickle
        from .gcs import pack_width64, rice_pack
        n = len(self.hashes)
        ch = self.CHUNK
        firsts = self.hashes[::ch]
        d = np.diff(self.hashes.astype(np.int64))
        keep = np.ones(len(d), dtype=bool)
        keep[ch - 1::ch] = False              # chunk-boundary gaps excluded
        deltas = d[keep]
        mean_gap = max(1, (1 << self.nhashbits) // max(1, n))
        # pick the shift by MEASURED stream cost around the log2(mean) hint
        # (the Golomb-optimal k for geometric gaps is ~log2(mean·ln2); ±1
        # around the hint covers it, subject to the 63-quotient cap)
        hint = max(1, int(mean_gap).bit_length() - 1)
        hshift, best_cost = hint, None
        for k in range(max(1, hint - 2), hint + 3):
            if len(deltas) and int(deltas.max()) >> k >= 63:
                continue
            cost = int((deltas >> k).sum()) + len(deltas) * (k + 1)
            if best_cost is None or cost < best_cost:
                hshift, best_cost = k, cost
        while len(deltas) and int(deltas.max()) >> hshift >= 63:
            hshift += 1
        hstream, hbits, hstart = rice_pack(deltas, hshift)
        # lane bit-offsets: chunk c covers codes [c*(ch-1) - adjustments]...
        # code i encodes the delta between hash i and its predecessor within
        # the chunk; chunk c owns codes for global hash indices
        # c*ch+1 .. min(n, (c+1)*ch)-1  →  kept-delta indices are contiguous
        nchunks = (n + ch - 1) // ch if n else 0
        counts_per_chunk = np.minimum(n - np.arange(nchunks) * ch, ch) - 1
        code_idx = np.zeros(nchunks + 1, dtype=np.int64)
        np.cumsum(counts_per_chunk, out=code_idx[1:])
        h_lane_bits = hstart[code_idx]
        if hbits >= 1 << 32:                 # uint32 lane offsets (see GCS)
            raise ValueError("counting shard Rice stream exceeds 2^32 bits "
                             "— split the build into more shards")
        out = {
            "n": n, "ch": ch, "hshift": hshift,
            "firsts": pack_width64(firsts, self.nhashbits),
            "hstream": hstream, "hbits": hbits,
            "hlanes": h_lane_bits.astype(np.uint32),
        }
        # counts: in a dedup/membership corpus almost every count is 1, so
        # the dense Rice stream's ~2 bits/item (+1 lane bit) buys nothing —
        # store the >1 exceptions as (uint32 index, int64 count) pairs when
        # they are sparse enough that 96 bits/exception wins (the C CQF's
        # analog is its escape-coded multi-slot counters, gqf.c)
        dup = np.flatnonzero(self.counts > 1)
        if len(dup) * 96 < 2 * n and n < 1 << 32:
            out["cmode"] = "sparse"
            out["cexc_idx"] = dup.astype(np.uint32)
            out["cexc_cnt"] = self.counts[dup]
        else:
            cshift = 1
            cvals = self.counts - 1
            while len(cvals) and int(cvals.max()) >> cshift >= 63:
                cshift += 1
            cstream, cbits, cstart = rice_pack(cvals, cshift)
            c_code_idx = np.minimum(np.arange(nchunks + 1) * ch, n)
            if cbits >= 1 << 32:
                raise ValueError("counting shard count stream exceeds 2^32 "
                                 "bits — split the build into more shards")
            out.update({"cmode": "rice", "cshift": cshift,
                        "cstream": cstream, "cbits": cbits,
                        "clanes": cstart[c_code_idx].astype(np.uint32)})
        return pickle.dumps(out, protocol=pickle.HIGHEST_PROTOCOL)

    def unpack_payload(self, payload: bytes) -> None:
        import pickle
        from .gcs import rice_unpack, unpack_width64
        d = pickle.loads(payload)
        n = d["n"]
        # legacy blobs (pre-"ch" key) were always packed at chunk=64; falling
        # back to the CURRENT class constant would mis-frame their lanes
        ch = int(d.get("ch", 64))
        if n == 0:
            self.hashes = np.empty(0, dtype=np.uint64)
            self.counts = np.empty(0, dtype=np.int64)
            return
        nchunks = (n + ch - 1) // ch
        firsts = unpack_width64(d["firsts"], self.nhashbits, nchunks) \
            .astype(np.int64)
        lane, delta = rice_unpack(d["hstream"], d["hbits"],
                                  np.asarray(d["hlanes"][:-1],
                                             dtype=np.int64),
                                  np.asarray(d["hlanes"][1:],
                                             dtype=np.int64),
                                  d["hshift"])
        hashes = np.empty(n, dtype=np.int64)
        hashes[::ch] = firsts
        if len(lane):
            cum = np.cumsum(delta)
            seg = np.flatnonzero(np.concatenate(([True],
                                                 lane[1:] != lane[:-1])))
            base = np.zeros(len(lane), dtype=np.int64)
            base[seg] = cum[seg] - delta[seg]
            np.maximum.accumulate(base, out=base)
            within = cum - base + firsts[lane]
            # positions: lane c's k-th code → global index c*ch + 1 + k
            k = np.arange(len(lane)) - seg[np.searchsorted(seg, np.arange(
                len(lane)), side="right") - 1]
            hashes[lane * ch + 1 + k] = within
        self.hashes = hashes.astype(np.uint64)
        if d.get("cmode", "rice") == "sparse":
            counts = np.ones(n, dtype=np.int64)
            counts[d["cexc_idx"].astype(np.int64)] = d["cexc_cnt"]
        else:
            clane, cval = rice_unpack(d["cstream"], d["cbits"],
                                      np.asarray(d["clanes"][:-1],
                                                 dtype=np.int64),
                                      np.asarray(d["clanes"][1:],
                                                 dtype=np.int64),
                                      d["cshift"])
            counts = np.empty(n, dtype=np.int64)
            if len(clane):
                cseg = np.flatnonzero(np.concatenate(
                    ([True], clane[1:] != clane[:-1])))
                ck = np.arange(len(clane)) - cseg[np.searchsorted(
                    cseg, np.arange(len(clane)), side="right") - 1]
                counts[clane * ch + ck] = cval + 1
        self.counts = counts

    def info(self) -> str:
        return (f"CountingQuotientFilter(qbits={self.qbits}, "
                f"nslots={self.nslots}, nhashbits={self.nhashbits}, "
                f"distinct={self.n_distinct}, total={self.num_items}, "
                f"load={self.load_factor():.4f})")
