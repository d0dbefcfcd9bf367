"""Golomb-coded-set (GCS) filter — the compressed static AMQ.

Value-level re-expression of ``/root/reference/src/gcs.h`` (GcsFilter):

- static build (gcs.h:290-339 AddAll): ``fingerprint_bits = bits_per_item
  + 4`` (avg bucket size 16 pays 4 bits back), ``golomb_shift =
  bits_per_item - 1``, ``bucket_count = ceil(n / 16)``; a key hashes to
  ``bucket = reduce32(h >> 32, bucket_count)`` and ``fp = h &
  fingerprint_mask``; per bucket the SORTED fingerprints are delta-encoded
  (duplicates → delta 0) with Golomb-Rice codes (unary quotient ++ shift
  remainder bits, gcs.h:102-109);
- Contain (gcs.h:344-368): walk the bucket's code stream accumulating
  deltas until the fingerprint is met (Ok) or passed (NotFound) — FPR ≈
  2^-bits_per_item;
- SizeInBytes = code stream + bucket index (gcs.h:279), with the bucket
  starts compressed by the reference's 3-level MultiStageMonotoneList
  (gcs.h:114-237; ``monotone_pack``/``monotone_unpack`` below, vectorized)
  — ~0.4 bits/key at the 16-key bucket average vs 2 for raw uint32.  The
  hot probe form still uses the uint32 array (decoded once at load).

Engine layout notes: the bitstream uses little-endian bit order
(np.packbits/unpackbits ``bitorder="little"``) rather than the reference's
MSB-first 64-bit words — answer-parity, not byte-parity.  Decoding is
vectorized in **rounds**: every bucket consumes its k-th code in lockstep;
unary runs terminate at the next zero bit (one ``searchsorted`` into the
precomputed zero-position array), remainders gather as a fixed-width bit
matrix.  Probes run against the decoded sorted (bucket, fp) array built
once per worker at load — GCS is the at-rest/transport format (that is its
entire point); the in-memory probe index costs 8 bytes/key.
"""

from __future__ import annotations

import numpy as np

from .hashing import DEFAULT_SEED, hash_key64

U64 = np.uint64
AVG_BUCKET = 16


def rice_pack(values: np.ndarray, shift: int
              ) -> tuple[bytes, int, np.ndarray]:
    """Golomb-Rice encode non-negative int64 ``values`` (quotient < 63,
    gcs.h:102-109): unary quotient ++ ``shift`` remainder bits, little-endian
    bit order.  Returns (packed bytes, total bits, code-start bit offsets of
    length n+1)."""
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    q = v >> shift
    if n and int(q.max()) >= 63:
        raise ValueError("golomb quotient overflow")
    rem = v & ((1 << shift) - 1)
    code_len = q + 1 + shift
    code_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(code_len, out=code_start[1:])
    total = int(code_start[-1])
    bits = np.zeros(total, dtype=np.uint8)
    ones_total = int(q.sum())
    if ones_total:
        reps = np.repeat(code_start[:-1], q)
        within = np.arange(ones_total) - np.repeat(np.cumsum(q) - q, q)
        bits[reps + within] = 1
    if shift:
        # one 1D scatter per remainder bit position: the (n, shift) 2D
        # temporaries of a single fancy-index store were 2.6x slower
        # (8 M-element allocations + ravel per array vs n-sized temps)
        base = code_start[:-1] + q + 1
        for bpos in range(shift):
            bits[base + bpos] = (rem >> (shift - 1 - bpos)) & 1
    return np.packbits(bits, bitorder="little").tobytes(), total, code_start


def rice_unpack(stream: bytes, stream_bits: int, lane_starts: np.ndarray,
                lane_ends: np.ndarray, shift: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a Rice stream whose codes are grouped into independent lanes
    (bit offsets ``lane_starts[i]..lane_ends[i]``), vectorized in ROUNDS:
    every lane consumes its k-th code in lockstep, unary runs ending at the
    next zero bit (one searchsorted into the zero-position array per round).

    Returns ``(lane_id, value)`` in lane-major order (codes of one lane
    contiguous, in stream order)."""
    bits = np.unpackbits(np.frombuffer(stream, dtype=np.uint8),
                         bitorder="little")[:stream_bits]
    zpos = np.flatnonzero(bits == 0).astype(np.int64, copy=False)
    cur = np.asarray(lane_starts, dtype=np.int64).copy()
    end = np.asarray(lane_ends, dtype=np.int64)
    out_l, out_v, out_r = [], [], []
    active = np.flatnonzero(cur < end)
    pw = (1 << np.arange(shift - 1, -1, -1)).astype(np.int64) \
        if shift else None
    rnd = 0
    while len(active):
        p = cur[active]
        z = zpos[np.searchsorted(zpos, p)]
        qv = z - p
        if shift:
            rmat = bits[(z + 1)[:, None] + np.arange(shift)]
            rem = rmat.astype(np.int64) @ pw
        else:
            rem = np.zeros(len(active), dtype=np.int64)
        out_l.append(active.copy())
        out_v.append((qv << shift) | rem)
        out_r.append(np.full(len(active), rnd, dtype=np.int32))
        cur[active] = z + 1 + shift
        active = active[cur[active] < end[active]]
        rnd += 1
    if not out_l:
        e = np.zeros(0, dtype=np.int64)
        return e, e
    lane = np.concatenate(out_l)
    val = np.concatenate(out_v)
    order = np.lexsort((np.concatenate(out_r), lane))
    return lane[order], val[order]


def pack_width64(values: np.ndarray, width: int) -> bytes:
    """Bit-pack int64/uint64 values at ``width`` bits, little-endian order
    (the >16-bit sibling of serde.pack_bits)."""
    v = np.asarray(values, dtype=np.uint64)
    bitmat = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & 1) \
        .astype(np.uint8)
    return np.packbits(bitmat.ravel(), bitorder="little").tobytes()


def unpack_width64(data: bytes, width: int, count: int) -> np.ndarray:
    bitarr = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                           bitorder="little")[:count * width]
    bitmat = bitarr.reshape(count, width).astype(np.uint64)
    return (bitmat << np.arange(width, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64)


class GcsFilter:
    KIND = "gcs"

    __slots__ = ("capacity", "bits_per_item", "seed", "hash_family",
                 "fingerprint_bits", "golomb_shift", "bucket_count",
                 "stream", "stream_bits", "starts", "num_items", "_built",
                 "_decoded", "_lazy_touched")

    def __init__(self, capacity: int, bits_per_item: int = 8,
                 seed: int = DEFAULT_SEED, hash_family: str = "mix"):
        self.capacity = max(1, int(capacity))
        self.bits_per_item = int(bits_per_item)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.hash_family = hash_family
        self.fingerprint_bits = self.bits_per_item + 4   # gcs.h:296-300
        self.golomb_shift = self.bits_per_item - 1       # gcs.h:297
        self.bucket_count = (self.capacity + AVG_BUCKET - 1) // AVG_BUCKET
        self.stream = b""
        self.stream_bits = 0
        self.starts = np.zeros(self.bucket_count + 1, dtype=np.uint32)
        self.num_items = 0
        self._built = False
        self._decoded = None
        self._lazy_touched = 0

    # ------------------------------------------------------------------- hash

    def _bucket_fp(self, keys) -> tuple[np.ndarray, np.ndarray]:
        h = hash_key64(keys, self.seed, self.hash_family)
        b = (((h >> U64(32)) & U64(0xFFFFFFFF)) * U64(self.bucket_count)) \
            >> U64(32)                                   # gcs.h:27-30 reduce
        fp = h & U64((1 << self.fingerprint_bits) - 1)
        return b.astype(np.int64), fp.astype(np.int64)

    # ------------------------------------------------------------------ build

    def add_all(self, keys) -> None:
        """One-shot static build (gcs.h:290-339) — fully vectorized."""
        if self._built:
            raise RuntimeError("GcsFilter is immutable once built")
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n > self.capacity:
            raise ValueError(f"{n} keys exceed capacity {self.capacity}")
        b, fp = self._bucket_fp(keys)
        order = np.lexsort((fp, b))
        b, fp = b[order], fp[order]
        # delta within bucket; first entry's delta is its fp (last = 0 at
        # each bucket start, gcs.h:318-325)
        delta = np.diff(fp, prepend=0)
        bucket_first = np.ones(n, dtype=bool)
        bucket_first[1:] = b[1:] != b[:-1]
        delta[bucket_first] = fp[bucket_first]
        self.stream, self.stream_bits, code_start = \
            rice_pack(delta, self.golomb_shift)          # gcs.h:102-109
        if self.stream_bits >= (1 << 32):
            # uint32 bucket offsets would silently wrap (~340M keys at 8-bit
            # sizing) and corrupt decode — refuse loudly; shard upstream
            raise ValueError(
                f"GCS Rice stream is {self.stream_bits} bits >= 2^32; "
                f"split the build into smaller shards")
        # bucket start bit-offsets (uint32): starts[i] = first code start of
        # bucket i (empty buckets share the next bucket's offset)
        first_code = np.searchsorted(b, np.arange(self.bucket_count + 1))
        self.starts = code_start[first_code].astype(np.uint32)
        self.num_items = n
        self._built = True
        self._decoded = None

    def add_batch(self, keys):
        """Alias for the bulk-build pipelines (xor-filter convention)."""
        from .cuckoo import BulkResult
        self.add_all(keys)
        return BulkResult(ok=self.num_items, overflow=0)

    # ----------------------------------------------------------------- decode

    def _decode_lanes(self, bucket_ids: np.ndarray) -> np.ndarray:
        """Decode just the given buckets' code lanes → sorted int64
        ``bucket << fp_bits | fp`` probe index.  ``rice_unpack`` already
        operates per independent lane, so decode cost (time AND memory) is
        bounded by the touched buckets, not the filter size."""
        starts = self.starts.astype(np.int64)
        lane, delta = rice_unpack(self.stream, self.stream_bits,
                                  starts[bucket_ids], starts[bucket_ids + 1],
                                  self.golomb_shift)
        if not len(lane):
            return np.zeros(0, dtype=np.int64)
        # lane-major deltas → per-bucket cumulative fingerprints
        cum = np.cumsum(delta)
        seg_start = np.flatnonzero(np.concatenate(
            ([True], lane[1:] != lane[:-1])))
        base = np.zeros(len(lane), dtype=np.int64)
        base[seg_start] = cum[seg_start] - delta[seg_start]
        np.maximum.accumulate(base, out=base)
        fp = cum - base
        b = np.asarray(bucket_ids, dtype=np.int64)[lane]
        return np.sort((b << self.fingerprint_bits) | fp)

    def _decode(self) -> np.ndarray:
        """Decode the full stream once → sorted int64 (bucket << fp_bits | fp)
        probe index (cached).  Vectorized in rounds: every bucket reads its
        k-th code in lockstep; unary runs end at the next zero bit."""
        if self._decoded is None:
            self._decoded = self._decode_lanes(
                np.arange(self.bucket_count, dtype=np.int64))
        return self._decoded

    # ------------------------------------------------------------------ query

    def contain_batch(self, keys) -> np.ndarray:
        """Probe-few workloads decode lazily: only the buckets this batch
        touches are unpacked (gcs.h:344-368 walks exactly one bucket's codes
        per Contain — the full-index decode was an engine-side cache, not
        reference semantics).  Once the cumulative touched-bucket count
        crosses half the filter, later batches flip to the cached full
        decode, which repeated heavy probing amortizes."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0 or not self._built:
            return np.zeros(len(keys), dtype=bool)
        b, fp = self._bucket_fp(keys)
        want = (b << self.fingerprint_bits) | fp
        if self._decoded is None:
            touched = np.unique(b)
            self._lazy_touched += len(touched)
            if self._lazy_touched <= self.bucket_count // 2:
                idx = self._decode_lanes(touched)
            else:
                idx = self._decode()
        else:
            idx = self._decoded
        if len(idx) == 0:
            return np.zeros(len(keys), dtype=bool)
        pos = np.minimum(np.searchsorted(idx, want), len(idx) - 1)
        return idx[pos] == want

    def contain(self, key: int) -> bool:
        return bool(self.contain_batch(np.array([key], dtype=np.uint64))[0])

    # ------------------------------------------------------------------ stats

    def size(self) -> int:
        return self.num_items

    def size_in_bytes(self) -> int:
        """Code stream + monotone-compressed bucket index (gcs.h:279)."""
        if not self._built:
            return len(self.stream) + self.starts.nbytes
        return len(self.stream) + \
            monotone_size_bytes(monotone_pack(self.starts))

    def merge(self, other):
        raise NotImplementedError("GCS filters are static; rebuild instead")

    def info(self) -> dict:
        return {"kind": self.KIND, "num_items": self.num_items,
                "bucket_count": self.bucket_count,
                "fingerprint_bits": self.fingerprint_bits,
                "golomb_shift": self.golomb_shift,
                "size_in_bytes": self.size_in_bytes()}


# ----------------------------------------------- monotone index (gcs.h:114)

#: MultiStageMonotoneList geometry (gcs.h:126-129)
_M_SHIFT1, _M_SHIFT2 = 6, 3
_M_FACTOR1, _M_FACTOR2 = 32, 16


def monotone_pack(data) -> dict:
    """Compress a monotone uint32 sequence as the reference's 3-level
    MultiStageMonotoneList (gcs.h:132-227), fully vectorized: residuals vs
    a linear model, 8-block and 64-block min levels at /16 and /32 scale,
    each level bit-packed at its own max width.  ~5-7 bits/entry on GCS
    bucket offsets vs 32 for the raw uint32 array."""
    d = np.asarray(data, dtype=np.int64)
    n = len(d)
    if n == 0:
        return {"n": 0, "factor": 0, "add": 0, "b1": 0, "b2": 0, "b3": 0,
                "blob": b""}
    diff = int(d[-1] - d[0])
    factor = (diff << 32) // n + 1                      # getScaleFactor
    i = np.arange(n, dtype=np.int64)
    expected = (i * factor) >> 32
    add = int((d - expected).min())
    orig3 = d - expected - add                          # >= 0 residuals
    bounds2 = np.arange(0, n, 1 << _M_SHIFT2)
    bounds1 = np.arange(0, n, 1 << _M_SHIFT1)
    sizes2 = np.diff(np.append(bounds2, n))
    sizes1 = np.diff(np.append(bounds1, n))
    g2 = np.minimum.reduceat(orig3, bounds2) // _M_FACTOR2
    g3 = orig3 - np.repeat(g2, sizes2) * _M_FACTOR2
    g1 = np.minimum.reduceat(orig3, bounds1) // _M_FACTOR1
    # level-2 stores its delta over level-1 (gcs.h:183-191)
    g2 = g2 - np.repeat(g1, np.diff(np.append(
        bounds1 >> _M_SHIFT2, len(g2)))) * (_M_FACTOR1 // _M_FACTOR2)
    b1 = int(g1.max()).bit_length() if len(g1) else 0
    b2 = int(g2.max()).bit_length() if len(g2) else 0
    b3 = int(g3.max()).bit_length() if len(g3) else 0
    blob = (pack_width64(g1, b1) if b1 else b"") + \
        (pack_width64(g2, b2) if b2 else b"") + \
        (pack_width64(g3, b3) if b3 else b"")
    return {"n": n, "factor": factor, "add": add,
            "b1": b1, "b2": b2, "b3": b3,
            "c1": len(g1), "c2": len(g2), "blob": blob}


def monotone_unpack(m: dict) -> np.ndarray:
    """Decode the full sequence (vectorized MultiStageMonotoneList_get,
    gcs.h:231-237, over every index at once)."""
    n = m["n"]
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    c1, c2 = m["c1"], m["c2"]
    b1, b2, b3 = m["b1"], m["b2"], m["b3"]
    blob = m["blob"]
    o1 = (c1 * b1 + 7) // 8
    o2 = o1 + (c2 * b2 + 7) // 8
    g1 = unpack_width64(blob[:o1], b1, c1).astype(np.int64) if b1 else \
        np.zeros(c1, dtype=np.int64)
    g2 = unpack_width64(blob[o1:o2], b2, c2).astype(np.int64) if b2 else \
        np.zeros(c2, dtype=np.int64)
    g3 = unpack_width64(blob[o2:], b3, n).astype(np.int64) if b3 else \
        np.zeros(n, dtype=np.int64)
    i = np.arange(n, dtype=np.int64)
    expected = (i * m["factor"]) >> 32
    vals = expected + m["add"] + g1[i >> _M_SHIFT1] * _M_FACTOR1 \
        + g2[i >> _M_SHIFT2] * _M_FACTOR2 + g3
    return vals.astype(np.uint32)


def monotone_size_bytes(m: dict) -> int:
    """At-rest bytes: packed levels + the 5 header words."""
    return len(m["blob"]) + 20
