"""Fused benchmark sweep kernel: generate → probe → count in one cache-resident pass.

The engine analog of the reference's timed lookup loop
(``benchmarks/bulk-insert-and-query.cc:635-637`` over the found-probability
sweep ``:615-618``), built for multi-core scaling: the naive numpy pipeline
allocates ~500 B of temporaries per probe, which makes 32 cores fight for
DRAM bandwidth (measured 2.3× per-task slowdown at 32 vs 8 cpus).  This
kernel processes ids in 64 Ki chunks with every buffer preallocated and every
op ``out=``-ed, so the working set stays in L2 and per-row DRAM traffic is
just the id stream and the (L3-resident) bucket gathers.

Bucket probe uses the reference's own SWAR trick vectorized
(``src/singletable.h:148-173``, ``src/bitsutil.h:8-19``): each 4×uint16
bucket row is gathered as ONE uint64 and ``hasvalue16`` detects a matching
tag lane without materializing ``(n, 4)`` comparisons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..util import cache_get

U64 = np.uint64
_M1 = U64(0xFF51AFD7ED558CCD)
_M2 = U64(0xC4CEB9FE1A85EC53)
_S33 = U64(33)
_MURMUR_C = U64(0x5BD1E995)
_LANES = U64(0x0001000100010001)
_HIGHS = U64(0x8000800080008000)

P_SWEEP = (0.0, 0.25, 0.5, 0.75, 1.0)
CHUNK = 65536


def _murmur64_into(h: np.ndarray, tmp: np.ndarray) -> None:
    """In-place murmur3 fmix64 (hashutil.h:112-120) using one scratch buffer."""
    np.right_shift(h, _S33, out=tmp)
    np.bitwise_xor(h, tmp, out=h)
    np.multiply(h, _M1, out=h)
    np.right_shift(h, _S33, out=tmp)
    np.bitwise_xor(h, tmp, out=h)
    np.multiply(h, _M2, out=h)
    np.right_shift(h, _S33, out=tmp)
    np.bitwise_xor(h, tmp, out=h)


class SweepProber:
    """Per-worker fused generate+probe+count over a stacked partitioned filter.

    Counts land in a (5, 2, 2) matrix indexed (p_idx, expect_member, found);
    one such matrix per task is the entire task output — no key columns ever
    leave the worker.
    """

    def __init__(self, inserted_ref, filters_ref, seed: int, num_shards: int,
                 chunk: int = CHUNK):
        from .membership import PartitionedFilterProbe
        self._keys = ray.get(inserted_ref)
        view = PartitionedFilterProbe(filters_ref)
        proto = view._proto
        if getattr(proto, "hash_family", "mix") != "mix":
            # the fused sweep inlines the mix_split hash pipeline; other
            # families must go through the generic probe path
            raise ValueError("SweepProber supports hash_family='mix' only")
        self._variant = proto.variant
        self._nb = U64(proto.num_buckets)
        self._nb_mask = U64(proto.num_buckets - 1) if proto.variant == "pow2" \
            else U64(0)
        self._tag_mask = U64((1 << proto.bits_per_tag) - 1)
        self._seed = U64(seed & 0xFFFFFFFFFFFFFFFF)
        self._filter_seed = U64(proto.seed)
        self._num_shards = num_shards
        self._shard_shift = U64(64 - int(num_shards).bit_length() + 1)
        # stacked (num_shards*nb) buckets, one uint64 per 4-tag bucket row
        self._tags64 = view._tags64   # shared zero-copy when the broadcast
                                      # came from filters_to_stacked_ref
        self._any_victim = view._any_victim
        self._view = view
        # positive-probability thresholds, indexed by id % 5
        lut = []
        for p in P_SWEEP:
            lut.append(0xFFFFFFFFFFFFFFFF if p >= 1.0
                       else int(p * float(2**64)))
        self._thresh_lut = np.array(lut, dtype=np.uint64)
        # preallocated chunk buffers
        self._chunk = int(chunk)
        self._b = {name: np.empty(self._chunk, dtype=np.uint64)
                   for name in ("u", "tmp", "v", "keys", "i1", "i2", "w")}
        self._j = np.empty(self._chunk, dtype=np.int64)  # int64 view for np.take
        self._pidx = np.empty(self._chunk, dtype=np.int64)
        self._found = np.empty(self._chunk, dtype=bool)
        self._ispos = np.empty(self._chunk, dtype=bool)

    def _haszero16_inplace(self, x: np.ndarray, tmp: np.ndarray,
                           out: np.ndarray) -> None:
        """out |= any-16-bit-lane-of-x-is-zero (bitsutil.h:haszero*)."""
        np.subtract(x, _LANES, out=tmp)
        np.bitwise_not(x, out=x)
        np.bitwise_and(tmp, x, out=tmp)
        np.bitwise_and(tmp, _HIGHS, out=tmp)
        np.bitwise_or(out, tmp != 0, out=out)

    def run(self, ids: np.ndarray) -> np.ndarray:
        """ids (uint64) → (5, 2, 2) int64 counts (p_idx, expect, found)."""
        counts = np.zeros(20, dtype=np.int64)
        nkeys = U64(max(1, len(self._keys)))
        for s in range(0, len(ids), self._chunk):
            ch = ids[s:s + self._chunk]
            n = len(ch)
            u, tmp, v = self._b["u"][:n], self._b["tmp"][:n], self._b["v"][:n]
            keys, i1, i2 = self._b["keys"][:n], self._b["i1"][:n], self._b["i2"][:n]
            w = self._b["w"][:n]
            pidx, found, ispos = self._pidx[:n], self._found[:n], self._ispos[:n]
            # ---- generate (benchmarks/random.h MixIn, random-access form)
            np.remainder(ch, U64(5), out=u)          # p index
            np.copyto(pidx, u, casting="unsafe")
            np.add(ch, self._seed, out=u)
            _murmur64_into(u, tmp)                   # decision stream
            np.less_equal(u, self._thresh_lut[pidx], out=ispos)
            if len(self._keys) == 0:
                # mirror _WorkloadGen's empty-keys guard: with nothing
                # inserted every probe is a negative (ADVICE r1)
                ispos[:] = False
            np.multiply(u, _M1, out=v)               # derived key stream
            _murmur64_into(v, tmp)
            keys[:] = v                              # negatives: random key
            if ispos.any():
                np.remainder(v, nkeys, out=tmp)
                sel = np.flatnonzero(ispos)
                keys[sel] = self._keys[tmp[sel].astype(np.int64)]
            # ---- probe (cuckoofilter.h:183-204, SWAR per singletable.h:148)
            np.add(keys, self._filter_seed, out=u)
            _murmur64_into(u, tmp)                   # item hash
            if self._variant == "pow2":
                np.right_shift(u, U64(32), out=i1)
                np.bitwise_and(i1, self._nb_mask, out=i1)
                np.bitwise_and(u, self._tag_mask, out=v)  # tag
                np.add(v, v == 0, out=v)                  # 0 → 1 remap
                np.multiply(v, _MURMUR_C, out=i2)
                np.bitwise_xor(i1, i2, out=i2)
                np.bitwise_and(i2, U64(0xFFFFFFFF), out=i2)
                np.bitwise_and(i2, self._nb_mask, out=i2)
            else:
                # stable variant (cuckoofilter_stable.h:60-102): i1 from LOW
                # 32 bits via Lemire reduce, tag from HIGH bits, involution
                # i2 = (nb - i1 - r) mod nb with odd r
                np.bitwise_and(u, U64(0xFFFFFFFF), out=i1)
                np.multiply(i1, self._nb, out=i1)
                np.right_shift(i1, U64(32), out=i1)
                np.right_shift(u, U64(32), out=v)
                np.bitwise_and(v, self._tag_mask, out=v)  # tag
                np.add(v, v == 0, out=v)
                np.multiply(v, U64(0xC4CEB9FE1A85EC53), out=i2)
                np.bitwise_and(i2, U64(0xFFFFFFFF), out=i2)
                np.multiply(i2, self._nb >> U64(1), out=i2)
                np.right_shift(i2, U64(32), out=i2)       # reduce32(h2, nb/2)
                np.left_shift(i2, U64(1), out=i2)
                np.add(i2, U64(1), out=i2)                # odd r
                np.add(i2, i1, out=i2)
                np.subtract(self._nb, i2, out=i2)         # nb - i1 - r (mod)
                np.add(i2, np.where(i2 > self._nb, self._nb, U64(0)), out=i2)
            np.right_shift(keys, self._shard_shift, out=tmp)  # shard
            np.multiply(tmp, self._nb, out=tmp)               # base row
            np.add(i1, tmp, out=i1)
            np.add(i2, tmp, out=i2)
            np.multiply(v, _LANES, out=v)             # tag broadcast pattern
            found[:] = False
            j = self._j[:n]
            np.copyto(j, i1, casting="unsafe")
            np.take(self._tags64, j, out=w)
            np.bitwise_xor(w, v, out=w)
            self._haszero16_inplace(w, u, found)
            np.copyto(j, i2, casting="unsafe")
            np.take(self._tags64, j, out=w)
            np.bitwise_xor(w, v, out=w)
            self._haszero16_inplace(w, u, found)
            if self._any_victim:
                # rare path: recompute exactly via the view (small chunks)
                found |= self._view.contain_batch(keys)
            # ---- count (p, expect, found)
            np.left_shift(pidx, 2, out=pidx)
            idx = pidx
            idx += ispos << 1
            idx += found
            counts += np.bincount(idx, minlength=20)
        return counts.reshape(5, 2, 2)


_SWEEP_CACHE: dict = {}


def sweep_probe_fn(batch: pa.Table, *, inserted_ref=None, filters_ref=None,
                   seed: int = 1234, num_shards: int = 32,
                   chunk: int = CHUNK) -> pa.Table:
    """Task-pool batch fn (fuses with ReadRange): ids → per-p count rows."""
    key = (inserted_ref.hex(), filters_ref.hex(), seed, num_shards, chunk)
    prober = cache_get(_SWEEP_CACHE, key,
                       lambda: SweepProber(inserted_ref, filters_ref,
                                           seed, num_shards, chunk=chunk))
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64,
                                                                   copy=False)
    c = prober.run(ids)
    return pa.table({
        "p": pa.array(list(P_SWEEP), type=pa.float64()),
        "n_pos": pa.array(c[:, 1, :].sum(axis=1), type=pa.int64()),
        "n_pos_found": pa.array(c[:, 1, 1], type=pa.int64()),
        "n_neg": pa.array(c[:, 0, :].sum(axis=1), type=pa.int64()),
        "n_neg_found": pa.array(c[:, 0, 1], type=pa.int64()),
    })


def run_sweep(inserted_ref, filters_ref, n_probes: int, seed: int = 1234,
              num_shards: int = 32, num_blocks: int = 64,
              chunk: int = CHUNK) -> dict:
    """Distributed found-probability sweep; returns aggregate + per-p metrics."""
    import ray.data
    parts = ray.data.range(n_probes, override_num_blocks=num_blocks) \
        .map_batches(sweep_probe_fn, batch_format="pyarrow", batch_size=None,
                     fn_kwargs={"inserted_ref": inserted_ref,
                                "filters_ref": filters_ref,
                                "seed": seed, "num_shards": num_shards,
                                "chunk": chunk}) \
        .to_pandas()
    g = parts.groupby("p").sum().reset_index()
    n_pos, n_pos_f = int(g["n_pos"].sum()), int(g["n_pos_found"].sum())
    n_neg, n_neg_f = int(g["n_neg"].sum()), int(g["n_neg_found"].sum())
    return {
        "n_probes": n_pos + n_neg,
        "recall": (n_pos_f / n_pos) if n_pos else 1.0,
        "fpr": (n_neg_f / n_neg) if n_neg else 0.0,
        "per_p": {
            float(r["p"]): {"n": int(r["n_pos"] + r["n_neg"]),
                            "recall": (r["n_pos_found"] / r["n_pos"])
                            if r["n_pos"] else 1.0,
                            "fpr": (r["n_neg_found"] / r["n_neg"])
                            if r["n_neg"] else 0.0}
            for _, r in g.iterrows()},
    }
