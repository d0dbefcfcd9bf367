"""Membership-workload pipelines: probe mixing, recall/FPR measurement, deletes.

Re-expresses the reference benchmark's workload stages (SURVEY.md §2.5):

- ``mixed_workload``  — ``DuplicateFreeMixIn(to_lookup, to_add, p)``
  (benchmarks/random.h:98-109) + the found-probability sweep
  p ∈ {0, .25, .5, .75, 1} (bulk-insert-and-query.cc:615-618): a probe
  Dataset whose keys are drawn from the inserted set w.p. ``p`` and from a
  disjoint seeded stream otherwise, with ``expect_member`` ground truth
  (FIXTURES.md F2).
- ``measure_membership`` — the self-checking audit: recall on
  ``expect_member=true`` rows must be exactly 1.0 (bulk-insert-and-query.cc:
  646-657), FPR measured on the rest (intersection-corrected by
  construction: the negative stream is disjoint).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..kernels.hashing import splitmix64
from ..stages.membership import FilterProbe
from ..util import cache_get


def mixed_workload(inserted_keys: np.ndarray, n_probes: int, p: float,
                   seed: int = 1234, group_key: str = "",
                   override_num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Deterministic probe Dataset with found-probability ``p``.

    Positives sample the inserted set (duplicate-free via permutation walk);
    negatives come from a seeded splitmix64 stream offset far from any
    generator stream (disjoint w.h.p. — same 2^-64 collision caveat as the
    reference's random workloads).
    """
    inserted = np.asarray(inserted_keys, dtype=np.uint64)
    n_pos = int(round(n_probes * p))
    n_neg = n_probes - n_pos
    rng = np.random.default_rng(seed)
    if n_pos > len(inserted):
        n_pos = len(inserted)
        n_neg = n_probes - n_pos
    pos = rng.choice(inserted, size=n_pos, replace=False) if n_pos else \
        np.empty(0, dtype=np.uint64)
    neg = splitmix64(n_neg, seed=seed ^ 0xD1B54A32D192ED03) if n_neg else \
        np.empty(0, dtype=np.uint64)
    keys = np.concatenate([pos, neg])
    expect = np.zeros(len(keys), dtype=bool)
    expect[:len(pos)] = True
    perm = rng.permutation(len(keys))
    tbl = pa.table({
        "group_key": pa.array([group_key] * len(keys)),
        "key_hi64": pa.array(keys[perm], type=pa.uint64()),
        "expect_member": pa.array(expect[perm], type=pa.bool_()),
        "found_probability": pa.array(np.full(len(keys), p)),
    })
    ds = ray.data.from_arrow(tbl)
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds


class _WorkloadGen:
    """Actor-pool batch fn turning ``ray.data.range`` ids into probe rows.

    Random-access deterministic streams (murmur64 of id+seed) instead of the
    sequential splitmix64 walk so any block can generate its rows without
    coordination — the distributed form of ``DuplicateFreeMixIn``
    (benchmarks/random.h:98-109).
    """

    #: the reference's found-probability sweep (bulk-insert-and-query.cc:615)
    P_SWEEP = (0.0, 0.25, 0.5, 0.75, 1.0)

    def __init__(self, inserted_ref, p, seed: int, num_shards: int = 0):
        from ..kernels.hashing import mix_split
        self._mix = mix_split
        self._keys = ray.get(inserted_ref) if inserted_ref is not None else \
            np.empty(0, dtype=np.uint64)
        self._p = p  # float, or "sweep" for the 5-point sweep keyed on id%5
        self._seed = int(seed)
        self._num_shards = int(num_shards)

    def _pos_mask(self, ids: np.ndarray, u1: np.ndarray) -> np.ndarray:
        if self._p == "sweep":
            p = np.take(np.asarray(self.P_SWEEP), (ids % np.uint64(5)).astype(np.int64))
        else:
            p = np.full(len(ids), float(self._p))
        # p=1.0 would overflow a float→uint64 threshold; use <= with a clipped
        # max so the top of the sweep is all-positive.
        thresh = np.where(p >= 1.0, np.uint64(0xFFFFFFFFFFFFFFFF),
                          (np.clip(p, 0.0, 0.999999) * float(2**64)).astype(np.uint64))
        return u1 <= thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        u1 = self._mix(ids, self._seed)
        u2 = self._mix(ids, self._seed ^ 0xA076_1D64_78BD_642F)
        neg = self._mix(ids, self._seed ^ 0xE703_7ED1_A0B4_28DB)
        is_pos = self._pos_mask(ids, u1)
        if len(self._keys) == 0:
            is_pos = np.zeros(len(ids), dtype=bool)
        keys = neg
        if is_pos.any():
            keys = np.where(is_pos,
                            self._keys[(u2 % np.uint64(max(1, len(self._keys))))
                                       .astype(np.int64)],
                            neg)
        cols = {
            "key_hi64": pa.array(keys, type=pa.uint64()),
            "expect_member": pa.array(is_pos, type=pa.bool_()),
        }
        if self._num_shards:
            from .build import shard_for_keys
            cols["_shard"] = pa.array(shard_for_keys(keys, self._num_shards),
                                      type=pa.int32())
        return pa.table(cols)


def mixed_workload_distributed(inserted_ref, n_probes: int, p: float,
                               seed: int = 1234, num_shards: int = 0,
                               num_blocks: int = 64,
                               concurrency: int = 4) -> "ray.data.Dataset":
    """Distributed probe-workload generator: ``range(n)`` → per-block key
    synthesis against a broadcast inserted-key array (``ray.put`` once).

    Positives are sampled with replacement (duplicate probes allowed — the
    reference's non-dup-free ``MixIn``, benchmarks/random.h:73-96); negatives
    are a disjoint-w.h.p. hash stream.  ``num_shards`` > 0 adds the ``_shard``
    routing column for partitioned-filter probes.
    """
    return ray.data.range(n_probes, override_num_blocks=num_blocks).map_batches(
        _WorkloadGen, batch_format="pyarrow", batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs={"inserted_ref": inserted_ref, "p": p,
                               "seed": seed, "num_shards": num_shards})


# Per-worker-process caches for the task-based (stateless-operator) hot path.
# Task pools fuse consecutive map_batches into ONE pass per block and reuse
# warm worker processes — no per-run actor spawn — so heavy setup (broadcast
# fetch + filter deserialization) is cached here, keyed by ObjectRef so a new
# broadcast invalidates naturally.
_GEN_CACHE: dict = {}
_PROBE_CACHE: dict = {}


def workload_gen_fn(batch: pa.Table, *, inserted_ref=None, p=0.25,
                    seed: int = 1234, num_shards: int = 0) -> pa.Table:
    key = (inserted_ref.hex() if inserted_ref is not None else None,
           str(p), seed, num_shards)
    gen = cache_get(_GEN_CACHE, key,
                    lambda: _WorkloadGen(inserted_ref, p, seed, num_shards))
    return gen(batch)


def partitioned_probe_fn(batch: pa.Table, *, filters_ref=None,
                         key_col: str = "key_hi64",
                         shard_col: str = "_shard") -> pa.Table:
    from ..stages.membership import PartitionedFilterProbe
    key = (filters_ref.hex(), key_col, shard_col)
    probe = cache_get(_PROBE_CACHE, key,
                      lambda: PartitionedFilterProbe(
                          filters_ref, key_col=key_col, shard_col=shard_col))
    return probe(batch)


def probe_workload_fused(inserted_ref, filters_ref, n_probes: int, p,
                         seed: int = 1234, num_shards: int = 0,
                         num_blocks: int = 64) -> "ray.data.Dataset":
    """Generate-and-probe as a fused task chain: range → gen → probe run as a
    single pass per block (Ray fuses adjacent task-pool operators), with the
    broadcast filter/key state cached per worker process."""
    wl = ray.data.range(n_probes, override_num_blocks=num_blocks).map_batches(
        workload_gen_fn, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"inserted_ref": inserted_ref, "p": p, "seed": seed,
                   "num_shards": num_shards})
    return wl.map_batches(
        partitioned_probe_fn, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"filters_ref": filters_ref, "shard_col": "_shard"})


def probe_dataset(workload: "ray.data.Dataset", filters_ref,
                  group_col: Optional[str] = None, key_col: str = "key_hi64",
                  sketch_col: Optional[str] = None,
                  concurrency: int = 4, batch_size: int = 65536) -> "ray.data.Dataset":
    """Membership probe stage over a workload Dataset (broadcast filters)."""
    return workload.map_batches(
        FilterProbe, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"filters_ref": filters_ref, "key_col": key_col,
                               "group_col": group_col, "sketch_col": sketch_col})


_SINGLE_CACHE: dict = {}


def _load_probe_filter(filter_ref):
    """Cache-fill for a broadcast filter row: reconstruct, then build any
    decode-once probe state (e.g. TailFilter's sorted entry index) OUTSIDE
    the timed contain_batch calls — per-worker setup, same treatment as the
    cuckoo path's stacked broadcast arrays."""
    from ..kernels import row_to_filter
    f = row_to_filter(ray.get(filter_ref))
    warm = getattr(f, "_sorted_entries", None)
    if warm is not None:
        warm()
    return f


def single_gen_probe_fn(batch: pa.Table, *, inserted_ref=None, filter_ref=None,
                        p=0.5, seed: int = 1234) -> pa.Table:
    """Fused gen+probe+count against ONE broadcast filter of any kind
    (cuckoo / semisort / stable / bloom / blockedbloom / xor) — the
    kind-generic benchmark loop (per-worker cached state, task-pool
    fusable)."""
    key = (filter_ref.hex(),)
    filt = cache_get(_SINGLE_CACHE, key,
                     lambda: _load_probe_filter(filter_ref))
    gkey = (inserted_ref.hex() if inserted_ref is not None else None,
            str(p), seed, 0)
    gen = cache_get(_GEN_CACHE, gkey,
                    lambda: _WorkloadGen(inserted_ref, p, seed, 0))
    wl = gen(batch)
    keys = wl.column("key_hi64").to_numpy(zero_copy_only=False) \
        .astype(np.uint64, copy=False)
    exp = wl.column("expect_member").to_numpy(zero_copy_only=False)
    got = filt.contain_batch(keys)
    return pa.table({
        "n_pos": pa.array([int(exp.sum())], pa.int64()),
        "n_pos_found": pa.array([int((exp & got).sum())], pa.int64()),
        "n_neg": pa.array([int((~exp).sum())], pa.int64()),
        "n_neg_found": pa.array([int((~exp & got).sum())], pa.int64()),
    })


def multi_gen_probe_fn(batch: pa.Table, *, configs=None, p=0.5,
                       seed: int = 1234) -> pa.Table:
    """Fused gen+probe+count against MANY broadcast filters in one pass
    (the batched form of ``single_gen_probe_fn`` — one workload generation
    per distinct inserted-set per batch, then every filter probes it).

    ``configs`` is a list of ``(name, filter_ref, inserted_ref)``.  Emits
    one count row per config per batch, including the summed wall spent in
    ``contain_batch`` — an honest per-core probe rate
    (keys / contain-seconds), directly comparable to the reference's
    single-threaded M finds/s, unlike a per-config pipeline wall that is
    stage-latency-bound at sweep sizes."""
    import time as _time

    wls: dict = {}
    names, npos, nposf, nneg, nnegf, csec = [], [], [], [], [], []
    for name, fref, ins_ref in configs:
        ikey = ins_ref.hex()
        wl = wls.get(ikey)
        if wl is None:
            gkey = (ikey, str(p), seed, 0)
            gen = cache_get(_GEN_CACHE, gkey,
                            lambda: _WorkloadGen(ins_ref, p, seed, 0))
            w = gen(batch)
            wl = wls[ikey] = (
                w.column("key_hi64").to_numpy(zero_copy_only=False)
                 .astype(np.uint64, copy=False),
                w.column("expect_member").to_numpy(zero_copy_only=False))
        keys, exp = wl
        fkey = (fref.hex(),)
        filt = cache_get(_SINGLE_CACHE, fkey,
                         lambda fr=fref: _load_probe_filter(fr),
                         maxn=24)
        t0 = _time.perf_counter()
        got = filt.contain_batch(keys)
        dt = _time.perf_counter() - t0
        names.append(name)
        npos.append(int(exp.sum()))
        nposf.append(int((exp & got).sum()))
        nneg.append(int((~exp).sum()))
        nnegf.append(int((~exp & got).sum()))
        csec.append(dt)
    return pa.table({
        "name": pa.array(names), "n_pos": pa.array(npos, pa.int64()),
        "n_pos_found": pa.array(nposf, pa.int64()),
        "n_neg": pa.array(nneg, pa.int64()),
        "n_neg_found": pa.array(nnegf, pa.int64()),
        "contain_s": pa.array(csec, pa.float64()),
    })


def measure_filters_batched(configs, n_probes: int, p=0.5,
                            seed: int = 1234,
                            num_blocks: int = 32) -> dict:
    """Distributed recall/FPR/core-rate measurement for MANY filters in ONE
    map_batches pass (VERDICT r4 #5: the sequential per-config pipelines
    paid ~1.5 s of stage latency each; batching probes all configs per
    workload batch).  ``configs``: list of (name, filter_ref, inserted_ref).
    Returns {name: {recall, fpr, n_probes, contain_s}}."""
    parts = ray.data.range(n_probes, override_num_blocks=num_blocks) \
        .map_batches(multi_gen_probe_fn, batch_format="pyarrow",
                     batch_size=None,
                     fn_kwargs={"configs": list(configs), "p": p,
                                "seed": seed}).to_pandas()
    out = {}
    for name, g in parts.groupby("name"):
        n_pos, n_pos_f = int(g["n_pos"].sum()), int(g["n_pos_found"].sum())
        n_neg, n_neg_f = int(g["n_neg"].sum()), int(g["n_neg_found"].sum())
        out[str(name)] = {
            "n_probes": n_pos + n_neg,
            "recall": (n_pos_f / n_pos) if n_pos else 1.0,
            "fpr": (n_neg_f / n_neg) if n_neg else 0.0,
            "contain_s": float(g["contain_s"].sum()),
        }
    return out


def measure_single_filter(inserted_ref, filter_ref, n_probes: int,
                          p=0.5, seed: int = 1234,
                          num_blocks: int = 32) -> dict:
    """Distributed recall/FPR measurement against one broadcast filter."""
    parts = ray.data.range(n_probes, override_num_blocks=num_blocks) \
        .map_batches(single_gen_probe_fn, batch_format="pyarrow",
                     batch_size=None,
                     fn_kwargs={"inserted_ref": inserted_ref,
                                "filter_ref": filter_ref, "p": p,
                                "seed": seed}).to_pandas()
    n_pos, n_pos_f = int(parts["n_pos"].sum()), int(parts["n_pos_found"].sum())
    n_neg, n_neg_f = int(parts["n_neg"].sum()), int(parts["n_neg_found"].sum())
    return {"n_probes": n_pos + n_neg,
            "recall": (n_pos_f / n_pos) if n_pos else 1.0,
            "fpr": (n_neg_f / n_neg) if n_neg else 0.0}


def delete_keys_partitioned(filters_rows, delete_ds: "ray.data.Dataset",
                            num_shards: int, key_col: str = "key_hi64"
                            ) -> "ray.data.Dataset":
    """Distributed Delete against a partitioned filter (src/cuckoofilter.h:
    206-238 semantics per shard, incl. victim resurrection).

    Deletes are routed to their owning shard by the same high-bit hash
    partitioning the build used (ONE partitioning key reused across stages —
    SURVEY.md §7.3), applied per shard in a single task, and the UPDATED
    shard rows are emitted — the delete is a pure function from (filter
    shards, delete keys) to new filter shards, so it composes with the
    checkpoint layer like any build.

    Returns Dataset[(_shard, sketch, num_items, n_deleted, n_notfound)].
    """
    from ..kernels import deserialize, row_to_filter, serialize
    from .build import shard_for_keys

    # Both sides — shard rows and delete keys — flow through ONE
    # groupby(_shard) shuffle as Datasets.  The driver never touches a sketch
    # blob (VERDICT r3 #3: the old passthrough `take_all()`-ed every updated
    # shard; at 256 shards × hundreds of MB that materialized the whole
    # filter state driver-side).  Union schema: (_shard, key_hi64?, sketch?,
    # num_items?) with nulls marking the other side's columns.
    if not hasattr(filters_rows, "map_batches"):     # list of driver rows
        filters_ds = ray.data.from_arrow(pa.Table.from_pylist([{
            "_shard": int(r["_shard"]),
            "sketch": r["sketch"] if "sketch" in r
            else serialize(row_to_filter(r)),
            "num_items": int(r.get("num_items", 0)),
        } for r in filters_rows]))
    else:
        filters_ds = filters_rows

    def prep_filters(batch: pa.Table) -> pa.Table:
        if "sketch" in batch.column_names:
            sk = batch.column("sketch").cast(pa.large_binary())
        else:
            sk = pa.array([serialize(row_to_filter(r))
                           for r in batch.to_pylist()], pa.large_binary())
        ni = batch.column("num_items").cast(pa.int64()) \
            if "num_items" in batch.column_names \
            else pa.array([0] * len(batch), pa.int64())
        return pa.table({
            "_shard": batch.column("_shard").cast(pa.int32()),
            key_col: pa.nulls(len(batch), pa.uint64()),
            "sketch": sk,
            "num_items": ni,
        })

    def prep_deletes(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        return pa.table({
            "_shard": pa.array(shard_for_keys(keys, num_shards), pa.int32()),
            key_col: pa.array(keys, pa.uint64()),
            "sketch": pa.nulls(len(batch), pa.large_binary()),
            "num_items": pa.nulls(len(batch), pa.int64()),
        })

    combined = filters_ds.map_batches(prep_filters, batch_format="pyarrow",
                                      batch_size=None) \
        .union(delete_ds.map_batches(prep_deletes, batch_format="pyarrow",
                                     batch_size=None))

    def apply_deletes(group: pa.Table) -> pa.Table:
        shard = int(group.column("_shard")[0].as_py())
        sk = group.column("sketch")
        valid = sk.is_valid().to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        if len(idx) != 1:
            raise ValueError(
                f"shard {shard}: expected exactly one filter row, got "
                f"{len(idx)} — delete routed to a shard the build never "
                f"produced (num_shards mismatch?)")
        filt = deserialize(sk[int(idx[0])].as_py())
        # drop_null keeps the uint64 dtype; a masked to_numpy would round-trip
        # through float64 (NaN-for-null) and corrupt keys above 2^53
        keys = group.column(key_col).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        if len(keys):
            deleted = filt.delete_batch(keys)
            n_del, n_nf = int(deleted.sum()), int((~deleted).sum())
            blob = serialize(filt)
        else:                                       # untouched passthrough
            n_del = n_nf = 0
            blob = sk[int(idx[0])].as_py()
        return pa.table({
            "_shard": pa.array([shard], pa.int32()),
            "sketch": pa.array([blob], pa.large_binary()),
            "num_items": pa.array([filt.size()], pa.int64()),
            "n_deleted": pa.array([n_del], pa.int64()),
            "n_notfound": pa.array([n_nf], pa.int64()),
        })

    return combined.groupby("_shard").map_groups(apply_deletes,
                                                 batch_format="pyarrow")


def measure_membership(probed: "ray.data.Dataset") -> dict:
    """Aggregate recall / FPR from a probed workload (vectorized, streaming).

    recall must be 1.0 (zero false negatives, example/test.cc:42-44);
    fpr = found-negatives / negatives (disjoint stream ⇒ already
    intersection-corrected, bulk-insert-and-query.cc:660-671).
    """

    def stats(batch: pa.Table) -> pa.Table:
        exp = batch.column("expect_member").to_numpy(zero_copy_only=False)
        got = batch.column("is_member").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_pos": pa.array([int(exp.sum())], type=pa.int64()),
            "n_pos_found": pa.array([int((exp & got).sum())], type=pa.int64()),
            "n_neg": pa.array([int((~exp).sum())], type=pa.int64()),
            "n_neg_found": pa.array([int((~exp & got).sum())], type=pa.int64()),
        })

    parts = probed.map_batches(stats, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    n_pos, n_pos_f = int(parts["n_pos"].sum()), int(parts["n_pos_found"].sum())
    n_neg, n_neg_f = int(parts["n_neg"].sum()), int(parts["n_neg_found"].sum())
    return {
        "n_probes": n_pos + n_neg,
        "recall": (n_pos_f / n_pos) if n_pos else 1.0,
        "fpr": (n_neg_f / n_neg) if n_neg else 0.0,
        "n_pos": n_pos, "n_neg": n_neg,
    }
