"""Membership probing stages: broadcast-filter ``map_batches`` actors.

The reference answers ``Contain`` against an in-process filter
(src/cuckoofilter.h:183-204); its batched analog is ``CuckooBatchPrefetch``'s
64-key staging (src/cuckoo-batch-prefetch.h:109-139).  The Ray-idiomatic
equivalent: the filter-shard table is ``ray.put`` once, each probe actor
deserializes the shards it needs **once in __init__**, and every Arrow batch
is answered with one vectorized gather/compare per group — no shuffle of the
probe stream, no per-batch filter shipping.

Scale note: per-group filters at 12 bits/key are ~1.9 bytes/key, so even 10^9
keys/group is ~2 GB — broadcast per node via the object store is the right
topology for probe-heavy workloads.  For groups beyond worker memory, build a
*partitioned* filter (shard by high key bits) and route probes with
``groupby(shard)`` instead (SURVEY.md §4.3.3).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..kernels import deserialize, row_to_filter


def filters_to_ref(filters_ds_or_rows, group_col: str = "group_key") -> "ray.ObjectRef":
    """Materialize a (small) filter-shard Dataset / row list into a broadcast
    dict {group value: shard-row dict} placed once in the object store.

    ``group_col`` is the column the build grouped on (e.g. ``"lang"`` for
    ``build_grouped_filters(ds, "lang")``); rows missing it key under ``""``.
    """
    if hasattr(filters_ds_or_rows, "take_all"):
        rows = filters_ds_or_rows.take_all()
    else:
        rows = list(filters_ds_or_rows)
    table = {}
    for r in rows:
        key = r.get(group_col, r.get("group_key", ""))
        table[key] = r
    return ray.put(table)


def filters_to_stacked_ref(filters_ds_or_rows, group_col: str = "_shard"
                           ) -> "ray.ObjectRef":
    """Broadcast a partitioned CUCKOO filter as ONE pre-stacked zero-copy
    blob: the driver stacks the shard tables once and ``ray.put``s the numpy
    arrays; every worker reads the SAME plasma buffer (per node, not per
    worker) with no deserialization or copying in ``__init__``.

    This is the right probe topology once shard tables are big: with the
    row-dict broadcast each worker rebuilds a private copy (N_workers × table
    RAM + seconds of unpack per worker); here the mapping is shared.
    """
    from ..kernels import deserialize, row_to_filter

    if hasattr(filters_ds_or_rows, "take_all"):
        rows = filters_ds_or_rows.take_all()
    else:
        rows = list(filters_ds_or_rows)
    by_shard = {}
    for r in rows:
        f = deserialize(r["sketch"]) if "sketch" in r else row_to_filter(r)
        by_shard[int(r[group_col])] = f
    shards = sorted(by_shard)
    if shards != list(range(len(shards))):
        raise ValueError(f"expected contiguous shard ids, got {shards}")
    flist = [by_shard[s] for s in shards]
    cfg = {(f.seed, f.num_buckets, f.bits_per_tag, f.variant, f.hash_family)
           for f in flist}
    if len(cfg) != 1:
        raise ValueError(f"shards disagree on filter config: {cfg}")
    seed, nb, bits, variant, family = next(iter(cfg))
    return ray.put({
        "stacked": "cuckoo",
        "seed": seed, "num_buckets": nb, "bits_per_tag": bits,
        "variant": variant, "hash_family": family, "num_shards": len(flist),
        "tags64": np.ascontiguousarray(
            np.vstack([f.tags for f in flist])).view(np.uint64).reshape(-1),
        "vic_used": np.array([f.victim_used for f in flist]),
        "vic_index": np.array([f.victim_index for f in flist], dtype=np.int64),
        "vic_tag": np.array([f.victim_tag for f in flist], dtype=np.uint16),
    })


def _rows_to_filters(table: dict, sketch_col=None) -> dict:
    """Deserialize shard rows: explicit sketch column, else the expanded
    filter-row schema (serde.filter_to_row), else a default "sketch" blob."""
    out = {}
    for gk, row in table.items():
        if sketch_col is not None and sketch_col in row:
            out[gk] = deserialize(row[sketch_col])
        elif "kind" in row:
            out[gk] = row_to_filter(row)
        elif "sketch" in row:
            out[gk] = deserialize(row["sketch"])
        else:
            raise KeyError(f"shard row for {gk!r} has neither a sketch blob "
                           f"nor filter-row fields: {sorted(row)}")
    return out


class FilterProbe:
    """Actor-pool ``map_batches`` callable: appends a bool membership column.

    __init__ (once per actor): fetch the broadcast shard dict, deserialize
    every filter into its NumPy kernel form.
    __call__ (per batch): factorize the group column, one vectorized
    ``contain_batch`` per group present in the batch.
    """

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 group_col: Optional[str] = None, out_col: str = "is_member",
                 sketch_col: Optional[str] = None):
        table = ray.get(filters_ref)
        self._filters = _rows_to_filters(table, sketch_col)
        self._key_col = key_col
        self._group_col = group_col
        self._out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        out = np.zeros(len(keys), dtype=bool)
        if self._group_col is None:
            filt = next(iter(self._filters.values()))
            out = filt.contain_batch(keys)
        else:
            groups = batch.column(self._group_col).to_numpy(zero_copy_only=False)
            codes, uniques = pd.factorize(groups)
            for code, gk in enumerate(uniques):
                filt = self._filters.get(gk)
                if filt is None:
                    continue
                mask = codes == code
                out[mask] = filt.contain_batch(keys[mask])
        return batch.append_column(self._out_col, pa.array(out, type=pa.bool_()))


class PartitionedFilterProbe:
    """Vectorized probe of a sharded cuckoo filter (pipelines.build.
    build_partitioned_filter) with NO per-shard loop.

    All shards of one partitioned filter share ``(seed, num_buckets,
    bits_per_tag, variant)``, so the shard tables stack into one
    ``(num_shards * nb, 4)`` tag matrix and a key's global bucket row is
    ``shard * nb + i1`` — the whole batch probes with two gathers and two
    compares, exactly like a single filter with ``num_shards×`` the buckets.
    (The distributed analog of the reference's batched lookups,
    src/cuckoo-batch-prefetch.h:109-139.)  Victim caches are carried as three
    per-shard arrays and checked vectorized (rare at sane loads).
    """

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 out_col: str = "is_member", shard_col: Optional[str] = None):
        from ..kernels.cuckoo import CuckooFilter
        table = ray.get(filters_ref)
        if isinstance(table, dict) and table.get("stacked") == "cuckoo":
            # zero-copy path (filters_to_stacked_ref): the stacked table is a
            # shared plasma buffer — no per-worker deserialize/copy
            self._proto = CuckooFilter(table["num_buckets"],
                                       table["bits_per_tag"],
                                       seed=table["seed"],
                                       variant=table["variant"],
                                       hash_family=table.get("hash_family",
                                                             "mix"))
            self._nb = table["num_buckets"]
            self._num_shards = table["num_shards"]
            self._tags = None
            self._tags64 = table["tags64"]
            self._vic_used = table["vic_used"]
            self._vic_index = table["vic_index"]
            self._vic_tag = table["vic_tag"]
        else:
            filters = _rows_to_filters(table)
            shards = sorted(int(k) for k in filters)
            if shards != list(range(len(shards))):
                raise ValueError(
                    f"expected contiguous shard ids 0..n-1, got {shards}")
            flist = [filters[s] for s in shards]
            cfg = {(f.seed, f.num_buckets, f.bits_per_tag, f.variant,
                    f.hash_family) for f in flist}
            if len(cfg) != 1:
                raise ValueError(f"shards disagree on filter config: {cfg}")
            self._proto = flist[0]
            self._nb = self._proto.num_buckets
            self._num_shards = len(flist)
            self._tags = np.ascontiguousarray(np.vstack([f.tags for f in flist]))
            self._tags64 = self._tags.view(np.uint64).reshape(-1)
            self._vic_used = np.array([f.victim_used for f in flist])
            self._vic_index = np.array([f.victim_index for f in flist],
                                       dtype=np.int64)
            self._vic_tag = np.array([f.victim_tag for f in flist],
                                     dtype=np.uint16)
        self._any_victim = bool(self._vic_used.any())
        self._key_col = key_col
        self._out_col = out_col
        self._shard_col = shard_col

    def contain_batch(self, keys: np.ndarray,
                      shard: Optional[np.ndarray] = None) -> np.ndarray:
        from ..pipelines.build import shard_for_keys
        keys = np.asarray(keys, dtype=np.uint64)
        if shard is None:
            shard = shard_for_keys(keys, self._num_shards)
        from ..kernels.cuckoo import CuckooFilter
        LANES, HIGHS = CuckooFilter._LANES, CuckooFilter._HIGHS
        base = shard.astype(np.int64) * self._nb
        found = np.empty(len(keys), dtype=bool)
        step = 65536
        for s in range(0, max(1, len(keys)), step):
            sl = slice(s, s + step)
            i1, tag = self._proto._index_tag(keys[sl])
            i2 = self._proto.alt_index(i1, tag)
            b = base[sl]
            # SWAR bucket probe (one uint64 gather per bucket; see
            # CuckooFilter.contain_batch)
            pat = tag.astype(np.uint64) * LANES
            w1 = self._tags64[b + i1] ^ pat
            w2 = self._tags64[b + i2] ^ pat
            hit = (((w1 - LANES) & ~w1 & HIGHS) != 0) | \
                  (((w2 - LANES) & ~w2 & HIGHS) != 0)
            if self._any_victim:
                sh = shard[sl]
                hit |= self._vic_used[sh] & (tag == self._vic_tag[sh]) & \
                    ((i1 == self._vic_index[sh]) | (i2 == self._vic_index[sh]))
            found[sl] = hit
        return found

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        shard = None
        if self._shard_col and self._shard_col in batch.column_names:
            shard = batch.column(self._shard_col).to_numpy(zero_copy_only=False)
        out = self.contain_batch(keys, shard)
        return batch.append_column(self._out_col, pa.array(out, type=pa.bool_()))


class PartitionedXorProbe:
    """Vectorized probe of a sharded XOR filter — the static-corpus analog of
    :class:`PartitionedFilterProbe` at ~9.8 bits/key.

    Shards share geometry (same capacity ⇒ same block_length) but each has
    its OWN build seed (xor construction retries per shard,
    src/xorfilter.h:246-251), so the per-key hash uses a seed gathered by
    shard; fingerprints stack into one array with a ``3·block_length·shard``
    offset."""

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 out_col: str = "is_member", shard_col: Optional[str] = None):
        from ..kernels.xor import XorFilter
        table = ray.get(filters_ref)
        filters = _rows_to_filters(table)
        shards = sorted(int(k) for k in filters)
        if shards != list(range(len(shards))):
            raise ValueError(f"expected contiguous shard ids, got {shards}")
        flist = [filters[s] for s in shards]
        if not all(isinstance(f, XorFilter) for f in flist):
            raise TypeError("PartitionedXorProbe needs xor-filter shards")
        if len({(f.block_length, f.bits_per_tag) for f in flist}) != 1:
            raise ValueError("xor shards disagree on geometry")
        self._bl = flist[0].block_length
        self._bits = flist[0].bits_per_tag
        self._num_shards = len(flist)
        self._seeds = np.array([f.build_seed for f in flist], dtype=np.uint64)
        self._fps = np.concatenate([f.fingerprints for f in flist])
        self._key_col, self._out_col, self._shard_col = key_col, out_col, shard_col

    def contain_batch(self, keys: np.ndarray,
                      shard: Optional[np.ndarray] = None) -> np.ndarray:
        from ..kernels.hashing import murmur64
        from ..pipelines.build import shard_for_keys
        U = np.uint64
        keys = np.asarray(keys, dtype=np.uint64)
        if shard is None:
            shard = shard_for_keys(keys, self._num_shards)
        h = murmur64(keys + self._seeds[shard])
        bl = U(self._bl)
        r1 = np.bitwise_or(h << U(21), h >> U(43))
        r2 = np.bitwise_or(h << U(42), h >> U(22))
        base = shard.astype(np.int64) * (3 * self._bl)
        h0 = (((h >> U(32)) * bl) >> U(32)).astype(np.int64) + base
        h1 = (((r1 >> U(32)) * bl) >> U(32)).astype(np.int64) + self._bl + base
        h2 = (((r2 >> U(32)) * bl) >> U(32)).astype(np.int64) + 2 * self._bl + base
        f = ((h ^ (h >> U(32))) & U((1 << self._bits) - 1)) \
            .astype(self._fps.dtype)
        B = self._fps
        return (f ^ B[h0] ^ B[h1] ^ B[h2]) == 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        shard = None
        if self._shard_col and self._shard_col in batch.column_names:
            shard = batch.column(self._shard_col).to_numpy(zero_copy_only=False)
        out = self.contain_batch(keys, shard)
        return batch.append_column(self._out_col, pa.array(out, pa.bool_()))


def filters_to_counting_ref(filters_ds_or_rows, group_col: str = "_shard"
                            ) -> "ray.ObjectRef":
    """Broadcast a partitioned COUNTING filter as one zero-copy blob: every
    shard's sorted masked hashes get the shard id prefixed into the high
    bits, so the whole partitioned multiset is ONE globally-sorted uint64
    array + aligned counts — a probe is a single searchsorted regardless of
    shard count, and workers map the same plasma buffers."""
    from ..kernels import deserialize, row_to_filter
    from ..kernels.counting import CountingQuotientFilter

    if hasattr(filters_ds_or_rows, "take_all"):
        rows = filters_ds_or_rows.take_all()
    else:
        rows = list(filters_ds_or_rows)
    by_shard = {}
    for r in rows:
        f = deserialize(r["sketch"]) if "sketch" in r else row_to_filter(r)
        if not isinstance(f, CountingQuotientFilter):
            raise TypeError("filters_to_counting_ref needs counting shards")
        by_shard[int(r[group_col])] = f
    shards = sorted(by_shard)
    if shards != list(range(len(shards))):
        raise ValueError(f"expected contiguous shard ids, got {shards}")
    flist = [by_shard[s] for s in shards]
    cfg = {(f.qbits, f.seed, f.hash_family) for f in flist}
    if len(cfg) != 1:
        raise ValueError(f"shards disagree on counting config: {cfg}")
    qbits, seed, family = next(iter(cfg))
    nhashbits = qbits + 8
    if (max(1, len(flist) - 1)).bit_length() + nhashbits > 64:
        # shard prefix (shard << nhashbits) would overflow uint64 and alias
        # shards — refuse loudly rather than decode garbage
        raise ValueError(
            f"{len(flist)} shards x {nhashbits} hash bits exceeds the "
            f"64-bit shard-prefixed probe key; reduce qbits or shards")
    combined = np.concatenate([
        (np.uint64(s) << np.uint64(nhashbits)) | f.hashes
        for s, f in zip(shards, flist)])          # per-shard sorted → global
    counts = np.concatenate([f.counts for f in flist])
    return ray.put({
        "stacked": "counting", "qbits": qbits, "seed": seed,
        "hash_family": family, "num_shards": len(flist),
        "hashes": combined, "counts": counts,
    })


class PartitionedCountProbe:
    """Vectorized multiset count against a sharded counting filter: route by
    the high key bits, one searchsorted into the shard-prefixed global hash
    array (see :func:`filters_to_counting_ref`).  Appends ``count: int64``
    (and ``is_member`` for AMQ-style use)."""

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 shard_col: Optional[str] = None):
        from ..kernels.counting import CountingQuotientFilter
        table = ray.get(filters_ref)
        if not (isinstance(table, dict)
                and table.get("stacked") == "counting"):
            raise ValueError("PartitionedCountProbe needs a "
                             "filters_to_counting_ref broadcast")
        self._proto = CountingQuotientFilter(
            table["qbits"], seed=table["seed"],
            hash_family=table["hash_family"])
        self._nhashbits = table["qbits"] + 8
        self._num_shards = table["num_shards"]
        self._hashes = table["hashes"]      # zero-copy plasma views
        self._counts = table["counts"]
        self._key_col, self._shard_col = key_col, shard_col

    def count_batch(self, keys: np.ndarray,
                    shard: Optional[np.ndarray] = None) -> np.ndarray:
        from ..pipelines.build import shard_for_keys
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=np.int64)
        if len(keys) == 0 or len(self._hashes) == 0:
            return out
        if shard is None:
            shard = shard_for_keys(keys, self._num_shards)
        h = self._proto._hash(keys) \
            | (shard.astype(np.uint64) << np.uint64(self._nhashbits))
        pos = np.minimum(np.searchsorted(self._hashes, h),
                         len(self._hashes) - 1)
        hit = self._hashes[pos] == h
        out[hit] = self._counts[pos[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        shard = None
        if self._shard_col and self._shard_col in batch.column_names:
            shard = batch.column(self._shard_col).to_numpy(zero_copy_only=False)
        cnt = self.count_batch(keys, shard)
        return batch.append_column("count", pa.array(cnt, pa.int64())) \
                    .append_column("is_member", pa.array(cnt > 0, pa.bool_()))


def filters_to_packed_ref(filters_ds_or_rows, group_col: str = "_shard"
                          ) -> "ray.ObjectRef":
    """Broadcast a partitioned SEMISORT (13-bit) filter in its packed at-rest
    form: one stacked ``(num_shards * num_buckets, 6)`` uint8 matrix —
    6 bytes/bucket in worker memory (src/packedtable.h:19), not the 8 of the
    unpacked uint16 tag table.  Probes decode only the buckets they touch
    (:class:`PackedSemisortProbe`), the analog of the reference probing the
    packed 48-bit bucket directly (src/packedtable.h:312-353)."""
    from ..kernels import deserialize, row_to_filter, semisort

    if hasattr(filters_ds_or_rows, "take_all"):
        rows = filters_ds_or_rows.take_all()
    else:
        rows = list(filters_ds_or_rows)
    by_shard = {}
    for r in rows:
        f = deserialize(r["sketch"]) if "sketch" in r else row_to_filter(r)
        by_shard[int(r[group_col])] = f
    shards = sorted(by_shard)
    if shards != list(range(len(shards))):
        raise ValueError(f"expected contiguous shard ids, got {shards}")
    flist = [by_shard[s] for s in shards]
    cfg = {(f.seed, f.num_buckets, f.bits_per_tag, f.variant, f.hash_family)
           for f in flist}
    if len(cfg) != 1:
        raise ValueError(f"shards disagree on filter config: {cfg}")
    seed, nb, bits, variant, family = next(iter(cfg))
    if bits != semisort.BITS_PER_TAG:
        raise ValueError("packed broadcast is defined for 13-bit tags")
    packed = np.vstack([
        np.frombuffer(semisort.pack_buckets(f.tags), dtype=np.uint8)
        .reshape(nb, semisort.BYTES_PER_BUCKET) for f in flist])
    return ray.put({
        "stacked": "semisort-packed",
        "seed": seed, "num_buckets": nb, "bits_per_tag": bits,
        "variant": variant, "hash_family": family, "num_shards": len(flist),
        "packed6": np.ascontiguousarray(packed),
        "vic_used": np.array([f.victim_used for f in flist]),
        "vic_index": np.array([f.victim_index for f in flist], dtype=np.int64),
        "vic_tag": np.array([f.victim_tag for f in flist], dtype=np.uint16),
    })


class PackedSemisortProbe:
    """Probe a packed semisort broadcast WITHOUT unpacking the table.

    Per batch: route keys to shards, gather the 6 packed bytes of the two
    candidate buckets only, rebuild their 48-bit words, decode the 12-bit
    codeword through the 3876-entry table (src/permencoding.h:47-50) and
    compare the four reconstructed 13-bit tags — the vectorized analog of
    ``PackedTable::FindTagInBuckets`` (src/packedtable.h:312-353).  Worker
    memory stays at 6 bytes/bucket."""

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 out_col: str = "is_member", shard_col: Optional[str] = None):
        from ..kernels import semisort
        from ..kernels.cuckoo import CuckooFilter
        table = ray.get(filters_ref)
        if not (isinstance(table, dict)
                and table.get("stacked") == "semisort-packed"):
            raise ValueError("PackedSemisortProbe needs a "
                             "filters_to_packed_ref broadcast")
        self._proto = CuckooFilter(table["num_buckets"],
                                   table["bits_per_tag"],
                                   seed=table["seed"],
                                   variant=table["variant"],
                                   hash_family=table.get("hash_family", "mix"))
        self._nb = table["num_buckets"]
        self._num_shards = table["num_shards"]
        self._packed6 = table["packed6"]          # (num_shards*nb, 6) uint8
        self._vic_used = table["vic_used"]
        self._vic_index = table["vic_index"]
        self._vic_tag = table["vic_tag"]
        self._any_victim = bool(self._vic_used.any())
        self._decode = semisort.DECODE_TABLE      # (3876, 4) uint8 nibbles
        self._key_col, self._out_col, self._shard_col = key_col, out_col, shard_col

    def _bucket_tags(self, rows: np.ndarray) -> np.ndarray:
        """Decode the packed buckets at ``rows`` → (n, 4) uint16 tags."""
        U = np.uint64
        b6 = self._packed6[rows]                   # (n, 6) gather-copy
        pad = np.zeros((len(rows), 8), dtype=np.uint8)
        pad[:, :6] = b6
        word = pad.view("<u8").ravel().astype(np.uint64)
        lows = self._decode[(word & U(0xFFF)).astype(np.int64)].astype(np.uint16)
        tags = np.empty((len(rows), 4), dtype=np.uint16)
        for j in range(4):
            high = ((word >> U(12 + 9 * j)) & U(0x1FF)).astype(np.uint16)
            tags[:, j] = (high << 4) | lows[:, j]
        return tags

    def contain_batch(self, keys: np.ndarray,
                      shard: Optional[np.ndarray] = None) -> np.ndarray:
        from ..pipelines.build import shard_for_keys
        keys = np.asarray(keys, dtype=np.uint64)
        if shard is None:
            shard = shard_for_keys(keys, self._num_shards)
        base = shard.astype(np.int64) * self._nb
        found = np.empty(len(keys), dtype=bool)
        step = 65536
        for s in range(0, max(1, len(keys)), step):
            sl = slice(s, s + step)
            i1, tag = self._proto._index_tag(keys[sl])
            i2 = self._proto.alt_index(i1, tag)
            b = base[sl]
            t1 = self._bucket_tags(b + i1)
            t2 = self._bucket_tags(b + i2)
            hit = (t1 == tag[:, None]).any(axis=1) | \
                  (t2 == tag[:, None]).any(axis=1)
            if self._any_victim:
                sh = shard[sl]
                hit |= self._vic_used[sh] & (tag == self._vic_tag[sh]) & \
                    ((i1 == self._vic_index[sh]) | (i2 == self._vic_index[sh]))
            found[sl] = hit
        return found

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        shard = None
        if self._shard_col and self._shard_col in batch.column_names:
            shard = batch.column(self._shard_col).to_numpy(zero_copy_only=False)
        out = self.contain_batch(keys, shard)
        return batch.append_column(self._out_col, pa.array(out, pa.bool_()))


class FilterDelete:
    """Actor ``map_batches`` callable applying Delete to an owned filter copy
    and reporting per-key status (src/cuckoofilter.h:206-238 semantics,
    including victim resurrection).  Each actor owns ONE filter replica;
    route one group's deletes to one actor (concurrency=1 per group) or use
    the driver-side ``pipelines.membership.delete_keys`` for small workloads.
    """

    def __init__(self, filters_ref, key_col: str = "key_hi64",
                 group_col: Optional[str] = None, out_col: str = "deleted",
                 sketch_col: Optional[str] = None):
        table = ray.get(filters_ref)
        self._filters = _rows_to_filters(table, sketch_col)
        self._key_col = key_col
        self._group_col = group_col
        self._out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        out = np.zeros(len(keys), dtype=bool)
        if self._group_col is None:
            filt = next(iter(self._filters.values()))
            out = filt.delete_batch(keys)
        else:
            groups = batch.column(self._group_col).to_numpy(zero_copy_only=False)
            codes, uniques = pd.factorize(groups)
            for code, gk in enumerate(uniques):
                filt = self._filters.get(gk)
                if filt is None:
                    continue
                mask = codes == code
                out[mask] = filt.delete_batch(keys[mask])
        return batch.append_column(self._out_col, pa.array(out, type=pa.bool_()))


class SemiJoinProbe:
    """Filter-accelerated semi/anti join: AMQ prefilter + exact verify.

    The filter gives "definitely absent" for free (no false negatives —
    example/test.cc:42-44 invariant); candidates that pass are verified
    against the exact broadcast key set, so the result equals a SQL
    IN / NOT IN — this is the canonical production use of an AMQ at scale
    (the canonical Ray Data broadcast semi-join pattern).

    For a right side too big to broadcast exactly, pass ``exact_ref=None``:
    the result is then approximate with FPR ≤ the filter's bound.
    """

    def __init__(self, filter_ref, exact_ref=None, key_col: str = "key_hi64",
                 anti: bool = False):
        row = ray.get(filter_ref)
        self._filter = row_to_filter(row) if isinstance(row, dict) else deserialize(row)
        self._exact = None
        if exact_ref is not None:
            keys = ray.get(exact_ref)
            self._exact = np.sort(np.asarray(keys, dtype=np.uint64))
        self._key_col = key_col
        self._anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        member = self._filter.contain_batch(keys)
        if self._exact is not None and member.any():
            # exact verify only the AMQ-positive candidates (the whole point:
            # the sorted-array binary search touches candidates, not the stream)
            cand = np.flatnonzero(member)
            if len(self._exact) == 0:
                member[cand] = False        # ADVICE r1: avoid index -1
            else:
                pos = np.searchsorted(self._exact, keys[cand])
                pos = np.minimum(pos, len(self._exact) - 1)
                member[cand] = self._exact[pos] == keys[cand]
        keep = ~member if self._anti else member
        return batch.filter(pa.array(keep))
