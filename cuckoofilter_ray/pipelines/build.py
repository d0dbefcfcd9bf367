"""Filter-build pipelines: read → derive keys → (shuffle) → per-group filters.

Engine equivalent of the reference's construct-and-insert lifecycle
(example/test.cc:30-38) expressed Ray-Data-first (SURVEY.md §3.1):

    read_parquet(corpus) → map_batches(add_content_keys) →
    groupby(group_key).aggregate(FilterSketch) | .map_groups(exact-size build)
    → filter-shard Dataset → write_parquet (checkpoint, example/test1.cc:63-72)

Two build paths:
- **aggregate path** (fixed capacity): mergeable UDAF; partial filters built
  per block map-side and merged associatively — the smallest shuffle (one
  filter per group per block, never the raw keys).
- **map_groups path** (exact size): one pass groups the keys, each group
  builds a filter sized to its own count (the CuckooFilterStable use-case,
  src/cuckoofilter_stable.h:115).  Costs a key shuffle; use when group sizes
  vary wildly and capacity can't be fixed.

Skew (SURVEY.md §4.3.3): ``build_grouped_filters_salted`` pre-aggregates on a
salted key map-side, then merges per true key — giant groups no longer hot-spot
a single reducer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.keys import add_content_keys
from ..kernels import DEFAULT_SEED, CuckooFilter, filter_to_row, make_filter, serialize
from ..stages.aggregate import FilterSketch

SKETCH_COL = "sketch"


def derive_keys(ds: "ray.data.Dataset", content_col: str = "content",
                drop_content: bool = False, sha_col: str = "sha_hex",
                byte_hash: str = "sha256") -> "ray.data.Dataset":
    """Stateless key-derivation stage (``byte_hash`` selects the content
    hash family: sha256 → hex + uint64 key, or murmur2 / superfast)."""
    return ds.map_batches(
        add_content_keys, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"column": content_col, "drop_content": drop_content,
                   "sha_col": sha_col if byte_hash == "sha256" else "",
                   "byte_hash": byte_hash})


def _combine_build(ds: "ray.data.Dataset", group_cols: list,
                   key_col: str = "key_hi64", kind: str = "cuckoo",
                   capacity: int = 1 << 16, bits_per_tag: int = 12,
                   seed: int = DEFAULT_SEED,
                   hash_family: str = "mix") -> "ray.data.Dataset":
    """Map-side-combine build: vectorized per-block partial accumulators
    (stages.aggregate.partial_filter_rows), then a groupby shuffle over ONLY
    the partial rows (blocks × groups, each ≤ one filter) and a final
    associative merge per group.

    This replaces ``groupby(key).aggregate(FilterSketch)`` as the default
    build path: ray 2.49's sort-aggregate walks every raw row in Python on
    the map side (~15 µs/row), while this path keeps raw keys out of both the
    Python loop and the shuffle entirely.
    """
    from ..stages.aggregate import merge_accs, partial_filter_rows

    partials = ds.map_batches(
        partial_filter_rows, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"group_cols": group_cols, "key_col": key_col, "kind": kind,
                   "capacity": capacity, "bits_per_tag": bits_per_tag,
                   "seed": seed, "hash_family": hash_family})

    def merge_group(group: pa.Table) -> pa.Table:
        filt = merge_accs(group.column("acc").to_pylist(), kind, capacity,
                          seed, bits_per_tag, hash_family=hash_family)
        cols = {c: pa.array([group.column(c)[0].as_py()])
                for c in group_cols}
        cols[SKETCH_COL] = pa.array([serialize(filt)], type=pa.large_binary())
        cols["num_items"] = pa.array([filt.size()], type=pa.int64())
        return pa.table(cols)

    return partials.groupby(group_cols[0] if len(group_cols) == 1
                            else group_cols) \
        .map_groups(merge_group, batch_format="pyarrow")


def build_grouped_filters(ds: "ray.data.Dataset", group_key: str,
                          key_col: str = "key_hi64", kind: str = "cuckoo",
                          capacity: Optional[int] = None, bits_per_tag: int = 12,
                          seed: int = DEFAULT_SEED,
                          load_target: float = 0.94,
                          hash_family: str = "mix") -> "ray.data.Dataset":
    """Per-group filter build → Dataset[(group_key, sketch: binary, num_items…)].

    ``capacity`` given → mergeable-UDAF aggregate path.
    ``capacity`` None  → exact-size map_groups path (stable-variant sizing).
    """
    if capacity is not None:
        return _combine_build(ds, [group_key], key_col=key_col, kind=kind,
                              capacity=capacity, bits_per_tag=bits_per_tag,
                              seed=seed, hash_family=hash_family)

    def build_group(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        gk = group.column(group_key)[0].as_py()
        filt = make_filter(kind, len(keys), seed, bits_per_tag,
                           hash_family=hash_family)
        res = filt.add_batch(keys)
        row = filter_to_row(filt, group_key=str(gk))
        return pa.table({
            group_key: pa.array([gk]),
            SKETCH_COL: pa.array([serialize(filt)], type=pa.large_binary()),
            "num_items": pa.array([row["num_items"]], type=pa.int64()),
            "num_buckets": pa.array([row["num_buckets"]], type=pa.int64()),
            "overflow": pa.array([getattr(res, "overflow", 0)],
                                 type=pa.int64()),
        })

    return ds.groupby(group_key).map_groups(build_group, batch_format="pyarrow")


def build_grouped_filters_salted(ds: "ray.data.Dataset", group_key: str,
                                 key_col: str = "key_hi64", kind: str = "cuckoo",
                                 capacity: int = 1 << 16, bits_per_tag: int = 12,
                                 seed: int = DEFAULT_SEED,
                                 num_salts: int = 16) -> "ray.data.Dataset":
    """Two-level skew-aware build: aggregate on (group, salt), then merge the
    salted partials per true group.  All partials share (seed, capacity) so
    the merge is the associative fingerprint re-insertion (SURVEY.md §4.3.2).
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        salt = (keys % np.uint64(num_salts)).astype(np.int32)
        return batch.append_column("_salt", pa.array(salt, type=pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
    # tier 1: per-(group, salt) partial filters via the map-side-combine path
    # — a giant group's merge fan-in is split num_salts ways
    partials = _combine_build(salted, [group_key, "_salt"], key_col=key_col,
                              kind=kind, capacity=capacity,
                              bits_per_tag=bits_per_tag, seed=seed)

    from ..kernels import deserialize

    def merge_group(group: pa.Table) -> pa.Table:
        gk = group.column(group_key)[0].as_py()
        blobs = group.column(SKETCH_COL).to_pylist()
        acc = deserialize(blobs[0])
        overflow = 0
        for b in blobs[1:]:
            res = acc.merge(deserialize(b))
            overflow += getattr(res, "overflow", 0) or 0
        return pa.table({
            group_key: pa.array([gk]),
            SKETCH_COL: pa.array([serialize(acc)], type=pa.large_binary()),
            "num_items": pa.array([acc.size()], type=pa.int64()),
            "overflow": pa.array([overflow], type=pa.int64()),
        })

    # tier 2: associative merge of the salted partials per true group
    return partials.groupby(group_key).map_groups(merge_group, batch_format="pyarrow")


def build_single_filter(ds: "ray.data.Dataset", key_col: str = "key_hi64",
                        kind: str = "cuckoo", capacity: int = 1 << 16,
                        bits_per_tag: int = 12, seed: int = DEFAULT_SEED,
                        hash_family: str = "mix"):
    """Whole-dataset filter via the mergeable UDAF; returns the live kernel
    object on the driver (small: ~2 bytes/key)."""
    agg = FilterSketch(on=key_col, kind=kind, capacity=capacity,
                       bits_per_tag=bits_per_tag, seed=seed,
                       alias_name=SKETCH_COL, pack_final=False,
                       hash_family=hash_family)
    out = ds.aggregate(agg)
    from ..kernels import deserialize
    return deserialize(out[SKETCH_COL])


def build_partitioned_filter(ds: "ray.data.Dataset", key_col: str = "key_hi64",
                             num_shards: int = 16, kind: str = "cuckoo",
                             capacity_per_shard: int = 1 << 16,
                             bits_per_tag: int = 12,
                             seed: int = DEFAULT_SEED,
                             hash_family: str = "mix") -> "ray.data.Dataset":
    """Sharded filter for groups too big for one blob (SURVEY.md §4.3.3):
    shard by high key bits, one mergeable filter per shard.  Probing routes
    each key to ``shard = key >> (64 - log2(num_shards))`` — the distributed
    analog of the bucket array.  Returns Dataset[(group_key=shard_id, sketch)].
    """
    if num_shards & (num_shards - 1):
        raise ValueError("num_shards must be a power of two")

    def add_shard(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        shard = shard_for_keys(keys, num_shards)
        return batch.append_column("_shard", pa.array(shard, type=pa.int32()))

    return _combine_build(
        ds.map_batches(add_shard, batch_format="pyarrow", batch_size=None),
        ["_shard"], key_col=key_col, kind=kind, capacity=capacity_per_shard,
        bits_per_tag=bits_per_tag, seed=seed, hash_family=hash_family)


def shard_for_keys(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard routing used by probes of a partitioned filter.

    num_shards == 1 is special-cased: the general formula would shift by
    64, which is undefined for uint64 in NumPy (ADVICE r1)."""
    keys = np.asarray(keys, dtype=np.uint64)
    if num_shards <= 1:
        return np.zeros(len(keys), dtype=np.int32)
    shift = np.uint64(64 - int(num_shards).bit_length() + 1)
    return (keys >> shift).astype(np.int32)
