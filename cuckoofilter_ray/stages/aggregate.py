"""Mergeable filter UDAFs for ``Dataset.groupby(...).aggregate(...)``.

The reference is a single-process library; the engine's central re-expression
(BASELINE.json north_star) is the filter as a **mergeable aggregate**: each
block builds a partial filter over its keys (``aggregate_block``), partials
merge associatively by fingerprint re-insertion / bitwise OR (``combine`` —
SURVEY.md §2.1 "Merge", contract from qf_merge src/gqf.h:307-310), and
``finalize`` emits the columnar shard bytes (FIXTURES.md F4).

All partials of one aggregation share ``(seed, capacity ⇒ num_buckets,
bits_per_tag)`` — the distributed-merge precondition the reference's
per-instance ``std::random_device`` seeding would break (SURVEY.md §4.3.1).

Accumulator = serialized shard bytes (small: the filter is sized to
``capacity``, ~1.5-2 bytes/key at 12-bit tags), so shuffle volume per group is
one filter, not the group's rows — this is the partial/combiner pattern that
keeps the groupby from shipping raw keys.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from ..kernels import DEFAULT_SEED, deserialize, make_filter, row_to_filter, serialize


def _key_column(block: Block, name: str) -> np.ndarray:
    """Extract a uint64 key column from an Arrow/pandas block, zero-copy when
    possible."""
    if isinstance(block, pa.Table):
        col = block.column(name)
        return col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    acc = BlockAccessor.for_block(block)
    tbl = acc.to_arrow()
    return tbl.column(name).to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)


class FilterSketch(AggregateFnV2):
    """Build one AMQ filter per group over a uint64 key column.

    Args:
        on: uint64 key column (e.g. ``key_hi64`` = first 8 bytes of
            sha256(content), FIXTURES.md F1).
        kind: cuckoo | cuckoo-stable | semisort | bloom | blockedbloom.
        capacity: expected max keys **per group** — all partials must size
            identically for merge, so this is a parameter, not inferred.
            For data-driven sizing use ``pipelines.build.build_filters``
            (map_groups path) instead.
        bits_per_tag: fingerprint width (cuckoo) / bits-per-item (bloom).
        seed: shared hash seed for every partial of this aggregation.

    Output column: serialized filter-shard bytes (deserialize with
    ``kernels.deserialize``).
    """

    def __init__(self, on: str, kind: str = "cuckoo", capacity: int = 1 << 16,
                 bits_per_tag: int = 12, seed: int = DEFAULT_SEED,
                 alias_name: Optional[str] = None, pack_final: bool = True,
                 hash_family: str = "mix"):
        self._kind = kind
        self._capacity = int(capacity)
        self._bits = int(bits_per_tag)
        self._seed = int(seed)
        self._family = hash_family
        # pack_final=False skips the bit-pack codec in finalize — right when
        # the result is immediately deserialized (broadcast probe state)
        # rather than written at rest
        self._pack_final = bool(pack_final)
        super().__init__(alias_name or f"{kind}_sketch({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    # Accumulator format: pickled dict, either a filter shard-row (dense,
    # raw16 codec — serde.filter_to_row(packed=False)) or a sparse key list
    # {"codec": "sparse", "keys": uint64-LE bytes}.  Sparse-until-threshold is
    # the standard mergeable-sketch trick (HLL sparse mode): a per-block
    # partial holding 300 keys shuffles 2.4 KB, not a full bucket table; the
    # one densify per group happens at the last combine or in finalize.
    # Threshold capacity//4 keys ≈ the raw16 table's own byte size.

    def _sparse_limit(self) -> int:
        return sparse_limit_for(self._kind, self._capacity)

    def _densify(self, d: dict):
        if d.get("codec") == "sparse":
            filt = make_filter(self._kind, self._capacity, self._seed, self._bits,
                               hash_family=self._family)
            filt.add_batch(np.frombuffer(d["keys"], dtype=np.uint64))
            return filt
        return row_to_filter(d)

    def aggregate_block(self, block: Block) -> bytes:
        keys = _key_column(block, self._target_col_name)
        if len(keys) <= self._sparse_limit():
            return pickle.dumps(
                {"codec": "sparse", "keys": np.ascontiguousarray(keys).tobytes()},
                protocol=pickle.HIGHEST_PROTOCOL)
        filt = make_filter(self._kind, self._capacity, self._seed, self._bits,
                               hash_family=self._family)
        filt.add_batch(keys)
        return serialize(filt, packed=False)

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        da, db = pickle.loads(current), pickle.loads(new)
        a_sp, b_sp = da.get("codec") == "sparse", db.get("codec") == "sparse"
        if a_sp and b_sp:
            keys = da["keys"] + db["keys"]
            if len(keys) <= self._sparse_limit() * 8:
                return pickle.dumps({"codec": "sparse", "keys": keys},
                                    protocol=pickle.HIGHEST_PROTOCOL)
            filt = make_filter(self._kind, self._capacity, self._seed, self._bits,
                               hash_family=self._family)
            filt.add_batch(np.frombuffer(keys, dtype=np.uint64))
            return serialize(filt, packed=False)
        if b_sp:          # dense ⊕ sparse: bulk-add the keys
            a = row_to_filter(da)
            a.add_batch(np.frombuffer(db["keys"], dtype=np.uint64))
            return serialize(a, packed=False)
        if a_sp:          # sparse ⊕ dense: add into the dense side (associative
            b = row_to_filter(db)  # up to kick placement, which is allowed)
            b.add_batch(np.frombuffer(da["keys"], dtype=np.uint64))
            return serialize(b, packed=False)
        a, b = row_to_filter(da), row_to_filter(db)
        a.merge(b)
        return serialize(a, packed=False)

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            filt = make_filter(self._kind, self._capacity, self._seed, self._bits,
                               hash_family=self._family)
            return serialize(filt, packed=self._pack_final)
        return serialize(self._densify(pickle.loads(accumulator)),
                         packed=self._pack_final)


#: bulk-build-only structures: accumulators stay sparse (raw keys) all the
#: way to the final per-group build — there is no partial-filter merge.
NOT_MERGEABLE = {"xor", "xor2", "gcs", "xorplus", "xor2n", "crate"}


def sparse_limit_for(kind: str, capacity: int) -> int:
    if kind in NOT_MERGEABLE:
        return 1 << 62
    if kind == "tail":
        # dynamic structure at a 0.909 load target: incremental adds pay
        # long eviction cascades, so one bulk build from raw keys is ~4x
        # faster than add_batch-per-combine — stay sparse up to the full
        # expected capacity (8 B/key shuffle vs ~2.4 B/key dense: the
        # trade is bounded and the merge path still handles dense blobs)
        return max(64, int(capacity))
    return max(64, int(capacity) // 4)


def make_sparse_acc(keys: np.ndarray) -> bytes:
    return pickle.dumps(
        {"codec": "sparse", "keys": np.ascontiguousarray(keys).tobytes()},
        protocol=pickle.HIGHEST_PROTOCOL)


def build_acc(keys: np.ndarray, kind: str, capacity: int, seed: int,
              bits: int, sparse_limit: int, hash_family: str = "mix") -> bytes:
    """keys → accumulator bytes (sparse below the densify threshold)."""
    if len(keys) <= sparse_limit:
        return make_sparse_acc(keys)
    filt = make_filter(kind, capacity, seed, bits, hash_family=hash_family)
    filt.add_batch(keys)
    return serialize(filt, packed=False)


def merge_accs(accs, kind: str, capacity: int, seed: int, bits: int,
               hash_family: str = "mix"):
    """Merge accumulator blobs (sparse key lists and/or raw16 filter rows)
    into one live filter.  Used by the final per-group merge task."""
    sparse_keys = []
    filt = None
    for blob in accs:
        d = pickle.loads(blob)
        if d.get("codec") == "sparse":
            sparse_keys.append(np.frombuffer(d["keys"], dtype=np.uint64))
        elif filt is None:
            filt = row_to_filter(d)
        else:
            filt.merge(row_to_filter(d))
    if filt is None:
        filt = make_filter(kind, capacity, seed, bits, hash_family=hash_family)
    if sparse_keys:
        filt.add_batch(np.concatenate(sparse_keys))
    return filt


def partial_filter_rows(batch: pa.Table, *, group_cols: list, key_col: str,
                        kind: str = "cuckoo", capacity: int = 1 << 16,
                        bits_per_tag: int = 12, seed: int = DEFAULT_SEED,
                        acc_col: str = "acc",
                        hash_family: str = "mix") -> pa.Table:
    """Map-side combiner: one accumulator row per group per block.

    Vectorized grouping (factorize + stable argsort + searchsorted slices) —
    NOT Ray's sort-aggregate, whose map side walks rows in a Python loop
    (~15 us/row in ray 2.49's ``TableBlockAccessor._aggregate``).  The
    subsequent shuffle moves only these accumulator rows: blocks x groups
    rows of at most a filter's size each, never the raw keys.
    """
    import pandas as pd

    if len(batch) == 0:   # empty blocks must keep a typed schema (a python
        return pa.table(  # [] column would infer null and break the union)
            {c: batch.column(c) for c in group_cols} |
            {acc_col: pa.array([], pa.large_binary())})
    keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
        .astype(np.uint64, copy=False)
    if len(group_cols) == 1:
        codes, uniques = pd.factorize(
            batch.column(group_cols[0]).to_numpy(zero_copy_only=False))
        unique_cols = {group_cols[0]: uniques}
    else:
        arrs = [batch.column(c).to_numpy(zero_copy_only=False)
                for c in group_cols]
        codes, uniques = pd.factorize(pd.MultiIndex.from_arrays(arrs))
        unique_cols = {c: np.array([u[i] for u in uniques])
                       for i, c in enumerate(group_cols)}
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    n_groups = len(next(iter(unique_cols.values())))
    bounds = np.searchsorted(sorted_codes, np.arange(n_groups + 1))
    sparse_limit = sparse_limit_for(kind, capacity)
    accs = []
    for g in range(n_groups):
        gk = keys[order[bounds[g]:bounds[g + 1]]]
        accs.append(build_acc(gk, kind, capacity, seed, bits_per_tag,
                              sparse_limit, hash_family=hash_family))
    cols = {c: pa.array(v) for c, v in unique_cols.items()}
    cols[acc_col] = pa.array(accs, type=pa.large_binary())
    return pa.table(cols)


class FilterItemCount(FilterSketch):
    """Same build, but finalize to the filter's ``num_items`` (int64) —
    the reference's ``Size()`` (src/cuckoofilter.h:135) as an aggregate.
    Duplicates count (cuckoo Add does not dedup), so per-group num_items ==
    COUNT(*) — giving this probabilistic structure an exact SQL oracle."""

    def finalize(self, accumulator: Optional[bytes]) -> int:
        if accumulator is None:
            return 0
        d = pickle.loads(accumulator)
        if d.get("codec") == "sparse":
            return len(d["keys"]) // 8
        return int(d["num_items"])


class FilterLoadFactor(FilterSketch):
    """Finalize to the built filter's load factor (src/cuckoofilter.h:86)."""

    def finalize(self, accumulator: Optional[bytes]) -> float:
        if accumulator is None:
            return 0.0
        row = pickle.loads(accumulator)
        if row.get("codec") == "sparse":
            filt = self._densify(row)
            return filt.load_factor() if hasattr(filt, "load_factor") else float("nan")
        if row["kind"] in ("cuckoo", "semisort"):
            return row["num_items"] / (row["num_buckets"] * 4)
        return float("nan")


class HllDistinct(AggregateFnV2):
    """Per-group HyperLogLog distinct-count estimate (mergeable UDAF).

    Accumulator = raw register bytes; combine = elementwise max (the HLL
    merge) — no deserialization beyond a frombuffer.  ``finalize`` emits the
    rounded estimate; standard error 1.04/sqrt(2^p).
    """

    def __init__(self, on: str, p: int = 12, seed: int = DEFAULT_SEED,
                 alias_name: Optional[str] = None):
        self._p = int(p)
        self._seed = int(seed)
        super().__init__(alias_name or f"hll_distinct({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def aggregate_block(self, block: Block) -> bytes:
        from ..kernels.sketches import HyperLogLog
        h = HyperLogLog(p=self._p, seed=self._seed)
        h.add_batch(_key_column(block, self._target_col_name))
        return h.to_bytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a = np.frombuffer(current, dtype=np.uint8)
        b = np.frombuffer(new, dtype=np.uint8)
        return np.maximum(a, b).tobytes()

    def finalize(self, accumulator: Optional[bytes]) -> int:
        if accumulator is None:
            return 0
        from ..kernels.sketches import HyperLogLog
        return int(round(HyperLogLog.from_bytes(accumulator, self._p,
                                                self._seed).estimate()))


class CountMinAgg(AggregateFnV2):
    """Per-group Count-Min sketch (mergeable UDAF); finalize → sketch bytes
    (reconstruct with ``CountMin.from_bytes``; the row's total rides along
    in the first 8 bytes)."""

    def __init__(self, on: str, depth: int = 5, width: int = 2048,
                 seed: int = DEFAULT_SEED, alias_name: Optional[str] = None):
        self._depth, self._width, self._seed = int(depth), int(width), int(seed)
        super().__init__(alias_name or f"countmin({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def _pack(self, cm) -> bytes:
        return int(cm.total).to_bytes(8, "little") + cm.to_bytes()

    def unpack(self, data: bytes):
        from ..kernels.sketches import CountMin
        total = int.from_bytes(data[:8], "little")
        return CountMin.from_bytes(data[8:], self._depth, self._width,
                                   self._seed, total=total)

    def aggregate_block(self, block: Block) -> bytes:
        from ..kernels.sketches import CountMin
        cm = CountMin(depth=self._depth, width=self._width, seed=self._seed)
        cm.add_batch(_key_column(block, self._target_col_name))
        return self._pack(cm)

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a, b = self.unpack(current), self.unpack(new)
        a.merge(b)
        return self._pack(a)

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            from ..kernels.sketches import CountMin
            return self._pack(CountMin(depth=self._depth, width=self._width,
                                       seed=self._seed))
        return accumulator


def pack_uid_value(batch: pa.Table, uid_col: str, val_col: str,
                   out_col: str = "uv16") -> pa.Table:
    """Pack (uid: uint64, value: float64) into one fixed-size-binary(16)
    column — ray's aggregate prunes every column except the one it's `on`,
    so multi-input sketches ride in a single packed column."""
    uids = batch.column(uid_col).to_numpy(zero_copy_only=False) \
        .astype(np.uint64, copy=False)
    vals = batch.column(val_col).to_numpy(zero_copy_only=False) \
        .astype(np.float64, copy=False)
    arr = np.empty((len(uids), 2), dtype=np.uint64)
    arr[:, 0] = uids
    arr[:, 1] = vals.view(np.uint64)
    col = pa.Array.from_buffers(pa.binary(16), len(uids),
                                [None, pa.py_buffer(arr.tobytes())])
    return batch.append_column(out_col, col)


def _unpack_uv16(tbl: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    arr = tbl.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    raw = np.frombuffer(arr.buffers()[1], dtype=np.uint64) \
        .reshape(-1, 2)[arr.offset:arr.offset + len(arr)]
    return raw[:, 0].copy(), raw[:, 1].copy().view(np.float64)


class KLLAgg(AggregateFnV2):
    """Per-group mergeable KLL quantile sketch over a float64 column.

    Unlike :class:`QuantileSketchAgg` (bottom-k row sample keyed on a uid
    hash), KLL compacts VALUES, so it needs no uid column and its rank
    error ~2.3/k^0.9 beats a k-sample's ~1/sqrt(k) at equal space.
    finalize → sketch bytes (``KLLSketch.from_bytes``).
    """

    def __init__(self, on: str, k: int = 256,
                 seed: int = DEFAULT_SEED, alias_name: Optional[str] = None):
        self._k = int(k)
        self._seed = int(seed)
        super().__init__(alias_name or f"kll({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def _new(self):
        from ..kernels.sketches import KLLSketch
        return KLLSketch(k=self._k, seed=self._seed)

    def unpack(self, data: bytes):
        from ..kernels.sketches import KLLSketch
        return KLLSketch.from_bytes(data, self._k, self._seed)

    def aggregate_block(self, block: Block) -> bytes:
        tbl = block if isinstance(block, pa.Table) else \
            BlockAccessor.for_block(block).to_arrow()
        vals = tbl.column(self._target_col_name) \
            .to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        s = self._new()
        s.add_batch(vals)
        return s.to_bytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a, b = self.unpack(current), self.unpack(new)
        a.merge(b)
        return a.to_bytes()

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            return self._new().to_bytes()
        return accumulator


class TDigestAgg(AggregateFnV2):
    """Per-group mergeable t-digest quantile sketch over a float64 column.

    Same contract as :class:`KLLAgg` (values only, no uid column; finalize
    → sketch bytes, ``TDigest.from_bytes``); the asin k1 scale makes the
    digest's EXTREME quantiles (p99/p999) far tighter than KLL's uniform
    rank band at equal space — the two sketches are the engine's
    complementary quantile pair (north rule names both).
    """

    def __init__(self, on: str, delta: int = 200,
                 alias_name: Optional[str] = None):
        self._delta = int(delta)
        super().__init__(alias_name or f"tdigest({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def _new(self):
        from ..kernels.sketches import TDigest
        return TDigest(delta=self._delta)

    def unpack(self, data: bytes):
        from ..kernels.sketches import TDigest
        return TDigest.from_bytes(data, self._delta)

    def aggregate_block(self, block: Block) -> bytes:
        tbl = block if isinstance(block, pa.Table) else \
            BlockAccessor.for_block(block).to_arrow()
        vals = tbl.column(self._target_col_name) \
            .to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        s = self._new()
        s.add_batch(vals)
        return s.to_bytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a, b = self.unpack(current), self.unpack(new)
        a.merge(b)
        return a.to_bytes()

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            return self._new().to_bytes()
        return accumulator


class QuantileSketchAgg(AggregateFnV2):
    """Per-group mergeable quantile sketch (bottom-k uniform row sample).

    ``on`` is a packed (uid, value) fixed-size-binary(16) column produced by
    :func:`pack_uid_value`; the uid's seeded hash is the sampling priority
    (deterministic across runs and block splits).  finalize → sketch bytes
    (``BottomKQuantile.from_bytes``).
    """

    def __init__(self, on: str, k: int = 4096,
                 seed: int = DEFAULT_SEED, alias_name: Optional[str] = None):
        self._k = int(k)
        self._seed = int(seed)
        super().__init__(alias_name or f"quantile_sketch({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def _new(self):
        from ..kernels.sketches import BottomKQuantile
        return BottomKQuantile(k=self._k, seed=self._seed)

    def unpack(self, data: bytes):
        from ..kernels.sketches import BottomKQuantile
        return BottomKQuantile.from_bytes(data, self._k, self._seed)

    def aggregate_block(self, block: Block) -> bytes:
        tbl = block if isinstance(block, pa.Table) else \
            BlockAccessor.for_block(block).to_arrow()
        uids, vals = _unpack_uv16(tbl, self._target_col_name)
        s = self._new()
        s.add_batch(uids, vals)
        return s.to_bytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a, b = self.unpack(current), self.unpack(new)
        a.merge(b)
        return a.to_bytes()

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            return self._new().to_bytes()
        return accumulator


# ---------------------------------------------------------------- sketches
# generic map-side-combine for the non-filter sketches (HLL / Count-Min /
# bottom-k): same pattern as the filter build — vectorized per-block
# grouping, accumulator rows shuffled, associative merge per group — so the
# scale path never pays ray's sort-aggregate row walk.

def make_sketch(kind: str, params: dict):
    from ..kernels.sketches import BottomKQuantile, CountMin, HyperLogLog
    if kind == "hll":
        return HyperLogLog(p=params.get("p", 12), seed=params.get("seed", DEFAULT_SEED))
    if kind == "countmin":
        return CountMin(depth=params.get("depth", 5),
                        width=params.get("width", 2048),
                        seed=params.get("seed", DEFAULT_SEED))
    if kind == "bottomk":
        return BottomKQuantile(k=params.get("k", 4096),
                               seed=params.get("seed", DEFAULT_SEED))
    if kind == "tdigest":
        from ..kernels.sketches import TDigest
        return TDigest(delta=params.get("delta", 200))
    raise ValueError(f"unknown sketch kind {kind!r}")


def _sketch_to_bytes(kind: str, s) -> bytes:
    if kind == "countmin":
        return int(s.total).to_bytes(8, "little") + s.to_bytes()
    return s.to_bytes()


def _sketch_from_bytes(kind: str, data: bytes, params: dict):
    from ..kernels.sketches import BottomKQuantile, CountMin, HyperLogLog
    if kind == "hll":
        return HyperLogLog.from_bytes(data, params.get("p", 12),
                                      params.get("seed", DEFAULT_SEED))
    if kind == "countmin":
        total = int.from_bytes(data[:8], "little")
        return CountMin.from_bytes(data[8:], params.get("depth", 5),
                                   params.get("width", 2048),
                                   params.get("seed", DEFAULT_SEED), total=total)
    if kind == "bottomk":
        return BottomKQuantile.from_bytes(data, params.get("k", 4096),
                                          params.get("seed", DEFAULT_SEED))
    if kind == "tdigest":
        from ..kernels.sketches import TDigest
        return TDigest.from_bytes(data, params.get("delta", 200))
    raise ValueError(f"unknown sketch kind {kind!r}")


def sketch_partial_rows(batch: pa.Table, *, group_cols: list, key_col: str,
                        kind: str, params: dict,
                        value_col: Optional[str] = None,
                        acc_col: str = "acc") -> pa.Table:
    """Map-side combiner for sketches: one accumulator row per group per
    block (bottomk also reads ``value_col``; others sketch the key stream)."""
    import pandas as pd

    if len(batch) == 0:
        return pa.table({group_cols[0]: batch.column(group_cols[0]),
                         acc_col: pa.array([], pa.large_binary())})
    keys = None
    if kind != "tdigest":              # value-only sketch: no key stream
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
    vals = None
    if value_col is not None:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
    codes, uniques = pd.factorize(
        batch.column(group_cols[0]).to_numpy(zero_copy_only=False))
    order = np.argsort(codes, kind="stable")
    bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
    accs = []
    for g in range(len(uniques)):
        sel = order[bounds[g]:bounds[g + 1]]
        s = make_sketch(kind, params)
        if kind == "bottomk":
            s.add_batch(keys[sel], vals[sel])
        elif kind == "tdigest":        # value sketch: key stream unused
            s.add_batch(vals[sel])
        else:
            s.add_batch(keys[sel])
        accs.append(_sketch_to_bytes(kind, s))
    return pa.table({group_cols[0]: pa.array(uniques),
                     acc_col: pa.array(accs, pa.large_binary())})


def build_grouped_sketches(ds, group_key: str, key_col: str, kind: str,
                           params: Optional[dict] = None,
                           value_col: Optional[str] = None):
    """ds → Dataset[(group_key, sketch: binary)] via map-side combine."""
    params = params or {}

    partials = ds.map_batches(
        sketch_partial_rows, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"group_cols": [group_key], "key_col": key_col,
                   "kind": kind, "params": params, "value_col": value_col})

    def merge_group(group: pa.Table) -> pa.Table:
        blobs = group.column("acc").to_pylist()
        acc = _sketch_from_bytes(kind, blobs[0], params)
        for b in blobs[1:]:
            acc.merge(_sketch_from_bytes(kind, b, params))
        return pa.table({
            group_key: pa.array([group.column(group_key)[0].as_py()]),
            "sketch": pa.array([_sketch_to_bytes(kind, acc)],
                               pa.large_binary()),
        })

    return partials.groupby(group_key).map_groups(merge_group,
                                                  batch_format="pyarrow")


class ExactDistinct(AggregateFnV2):
    """Exact per-group distinct count of a uint64 key column.

    The engine's stand-in for the reference benchmark's exact ground-truth
    audits (``count_distinct``, benchmarks/bulk-insert-and-query.cc:449-462).
    Accumulator = np.uint64 unique array (sorted); merge = set-union; fine for
    per-group cardinalities that fit a worker (use the sketch path otherwise).
    """

    def __init__(self, on: str, alias_name: Optional[str] = None):
        super().__init__(alias_name or f"distinct({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def aggregate_block(self, block: Block) -> bytes:
        keys = _key_column(block, self._target_col_name)
        return np.unique(keys).tobytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a = np.frombuffer(current, dtype=np.uint64)
        b = np.frombuffer(new, dtype=np.uint64)
        return np.union1d(a, b).tobytes()

    def finalize(self, accumulator: Optional[bytes]) -> int:
        if accumulator is None:
            return 0
        return len(accumulator) // 8


class MisraGriesAgg(AggregateFnV2):
    """Per-group Misra-Gries frequent-items summary (mergeable UDAF);
    finalize → summary bytes (``MisraGries.from_bytes``).

    The first stage of the exact heavy-hitters pipeline
    (:func:`~cuckoofilter_ray.stages.heavy.heavy_hitters`): partials are
    ≤ k (key, count) pairs per block, merge is the Agarwal et al.
    mergeable-summaries rule, so the shuffle carries O(k) rows per group
    regardless of stream length."""

    def __init__(self, on: str, k: int = 256,
                 alias_name: Optional[str] = None):
        self._k = int(k)
        super().__init__(alias_name or f"misragries({on})", on=on,
                         ignore_nulls=True, zero_factory=lambda: None)

    def _new(self):
        from ..kernels.sketches import MisraGries
        return MisraGries(k=self._k)

    def unpack(self, data: bytes):
        from ..kernels.sketches import MisraGries
        return MisraGries.from_bytes(data)

    def aggregate_block(self, block: Block) -> bytes:
        s = self._new()
        s.add_batch(_key_column(block, self._target_col_name))
        return s.to_bytes()

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> bytes:
        if current is None:
            return new
        if new is None:
            return current
        a = self.unpack(current)
        a.merge(self.unpack(new))
        return a.to_bytes()

    def finalize(self, accumulator: Optional[bytes]) -> bytes:
        if accumulator is None:
            return self._new().to_bytes()
        return accumulator
