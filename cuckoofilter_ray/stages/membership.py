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
    (ray_guide: "Semi/anti join: broadcast ... a Bloom filter of it").

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
            pos = np.searchsorted(self._exact, keys[cand])
            pos = np.minimum(pos, len(self._exact) - 1)
            member[cand] = self._exact[pos] == keys[cand]
        keep = ~member if self._anti else member
        return batch.filter(pa.array(keep))
