"""Exact heavy hitters (frequent items) over a Dataset column.

The LLM-data-pipeline op the sketch family was missing: find every item
(token, domain, user id, boilerplate span) whose frequency exceeds
``n / denom`` — EXACTLY — without ever shuffling the item stream.

Two streaming passes, both all-to-nothing (partials only):

1. **Sketch pass** — a global :class:`~.aggregate.MisraGriesAgg` over the
   hashed item stream.  Each block contributes a ≤ k-counter summary;
   merge is the Agarwal et al. mergeable-summaries rule, so the reduce
   carries O(k) rows per block, never the stream.  With ``k + 1 ≥ denom``
   the summary's candidate set (``est + offset > n/denom``) is a
   guaranteed SUPERSET of the true heavy hitters (Misra-Gries one-sided
   bound), size ≤ k.
2. **Refinement pass** — the sorted candidate hashes are broadcast once
   (``ray.put``, per-worker cached); each batch factorizes its items,
   hashes the uniques, and emits exact per-batch counts for candidate
   items only (≤ k rows per block).  A tiny groupby-sum and an exact
   ``> n/denom`` filter finish on ≤ k·blocks rows (the exact stream
   total is the sketch pass's ``n``).

Exactness does not depend on hash quality: a 64-bit collision only adds a
non-frequent item to the refinement set, where its EXACT count fails the
threshold.  The only requirement is the superset property, which is the
MG guarantee.  At 100 TB this is two reads of the column and O(k) bytes
on the wire per block — the same discipline as the filter-shard UDAFs
(no raw keys ride a shuffle).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..kernels.hashing import mix_split, sha256_u64
from ..kernels.sketches import MisraGries
from ..util import cache_get
from .aggregate import MisraGriesAgg

_CAND_CACHE: dict = {}


def _item_chunks(tbl: pa.Table, column: str, split: Optional[str]):
    """The batch's item stream as (codes, uniques, ukeys).

    ``split`` explodes a string column on a literal separator (matching
    DuckDB ``string_split(col, sep)`` for oracle parity); None streams the
    column as-is.  Nulls are dropped from the stream (they are neither
    counted in ``n`` nor emitted as items).  Hashing goes through a
    dictionary encode so only UNIQUE values pay the sha256 (vocab ≪
    stream in real corpora); Arrow-native encoding keeps int columns int
    even when the batch carries nulls (pandas factorize would upcast to
    float64 and split one value across '2' / '2.0' key spaces).
    ``uniques`` is a Python list; ``str(uniques[i])`` is the output form.
    """
    col = tbl.column(column)
    if split is not None:
        arr = pa.compute.list_flatten(
            pa.compute.split_pattern(col, pattern=split))
    else:
        arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    de = arr.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = de.dictionary.to_pylist()
    if pa.types.is_integer(de.dictionary.type):
        # exactness never depends on the hash (any candidate false
        # positive is removed by the exact refinement count), so int
        # items take the vectorized mixer instead of sha256-over-str
        uarr = de.dictionary.to_numpy(zero_copy_only=False)
        ukeys = mix_split(uarr.astype(np.int64).view(np.uint64))
    else:
        ukeys = sha256_u64([str(u) for u in uniques])
    return codes, uniques, ukeys


def _sketch_pass(ds, column: str, split: Optional[str], k: int) -> MisraGries:
    def keyify(tbl: pa.Table) -> pa.Table:
        codes, _, ukeys = _item_chunks(tbl, column, split)
        return pa.table({"item_key": ukeys[codes]})

    keyed = ds.map_batches(keyify, batch_format="pyarrow", batch_size=None)
    agg = MisraGriesAgg(on="item_key", k=k, alias_name="mg")
    return agg.unpack(keyed.aggregate(agg)["mg"])


def heavy_hitters(ds, column: str, denom: int, k: Optional[int] = None,
                  split: Optional[str] = None) -> pa.Table:
    """Items of ``ds[column]`` with exact frequency > n/denom, as an Arrow
    table (item, n) sorted by item.  ``split`` tokenizes a string column
    on a literal separator first (the token stream is the item stream).
    ``k`` (default ``2·denom``) is the sketch size; any ``k + 1 ≥ denom``
    preserves exactness, larger k only shrinks the refinement set's
    false-candidate tail.  Null items are dropped from the stream: they
    neither count toward ``n`` nor appear as candidates."""
    import ray

    if k is None:
        k = 2 * denom
    if k + 1 < denom:
        raise ValueError("need k + 1 >= denom for the superset guarantee")

    sketch = _sketch_pass(ds, column, split, k)
    n = sketch.n
    if n == 0:
        return pa.table({"item": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    threshold = n / denom
    cand = np.sort(sketch.candidates(threshold))
    if len(cand) == 0:
        # superset empty ⇒ no item can exceed the threshold; also guards
        # the refinement gather (wanted[pos] on a zero-size array raises)
        return pa.table({"item": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    cand_ref = ray.put(cand)

    def count_candidates(tbl: pa.Table, ref=cand_ref) -> pa.Table:
        wanted = cache_get(_CAND_CACHE, ref.hex(), lambda: ray.get(ref))
        codes, uniques, ukeys = _item_chunks(tbl, column, split)
        pos = np.searchsorted(wanted, ukeys)
        pos[pos >= len(wanted)] = 0
        hit = np.flatnonzero(wanted[pos] == ukeys)
        per_unique = np.bincount(codes, minlength=len(uniques))
        items = [str(uniques[i]) for i in hit]
        counts = per_unique[hit].astype(np.int64).tolist()
        return pa.table({"item": pa.array(items, type=pa.string()),
                         "n": pa.array(counts, type=pa.int64())})

    partials = ds.map_batches(count_candidates, batch_format="pyarrow",
                              batch_size=None)
    summed = partials.groupby("item").sum("n").take_all()
    # the exact stream total is the sketch's n (MG counts every folded
    # item) — no sentinel row, so a genuine "" token (consecutive split
    # separators) counts as a normal item instead of colliding with it
    out = sorted((r for r in summed if r["sum(n)"] > n / denom),
                 key=lambda r: r["item"])
    return pa.table({"item": pa.array([r["item"] for r in out],
                                      type=pa.string()),
                     "n": pa.array([r["sum(n)"] for r in out],
                                   type=pa.int64())})
