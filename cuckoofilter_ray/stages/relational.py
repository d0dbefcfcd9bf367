"""Relational companions: windowed aggregates and a partitioned hash join.

The reference has no relational ops (SURVEY.md §2.6 negative space); these
exist because the engine's production context — filter/dedup pipelines over
event logs and dimension tables — needs them, and they follow the same scale
discipline as the builds:

- ``tumbling_window_agg``: per-block VECTORIZED pre-aggregation (pandas
  groupby inside ``map_batches``) emits one partial row per (key, window)
  per block; the global groupby then shuffles partials, never raw events —
  the map-side-combine pattern (map-side partial aggregation).
- ``hash_join``: partitioned hash join for two large sides via Ray Data's
  native hash-shuffle ``Dataset.join`` — each of ``num_buckets`` partitions
  joins in Arrow, dtype-preserving.  Salt hot keys by raising the partition
  count; broadcast the small side instead
  (``stages.membership.SemiJoinProbe``) whenever it fits memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def tumbling_window_agg(ds: "ray.data.Dataset", ts_col: str, key_col: str,
                        value_col: str, window_us: int) -> "ray.data.Dataset":
    """count + sum(value) per (key, tumbling window).

    Windows are event-time buckets ``floor(epoch_us / window_us)`` — no
    watermarks (batch log over event-time windows).
    Output: (key_col, window_id, n_events, total_value).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[us]").view(np.int64)
        wid = epoch // np.int64(window_us)
        df = pd.DataFrame({
            key_col: batch.column(key_col).to_numpy(zero_copy_only=False),
            "window_id": wid,
            "value": batch.column(value_col).to_numpy(zero_copy_only=False),
        })
        g = df.groupby([key_col, "window_id"], sort=False).agg(
            n_events=("value", "size"), total_value=("value", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby([key_col, "window_id"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("total_value", alias_name="total_value"))


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str, num_buckets: int = 32,
              suffixes: tuple = ("_l", "_r")) -> "ray.data.Dataset":
    """Partitioned inner hash join of two large Datasets.

    Delegates to Ray Data's native hash-shuffle join operator (Ray ≥2.46
    ``Dataset.join``) — both sides hash-partition on the key into
    ``num_buckets`` aggregators, each of which joins its partition in Arrow
    (dtype-preserving: the round-1 pandas-merge bucket join upcast
    int64-with-nulls payloads to float64; VERDICT r1 #1).  Output contract:
    the join key is emitted once, renamed ``_k``; shared payload column
    names get ``suffixes``.  Raise ``num_buckets`` to split hot key ranges;
    broadcast the small side instead (``stages.membership.SemiJoinProbe``)
    whenever it fits in memory.
    """
    joined = left.join(right, join_type="inner", num_partitions=num_buckets,
                       on=(left_key,), right_on=(right_key,),
                       left_suffix=suffixes[0], right_suffix=suffixes[1])

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["_k" if c == left_key else c for c in t.column_names])

    return joined.map_batches(rekey, batch_format="pyarrow", batch_size=None)


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key_cols: tuple, ts_cols: tuple,
              left_payload: list, right_payload: list,
              num_buckets: int = 32,
              direction: str = "backward") -> "ray.data.Dataset":
    """Keyed as-of join (inner): each left row matches the latest right row
    with the same key and ``right_ts <= left_ts`` (``direction="backward"``;
    the custom time-ordered operator the Dataset API lacks — the brief's
    as-of-join case, built as a composition).

    Both sides hash-bucket on the key (ONE shuffle each); within a bucket,
    ``pandas.merge_asof(by=key)`` resolves every key's time ordering in one
    vectorized pass.  The partitioning assumption: a key's rows fit one
    bucket group — buckets bound skew by count, not by key, so hot keys
    spread no wider than their own row count.

    Returns (key, left_ts, *left_payload, *right_payload); unmatched left
    rows drop (inner semantics).  Right side must be unique per
    (key, right_ts) — pre-aggregate ties upstream or matches are
    tie-ambiguous.
    """
    lkey, rkey = key_cols
    lts, rts = ts_cols
    overlap = set(left_payload) & set(right_payload)
    if overlap:
        # merge_asof's ("", "_r") suffixing would make m[c] silently read
        # the LEFT column for a shared payload name — refuse up front
        raise ValueError(f"left/right payload names must be disjoint "
                         f"(shared: {sorted(overlap)}); rename upstream")

    # authoritative payload types, captured ONCE at plan time: after the
    # union, the other side's payload columns are null-padded, so pandas
    # sees int64-with-NaN as float64 and every group would emit upcast
    # payloads (and empty buckets emitted object-dtype = schemaless
    # blocks).  Dataset.schema() is metadata-only for parquet reads and
    # runs one upstream block otherwise — a one-time cost.
    def _arrow_type(ds, col):
        sch = ds.schema().base_schema
        if isinstance(sch, pa.Schema):
            return sch.field(col).type
        # PandasBlockSchema (from_pandas datasets): names + numpy dtypes
        t = dict(zip(sch.names, sch.types))[col]
        return t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)

    ptypes = {c: _arrow_type(left, c) for c in left_payload}
    ptypes |= {c: _arrow_type(right, c) for c in right_payload}
    out_schema = pa.schema(
        [("_key", pa.int64()), ("_ts", pa.timestamp("us"))]
        + [(c, ptypes[c]) for c in left_payload]
        + [(c, ptypes[c]) for c in right_payload])

    def tag(side: int, key: str, ts: str, payload: list):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            mixed = k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            bucket = (mixed % np.uint64(num_buckets)).astype(np.int32)
            cols = {
                "_bucket": pa.array(bucket),
                "_side": pa.array(np.full(len(t), side, dtype=np.int8)),
                "_key": pa.array(k, pa.int64()),
                "_ts": t.column(ts).cast(pa.timestamp("us")),
            }
            for c in payload:
                cols[c] = t.column(c)
            return pa.table(cols)
        return fn

    lt = left.map_batches(tag(0, lkey, lts, left_payload),
                          batch_format="pyarrow", batch_size=None)
    rt = right.map_batches(tag(1, rkey, rts, right_payload),
                           batch_format="pyarrow", batch_size=None)
    both = lt.union(rt)

    def join_bucket(group: pd.DataFrame) -> pa.Table:
        ldf = group[group["_side"] == 0]
        rdf = group[group["_side"] == 1]
        if len(ldf) == 0 or len(rdf) == 0:
            return out_schema.empty_table()
        ldf = ldf[["_key", "_ts"] + left_payload].sort_values("_ts",
                                                              kind="stable")
        rdf = rdf[["_key", "_ts"] + right_payload].sort_values("_ts",
                                                               kind="stable")
        # sentinel marks a genuine right-side match: dropna on a payload
        # column would wrongly drop matched rows whose payload is NULL
        rdf = rdf.assign(_m=np.int8(1))
        m = pd.merge_asof(ldf, rdf, on="_ts", by="_key",
                          direction=direction,
                          suffixes=("", "_r"))
        m = m.dropna(subset=["_m"]).drop(columns=["_m"])
        # rebuild with the plan-time types: both sides' payloads reach here
        # upcast (left via the union null-pad, right via merge_asof's) —
        # safe=False maps the integral floats back and NaN to null
        arrs = [pa.array(m["_key"].to_numpy().astype(np.int64), pa.int64()),
                pa.Array.from_pandas(m["_ts"]).cast(pa.timestamp("us"))]
        for c in left_payload + right_payload:
            arrs.append(pa.Array.from_pandas(m[c], type=ptypes[c],
                                             safe=False))
        return pa.Table.from_arrays(arrs, schema=out_schema)

    return both.groupby("_bucket").map_groups(join_bucket,
                                              batch_format="pandas")
