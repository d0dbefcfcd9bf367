"""Relational companions: windowed aggregates and a partitioned hash join.

The reference has no relational ops (SURVEY.md §2.6 negative space); these
exist because the engine's production context — filter/dedup pipelines over
event logs and dimension tables — needs them, and they follow the same scale
discipline as the builds:

- ``tumbling_window_agg``: per-block VECTORIZED pre-aggregation (pandas
  groupby inside ``map_batches``) emits one partial row per (key, window)
  per block; the global groupby then shuffles partials, never raw events —
  the map-side-combine pattern (ray_guide "Aggregation at scale").
- ``hash_join``: explicit bucketed hash join for two large sides — add
  ``bucket = hash(key) % B`` to both, tag the side, union, and merge each
  bucket's rows pairwise inside one ``map_groups`` task (ray_guide "Joins").
  Salt hot keys by raising B; broadcast the small side instead
  (``stages.membership.SemiJoinProbe``) whenever it fits memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..kernels.hashing import mix_split


def tumbling_window_agg(ds: "ray.data.Dataset", ts_col: str, key_col: str,
                        value_col: str, window_us: int) -> "ray.data.Dataset":
    """count + sum(value) per (key, tumbling window).

    Windows are event-time buckets ``floor(epoch_us / window_us)`` — no
    watermarks (batch log, ray_guide "Streaming-shaped workloads").
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

    Both sides get ``_bucket = mix(key) % B`` and a side tag, are unioned
    under one schema (missing columns null), and each bucket joins pairwise
    in a single ``map_groups`` task with a pandas merge.  B bounds per-task
    memory (raise it to split hot key ranges).
    """
    lschema, rschema = left.schema(), right.schema()
    shared = (set(lschema.names) & set(rschema.names)) - {left_key, right_key}

    def out_name(col: str, side: str) -> str:
        return col + (suffixes[0] if side == "L" else suffixes[1]) \
            if col in shared else col

    # one fixed output schema for BOTH sides (union requires it):
    # (_bucket, _side, _k, left payload cols..., right payload cols...)
    payload = []          # (out_name, side, source_col, pyarrow type)
    for c, t in zip(lschema.names, lschema.types):
        if c != left_key:
            payload.append((out_name(c, "L"), "L", c, t))
    for c, t in zip(rschema.names, rschema.types):
        if c != right_key:
            payload.append((out_name(c, "R"), "R", c, t))
    l_names = [p[0] for p in payload if p[1] == "L"]
    r_names = [p[0] for p in payload if p[1] == "R"]

    def tag(side: str, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            # inner-join semantics: null keys never match — drop them here
            # (they would also poison the uint64 bucket hash)
            valid = pa.compute.is_valid(batch.column(key_col))
            if not pa.compute.all(valid).as_py():
                batch = batch.filter(valid)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.uint64, copy=False)
            bucket = (mix_split(keys, 0xB0C4) % np.uint64(num_buckets)) \
                .astype(np.int32)
            cols = {"_bucket": pa.array(bucket, pa.int32()),
                    "_side": pa.array([side] * len(batch)),
                    "_k": batch.column(key_col)}
            for name, src_side, src_col, typ in payload:
                cols[name] = batch.column(src_col) if src_side == side \
                    else pa.nulls(len(batch), type=typ)
            return pa.table(cols)
        return fn

    tl = left.map_batches(tag("L", left_key), batch_format="pyarrow",
                          batch_size=None)
    tr = right.map_batches(tag("R", right_key), batch_format="pyarrow",
                           batch_size=None)
    both = tl.union(tr)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group.loc[group["_side"] == "L", ["_k"] + l_names]
        rg = group.loc[group["_side"] == "R", ["_k"] + r_names]
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=["_k"] + l_names + r_names)
        return pd.merge(lg, rg, on="_k")

    joined = both.groupby("_bucket").map_groups(join_bucket,
                                                batch_format="pandas")
    # normalize to Arrow blocks: pandas map_groups emits pandas blocks, which
    # poison later unions/aggregates that expect one block type
    return joined.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=None)
