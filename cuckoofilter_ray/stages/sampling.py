"""Deterministic hash-based sampling and dataset splitting.

The two bread-and-butter corpus operations a training-data pipeline runs
before anything else: subsample to a target budget (optionally per-stratum
rates — rebalance languages/sources) and carve stable train/val/test
splits.  Both are *hash-threshold* decisions: a row's fate is a pure
function of ``(salt, id)``, so they are

- shuffle-free and embarrassingly parallel (one ``map_batches`` pass, no
  data movement beyond the read — the 100 TB shape),
- reproducible across runs, resumable shards, and cluster sizes (no RNG
  state, no ordering dependence — unlike ``Dataset.random_sample``),
- stable under corpus growth: a document keeps its split/sample fate when
  neighbors are added or removed (the property eval-set hygiene needs).

Two hash modes:

- ``"md5"`` (default): the decision value is the first 8 hex chars of
  ``md5(salt || str(id))``, compared lexicographically against a
  fixed-width hex threshold — fixed-width lowercase hex compares
  lexicographically exactly as the 32-bit integer it encodes, so the
  whole operator is expressible in ANSI SQL (``substr(md5(..),1,8) <
  'xxxxxxxx'``) and the driver's DuckDB oracle checks it value-exactly.
  Cost: hashlib per row (~1 µs) — fine for gate scales and most reads.
- ``"splitmix"``: the engine's ``mix_split`` murmur finalizer over the
  integer id, salt-keyed (vectorized numpy, zero per-row Python) — the
  100 TB hot path when SQL parity isn't required.  Same API, same
  threshold semantics on the top 32 bits.

Reference tie-in: the salt-keyed uniform is exactly the reference's
``GenerateRandom64Fast`` discipline (deterministic value streams keyed by
an offset, benchmarks/random.h) applied to row ids.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.hashing import mix_split

_SCALE = 1 << 32                     # 8 hex chars


def threshold_hex(rate: float) -> str:
    """Fixed-width 8-char hex threshold for a keep-rate in [0, 1]."""
    v = min(max(int(round(rate * _SCALE)), 0), _SCALE)
    return format(min(v, _SCALE - 1), "08x") if v < _SCALE else "g" * 8
    # "gggggggg" sorts after every hex string => rate 1.0 keeps all rows


def _u_hex_md5(ids, salt: str) -> list:
    md5 = hashlib.md5
    pre = salt.encode()
    return [md5(pre + str(i).encode()).hexdigest()[:8] for i in ids]


def _u_hex_splitmix(ids, salt: str) -> list:
    a = np.asarray(ids, dtype=np.int64).view(np.uint64)
    sm = int.from_bytes(hashlib.md5(salt.encode()).digest()[:8], "little")
    u = mix_split(a, sm) >> np.uint64(32)
    return [format(int(v), "08x") for v in u]


def add_decision_hex(batch: pa.Table, *, id_col: str = "doc_id",
                     salt: str = "", mode: str = "md5",
                     out_col: str = "u_hex") -> pa.Table:
    """Append the row's 8-hex-char decision value (uniform on [0, 2³²))."""
    ids = batch.column(id_col).to_pylist()
    fn = _u_hex_md5 if mode == "md5" else _u_hex_splitmix
    return batch.append_column(out_col, pa.array(fn(ids, salt), pa.string()))


def stratified_sample(ds, rates: Dict[str, float], *,
                      default_rate: float = 1.0,
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "", mode: str = "md5",
                      keep_decision: bool = True):
    """Deterministic per-stratum subsample: keep a row iff its decision
    value falls under its stratum's threshold.  ``rates`` maps stratum
    values to keep-rates; unseen strata use ``default_rate``.

    One streaming ``map_batches`` pass; the rate table is a plain dict in
    the task closure (bytes, not a broadcast).  E[kept] = Σ nᵢ·rateᵢ with
    per-row independence — at any corpus size the output is the same rows
    (id-keyed), so a rerun, a resumed shard, or a grown corpus never
    reshuffles the sample."""
    thr = {k: threshold_hex(v) for k, v in rates.items()}
    dthr = threshold_hex(default_rate)

    def _filter(batch: pa.Table) -> pa.Table:
        t = add_decision_hex(batch, id_col=id_col, salt=salt, mode=mode)
        strata = t.column(stratum_col).to_pylist()
        ths = pa.array([thr.get(s, dthr) for s in strata], pa.string())
        kept = t.filter(pc.less(t.column("u_hex"), ths))
        return kept if keep_decision else kept.drop_columns(["u_hex"])

    return ds.map_batches(_filter, batch_format="pyarrow", batch_size=None)


def cap_per_group(ds, group_col: str, k: int, *,
                  id_col: str = "doc_id", salt: str = "",
                  mode: str = "md5", priority_col: Optional[str] = None,
                  num_buckets: int = 64, keep_priority: bool = True):
    """Keep at most ``k`` rows per distinct ``group_col`` value — the
    per-domain / per-source quota step of a crawl pipeline (cap how much
    any one site contributes to the training mix).

    Winners are the ``k`` smallest ``(priority, id)`` rows of each group.
    ``priority`` defaults to the row's salted 8-hex decision value (same
    md5/splitmix contract as :func:`stratified_sample` — an unbiased,
    rerun-stable draw, NOT "first k by id"), or pass ``priority_col`` to
    rank by an existing column (e.g. a quality score, ascending).

    Scale shape (the ``exact_dedup`` discipline, stages/dedup.py): every
    block first pre-reduces to ≤ k rows per group it contains — a sort +
    ``groupby().head`` inside ``map_batches``, no exchange — so at most
    ``k × n_groups`` rows per block ride the ONE group-hash-bucketed
    shuffle, and the per-bucket reducer is the same vectorized top-k over
    thousands of groups at once.  Output size is bounded by
    ``k × n_groups`` regardless of corpus size.  A null group value is a
    group like any other (capped at k, not dropped — crawl data has
    missing domains; `stratified_sample` keeps null strata the same
    way)."""
    if k < 1:
        raise ValueError("k must be positive")
    prio = priority_col or "_prio"

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        if priority_col is None:
            t = add_decision_hex(pa.Table.from_pandas(
                df[[id_col]], preserve_index=False),
                id_col=id_col, salt=salt, mode=mode, out_col=prio)
            df = df.assign(**{prio: t.column(prio).to_pylist()})
        return df.sort_values([prio, id_col], kind="stable") \
            .groupby(group_col, sort=False, dropna=False).head(k)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[group_col].to_numpy())
        return df.assign(_bucket=(h % np.uint64(num_buckets))
                         .astype(np.int32))

    def _topk(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values([prio, id_col], kind="stable") \
            .groupby(group_col, sort=False, dropna=False).head(k) \
            .drop(columns=["_bucket"])
        if priority_col is None and not keep_priority:
            out = out.drop(columns=[prio])
        return out

    pre = ds.map_batches(_pre, batch_format="pandas", batch_size=None) \
        .map_batches(_bucket, batch_format="pandas", batch_size=None)
    return pre.groupby("_bucket").map_groups(_topk, batch_format="pandas")


def hash_split(ds, boundaries: Sequence[Tuple[str, float]] = (
        ("train", 0.9), ("val", 0.95), ("test", 1.0)), *,
        id_col: str = "doc_id", salt: str = "", mode: str = "md5",
        out_col: str = "split"):
    """Stable train/val/test assignment: the decision value is bucketed by
    cumulative ``boundaries`` (name, upper-bound) pairs, last bound must
    be 1.0.  Emits every row with an added ``split`` column — filter or
    ``write_parquet`` partitioned on it downstream.  Same determinism
    contract as :func:`stratified_sample`."""
    bounds = list(boundaries)
    if not bounds or bounds[-1][1] < 1.0:
        raise ValueError("last boundary must close the unit interval")
    cuts = [(name, threshold_hex(ub)) for name, ub in bounds]

    def _assign(batch: pa.Table) -> pa.Table:
        t = add_decision_hex(batch, id_col=id_col, salt=salt, mode=mode)
        u = t.column("u_hex")
        out = pa.nulls(len(t), pa.string())
        assigned = pa.array(np.zeros(len(t), dtype=bool))
        for name, ub in cuts:
            hit = pc.and_(pc.invert(assigned), pc.less(u, pa.scalar(ub)))
            out = pc.if_else(hit, pa.scalar(name, pa.string()), out)
            assigned = pc.or_(assigned, hit)
        return t.drop_columns(["u_hex"]).append_column(out_col, out)

    return ds.map_batches(_assign, batch_format="pyarrow", batch_size=None)
