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

    parts = probed.map_batches(stats, batch_format="pyarrow").to_pandas()
    n_pos, n_pos_f = int(parts["n_pos"].sum()), int(parts["n_pos_found"].sum())
    n_neg, n_neg_f = int(parts["n_neg"].sum()), int(parts["n_neg_found"].sum())
    return {
        "n_probes": n_pos + n_neg,
        "recall": (n_pos_f / n_pos) if n_pos else 1.0,
        "fpr": (n_neg_f / n_neg) if n_neg else 0.0,
        "n_pos": n_pos, "n_neg": n_neg,
    }
