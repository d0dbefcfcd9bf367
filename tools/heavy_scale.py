"""Scale demo for the exact heavy-hitters pipeline: a 50 M-item planted
power-law stream.

The stream is synthesized INSIDE Ray tasks (no driver materialization)
as a pure function of the absolute position: ``u = splitmix64(pos) /
2^64`` inverse-CDF mapped onto a Pareto(α) over a 1 M-id vocabulary, so
every run regenerates the identical stream and the true frequency of any
id is exactly countable.  Then:

- ``heavy_hitters(denom)`` runs the two-pass pipeline
  (:mod:`cuckoofilter_ray.stages.heavy`): Misra-Gries sketch aggregate
  (O(k) bytes per block on the wire) → broadcast exact refinement.
- Ground truth: an exact distributed count of the REPORTED ids plus a
  sketch-free exact count of all ids above the threshold, via the same
  per-block bincount partials — every reported (id, n) must match, and
  no qualifying id may be missing (zero false negatives, zero false
  positives, exact counts).

Reports wall time, items/s, and the verification verdict.

Usage: python tools/heavy_scale.py [n_items] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
VOCAB = 1_000_000
ALPHA = 1.1          # Pareto shape: heavy head, long tail
BLOCK = 1 << 20


def _mix(pos: np.ndarray) -> np.ndarray:
    x = pos.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _ids_for(lo: int, hi: int) -> np.ndarray:
    """Deterministic power-law item ids for absolute positions [lo, hi)."""
    u = (_mix(np.arange(lo, hi, dtype=np.int64)) >> np.uint64(11)) \
        .astype(np.float64) / float(1 << 53)
    u = np.maximum(u, 1e-12)
    ids = np.floor(u ** (-1.0 / ALPHA)).astype(np.int64)  # Pareto(xm=1)
    return np.minimum(ids, VOCAB) - 1                     # 0-based, capped


def main() -> None:
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    denom = 200_000           # threshold = n/denom (≈250 at 50 M)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    ray.data.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2) \
        .map_batches(lambda b: b, batch_format="pyarrow").count()

    num_blocks = (n_items + BLOCK - 1) // BLOCK

    def synth(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("id").to_pylist():
            lo = b * BLOCK
            out.append(_ids_for(lo, min(lo + BLOCK, n_items)))
        return pa.table({"item": pa.array(np.concatenate(out),
                                          type=pa.int64())})

    def stream():
        return ray.data.range(num_blocks, override_num_blocks=num_blocks) \
            .map_batches(synth, batch_format="pyarrow", batch_size=None)

    from cuckoofilter_ray.stages.heavy import heavy_hitters

    t0 = time.perf_counter()
    hh = heavy_hitters(stream(), "item", denom=denom, k=2 * denom)
    wall = time.perf_counter() - t0
    got = {int(i): int(n) for i, n in
           zip(hh.column("item").to_pylist(), hh.column("n").to_pylist())}

    # ground truth: exact per-block bincounts over the SMALL id range that
    # can possibly qualify (power law ⇒ qualifying ids are tiny), then one
    # exact driver reduce.  id_cap chosen so the check is provably a
    # superset: counts are monotonically decreasing in expectation but we
    # verify the cap by requiring the boundary id to be far below bar.
    id_cap = 4096

    def headcount(batch: pa.Table) -> pa.Table:
        ids = batch.column("item").to_numpy(zero_copy_only=False)
        small = ids[ids < id_cap]
        c = np.bincount(small, minlength=id_cap).astype(np.int64)
        return pa.table({"cnt": pa.array([c.tobytes()], type=pa.binary()),
                         "total": pa.array([len(ids)], type=pa.int64())})

    t1 = time.perf_counter()
    parts = stream().map_batches(headcount, batch_format="pyarrow",
                                 batch_size=None).take_all()
    exact = np.zeros(id_cap, dtype=np.int64)
    total = 0
    for r in parts:
        exact += np.frombuffer(r["cnt"], dtype=np.int64)
        total += r["total"]
    exact_wall = time.perf_counter() - t1
    bar = total / denom
    assert exact[id_cap // 2:].max() < bar / 4, \
        "id_cap too small to certify the ground-truth sweep"
    want = {int(i): int(exact[i]) for i in np.flatnonzero(exact > bar)}

    ok = got == want
    res = {
        "n_items": total,
        "denom": denom,
        "threshold": round(bar, 1),
        "hh_found": len(got),
        "hh_true": len(want),
        "exact_match": bool(ok),
        "wall_s": round(wall, 3),
        "items_per_s_m": round(total / wall / 1e6, 2),
        "groundtruth_wall_s": round(exact_wall, 3),
        "num_cpus": NUM_CPUS,
    }
    print(json.dumps(res))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    assert ok, "heavy-hitter set mismatch vs exact ground truth"
    ray.shutdown()


if __name__ == "__main__":
    main()
