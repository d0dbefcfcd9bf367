"""Scale demo for the quantile sketches: a 50 M-value heavy-tailed stream
through the mergeable t-digest and KLL UDAFs, rank-verified EXACTLY.

The stream is synthesized INSIDE Ray tasks as a pure function of absolute
position (``u = splitmix64(pos)/2^64`` → Pareto(α=1.5) inverse CDF), so
every run regenerates the identical multiset with no driver
materialization.  Both sketches aggregate through Ray's block-level
combine (one digest per block rides the wire, never values).

Verification is exact and distributed: for every estimated quantile v_q,
one counting pass computes ``rank_left = #{x < v_q}`` and ``rank_right =
#{x <= v_q}`` over the full stream (all quantiles in one vectorized
map_batches), and the distance from q to [rank_left, rank_right]/n must
sit within each sketch's own rank-error band — including p0.1/p99.9,
where the t-digest's asin scale is the point of the exercise.

Usage: python tools/quantile_scale.py [n_items] [out.json]
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
ALPHA = 1.5
BLOCK = 1 << 20
QS = (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999)


def _mix(pos: np.ndarray) -> np.ndarray:
    x = pos.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _vals_for(lo: int, hi: int) -> np.ndarray:
    """Deterministic Pareto(α) values for absolute positions [lo, hi)."""
    u = (_mix(np.arange(lo, hi, dtype=np.int64)) >> np.uint64(11)) \
        .astype(np.float64) / float(1 << 53)
    return np.maximum(u, 1e-15) ** (-1.0 / ALPHA)


def main() -> None:
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    num_blocks = (n_items + BLOCK - 1) // BLOCK

    def synth(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("id").to_pylist():
            lo = b * BLOCK
            out.append(_vals_for(lo, min(lo + BLOCK, n_items)))
        return pa.table({"v": pa.array(np.concatenate(out),
                                       type=pa.float64())})

    def stream():
        return ray.data.range(num_blocks, override_num_blocks=num_blocks) \
            .map_batches(synth, batch_format="pyarrow", batch_size=None)

    # warm the worker pool THROUGH the synth stage (pool spawn + plan
    # compile otherwise bills ~3s to the first timed aggregate)
    stream().map_batches(lambda b: pa.table({"n": [len(b)]}),
                         batch_format="pyarrow").count()

    from cuckoofilter_ray.stages.aggregate import KLLAgg, TDigestAgg

    sketches = {}
    walls = {}
    for name, agg in (("tdigest", TDigestAgg(on="v", delta=200,
                                             alias_name="s")),
                      ("kll", KLLAgg(on="v", k=256, seed=7,
                                     alias_name="s"))):
        t0 = time.perf_counter()
        sketches[name] = agg.unpack(stream().aggregate(agg)["s"])
        walls[name] = time.perf_counter() - t0

    td = sketches["tdigest"]
    assert td.total_weight() == n_items, "t-digest lost weight"

    # exact rank check: ONE distributed counting pass for all estimates of
    # both sketches (2 × len(QS) thresholds, vectorized searchsorted per
    # block after an in-task sort of the block)
    ests = {name: np.array([float(np.atleast_1d(s.quantile(q))[0])
                            for q in QS])
            for name, s in sketches.items()}
    thresholds = np.concatenate([ests["tdigest"], ests["kll"]])
    tref = ray.put(thresholds)

    def rank_counts(batch: pa.Table) -> pa.Table:
        t = np.asarray(ray.get(tref))
        x = np.sort(batch.column("v").to_numpy(zero_copy_only=False))
        left = np.searchsorted(x, t, side="left")
        right = np.searchsorted(x, t, side="right")
        return pa.table({"left": pa.array([left.tobytes()], pa.binary()),
                         "right": pa.array([right.tobytes()], pa.binary())})

    t1 = time.perf_counter()
    parts = stream().map_batches(rank_counts, batch_format="pyarrow",
                                 batch_size=None).take_all()
    verify_wall = time.perf_counter() - t1
    left = np.zeros(len(thresholds), dtype=np.int64)
    right = np.zeros(len(thresholds), dtype=np.int64)
    for r in parts:
        left += np.frombuffer(r["left"], dtype=np.int64)
        right += np.frombuffer(r["right"], dtype=np.int64)

    report = {}
    all_ok = True
    for i, name in enumerate(("tdigest", "kll")):
        s = sketches[name]
        rows = []
        for j, q in enumerate(QS):
            k = i * len(QS) + j
            lo, hi = left[k] / n_items, right[k] / n_items
            err = max(lo - q, q - hi, 0.0)
            bound = float(s.rank_error_bound(q)) if name == "tdigest" \
                else float(s.rank_error_bound())
            ok = err <= bound
            all_ok &= ok
            rows.append({"q": q, "rank_err": round(err, 6),
                         "bound": round(bound, 6), "ok": bool(ok)})
        report[name] = {"wall_s": round(walls[name], 3),
                        "values_per_s_m": round(n_items / walls[name] / 1e6,
                                                2),
                        "quantiles": rows}

    import bench as _bench               # host-quality self-label
    eff, solo = _bench._effective_cores(ray)
    res = {
        "n_items": n_items,
        "alpha": ALPHA,
        "effective_cores": eff,
        "solo_ms": solo,
        "tdigest_centroids": int(len(td.weights)),
        "tdigest_bytes": len(td.to_bytes()),
        "all_within_bound": bool(all_ok),
        "verify_wall_s": round(verify_wall, 3),
        "num_cpus": NUM_CPUS,
        **report,
    }
    print(json.dumps(res))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    assert all_ok, "a sketch quantile fell outside its rank-error band"
    ray.shutdown()


if __name__ == "__main__":
    main()
