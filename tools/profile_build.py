#!/usr/bin/env python
"""Stage-time breakdown of the headline 600 k build (VERDICT r3 #5: the
e2e adds_mps drifted 1.14 → 0.77-0.98 M/s across rounds; name the fixed
cost).  Splits build_lineitem into read+key / partial-build / reduce-merge
and reports each stage's wall over repeated runs, plus Ray Data's own
stats for the build pipeline.

Usage: python tools/profile_build.py [sf_dir]
Prints one JSON line; paste the table into BASELINE.md.
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 0x5EED_C0DE
NUM_SHARDS = 32
REPS = int(os.environ.get("PROFILE_REPS", 5))


def main() -> None:
    import ray
    import ray.data
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    ray.data.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2) \
        .map_batches(lambda b: b, batch_format="pyarrow").count()

    from bench import _add_lineitem_keys
    from cuckoofilter_ray.pipelines.build import build_partitioned_filter

    import pyarrow.parquet as pq
    n_items = pq.ParquetFile(f"{SF_DIR}/lineitem.parquet").metadata.num_rows
    per_shard = 1 << max(10, (int(n_items / NUM_SHARDS / 0.85) - 1)
                         .bit_length())

    stages = {k: [] for k in ("read_key", "build_from_mat", "e2e",
                              "take_all_only")}
    for _ in range(REPS):
        # stage 1: read + key-derive + select, materialized
        t0 = time.perf_counter()
        li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                                   columns=["l_orderkey", "l_linenumber"],
                                   override_num_blocks=max(16, NUM_CPUS))
        keyed = li.map_batches(_add_lineitem_keys, batch_format="pyarrow",
                               batch_size=None) \
            .select_columns(["key_hi64"]).materialize()
        stages["read_key"].append(time.perf_counter() - t0)

        # stage 2: partial-build + shuffle + merge from the materialized keys
        t0 = time.perf_counter()
        filters = build_partitioned_filter(keyed, num_shards=NUM_SHARDS,
                                           capacity_per_shard=per_shard,
                                           kind="cuckoo", bits_per_tag=12,
                                           seed=SEED)
        rows = filters.take_all()
        stages["build_from_mat"].append(time.perf_counter() - t0)
        assert sum(r["num_items"] for r in rows) == n_items

        # e2e (what bench.py times): lazy read -> build -> take_all
        t0 = time.perf_counter()
        li2 = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                                    columns=["l_orderkey", "l_linenumber"],
                                    override_num_blocks=max(16, NUM_CPUS))
        keyed2 = li2.map_batches(_add_lineitem_keys, batch_format="pyarrow",
                                 batch_size=None) \
            .select_columns(["key_hi64"])
        f2 = build_partitioned_filter(keyed2, num_shards=NUM_SHARDS,
                                      capacity_per_shard=per_shard,
                                      kind="cuckoo", bits_per_tag=12,
                                      seed=SEED)
        f2.take_all()
        stages["e2e"].append(time.perf_counter() - t0)

        # control: just collecting 32 tiny rows from a materialized Dataset
        fm = f2.materialize()
        t0 = time.perf_counter()
        fm.take_all()
        stages["take_all_only"].append(time.perf_counter() - t0)

    # single-core kernel control: the same keys through CuckooFilter.add_batch
    from cuckoofilter_ray.kernels import CuckooFilter
    keys = np.concatenate(
        [b.column("key_hi64").to_numpy(zero_copy_only=False)
         for b in keyed.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow")]).astype(np.uint64)
    kern = []
    for _ in range(REPS):
        filt = CuckooFilter(per_shard // 2, bits_per_tag=12, seed=SEED)
        t0 = time.perf_counter()
        for s in range(NUM_SHARDS):
            f = CuckooFilter.create(per_shard, bits_per_tag=12, seed=SEED)
            f.add_batch(keys[s::NUM_SHARDS])
        kern.append(time.perf_counter() - t0)

    out = {
        "metric": "600k build stage breakdown",
        "n_items": int(n_items),
        "reps": REPS,
        "num_cpus": NUM_CPUS,
        "sf_dir": SF_DIR,
        "stages_sec": {k: {"best": round(min(v), 4),
                           "median": round(sorted(v)[len(v) // 2], 4)}
                       for k, v in stages.items()},
        "kernel_32shard_1core_sec": round(min(kern), 4),
        "e2e_adds_mps_best": round(n_items / min(stages["e2e"]) / 1e6, 4),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
