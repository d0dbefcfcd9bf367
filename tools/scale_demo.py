#!/usr/bin/env python
"""64M-key scale demonstration (BASELINE.md §scale; re-runnable artifact).

Builds a 256-shard partitioned filter over 64M synthetic keys, then probes
128M keys through the zero-copy stacked broadcast — once for cuckoo-12
(8 bytes/bucket in plasma) and once for semisort-13 probed PACKED
(6 bytes/bucket, decoded per probed bucket only).

    python tools/scale_demo.py [n_keys] [n_probes]

Prints one JSON line; takes ~1-2 min at the defaults on 32 cpus.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
N_PROBES = int(sys.argv[2]) if len(sys.argv) > 2 else 128_000_000
SHARDS = 256
SEED = 0xDEAD

import ray  # noqa: E402

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import ray.data as rd  # noqa: E402

from cuckoofilter_ray.pipelines.build import build_partitioned_filter  # noqa: E402
from cuckoofilter_ray.pipelines.membership import (  # noqa: E402
    probe_workload_fused, workload_gen_fn)
from cuckoofilter_ray.stages.membership import (  # noqa: E402
    PackedSemisortProbe, filters_to_packed_ref, filters_to_stacked_ref)

def _count(batch: pa.Table) -> pa.Table:
    m = batch.column("is_member").to_numpy(zero_copy_only=False)
    return pa.table({"n_found": pa.array([int(m.sum())], pa.int64())})


out = {"n_keys": N_KEYS, "n_probes": N_PROBES, "num_shards": SHARDS}
# size so create() keeps nb (no doubling) and the insert fills to ~0.95 —
# the reference's at-capacity regime (BASELINE.md r1 ran at load 0.954)
keys_per_shard = N_KEYS / SHARDS
nb = 1 << max(8, int(np.ceil(np.log2(keys_per_shard / 4 / 0.954))))
per_shard = int(0.94 * 4 * nb)

empty_ref = ray.put(np.empty(0, dtype=np.uint64))


def synth(batch: pa.Table) -> pa.Table:
    # offset the id range far from the probe stream's: both streams are
    # murmur64(id + seed), so overlapping id+seed ranges would make probe
    # keys literally inserted keys (a 50% "FPR" artifact, not a measurement)
    t = batch.set_column(batch.column_names.index("id"), "id",
                         pa.compute.add(batch.column("id"), 1 << 40))
    return workload_gen_fn(t, inserted_ref=empty_ref, p=0.0,
                           seed=99).select(["key_hi64"])


for kind, bits in (("cuckoo", 12), ("semisort", 13)):
    keys = rd.range(N_KEYS, override_num_blocks=256).map_batches(
        synth, batch_format="pyarrow", batch_size=None)
    t0 = time.perf_counter()
    rows = build_partitioned_filter(keys, num_shards=SHARDS,
                                    capacity_per_shard=per_shard, kind=kind,
                                    bits_per_tag=bits, seed=SEED).take_all()
    build_s = time.perf_counter() - t0
    from cuckoofilter_ray.kernels import deserialize
    n_items = sum(r["num_items"] for r in rows)
    slots = sum(deserialize(r["sketch"]).num_buckets * 4 for r in rows)
    stats = {"build_sec": round(build_s, 2),
             "adds_mps": round(N_KEYS / build_s / 1e6, 2),
             "load": round(n_items / slots, 4)}

    if kind == "cuckoo":
        fref = filters_to_stacked_ref(rows, group_col="_shard")
        blob = ray.get(fref)
        stats["broadcast_mb"] = round(blob["tags64"].nbytes / 1e6, 1)
        t0 = time.perf_counter()
        parts = probe_workload_fused(empty_ref, fref, N_PROBES, p=0.0,
                                     seed=321, num_shards=SHARDS,
                                     num_blocks=128)
        counts = parts.map_batches(_count, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
        found = int(counts["n_found"].sum())
        probe_s = time.perf_counter() - t0
    else:
        fref = filters_to_packed_ref(rows, group_col="_shard")
        blob = ray.get(fref)
        stats["broadcast_mb"] = round(blob["packed6"].nbytes / 1e6, 1)
        wl = rd.range(N_PROBES, override_num_blocks=128).map_batches(
            workload_gen_fn, batch_format="pyarrow", batch_size=None,
            fn_kwargs={"inserted_ref": empty_ref, "p": 0.0, "seed": 321,
                       "num_shards": SHARDS})
        t0 = time.perf_counter()
        probed = wl.map_batches(
            PackedSemisortProbe, batch_format="pyarrow", batch_size=None,
            concurrency=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            fn_constructor_kwargs={"filters_ref": fref,
                                   "shard_col": "_shard"})
        counts = probed.map_batches(_count, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
        found = int(counts["n_found"].sum())
        probe_s = time.perf_counter() - t0
    stats["probe_sec"] = round(probe_s, 2)
    stats["finds_mps"] = round(N_PROBES / probe_s / 1e6, 2)
    stats["fpr_pct"] = round(100 * found / N_PROBES, 4)
    out[f"{kind}{bits}"] = stats

print(json.dumps(out))
ray.shutdown()
