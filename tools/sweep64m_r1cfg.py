"""Re-run of the r1 64M-key config on current code: fused sweep kernel
(run_sweep) at num_shards=32, num_blocks=128, 128M mixed probes.

Companion to tools/scale_demo.py (which measures the 256-shard routed
probe_workload_fused path); artifact BENCH/sweep64m_r1cfg_r3.json.
"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
import pyarrow as pa
from cuckoofilter_ray.pipelines.build import build_partitioned_filter
from cuckoofilter_ray.pipelines.membership import workload_gen_fn
from cuckoofilter_ray.stages.membership import filters_to_stacked_ref
from cuckoofilter_ray.stages.sweep import run_sweep

N_KEYS, N_PROBES, SHARDS = 64_000_000, 128_000_000, 32
keys_per_shard = N_KEYS / SHARDS
nb = 1 << max(8, int(np.ceil(np.log2(keys_per_shard / 4 / 0.954))))
per_shard = int(0.94 * 4 * nb)
empty_ref = ray.put(np.empty(0, dtype=np.uint64))

def synth(batch):
    t = batch.set_column(batch.column_names.index("id"), "id",
                         pa.compute.add(batch.column("id"), 1 << 40))
    return workload_gen_fn(t, inserted_ref=empty_ref, p=0.0, seed=99).select(["key_hi64"])

src = rd.range(N_KEYS, override_num_blocks=256).map_batches(synth, batch_format="pyarrow", batch_size=None)
t0 = time.perf_counter()
rows = build_partitioned_filter(src, num_shards=SHARDS, capacity_per_shard=per_shard,
                                kind="cuckoo", bits_per_tag=12, seed=0xDEAD).take_all()
build_s = time.perf_counter() - t0
fref = filters_to_stacked_ref(rows, group_col="_shard")
blob = ray.get(fref)
mb = blob["tags64"].nbytes / 1e6
# inserted keys for positive draws (r1 did ray.put(keys) of all 64M)
ins = rd.range(N_KEYS, override_num_blocks=256).map_batches(synth, batch_format="pyarrow", batch_size=None).to_pandas()["key_hi64"].to_numpy().astype(np.uint64)
iref = ray.put(ins)
best, m = None, None
for _ in range(2):
    t0 = time.perf_counter()
    m = run_sweep(iref, fref, N_PROBES, seed=777, num_shards=SHARDS, num_blocks=128)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"build_sec": round(build_s, 2),
                  "adds_mps": round(N_KEYS / build_s / 1e6, 2),
                  "broadcast_mb": round(mb, 1),
                  "sweep_sec": round(best, 2),
                  "finds_mps": round(N_PROBES / best / 1e6, 2),
                  "recall": m["recall"], "fpr_pct": round(100 * m["fpr"], 4)}))
ray.shutdown()
