#!/usr/bin/env python
"""ANN scale demonstration: brute-force vs IVF cosine top-k over a large
synthetic embedding table (re-runnable artifact for the similarity-search
components, SURVEY §LLM-ops).

    python tools/ann_scale.py [n_vectors] [dim] [out.json]

Builds ``n_vectors`` deterministic cluster-structured embeddings as a
partitioned Dataset (never materialized on the driver), runs
- exact brute-force cosine top-10 (broadcast queries, per-batch matmul,
  per-query reduce), and
- IVF top-10 (k-means coarse quantizer on a driver sample, n_probe of
  n_lists inverted lists probed),
and reports walls, vectors/s, and IVF recall@10 vs the exact answer.
Prints ONE JSON line; ~1 min at the 1M x 64 default on 32 cpus.
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VEC = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
OUT = sys.argv[3] if len(sys.argv) > 3 else None
N_QUERIES, K, N_LISTS, N_PROBE = 32, 10, 64, 8
BLOCKS = 64
SEED = 1234

import ray  # noqa: E402

if not ray.is_initialized():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
import ray.data as rd  # noqa: E402

from cuckoofilter_ray.stages.similarity import (knn_bruteforce,  # noqa: E402
                                                knn_ivf)


def synth(batch: pa.Table) -> pa.Table:
    """Cluster-structured embeddings: 256 latent centers + noise, so IVF
    has real structure to exploit (pure-noise vectors make every ANN look
    bad for reasons unrelated to the pipeline)."""
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(256, DIM)).astype(np.float32)
    per = np.random.default_rng(ids[0] * 7919 + SEED)
    c = per.integers(0, 256, size=len(ids))
    emb = centers[c] + 0.15 * per.normal(size=(len(ids), DIM)) \
        .astype(np.float32)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(emb.astype(np.float32)),
                              pa.list_(pa.float32())),
    })


def main() -> None:
    t_synth = time.perf_counter()
    ds = rd.range(N_VEC, override_num_blocks=BLOCKS) \
        .map_batches(synth, batch_format="pyarrow", batch_size=None) \
        .materialize()
    synth_s = time.perf_counter() - t_synth

    qrng = np.random.default_rng(SEED + 1)
    centers = np.random.default_rng(SEED).normal(
        size=(256, DIM)).astype(np.float32)
    queries = {f"q{i}": (centers[qrng.integers(0, 256)] +
                         0.15 * qrng.normal(size=DIM).astype(np.float32))
               for i in range(N_QUERIES)}

    t0 = time.perf_counter()
    exact = knn_bruteforce(ds, queries, k=K).to_pandas()
    bf_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    approx = knn_ivf(ds, queries, k=K, n_lists=N_LISTS, n_probe=N_PROBE,
                     seed=7).to_pandas()
    ivf_s = time.perf_counter() - t0

    recalls = []
    for q in queries:
        want = set(exact[exact.query_id == q].vec_id)
        got = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(want & got) / max(1, len(want)))
    out = {
        "metric": "ANN cosine top-k over synthetic embeddings",
        "n_vectors": N_VEC, "dim": DIM, "n_queries": N_QUERIES, "k": K,
        "synth_s": round(synth_s, 2),
        "bruteforce": {"sec": round(bf_s, 2),
                       "vectors_per_sec_m": round(N_VEC / bf_s / 1e6, 2)},
        "ivf": {"sec": round(ivf_s, 2), "n_lists": N_LISTS,
                "n_probe": N_PROBE,
                "recall_at_k_mean": round(float(np.mean(recalls)), 4),
                "recall_at_k_min": round(float(np.min(recalls)), 4)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
    }
    line = json.dumps(out)
    print(line)
    if OUT:
        with open(OUT, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
    ray.shutdown()
