"""Scale demo for the LLM-dedup pipelines: 500 k synthetic docs.

The membership side has its 64 M-key demo (tools/scale_demo.py /
tools/sweep64m_r1cfg.py); this is the dedup analog.  A deterministic
corpus is synthesized INSIDE Ray tasks (no driver materialization),
with planted near-duplicate pairs (every 50th doc mutates its
predecessor by one word) and planted exact duplicates (every 97th doc
past 1000 repeats the doc 1000 earlier, chains resolved), then:

- ``minhash``: MinHash-LSH candidate pairs (the flagship near-dup
  path: banded shuffle of (id, band, sig) rows only, hot-bucket caps).
  Reports docs/s and planted-pair recall.
- ``exact``: sha256-keyed exact dedup over the same corpus
  (narrow (key, id) shuffle, min-id winners), reports docs/s and the
  exact expected survivor count.

Usage: python tools/dedup_scale.py [n_docs] [out.json]
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
VOCAB = 8192
WORDS_PER_DOC = 40
NEAR_EVERY = 50     # resolved doc s with s % 50 == 1 mutates doc s-1
DUP_EVERY = 97      # doc i with i % 97 == 0, i >= 1000 repeats doc i-1000


def _mix(pos: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over absolute word positions — ID-addressable,
    so duplicate/mutated rows regenerate their source text without ever
    fetching it (the corpus is a pure function of the row id)."""
    x = pos.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def resolve_source(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(resolved id s, near mask): chase the exact-dup chain i -> i-1000
    until landing on a non-dup row, then flag near-mutation rows."""
    s = ids.astype(np.int64).copy()
    while True:
        m = (s % DUP_EVERY == 0) & (s >= 1000)
        if not m.any():
            break
        s[m] -= 1000
    return s, (s % NEAR_EVERY) == 1


def make_docs(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    s, near = resolve_source(ids)
    src = s.copy()
    src[near] -= 1
    pos = src[:, None] * WORDS_PER_DOC + np.arange(WORDS_PER_DOC)
    wmat = (_mix(pos.ravel()) % np.uint64(VOCAB)).astype(np.int64) \
        .reshape(len(ids), WORDS_PER_DOC)
    if near.any():
        # replace word 7 with a GUARANTEED-different token: the shift
        # 1 + (s mod VOCAB-1) lies in [1, VOCAB-1], so (orig+shift) mod
        # VOCAB != orig — a near-dup is never an accidental exact dup
        wmat[near, 7] = (wmat[near, 7] + 1 + (s[near] % (VOCAB - 1))) % VOCAB
    texts = [" ".join(map(str, row)) for row in wmat]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.large_string()),
    })


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from cuckoofilter_ray.functions.keys import add_content_keys
    from cuckoofilter_ray.stages.dedup import (exact_dedup_ids,
                                               minhash_lsh_pairs)

    docs = rd.range(n_docs, override_num_blocks=NUM_CPUS * 4) \
        .map_batches(make_docs, batch_format="pyarrow").materialize()

    out = {"metric": "dedup pipelines over synthetic docs",
           "unit": "sec", "n_docs": n_docs, "num_cpus": NUM_CPUS}

    # ---- MinHash-LSH near-dup candidates
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, column="text", id_col="doc_id",
                              num_perm=64, bands=16,
                              threshold=0.5).to_pandas()
    mh_s = time.perf_counter() - t0
    got = set(zip(pairs["lo_id"].astype(int), pairs["hi_id"].astype(int)))
    all_ids = np.arange(n_docs, dtype=np.int64)
    is_dup = (all_ids % DUP_EVERY == 0) & (all_ids >= 1000)
    # planted near pairs where both endpoints are original rows (dup-row
    # endpoints surface through the identical-signature star under the
    # min-id representative instead — excluded to keep the count exact)
    planted = {(i - 1, i) for i in range(1, n_docs, NEAR_EVERY)
               if not is_dup[i] and not is_dup[i - 1]}
    recall = len(got & planted) / max(1, len(planted))
    out["minhash"] = {
        "sec": round(mh_s, 2),
        "docs_per_sec": round(n_docs / mh_s),
        "pairs": int(len(pairs)),
        "planted_pairs": len(planted),
        "planted_recall": round(recall, 4),
    }

    # ---- connected components over the candidate pairs
    from cuckoofilter_ray.stages.dedup import neardup_clusters
    pairs_ds = ray.data.from_pandas(pairs[["lo_id", "hi_id"]])
    t0 = time.perf_counter()
    cl = neardup_clusters(pairs_ds, id_col="doc_id").to_pandas()
    cc_s = time.perf_counter() - t0
    n_clusters = int(cl["cluster_id"].nunique())
    out["clusters"] = {
        "sec": round(cc_s, 2),
        "labeled_nodes": int(len(cl)),
        "clusters": n_clusters,
    }

    # ---- exact dedup on sha256(text): narrow (key, id) shuffle
    keyed = docs.map_batches(
        add_content_keys, batch_format="pyarrow",
        fn_kwargs={"column": "text", "sha_col": None,
                   "drop_content": True}).materialize()
    t0 = time.perf_counter()
    survivors = exact_dedup_ids(keyed, key_col="key_hi64",
                                id_col="doc_id").count()
    ex_s = time.perf_counter() - t0
    expected = int(n_docs - int(is_dup.sum()))
    out["exact"] = {
        "sec": round(ex_s, 2),
        "docs_per_sec": round(n_docs / ex_s),
        "survivors": int(survivors),
        "expected_survivors": expected,
        "exact_match": bool(survivors == expected),
    }

    ray.shutdown()
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
