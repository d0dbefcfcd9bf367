"""Decontamination at scale: N synthetic docs vs a benchmark subset, with
the ENTIRE answer verified exactly.

The corpus generator makes each document's text a pure function of its
``content_src`` id (sources/corpus.py), so the exact expected answer for
every doc is driver-computable without materializing the corpus:
``flagged[d] == (content_src[d] in content_src[benchmark ids])`` with
``n_hit == n_grams`` when flagged and 0 otherwise — except for the
handful of docs whose 32-bit word-stream base birthday-collides with a
benchmark doc's (those can genuinely share body grams across distinct
content ids); they are verified against literal gram-string sets.
The demo streams the corpus through the AMQ-prescreened scorer
(stages/decontaminate.py) and asserts all three output columns match
ground truth for every scored doc, one way or the other.

Usage: python tools/decon_scale.py [n_docs] [bench_modulus]
Prints one JSON line; artifact convention: BENCH/decon_scale_r5.json.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 509
SEED = 42
K = 8

if not ray.is_initialized():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from cuckoofilter_ray.sources.corpus import (_make_contents_vec,  # noqa: E402
                                             content_src_of,
                                             make_corpus_batch)
from cuckoofilter_ray.stages.decontaminate import (benchmark_gram_set,  # noqa: E402
                                                   decontaminate)

t_all = time.perf_counter()

# benchmark side: driver-generated texts (pure function of the ids), small
bench_ids = np.arange(0, N, MOD, dtype=np.uint64)
t0 = time.perf_counter()
bench_texts = _make_contents_vec(
    content_src_of(bench_ids, SEED), SEED).to_pylist()
bh = benchmark_gram_set(bench_texts, k=K, seed=SEED)
bench_s = time.perf_counter() - t0

# corpus streams through generation + scoring; bench rows are excluded
def gen(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    ids = ids[ids % MOD != 0]
    tbl = make_corpus_batch(ids, seed=SEED)
    return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                     "text": tbl.column("content")})

docs = ray.data.range(N, override_num_blocks=256) \
    .map_batches(gen, batch_format="pyarrow", batch_size=None)
t0 = time.perf_counter()
out = decontaminate(docs, bh, k=K, seed=SEED, concurrency=None) \
    .to_pandas().sort_values("doc_id").reset_index(drop=True)
score_s = time.perf_counter() - t0

# exact full-answer verification.  Ground truth comes in two tiers:
# a doc sharing a benchmark doc's content_src hits every gram; a doc whose
# 32-bit word-stream BASE (corpus.py:_make_contents_vec) lands within ±59
# of a benchmark doc's base can genuinely share body grams without sharing
# content_src (birthday collisions: ~4 expected at 2 M ids) — those few
# docs are verified against literal gram-STRING sets instead of the model.
from cuckoofilter_ray.sources.corpus import splitmix64_at  # noqa: E402

ids = out["doc_id"].to_numpy().astype(np.uint64)
assert len(ids) == N - len(bench_ids)
srcs = content_src_of(ids, SEED)
bench_srcs = np.unique(content_src_of(bench_ids, SEED))
src_match = np.isin(srcs, bench_srcs)


def base_of(s: np.ndarray) -> np.ndarray:
    return (splitmix64_at(s, SEED + 6) & np.uint64(0xFFFFFFFF)) \
        * np.uint64(131)


bb = np.sort(base_of(bench_srcs)).astype(np.int64)   # < 2^39: int64-safe
db = base_of(srcs).astype(np.int64)
near = np.searchsorted(bb, db - 59) != np.searchsorted(bb, db + 60)
odd = near & ~src_match                 # base-colliding, not src-matched

flagged = out["flagged"].to_numpy()
n_hit = out["n_hit"].to_numpy()
n_grams = out["n_grams"].to_numpy()
ok = ~odd
assert (flagged[ok] == src_match[ok]).all(), "flag mismatch vs ground truth"
hit_all = src_match & ok
assert (n_hit[hit_all] == n_grams[hit_all]).all(), \
    "contaminated docs must hit every gram"
assert (n_hit[ok & ~src_match] == 0).all(), "clean docs must hit zero grams"
assert (n_grams > 0).all()

n_odd = int(odd.sum())
if n_odd:                    # literal string-set check for the collisions
    assert n_odd < 200, f"implausible collision count {n_odd}"
    bset = set(g for t in bench_texts
               for w in [t.split(" ")]
               for g in (" ".join(w[i:i + K]) for i in range(len(w) - K + 1)))
    odd_rows = np.flatnonzero(odd)
    odd_texts = _make_contents_vec(srcs[odd_rows], SEED).to_pylist()
    for row, text in zip(odd_rows.tolist(), odd_texts):
        w = text.split(" ")
        grams = set(" ".join(w[i:i + K]) for i in range(len(w) - K + 1))
        hits = len(grams & bset)
        assert n_grams[row] == len(grams) and n_hit[row] == hits \
            and flagged[row] == (2 * hits >= len(grams)), \
            f"string-set mismatch on colliding doc {ids[row]}"

result = {
    "metric": "decontamination scale demo (AMQ prescreen + exact confirm)",
    "value": round(score_s, 4),
    "unit": "sec",
    "n_docs": int(len(ids)),
    "n_bench_docs": int(len(bench_ids)),
    "n_bench_grams": int(len(bh)),
    "docs_per_s": round(len(ids) / score_s / 1e6, 3),
    "grams_scored": int(n_grams.sum()),
    "grams_per_s_m": round(n_grams.sum() / score_s / 1e6, 1),
    "flagged": int(flagged.sum()),
    "base_collision_docs": n_odd,
    "verified": "flagged/n_hit/n_grams exact for every scored doc "
                "(content_src model; literal gram-string sets for the "
                "base-colliding few)",
    "bench_prep_s": round(bench_s, 4),
    "total_s": round(time.perf_counter() - t_all, 4),
    "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
}
print(json.dumps(result))
ray.shutdown()
