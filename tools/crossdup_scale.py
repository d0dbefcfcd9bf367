"""Cross-document duplicated-gram detection at scale, exactly verified.

N synthetic docs stream through ``duplicated_gram_stats``
(stages/decontaminate.py): per-batch distinct (gram-hash, count) partials,
ONE narrow groupby to find grams living in >= 2 docs, then the corpus
re-scans against the broadcast dup set.  The corpus generator makes text a
pure function of ``content_src`` (sources/corpus.py), so the expected
answer is driver-computable for every doc:

- a doc whose content_src occurs >= 2 times is fully duplicated
  (``n_dup == n_grams``);
- docs whose 32-bit word-stream bases land within ±59 of another doc's
  can genuinely share body grams without sharing content_src (window
  overlap); those are verified against literal gram-string sets;
- everything else must report ``n_dup == 0``.

Usage: python tools/crossdup_scale.py [n_docs]
Prints one JSON line; artifact convention: BENCH/crossdup_scale_r5.json.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
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
                                             make_corpus_batch,
                                             splitmix64_at)
from cuckoofilter_ray.stages.decontaminate import duplicated_gram_stats  # noqa: E402

t_all = time.perf_counter()


def gen(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    tbl = make_corpus_batch(ids, seed=SEED)
    return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                     "text": tbl.column("content")})


# materialize once: both operators are two-pass (dup-set build + probe),
# so a lazy corpus would re-run synthesis 4x (for a parquet-backed corpus
# the re-execution is just a re-read and streaming is the right call)
docs = ray.data.range(N, override_num_blocks=256) \
    .map_batches(gen, batch_format="pyarrow", batch_size=None) \
    .materialize()
t0 = time.perf_counter()
out = duplicated_gram_stats(docs, k=K, seed=SEED) \
    .to_pandas().sort_values("doc_id").reset_index(drop=True)
score_s = time.perf_counter() - t0
assert len(out) == N

# ---- exact verification against the generator model ------------------------
ids = out["doc_id"].to_numpy().astype(np.uint64)
srcs = content_src_of(ids, SEED)
uniq_src, src_n = np.unique(srcs, return_counts=True)
dup_srcs = uniq_src[src_n >= 2]
expect_full = np.isin(srcs, dup_srcs)


def base_of(s: np.ndarray) -> np.ndarray:
    return ((splitmix64_at(s, SEED + 6) & np.uint64(0xFFFFFFFF))
            * np.uint64(131)).astype(np.int64)


db = base_of(srcs)
order = np.argsort(db, kind="stable")
sb = db[order]
# near = another doc (different row) has a base within ±59
lo = np.searchsorted(sb, db - 59)
hi = np.searchsorted(sb, db + 60)
near = (hi - lo) >= 2                    # the window always contains self
odd = near & ~expect_full

n_grams = out["n_grams"].to_numpy()
n_dup = out["n_dup"].to_numpy()
ok = ~odd
assert (n_grams > 0).all()
full = expect_full & ok
assert (n_dup[full] == n_grams[full]).all(), \
    "src-duplicated docs must have every gram duplicated"
assert (n_dup[ok & ~expect_full] == 0).all(), \
    "unique-content docs must report zero duplicated grams"

n_odd = int(odd.sum())
assert n_odd < 50_000, f"implausible window-collision count {n_odd}"
if n_odd:
    def gram_set(text: str) -> set:
        w = text.split(" ")
        return set(" ".join(w[i:i + K]) for i in range(len(w) - K + 1))

    odd_rows = np.flatnonzero(odd)
    odd_texts = _make_contents_vec(srcs[odd_rows], SEED).to_pylist()
    for row, text in zip(odd_rows.tolist(), odd_texts):
        own = gram_set(text)
        # partners: every doc whose base sits in this doc's ±59 window
        prows = order[np.searchsorted(sb, db[row] - 59):
                      np.searchsorted(sb, db[row] + 60)]
        psrcs = np.unique(srcs[prows[prows != row]])
        shared = set()
        for ptext in _make_contents_vec(psrcs, SEED).to_pylist():
            shared |= (own & gram_set(ptext))
        assert n_dup[row] == len(shared) and n_grams[row] == len(own), \
            f"string-set mismatch on window-colliding doc {ids[row]}"

# spot-exactness of n_grams on a deterministic sample of clean docs
sample = np.arange(0, N, max(1, N // 1000), dtype=np.int64)
for row, text in zip(sample.tolist(),
                     _make_contents_vec(srcs[sample], SEED).to_pylist()):
    w = text.split(" ")
    assert n_grams[row] == len(
        set(" ".join(w[i:i + K]) for i in range(len(w) - K + 1)))

# ---- ExactSubstr removal leg: same corpus, exact per-category verify -------
from cuckoofilter_ray.stages.decontaminate import exactsubstr_dedup  # noqa: E402

t0 = time.perf_counter()
clean = exactsubstr_dedup(docs, k=K, seed=SEED) \
    .to_pandas().sort_values("doc_id").reset_index(drop=True)
removal_s = time.perf_counter() - t0
assert len(clean) == N
n_removed = clean["n_removed"].to_numpy()
n_words = clean["n_words"].to_numpy()
tc = clean["text_clean"]
# fully-duplicated docs: every gram is duplicated => every word covered
assert (n_removed[full] == n_words[full]).all()
assert (tc[full] == "").all()
# unique-content, no window overlap: nothing removed; sample text equality
clean_rows = np.flatnonzero(ok & ~expect_full)
assert (n_removed[clean_rows] == 0).all()
csample = clean_rows[::max(1, len(clean_rows) // 1000)]
ctexts = _make_contents_vec(srcs[csample], SEED).to_pylist()
assert (tc.iloc[csample].to_numpy() == np.array(ctexts, dtype=object)).all()
# window-collision docs: literal Python reference removal, string-exact
if n_odd:
    odd_rows = np.flatnonzero(odd)
    odd_texts = _make_contents_vec(srcs[odd_rows], SEED).to_pylist()
    for row, text in zip(odd_rows.tolist(), odd_texts):
        w = text.split(" ")
        own = set(" ".join(w[i:i + K]) for i in range(len(w) - K + 1))
        prows = order[np.searchsorted(sb, db[row] - 59):
                      np.searchsorted(sb, db[row] + 60)]
        psrcs = np.unique(srcs[prows[prows != row]])
        shared = set()
        for ptext in _make_contents_vec(psrcs, SEED).to_pylist():
            pw = ptext.split(" ")
            shared |= (own & set(" ".join(pw[i:i + K])
                                 for i in range(len(pw) - K + 1)))
        cov = np.zeros(len(w), dtype=bool)
        for i in range(len(w) - K + 1):
            if " ".join(w[i:i + K]) in shared:
                cov[i:i + K] = True
        want = " ".join(x for x, c in zip(w, cov) if not c)
        assert tc.iloc[row] == want, \
            f"removal mismatch on window-colliding doc {ids[row]}"

result = {
    "metric": "cross-document duplicated-gram scale demo "
              "(narrow groupby + self-decontamination probe)",
    "value": round(score_s, 4),
    "unit": "sec",
    "n_docs": N,
    "docs_per_s": int(round(N / score_s)),
    "grams_scored": int(n_grams.sum()),
    "grams_per_s_m": round(n_grams.sum() / score_s / 1e6, 1),
    "fully_duplicated_docs": int(expect_full.sum()),
    "window_collision_docs": n_odd,
    "dup_gram_rows": int((n_dup > 0).sum()),
    "exactsubstr_removal_s": round(removal_s, 4),
    "removal_docs_per_s": int(round(N / removal_s)),
    "words_removed": int(n_removed.sum()),
    "docs_emptied": int((tc == "").sum()),
    "verified": "n_dup/n_grams exact for every doc (content_src model; "
                "literal gram-string sets for base-window collisions; "
                "n_grams spot-verified on a 1/1000 sample); removal leg: "
                "duplicated docs empty, clean docs byte-identical (1/1000 "
                "sample), collision docs string-exact vs reference removal",
    "total_s": round(time.perf_counter() - t_all, 4),
    "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
}
print(json.dumps(result))
ray.shutdown()
