"""End-to-end training-data pipeline: the composed "user switches to this
repo" flow, every stage exact-verified.

    synthesize corpus → language filter → sha256 exact dedup (winners join)
    → MinHash-LSH near-dup removal → benchmark decontamination
    → PII redaction (planted, string-exact) → train/val/test split
    → sequence packing → resumable partitioned Parquet write
    (+ no-op resume check)

Each retention decision has a driver-computable ground truth because the
corpus is a pure function of row ids (sources/corpus.py):

- language filter: lang is a seeded draw per id — recomputed exactly;
- exact dedup: survivors must be exactly the min-id row per content_src
  among language-kept docs;
- near-dup pairs: after exact dedup all survivors have distinct
  content_src, so MinHash pairs can only be word-stream BASE birthday
  collisions — counted exactly from the generator model;
- decontamination: flagged ⇔ content_src ∈ benchmark srcs (base
  collisions counted separately, bounded);
- write: re-read row count equals the model's survivor count, and an
  immediate re-run resumes with zero new partitions.

Usage: python tools/pipeline_e2e.py [n_docs]
Prints one JSON line; artifact convention: BENCH/pipeline_e2e_r5.json.
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
SEED = 42
BENCH_MOD = 1009
OUT = "/tmp/pipeline_e2e_out"

if not ray.is_initialized():
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from cuckoofilter_ray.pipelines.build import derive_keys  # noqa: E402
from cuckoofilter_ray.sources.corpus import (_LANG_CUM, LANGS,  # noqa: E402
                                             _make_contents_vec, _u01,
                                             content_src_of,
                                             make_corpus_batch,
                                             splitmix64_at)
from cuckoofilter_ray.stages.decontaminate import (benchmark_gram_set,  # noqa: E402
                                                   decontaminate)
from cuckoofilter_ray.stages.dedup import (exact_dedup_ids,  # noqa: E402
                                           minhash_lsh_pairs)
from cuckoofilter_ray.stages.relational import hash_join  # noqa: E402
from cuckoofilter_ray.state.checkpoint import (read_manifest,  # noqa: E402
                                               resumable_write_partitioned)


def lang_of(ids: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(_LANG_CUM, _u01(splitmix64_at(ids, SEED + 1)))
    return LANGS[np.minimum(idx, len(LANGS) - 1)]


def gen(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    tbl = make_corpus_batch(ids, seed=SEED)
    return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                     "lang": tbl.column("lang"),
                     "text": tbl.column("content")})


stages, t_all = {}, time.perf_counter()
all_ids = np.arange(N, dtype=np.uint64)
srcs_all = content_src_of(all_ids, SEED)
langs_all = lang_of(all_ids)

# ---- 1. synthesize + language filter (drop markdown docs) ----------------
t0 = time.perf_counter()
corpus = ray.data.range(N, override_num_blocks=128) \
    .map_batches(gen, batch_format="pyarrow", batch_size=None) \
    .filter(expr="lang != 'md'").materialize()
n_kept = corpus.count()
stages["lang_filter"] = {"rows_out": n_kept,
                         "sec": round(time.perf_counter() - t0, 3)}
keep_mask = langs_all != "md"
assert n_kept == int(keep_mask.sum()), "language filter row count"

# ---- 2. sha256 exact dedup: winner ids, then a bucketed join back --------
t0 = time.perf_counter()
keyed = derive_keys(corpus, content_col="text", drop_content=True,
                    sha_col="")
winners = exact_dedup_ids(keyed, key_col="key_hi64", id_col="doc_id")
survivors = hash_join(corpus, winners, "doc_id", "doc_id", num_buckets=32) \
    .rename_columns({"_k": "doc_id"}).materialize()
n_uniq = survivors.count()
stages["exact_dedup"] = {"rows_out": n_uniq,
                         "sec": round(time.perf_counter() - t0, 3)}
# model: min-id per content_src among kept docs
kept_ids = all_ids[keep_mask]
kept_srcs = srcs_all[keep_mask]
order = np.lexsort((kept_ids, kept_srcs))
s_sorted, i_sorted = kept_srcs[order], kept_ids[order]
first = np.ones(len(s_sorted), dtype=bool)
first[1:] = s_sorted[1:] != s_sorted[:-1]
expect_survivors = np.sort(i_sorted[first].astype(np.int64))
assert n_uniq == len(expect_survivors), "dedup survivor count"

# ---- 3. MinHash-LSH near-dup removal (min-id star retained) ---------------
t0 = time.perf_counter()
# threshold 0.8, bands auto-tuned (resolves to 8×8, knee ≈ 0.77): the
# 40-word vocab gives DISTINCT contents a baseline char-5 Jaccard of
# 0.2-0.31 (measured), so a τ≈0.5-tuned banding (16×4) floods the
# buckets with ~J^4·16 ≈ 0.6% of ALL pairs (≈2M spurious candidates at
# 50k docs — measured 512 s) while 8×8 admits J=0.3 pairs at 5e-5 and
# still catches J≈0.95 base-collision near-dups w.p. ≥0.999
pairs = minhash_lsh_pairs(survivors, column="text", id_col="doc_id",
                          num_perm=64, bands=None, threshold=0.8).to_pandas()
drop_ids = np.unique(pairs["hi_id"].to_numpy()) if len(pairs) else \
    np.empty(0, dtype=np.int64)
drop_ref = ray.put(np.sort(drop_ids))


def drop_near(t: pa.Table, ref=drop_ref) -> pa.Table:
    drops = ray.get(ref)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    return t.filter(pa.array(~np.isin(ids, drops)))


deduped = survivors.map_batches(drop_near, batch_format="pyarrow",
                                batch_size=None).materialize()
n_near = deduped.count()
stages["near_dedup"] = {"rows_out": n_near, "pairs": int(len(pairs)),
                        "sec": round(time.perf_counter() - t0, 3)}
# model: distinct content_src everywhere, so pairs can only be word-stream
# base collisions between survivors
surv_srcs = content_src_of(expect_survivors.astype(np.uint64), SEED)
base = ((splitmix64_at(surv_srcs, SEED + 6) & np.uint64(0xFFFFFFFF))
        * np.uint64(131)).astype(np.int64)
bs = np.sort(base)
n_base_coll_pairs = int((bs[1:] == bs[:-1]).sum())
assert len(pairs) <= max(2, n_base_coll_pairs + 2), \
    f"implausible near-dup pairs: {len(pairs)} vs {n_base_coll_pairs} base collisions"
assert n_near == n_uniq - len(drop_ids)

# ---- 4. decontamination: drop docs overlapping the eval subset ------------
t0 = time.perf_counter()
bench_ids = np.arange(0, N, BENCH_MOD, dtype=np.uint64)
bench_srcs = np.unique(content_src_of(bench_ids, SEED))
bh = benchmark_gram_set(_make_contents_vec(
    content_src_of(bench_ids, SEED), SEED).to_pylist(), k=8, seed=SEED)
scored = decontaminate(deduped, bh, k=8, seed=SEED).to_pandas()
flagged_ids = np.sort(scored.loc[scored["flagged"], "doc_id"].to_numpy())
flag_ref = ray.put(flagged_ids)


def drop_flagged(t: pa.Table, ref=flag_ref) -> pa.Table:
    drops = ray.get(ref)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    return t.filter(pa.array(~np.isin(ids, drops)))


clean = deduped.map_batches(drop_flagged, batch_format="pyarrow",
                            batch_size=None).materialize()
n_clean = clean.count()
stages["decontaminate"] = {"rows_out": n_clean,
                           "flagged": int(len(flagged_ids)),
                           "sec": round(time.perf_counter() - t0, 3)}
# model: flagged iff content_src in bench srcs (base collisions bounded)
kept_after_near = np.setdiff1d(expect_survivors, drop_ids)
kan_srcs = content_src_of(kept_after_near.astype(np.uint64), SEED)
expect_flag = np.isin(kan_srcs, bench_srcs)
got_flag = np.isin(kept_after_near, flagged_ids)
mismatch = int((expect_flag != got_flag).sum())
assert mismatch <= max(2, n_base_coll_pairs + 1), \
    f"decon flags diverge from model by {mismatch}"
assert n_clean == n_near - len(flagged_ids)

# ---- 4b. PII redaction (planted, string-exact verified) -------------------
t0 = time.perf_counter()
from cuckoofilter_ray.stages.redact import pii_redact  # noqa: E402

PII_MOD = 17


def plant_pii(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    if not (ids % PII_MOD == 0).any():
        return t
    texts = t.column("text").to_pylist()
    aug = [x + (f" contact u{i}@ex{i % 5}.com" if i % PII_MOD == 0 else "")
           for i, x in zip(ids.tolist(), texts)]
    return t.set_column(t.column_names.index("text"), "text",
                        pa.array(aug, pa.string()))


red = pii_redact(clean.map_batches(plant_pii, batch_format="pyarrow",
                                   batch_size=None)).materialize()
redact_s = time.perf_counter() - t0
rdf = red.to_pandas().sort_values("doc_id").reset_index(drop=True)
rids = rdf["doc_id"].to_numpy()
planted = rids % PII_MOD == 0
assert (rdf["n_email"].to_numpy() == planted.astype(np.int64)).all()
assert (rdf["n_ipv4"].to_numpy() == 0).all()
assert (rdf["n_phone"].to_numpy() == 0).all()
base_texts = _make_contents_vec(content_src_of(rids.astype(np.uint64),
                                               SEED), SEED).to_pylist()
for x, b, p in zip(rdf["text"].tolist(), base_texts, planted.tolist()):
    assert x == (b + " contact <EMAIL>" if p else b), \
        "redacted text diverges from the string model"
stages["pii_redact"] = {"rows_out": int(len(rdf)),
                        "planted": int(planted.sum()),
                        "sec": round(redact_s, 3)}
final = red.drop_columns(["n_email", "n_ipv4", "n_phone"]).materialize()

# ---- 5. train/val/test split + sequence packing ---------------------------
t0 = time.perf_counter()
from cuckoofilter_ray.kernels.hashing import mix_split  # noqa: E402
from cuckoofilter_ray.stages.packing import (_pack_tokens_next_fit,  # noqa: E402
                                             pack_sequences)
from cuckoofilter_ray.stages.sampling import hash_split, threshold_hex  # noqa: E402

BOUNDS = [("train", 0.9), ("val", 0.95), ("test", 1.0)]
split_ds = hash_split(final, BOUNDS, salt="split:",
                      mode="splitmix").materialize()
split_counts = {r["split"]: r["count()"] for r in
                split_ds.groupby("split").count().take_all()}
# model: the engine's splitmix decision is a pure function of (salt, id) —
# recompute it vectorized in the driver and compare bucket-exactly
import hashlib  # noqa: E402

kept_clean = np.setdiff1d(kept_after_near, flagged_ids)
sm = int.from_bytes(hashlib.md5(b"split:").digest()[:8], "little")
u32 = mix_split(kept_clean.astype(np.uint64), sm) >> np.uint64(32)
cut_train = np.uint64(int(threshold_hex(0.9), 16))
cut_val = np.uint64(int(threshold_hex(0.95), 16))
expect_counts = {
    "train": int((u32 < cut_train).sum()),
    "val": int(((u32 >= cut_train) & (u32 < cut_val)).sum()),
    "test": int((u32 >= cut_val).sum()),
}
assert split_counts == expect_counts, (split_counts, expect_counts)

# pack the train split into 1024-token sequences within id-range shards
train = split_ds.filter(expr="split == 'train'")
packed = pack_sequences(train, budget=1024, shard_size=4096,
                        column="text").to_pandas()
assert len(packed) == split_counts["train"], "pack must cover every doc"
n_seqs = 0
for _shard, g in packed.sort_values("doc_id").groupby("shard"):
    toks = g["n_tokens"].to_numpy(np.int64)
    want_bins = _pack_tokens_next_fit(toks, 1024)
    assert g["seq_bin"].to_numpy(np.int64).tolist() == want_bins.tolist(),         "distributed packing diverges from the sequential kernel"
    n_seqs += int(want_bins[-1]) if len(want_bins) else 0
fill = float(packed["n_tokens"].sum()) / max(n_seqs * 1024, 1)
stages["split_pack"] = {"splits": split_counts, "train_seqs": n_seqs,
                        "mean_fill": round(fill, 4),
                        "sec": round(time.perf_counter() - t0, 3)}

# ---- 6. resumable partitioned write + no-op resume ------------------------
t0 = time.perf_counter()
shutil.rmtree(OUT, ignore_errors=True)
man1 = resumable_write_partitioned(final, OUT, "lang")
wrote = time.perf_counter() - t0
stamps1 = {k: v["written_at"] for k, v in man1["partitions"].items()}
t0 = time.perf_counter()
man2 = resumable_write_partitioned(final, OUT, "lang")
resume = time.perf_counter() - t0
stamps2 = {k: v["written_at"] for k, v in man2["partitions"].items()}
from cuckoofilter_ray.state.checkpoint import read_filter_shards  # noqa: E402

back = read_filter_shards(OUT).count()
stages["write"] = {"partitions": len(man1["partitions"]),
                   "rows_out": int(back), "sec": round(wrote, 3),
                   "resume_noop_sec": round(resume, 3)}
assert back == n_clean, "re-read row count"
assert stamps1 == stamps2, "no-op resume must not rewrite any partition"

print(json.dumps({
    "metric": "end-to-end training-data pipeline (filter->dedup->neardup->"
              "decontaminate->redact->split/pack->partitioned write)",
    "value": round(time.perf_counter() - t_all, 3),
    "unit": "sec",
    "n_docs": N,
    "stages": stages,
    "verified": "every retention decision checked against the generator "
                "model (lang draw, min-id per content_src, base-collision "
                "bound, bench-src flags), redacted text string-exact per "
                "row, split buckets recomputed in the "
                "driver, per-shard packing vs the sequential kernel, write "
                "re-read + no-op resume",
    "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
}))
ray.shutdown()
