"""End-to-end Ray pipeline tests (SURVEY.md §5 engine test plan).

Covers the distributed paths the kernel tests can't: partitioned builds,
stacked-shard probes, the fused sweep kernel, combine-vs-UDAF build parity,
salted skew builds, checkpoint/resume, and dedup stages — all at sf0.001
scale on the shared 4-cpu Ray session.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from conftest import SF_DIR

from cuckoofilter_ray.kernels import deserialize, serialize
from cuckoofilter_ray.kernels.hashing import splitmix64
from cuckoofilter_ray.pipelines.build import (SKETCH_COL, build_grouped_filters,
                                              build_grouped_filters_salted,
                                              build_partitioned_filter,
                                              derive_keys, shard_for_keys)
from cuckoofilter_ray.stages.aggregate import FilterSketch
from cuckoofilter_ray.stages.membership import (FilterProbe,
                                                PartitionedFilterProbe,
                                                filters_to_ref)
from cuckoofilter_ray.stages.sweep import run_sweep

SEED = 0xC0FFEE


def _keys_ds(ray, keys):
    import ray.data
    return ray.data.from_arrow(pa.table({"key_hi64": pa.array(keys, pa.uint64())})) \
        .repartition(4)


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray
    return ray


def test_partitioned_build_probe_consistency(ray_mod):
    ray = ray_mod
    keys = splitmix64(20_000, seed=11)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8, capacity_per_shard=4096,
                                       seed=SEED)
    rows = filters.take_all()
    assert sorted(r["_shard"] for r in rows) == list(range(8))
    assert sum(r["num_items"] for r in rows) == len(keys)
    fref = filters_to_ref(rows, group_col="_shard")
    view = PartitionedFilterProbe(fref)
    # stacked-view answers == per-shard kernel answers, and recall == 1
    probes = np.concatenate([keys, splitmix64(20_000, seed=99)])
    got = view.contain_batch(probes)
    assert got[:len(keys)].all(), "false negative in partitioned probe"
    shard = shard_for_keys(probes, 8)
    per_shard = {r["_shard"]: deserialize(r[SKETCH_COL]) for r in rows}
    expect = np.zeros(len(probes), dtype=bool)
    for s in range(8):
        m = shard == s
        expect[m] = per_shard[s].contain_batch(probes[m])
    assert (got == expect).all()


def test_sweep_kernel_invariants(ray_mod):
    ray = ray_mod
    keys = splitmix64(20_000, seed=13)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8, capacity_per_shard=4096,
                                       seed=SEED)
    fref = filters_to_ref(filters.take_all(), group_col="_shard")
    iref = ray.put(keys)
    m1 = run_sweep(iref, fref, 200_000, seed=7, num_shards=8, num_blocks=4)
    m2 = run_sweep(iref, fref, 200_000, seed=7, num_shards=8, num_blocks=8)
    assert m1["n_probes"] == 200_000
    assert m1["recall"] == 1.0
    for p, d in m1["per_p"].items():
        assert d["recall"] == 1.0, f"false negatives at p={p}"
    assert m1["fpr"] <= 2 * 4 / (1 << 12)
    # deterministic: same seed → same counts regardless of block split
    assert m1 == m2


def test_combine_build_matches_udaf_aggregate(ray_mod):
    ray = ray_mod
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    keyed = derive_keys(docs, content_col="text")
    combine = {r["lang"]: r for r in build_grouped_filters(
        keyed, "lang", capacity=4096, seed=SEED).take_all()}
    agg = keyed.groupby("lang").aggregate(
        FilterSketch(on="key_hi64", kind="cuckoo", capacity=4096, seed=SEED,
                     alias_name=SKETCH_COL))
    udaf = {r["lang"]: r for r in agg.take_all()}
    assert set(combine) == set(udaf)
    probes = splitmix64(50_000, seed=5)
    rows = keyed.select_columns(["lang", "key_hi64"]).take_all()
    for lang in combine:
        fa = deserialize(combine[lang][SKETCH_COL])
        fb = deserialize(udaf[lang][SKETCH_COL])
        assert fa.num_items == fb.num_items
        ins = np.array([x["key_hi64"] for x in rows if x["lang"] == lang],
                       dtype=np.uint64)
        assert fa.contain_batch(ins).all() and fb.contain_batch(ins).all()
        # same config ⇒ same FPR regime; answers agree on ≥99.9% of a random
        # probe stream (slot placement may differ, so tiny FP divergence is ok)
        agree = (fa.contain_batch(probes) == fb.contain_batch(probes)).mean()
        assert agree > 0.999


def test_salted_build_equivalence(ray_mod):
    ray = ray_mod
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    keyed = derive_keys(docs, content_col="text")
    plain = {r["lang"]: r for r in build_grouped_filters(
        keyed, "lang", capacity=4096, seed=SEED).take_all()}
    salted = {r["lang"]: r for r in build_grouped_filters_salted(
        keyed, "lang", capacity=4096, seed=SEED, num_salts=4).take_all()}
    assert set(plain) == set(salted)
    rows = keyed.select_columns(["lang", "key_hi64"]).take_all()
    for lang in plain:
        ins = np.array([x["key_hi64"] for x in rows if x["lang"] == lang],
                       dtype=np.uint64)
        fs = deserialize(salted[lang][SKETCH_COL])
        assert fs.num_items == plain[lang]["num_items"]
        assert fs.contain_batch(ins).all()


def test_checkpoint_resume(ray_mod, tmp_path):
    ray = ray_mod
    from cuckoofilter_ray.state.checkpoint import (missing_groups,
                                                   read_filter_shards,
                                                   resumable_build)
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    keyed = derive_keys(docs, content_col="text").materialize()
    root = str(tmp_path / "ckpt")

    def build_fn(sub, gk):
        return build_grouped_filters(sub, gk, capacity=4096, seed=SEED)

    cfg = {"kind": "cuckoo", "capacity": 4096, "seed": SEED}
    first = resumable_build(keyed, root, "lang", build_fn, config=cfg)
    langs = sorted(r["lang"] for r in first.take_all())
    assert missing_groups(root, langs, group_col="group_key") == []
    # resume: nothing left to build; shard set identical
    again = resumable_build(keyed, root, "lang", build_fn, config=cfg)
    a = {r["group_key"]: r["num_items"] for r in first.take_all()}
    b = {r["group_key"]: r["num_items"] for r in again.take_all()}
    assert a == b
    # round-trip: filters read back answer identically (example/test1.cc:63-72)
    rows = keyed.select_columns(["lang", "key_hi64"]).take_all()
    for r in read_filter_shards(root).take_all():
        filt = deserialize(r[SKETCH_COL])
        ins = np.array([x["key_hi64"] for x in rows
                        if x["lang"] == r["group_key"]], dtype=np.uint64)
        assert filt.contain_batch(ins).all()
    # config mismatch fails loudly
    with pytest.raises(ValueError, match="config mismatch"):
        resumable_build(keyed, root, "lang", build_fn,
                        config={**cfg, "seed": 1})


def test_exact_dedup_ids_matches_pandas(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import exact_dedup_ids
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    keyed = derive_keys(docs, content_col="text")
    got = sorted(r["doc_id"] for r in exact_dedup_ids(
        keyed, key_col="sha_hex", id_col="doc_id").take_all())
    pdf = keyed.select_columns(["sha_hex", "doc_id"]).to_pandas()
    want = sorted(pdf.groupby("sha_hex")["doc_id"].min())
    assert got == want


def test_minhash_finds_planted_neardup(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import minhash_lsh_pairs
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(500)]
    base = " ".join(rng.choice(vocab, 120))
    near = base.replace("tok", "tok", 1) + " extraword"      # ~identical
    far = " ".join(rng.choice(vocab, 120))
    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array([base, near, far] +
                         [" ".join(rng.choice(vocab, 120)) for _ in range(37)]),
    })
    ds = ray.data.from_arrow(docs)
    pairs = minhash_lsh_pairs(ds, column="text", id_col="doc_id",
                              num_perm=64, bands=16, threshold=0.5,
                              num_blocks=4).take_all()
    assert any(p["lo_id"] == 0 and p["hi_id"] == 1 for p in pairs), \
        f"planted near-dup not found in {pairs}"
    # determinism
    pairs2 = minhash_lsh_pairs(ds, column="text", id_col="doc_id",
                               num_perm=64, bands=16, threshold=0.5,
                               num_blocks=4).take_all()
    key = lambda p: (p["lo_id"], p["hi_id"])
    assert sorted(map(key, pairs)) == sorted(map(key, pairs2))


def test_simhash_planted_pair(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import simhash_pairs
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(300)]
    base_toks = list(rng.choice(vocab, 150))
    near = " ".join(base_toks[:-1] + ["w0"])
    docs = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array([" ".join(base_toks), near] +
                         [" ".join(rng.choice(vocab, 150)) for _ in range(18)]),
    })
    pairs = simhash_pairs(ray.data.from_arrow(docs), column="text",
                          id_col="doc_id", max_hamming=3,
                          num_blocks=4).take_all()
    assert any(p["lo_id"] == 0 and p["hi_id"] == 1 for p in pairs)


def test_corpus_per_repo_build(ray_mod):
    """North-star input shape: (repo, path, commit, lang, content) corpus →
    sha256 keys (content dropped before the shuffle) → salted per-repo
    filters → zero false negatives; per-row sha equality vs hashlib."""
    import hashlib
    ray = ray_mod
    from cuckoofilter_ray.sources.corpus import corpus_dataset
    ds = corpus_dataset(3000, seed=42, override_num_blocks=4)
    sample = ds.take(8)
    keyed = derive_keys(ds, content_col="content", drop_content=True)
    krows = keyed.select_columns(["repo", "path", "sha_hex", "key_hi64"]).take_all()
    by_path = {(r["repo"], r["path"]): r for r in krows}
    for s in sample:
        k = by_path[(s["repo"], s["path"])]
        assert k["sha_hex"] == hashlib.sha256(s["content"].encode()).hexdigest()
    assert "content" not in keyed.schema().names
    filters = build_grouped_filters_salted(keyed, "repo", capacity=4096,
                                           seed=SEED, num_salts=4)
    rows = filters.take_all()
    assert sum(r["num_items"] for r in rows) == 3000
    assert sum(r["overflow"] for r in rows) == 0
    big = max(rows, key=lambda r: r["num_items"])
    filt = deserialize(big[SKETCH_COL])
    ins = np.array([r["key_hi64"] for r in krows if r["repo"] == big["repo"]],
                   dtype=np.uint64)
    assert filt.contain_batch(ins).all()


def test_embedding_neardup_lsh_blocked(ray_mod):
    """LSH-blocked embedding near-dup ⊇ high-threshold exact pairs."""
    ray = ray_mod
    from cuckoofilter_ray.stages.similarity import (embedding_neardup_exact,
                                                    embedding_neardup_pairs)
    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["lo_id"], r["hi_id"])
             for r in embedding_neardup_exact(emb, threshold=0.9).take_all()}
    blocked = {(r["lo_id"], r["hi_id"])
               for r in embedding_neardup_pairs(emb, threshold=0.9).take_all()}
    # LSH blocking is approximate but must find most very-close pairs
    if exact:
        assert len(blocked & exact) >= len(exact) * 0.5
    for pair in blocked:
        assert pair[0] < pair[1]


def test_embedding_neardup_mass_duplicate_bucket(ray_mod):
    """Planted mass-duplicate: 10k byte-identical embeddings land in ONE LSH
    bucket and must produce a linear star (g-1 pairs on the min-id rep), not
    the O(g²) all-pairs triangle (VERDICT r3 #1)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.similarity import embedding_neardup_pairs
    g = 10_000
    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    dup = np.tile(base, (g, 1))
    far = rng.normal(size=(5, 8)) * 10  # distinct fillers, low mutual cosine
    mat = np.vstack([dup, far])
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(len(mat))],
        override_num_blocks=8)
    pairs = embedding_neardup_pairs(ds, threshold=0.95, bits=8).take_all()
    star = [p for p in pairs if p["lo_id"] == 0 and p["hi_id"] < g]
    assert len(star) == g - 1                       # exactly one star
    assert all(p["cosine"] == 1.0 for p in star)
    assert len(pairs) < g + 50                      # linear, not quadratic


def test_embedding_neardup_bucket_cap(ray_mod):
    """max_bucket_reps bounds the exact-compare set: 100 near-identical but
    DISTINCT vectors in one bucket, cap 16 → at most C(16,2) pairs."""
    ray = ray_mod
    from cuckoofilter_ray.stages.similarity import embedding_neardup_pairs
    rng = np.random.default_rng(12)
    base = rng.normal(size=8)
    mat = base[None, :] + rng.normal(size=(100, 8)) * 1e-6
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(100)],
        override_num_blocks=4)
    pairs = embedding_neardup_pairs(ds, threshold=0.95, bits=8,
                                    max_bucket_reps=16).take_all()
    assert 0 < len(pairs) <= 16 * 15 // 2


def test_multimodal_stub_pipeline(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.multimodal import (FrameSampler, decode_images,
                                                    media_dataset_from_corpus)
    media = media_dataset_from_corpus(300, seed=7)
    images = media.filter(lambda r: r["kind"] == "image")
    feats = decode_images(images, concurrency=1).take_all()
    assert all(0 <= r["feat_r"] <= 255 for r in feats)
    assert feats and "payload" not in feats[0]
    vids = media.filter(lambda r: r["kind"] == "video")
    frames = vids.map_batches(FrameSampler, batch_format="pyarrow",
                              concurrency=1,
                              fn_constructor_kwargs={"n_frames": 3}).take_all()
    assert len(frames) == 3 * vids.count()


def test_distributed_delete_partitioned(ray_mod):
    """Shard-routed Delete: survivors keep zero false negatives and the
    updated shard set composes like any filter Dataset."""
    ray = ray_mod
    from cuckoofilter_ray.pipelines.membership import delete_keys_partitioned
    keys = splitmix64(20_000, seed=31)
    ds = _keys_ds(ray, keys)
    rows = build_partitioned_filter(ds, num_shards=8, capacity_per_shard=4096,
                                    seed=SEED).take_all()
    dele = ray.data.from_arrow(pa.table({
        "key_hi64": pa.array(keys[:10_000], pa.uint64())})).repartition(4)
    updated = delete_keys_partitioned(rows, dele, num_shards=8).take_all()
    assert sum(r["n_deleted"] for r in updated) == 10_000
    assert sum(r["num_items"] for r in updated) == 10_000
    fref = filters_to_ref(updated, group_col="_shard")
    view = PartitionedFilterProbe(fref, shard_col=None)
    assert view.contain_batch(keys[10_000:]).all(), \
        "survivor lost after distributed delete"


def test_filter_delete_stage(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.membership import FilterDelete
    from cuckoofilter_ray.kernels import CuckooFilter, filter_to_row
    keys = splitmix64(5000, seed=21)
    filt = CuckooFilter.create(8192, seed=SEED)
    filt.add_batch(keys)
    fref = ray.put({"": filter_to_row(filt)})
    wl = ray.data.from_arrow(pa.table({
        "key_hi64": pa.array(keys[:2500], pa.uint64())}))
    out = wl.map_batches(FilterDelete, batch_format="pyarrow", concurrency=1,
                         batch_size=None,
                         fn_constructor_kwargs={"filters_ref": fref}).take_all()
    assert all(r["deleted"] for r in out)


def test_neardup_clusters_label_propagation(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import neardup_clusters
    pairs = ray.data.from_arrow(pa.table({
        "lo_id": pa.array([1, 2, 5, 9, 10], pa.int64()),
        "hi_id": pa.array([2, 3, 6, 10, 11], pa.int64()),
    }))
    out = {r["doc_id"]: r["cluster_id"]
           for r in neardup_clusters(pairs).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9, 10: 9, 11: 9}


def test_exact_dedup_filter_incremental(ray_mod):
    """AMQ-prescreened incremental dedup: prior-corpus rows dropped, new rows
    deduped among themselves, FPs rescued by the exact verify."""
    ray = ray_mod
    from cuckoofilter_ray.kernels import CuckooFilter, filter_to_row
    from cuckoofilter_ray.stages.dedup import exact_dedup_filter
    prior_keys = splitmix64(4000, seed=71)
    new_keys = splitmix64(3000, seed=72)
    filt = CuckooFilter.create(8192, seed=SEED)
    filt.add_batch(prior_keys)
    fref = ray.put(filter_to_row(filt))
    eref = ray.put(np.sort(prior_keys))
    # incoming: all prior keys + new keys, each new key appearing twice
    incoming_keys = np.concatenate([prior_keys, new_keys, new_keys])
    ids = np.arange(len(incoming_keys), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "key_hi64": pa.array(incoming_keys, pa.uint64()),
        "doc_id": pa.array(ids, pa.int64())})).repartition(4)
    got = sorted(r["doc_id"] for r in exact_dedup_filter(
        ds, fref, exact_ref=eref).take_all())
    # expected: first occurrence of each new key = ids 4000..6999
    assert got == list(range(4000, 7000))


def test_jaccard_verify_joined_matches_broadcast(ray_mod):
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import (minhash_lsh_pairs,
                                               ngram_jaccard_verify,
                                               ngram_jaccard_verify_joined)
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, column="text", id_col="doc_id",
                              num_perm=64, bands=16, threshold=0.4,
                              num_blocks=4).materialize()
    id_text = {r["doc_id"]: r["text"]
               for r in docs.select_columns(["doc_id", "text"]).take_all()}
    a = {(r["lo_id"], r["hi_id"]): round(r["jaccard"], 9)
         for r in ngram_jaccard_verify(pairs, ray.put(id_text),
                                       threshold=0.4).take_all()}
    b = {(r["lo_id"], r["hi_id"]): round(r["jaccard"], 9)
         for r in ngram_jaccard_verify_joined(pairs, docs,
                                              threshold=0.4).take_all()}
    assert a == b and len(a) > 0


def test_int_key_shard_routing_uniform(ray_mod):
    """Regression: raw integer ids (empty high bits) must still spread across
    every shard of a partitioned filter — add_int_keys mixes the id."""
    ray = ray_mod
    from cuckoofilter_ray.functions.keys import add_int_keys
    ids = pa.table({"id": pa.array(np.arange(1, 8001, dtype=np.int64))})
    keyed = ray.data.from_arrow(ids).map_batches(
        add_int_keys, batch_format="pyarrow", fn_kwargs={"column": "id"})
    rows = build_partitioned_filter(keyed, num_shards=8,
                                    capacity_per_shard=4096,
                                    seed=SEED).take_all()
    per_shard = {r["_shard"]: r["num_items"] for r in rows}
    assert len(per_shard) == 8
    assert sum(per_shard.values()) == 8000
    assert min(per_shard.values()) > 8000 / 8 * 0.7   # roughly uniform


def test_grouped_sketches_combine_path(ray_mod):
    """Map-side-combine sketch builds match direct kernel results per group."""
    ray = ray_mod
    from cuckoofilter_ray.stages.aggregate import (_sketch_from_bytes,
                                                   build_grouped_sketches,
                                                   make_sketch)
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    keyed = derive_keys(docs, content_col="text")
    rows = keyed.select_columns(["lang", "key_hi64"]).take_all()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["key_hi64"])
    for kind, params in [("hll", {"p": 12, "seed": 5}),
                         ("countmin", {"width": 1024, "seed": 5})]:
        out = {r["lang"]: r["sketch"] for r in build_grouped_sketches(
            keyed, "lang", "key_hi64", kind, params).take_all()}
        assert set(out) == set(by_lang)
        for lang, ks in by_lang.items():
            direct = make_sketch(kind, params)
            direct.add_batch(np.array(ks, dtype=np.uint64))
            got = _sketch_from_bytes(kind, out[lang], params)
            if kind == "hll":
                assert (got.registers == direct.registers).all()
            else:
                assert (got.counts == direct.counts).all()
                assert got.total == direct.total


def test_resumable_write_partitioned(ray_mod, tmp_path):
    ray = ray_mod
    import os
    import pyarrow.parquet as pq2
    from cuckoofilter_ray.state.checkpoint import (read_manifest,
                                                   resumable_write_partitioned)
    root = str(tmp_path / "out")
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en", "de", "en", "fr", "de", "en"]),
        "v": pa.array(list(range(6)), pa.int64())})).repartition(3)
    m1 = resumable_write_partitioned(ds, root, "lang")
    assert sorted(m1["partitions"]) == ["lang=de", "lang=en", "lang=fr"]
    # corrupt one partition's data, then resume: completed partitions are
    # SKIPPED (file untouched), so the marker survives
    marker = os.path.join(root, "lang=en", "part-0.parquet")
    before = os.path.getmtime(marker)
    m2 = resumable_write_partitioned(ds, root, "lang")
    assert os.path.getmtime(marker) == before
    assert sorted(m2["partitions"]) == sorted(m1["partitions"])
    total = sum(pq2.read_table(os.path.join(root, p, "part-0.parquet")).num_rows
                for p in m1["partitions"])
    assert total == 6


def test_partitioned_filter_checkpoint_roundtrip(ray_mod, tmp_path):
    """Partitioned shard rows persist through the checkpoint layer and answer
    identically after a fresh read (example/test1.cc round-trip, sharded)."""
    ray = ray_mod
    from cuckoofilter_ray.state.checkpoint import (read_filter_shards,
                                                   write_filter_shards)
    keys = splitmix64(15_000, seed=91)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8,
                                       capacity_per_shard=4096, seed=SEED)
    root = str(tmp_path / "shards")
    write_filter_shards(filters, root, group_col="_shard",
                        config={"seed": SEED, "shards": 8})
    back = read_filter_shards(root).take_all()
    assert len(back) == 8
    fref = filters_to_ref(back, group_col="_shard")
    view = PartitionedFilterProbe(fref)
    assert view.contain_batch(keys).all()
    probes = splitmix64(100_000, seed=92)
    orig = PartitionedFilterProbe(
        filters_to_ref(filters.take_all(), group_col="_shard"))
    assert (view.contain_batch(probes) == orig.contain_batch(probes)).all()


def test_cli_sweep_subprocess():
    """CLI contract smoke (own Ray session, so a subprocess)."""
    import subprocess, sys, os
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-m", "cuckoofilter_ray", "--num-cpus", "4",
         "sweep", "50000", "cuckoo12"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("cuckoo")]
    assert len(lines) == 1 and "cuckoo" in lines[0]


def test_sweep_kernel_stable_variant(ray_mod):
    """Fused sweep over a cuckoo-STABLE partitioned filter (Lemire indexing,
    odd-r involution): recall must stay 1.0 at every p."""
    ray = ray_mod
    keys = splitmix64(20_000, seed=14)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8,
                                       capacity_per_shard=4096,
                                       kind="cuckoo-stable", seed=SEED)
    rows = filters.take_all()
    assert sum(r["num_items"] for r in rows) == len(keys)
    fref = filters_to_ref(rows, group_col="_shard")
    iref = ray.put(keys)
    m = run_sweep(iref, fref, 200_000, seed=8, num_shards=8, num_blocks=4)
    assert m["recall"] == 1.0
    for p, d in m["per_p"].items():
        assert d["recall"] == 1.0, f"stable sweep false negatives at p={p}"
    assert m["fpr"] <= 1.25 * 2 * 4 / (1 << 12)
    m2 = run_sweep(iref, fref, 200_000, seed=8, num_shards=8, num_blocks=8)
    assert m == m2


def test_partitioned_xor_probe(ray_mod):
    """Stacked xor probe == per-shard kernel answers, zero false negatives."""
    ray = ray_mod
    from cuckoofilter_ray.stages.membership import PartitionedXorProbe
    keys = splitmix64(20_000, seed=15)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8,
                                       capacity_per_shard=4096,
                                       kind="xor", bits_per_tag=8, seed=SEED)
    rows = filters.take_all()
    assert sum(r["num_items"] for r in rows) == len(keys)
    fref = filters_to_ref(rows, group_col="_shard")
    view = PartitionedXorProbe(fref)
    probes = np.concatenate([keys, splitmix64(50_000, seed=16)])
    got = view.contain_batch(probes)
    assert got[:len(keys)].all(), "xor partitioned probe false negative"
    shard = shard_for_keys(probes, 8)
    per_shard = {r["_shard"]: deserialize(r[SKETCH_COL]) for r in rows}
    expect = np.zeros(len(probes), dtype=bool)
    for s in range(8):
        m = shard == s
        expect[m] = per_shard[s].contain_batch(probes[m])
    assert (got == expect).all()
    # fpr in the 2^-8 regime
    assert got[len(keys):].mean() <= 2 / 256


def test_stacked_broadcast_probe_equivalence(ray_mod):
    """Zero-copy stacked broadcast answers == row-dict broadcast answers."""
    ray = ray_mod
    from cuckoofilter_ray.stages.membership import filters_to_stacked_ref
    keys = splitmix64(20_000, seed=17)
    rows = build_partitioned_filter(_keys_ds(ray, keys), num_shards=8,
                                    capacity_per_shard=4096,
                                    seed=SEED).take_all()
    a = PartitionedFilterProbe(filters_to_ref(rows, group_col="_shard"))
    b = PartitionedFilterProbe(filters_to_stacked_ref(rows, group_col="_shard"))
    probes = np.concatenate([keys, splitmix64(100_000, seed=18)])
    assert (a.contain_batch(probes) == b.contain_batch(probes)).all()
    assert b.contain_batch(keys).all()
    # sweep kernel over the stacked ref
    iref = ray.put(keys)
    m = run_sweep(iref, filters_to_stacked_ref(rows, group_col="_shard"),
                  100_000, seed=9, num_shards=8, num_blocks=4)
    assert m["recall"] == 1.0


def test_hash_join_preserves_int64_dtypes(ray_mod):
    """VERDICT r1 #1: the null-padded union must not round-trip int64 payload
    columns through float64 — every output column keeps its input Arrow type,
    and values match a pandas merge exactly."""
    ray = ray_mod
    import ray.data
    from cuckoofilter_ray.stages.relational import hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 400).astype(np.int64),
        "lv": np.arange(400, dtype=np.int64),
        "ls": [f"l{i}" for i in range(400)],
    })
    right = pd.DataFrame({
        "k2": np.arange(0, 60, dtype=np.int64),
        "rv": (np.arange(60) * 10).astype(np.int32),
    })
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    out = hash_join(lds, rds, left_key="k", right_key="k2", num_buckets=8)
    tbl = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()],
        promote_options="none")
    # dtype preservation (the r1 bug emitted float64 here)
    types = {f.name: f.type for f in tbl.schema}
    assert types["_k"] == pa.int64()
    assert types["lv"] == pa.int64()
    assert types["rv"] == pa.int32()
    assert types["ls"] == pa.string()
    # exact value parity with pandas merge
    exp = pd.merge(left.rename(columns={"k": "_k"}),
                   right.rename(columns={"k2": "_k"}), on="_k")
    got = tbl.to_pandas().sort_values(["_k", "lv"]).reset_index(drop=True)
    exp = exp.sort_values(["_k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


def test_neardup_cluster_labels_are_int64(ray_mod):
    """ADVICE r1: label propagation must emit int64 doc_id/cluster_id (the
    pandas empty-frame unions used to promote them to float64)."""
    ray = ray_mod
    import ray.data
    from cuckoofilter_ray.stages.dedup import neardup_clusters

    pairs = ray.data.from_arrow(pa.table({
        "lo_id": pa.array([1, 2, 10], pa.int64()),
        "hi_id": pa.array([2, 3, 11], pa.int64()),
    }))
    out = neardup_clusters(pairs)
    # Ray's map_batches passes zero-row blocks through schema-less (the UDF
    # is skipped on empties) — drop those; every DATA block must carry the
    # exact int64 schema
    tbls = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_columns]
    assert tbls, "no data blocks"
    tbl = pa.concat_tables(tbls, promote_options="none")
    types = {f.name: f.type for f in tbl.schema}
    assert types["doc_id"] == pa.int64()
    assert types["cluster_id"] == pa.int64()
    got = {r["doc_id"]: r["cluster_id"] for r in tbl.to_pylist()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_batch_signatures_match_per_doc_path():
    """Vectorized batch minhash == the per-doc reference path, value-exact."""
    from cuckoofilter_ray.stages.dedup import (_batch_signatures,
                                               _shingle_hashes,
                                               minhash_signature)
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "δelta", "ε", "zeta42", "x"]
    texts = ["  ".join(rng.choice(words, rng.integers(0, 40)))
             for _ in range(50)] + ["", "ab", "éé", None]
    got = _batch_signatures(texts, num_perm=32, shingle_k=5, seed=777)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, 5, 777)
        exp = minhash_signature(sh, 32, 777 + 2)
        assert (got[i] == exp).all(), f"doc {i} signature mismatch"


def test_minhash_pairs_invariant_to_partitioning(ray_mod):
    """The candidate pair set must not depend on num_blocks (block sizing
    is an executor knob, not a semantic one) — guards the bucket-boundary
    and pair-dedup logic across partition layouts."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import minhash_lsh_pairs
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    texts = []
    for i in range(120):
        base = " ".join(rng.choice(vocab, 60))
        texts.append(base)
        if i % 7 == 0:
            texts.append(base + " tailtok")
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    ref = None
    for nb in (2, 8, 32):
        p = minhash_lsh_pairs(docs, column="text", id_col="doc_id",
                              num_perm=64, bands=16, threshold=0.5,
                              num_blocks=nb).to_pandas()
        cur = sorted(zip(p.lo_id.astype(int), p.hi_id.astype(int)))
        if ref is None:
            ref = cur
            assert len(ref) > 10          # the corpus plants ~18 pairs
        assert cur == ref, f"num_blocks={nb} changed the pair set"


def test_sig_blob_roundtrip_and_band_rows():
    """(id, signature-blob) rows decode back to the exact signature matrix,
    and band rows carry only fixed-width key columns (the 8-byte sig_hash,
    never the 512-byte signature)."""
    from cuckoofilter_ray.stages.dedup import (_batch_signatures, _sig_matrix,
                                               minhash_band_rows,
                                               minhash_sig_rows)
    texts = [f"document number {i} with some shared boilerplate text"
             for i in range(37)] + ["", None, "ab"]
    ids = list(range(len(texts)))
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([t or "" for t in texts])})
    rows = minhash_sig_rows(batch, column="text", id_col="doc_id",
                            num_perm=64, shingle_k=5, seed=777)
    sigs = _sig_matrix(rows.column("signature"))
    exp = _batch_signatures(texts, num_perm=64, shingle_k=5, seed=777)
    assert (sigs == exp).all()
    banded = minhash_band_rows(rows, id_col="doc_id", bands=16, seed=777)
    assert set(banded.column_names) == {
        "doc_id", "band_id", "band_hash", "sig_hash", "_part"}
    assert banded.num_rows == len(texts) * 16
    # identical docs share sig_hash; distinct docs don't (w.h.p.)
    sh = banded.column("sig_hash").to_numpy()
    assert sh[0 * 16] != sh[1 * 16]
    # empty batch degrades to an empty table, not an error
    empty = minhash_band_rows(rows.slice(0, 0), id_col="doc_id",
                              bands=16, seed=777)
    assert empty.num_rows == 0


def test_degenerate_identical_bucket_is_linear(ray_mod):
    """VERDICT r1 #4: a mass-duplicated bucket (10^4 identical docs) must
    finish in seconds with O(n) star pairs, not O(n^2) all-pairs."""
    import time
    ray = ray_mod
    import ray.data
    from cuckoofilter_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    n = 10_000
    boiler = "the quick brown fox jumps over the lazy dog " * 6
    texts = [boiler] * n + [boiler + " tail variation xyz",
                            "совершенно другой текст без общих шинглов" * 4]
    ids = list(range(n + 2))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)

    t0 = time.time()
    mh = minhash_lsh_pairs(docs, threshold=0.5, num_blocks=4).to_pandas()
    t_mh = time.time() - t0
    # identical docs: exactly one star pair per member, centered on id 0
    stars = mh[mh["est_jaccard"] >= 1.0]
    assert len(stars) == n - 1
    assert (stars["lo_id"] == 0).all()
    assert t_mh < 60, f"minhash degenerate bucket took {t_mh:.1f}s"

    t0 = time.time()
    sh = simhash_pairs(docs, max_hamming=3, num_blocks=4).to_pandas()
    t_sh = time.time() - t0
    # the tail-variation doc may share the boilerplate's simhash (majority
    # votes unchanged) — assert linearity, not an exact count
    zero = sh[sh["hamming"] == 0]
    assert n - 1 <= len(zero) <= n + 1, "star output must be linear"
    assert (zero["lo_id"] == 0).all()
    assert set(range(1, n)) <= set(zero["hi_id"])
    assert t_sh < 60, f"simhash degenerate bucket took {t_sh:.1f}s"


def test_single_shard_and_empty_guards(ray_mod):
    """ADVICE r1 edge cases: num_shards=1 routing, empty exact-verify set."""
    ray = ray_mod
    keys = splitmix64(5_000, seed=21)
    # num_shards == 1 must route everything to shard 0 (no 64-bit shift UB)
    assert (shard_for_keys(keys, 1) == 0).all()
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=1,
                                       capacity_per_shard=8192, seed=SEED)
    rows = filters.take_all()
    assert [r["_shard"] for r in rows] == [0]
    view = PartitionedFilterProbe(filters_to_ref(rows, group_col="_shard"))
    assert view.contain_batch(keys).all()
    # SemiJoinProbe with an EMPTY exact set: every filter positive must
    # verify to False, not IndexError
    from cuckoofilter_ray.stages.membership import SemiJoinProbe
    from cuckoofilter_ray.kernels.cuckoo import CuckooFilter
    f = CuckooFilter(1024, bits_per_tag=12, seed=SEED)
    f.add_batch(keys[:100])
    probe = SemiJoinProbe(ray.put(serialize(f)),
                          exact_ref=ray.put(np.empty(0, dtype=np.uint64)))
    out = probe(pa.table({"key_hi64": pa.array(keys[:100], pa.uint64())}))
    assert out.num_rows == 0


def test_langid_vectorized_matches_reference_loop():
    """Vectorized LangId == the per-row reference semantics, value-exact."""
    import re
    from cuckoofilter_ray.functions.text import LangId, _LANG_MARKERS
    texts = [
        "the cat and the dog went to the market and it was good",
        "der Hund und die Katze sind nicht auf dem Tisch mit einem Ball",
        "el perro y la casa que es de un amigo en la calle",
        "le chien est dans la maison et les chats pour une fois",
        "这是一个中文文档的例子 完全没有拉丁字母",
        "mixed 中文 with latin 但是 mostly latin words the and of",
        "", "   ", None, "12345 67890 !!!", "zzz qqq xxx",
    ]
    got = LangId()(pa.table({"text": pa.array(texts, pa.string())}))
    word = re.compile(r"[a-zàâçéèêëîïôùûüäöüß]+")
    cjk_re = re.compile(r"[一-鿿]")
    for i, t in enumerate(texts):
        t = t or ""
        cjk = len(cjk_re.findall(t))
        if cjk >= 3 or (len(t) and cjk / max(1, len(t)) > 0.05):
            exp_pred, exp_conf = "zh", min(1.0, cjk / 20)
        else:
            words = word.findall(t.lower())
            exp_pred, best = "en", -1
            for lang, markers in _LANG_MARKERS.items():
                hits = sum(w in markers for w in words)
                if hits > best:
                    exp_pred, best = lang, hits
            exp_conf = best / max(1, len(words))
        assert got.column("lang_pred")[i].as_py() == exp_pred, (i, t)
        assert abs(got.column("lang_conf")[i].as_py() - exp_conf) < 1e-12


def test_counting_filter_udaf_matches_exact_counts(ray_mod):
    """FilterSketch(kind='counting') per-group aggregate: distributed
    partial-merge counts == exact COUNT(*) per key (qf_merge contract,
    src/gqf.h:307)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.aggregate import FilterSketch
    rng = np.random.default_rng(17)
    base = splitmix64(400, seed=91)
    rows = 30_000
    keys = rng.choice(base, size=rows, replace=True)
    grp = rng.integers(0, 3, size=rows)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(grp, pa.int64()),
        "key_hi64": pa.array(keys, pa.uint64()),
    })).repartition(8)
    agg = ds.groupby("g").aggregate(
        FilterSketch(on="key_hi64", kind="counting", capacity=1000,
                     seed=SEED, alias_name="cqf"))
    got = {r["g"]: deserialize(r["cqf"]) for r in agg.take_all()}
    for g in range(3):
        mask = grp == g
        exact = {}
        for k in keys[mask]:
            exact[int(k)] = exact.get(int(k), 0) + 1
        counts = got[g].count_batch(base)
        exp = np.array([exact.get(int(k), 0) for k in base])
        assert (counts == exp).all(), f"group {g} count mismatch"
        assert got[g].num_items == int(mask.sum())


def test_hash_family_tims_build_probe_parity(ray_mod):
    """HashFamily pluggability (src/cuckoofilter.h:32-35): a distributed
    build+probe under TwoIndependentMultiplyShift answers identically to the
    single-kernel filter, with zero false negatives and the serde row
    carrying the family."""
    ray = ray_mod
    from cuckoofilter_ray.kernels import CuckooFilter, deserialize
    keys = splitmix64(20_000, seed=31)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=4,
                                       capacity_per_shard=8192, seed=SEED,
                                       hash_family="tims")
    rows = filters.take_all()
    assert sum(r["num_items"] for r in rows) == len(keys)
    view = PartitionedFilterProbe(filters_to_ref(rows, group_col="_shard"))
    assert view._proto.hash_family == "tims"
    probes = np.concatenate([keys, splitmix64(20_000, seed=87)])
    got = view.contain_batch(probes)
    assert got[:len(keys)].all(), "false negative under tims"
    # per-shard kernel equivalence
    per_shard = {r["_shard"]: deserialize(r[SKETCH_COL]) for r in rows}
    assert all(f.hash_family == "tims" for f in per_shard.values())
    shard = shard_for_keys(probes, 4)
    expect = np.zeros(len(probes), dtype=bool)
    for s in range(4):
        m = shard == s
        expect[m] = per_shard[s].contain_batch(probes[m])
    assert (got == expect).all()
    # mix and tims disagree on placement (different hash family really used)
    fm = CuckooFilter.create(8192, seed=SEED, hash_family="mix")
    ft = CuckooFilter.create(8192, seed=SEED, hash_family="tims")
    fm.add_batch(keys[:4000]); ft.add_batch(keys[:4000])
    assert (fm.tags != ft.tags).any()
    # fpr still in the 12-bit regime
    neg = splitmix64(50_000, seed=55)
    assert ft.contain_batch(neg).mean() < 4 * 2 * 4 / (1 << 12)
    # the fused sweep refuses non-mix families loudly
    from cuckoofilter_ray.stages.sweep import SweepProber
    with pytest.raises(ValueError, match="mix"):
        SweepProber(ray.put(keys), filters_to_ref(rows, group_col="_shard"),
                    seed=1, num_shards=4)


def test_packed_semisort_probe_matches_unpacked(ray_mod):
    """Probe-on-packed path (src/packedtable.h:312-353 analog): the 6-byte-
    per-bucket broadcast answers EXACTLY like the unpacked stacked probe,
    at 0.75x the worker memory."""
    ray = ray_mod
    from cuckoofilter_ray.stages.membership import (PackedSemisortProbe,
                                                    filters_to_packed_ref)
    keys = splitmix64(30_000, seed=41)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=4, kind="semisort",
                                       capacity_per_shard=16384,
                                       bits_per_tag=13, seed=SEED)
    rows = filters.take_all()
    unpacked = PartitionedFilterProbe(filters_to_ref(rows, group_col="_shard"))
    packed = PackedSemisortProbe(filters_to_packed_ref(rows,
                                                       group_col="_shard"))
    probes = np.concatenate([keys, splitmix64(50_000, seed=43)])
    a = unpacked.contain_batch(probes)
    b = packed.contain_batch(probes)
    assert (a == b).all()
    assert b[:len(keys)].all(), "false negative on packed probe"
    # memory: 6 bytes/bucket vs 8 for the uint16 tag table
    nb_total = 4 * unpacked._nb
    assert packed._packed6.nbytes == nb_total * 6
    assert unpacked._tags64.nbytes == nb_total * 8
    # works as a map_batches stage too
    wl = ray.data.from_arrow(pa.table({"key_hi64": pa.array(probes,
                                                            pa.uint64())}))
    out = wl.map_batches(
        PackedSemisortProbe, batch_format="pyarrow", batch_size=None,
        concurrency=2,
        fn_constructor_kwargs={
            "filters_ref": filters_to_packed_ref(rows, group_col="_shard")}
    ).to_pandas()
    assert (out["is_member"].to_numpy() == a).all()


def test_knn_ivf_full_probe_matches_bruteforce(ray_mod):
    """knn_ivf with n_probe == n_lists scans everything => rank-exact equal
    to the brute-force top-k; fewer probes stay a subset with recall > 0."""
    ray = ray_mod
    from cuckoofilter_ray.stages.similarity import knn_bruteforce, knn_ivf
    rng = np.random.default_rng(8)
    n, d = 2000, 16
    mat = rng.normal(size=(n, d))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })).repartition(4)
    queries = {int(i): mat[i] for i in range(3)}
    exact = knn_bruteforce(ds, queries, k=5).to_pandas()
    full = knn_ivf(ds, queries, k=5, n_lists=8, n_probe=8, seed=3).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = full[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b), "full-probe IVF must equal brute force"
    part = knn_ivf(ds, queries, k=5, n_lists=8, n_probe=2, seed=3).to_pandas()
    got = set(map(tuple, part[["query_id", "vec_id"]].to_numpy()))
    want = set(map(tuple, exact[["query_id", "vec_id"]].to_numpy()))
    recall = len(got & want) / len(want)
    assert recall > 0.3, f"2-probe IVF recall suspiciously low: {recall}"
    # each query's own vector is its top-1 under any probe count >= 1
    top1 = part[part["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()


def test_knn_lsh_multiprobe_recall_improves(ray_mod):
    """Multi-probe recall (vs brute force) is >= single-probe recall, and
    probing every bucket equals brute force."""
    ray = ray_mod
    from cuckoofilter_ray.stages.similarity import knn_bruteforce, knn_lsh
    rng = np.random.default_rng(9)
    n, d, bits = 1500, 12, 4
    mat = rng.normal(size=(n, d))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })).repartition(4)
    queries = {int(i): mat[i] for i in range(4)}
    exact = knn_bruteforce(ds, queries, k=5).to_pandas()
    want = set(map(tuple, exact[["query_id", "vec_id"]].to_numpy()))

    def recall(n_probes):
        r = knn_lsh(ds, queries, k=5, bits=bits, n_probes=n_probes).to_pandas()
        got = set(map(tuple, r[["query_id", "vec_id"]].to_numpy()))
        return len(got & want) / len(want)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1, f"multi-probe recall regressed: {r1} -> {r4}"
    # probing 2^bits buckets == no pruning at all == brute force ranks
    r_all = knn_lsh(ds, queries, k=5, bits=bits,
                    n_probes=1 << bits).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = r_all[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_fingerprint_vectorized_matches_reference_loop():
    """Concatenated-corpus fingerprint == the per-doc Horner loop."""
    from cuckoofilter_ray.functions.text import add_fingerprint
    texts = ["hello world", "  spaced   out  ", "", None, "x", "αβγ δ",
             "a" * 500, "the quick brown fox", "   "]
    got = add_fingerprint(pa.table({"text": pa.array(texts, pa.string())})) \
        .column("fingerprint64").to_numpy(zero_copy_only=False)
    B = np.uint64(1000003)
    for i, t in enumerate(texts):
        s = " ".join((t or "").split()) + " " if t and (t or "").split() else ""
        if not s:
            assert got[i] == 0, (i, t)
            continue
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.uint64)
        fp = np.uint64(0)
        for c in codes:
            fp = fp * B + c
        assert got[i] == fp, (i, t)


def test_partitioned_counting_probe_matches_per_shard(ray_mod):
    """Sharded counting filter: the shard-prefixed global searchsorted
    answers exactly like per-shard kernel counts (exact multiset counts
    across a partitioned build)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.membership import (PartitionedCountProbe,
                                                    filters_to_counting_ref)
    rng = np.random.default_rng(23)
    base = splitmix64(5_000, seed=71)
    keys = rng.choice(base, size=60_000, replace=True)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8, kind="counting",
                                       capacity_per_shard=16384, seed=SEED)
    rows = filters.take_all()
    assert sum(r["num_items"] for r in rows) == len(keys)
    probe = PartitionedCountProbe(
        filters_to_counting_ref(rows, group_col="_shard"))
    got = probe.count_batch(base)
    # exact model: per-shard masked-hash multiset
    per_shard = {r["_shard"]: deserialize(r[SKETCH_COL]) for r in rows}
    shard = shard_for_keys(base, 8)
    exp = np.zeros(len(base), dtype=np.int64)
    for s in range(8):
        m = shard == s
        exp[m] = per_shard[s].count_batch(base[m])
    assert (got == exp).all()
    # CQF counts never undercount; masked collisions (2 in this seeded
    # setup) overcount the colliding keys only
    assert len(keys) <= int(got.sum()) <= len(keys) + 100
    # map_batches stage form
    wl = ray.data.from_arrow(pa.table({"key_hi64": pa.array(base,
                                                            pa.uint64())}))
    out = wl.map_batches(
        PartitionedCountProbe, batch_format="pyarrow", batch_size=None,
        concurrency=2,
        fn_constructor_kwargs={
            "filters_ref": filters_to_counting_ref(rows, group_col="_shard")}
    ).to_pandas()
    assert (out["count"].to_numpy() == exp).all()


def test_asof_join_matches_pandas(ray_mod):
    """Bucketed as-of join == a global pandas merge_asof (inner), including
    keys with no match (dropped) and exact boundary timestamps (matched)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.relational import asof_join
    rng = np.random.default_rng(5)
    n_l, n_r = 3000, 800
    lk = rng.integers(0, 40, n_l)
    lt = np.datetime64("2024-01-01") + rng.integers(0, 10**9, n_l).astype(
        "timedelta64[us]")
    rk = rng.integers(0, 50, n_r)        # keys 40-49 never match left
    rt = np.datetime64("2024-01-01") + rng.integers(-10**8, 9 * 10**8,
                                                    n_r).astype(
        "timedelta64[us]")
    # dedupe right on (key, ts) so matches are unambiguous
    rdf = pd.DataFrame({"rk": rk, "rt": rt,
                        "rid": np.arange(n_r)}).groupby(
        ["rk", "rt"], as_index=False).agg(rid=("rid", "max"))
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "t": pa.array(lt, pa.timestamp("us")),
        "lid": pa.array(np.arange(n_l), pa.int64())})).repartition(4)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(rdf["rk"].to_numpy(), pa.int64()),
        "rt": pa.array(rdf["rt"].to_numpy(), pa.timestamp("us")),
        "rid": pa.array(rdf["rid"].to_numpy(), pa.int64())})).repartition(4)
    got = asof_join(left, right, key_cols=("k", "rk"), ts_cols=("t", "rt"),
                    left_payload=["lid"], right_payload=["rid"],
                    num_buckets=8).to_pandas()
    ldf = pd.DataFrame({"_key": lk.astype(np.int64),
                        "_ts": lt.astype("datetime64[us]"),
                        "lid": np.arange(n_l)}).sort_values("_ts")
    rr = pd.DataFrame({"_key": rdf["rk"].astype(np.int64),
                       "_ts": rdf["rt"].to_numpy().astype("datetime64[us]"),
                       "rid": rdf["rid"]}).sort_values("_ts")
    want = pd.merge_asof(ldf, rr, on="_ts", by="_key",
                         direction="backward").dropna(subset=["rid"])
    a = got[["lid", "rid"]].astype(np.int64).sort_values("lid") \
        .reset_index(drop=True)
    b = want[["lid", "rid"]].astype(np.int64).sort_values("lid") \
        .reset_index(drop=True)
    assert a.equals(b)
    assert len(a) < n_l          # some left rows genuinely unmatched


def test_asof_join_null_payload_and_name_collision(ray_mod):
    """A matched right row whose payload is NULL must survive (the sentinel
    marks matches, not payload non-nullness); shared payload names refuse."""
    ray = ray_mod
    from cuckoofilter_ray.stages.relational import asof_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "t": pa.array(np.array(["2024-01-02", "2024-01-03", "2024-01-02"],
                               dtype="datetime64[us]"), pa.timestamp("us")),
        "lid": pa.array([10, 11, 12], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, 2], pa.int64()),
        "rt": pa.array(np.array(["2024-01-01", "2024-01-01"],
                                dtype="datetime64[us]"), pa.timestamp("us")),
        # key 1's payload is NULL — its matches must NOT be dropped
        "rv": pa.array([None, 7.5], pa.float64())}))
    got = asof_join(left, right, key_cols=("k", "rk"), ts_cols=("t", "rt"),
                    left_payload=["lid"], right_payload=["rv"],
                    num_buckets=4).to_pandas().sort_values("lid")
    assert got["lid"].tolist() == [10, 11, 12]
    assert got["rv"].isna().tolist() == [True, True, False]
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(left, right, key_cols=("k", "rk"), ts_cols=("t", "rt"),
                  left_payload=["lid"], right_payload=["lid"])


def test_neardup_clusters_large_graph_matches_unionfind(ray_mod):
    """Distributed min-label propagation == union-find on a 60k-edge graph
    with chains (multi-round diameter) and random extra edges; labels stay
    a Dataset end-to-end (no driver concat — VERDICT r2 #1)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import neardup_clusters
    rng = np.random.default_rng(7)
    n_nodes = 20_000
    chain = np.arange(n_nodes - 1)
    mask = (chain % 8) != 7                  # chains of length 8 => depth
    lo1, hi1 = chain[mask], chain[mask] + 1
    extra = rng.integers(0, n_nodes, (45_000, 2))
    extra = extra[extra[:, 0] != extra[:, 1]]
    lo = np.concatenate([lo1, np.minimum(extra[:, 0], extra[:, 1])])
    hi = np.concatenate([hi1, np.maximum(extra[:, 0], extra[:, 1])])
    pairs = ray.data.from_arrow(pa.table({
        "lo_id": pa.array(lo, pa.int64()),
        "hi_id": pa.array(hi, pa.int64())})).repartition(8)
    df = neardup_clusters(pairs, max_rounds=30).to_pandas()
    parent = np.arange(n_nodes)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(lo, hi):
        parent[find(a)] = find(b)
    lab = dict(zip(df["doc_id"], df["cluster_id"]))
    assert all(lab[a] == lab[b] for a, b in zip(lo, hi))
    import collections
    groups = collections.defaultdict(set)
    for x in set(lo) | set(hi):
        groups[find(x)].add(x)
    assert all(len({lab[x] for x in g}) == 1 for g in groups.values())
    assert len({min(g) for g in groups.values()}) == df["cluster_id"].nunique()


def test_delete_partitioned_no_driver_blobs(ray_mod, monkeypatch):
    """Delete is one union + groupby(_shard) shuffle: the driver never
    ray.put()s a sketch blob and never take_all()s updated shards — driver
    bytes are O(num_shards) row handles, not O(filter bytes) (VERDICT r3 #3).
    Filters are passed as a Dataset end-to-end."""
    ray = ray_mod
    import ray as ray_root
    from cuckoofilter_ray.pipelines import membership as mem

    keys = splitmix64(4000, seed=3)
    ds = _keys_ds(ray, keys)
    filters = build_partitioned_filter(ds, num_shards=8,
                                       capacity_per_shard=1024, seed=SEED)
    dele = ray.data.from_arrow(pa.table({
        "key_hi64": pa.array(keys[:500], pa.uint64())})).repartition(4)
    puts = []
    real_put = ray_root.put

    def spy_put(x, **kw):
        puts.append(x)
        return real_put(x, **kw)

    monkeypatch.setattr(mem.ray, "put", spy_put)
    updated = mem.delete_keys_partitioned(filters, dele, num_shards=8)
    out = updated.take_all()
    # no sketch bytes pass through driver-side ray.put at all
    assert not any(isinstance(p, (bytes, dict)) for p in puts), \
        f"driver put a blob: {[type(p) for p in puts]}"
    assert sum(r["n_deleted"] for r in out) == 500
    assert sum(r["num_items"] for r in out) == 3500
    assert {r["_shard"] for r in out} == set(range(8))
    # survivors keep zero false negatives through the Dataset path
    fref = filters_to_ref(out, group_col="_shard")
    view = PartitionedFilterProbe(fref, shard_col=None)
    assert view.contain_batch(keys[500:]).all()


def test_exact_dedup_fullrow_matches_ids_winners(ray_mod):
    """Vectorized full-row exact_dedup keeps exactly the exact_dedup_ids
    winner rows (min id per key), including duplicate keys split across
    blocks (VERDICT r2 #3 done-criterion)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import exact_dedup, exact_dedup_ids
    rng = np.random.default_rng(4)
    n = 6000
    key = rng.integers(0, 1500, n)               # ~4 rows per key
    ds = ray.data.from_arrow(pa.table({
        "key_hi64": pa.array(key, pa.int64()),
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(n)]),
    })).repartition(8)
    full = exact_dedup(ds, key_col="key_hi64", id_col="doc_id").to_pandas()
    ids = sorted(r["doc_id"] for r in exact_dedup_ids(
        ds, key_col="key_hi64", id_col="doc_id").take_all())
    assert sorted(full["doc_id"]) == ids
    # winner rows carry their own payload
    assert (full["payload"] == full["doc_id"].map(lambda i: f"p{i}")).all()
    assert full["key_hi64"].is_unique


def test_neardup_clusters_distributed_rounds_match_local(ray_mod):
    """Tiny bounds force the distributed star-contraction rounds (broadcast
    D closure) instead of the immediate local finish — labels must equal the
    local union-find answer, including on a SORTED chain (the O(diameter)
    adversary the r5 Borůvka closure is built to kill in O(log n))."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import (neardup_clusters,
                                               _local_cc_minlabel)
    rng = np.random.default_rng(13)
    # sorted chain of 400 + random clusters
    lo1 = np.arange(400)
    hi1 = lo1 + 1
    extra = rng.integers(500, 1500, (600, 2))
    extra = extra[extra[:, 0] != extra[:, 1]]
    lo = np.concatenate([lo1, np.minimum(extra[:, 0], extra[:, 1])])
    hi = np.concatenate([hi1, np.maximum(extra[:, 0], extra[:, 1])])
    pairs = ray.data.from_arrow(pa.table({
        "lo_id": pa.array(lo, pa.int64()),
        "hi_id": pa.array(hi, pa.int64())})).repartition(6)
    out = neardup_clusters(pairs, max_rounds=8,
                           local_edge_bound=10,       # never small enough
                           bcast_node_bound=1 << 20).to_pandas()
    nodes, roots = _local_cc_minlabel(lo.astype(np.int64),
                                      hi.astype(np.int64))
    exp = dict(zip(nodes, roots))
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == exp
    # the chain must have closed well inside 8 rounds (halving, not -1/round)
    assert got[400] == 0


def test_neardup_clusters_join_scale_path_matches_local(ray_mod):
    """bcast_node_bound=0 forces the outer-join pointer-doubling scale path
    end-to-end (the 100TB shape); labels must equal local union-find."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import (neardup_clusters,
                                               _local_cc_minlabel)
    rng = np.random.default_rng(29)
    lo1 = np.arange(60)                       # sorted chain (adversary)
    hi1 = lo1 + 1
    extra = rng.integers(100, 400, (150, 2))
    extra = extra[extra[:, 0] != extra[:, 1]]
    lo = np.concatenate([lo1, np.minimum(extra[:, 0], extra[:, 1])])
    hi = np.concatenate([hi1, np.maximum(extra[:, 0], extra[:, 1])])
    pairs = ray.data.from_arrow(pa.table({
        "lo_id": pa.array(lo, pa.int64()),
        "hi_id": pa.array(hi, pa.int64())})).repartition(4)
    out = neardup_clusters(pairs, max_rounds=8,
                           local_edge_bound=0,        # no local finish
                           bcast_node_bound=0).to_pandas()
    nodes, roots = _local_cc_minlabel(lo.astype(np.int64),
                                      hi.astype(np.int64))
    assert dict(zip(out["doc_id"], out["cluster_id"])) == \
        dict(zip(nodes, roots))


def test_minhash_broadcast_and_join_paths_agree(ray_mod):
    """The r5 small-candidate broadcast fast path must produce the exact
    pair set and est_jaccard values of the join path it replaces."""
    ray = ray_mod
    from cuckoofilter_ray.stages import dedup as dd
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    texts = []
    for i in range(100):
        base = " ".join(rng.choice(vocab, 60))
        texts.append(base)
        if i % 5 == 0:
            texts.append(base + " tailtok")
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))

    def run():
        p = dd.minhash_lsh_pairs(docs, column="text", id_col="doc_id",
                                 num_perm=64, bands=16, threshold=0.5,
                                 num_blocks=4).to_pandas()
        return sorted(zip(p.lo_id.astype(int), p.hi_id.astype(int),
                          p.est_jaccard.round(9)))

    fast = run()
    assert len(fast) > 5
    old = dd._SIG_BCAST_BYTES
    dd._SIG_BCAST_BYTES = 0                   # force the join path
    try:
        slow = run()
    finally:
        dd._SIG_BCAST_BYTES = old
    assert fast == slow


def test_measure_filters_batched_matches_single(ray_mod):
    """The r5 batched probe pass must report the exact FPR/recall counts of
    the per-config measure_single_filter pipelines it replaces."""
    ray = ray_mod
    from cuckoofilter_ray.kernels import filter_to_row
    from cuckoofilter_ray.kernels.hashing import splitmix64
    from cuckoofilter_ray.pipelines.build import build_single_filter
    from cuckoofilter_ray.pipelines.membership import (
        measure_filters_batched, measure_single_filter)
    import ray.data as rd

    n = 20_000
    keys = splitmix64(n, seed=5)
    ins_ref = ray.put(keys)
    keyed = rd.from_numpy(keys).map_batches(
        lambda b: pa.table({"key_hi64": b.column("data")}),
        batch_format="pyarrow", batch_size=None).repartition(4).materialize()
    configs = []
    for kind, bits in [("cuckoo", 12), ("bloom", 12), ("xor", 8)]:
        filt = build_single_filter(keyed, capacity=n, kind=kind,
                                   bits_per_tag=bits, seed=9)
        configs.append((f"{kind}{bits}",
                        ray.put(filter_to_row(filt, packed=False)), ins_ref))
    batched = measure_filters_batched(configs, 50_000, p=0.5, seed=31,
                                      num_blocks=4)
    for name, fref, iref in configs:
        solo = measure_single_filter(iref, fref, 50_000, p=0.5, seed=31,
                                     num_blocks=4)
        b = batched[name]
        assert b["recall"] == solo["recall"] == 1.0
        assert b["fpr"] == solo["fpr"], name
        assert b["n_probes"] == solo["n_probes"] == 50_000
        assert b["contain_s"] > 0


def test_minhash_estimate_is_calibrated(ray_mod):
    """The scale-free property behind the neardup verdicts: est_jaccard is
    Binomial(num_perm, J)/num_perm, so |est - exactJ| stays within binomial
    tolerance for (almost) every candidate pair — raw-LSH PRECISION against
    a fixed exact-J bar is corpus-dependent, calibration is not."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import (exact_jaccard_pairs,
                                               minhash_lsh_pairs)
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(250)]
    texts = []
    for i in range(150):
        base = list(rng.choice(vocab, 50))
        texts.append(" ".join(base))
        if i % 4 == 0:      # graded mutations -> borderline-J mass
            m = list(base)
            for j in rng.integers(0, 50, rng.integers(1, 20)):
                m[j] = str(rng.choice(vocab))
            texts.append(" ".join(m))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    num_perm = 64
    p = minhash_lsh_pairs(docs, column="text", id_col="doc_id",
                          num_perm=num_perm, bands=16, threshold=0.3,
                          num_blocks=4).to_pandas()
    assert len(p) > 10
    ex = exact_jaccard_pairs(docs, threshold=0.0).to_pandas()
    exact = {(int(a), int(b)): j for a, b, j in
             zip(ex.lo_id, ex.hi_id, ex.jaccard)}
    sigma = np.sqrt(0.5 * 0.5 / num_perm)     # worst-case binomial sd
    bad = 0
    for a, b, est in zip(p.lo_id, p.hi_id, p.est_jaccard):
        j = exact.get((int(a), int(b)), 0.0)
        if abs(est - j) > 4 * sigma:
            bad += 1
    assert bad <= max(1, len(p) // 50), f"{bad}/{len(p)} beyond 4 sigma"


def test_heavy_hitters_exact_vs_pandas(ray_mod):
    """heavy_hitters (MG sketch pass + broadcast refinement) returns the
    EXACT > n/denom frequent-item set — both a tokenized string column and
    a raw int column — even with a sketch small enough to force candidate
    false positives into the refinement pass."""
    ray = ray_mod
    from collections import Counter
    from cuckoofilter_ray.stages.heavy import heavy_hitters
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["text"])
    got = heavy_hitters(docs, "text", denom=30, split=" ").to_pandas()
    toks = []
    for t in pa.parquet.read_table(
            f"{SF_DIR}/documents.parquet").column("text").to_pylist():
        toks.extend(t.split(" "))
    c = Counter(toks)
    want = sorted((t, n) for t, n in c.items() if n > len(toks) / 30)
    assert list(zip(got["item"], got["n"])) == want
    # minimal sketch (k + 1 == denom): superset guarantee is tight but the
    # exact refinement must still produce the identical answer
    got_min = heavy_hitters(docs, "text", denom=30, k=29,
                            split=" ").to_pandas()
    assert got_min.equals(got)
    with pytest.raises(ValueError):
        heavy_hitters(docs, "text", denom=30, k=28, split=" ")
    # int column, no tokenization
    ev = ray.data.read_parquet(f"{SF_DIR}/events.parquet",
                               columns=["user_id"])
    got_u = heavy_hitters(ev, "user_id", denom=120).to_pandas()
    u = pa.parquet.read_table(
        f"{SF_DIR}/events.parquet").column("user_id").to_pylist()
    cu = Counter(u)
    want_u = sorted((str(k), n) for k, n in cu.items()
                    if n > len(u) / 120)
    assert list(zip(got_u["item"], got_u["n"])) == want_u


def test_heavy_hitters_empty_token_and_no_candidates(ray_mod):
    """Two edge regressions: a genuine "" token (consecutive split
    separators) must count as a normal item — it used to collide with the
    per-batch total sentinel — and a stream with NO candidates past the
    threshold must return an empty table instead of crashing the
    refinement gather."""
    ray = ray_mod
    from collections import Counter
    from cuckoofilter_ray.stages.heavy import heavy_hitters
    # "a  b" splits to ["a", "", "b"]: "" is frequent here
    texts = ["a  b c"] * 40 + ["x y z w"] * 10
    ds = ray.data.from_items([{"text": t} for t in texts],
                             override_num_blocks=4)
    got = heavy_hitters(ds, "text", denom=8, split=" ").to_pandas()
    toks = []
    for t in texts:
        toks.extend(t.split(" "))
    c = Counter(toks)
    want = sorted((t, n) for t, n in c.items() if n > len(toks) / 8)
    assert list(zip(got["item"], got["n"])) == want
    assert "" in set(got["item"])              # the empty token survived
    # near-uniform ints, huge threshold: MG's candidate set is empty
    ev = ray.data.from_items([{"v": i % 977} for i in range(3000)],
                             override_num_blocks=4)
    got_e = heavy_hitters(ev, "v", denom=2)
    assert got_e.num_rows == 0


def test_heavy_hitters_null_items_dropped(ray_mod):
    """Null items are dropped from the stream — not counted in n, not
    emitted — and an int64 column that carries nulls in SOME blocks must
    still key every block identically (pandas factorize used to upcast
    null-bearing blocks to float64, splitting one value's count across
    '7' and '7.0' key spaces, a silent false negative)."""
    ray = ray_mod
    from collections import Counter
    from cuckoofilter_ray.stages.heavy import heavy_hitters
    # block 0: no nulls; blocks 1-3: nulls interleaved with the SAME
    # heavy value 7 — exactness requires the counts to combine
    vals = [7] * 30 + [1, 2, 3] * 10
    vals += ([7, None] * 15 + [4, 5, 6] * 10) * 3
    ds = ray.data.from_items(
        [{"v": v} for v in vals], override_num_blocks=4)
    got = heavy_hitters(ds, "v", denom=5).to_pandas()
    nn = [v for v in vals if v is not None]
    c = Counter(nn)
    want = sorted((str(k), n) for k, n in c.items() if n > len(nn) / 5)
    assert list(zip(got["item"], got["n"])) == want
    assert "7" in set(got["item"]) and "7.0" not in set(got["item"])
    # an ALL-null block must contribute nothing (used to IndexError on
    # factorize's -1 codes into an empty uniques array)
    ds2 = ray.data.from_items(
        [{"v": None}] * 50 + [{"v": 9}] * 50, override_num_blocks=4)
    got2 = heavy_hitters(ds2, "v", denom=3).to_pandas()
    assert list(zip(got2["item"], got2["n"])) == [("9", 50)]


def test_minhash_pairs_match_bandedcollision_components(ray_mod):
    """Differential property vs a driver-side LSH reference: the pipeline's
    pair set must induce EXACTLY the connected components of the true
    banded signature collisions (the bucket rep-collapse emits a
    connectivity-preserving star, not every pairwise edge — so components,
    not pairs, are the contract), and no returned pair may bridge two true
    components (a 64-bit band-hash collision would)."""
    ray = ray_mod
    from cuckoofilter_ray.stages.dedup import (minhash_lsh_pairs,
                                               _batch_signatures)
    rng = np.random.default_rng(4242)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(8, 40))))
             for _ in range(150)]
    for _ in range(45):                      # planted near-dups
        toks = texts[int(rng.integers(0, 150))].split()
        for _ in range(int(rng.integers(0, 3))):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(words))
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    num_perm, bands, shingle_k, seed = 32, 8, 3, 99
    got = minhash_lsh_pairs(ray.data.from_pandas(df).repartition(5),
                            num_perm=num_perm, bands=bands,
                            shingle_k=shingle_k, seed=seed, threshold=0.0,
                            num_blocks=4).to_pandas()
    s1 = set(zip(got.lo_id, got.hi_id))
    sigs = _batch_signatures(list(df.text), num_perm, shingle_k, seed)
    r = num_perm // bands
    want = set()
    for b in range(bands):
        seen: dict = {}
        for i in range(len(sigs)):
            seen.setdefault(sigs[i, b * r:(b + 1) * r].tobytes(),
                            []).append(i)
        for g in seen.values():
            for x in range(len(g)):
                for y in range(x + 1, len(g)):
                    want.add((g[x], g[y]))

    def comps(pairs):
        par: dict = {}
        def find(a):
            while par.setdefault(a, a) != a:
                par[a] = par[par[a]]
                a = par[a]
            return a
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                par[max(ra, rb)] = min(ra, rb)
        out: dict = {}
        for x in list(par):
            out.setdefault(find(x), set()).add(x)
        return {frozenset(v) for v in out.values()}

    assert want, "degenerate corpus: no banded collisions planted"
    assert comps(s1) == comps(want)
    cmap = {}
    for cs in comps(want):
        for x in cs:
            cmap[x] = cs
    bridge = [p for p in (s1 - want)
              if cmap.get(p[0]) is not cmap.get(p[1])]
    assert not bridge, f"spurious cross-component pairs: {bridge[:3]}"


def test_asof_join_preserves_int_payload_dtypes(ray_mod):
    """Output payload columns keep their input Arrow types: the post-union
    null-padding used to upcast int64 payloads on BOTH sides to float64
    (pandas int-with-NaN), and empty buckets emitted object-dtype columns
    (schemaless blocks).  Also exercises the from_pandas (PandasBlockSchema)
    input path for the plan-time type capture."""
    ray = ray_mod
    from cuckoofilter_ray.stages.relational import asof_join
    rng = np.random.default_rng(11)
    n = 400
    ldf = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype(np.int64),
        "t": pd.to_datetime(rng.integers(0, 10**6, n), unit="us"),
        "lp": rng.integers(0, 99, n).astype(np.int64)})
    rdf = pd.DataFrame({"k": np.arange(8, dtype=np.int64),   # keys 6,7 unmatched
                        "rt": pd.to_datetime(np.zeros(8), unit="us"),
                        "rp": np.arange(100, 108, dtype=np.int64)})
    got = asof_join(ray.data.from_pandas(ldf).repartition(4),
                    ray.data.from_pandas(rdf).repartition(2),
                    key_cols=("k", "k"), ts_cols=("t", "rt"),
                    left_payload=["lp"], right_payload=["rp"],
                    num_buckets=16)        # > #keys: some buckets are empty
    blocks = [ray.get(r) for r in got.to_arrow_refs()]
    # groupby partitions that received zero groups emit schemaless empty
    # blocks (documented Ray pitfall) — every NON-empty block must carry
    # the full typed schema
    tbl = pa.concat_tables([b for b in blocks if b.num_rows])
    assert tbl.schema.field("lp").type == pa.int64()
    assert tbl.schema.field("rp").type == pa.int64()
    assert tbl.schema.field("_ts").type == pa.timestamp("us")
    assert tbl.num_rows == n               # every left row matches ts>=0
    want = ldf.merge(rdf[["k", "rp"]], on="k", how="inner")
    assert sorted(zip(tbl.column("lp").to_pylist(),
                      tbl.column("rp").to_pylist())) == \
        sorted(zip(want.lp, want.rp))


def test_tdigest_udaf_and_grouped_path(ray_mod):
    """TDigestAgg (global aggregate) and the tdigest grouped combine path
    both produce digests whose quantiles sit in-band vs the exact CDF and
    whose total weight equals the exact row count."""
    ray = ray_mod
    from cuckoofilter_ray.stages.aggregate import (TDigestAgg,
                                                   _sketch_from_bytes,
                                                   build_grouped_sketches)
    li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                               columns=["l_extendedprice"])
    agg = TDigestAgg(on="l_extendedprice", delta=200, alias_name="td")
    sketch = agg.unpack(li.aggregate(agg)["td"])
    exact = np.sort(np.concatenate(
        [b.column("l_extendedprice").to_numpy(zero_copy_only=False)
         for b in li.iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow")]))
    assert sketch.total_weight() == len(exact)
    for q in (0.01, 0.5, 0.99):
        est = float(sketch.quantile(q))
        lo = np.searchsorted(exact, est, "left") / len(exact)
        hi = np.searchsorted(exact, est, "right") / len(exact)
        assert max(lo - q, q - hi, 0.0) <= float(sketch.rank_error_bound(q))

    orders = ray.data.read_parquet(f"{SF_DIR}/orders.parquet",
                                   columns=["o_orderpriority",
                                            "o_totalprice"])
    params = {"delta": 200}
    out = {r["o_orderpriority"]:
           _sketch_from_bytes("tdigest", r["sketch"], params)
           for r in build_grouped_sketches(
               orders, "o_orderpriority", "o_totalprice", "tdigest",
               params, value_col="o_totalprice").take_all()}
    pdf = orders.to_pandas()
    for g, grp in pdf.groupby("o_orderpriority"):
        ex = np.sort(grp["o_totalprice"].to_numpy())
        s = out[g]
        assert s.total_weight() == len(ex)
        est = float(s.quantile(0.5))
        lo = np.searchsorted(ex, est, "left") / len(ex)
        hi = np.searchsorted(ex, est, "right") / len(ex)
        assert max(lo - 0.5, 0.5 - hi, 0.0) <= \
            float(s.rank_error_bound(0.5))


def test_token_stats_re2_semantics_match_duckdb_oracle():
    """n_tokens uses RE2 (\\S is ASCII-only there: U+00A0 is NOT a token
    separator, unlike Python re) — the engine must agree with the DuckDB
    oracle's regexp_extract_all on exactly these edges."""
    import duckdb
    from cuckoofilter_ray.functions.text import add_token_stats
    texts = ["", " ", "a b", " nbsp separated",
             "tab\tand\nnewline\r\nmix", "a  b", " lead", "trail ",
             "中文 没有 空格"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = add_token_stats(tbl)
    want = [r[0] for r in duckdb.sql(
        r"SELECT length(regexp_extract_all(text, '\S+')) "
        "FROM tbl ORDER BY doc_id").fetchall()]
    assert out.column("n_tokens").to_pylist() == want


def test_repetition_stats_hand_case():
    """Gopher-style repetition signals on a hand-computed document."""
    from cuckoofilter_ray.functions.text import add_repetition_stats
    texts = ["a a a b c", "x y z", "", "solo", "p q p q p"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = add_repetition_stats(tbl)
    got = out.to_pandas().set_index("doc_id")
    # "a a a b c": 5 words, 3 distinct, top word "a" x3,
    # top 2-gram "a a" x2 of 4 adjacent pairs
    assert got.loc[0, "n_words"] == 5
    assert got.loc[0, "n_distinct_words"] == 3
    assert got.loc[0, "top_word_n"] == 3
    assert got.loc[0, "top_2gram_n"] == 2
    assert got.loc[0, "dup_word_frac"] == (5 - 3) / 5
    assert got.loc[0, "top_word_frac"] == 3 / 5
    assert got.loc[0, "top_2gram_frac"] == 2 / 4
    # all-distinct doc: zero repetition
    assert got.loc[1, "dup_word_frac"] == 0.0
    assert got.loc[1, "top_2gram_n"] == 1        # every pair unique
    # empty doc: all-zero counts, fracs defined as 0 via max(n,1) guards
    assert got.loc[2, "n_words"] == 0
    assert got.loc[2, "dup_word_frac"] == 0.0
    assert got.loc[2, "top_2gram_frac"] == 0.0
    # single word: no adjacent pair exists
    assert got.loc[3, "n_words"] == 1 and got.loc[3, "top_2gram_n"] == 0
    # "p q p q p": top 2-gram "p q" x2 of 4 pairs
    assert got.loc[4, "top_2gram_n"] == 2
    assert got.loc[4, "top_word_n"] == 3


def test_repetition_stats_matches_duckdb_oracle_edges():
    """Engine repetition stats == the oracle's list-aggregate SQL on edge
    inputs (empty, single word, heavy dup, unicode, whitespace runs)."""
    import duckdb
    from cuckoofilter_ray.functions.text import add_repetition_stats
    texts = ["", " ", "w", "a a", "a  a   a", "the the the the",
             "tab\tsep\ttab", "中文 中文 没有", "a b a b a b a",
             "x " * 50 + "y"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = add_repetition_stats(tbl).to_pandas().sort_values("doc_id")
    want = duckdb.sql(r"""
        WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                   FROM tbl),
        base AS (SELECT doc_id, len(ws) AS n_words,
                 len(list_distinct(ws)) AS n_distinct_words, ws FROM w),
        tw AS (SELECT doc_id, max(c) AS top_word_n FROM (
               SELECT doc_id, word, count(*) AS c FROM (
               SELECT doc_id, unnest(ws) AS word FROM w)
               GROUP BY doc_id, word) GROUP BY doc_id),
        tg AS (SELECT doc_id, max(c) AS top_2gram_n FROM (
               SELECT doc_id, gram, count(*) AS c FROM (
               SELECT doc_id, unnest(list_transform(
                   range(1, greatest(len(ws), 1)),
                   i -> ws[i] || ' ' || ws[i+1])) AS gram
               FROM w WHERE len(ws) >= 2) GROUP BY doc_id, gram)
               GROUP BY doc_id)
        SELECT b.doc_id, b.n_words, b.n_distinct_words,
               coalesce(tw.top_word_n, 0) AS top_word_n,
               coalesce(tg.top_2gram_n, 0) AS top_2gram_n
        FROM base b LEFT JOIN tw USING (doc_id) LEFT JOIN tg USING (doc_id)
        ORDER BY doc_id""").fetchdf()
    for c in ["n_words", "n_distinct_words", "top_word_n", "top_2gram_n"]:
        assert out[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


# --- deterministic hash sampling / splits (stages/sampling.py) --------------

def test_stratified_sample_matches_md5_reference(ray_session):
    """Kept set == the literal hashlib reference per stratum rate, and is
    id-keyed: rerun and grown-corpus runs keep the same rows."""
    import hashlib
    import ray
    from cuckoofilter_ray.stages.sampling import (stratified_sample,
                                                  threshold_hex)

    rows = [{"doc_id": i, "lang": ["en", "zh", "fr"][i % 3]}
            for i in range(300)]
    ds = ray.data.from_items(rows).repartition(4)
    rates = {"en": 0.7, "zh": 0.3}
    out = stratified_sample(ds, rates, default_rate=0.1, salt="t:") \
        .to_pandas().sort_values("doc_id")
    thr = {k: threshold_hex(v) for k, v in rates.items()}
    dthr = threshold_hex(0.1)
    want = [r["doc_id"] for r in rows
            if hashlib.md5(f"t:{r['doc_id']}".encode()).hexdigest()[:8]
            < thr.get(r["lang"], dthr)]
    assert out["doc_id"].tolist() == want
    # growth stability: the 300-row corpus' fate is a subset decision —
    # running on the first half keeps exactly the kept ids below 150
    half = stratified_sample(ray.data.from_items(rows[:150]), rates,
                             default_rate=0.1, salt="t:") \
        .to_pandas()["doc_id"].tolist()
    assert sorted(half) == [i for i in want if i < 150]


def test_stratified_sample_splitmix_mode(ray_session):
    """Fast mode: deterministic, salt-sensitive, approximately on-rate."""
    import ray
    from cuckoofilter_ray.stages.sampling import stratified_sample

    rows = [{"doc_id": i, "lang": "en"} for i in range(4000)]
    ds = ray.data.from_items(rows)
    # sorted: the determinism contract is the kept SET — Ray Data does
    # not preserve block order across executions (preserve_order=False)
    a = sorted(stratified_sample(ds, {"en": 0.5}, salt="a:",
                                 mode="splitmix").to_pandas()["doc_id"])
    b = sorted(stratified_sample(ds, {"en": 0.5}, salt="a:",
                                 mode="splitmix").to_pandas()["doc_id"])
    c = sorted(stratified_sample(ds, {"en": 0.5}, salt="b:",
                                 mode="splitmix").to_pandas()["doc_id"])
    assert a == b and a != c
    assert 0.44 < len(a) / 4000 < 0.56


def test_hash_split_partitions_every_row_once(ray_session):
    """Every row gets exactly one split; proportions track the bounds;
    rate-1.0 tail catches the full hex range; malformed bounds raise."""
    import pytest as _pytest
    import ray
    from cuckoofilter_ray.stages.sampling import hash_split

    ds = ray.data.from_items([{"doc_id": i} for i in range(3000)])
    out = hash_split(ds, [("train", 0.8), ("val", 0.9), ("test", 1.0)],
                     salt="sp:").to_pandas().sort_values("doc_id")
    assert len(out) == 3000 and out["split"].notna().all()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # same salt, same assignment on a rerun (sorted: Ray Data does not
    # preserve block order across executions)
    again = hash_split(ds, [("train", 0.8), ("val", 0.9), ("test", 1.0)],
                       salt="sp:").to_pandas().sort_values("doc_id")
    assert out["split"].tolist() == again["split"].tolist()
    with _pytest.raises(ValueError):
        hash_split(ds, [("train", 0.8)])


# --- sequence packing (stages/packing.py) -----------------------------------

def test_pack_tokens_next_fit_kernel():
    """Next-fit invariants: bins are contiguous 1..B, every bin respects
    the budget unless it holds a single oversized doc, and a doc starts a
    new bin exactly when it would overflow the running one."""
    import numpy as np
    from cuckoofilter_ray.stages.packing import _pack_tokens_next_fit

    tok = np.array([50, 60, 30, 200, 10, 10, 128, 1], dtype=np.int64)
    bins = _pack_tokens_next_fit(tok, 128)
    # [50,60]=110 | [30] (140>128) | [200] oversize-alone | [10,10]
    # | [128] exactly fills | [1] (128+1 overflows)
    assert bins.tolist() == [1, 1, 2, 3, 4, 4, 5, 6]
    for b in np.unique(bins):
        members = tok[bins == b]
        assert members.sum() <= 128 or len(members) == 1
    assert np.all(np.diff(bins) >= 0) and bins[0] == 1
    assert _pack_tokens_next_fit(np.empty(0, np.int64), 128).size == 0
    # all-oversize: one per bin
    assert _pack_tokens_next_fit(
        np.array([300, 300], np.int64), 128).tolist() == [1, 2]


def test_pack_sequences_partition_invariant(ray_session):
    """The packing layout is pure id arithmetic: 1-block and 7-block runs
    of the same corpus produce identical (shard, seq_bin) assignments, and
    a precomputed token_col short-circuits the text scan to the same
    answer."""
    import ray
    from cuckoofilter_ray.stages.packing import pack_sequences

    rows = [{"doc_id": i, "text": "w " * ((i * 37) % 90) + "end"}
            for i in range(400)]
    one = pack_sequences(ray.data.from_items(rows).repartition(1),
                         budget=100, shard_size=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = pack_sequences(ray.data.from_items(rows).repartition(7),
                          budget=100, shard_size=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
    assert one["shard"].tolist() == [i // 64 for i in range(400)]
    pre = [{"doc_id": r["doc_id"], "n_tok": len(r["text"].split())}
           for r in rows]
    viatok = pack_sequences(ray.data.from_items(pre), budget=100,
                            shard_size=64, token_col="n_tok").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert viatok["seq_bin"].tolist() == one["seq_bin"].tolist()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences(ray.data.from_items(pre), budget=0)


# --- per-group caps (stages/sampling.py cap_per_group) -----------------------

def test_cap_per_group_matches_md5_reference(ray_session):
    """Winners == the k smallest (md5-priority, id) rows per group, full
    rows, regardless of block layout; an existing column can rank too."""
    import hashlib
    import pandas as pd
    import ray
    from cuckoofilter_ray.stages.sampling import cap_per_group

    rows = [{"doc_id": i, "grp": f"g{i % 13}", "payload": i * 7 % 101}
            for i in range(500)]
    ds = ray.data.from_items(rows).repartition(7)
    out = cap_per_group(ds, "grp", 5, salt="c:").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    df = pd.DataFrame(rows)
    df["_prio"] = [hashlib.md5(f"c:{i}".encode()).hexdigest()[:8]
                   for i in df.doc_id]
    want = df.sort_values(["_prio", "doc_id"], kind="stable") \
        .groupby("grp", sort=False).head(5) \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["payload"].tolist() == want["payload"].tolist()
    assert out.groupby("grp").size().max() <= 5
    # rank by an existing column instead (ascending payload, id tiebreak)
    out2 = cap_per_group(ds, "grp", 3, priority_col="payload") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want2 = df.drop(columns=["_prio"]) \
        .sort_values(["payload", "doc_id"], kind="stable") \
        .groupby("grp", sort=False).head(3) \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2["doc_id"].tolist() == want2["doc_id"].tolist()


# --- PII redaction (stages/redact.py) ----------------------------------------

def test_pii_redact_patterns_and_order(ray_session):
    """Default patterns hit emails/IPv4s/phones, placeholders replace the
    full span, counts are per-state (an email's digits can't later fire
    the phone pattern), and clean text passes through untouched."""
    import pyarrow as pa
    from cuckoofilter_ray.stages.redact import redact_batch

    t = pa.table({"doc_id": [0, 1, 2, 3], "text": [
        "write bob.smith+x@ex-a.co.uk today",
        "hosts 10.2.255.7 192.168.0.1 end",
        "call +1 (555) 010-2233 now",
        "no pii here",
    ]})
    out = redact_batch(t).to_pandas()
    assert out["text"].tolist() == [
        "write <EMAIL> today",
        "hosts <IP> <IP> end",
        "call <PHONE> now",
        "no pii here",
    ]
    assert out["n_email"].tolist() == [1, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0, 0]
    assert out["n_phone"].tolist() == [0, 0, 1, 0]
    # order contract: digits consumed by an earlier pattern are invisible
    # to later ones — the email's +123456789 local part is NOT a phone
    t2 = pa.table({"doc_id": [0], "text": ["+123456789@ex.com"]})
    o2 = redact_batch(t2).to_pandas()
    assert o2["text"][0] == "<EMAIL>" and o2["n_phone"][0] == 0


def test_pii_redact_streaming_counts(ray_session):
    """Dataset form: one pass, every row present, counts int64."""
    import ray
    from cuckoofilter_ray.stages.redact import pii_redact

    rows = [{"doc_id": i,
             "text": f"u{i}@ex.com says hi" if i % 2 == 0 else "plain"}
            for i in range(200)]
    out = pii_redact(ray.data.from_items(rows).repartition(4)).to_pandas()
    assert len(out) == 200
    assert int(out["n_email"].sum()) == 100
    assert (out.loc[out.doc_id % 2 == 0, "text"]
            .str.startswith("<EMAIL>")).all()


# --- ExactSubstr removal (stages/decontaminate.py exactsubstr_dedup) --------

def test_exactsubstr_removes_shared_spans(ray_session):
    """Words covered by a cross-document duplicated 8-gram are cut, the
    rest survive in order; a fully-duplicated doc empties; zero-removal
    docs agree with duplicated_gram_stats' n_dup == 0; block layout
    doesn't change the answer."""
    import ray
    from cuckoofilter_ray.stages.decontaminate import (
        duplicated_gram_stats, exactsubstr_dedup)

    shared = "alpha beta gamma delta epsilon zeta eta theta"   # 8 words
    rows = [
        {"doc_id": 0, "text": f"one two {shared} three four"},
        {"doc_id": 1, "text": f"{shared} tail words here"},
        {"doc_id": 2, "text": "totally unrelated text with enough words"},
        {"doc_id": 3, "text": shared},                 # fully duplicated
        {"doc_id": 4, "text": "short doc"},            # < k words
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = exactsubstr_dedup(ds, k=8, seed=7).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "text_clean"] == "one two three four"
    assert out.loc[0, "n_removed"] == 8 and out.loc[0, "n_words"] == 12
    assert out.loc[1, "text_clean"] == "tail words here"
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[3, "text_clean"] == "" and out.loc[3, "n_removed"] == 8
    assert out.loc[4, "text_clean"] == "short doc"
    stats = duplicated_gram_stats(ds, k=8, seed=7).to_pandas() \
        .set_index("doc_id").sort_index()
    assert ((stats["n_dup"] == 0) == (out["n_removed"] == 0)).all()
    # partition invariance
    out2 = exactsubstr_dedup(ray.data.from_items(rows).repartition(1),
                             k=8, seed=7).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out2["text_clean"].tolist() == out["text_clean"].tolist()


def test_exactsubstr_prescreen_paths_identical(ray_session):
    """The AMQ-prescreened and direct-searchsorted membership paths of the
    removal pass return identical tables (the auto rule only picks the
    cheaper one)."""
    import numpy as np
    import ray
    from cuckoofilter_ray.stages.decontaminate import exactsubstr_dedup

    rng = np.random.default_rng(11)
    vocab = [f"w{z}" for z in range(40)]
    rows = [{"doc_id": i, "text": " ".join(rng.choice(vocab, size=25))}
            for i in range(80)]
    rows += [{"doc_id": 100 + i, "text": rows[i]["text"]} for i in range(6)]
    ds = ray.data.from_items(rows).repartition(4)
    a = exactsubstr_dedup(ds, k=5, seed=3, prescreen=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = exactsubstr_dedup(ds, k=5, seed=3, prescreen=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["n_removed"] > 0).any()


# --- context-window chunking (stages/packing.py chunk_documents) ------------

def test_chunk_documents_windows_and_edges(ray_session):
    """Window boundaries, overlap stitching, whitespace-run tokens, empty
    and short docs, and partition invariance."""
    import pytest as _pytest
    import ray
    from cuckoofilter_ray.stages.packing import chunk_documents

    w = [f"t{i}" for i in range(10)]
    rows = [
        {"doc_id": 0, "text": " ".join(w)},         # 10 tokens
        {"doc_id": 1, "text": "a  b\t c \n d"},     # whitespace runs: 4
        {"doc_id": 2, "text": ""},                   # empty: 1 empty chunk
        {"doc_id": 3, "text": "only three words"},   # < window
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = chunk_documents(ds, 4, overlap=1).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    d0 = out[out.doc_id == 0]
    # stride 3: starts 0,3,6 cover to 10 -> 1+ceil((10-4)/3)=3 chunks
    assert d0["text_chunk"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert d0["n_tokens"].tolist() == [4, 4, 4]
    d1 = out[out.doc_id == 1]
    assert d1["text_chunk"].tolist() == ["a b c d"]   # runs collapse
    d2 = out[out.doc_id == 2]
    assert d2["text_chunk"].tolist() == [""] and d2["n_tokens"].tolist() == [0]
    d3 = out[out.doc_id == 3]
    assert d3["text_chunk"].tolist() == ["only three words"]
    # overlap stitching: consecutive chunks share exactly `overlap` tokens
    assert d0["text_chunk"].iloc[0].split()[-1] == \
        d0["text_chunk"].iloc[1].split()[0]
    # partition invariance
    out1 = chunk_documents(ray.data.from_items(rows).repartition(1),
                           4, overlap=1).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert out.equals(out1)
    with _pytest.raises(ValueError):
        chunk_documents(ds, 4, overlap=4)
    # uneven tail: 10 tokens, window 4, no overlap -> 4,4,2
    out2 = chunk_documents(ds, 4).to_pandas()
    assert out2[out2.doc_id == 0]["n_tokens"].tolist() == [4, 4, 2]


def test_chunk_documents_matches_reference_property(ray_session):
    """Random word lists / window / overlap — engine chunks == the literal
    sliding-window reference."""
    import numpy as np
    import ray
    from cuckoofilter_ray.stages.packing import chunk_documents

    rng = np.random.default_rng(21)
    for trial in range(6):
        mx = int(rng.integers(1, 9))
        ov = int(rng.integers(0, mx))
        stride = mx - ov
        texts = [" ".join(f"w{int(x)}" for x in
                          rng.integers(0, 9, size=rng.integers(0, 30)))
                 for _ in range(40)]
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]) \
            .repartition(4)
        out = chunk_documents(ds, mx, overlap=ov).to_pandas() \
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        ref = []
        for i, t in enumerate(texts):
            w = t.split() if t else []
            n = len(w)
            nc = 1 if n <= mx else 1 + -(-(n - mx) // stride)
            for c in range(nc):
                s = c * stride
                e = min(s + mx, n)
                ref.append((i, c, e - s, " ".join(w[s:e])))
        assert list(map(tuple, out[["doc_id", "chunk_id", "n_tokens",
                                    "text_chunk"]].itertuples(index=False))) \
            == ref, (mx, ov)


def test_cap_per_group_null_groups_and_bad_k(ray_session):
    """Null group values form a capped group of their own (not dropped);
    k <= 0 raises."""
    import pytest as _pytest
    import ray
    from cuckoofilter_ray.stages.sampling import cap_per_group

    rows = [{"doc_id": i, "grp": (None if i % 3 == 0 else f"g{i % 2}")}
            for i in range(60)]
    ds = ray.data.from_items(rows).repartition(3)
    out = cap_per_group(ds, "grp", 4, salt="n:").to_pandas()
    sizes = out.groupby("grp", dropna=False).size()
    assert sizes.max() <= 4
    assert out["grp"].isna().sum() == 4          # null group capped, kept
    with _pytest.raises(ValueError):
        cap_per_group(ds, "grp", 0)


def test_pii_redact_null_text(ray_session):
    """Null text scrubs to '' with zero counts (no null propagation)."""
    import pyarrow as pa
    from cuckoofilter_ray.stages.redact import redact_batch

    t = pa.table({"doc_id": [0, 1], "text": pa.array([None, "a@b.io"],
                                                     pa.string())})
    out = redact_batch(t).to_pandas()
    assert out["text"].tolist() == ["", "<EMAIL>"]
    assert out["n_email"].tolist() == [0, 1]


def test_exactsubstr_precomputed_dup_set(ray_session):
    """duplicated_gram_hashes + dup_hashes= skips phase 1 and returns the
    identical table."""
    import numpy as np
    import ray
    from cuckoofilter_ray.stages.decontaminate import (
        duplicated_gram_hashes, exactsubstr_dedup)

    rng = np.random.default_rng(13)
    vocab = [f"w{z}" for z in range(30)]
    rows = [{"doc_id": i, "text": " ".join(rng.choice(vocab, size=20))}
            for i in range(50)]
    rows += [{"doc_id": 100 + i, "text": rows[i]["text"]} for i in range(5)]
    ds = ray.data.from_items(rows).repartition(3)
    dh = duplicated_gram_hashes(ds, k=6, seed=4)
    a = exactsubstr_dedup(ds, k=6, seed=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = exactsubstr_dedup(ds, k=6, seed=4, dup_hashes=dh).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and (a["n_removed"] > 0).any()


def test_exactsubstr_join_path_matches_broadcast(ray_session):
    """Above broadcast_bound the removal runs as the (gram,id,pos) join
    path — identical output to the broadcast path on a corpus with
    duplicates, no-hit docs, empty docs, and docs shorter than k."""
    import numpy as np
    import ray
    from cuckoofilter_ray.stages.decontaminate import (
        duplicated_gram_hashes, exactsubstr_dedup)

    rng = np.random.default_rng(17)
    vocab = [f"w{z}" for z in range(35)]
    rows = [{"doc_id": i, "text": " ".join(rng.choice(vocab, size=22))}
            for i in range(70)]
    rows += [{"doc_id": 100 + i, "text": rows[i]["text"]} for i in range(5)]
    rows += [{"doc_id": 200, "text": ""}, {"doc_id": 201, "text": "a b"}]
    ds = ray.data.from_items(rows).repartition(5)
    a = exactsubstr_dedup(ds, k=5, seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = exactsubstr_dedup(ds, k=5, seed=3, broadcast_bound=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and (a["n_removed"] > 0).any()
    # precomputed dup set + forced join path
    dh = duplicated_gram_hashes(ds, k=5, seed=3)
    c = exactsubstr_dedup(ds, k=5, seed=3, dup_hashes=dh,
                          broadcast_bound=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(c)
    # ultra-sparse hits side (ONE duplicated pair): the regime where
    # Dataset.join's empty hash partitions went schemaless (ray 2.49)
    rows2 = [{"doc_id": i, "text": " ".join(f"u{i}w{j}" for j in range(12))}
             for i in range(40)]
    rows2.append({"doc_id": 100, "text": rows2[0]["text"]})
    ds2 = ray.data.from_items(rows2).repartition(3)
    s1 = exactsubstr_dedup(ds2, k=5, seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    s2 = exactsubstr_dedup(ds2, k=5, seed=3, broadcast_bound=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert s1.equals(s2) and int((s1["n_removed"] > 0).sum()) == 2
