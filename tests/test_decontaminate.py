"""Decontamination stage vs a pure-Python string-set reference.

The gram definition must match DuckDB's
``array_to_string(string_split(text,' ')[i:i+k-1], ' ')`` exactly —
including empty words from consecutive/trailing spaces — so the reference
here builds literal gram STRINGS and the pipeline must agree on every
count (hash collisions are the only admissible divergence, ~2^-64)."""

import numpy as np
import pytest

from cuckoofilter_ray.stages.decontaminate import (
    benchmark_gram_set,
    decontaminate,
    distinct_gram_hashes,
    word_gram_hashes,
)


def ref_grams(text: str, k: int) -> list:
    w = (text or "").split(" ")
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


CORPUS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog again and again",  # dup
    "a b c",                              # fewer than k words -> 0 grams
    "",                                   # empty -> 0 grams
    "x  y   z trailing ",                 # consecutive + trailing spaces
    "one two three four five six seven eight nine ten",
    "pad pad the quick brown fox jumps over the lazy dog zzz",  # partial
    "solo word pair here makes grams the quick brown fox jumps over",
]
K = 4
SEED = 77


def test_gram_hash_counts_match_string_reference():
    h, counts = word_gram_hashes(CORPUS, K, SEED)
    for d, t in enumerate(CORPUS):
        assert counts[d] == len(ref_grams(t, K)), t
    # equal gram strings <-> equal hashes (across positions and docs)
    allg = [g for t in CORPUS for g in ref_grams(t, K)]
    by_hash, by_str = {}, {}
    for gh, gs in zip(h.tolist(), allg):
        by_hash.setdefault(gh, set()).add(gs)
        by_str.setdefault(gs, set()).add(gh)
    assert all(len(v) == 1 for v in by_hash.values()), "hash collision"
    assert all(len(v) == 1 for v in by_str.values()), "position-dependent hash"


def test_distinct_gram_hashes_match_reference_sets():
    _, doc, nd = distinct_gram_hashes(CORPUS, K, SEED)
    for d, t in enumerate(CORPUS):
        assert nd[d] == len(set(ref_grams(t, K))), t
    assert (np.bincount(doc, minlength=len(CORPUS)) == nd).all()


@pytest.mark.parametrize("use_amq", [True, False])
def test_scores_match_string_reference(ray_session, use_amq):
    import ray

    bench = CORPUS[:2] + ["the quick brown fox jumps over the lazy dog"]
    docs = CORPUS[2:]
    bset = set(g for t in bench for g in ref_grams(t, K))
    bh = benchmark_gram_set(bench, k=K, seed=SEED)
    assert len(bh) == len(bset)

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    # use_amq=True forces the prescreen path (the auto rule would skip the
    # AMQ below _PRESCREEN_MIN); False is the direct-searchsorted path
    kw = {"prescreen": True} if use_amq \
        else {"bits_per_tag": 16, "prescreen": False}
    out = decontaminate(ds, bh, k=K, seed=SEED, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, row in out.iterrows():
        grams = set(ref_grams(docs[int(row.doc_id)], K))
        hits = len(grams & bset)
        assert row.n_grams == len(grams)
        assert row.n_hit == hits, docs[int(row.doc_id)]
        assert row.flagged == (2 * hits >= len(grams) and len(grams) > 0)


def test_amq_prescreen_is_exact_under_forced_fps(ray_session):
    """A tiny 4-bit-tag filter produces real AMQ false positives; the exact
    confirmation must scrub every one of them."""
    import ray

    rng = np.random.default_rng(5)
    vocab = [f"w{z}" for z in range(50)]
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    bench = docs[:5]
    bset = set(g for t in bench for g in ref_grams(t, 3))
    bh = benchmark_gram_set(bench, k=3, seed=SEED)
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    out = decontaminate(ds, bh, k=3, seed=SEED, bits_per_tag=4,
                        prescreen=True) \
        .to_pandas().sort_values("doc_id")
    for _, row in out.iterrows():
        grams = set(ref_grams(docs[int(row.doc_id)], 3))
        assert row.n_hit == len(grams & bset)


from hypothesis import given, settings, strategies as st  # noqa: E402

_texts = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=120),
    min_size=0, max_size=24)


@settings(max_examples=40, deadline=None)
@given(texts=_texts, k=st.integers(1, 5), seed=st.integers(0, 2**31 - 1))
def test_gram_hashing_matches_string_reference_on_arbitrary_text(
        texts, k, seed):
    """Property form over arbitrary unicode (newlines, tabs, emoji,
    consecutive/leading/trailing spaces): per-doc counts and distinct
    counts equal the literal string reference, equal gram strings hash
    equal across all docs/positions, and distinct strings never collide
    at these sizes."""
    h, counts = word_gram_hashes(texts, k, seed)
    allg = [g for t in texts for g in ref_grams(t, k)]
    assert len(h) == len(allg)
    assert counts.sum() == len(allg)
    by_hash, by_str = {}, {}
    for gh, gs in zip(h.tolist(), allg):
        by_hash.setdefault(gh, set()).add(gs)
        by_str.setdefault(gs, set()).add(gh)
    assert all(len(v) == 1 for v in by_hash.values())
    assert all(len(v) == 1 for v in by_str.values())
    _, _, nd = distinct_gram_hashes(texts, k, seed)
    for d, t in enumerate(texts):
        assert nd[d] == len(set(ref_grams(t, k)))


def test_empty_benchmark_flags_nothing(ray_session):
    import ray

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    out = decontaminate(ds, np.empty(0, dtype=np.uint64), k=K,
                        seed=SEED).to_pandas()
    assert (out.n_hit == 0).all() and (~out.flagged).all()


# --- cross-document duplicated grams (duplicated_gram_stats) ----------------

def _ref_dup_stats(corpus, k, min_docs=2):
    """Literal-string reference: per doc, distinct k-grams and how many of
    them occur in >= min_docs distinct documents."""
    per_doc = [set(ref_grams(t, k)) for t in corpus]
    from collections import Counter
    ndocs = Counter(g for s in per_doc for g in s)
    dup = {g for g, c in ndocs.items() if c >= min_docs}
    return [(len(s), len(s & dup)) for s in per_doc]


@pytest.mark.parametrize("path", ["broadcast", "join"])
def test_duplicated_gram_stats_matches_reference(ray_session, path):
    """Both the broadcast path and the hash-join fallback reproduce the
    literal-string reference (n_grams, n_dup, frac) on a corpus with an
    exact dup, a partial overlap, short/empty docs, and space runs."""
    import ray
    from cuckoofilter_ray.stages.decontaminate import duplicated_gram_stats

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]) \
        .repartition(3)
    kwargs = {"k": K, "seed": SEED}
    if path == "join":
        kwargs.update(broadcast_bound=0, num_buckets=2)
    out = duplicated_gram_stats(ds, **kwargs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _ref_dup_stats(CORPUS, K)
    assert out["n_grams"].tolist() == [w[0] for w in want]
    assert out["n_dup"].tolist() == [w[1] for w in want]
    for i, (ng, nd) in enumerate(want):
        assert out.loc[i, "dup_gram_frac"] == nd / max(ng, 1)
    # the exact-dup pair is fully duplicated; the all-unique doc is clean
    assert out.loc[0, "dup_gram_frac"] == 1.0
    assert out.loc[1, "dup_gram_frac"] == 1.0
    assert out.loc[5, "n_dup"] == 0


def test_duplicated_gram_stats_min_docs_threshold(ray_session):
    """min_docs=3 keeps only grams shared by >= 3 documents (the 'quick
    brown fox' span occurs in 4 docs of CORPUS; the exact-dup-only grams
    occur in 2 and drop out)."""
    import ray
    from cuckoofilter_ray.stages.decontaminate import duplicated_gram_stats

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)])
    out = duplicated_gram_stats(ds, k=K, seed=SEED, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _ref_dup_stats(CORPUS, K, min_docs=3)
    assert out["n_grams"].tolist() == [w[0] for w in want]
    assert out["n_dup"].tolist() == [w[1] for w in want]
    assert 0 < out.loc[0, "n_dup"] < out.loc[0, "n_grams"]


# --- ExactSubstr removal: property form vs a brute-force reference ----------

def _ref_removal(texts, k):
    """Literal string-set reference: dup gram = in >= 2 docs' distinct
    sets; every occurrence covers its k words."""
    grams = [[" ".join(t.split(" ")[i:i + k])
              for i in range(len(t.split(" ")) - k + 1)] for t in texts]
    from collections import Counter
    c = Counter(g for gs in grams for g in set(gs))
    dup = {g for g, n in c.items() if n >= 2}
    out = []
    for t, gs in zip(texts, grams):
        w = t.split(" ")
        cov = [False] * len(w)
        for i, g in enumerate(gs):
            if g in dup:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [x for x, cv in zip(w, cov) if not cv]
        out.append((" ".join(kept), len(w), sum(cov)))
    return out


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd", ""]),
                         min_size=0, max_size=12),
                min_size=1, max_size=14),
       st.integers(1, 4))
def test_exactsubstr_matches_bruteforce_reference(word_lists, k):
    """Small-vocab random corpora (forced gram collisions, empty words,
    docs shorter than k) — engine removal == the literal reference."""
    import ray
    from cuckoofilter_ray.stages.decontaminate import exactsubstr_dedup

    texts = [" ".join(ws) for ws in word_lists]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = exactsubstr_dedup(ds, k=k, seed=99).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _ref_removal(texts, k)
    assert out["text_clean"].tolist() == [r[0] for r in ref]
    assert out["n_words"].tolist() == [r[1] for r in ref]
    assert out["n_removed"].tolist() == [r[2] for r in ref]


def test_duplicated_gram_stats_join_path_sparse(ray_session):
    """ONE duplicated pair through the forced join path — the regime
    where Dataset.join's empty hash partitions went schemaless; the
    union-merge attach must equal the broadcast path exactly."""
    import ray
    from cuckoofilter_ray.stages.decontaminate import duplicated_gram_stats

    rows = [{"doc_id": i,
             "text": " ".join(f"u{i}w{j}" for j in range(12))}
            for i in range(40)]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    ds = ray.data.from_items(rows).repartition(3)
    a = duplicated_gram_stats(ds, k=5, seed=3, broadcast_bound=0,
                              num_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = duplicated_gram_stats(ds, k=5, seed=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and int((a["n_dup"] > 0).sum()) == 2


def test_exactsubstr_all_paths_randomized_parity(ray_session):
    """Seeded-random corpora (empty docs, sub-k docs, full dups, partial
    splice overlaps) through ALL FOUR removal paths — broadcast,
    forced join, precomputed dup set, precomputed + forced join — plus
    both duplicated_gram_stats paths; every output table must be
    identical (the permanent form of the session-7 fuzz campaign)."""
    import numpy as np
    import ray
    from cuckoofilter_ray.stages.decontaminate import (
        duplicated_gram_hashes, duplicated_gram_stats, exactsubstr_dedup)

    rng = np.random.default_rng(77)

    def srt(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    for trial in range(3):
        vocab = [f"w{z}" for z in range(int(rng.integers(8, 40)))]
        rows = []
        for i in range(int(rng.integers(25, 90))):
            r = rng.random()
            n = 0 if r < 0.1 else int(rng.integers(1, 4)) if r < 0.2 \
                else int(rng.integers(4, 50))
            rows.append({"doc_id": i,
                         "text": " ".join(rng.choice(vocab, size=n))})
        for j in range(int(rng.integers(1, 8))):      # full duplicates
            rows.append({"doc_id": 1000 + j,
                         "text": rows[int(rng.integers(0, 20))]["text"]})
        for j in range(int(rng.integers(1, 8))):      # spliced overlaps
            a = rows[int(rng.integers(0, 20))]["text"].split(" ")
            b = rows[int(rng.integers(0, 20))]["text"].split(" ")
            rows.append({"doc_id": 2000 + j, "text": " ".join(
                a[:int(rng.integers(0, len(a) + 1))] +
                b[int(rng.integers(0, len(b) + 1)):])})
        k = int(rng.integers(2, 8))
        seed = int(rng.integers(1, 1 << 30))
        ds = ray.data.from_items(rows) \
            .repartition(int(rng.integers(1, 6)))
        a = srt(exactsubstr_dedup(ds, k=k, seed=seed))
        b = srt(exactsubstr_dedup(ds, k=k, seed=seed, broadcast_bound=0))
        dh = duplicated_gram_hashes(ds, k=k, seed=seed)
        c = srt(exactsubstr_dedup(ds, k=k, seed=seed, dup_hashes=dh))
        d = srt(exactsubstr_dedup(ds, k=k, seed=seed, dup_hashes=dh,
                                  broadcast_bound=0))
        assert a.equals(b) and a.equals(c) and a.equals(d), \
            f"trial {trial} k={k} seed={seed}"
        s1 = srt(duplicated_gram_stats(ds, k=k, seed=seed))
        s2 = srt(duplicated_gram_stats(
            ds, k=k, seed=seed, broadcast_bound=0,
            num_buckets=int(rng.integers(2, 9))))
        assert s1.equals(s2), f"stats trial {trial} k={k} seed={seed}"
