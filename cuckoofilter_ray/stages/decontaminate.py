"""Benchmark decontamination: flag documents whose word n-grams overlap a
benchmark/eval set — the modern LLM-training use of the approximate-
membership engine (the reference's Contain loop,
``benchmarks/bulk-insert-and-query.cc:636-641``, re-cast as the hot probe
of a text pipeline).

Two-tier membership, the same discipline as ``exact_dedup_filter``
(stages/dedup.py): a broadcast cuckoo filter over the benchmark's distinct
gram hashes prescreens every document gram — AMQ-negative grams are
*definitely* clean (zero false negatives) and skip verification; AMQ-
positive grams are confirmed against the exact sorted hash array, so the
reported counts are exact, not ε-approximate.  At 100 TB the benchmark
side stays small (eval sets are 10⁴–10⁷ grams): both blobs broadcast once
via ``ray.put`` and the corpus streams through ``map_batches`` with NO
shuffle at all; if the exact array ever outgrew worker heaps, the AMQ
(12.77 bits/key) still fits and positives would fall back to a bucketed
semi-join — the prescreen keeps that join O(candidate grams), not
O(corpus grams).

Gram identity is faithful to SQL semantics: a word k-gram is
``" ".join(text.split(" ")[i:i+k])`` — exactly DuckDB's
``array_to_string(string_split(text,' ')[i:i+k-1], ' ')`` — and since
splitting on a single space is reversible, that string IS the contiguous
substring of ``text`` between the two word boundaries.  Grams therefore
hash as substrings through ONE pass of position-independent prefix
polynomial hashing over the batch's concatenated UTF-8 bytes (no word
materialization, no Python loop):

    P[i]   = Σ_{j<i} c[j]·B⁻ʲ          (cumsum; B odd ⇒ invertible mod 2⁶⁴)
    H(l,r) = Bʳ · (P[r] − P[l])        = B^(r−l) · Σ_t c[l+t]·B⁻ᵗ

which depends only on the substring's characters and length — equal
substrings anywhere in the batch collide exactly, unequal ones split with
the usual 2⁻⁶⁴-style polynomial caveat (then ``mix_split`` finalizes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..kernels.hashing import mix_split
from ..kernels.serde import filter_to_row, make_filter, row_to_filter
from ..util import cache_get

_B = np.uint64(1099511628211)           # FNV prime, odd => invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))
_SPACE = np.uint64(32)


def word_gram_hashes(texts, k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of every word ``k``-gram of every text (with multiplicity).

    Returns ``(hashes, counts)`` — one uint64 hash per gram, concatenated
    in document order, and the per-document gram count
    ``max(0, n_words - k + 1)``.  Word splitting matches DuckDB's
    ``string_split(text, ' ')`` exactly (consecutive spaces produce empty
    words; a trailing space produces a trailing empty word).

    ``texts`` may be an Arrow string array (the zero-copy hot path: the
    UTF-8 data buffer is hashed in place — a space byte 0x20 cannot occur
    inside a multi-byte sequence, so byte-substring identity equals
    string identity) or any sequence of ``str``/None."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([t if t is not None else "" for t in texts],
                         pa.large_string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_string(texts.type):
        texts = texts.cast(pa.large_string())      # 64-bit offsets, same data
    if texts.null_count:
        texts = texts.fill_null("")
    ndocs = len(texts)
    counts = np.zeros(ndocs, dtype=np.int64)
    if ndocs == 0:
        return np.empty(0, dtype=np.uint64), counts
    bufs = texts.buffers()                          # [validity, offsets, data]
    offs = np.frombuffer(bufs[1], dtype=np.int64)[
        texts.offset:texts.offset + ndocs + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    c = data[offs[0]:offs[-1]].astype(np.uint64)
    n = len(c)
    dco = (offs - offs[0]).astype(np.int64)         # doc byte offsets

    # prefix hashes: P[i] = sum_{j<i} c[j] * Binv^j  (everything wraps 2^64)
    binv_pow = np.full(n, _BINV, dtype=np.uint64)
    if n:
        binv_pow[0] = 1
        np.cumprod(binv_pow, out=binv_pow)
    pref = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(c * binv_pow, out=pref[1:])
    b_pow = np.full(n + 1, _B, dtype=np.uint64)
    b_pow[0] = 1
    np.cumprod(b_pow, out=b_pow)

    # word starts/ends per doc (char indices): doc start + one past each space
    sp = np.flatnonzero(c == _SPACE)
    sp_doc = np.searchsorted(dco, sp, side="right") - 1
    nw = np.bincount(sp_doc, minlength=ndocs).astype(np.int64) + 1
    total_w = int(nw.sum())
    wo = np.zeros(ndocs + 1, dtype=np.int64)           # word index offsets
    np.cumsum(nw, out=wo[1:])
    ws = np.empty(total_w, dtype=np.int64)             # word start char idx
    first = np.zeros(total_w, dtype=bool)
    first[wo[:-1]] = True
    ws[first] = dco[:-1]
    ws[~first] = sp + 1                                # doc-ordered ascending
    we = np.empty(total_w, dtype=np.int64)             # word end char idx
    we[:-1] = ws[1:] - 1
    last = np.zeros(total_w, dtype=bool)
    last[wo[1:] - 1] = True
    we[last] = dco[1:]

    counts = np.maximum(nw - k + 1, 0)
    total_g = int(counts.sum())
    if total_g == 0:
        return np.empty(0, dtype=np.uint64), counts
    go = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(counts[:-1], out=go[1:])
    # global word index of gram (d, j) = wo[d] + j  (same idiom as _sig_chunk)
    gidx = np.arange(total_g, dtype=np.int64) \
        - np.repeat(go, counts) + np.repeat(wo[:-1], counts)
    l = ws[gidx]
    r = we[gidx + k - 1]
    h = b_pow[r] * (pref[r] - pref[l])
    return mix_split(h, seed), counts


def distinct_gram_hashes(texts, k: int, seed: int) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document DISTINCT gram hashes: ``(hashes, doc_idx, n_distinct)``
    with ``hashes`` sorted within each document segment."""
    h, counts = word_gram_hashes(texts, k, seed)
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((h, doc))
    h, doc = h[order], doc[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (doc[1:] != doc[:-1])
    h, doc = h[keep], doc[keep]
    return h, doc, np.bincount(doc, minlength=len(counts)).astype(np.int64)


def benchmark_gram_set(texts, k: int = 8, seed: int = 4242) -> np.ndarray:
    """Sorted distinct gram-hash array of the benchmark texts (small side:
    one vectorized pass on the driver, then broadcast via ``ray.put``)."""
    h, _ = word_gram_hashes(texts, k, seed)
    return np.unique(h)


_CACHE: dict = {}

# auto-prescreen bound: below this benchmark-set size the per-worker AMQ
# decode (O(set), ~0.3-1.5 s at 2M entries — measured, NOTES r5s6) costs
# more than it ever saves vs direct binary search of the broadcast exact
# array; above it the exact array outgrows caches (27 random touches per
# probe) and the 2-touch 12-bit AMQ prescreen pays for its decode
_PRESCREEN_MIN = 8_000_000


def _broadcast_membership(hashes: np.ndarray, *, seed: int,
                          bits_per_tag: int, prescreen: Optional[bool]):
    """Broadcast a sorted hash set for worker-side exact membership:
    returns ``(filter_ref, exact_ref)`` where ``filter_ref`` is a cuckoo
    AMQ row (or None when prescreening doesn't pay — see
    `_PRESCREEN_MIN`; ``bits_per_tag`` only matters when it does)."""
    import ray

    if prescreen is None:
        prescreen = len(hashes) >= _PRESCREEN_MIN
    filter_ref = None
    if prescreen:
        filt = make_filter("cuckoo", max(16, len(hashes)), seed,
                           bits_per_tag)
        if len(hashes):
            filt.add_batch(hashes)
        filter_ref = ray.put(filter_to_row(filt))
    return filter_ref, ray.put(hashes)


def _member_mask(h: np.ndarray, filt, exact: np.ndarray) -> np.ndarray:
    """Exact membership of ``h`` in sorted ``exact``; ``filt`` (optional
    AMQ) only prunes the binary-search candidate set — zero FN either way."""
    hit = np.zeros(len(h), dtype=bool)
    if len(h) == 0 or len(exact) == 0:
        return hit
    if filt is None:
        pos = np.searchsorted(exact, h)
        pos[pos == len(exact)] = 0
        return exact[pos] == h
    maybe = filt.contain_batch(h)
    if maybe.any():                         # confirm AMQ positives exactly
        cand = np.flatnonzero(maybe)
        pos = np.searchsorted(exact, h[cand])
        pos[pos == len(exact)] = 0
        hit[cand] = exact[pos] == h[cand]
    return hit


def contamination_score_fn(batch: pa.Table, *, filter_ref=None,
                           exact_ref=None, k: int = 8, seed: int = 4242,
                           column: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Stateless batch stage: per document, DISTINCT word-k-gram count and
    how many of those grams appear in the benchmark set.

    Runs as plain tasks on the warm worker pool — the broadcasts resolve
    once per worker PROCESS (bounded ``cache_get`` memo keyed by ref), so
    the stateful-setup-once property of an actor pool is kept without
    paying actor spawn/ramp latency per pipeline.  The body is pure
    numpy: zero-copy gram hashing, per-doc distinct, then exact
    membership — direct ``searchsorted`` when ``filter_ref`` is None, or
    a vectorized ``contain_batch`` AMQ prescreen with exact confirmation
    of the positives only (large benchmark sets, see `_PRESCREEN_MIN`)."""
    import ray

    filt = None if filter_ref is None else \
        cache_get(_CACHE, ("filt", filter_ref.hex()),
                  lambda: row_to_filter(ray.get(filter_ref)))
    exact = cache_get(_CACHE, ("exact", exact_ref.hex()),
                      lambda: ray.get(exact_ref))
    texts = batch.column(column)            # Arrow column: zero-copy path
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    h, doc, n_grams = distinct_gram_hashes(texts, k, seed)
    hit = _member_mask(h, filt, exact)
    n_hit = np.bincount(doc[hit], minlength=len(texts)).astype(np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
        "n_hit": pa.array(n_hit, pa.int64()),
        "flagged": pa.array((2 * n_hit >= n_grams) & (n_grams > 0)),
    })


def decontaminate(docs_ds, bench_hashes: np.ndarray, *, k: int = 8,
                  seed: int = 4242, column: str = "text",
                  id_col: str = "doc_id", bits_per_tag: int = 12,
                  concurrency: Optional[int] = None,
                  prescreen: Optional[bool] = None):
    """Score every document of ``docs_ds`` against a benchmark gram set.

    Output: one row per input document — ``(id, n_grams, n_hit, flagged)``
    where ``n_grams`` counts DISTINCT word k-grams, ``n_hit`` how many of
    them occur in the benchmark, and ``flagged`` = overlap ≥ 1/2 (integer
    form ``2·n_hit ≥ n_grams``, exact in SQL too).  Streaming, shuffle-free:
    the benchmark rides as ``ray.put`` broadcasts (exact sorted array,
    plus a cuckoo AMQ when prescreening pays — ``prescreen=None`` decides
    by `_PRESCREEN_MIN`; either way the result is exact, zero FN);
    documents never leave their blocks, and the stage runs as stateless
    tasks (per-worker broadcast cache — no actor spawn latency)."""
    bench_hashes = np.asarray(bench_hashes, dtype=np.uint64)
    # note: bits_per_tag only takes effect when a prescreen filter is
    # actually built (prescreen=True, or auto above _PRESCREEN_MIN)
    filter_ref, exact_ref = _broadcast_membership(
        bench_hashes, seed=seed ^ 0xBEC4, bits_per_tag=bits_per_tag,
        prescreen=prescreen)               # np.unique output => sorted
    kwargs = {"filter_ref": filter_ref, "exact_ref": exact_ref, "k": k,
              "seed": seed, "column": column, "id_col": id_col}
    if concurrency:
        return docs_ds.map_batches(contamination_score_fn,
                                   batch_format="pyarrow",
                                   concurrency=concurrency,
                                   fn_kwargs=kwargs)
    return docs_ds.map_batches(contamination_score_fn,
                               batch_format="pyarrow", fn_kwargs=kwargs)


# --- cross-document duplicated grams (ExactSubstr-style dedup signal) -------


def _dup_gram_dataset(docs_ds, *, k: int, seed: int, column: str,
                      min_docs: int, count_buckets: int):
    """Phase 1 of the ExactSubstr pair (detection AND removal): the
    materialized Dataset of gram hashes occurring in ≥ ``min_docs``
    DISTINCT documents.  The only shuffle of either operator: 16-byte
    pre-aggregated ``(gram_hash, n_docs_in_batch)`` partials, bucketed
    into ``count_buckets`` hash partitions, each reduced by one
    vectorized sort + ``reduceat`` pass (a per-gram ``groupby(h).sum``
    walks rows in Python map-side in ray 2.49 — see NOTES)."""

    def _partials(batch: pa.Table) -> pa.Table:
        h, _doc, _nd = distinct_gram_hashes(batch.column(column), k, seed)
        uh, nd = np.unique(h, return_counts=True)   # per-doc distinct ⇒
        b = (uh % np.uint64(count_buckets)).astype(np.int32)
        return pa.table({                           # count == #docs in batch
            "h": pa.array(uh.view(np.int64), pa.int64()),
            "nd": pa.array(nd.astype(np.int64), pa.int64()),
            "_b": pa.array(b, pa.int32())})

    def _reduce_bucket(t: pa.Table) -> pa.Table:
        # one group == one hash bucket: sort once, segment-sum, threshold
        h = t.column("h").to_numpy(zero_copy_only=False)
        nd = t.column("nd").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, nd = h[order], nd[order]
        uh, idx = np.unique(h, return_index=True)
        sums = np.add.reduceat(nd, idx) if len(nd) else nd
        return pa.table({"h": pa.array(uh[sums >= min_docs], pa.int64())})

    return docs_ds.map_batches(_partials, batch_format="pyarrow",
                               batch_size=None) \
        .groupby("_b").map_groups(_reduce_bucket, batch_format="pyarrow") \
        .materialize()                              # small result


def _split_words(texts: pa.Array):
    """Split an Arrow string column on single spaces (DuckDB
    ``string_split`` semantics): returns ``(offs, flat, nw, total_w)`` —
    normalized word offsets per doc, the flat word array, per-doc word
    counts, and the batch word total."""
    import pyarrow.compute as pc

    words = pc.split_pattern(texts, pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = np.asarray(words.offsets)                # already logical-range
    offs = (offs - offs[0]).astype(np.int64)
    flat = words.flatten()
    return offs, flat, np.diff(offs), int(offs[-1])


def _cut_rebuild(ids: np.ndarray, id_col: str, offs: np.ndarray,
                 flat: pa.Array, nw: np.ndarray, total_w: int,
                 hit_starts: np.ndarray, k: int) -> pa.Table:
    """Shared removal core: given global word-start indices of every
    duplicated-gram occurrence, interval-stab the coverage (±1 diff array
    + cumsum over the batch's flattened word sequence) and rebuild the
    surviving text with one ``ListArray``/``binary_join`` pass."""
    import pyarrow.compute as pc

    ndocs = len(ids)
    covered = np.zeros(total_w, dtype=bool)
    if len(hit_starts):
        diff = np.zeros(total_w + 1, dtype=np.int64)
        np.add.at(diff, hit_starts, 1)
        np.add.at(diff, hit_starts + k, -1)         # s + k ≤ offs[d+1]
        covered = np.cumsum(diff[:-1]) > 0

    word_doc = np.repeat(np.arange(ndocs, dtype=np.int64), nw)
    n_removed = np.bincount(word_doc[covered],
                            minlength=ndocs).astype(np.int64)
    kept_idx = np.flatnonzero(~covered)
    new_offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nw - n_removed, out=new_offs[1:])
    kept_words = flat.take(pa.array(kept_idx, pa.int64()))
    clean = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(new_offs, pa.int64()),
                                      kept_words.cast(pa.large_string())),
        pa.scalar(" ", pa.large_string()))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "text_clean": clean.cast(pa.string()),
        "n_words": pa.array(nw, pa.int64()),
        "n_removed": pa.array(n_removed, pa.int64()),
    })


def remove_duplicated_spans_fn(batch: pa.Table, *, filter_ref=None,
                               exact_ref=None, k: int = 8,
                               seed: int = 4242, column: str = "text",
                               id_col: str = "doc_id") -> pa.Table:
    """Stateless batch stage: cut every word covered by a duplicated gram.

    A word is removed iff SOME occurrence of a duplicated k-gram covers
    it; survivors re-join with single spaces in original order.  Pure
    numpy/Arrow: one zero-copy gram-hash pass (with multiplicity — every
    occurrence covers, unlike the distinct counting pass), exact
    membership via `_member_mask` (direct binary search, or AMQ prescreen
    + confirm for large dup sets), then the shared `_cut_rebuild` core.
    No shuffle, no Python loop."""
    import ray

    filt = None if filter_ref is None else \
        cache_get(_CACHE, ("filt", filter_ref.hex()),
                  lambda: row_to_filter(ray.get(filter_ref)))
    exact = cache_get(_CACHE, ("exact", exact_ref.hex()),
                      lambda: ray.get(exact_ref))
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = texts.fill_null("")
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    ndocs = len(texts)
    offs, flat, nw, total_w = _split_words(texts)

    h, counts = word_gram_hashes(texts, k, seed)    # multiplicity, doc order
    hit_starts = np.empty(0, dtype=np.int64)
    if len(h):
        hit = _member_mask(h, filt, exact)
        if hit.any():
            go = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(counts[:-1], out=go[1:])
            # global word index of gram (d, j) = offs[d] + j
            gws = np.arange(len(h), dtype=np.int64) \
                - np.repeat(go, counts) + np.repeat(offs[:-1], counts)
            hit_starts = gws[hit]
    return _cut_rebuild(ids, id_col, offs, flat, nw, total_w,
                        hit_starts, k)


def _removal_join_path(docs_ds, dup, *, k: int, seed: int, column: str,
                       id_col: str, num_buckets: Optional[int]):
    """Removal without broadcasting the dup set (the > broadcast_bound
    regime): per-gram ``(hash, id, pos)`` rows hash-join the dup Dataset
    (O(gram occurrences) narrow rows, text never rides this exchange),
    hit positions pack into ONE binary row per document, and a bucketed
    UNION + per-bucket merge carries each document's text exactly once
    to the vectorized `_cut_rebuild` (not ``Dataset.join`` — see the
    inline note on empty-partition schemaless tables).  Output identical
    to the broadcast path (pinned by test, incl. a single-hit-doc
    corpus).

    Assumes ``id_col`` values are unique across the corpus: the packed
    hit row is keyed per id and attached via searchsorted, so duplicate
    ids would attribute all hits to one of the copies (the broadcast
    path is position-based and has no such constraint)."""
    import pyarrow.compute as pc
    import ray

    from .relational import hash_join
    if num_buckets is None:
        num_buckets = max(2, min(32,
            int(ray.cluster_resources().get("CPU", 8)) // 2))

    def _gram_pos(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if texts.null_count:
            texts = texts.fill_null("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        h, counts = word_gram_hashes(texts, k, seed)
        doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        go = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=go[1:])
        pos = np.arange(len(h), dtype=np.int64) - go[doc]
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64()),
                         id_col: pa.array(ids[doc], pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    pairs = docs_ds.map_batches(_gram_pos, batch_format="pyarrow",
                                batch_size=None)
    hits = hash_join(pairs, dup, "h", "h", num_buckets=num_buckets) \
        .select_columns([id_col, "pos"])

    def _add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b, pa.int32()))

    def _pack(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False) \
            .astype("<i8", copy=False)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        uids, idx = np.unique(ids, return_index=True)
        loffs = (np.append(idx, len(pos)) * 8).astype(np.int64)
        # positions ride as an 8-byte-LE blob per doc: Acero (Dataset.join)
        # rejects list<> payload columns but passes binary through fine
        blob = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(uids),
            [None, pa.py_buffer(loffs.tobytes()),
             pa.py_buffer(pos.tobytes())])
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "_hits": blob})

    hitlists = hits.map_batches(_add_bucket, batch_format="pyarrow",
                                batch_size=None) \
        .groupby("_b").map_groups(_pack, batch_format="pyarrow")

    # attach via bucketed UNION + per-bucket merge, not Dataset.join:
    # the join operator builds SCHEMALESS tables for hash partitions the
    # sparse hits side leaves empty and Acero then can't resolve the key
    # (ray 2.49; NOTES) — the union shuffle has no empty-side notion.
    # Text rides the one union exchange exactly once per document.
    def _docs_side(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        texts = t.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if texts.null_count:
            texts = texts.fill_null("")
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "_txt": texts.cast(pa.large_string()),
            "_hits": pa.nulls(len(ids), pa.large_binary()),
            "_b": pa.array(b, pa.int32())})

    def _hits_side(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            id_col: t.column(id_col),
            "_txt": pa.nulls(len(ids), pa.large_string()),
            "_hits": t.column("_hits"),
            "_b": pa.array(b, pa.int32())})

    unioned = docs_ds.map_batches(_docs_side, batch_format="pyarrow",
                                  batch_size=None) \
        .union(hitlists.map_batches(_hits_side, batch_format="pyarrow",
                                    batch_size=None))

    def _merge(g: pa.Table) -> pa.Table:
        txt = g.column("_txt")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = g.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        is_doc = ~np.asarray(txt.is_null())
        d_idx = np.flatnonzero(is_doc)
        h_idx = np.flatnonzero(~is_doc)
        ids_d = ids[d_idx]
        texts = txt.take(pa.array(d_idx, pa.int64()))
        offs, flat, nw, total_w = _split_words(texts)
        hit_starts = np.empty(0, dtype=np.int64)
        if len(h_idx):
            hb = g.column("_hits")
            if isinstance(hb, pa.ChunkedArray):
                hb = hb.combine_chunks()
            hb = hb.take(pa.array(h_idx, pa.int64())) \
                .cast(pa.large_binary())
            bufs = hb.buffers()              # [validity, offsets, data]
            boffs = np.frombuffer(bufs[1], np.int64)[
                hb.offset:hb.offset + len(hb) + 1]
            data = np.frombuffer(bufs[2], np.uint8) \
                if bufs[2] is not None else np.empty(0, dtype=np.uint8)
            seg = data[boffs[0]:boffs[-1]]
            pos_flat = np.frombuffer(seg.tobytes(), "<i8")  # copy aligns
            lens = np.diff(boffs - boffs[0]) // 8
            # map each hit row (one per doc) to its doc row in this bucket
            order_d = np.argsort(ids_d, kind="stable")
            where = np.searchsorted(ids_d[order_d], ids[h_idx])
            doc_row = order_d[where]
            doc_of_pos = np.repeat(doc_row, lens)
            hit_starts = offs[doc_of_pos] + pos_flat
        return _cut_rebuild(ids_d, id_col, offs, flat, nw, total_w,
                            hit_starts, k)

    return unioned.groupby("_b").map_groups(_merge, batch_format="pyarrow")


def duplicated_gram_hashes(docs_ds, *, k: int = 8, seed: int = 4242,
                           column: str = "text", min_docs: int = 2,
                           count_buckets: int = 64) -> np.ndarray:
    """Sorted uint64 hashes of every word-k-gram occurring in
    ≥ ``min_docs`` distinct documents (the ExactSubstr dup set) —
    public form of phase 1, for callers composing
    :func:`duplicated_gram_stats` and :func:`exactsubstr_dedup` over
    the same corpus (pass the result as ``dup_hashes`` to skip the
    second shuffle)."""
    dup = _dup_gram_dataset(docs_ds, k=k, seed=seed, column=column,
                            min_docs=min_docs, count_buckets=count_buckets)
    parts = [b.column("h").to_numpy().view(np.uint64) for b in
             dup.iter_batches(batch_format="pyarrow", batch_size=None)]
    return np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, dtype=np.uint64)


def exactsubstr_dedup(docs_ds, *, k: int = 8, seed: int = 4242,
                      column: str = "text", id_col: str = "doc_id",
                      min_docs: int = 2, count_buckets: int = 64,
                      bits_per_tag: int = 12,
                      broadcast_bound: int = 64_000_000,
                      prescreen: Optional[bool] = None,
                      dup_hashes: Optional[np.ndarray] = None):
    """ExactSubstr-style *removal* (Lee et al. 2021 §3, the complement of
    :func:`duplicated_gram_stats`'s detection): delete from every
    document the words covered by any word-k-gram that occurs in
    ≥ ``min_docs`` distinct documents, keeping the remaining words in
    order.  Emits ``(id, text_clean, n_words, n_removed)`` — one row per
    input document (fully-duplicated docs come back with empty
    ``text_clean``, the caller's drop policy).

    Scale: phase 1 is `_dup_gram_dataset`'s narrow bucketed shuffle; the
    dup set then rides as the same two ``ray.put`` blobs as
    :func:`decontaminate` (12-bit cuckoo AMQ prescreen + exact sorted
    array — zero false negatives, candidates confirmed exactly) and the
    corpus streams through ONE shuffle-free ``map_batches``.  The dup
    set is duplicated *content*, not the corpus: at 100 TB it stays
    orders of magnitude smaller than the input; above ``broadcast_bound``
    the removal switches to `_removal_join_path` — ``(gram, id, pos)``
    rows hash-join the dup Dataset and hit positions pack into one list
    row per doc, so no worker ever holds the whole set (both paths
    pinned identical by test).  Pass a precomputed ``dup_hashes`` (from
    :func:`duplicated_gram_hashes`, same k/seed/min_docs) to skip
    phase 1 entirely."""
    import ray

    if dup_hashes is not None:
        dup_h = np.asarray(dup_hashes, dtype=np.uint64)
        if len(dup_h) > broadcast_bound:
            dup = ray.data.from_arrow(pa.table(
                {"h": pa.array(dup_h.view(np.int64), pa.int64())}))
            return _removal_join_path(docs_ds, dup, k=k, seed=seed,
                                      column=column, id_col=id_col,
                                      num_buckets=None)
    else:
        dup = _dup_gram_dataset(docs_ds, k=k, seed=seed, column=column,
                                min_docs=min_docs,
                                count_buckets=count_buckets)
        if dup.count() > broadcast_bound:  # guard BEFORE the collect
            return _removal_join_path(docs_ds, dup, k=k, seed=seed,
                                      column=column, id_col=id_col,
                                      num_buckets=None)
        parts = [b.column("h").to_numpy().view(np.uint64) for b in
                 dup.iter_batches(batch_format="pyarrow", batch_size=None)]
        dup_h = np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, dtype=np.uint64)
    filter_ref, exact_ref = _broadcast_membership(
        dup_h, seed=seed ^ 0xE55D, bits_per_tag=bits_per_tag,
        prescreen=prescreen)
    return docs_ds.map_batches(
        remove_duplicated_spans_fn, batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"filter_ref": filter_ref, "exact_ref": exact_ref,
                   "k": k, "seed": seed, "column": column,
                   "id_col": id_col})


def duplicated_gram_stats(docs_ds, *, k: int = 8, seed: int = 4242,
                          column: str = "text", id_col: str = "doc_id",
                          min_docs: int = 2, broadcast_bound: int = 4_000_000,
                          num_buckets: Optional[int] = None,
                          count_buckets: int = 64):
    """Cross-document duplicated word-k-gram statistics — the corpus-vs-
    itself form of decontamination and the detection half of ExactSubstr
    deduplication (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better"): a gram is *duplicated* when it occurs in at
    least ``min_docs`` DISTINCT documents, and each document is scored by
    how much of it is made of such shared spans.

    Output: one row per document — ``(id, n_grams, n_dup, dup_gram_frac)``
    where ``n_grams`` counts DISTINCT word k-grams of the doc, ``n_dup``
    how many of those are duplicated corpus-wide, and ``dup_gram_frac`` =
    ``n_dup / max(n_grams, 1)`` (the removal-policy knob: boilerplate and
    exact/near copies score → 1.0).

    Scale shape (the 100 TB story):

    - phase 1 (the only shuffle): each batch emits pre-aggregated
      ``(gram_hash, n_docs_in_batch)`` partials — 16-byte rows, grams
      already distinct per doc — hash-bucketed into ``count_buckets``
      partitions and reduced by ONE vectorized sort+``reduceat`` per
      partition (``groupby.map_groups`` on the bucket column; a
      per-gram ``groupby(h).sum`` walks every row in Python map-side in
      ray 2.49 — measured 8 µs/row, see NOTES).  Text never rides the
      shuffle; set ``count_buckets`` ∝ corpus so a bucket's gram rows
      fit a worker heap.
    - phase 2 is decontamination against the duplicated-gram set: when
      the set fits ``broadcast_bound`` it broadcasts once (exact sorted
      array, AMQ-prescreened above `_PRESCREEN_MIN` —
      `contamination_score_fn`) and the
      corpus streams shuffle-free; above the bound, per-doc gram pairs
      hash-join the dup set instead (O(pairs) bucketed exchange, no
      broadcast), and zero-dup docs are restored by a left-outer join.
    Both paths return identical tables (pinned by test).

    Exactness caveat: doc-gram identity is the 64-bit polynomial/mix hash
    of `word_gram_hashes` — collisions are 2⁻⁶⁴-scale birthday events
    (~1e-9 even at 10⁶ distinct grams); at 100 TB raise to the 128-bit
    variant of the same scheme if exact-set semantics are contractual."""
    import pyarrow.compute as pc
    import ray

    dup = _dup_gram_dataset(docs_ds, k=k, seed=seed, column=column,
                            min_docs=min_docs, count_buckets=count_buckets)
    n_dup_grams = dup.count()

    if n_dup_grams <= broadcast_bound:
        # --- broadcast path: decontaminate the corpus against itself ----
        parts = [b.column("h").to_numpy().view(np.uint64) for b in
                 dup.iter_batches(batch_format="pyarrow", batch_size=None)]
        dup_h = np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, dtype=np.uint64)
        scored = decontaminate(docs_ds, dup_h, k=k, seed=seed,
                               column=column, id_col=id_col)

        def _finish(t: pa.Table) -> pa.Table:
            n_grams = t.column("n_grams")
            n_dup = t.column("n_hit")
            denom = pc.max_element_wise(n_grams, pa.scalar(1, pa.int64()))
            frac = pc.divide(pc.cast(n_dup, pa.float64()),
                             pc.cast(denom, pa.float64()))
            return pa.table({id_col: t.column(id_col), "n_grams": n_grams,
                             "n_dup": n_dup, "dup_gram_frac": frac})

        return scored.map_batches(_finish, batch_format="pyarrow",
                                  batch_size=None)

    # --- join path: dup set too large to broadcast -----------------------
    # Two chained hash-shuffle exchanges run here (pairs ⋈ dup, then the
    # left-outer restore); each wants its own aggregator-actor pool, so
    # the bucket count is capped to half the cluster's CPUs — 32-bucket
    # pools on an 8-cpu session deadlock waiting for actor slots.
    from .relational import hash_join
    if num_buckets is None:
        num_buckets = max(2, min(32,
            int(ray.cluster_resources().get("CPU", 8)) // 2))

    def _pairs(batch: pa.Table) -> pa.Table:
        h, doc, _ = distinct_gram_hashes(batch.column(column), k, seed)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64()),
                         id_col: pa.array(ids[doc], pa.int64())})

    def _base(batch: pa.Table) -> pa.Table:
        _h, _doc, ng = distinct_gram_hashes(batch.column(column), k, seed)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(ng, pa.int64())})

    pairs = docs_ds.map_batches(_pairs, batch_format="pyarrow",
                                batch_size=None)
    hit = hash_join(pairs, dup, "h", "h", num_buckets=num_buckets)
    per_doc = hit.groupby(id_col).count()            # (id, count())
    base = docs_ds.map_batches(_base, batch_format="pyarrow",
                               batch_size=None)

    # attach via bucketed UNION + per-bucket merge, not Dataset.join —
    # the join builds SCHEMALESS tables for hash partitions the sparse
    # per-doc side leaves empty and Acero can't resolve the key
    # (ray 2.49; same fix as `_removal_join_path`)
    def _base_side(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({id_col: t.column(id_col),
                         "n_grams": t.column("n_grams"),
                         "_cnt": pa.nulls(len(ids), pa.int64()),
                         "_b": pa.array(b, pa.int32())})

    def _cnt_side(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({id_col: t.column(id_col),
                         "n_grams": pa.nulls(len(ids), pa.int64()),
                         "_cnt": pc.cast(t.column("count()"), pa.int64()),
                         "_b": pa.array(b, pa.int32())})

    unioned = base.map_batches(_base_side, batch_format="pyarrow",
                               batch_size=None) \
        .union(per_doc.map_batches(_cnt_side, batch_format="pyarrow",
                                   batch_size=None))

    def _merge(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        ngc = g.column("n_grams")
        if isinstance(ngc, pa.ChunkedArray):
            ngc = ngc.combine_chunks()
        is_doc = ~np.asarray(ngc.is_null())
        d_idx = np.flatnonzero(is_doc)
        h_idx = np.flatnonzero(~is_doc)
        ids_d = ids[d_idx]
        n_grams = ngc.take(pa.array(d_idx, pa.int64())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_dup = np.zeros(len(ids_d), dtype=np.int64)
        if len(h_idx):
            cnt = g.column("_cnt")
            if isinstance(cnt, pa.ChunkedArray):
                cnt = cnt.combine_chunks()
            cnt = cnt.take(pa.array(h_idx, pa.int64())) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            order_d = np.argsort(ids_d, kind="stable")
            doc_row = order_d[np.searchsorted(ids_d[order_d], ids[h_idx])]
            n_dup[doc_row] = cnt
        frac = n_dup / np.maximum(n_grams, 1)
        return pa.table({id_col: pa.array(ids_d, pa.int64()),
                         "n_grams": pa.array(n_grams, pa.int64()),
                         "n_dup": pa.array(n_dup, pa.int64()),
                         "dup_gram_frac": pa.array(frac, pa.float64())})

    return unioned.groupby("_b").map_groups(_merge, batch_format="pyarrow")
