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


def contamination_score_fn(batch: pa.Table, *, filter_ref=None,
                           exact_ref=None, k: int = 8, seed: int = 4242,
                           column: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Stateless batch stage: per document, DISTINCT word-k-gram count and
    how many of those grams appear in the benchmark set.

    Runs as plain tasks on the warm worker pool — the two broadcasts
    resolve once per worker PROCESS (bounded ``cache_get`` memo keyed by
    ref), so the stateful-setup-once property of an actor pool is kept
    without paying actor spawn/ramp latency per pipeline.  The body is
    pure numpy: zero-copy gram hashing, per-doc distinct, one vectorized
    ``contain_batch`` prescreen, exact ``searchsorted`` confirmation of
    the AMQ positives only."""
    import ray

    filt = cache_get(_CACHE, ("filt", filter_ref.hex()),
                     lambda: row_to_filter(ray.get(filter_ref)))
    exact = cache_get(_CACHE, ("exact", exact_ref.hex()),
                      lambda: ray.get(exact_ref))
    texts = batch.column(column)            # Arrow column: zero-copy path
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    h, doc, n_grams = distinct_gram_hashes(texts, k, seed)
    maybe = filt.contain_batch(h) if len(h) else np.zeros(0, dtype=bool)
    hit = np.zeros(len(h), dtype=bool)
    if maybe.any():                         # confirm AMQ positives exactly
        cand = np.flatnonzero(maybe)
        pos = np.searchsorted(exact, h[cand])
        pos[pos == len(exact)] = 0
        hit[cand] = exact[pos] == h[cand]
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
                  concurrency: Optional[int] = None):
    """Score every document of ``docs_ds`` against a benchmark gram set.

    Output: one row per input document — ``(id, n_grams, n_hit, flagged)``
    where ``n_grams`` counts DISTINCT word k-grams, ``n_hit`` how many of
    them occur in the benchmark, and ``flagged`` = overlap ≥ 1/2 (integer
    form ``2·n_hit ≥ n_grams``, exact in SQL too).  Streaming, shuffle-free:
    the benchmark rides as two ``ray.put`` broadcasts (AMQ + exact sorted
    array); documents never leave their blocks, and the stage runs as
    stateless tasks (per-worker broadcast cache — no actor spawn latency)."""
    import ray

    bench_hashes = np.asarray(bench_hashes, dtype=np.uint64)
    filt = make_filter("cuckoo", max(16, len(bench_hashes)), seed ^ 0xBEC4,
                       bits_per_tag)
    if len(bench_hashes):
        filt.add_batch(bench_hashes)
    filter_ref = ray.put(filter_to_row(filt))
    exact_ref = ray.put(bench_hashes)        # np.unique output => sorted
    kwargs = {"filter_ref": filter_ref, "exact_ref": exact_ref, "k": k,
              "seed": seed, "column": column, "id_col": id_col}
    if concurrency:
        return docs_ds.map_batches(contamination_score_fn,
                                   batch_format="pyarrow",
                                   concurrency=concurrency,
                                   fn_kwargs=kwargs)
    return docs_ds.map_batches(contamination_score_fn,
                               batch_format="pyarrow", fn_kwargs=kwargs)
