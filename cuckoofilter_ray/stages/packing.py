"""Sequence packing: bin documents into fixed token-budget training
sequences (the "pack short documents together" step every LLM pre-training
pipeline runs between curation and tokenized-shard writing).

Packing policy is **next-fit within deterministic id-range shards**:

- ``shard = doc_id // shard_size`` — shards are pure id arithmetic, so the
  layout is independent of block boundaries, partition count, and cluster
  size (a rerun, a resumed shard, or a different parallelism produces the
  identical packing — the property checkpointed tokenization needs).
- within a shard, documents are walked in ``doc_id`` order and appended to
  the current sequence until the next document would overflow ``budget``;
  that document starts the next sequence.  An oversized document (longer
  than the budget by itself) occupies a sequence alone — never dropped,
  never split (splitting is the tokenizer's job downstream).

Next-fit (vs first-fit/best-fit) is the standard streaming choice: O(n),
no bin state beyond the tail, and within a factor 2 of optimal occupancy —
and, unlike the "smarter" fits, it is order-deterministic and expressible
in ANSI SQL (a per-shard recursive scan), so the driver's DuckDB oracle
verifies every bin assignment value-exactly.

Scale shape: token counts are computed in a streaming ``map_batches``
(vectorized RE2 count, text dropped immediately), so the ONLY shuffle is
16-byte ``(doc_id, shard, n_tokens)`` rows into a ``groupby(shard)``;
each shard packs independently (≤ ``shard_size`` rows — the per-shard
walk is a bounded searchsorted-per-bin loop, not a per-doc Python loop).
At 100 TB: shards are the unit of parallelism AND the unit of resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _pack_tokens_next_fit(tok: np.ndarray, budget: int) -> np.ndarray:
    """1-based next-fit bin ids for token counts in walk order.

    Each bin is the maximal prefix of remaining docs with total ≤ budget
    (taking at least one doc — oversized docs sit alone), which is exactly
    the next-fit recurrence.  Loop is per *bin* (searchsorted into the
    prefix-sum), not per doc."""
    n = len(tok)
    bins = np.empty(n, dtype=np.int64)
    cs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tok, out=cs[1:])
    i, b = 0, 0
    while i < n:
        b += 1
        j = int(np.searchsorted(cs, cs[i] + budget, side="right")) - 1
        j = max(j, i + 1)
        bins[i:j] = b
        i = j
    return bins


def pack_sequences(docs_ds, budget: int, *, shard_size: int = 256,
                   id_col: str = "doc_id", column: str = "text",
                   token_col: str | None = None):
    """Assign every document a ``(shard, seq_bin)`` training-sequence slot.

    Output: one row per document — ``(id, shard, n_tokens, seq_bin)`` with
    ``seq_bin`` numbered 1.. within its shard.  ``token_col`` names a
    precomputed length column to pack on (skips the text read entirely);
    otherwise tokens are ``\\S+`` runs of ``column`` (the engine's pinned
    ``n_tokens`` semantics, SQL ``length(regexp_extract_all(text,'\\S+'))``).
    """
    if budget < 1 or shard_size < 1:
        raise ValueError("budget and shard_size must be positive")

    def _stats(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if token_col is not None:
            tok = pc.cast(batch.column(token_col), pa.int64())
        else:
            tok = pc.cast(pc.count_substring_regex(
                batch.column(column), r"\S+"), pa.int64())
        shard = pc.divide(ids, pa.scalar(shard_size, pa.int64()))
        return pa.table({id_col: ids, "shard": shard, "n_tokens": tok})

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col).reset_index(drop=True)
        df["seq_bin"] = _pack_tokens_next_fit(
            df["n_tokens"].to_numpy(np.int64), budget)
        return df

    return docs_ds.map_batches(_stats, batch_format="pyarrow",
                               batch_size=None) \
        .groupby("shard").map_groups(_pack, batch_format="pandas")


def chunk_documents(docs_ds, max_tokens: int, *, overlap: int = 0,
                    id_col: str = "doc_id", column: str = "text",
                    chunk_col: str = "chunk_id"):
    """Split every document into sliding context windows of at most
    ``max_tokens`` tokens with ``overlap`` tokens of left context — the
    complement of :func:`pack_sequences` (packing bins SHORT docs
    together; chunking cuts LONG docs down to the model's window).

    Chunk ``i`` (0-based) covers token positions
    ``[i·stride, min(i·stride + max_tokens, n))`` with
    ``stride = max_tokens − overlap``; a document emits
    ``1 + ceil((n − max_tokens)/stride)`` chunks (one when ``n ≤
    max_tokens``, including empty docs — every input row appears).
    Tokens are ``\\S+`` runs (the engine's pinned ``n_tokens``
    semantics); chunk text re-joins them with single spaces, so the
    operator is value-exactly expressible as SQL list slicing over
    ``regexp_extract_all(text, '\\S+')``.

    Output: ``(id, chunk_id, n_tokens, text_chunk)`` rows, one per chunk.
    Scale shape: ONE streaming ``map_batches`` (a vectorized flat-map) —
    zero shuffle, zero broadcast; chunk rows never exceed
    ``len(text)/stride`` times the input and leave the stage ready for
    `pack_sequences` or a partitioned write."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def _chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if texts.null_count:
            texts = texts.fill_null("")
        # \S+ runs == split on \s+ minus empty edge tokens
        words = pc.split_pattern_regex(texts, pattern=r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = np.asarray(words.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = words.flatten()
        keep = np.asarray(pc.not_equal(
            flat.cast(pa.large_string()),
            pa.scalar("", pa.large_string())))
        flat = flat.take(pa.array(np.flatnonzero(keep), pa.int64()))
        nw_raw = np.diff(offs)
        drop_per_doc = np.bincount(
            np.repeat(np.arange(len(ids)), nw_raw)[~keep],
            minlength=len(ids)).astype(np.int64)
        nw = nw_raw - drop_per_doc                 # true \S+ token counts
        wo = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(nw, out=wo[1:])

        n_chunks = np.where(nw <= max_tokens, 1,
                            1 + -(-(nw - max_tokens) // stride))
        total_c = int(n_chunks.sum())
        co = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(n_chunks[:-1], out=co[1:])
        cdoc = np.repeat(np.arange(len(ids), dtype=np.int64), n_chunks)
        cidx = np.arange(total_c, dtype=np.int64) - co[cdoc]
        s = cidx * stride                          # token start within doc
        e = np.minimum(s + max_tokens, nw[cdoc])
        clen = e - s
        # ragged gather: word indices of every chunk, concatenated
        oo = np.zeros(total_c + 1, dtype=np.int64)
        np.cumsum(clen, out=oo[1:])
        total_w = int(oo[-1])
        widx = np.arange(total_w, dtype=np.int64) \
            - np.repeat(oo[:-1], clen) + np.repeat(wo[cdoc] + s, clen)
        chunk_words = flat.take(pa.array(widx, pa.int64()))
        text_chunk = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(oo, pa.int64()),
                                          chunk_words
                                          .cast(pa.large_string())),
            pa.scalar(" ", pa.large_string()))
        return pa.table({
            id_col: pa.array(ids[cdoc], pa.int64()),
            chunk_col: pa.array(cidx, pa.int64()),
            "n_tokens": pa.array(clen, pa.int64()),
            "text_chunk": text_chunk.cast(pa.string()),
        })

    return docs_ds.map_batches(_chunk, batch_format="pyarrow",
                               batch_size=None)
