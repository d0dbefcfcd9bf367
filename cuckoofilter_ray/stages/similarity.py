"""Similarity search over embedding columns (``list<float>``).

Extends the engine for training-data pipelines (brief requirement):

- ``knn_bruteforce``  exact cosine top-k: the query matrix is ``ray.put``
  once; every batch does one float64 matmul against it and emits per-batch
  top-k candidates; a tiny ``groupby(query_id)`` reduces to the global top-k.
  Shuffle volume = candidates (k × batches), never the embeddings.
- ``lsh_buckets`` / ``knn_lsh``  sign-random-projection LSH: seeded
  hyperplanes assign each vector a bucket code; probing only matching
  buckets is the scale path (IVF-style), trading recall for a ~2^bits fanout
  cut.  Deterministic (seeded), rows-only correctness check.
- ``embedding_neardup_pairs``  near-duplicate detection by cosine ≥ τ using
  LSH bucket blocking + exact verify within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..kernels.hashing import splitmix64


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    width = len(flat) // len(batch) if len(batch) else 0
    return flat.reshape(len(batch), width)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopK:
    """Actor-pool stage: per-batch exact cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, id_col: str = "vec_id",
                 emb_col: str = "embedding", k: int = 5):
        q = ray.get(queries_ref)  # dict {query_id: vector} or (ids, matrix)
        if isinstance(q, dict):
            self._qids = np.array(list(q.keys()))
            self._qmat = _normalize(np.stack(list(q.values())).astype(np.float64))
        else:
            self._qids, qm = q
            self._qmat = _normalize(np.asarray(qm, dtype=np.float64))
        self._id_col, self._emb_col, self._k = id_col, emb_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id_col).to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(batch, self._emb_col))
        sims = emb @ self._qmat.T                     # (n, q)
        k = min(self._k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]   # (k, q)
        qi, vi, sc = [], [], []
        for j in range(sims.shape[1]):
            rows = top[:, j]
            qi.extend([self._qids[j]] * len(rows))
            vi.extend(ids[rows].tolist())
            sc.extend(sims[rows, j].tolist())
        return pa.table({
            "query_id": pa.array(qi),
            self._id_col: pa.array(vi),
            "cosine": pa.array(sc, pa.float64()),
        })


_TOPK_CACHE: dict = {}


def batch_topk_fn(batch: pa.Table, *, queries_ref=None, id_col: str = "vec_id",
                  emb_col: str = "embedding", k: int = 5) -> pa.Table:
    """Task form of :class:`BatchTopK` with per-worker broadcast caching
    (task pools fuse with the read and reuse warm workers)."""
    key = (queries_ref.hex(), id_col, emb_col, k)
    st = _TOPK_CACHE.get(key)
    if st is None:
        st = _TOPK_CACHE[key] = BatchTopK(queries_ref, id_col=id_col,
                                          emb_col=emb_col, k=k)
    return st(batch)


def knn_bruteforce(ds: "ray.data.Dataset", queries: dict, k: int = 5,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   concurrency: int = 2) -> "ray.data.Dataset":
    """Exact global top-k per query: per-batch top-k (map) → per-query reduce."""
    qref = ray.put(queries)
    candidates = ds.map_batches(
        batch_topk_fn, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"queries_ref": qref, "id_col": id_col,
                   "emb_col": emb_col, "k": k})

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(reduce_topk,
                                                     batch_format="pandas")


# ----------------------------------------------------------------- LSH path

def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    """Seeded Gaussian-ish hyperplanes from splitmix64 (Box-Muller-free:
    sums of uniforms are plenty for sign-LSH)."""
    raw = splitmix64(dim * bits * 4, seed=seed).astype(np.float64)
    u = raw / float(1 << 64) - 0.5
    return u.reshape(bits, dim, 4).sum(axis=2)


def lsh_buckets(ds: "ray.data.Dataset", bits: int = 8, seed: int = 4242,
                id_col: str = "vec_id", emb_col: str = "embedding") -> "ray.data.Dataset":
    """Append a sign-LSH bucket code (int64) — the IVF-style partitioner."""

    planes_cache = {}

    def assign(batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch, emb_col)
        dim = emb.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = _hyperplanes(dim, bits, seed)
        proj = emb @ planes_cache[dim].T          # (n, bits)
        code = ((proj > 0).astype(np.int64) << np.arange(bits)).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(code, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_lsh(ds: "ray.data.Dataset", queries: dict, k: int = 5, bits: int = 8,
            seed: int = 4242, id_col: str = "vec_id",
            emb_col: str = "embedding") -> "ray.data.Dataset":
    """Approximate top-k: probe only vectors whose LSH bucket matches the
    query's.  Recall < 1 by design; the scale path when brute force is too
    wide (probe multiple buckets for higher recall)."""
    qids = np.array(list(queries.keys()))
    qmat = np.stack(list(queries.values())).astype(np.float64)
    planes = _hyperplanes(qmat.shape[1], bits, seed)
    qcodes = (((qmat @ planes.T) > 0).astype(np.int64)
              << np.arange(bits)).sum(axis=1)
    bucket_to_qs: dict[int, list[int]] = {}
    for qid, code in zip(qids.tolist(), qcodes.tolist()):
        bucket_to_qs.setdefault(code, []).append(qid)
    wanted = set(bucket_to_qs)
    qref = ray.put({qid: queries[qid] for qid in qids.tolist()})

    bucketed = lsh_buckets(ds, bits=bits, seed=seed, id_col=id_col,
                           emb_col=emb_col)
    pruned = bucketed.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t.column("lsh_bucket").to_numpy(zero_copy_only=False),
            np.array(sorted(wanted))))),
        batch_format="pyarrow")
    candidates = pruned.map_batches(
        BatchTopK, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"queries_ref": qref, "id_col": id_col,
                               "emb_col": emb_col, "k": k})

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(reduce_topk,
                                                     batch_format="pandas")


class AllPairsNearDup:
    """Actor-pool stage: each batch's rows vs the full broadcast matrix.

    Exact cosine ≥ τ pairs; emits (lo_id, hi_id) with lo_id < hi_id so every
    pair surfaces exactly once no matter how rows are batched.  Broadcast cost
    is O(n·d) floats — the exact path; LSH blocking below is the scale path.
    """

    def __init__(self, matrix_ref, threshold: float, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        ids, mat = ray.get(matrix_ref)
        self._all_ids = np.asarray(ids)
        self._all = _normalize(np.asarray(mat, dtype=np.float64))
        self._threshold = threshold
        self._id_col, self._emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id_col).to_numpy(zero_copy_only=False)
        emb = _normalize(_stack_embeddings(batch, self._emb_col))
        sims = emb @ self._all.T                       # (b, n)
        hit_r, hit_c = np.nonzero(sims >= self._threshold)
        lo = ids[hit_r]
        hi = self._all_ids[hit_c]
        keep = lo < hi                                 # dedupe + drop self-pairs
        return pa.table({
            "lo_id": pa.array(lo[keep], pa.int64()),
            "hi_id": pa.array(hi[keep], pa.int64()),
        })


def embedding_neardup_exact(ds: "ray.data.Dataset", threshold: float = 0.4,
                            id_col: str = "vec_id", emb_col: str = "embedding",
                            concurrency: int = 2) -> "ray.data.Dataset":
    """Exact cosine-≥-τ pair enumeration: broadcast the (id, matrix) once via
    ``ray.put``, stream batches against it.  SQL-oracle-able (cross join +
    cosine); use :func:`embedding_neardup_pairs` when n is too big to
    broadcast."""
    mat_ds = ds.select_columns([id_col, emb_col])
    tbl = pa.concat_tables(ray.get(mat_ds.to_arrow_refs()))
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    mat = _stack_embeddings(tbl, emb_col)
    mref = ray.put((ids, mat))
    return ds.map_batches(
        AllPairsNearDup, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"matrix_ref": mref, "threshold": threshold,
                               "id_col": id_col, "emb_col": emb_col})


def embedding_neardup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                            bits: int = 8, seed: int = 4242,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> "ray.data.Dataset":
    """Near-duplicate (cosine ≥ τ) pairs: LSH-bucket blocking + exact verify
    inside each bucket (high-cosine pairs collide w.h.p. on all-sign bits)."""
    bucketed = lsh_buckets(ds, bits=bits, seed=seed, id_col=id_col,
                           emb_col=emb_col)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"lo_id": pd.Series([], dtype="int64"),
                                 "hi_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        emb = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        sims = emb @ emb.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        return pd.DataFrame({"lo_id": ids[iu[mask]], "hi_id": ids[ju[mask]],
                             "cosine": sims[iu[mask], ju[mask]]})

    return bucketed.groupby("lsh_bucket").map_groups(bucket_pairs,
                                                     batch_format="pandas")
