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
from ..util import cache_get


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
_CENTROID_CACHE: dict = {}


def batch_topk_fn(batch: pa.Table, *, queries_ref=None, id_col: str = "vec_id",
                  emb_col: str = "embedding", k: int = 5) -> pa.Table:
    """Task form of :class:`BatchTopK` with per-worker broadcast caching
    (task pools fuse with the read and reuse warm workers)."""
    key = (queries_ref.hex(), id_col, emb_col, k)
    st = cache_get(_TOPK_CACHE, key,
                   lambda: BatchTopK(queries_ref, id_col=id_col,
                                     emb_col=emb_col, k=k))
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


def multiprobe_codes(qmat: np.ndarray, planes: np.ndarray,
                     n_probes: int) -> np.ndarray:
    """(q, n_probes) bucket codes per query: the query's own code plus the
    codes reached by flipping its smallest-|margin| hyperplane bits — the
    standard multi-probe LSH sequence (near-boundary bits are the likeliest
    to disagree with a true neighbor)."""
    bits = planes.shape[0]
    proj = qmat @ planes.T                               # (q, bits)
    base = (((proj > 0).astype(np.int64)) << np.arange(bits)).sum(axis=1)
    margins = np.abs(proj)
    order = np.argsort(margins, axis=1)                  # ascending margin
    # enumerate flip-subsets over the t lowest-margin bits (2^t >= n_probes),
    # score each subset by its margin sum, keep the n_probes cheapest —
    # the multi-probe sequence generalized past single-bit flips
    t = min(bits, max(1, int(np.ceil(np.log2(max(2, n_probes))))))
    subsets = np.arange(1 << t)
    sub_bits = ((subsets[:, None] >> np.arange(t)) & 1).astype(np.float64)
    low_margins = np.take_along_axis(margins, order[:, :t], axis=1)  # (q, t)
    scores = low_margins @ sub_bits.T                    # (q, 2^t)
    pick = np.argsort(scores, axis=1)[:, :n_probes]      # subset 0 first
    # subset -> xor mask over the query's own low-margin bit POSITIONS
    out = np.empty((len(qmat), pick.shape[1]), dtype=np.int64)
    for qi in range(len(qmat)):
        pos = order[qi, :t]
        masks = (sub_bits[pick[qi]].astype(np.int64)
                 * (np.int64(1) << pos)[None, :]).sum(axis=1)
        out[qi] = base[qi] ^ masks
    return out


def knn_lsh(ds: "ray.data.Dataset", queries: dict, k: int = 5, bits: int = 8,
            seed: int = 4242, id_col: str = "vec_id",
            emb_col: str = "embedding",
            n_probes: int = 1) -> "ray.data.Dataset":
    """Approximate top-k: probe only vectors whose LSH bucket is in the
    query's probe set.  ``n_probes`` > 1 enables multi-probe (flip the
    lowest-|margin| bits) — recall rises toward brute force as the probe
    set grows; candidate volume is the price."""
    qids = np.array(list(queries.keys()))
    qmat = np.stack(list(queries.values())).astype(np.float64)
    planes = _hyperplanes(qmat.shape[1], bits, seed)
    codes = multiprobe_codes(qmat, planes, max(1, min(n_probes, 1 << bits)))
    wanted = set(np.unique(codes).tolist())
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


# ----------------------------------------------------------------- IVF path

def ivf_train_centroids(ds: "ray.data.Dataset", n_lists: int = 16,
                        sample: int = 4096, iters: int = 10, seed: int = 7,
                        emb_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd's k-means on a driver-side SAMPLE
    (``sample`` rows — the sample is small by design; training never sees
    the full dataset), normalized rows, cosine == dot assignment.  Fully
    numpy-vectorized; deterministic via seed."""
    tbl = pa.concat_tables([b for b in ds.select_columns([emb_col])
                            .limit(sample).iter_batches(
                                batch_size=sample, batch_format="pyarrow")])
    X = _normalize(_stack_embeddings(tbl, emb_col))
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(X))
    C = X[rng.choice(len(X), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_lists):              # small n_lists: loop is fine
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_assign(ds: "ray.data.Dataset", centroids_ref,
               emb_col: str = "embedding") -> "ray.data.Dataset":
    """Append ``ivf_list`` (int64): nearest-centroid id per row — the IVF
    partitioner (broadcast centroids, one matmul per batch)."""

    def assign(batch: pa.Table) -> pa.Table:
        # per-worker broadcast cache (same pattern as batch_topk_fn): the
        # plasma get runs once per worker process, not once per batch
        key = centroids_ref.hex()
        C = cache_get(_CENTROID_CACHE, key,
                      lambda: np.asarray(ray.get(centroids_ref)))
        emb = _normalize(_stack_embeddings(batch, emb_col))
        lst = (emb @ C.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lst, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(ds: "ray.data.Dataset", queries: dict, k: int = 5,
            n_lists: int = 16, n_probe: int = 4, seed: int = 7,
            id_col: str = "vec_id", emb_col: str = "embedding",
            centroids: np.ndarray | None = None) -> "ray.data.Dataset":
    """IVF approximate top-k: train/broadcast a coarse quantizer, keep only
    vectors in each query's ``n_probe`` nearest lists, exact top-k over the
    survivors.  ``n_probe == n_lists`` degrades gracefully to brute force
    (pinned by test); at scale the dataset should be pre-partitioned by
    ``ivf_assign`` + written partitioned so probes read only their lists."""
    if centroids is None:
        centroids = ivf_train_centroids(ds, n_lists=n_lists, seed=seed,
                                        emb_col=emb_col)
    cref = ray.put(centroids)
    qids = list(queries.keys())
    qmat = _normalize(np.stack([queries[q] for q in qids]).astype(np.float64))
    qsims = qmat @ centroids.T                           # (q, n_lists)
    n_probe = max(1, min(n_probe, centroids.shape[0]))
    probed = np.argpartition(-qsims, n_probe - 1, axis=1)[:, :n_probe]
    wanted = np.unique(probed)
    qref = ray.put(dict(queries))

    assigned = ivf_assign(ds, cref, emb_col=emb_col)
    pruned = assigned.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t.column("ivf_list").to_numpy(zero_copy_only=False), wanted))),
        batch_format="pyarrow")
    candidates = pruned.map_batches(
        batch_topk_fn, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"queries_ref": qref, "id_col": id_col,
                   "emb_col": emb_col, "k": k})

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col],
                              ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(reduce_topk,
                                                     batch_format="pandas")


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
                            id_col: str = "vec_id", emb_col: str = "embedding",
                            max_bucket_reps: int = 4096) -> "ray.data.Dataset":
    """Near-duplicate (cosine ≥ τ) pairs: LSH-bucket blocking + exact verify
    inside each bucket (high-cosine pairs collide w.h.p. on all-sign bits).

    Hot-bucket safety (same contract as :func:`..dedup.minhash_lsh_pairs`):
    byte-identical embeddings collapse to a star on their min-id
    representative (O(g) pairs, cosine 1.0, same near-dup connectivity), and
    at most ``max_bucket_reps`` distinct representatives are exactly compared
    per bucket — surplus reps are dropped with a logged warning.  The rep
    matmul is row-chunked so peak memory is O(chunk × reps), never O(g²).
    A mass-duplicated corpus (the exact case near-dup detection targets) can
    no longer go quadratic in one bucket.
    """
    bucketed = lsh_buckets(ds, bits=bits, seed=seed, id_col=id_col,
                           emb_col=emb_col)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"lo_id": pd.Series([], dtype="int64"),
                             "hi_id": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n < 2:
            return _empty()
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy().astype(np.int64, copy=False)
        emb = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        los, his, cos = [], [], []
        if n > 8:
            # star-collapse byte-identical vectors onto the min-id rep
            # (ids are sorted, so the first occurrence has the smallest id)
            _, inv = np.unique(emb, axis=0, return_inverse=True)
            first = np.full(inv.max() + 1, n, dtype=np.int64)
            np.minimum.at(first, inv, np.arange(n))
            rep_of = first[inv]
            members = np.flatnonzero(rep_of != np.arange(n))
            if len(members):
                los.append(ids[rep_of[members]])
                his.append(ids[members])
                cos.append(np.ones(len(members)))
            rep_idx = np.flatnonzero(rep_of == np.arange(n))
            if len(rep_idx) > max_bucket_reps:
                import logging
                logging.getLogger(__name__).warning(
                    "embedding LSH bucket capped: comparing %d of %d reps",
                    max_bucket_reps, len(rep_idx))
                rep_idx = rep_idx[:max_bucket_reps]
            rids, R = ids[rep_idx], _normalize(emb[rep_idx])
        else:
            rids, R = ids, _normalize(emb)
        m = len(rids)
        CH = 256
        for i0 in range(0, max(0, m - 1), CH):
            i1 = min(m, i0 + CH)
            sims = R[i0:i1] @ R.T                    # (chunk, m)
            ii, jj = np.nonzero(sims >= threshold)
            keep = jj > ii + i0                      # upper triangle only
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                los.append(rids[ii + i0])
                his.append(rids[jj])
                cos.append(sims[ii, jj])
        if not los:
            return _empty()
        return pd.DataFrame({
            "lo_id": np.concatenate(los).astype(np.int64),
            "hi_id": np.concatenate(his).astype(np.int64),
            "cosine": np.concatenate(cos).astype(np.float64)})

    return bucketed.groupby("lsh_bucket").map_groups(bucket_pairs,
                                                     batch_format="pandas")
