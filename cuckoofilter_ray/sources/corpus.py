"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

The reference's key source is ``GenerateRandom64Fast(count, seed)`` —
splitmix64 over a counter (benchmarks/random.h:28-41).  The engine's corpus
generalizes that: every column of row ``i`` is a pure function of
``splitmix64`` outputs at ``i``, so any worker can generate any slice
independently (``ray.data.range(n).map_batches``) and two runs with the same
seed are byte-identical — no ``random_device`` anywhere.

Schema (BASELINE.json input_hint): ``repo:string, path:string, commit:string,
lang:string, content:string`` with

- Zipf-skewed repo sizes (one giant repo → skew/repartition tests),
- a skewed categorical ``lang``,
- ~``dup_fraction`` rows whose ``content`` exactly duplicates an earlier
  row's (dedup-probe ground truth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..kernels.hashing import splitmix64

LANGS = np.array(["py", "c", "cpp", "js", "java", "go", "rs", "md"])
# skewed lang mix (py/js heavy, like real corpora)
_LANG_CUM = np.cumsum(np.array([0.30, 0.08, 0.10, 0.22, 0.10, 0.08, 0.05, 0.07]))

_WORDS = np.array([
    "def", "return", "class", "import", "for", "while", "if", "else", "try",
    "except", "lambda", "yield", "async", "await", "self", "value", "result",
    "buffer", "index", "count", "total", "parse", "encode", "decode", "hash",
    "table", "bucket", "filter", "insert", "lookup", "delete", "merge",
    "stream", "batch", "shard", "commit", "branch", "node", "edge", "graph",
])


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def make_corpus_batch(ids: np.ndarray, seed: int = 42, n_repos: int = 50,
                      dup_fraction: float = 0.10,
                      content_words: int = 60) -> pa.Table:
    """Generate corpus rows for the given row ids (vectorized + one content
    join loop; all derivation flows from splitmix64(id, seed))."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    base = splitmix64_at(ids, seed)

    # Zipf-ish repo assignment: rank r w.p. ∝ 1/(r+1)
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    cum = np.cumsum(1.0 / ranks)
    cum /= cum[-1]
    repo_idx = np.searchsorted(cum, _u01(base))
    repos = np.char.add(
        np.char.add("org", (repo_idx % 7).astype(str)),
        np.char.add("/repo", repo_idx.astype(str)))

    h2 = splitmix64_at(ids, seed + 1)
    lang_idx = np.searchsorted(_LANG_CUM, _u01(h2))
    langs = LANGS[np.minimum(lang_idx, len(LANGS) - 1)]

    h3 = splitmix64_at(ids, seed + 2)
    dirs = (h3 % np.uint64(97)).astype(np.int64)
    files = ((h3 >> np.uint64(32)) % np.uint64(9973)).astype(np.int64)
    paths = [f"src/dir{d}/file{f}.{l}" for d, f, l in
             zip(dirs.tolist(), files.tolist(), langs.tolist())]

    h4 = splitmix64_at(ids, seed + 3)
    commits = [f"{v:040x}"[:40] for v in
               ((h4.astype(object) << 96) | (h4.astype(object) * 0x9E3779B9)).tolist()]

    contents = _make_contents_vec(content_src_of(ids, seed, dup_fraction),
                                  seed, content_words)

    return pa.table({
        "repo": pa.array(repos.tolist(), type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "commit": pa.array(commits, type=pa.string()),
        "lang": pa.array(langs.tolist(), type=pa.string()),
        "content": contents.cast(pa.large_string()),
    })


def content_src_of(ids: np.ndarray, seed: int = 42,
                   dup_fraction: float = 0.10) -> np.ndarray:
    """Logical content id per row: rows rolled as duplicates point at a
    deterministic EARLIER row's content (content is a pure function of
    this id — tools verify exactness against it without materializing)."""
    ids = np.asarray(ids, dtype=np.uint64)
    dup_roll = _u01(splitmix64_at(ids, seed + 4))
    content_src = ids.copy()
    is_dup = (dup_roll < dup_fraction) & (ids > 0)
    content_src[is_dup] = (splitmix64_at(ids[is_dup], seed + 5) % ids[is_dup])
    return content_src


def splitmix64_at(ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 output at absolute positions ``ids`` for a given seed."""
    state = (np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
             + np.uint64(0x9E3779B97F4A7C15) * (np.asarray(ids, np.uint64) + np.uint64(1)))
    z = state
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _make_contents_vec(content_src: np.ndarray, seed: int,
                       n_words: int = 60) -> pa.Array:
    """Vectorized batch form of :func:`_make_content` — byte-identical
    output, pinned by test.  One splitmix pass over the (n × n_words)
    position matrix, one fancy-index into the word list, then
    ``binary_join_element_wise`` assembles lines and documents with no
    per-row Python (~6x the scalar loop; 200 k rows = ~2.5 core-s)."""
    import pyarrow.compute as pc

    cids = np.asarray(content_src, dtype=np.uint64)
    n = len(cids)
    h = splitmix64_at(cids, seed + 6)
    base = (h & np.uint64(0xFFFFFFFF)) * np.uint64(131)
    pos = base[:, None] + np.arange(n_words, dtype=np.uint64)[None, :]
    rng_vals = splitmix64_at(pos.ravel(), seed + 7)
    w = _WORDS[(rng_vals % np.uint64(len(_WORDS))).astype(np.int64)] \
        .reshape(n, n_words)
    cols = [pa.array(w[:, j]) for j in range(n_words)]
    lines = [pc.binary_join_element_wise(*cols[i:i + 8], " ")
             for i in range(0, n_words, 8)]
    hdr = pa.array(np.char.add("# id ", cids.astype(np.int64).astype(str)))
    tail = pa.nulls(n, pa.string()).fill_null("")   # trailing "\n"
    return pc.binary_join_element_wise(hdr, *lines, tail, "\n")


def _make_content(content_id: int, seed: int, n_words: int) -> str:
    """Deterministic pseudo-code text for one logical content id."""
    h = splitmix64_at(np.array([content_id], dtype=np.uint64), seed + 6)[0]
    rng_vals = splitmix64_at(
        np.arange(n_words, dtype=np.uint64) + np.uint64(int(h) & 0xFFFFFFFF) * np.uint64(131),
        seed + 7)
    words = _WORDS[(rng_vals % np.uint64(len(_WORDS))).astype(np.int64)]
    lines = []
    for i in range(0, n_words, 8):
        lines.append(" ".join(words[i:i + 8]))
    return f"# id {content_id}\n" + "\n".join(lines) + "\n"


def corpus_dataset(n_rows: int, seed: int = 42, n_repos: int = 50,
                   dup_fraction: float = 0.10,
                   override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Distributed deterministic corpus: range(n) → map_batches(generator)."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return make_corpus_batch(ids, seed=seed, n_repos=n_repos,
                                 dup_fraction=dup_fraction)

    base = ray.data.range(n_rows, override_num_blocks=override_num_blocks)
    return base.map_batches(gen, batch_format="pyarrow", batch_size=None)
