"""Key-derivation batch functions (stateless ``map_batches`` stages).

The engine's item key is sha256(content): hex digest for the per-row
content-equality invariant (BASELINE.json input_hint), and the first 8 digest
bytes as the uint64 filter item — standing in for the reference's raw
``uint64_t`` keys (benchmarks/bulk-insert-and-query.cc:741-746).

Design note (SURVEY.md §7.4): derive the 8-byte key as early as possible and
drop the wide ``content`` column before any shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import sha256_hex, sha256_u64


def add_content_keys(batch: pa.Table, column: str = "content",
                     sha_col: str = "sha_hex", key_col: str = "key_hi64",
                     drop_content: bool = False,
                     byte_hash: str = "sha256") -> pa.Table:
    """Append content-hash key columns derived from ``column``.

    ``byte_hash`` selects the byte-buffer family where content enters the
    engine (the reference's HashUtil menu): ``sha256`` (default, 64-bit key
    = top hex digits, plus the hex column), or the value-parity
    ``murmur2`` / ``superfast`` 32-bit families (src/hashutil.cc:600,651)
    widened to uint64 by a second seeded pass (two independent 32-bit
    hashes, the reference's BobHash(idx1, idx2) doubling trick), or the
    native 64-bit families ``bob`` (hashlittle2's documented
    ``*pc + (uint64)*pb << 32``, src/hashutil.cc:308-317) and ``spooky``
    (SpookyHash::Hash64, src/hashutil.cc:583)."""
    values = batch.column(column).to_pylist()
    out = batch
    if byte_hash == "sha256":
        keys = sha256_u64(values)
        if sha_col:
            out = out.append_column(sha_col,
                                    pa.array(sha256_hex(values),
                                             type=pa.string()))
    elif byte_hash == "murmur2":
        from ..kernels.hashing import murmur2_bytes
        keys = (murmur2_bytes(values, seed=0).astype(np.uint64) << 32) \
            | murmur2_bytes(values, seed=0x9E3779B9).astype(np.uint64)
    elif byte_hash == "superfast":
        from ..kernels.hashing import murmur2_bytes, superfast_bytes
        keys = (superfast_bytes(values).astype(np.uint64) << 32) \
            | murmur2_bytes(values, seed=0x5F356495).astype(np.uint64)
    elif byte_hash == "bob":
        from ..kernels.hashing import bobhash_bytes
        c, b = bobhash_bytes(values, seed=0, seed2=0)
        keys = c.astype(np.uint64) + (b.astype(np.uint64) << 32)
    elif byte_hash == "spooky":
        from ..kernels.hashing import spooky_bytes
        keys = spooky_bytes(values, seed=0)
    else:
        raise ValueError(f"unknown byte_hash {byte_hash!r}")
    out = out.append_column(key_col, pa.array(keys, type=pa.uint64()))
    if drop_content:
        out = out.drop_columns([column])
    return out


def add_int_keys(batch: pa.Table, column: str, key_col: str = "key_hi64") -> pa.Table:
    """uint64 key column from an integer column, murmur-mixed.

    Raw integer ids (orderkeys etc.) have empty high bits, which would send
    every row to shard 0 of a partitioned filter (routing uses the key's top
    bits); mixing makes the key uniform, and membership semantics are
    unchanged (hash of the id stands in for the id, exactly like
    sha256→key_hi64 stands in for content)."""
    from ..kernels.hashing import mix_split
    ids = batch.column(column).to_numpy(zero_copy_only=False).astype(np.uint64)
    return batch.append_column(key_col, pa.array(mix_split(ids, 0x1D),
                                                 type=pa.uint64()))
