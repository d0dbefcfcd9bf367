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
                     drop_content: bool = False) -> pa.Table:
    """Append sha256-hex + uint64-key columns derived from ``column``."""
    values = batch.column(column).to_pylist()
    hexes = sha256_hex(values)
    keys = sha256_u64(values)
    out = batch
    if sha_col:
        out = out.append_column(sha_col, pa.array(hexes, type=pa.string()))
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
