"""Small shared utilities."""

from __future__ import annotations


def cache_get(cache: dict, key, factory, maxn: int = 8):
    """Per-worker-process bounded memo: fetch/construct once per key, FIFO
    eviction past ``maxn`` — long-lived Ray workers see many broadcasts
    across queries and an unbounded cache of multi-MB filter/key blobs is a
    slow leak.  All cached objects are stateless per-batch helpers, so
    eviction only costs a re-fetch."""
    val = cache.get(key)
    if val is None:
        while len(cache) >= maxn:
            cache.pop(next(iter(cache)))
        val = cache[key] = factory()
    return val
