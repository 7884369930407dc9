"""Per-table-version artifact cache (BM25 index, ingest-guard hashes).

The reference keys its persisted FTS index by the table's modified date
(df_duckdb.py:321-379): an artifact is valid for exactly one version of
one table identity, and a new version evicts the stale build. Both the
BM25 index and the dedup corpus-hash relation follow that contract —
this helper is the single implementation so build parameters are always
part of the cache key (a window-10 hash set must never answer a
window-20 lookup) and eviction/unpersist logic exists once.
"""

from __future__ import annotations

from typing import Any, Callable


def versioned_artifact(
    cache: dict,
    identity: Any,
    version: Any,
    params: tuple,
    build: Callable[[], Any],
    release: Callable[[Any], None],
):
    """Return the cached artifact for ``(identity, version, params)``,
    building it on miss. Entries of the same identity at a DIFFERENT
    version are evicted through ``release`` first (stale builds must
    not pin executor memory); different ``params`` at the same version
    coexist — they are different artifacts, not stale ones."""
    key = (identity, version, params)
    art = cache.get(key)
    if art is None:
        for stale in [k for k in cache if k[0] == identity and k[1] != version]:
            release(cache.pop(stale))
        art = build()
        cache[key] = art
    return art
