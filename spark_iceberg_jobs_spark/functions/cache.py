"""Scoped caching — bounded persist() lifetimes for multi-consumer plans.

Several operators persist an intermediate that feeds 2-3 consumers (the
shingle set in dedup, the banded signatures in LSH). A bare ``persist()``
entry lives in the session's CacheManager until the session dies; a long
session running many dedup batches accumulates entries and eventually
evicts useful blocks (VERDICT r1 item 8).

``scoped_persist`` registers the DataFrame with the innermost active
``cache_scope`` so it is unpersisted (blocking) when the scope exits.
Outside any scope it degrades to a plain ``persist()`` — operators never
require callers to opt in. Batch runners wrap materialization:

    with cache_scope():
        result = pipeline_corpus_curation(spark, sf_dir).collect()
    # all intermediates dropped; CacheManager is clean

The caller must CONSUME the result inside the scope (collect/write/count) —
a lazily-held DataFrame re-computes its lineage after the caches drop
(correct, just slower).
"""

from __future__ import annotations

import threading
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Thread-LOCAL scope stack (review finding, r8): concurrent driver
# threads submitting parallel jobs — a normal Spark pattern — must not
# cross-register into each other's scopes, or thread B's scope exit
# unpersists thread A's still-in-use intermediate mid-query (forcing a
# full lineage recompute) and pops the wrong scope off a shared stack.
_LOCAL = threading.local()


def _scopes() -> list[list[DataFrame]]:
    scopes = getattr(_LOCAL, "scopes", None)
    if scopes is None:
        scopes = _LOCAL.scopes = []
    return scopes


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() that the innermost cache_scope OF THIS THREAD will
    unpersist on exit (no scope on this thread → plain persist())."""
    df = df.persist()
    scopes = _scopes()
    if scopes:
        scopes[-1].append(df)
    return df


def release(df: DataFrame) -> None:
    """Unpersist now and drop the scope registration (for intermediates
    whose last consumer has already materialized, e.g. loop iterations)."""
    df.unpersist()
    for scope in _scopes():
        if any(d is df for d in scope):
            scope[:] = [d for d in scope if d is not df]


@contextmanager
def cache_scope() -> Iterator[None]:
    scopes = _scopes()
    scope: list[DataFrame] = []
    scopes.append(scope)
    try:
        yield
    finally:
        scopes.pop()
        for df in scope:
            try:
                df.unpersist(blocking=True)
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
