"""Shared plan-shaping helpers for the analytics operators."""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# innermost-first stack of active cache scopes (see cache_scope)
_SCOPES: list[list[DataFrame]] = []


def materialize(df: DataFrame) -> DataFrame:
    """Persist a subtree that multiple plan branches consume (e.g. both
    sides of an inverted-index self-join).

    Without this, each branch re-executes the subtree — Spark's
    ReuseExchange does not fire across differently-aliased self-join
    sides — and, worse, Catalyst's inferred filters (isnotnull /
    ``size(..) > 0`` from joins and Generates) get alias-substituted
    through the projection into every branch's scan, re-evaluating
    expensive higher-order expressions 2-3× per row. The persist
    boundary computes the subtree exactly once and keeps inferred
    filters evaluating against stored columns.

    MEMORY_AND_DISK (deserialized) spills under pressure; the persisted
    payloads here are compact derived forms (postings, signatures),
    orders of magnitude smaller than the source text they derive from.
    Lifetime: inside a :func:`cache_scope` block the cache is released
    deterministically when the block exits; outside one, Spark's LRU
    eviction is the backstop — fine for one-shot jobs, sloppy for a
    long-lived session, so drivers that run many operators should wrap
    each run in a scope (``bench.py`` does).
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope() -> Iterator[None]:
    """Deterministic cache lifetime for operator runs: every
    :func:`materialize` issued inside the block is unpersisted on exit
    (including on error). Scopes nest; each releases only its own
    persists.

    >>> with cache_scope():
    ...     pairs = minhash_near_duplicates(docs).collect()
    ... # session holds no leftover cached RDDs here
    """
    scope: list[DataFrame] = []
    _SCOPES.append(scope)
    try:
        yield
    finally:
        _SCOPES.pop()
        for df in scope:
            with contextlib.suppress(Exception):
                df.unpersist()


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition a NARROW input up to the session's
    default parallelism — the small-file guard for CPU-heavy per-row
    stages (hashing families, wide aggregates, shingle explodes) whose
    parallelism is otherwise pinned to the input's FILE count.

    The failure mode this removes: a 20 MB parquet table reads as one
    partition, so everything up to the first shuffle — a 64-hash-
    function profile, a trigram explode, a 130-expression bootstrap
    aggregate — runs on ONE core of a 32-core session (measured 4-10×
    end-to-end on the profiling and media queries at sf0.1). On a real
    cluster read the input already has thousands of partitions, the
    guard compares ≥ and no-ops, and the repartition never happens —
    so this costs nothing exactly where it isn't needed.

    Only safe where downstream results are partitioning-independent
    (every deterministic recipe in this package is — pinned by the
    partitioning-independence tests); the round-robin shuffle carries
    the narrow projected rows once.
    """
    sc = df.sparkSession.sparkContext
    target = int(sc.defaultParallelism) * int(factor)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
