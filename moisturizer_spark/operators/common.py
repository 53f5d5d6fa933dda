"""Shared plan-shaping helpers for the analytics operators."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


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
    orders of magnitude smaller than the source text they derive from,
    so this holds at cluster scale. Spark evicts LRU; callers do not
    need to unpersist.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)
