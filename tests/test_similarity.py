"""Similarity-search operator tests: exact baseline vs approximate paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moisturizer_spark.operators.similarity import (
    brute_force_top_k,
    embedding_cosine_pairs,
    ivf_top_k,
    lsh_top_k,
)
from moisturizer_spark.session import load_tables


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_brute_force_top_k_exact_shape(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = brute_force_top_k(emb, queries, k=3).collect()
    per_q = _topk_sets(got)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 3 for v in per_q.values())
    for r in got:
        assert r["query_id"] != r["neighbor_id"]
        assert -1.0 <= r["sim"] <= 1.0


def test_ivf_recall_against_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    approx = _topk_sets(ivf_top_k(emb, queries, k=5, n_lists=8, n_probe=4).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"


def test_ivf_full_probe_matches_brute_force(emb):
    # probing every list = exact search (modulo self-exclusion), so the
    # pruning is the ONLY approximation
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    full = _topk_sets(ivf_top_k(emb, queries, k=5, n_lists=8, n_probe=8).collect())
    assert full == exact


def test_ivf_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, ivf_top_k(emb, queries, k=3).collect()))
    b = sorted(map(tuple, ivf_top_k(emb, queries, k=3).collect()))
    assert a == b


def test_lsh_top_k_shape(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = lsh_top_k(emb, queries, k=3).collect()
    per_q = _topk_sets(got)
    assert per_q and all(len(v) <= 3 for v in per_q.values())


def test_embedding_cosine_pairs_threshold(emb):
    subset = emb.filter(F.col("vec_id") < 40)
    rows = embedding_cosine_pairs(subset, threshold=0.0).collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["sim"] >= 0.0 for r in rows)
    n = subset.count()
    assert len(rows) <= n * (n - 1) / 2


def test_pq_recall_against_brute_force(emb):
    from moisturizer_spark.operators.similarity import pq_top_k

    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    approx = _topk_sets(pq_top_k(emb, queries, k=5).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"PQ recall {hits}/{total}"


def test_pq_sims_are_exact_on_candidates(emb):
    # the refine stage re-ranks with exact cosine: any (q, n) pair PQ
    # returns must carry the same sim brute force computes for that pair
    from moisturizer_spark.operators.similarity import pq_top_k

    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in brute_force_top_k(emb, queries, k=50).collect()
    }
    for r in pq_top_k(emb, queries, k=5).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert abs(r["sim"] - bf[key]) < 1e-9


def test_pq_string_ids_round_trip(emb):
    # encode schema derives the id type from the corpus schema: string
    # corpus ids must come back unchanged, not break or corrupt
    from moisturizer_spark.operators.similarity import pq_top_k

    s = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    queries = s.filter(F.col("vec_id").isin("doc-0", "doc-1"))
    rows = pq_top_k(s, queries, k=3).collect()
    assert rows
    assert all(isinstance(r["neighbor_id"], str) for r in rows)
    assert all(r["neighbor_id"].startswith("doc-") for r in rows)


def test_pq_deterministic(emb):
    from moisturizer_spark.operators.similarity import pq_top_k

    queries = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_top_k(emb, queries, k=3).collect()))
    b = sorted(map(tuple, pq_top_k(emb, queries, k=3).collect()))
    assert a == b
