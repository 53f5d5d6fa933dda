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


def test_det_lsh_recall_and_determinism(emb):
    """Deterministic LSH: useful recall vs brute force at 4 planes (16
    buckets over 500 vecs → ~31 candidates per query), and re-running
    yields the identical frame (md5 planes, no RNG anywhere)."""
    from moisturizer_spark.operators.similarity import det_lsh_top_k

    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    got = det_lsh_top_k(emb, queries, k=5).collect()
    approx = _topk_sets(got)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.3, f"det-LSH recall {hits}/{total}"
    again = det_lsh_top_k(emb, queries, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_det_lsh_wrong_dim_raises(spark):
    """A wrong-length vector must raise, not silently collapse every
    row into bucket 0 (NULL dots) and go quadratic."""
    import pytest as _pytest

    from moisturizer_spark.operators.similarity import det_lsh_top_k

    df = spark.createDataFrame(
        [(1, [0.1] * 32), (2, [0.2] * 32)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="expected 64-dim"):
        det_lsh_top_k(df, df, k=1).collect()


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


def test_ivf_build_query_matches_ivf_top_k(emb, spark, warehouse):
    from moisturizer_spark.operators.similarity import ivf_build, ivf_query

    ivf_build(emb, f"{warehouse}/ivf", n_lists=8)
    queries = emb.filter(F.col("vec_id") < 10)
    live = sorted(map(tuple, ivf_top_k(emb, queries, k=5, n_lists=8, n_probe=4).collect()))
    stored = sorted(map(tuple, ivf_query(spark, f"{warehouse}/ivf", queries, k=5, n_probe=4).collect()))
    assert stored == live  # same centroids (deterministic) ⇒ same answers


def test_ivf_query_has_no_assignment_stage_and_prunes(emb, spark, warehouse):
    from moisturizer_spark.operators.similarity import ivf_build, ivf_query

    ivf_build(emb, f"{warehouse}/ivf2", n_lists=8)
    queries = emb.filter(F.col("vec_id") < 3)
    df = ivf_query(spark, f"{warehouse}/ivf2", queries, k=3, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no assignment stage: the Arrow mapInPandas kernel must not appear
    assert "MapInPandas" not in plan and "ArrowEval" not in plan, plan
    # the probed-list filter reaches the scan as a PARTITION filter, so
    # unprobed list directories are never read
    assert "PartitionFilters" in plan and "_c_list" in plan.split("PartitionFilters", 1)[1][:200], plan
    assert df.count() > 0


def test_semantic_dedup_keeps_one_rep_per_group(spark):
    from moisturizer_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.999, 0.001, 0.0]),   # near-dup of 2
        (4, [0.0, 0.0, 0.0, 1.0]),       # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in semantic_dedup(df, threshold=0.99, k=2).collect()}
    assert got == {0, 2, 4}


def test_semantic_dedup_threshold_one_keeps_all_distinct(emb):
    from moisturizer_spark.operators.similarity import semantic_dedup

    subset = emb.filter(F.col("vec_id") < 50)
    survivors = semantic_dedup(subset, threshold=1.0, k=4).count()
    # only exact-cosine duplicates collapse at threshold 1.0
    assert 0 < survivors <= 50


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


def test_ivf_append_cross_batch(emb, spark, warehouse):
    from moisturizer_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_query,
    )

    first = emb.filter(F.col("vec_id") >= 100)
    batch = emb.filter(F.col("vec_id") < 100)
    path = f"{warehouse}/ivf_app"
    meta = ivf_build(first, path, n_lists=8)
    ivf_append(spark, path, batch)

    queries = emb.filter(F.col("vec_id") < 5)
    # exhaustive probe (n_probe = n_lists) makes IVF exact regardless of
    # centroid placement: appended index == brute force over the UNION —
    # proving the appended rows landed in queryable lists with correct
    # vectors, not just that recall is "okay"
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    full = _topk_sets(
        ivf_query(spark, path, queries, k=5, n_probe=meta["n_lists"]).collect()
    )
    assert full == exact

    # normal probe still reaches appended near-neighbors: each query
    # vector IS an appended row, and its nearest list is its own, so its
    # top hits include appended ids
    part = ivf_query(spark, path, queries, k=5, n_probe=4).collect()
    hit_appended = {r["neighbor_id"] for r in part if r["neighbor_id"] < 100}
    assert hit_appended, "appended rows never surfaced in probed queries"
    # recall vs exact at n_probe=4 stays useful (same bar as the
    # transient IVF recall test)
    got = _topk_sets(part)
    overlap = sum(len(exact[q] & got.get(q, set())) for q in exact)
    assert overlap / sum(len(v) for v in exact.values()) >= 0.6


def test_ivf_append_validates_batch_schema(emb, spark, warehouse):
    from moisturizer_spark.operators.similarity import ivf_append, ivf_build

    path = f"{warehouse}/ivf_val"
    ivf_build(emb.filter(F.col("vec_id") < 50), path, n_lists=4)
    with pytest.raises(ValueError, match="embedding"):
        ivf_append(spark, path, emb.select("vec_id"))
    with pytest.raises(ValueError, match="vec_id"):
        ivf_append(
            spark, path,
            emb.select(F.col("vec_id").cast("string").alias("vec_id"), "embedding"),
        )


def test_ivf_compact_preserves_results_and_heals_files(emb, spark, warehouse):
    import glob
    import os

    from moisturizer_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_compact,
        ivf_query,
    )

    path = f"{warehouse}/ivf_compact"
    ivf_build(emb.filter(F.col("vec_id") >= 100), path, n_lists=4)
    for lo in (0, 30, 60):  # three appends fragment the list dirs
        ivf_append(
            spark, path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)),
        )
    queries = emb.filter(F.col("vec_id") < 5)
    before = sorted(map(tuple, ivf_query(spark, path, queries, k=5, n_probe=4).collect()))

    n_files = len(glob.glob(os.path.join(path, "data", "_c_list=*", "*.parquet")))
    meta = ivf_compact(spark, path)
    n_after = len(glob.glob(os.path.join(path, meta["data_dir"], "_c_list=*", "*.parquet")))
    assert n_after < n_files, (n_after, n_files)
    assert not os.path.exists(os.path.join(path, "data"))
    after = sorted(map(tuple, ivf_query(spark, path, queries, k=5, n_probe=4).collect()))
    assert after == before and before


def test_det_ivf_recall_and_determinism(emb):
    """Deterministic IVF: frozen md5 centroids cost recall vs the
    trained quantizer (lists don't hug the data) — the floor is a
    measurement guard, not a promise (0.60 measured at sf0.1, 8 lists /
    4 probes); re-running yields the identical frame (no RNG)."""
    from moisturizer_spark.operators.similarity import det_ivf_top_k

    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    got = det_ivf_top_k(emb, queries, k=5).collect()
    approx = _topk_sets(got)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.3, f"det-IVF recall {hits}/{total}"
    again = det_ivf_top_k(emb, queries, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_det_ivf_wrong_dim_raises(spark):
    from moisturizer_spark.operators.similarity import det_ivf_top_k

    bad = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="expected 64-dim"):
        det_ivf_top_k(bad, bad.filter(F.col("vec_id") < 1), k=2).collect()


def test_det_pq_recall_and_determinism(emb):
    """Deterministic PQ: frozen md5 codebooks quantize looser than
    k-means-trained ones — recall floor is a measurement guard (0.46
    measured at sf0.1, m=8 × 8 codes, refine=16); determinism is the
    contract under test."""
    from moisturizer_spark.operators.similarity import det_pq_top_k

    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_top_k(emb, queries, k=5).collect())
    got = det_pq_top_k(emb, queries, k=5).collect()
    approx = _topk_sets(got)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.25, f"det-PQ recall {hits}/{total}"
    again = det_pq_top_k(emb, queries, k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_det_pq_dim_not_divisible_raises(emb):
    from moisturizer_spark.operators.similarity import det_pq_top_k

    with pytest.raises(ValueError, match="not divisible"):
        det_pq_top_k(emb, emb, m=7)


def test_det_pq_shortlist_bounds_rerank(emb):
    """The exact re-rank only ever sees k·refine candidates per query:
    output never exceeds k rows per query and sims are exact cosines
    (spot-check one pair against the brute-force frame)."""
    from moisturizer_spark.operators.similarity import det_pq_top_k

    queries = emb.filter(F.col("vec_id") < 3)
    got = det_pq_top_k(emb, queries, k=4, refine=4).collect()
    per_q = _topk_sets(got)
    assert all(len(v) <= 4 for v in per_q.values())
    exact = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in brute_force_top_k(emb, queries, k=500).collect()
    }
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact and abs(exact[key] - r["sim"]) < 1e-9


def test_det_ann_partitioning_independent(emb):
    """det-IVF / det-PQ results are invariant to input partitioning —
    the dim-by-dim fold kernels operate per row, and every ranking has
    a total order, so layout can't leak into the answer."""
    from moisturizer_spark.operators.similarity import (
        det_ivf_top_k,
        det_pq_top_k,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    for fn in (det_ivf_top_k, det_pq_top_k):
        a = sorted(map(tuple, fn(emb.repartition(1), queries, k=5).collect()))
        b = sorted(map(tuple, fn(emb.repartition(11), queries, k=5).collect()))
        assert a == b, fn.__name__


def test_ivf_drift_report(spark, emb, tmp_path):
    """Balanced fresh index reports healthy; a pile of appends all
    landing in one list trips the skew trigger."""
    from moisturizer_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_drift_report,
    )

    path = str(tmp_path / "ivf_drift")
    ivf_build(emb.filter(F.col("vec_id") < 200), path, n_lists=8)
    rep = ivf_drift_report(spark, path)
    assert rep["n_vectors"] == 200 and rep["n_lists"] == 8
    assert not rep["rebuild_recommended"], rep

    # drift: append 5x the corpus, every vector identical -> one list
    one = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    drifted = spark.createDataFrame(
        [(10_000 + i, list(one)) for i in range(1000)],
        "vec_id long, embedding array<float>",
    )
    ivf_append(spark, path, drifted)
    rep2 = ivf_drift_report(spark, path)
    assert rep2["n_vectors"] == 1200
    assert rep2["skew"] > 4.0 and rep2["rebuild_recommended"], rep2


def test_retrain_if_drifted_end_to_end(spark, emb, tmp_path):
    """The r6-verdict wiring: drifted appends -> report flags ->
    retrain -> balance (and recall on the drifted region) restored,
    all under the generation-dir swap machinery. A healthy index is a
    no-op."""
    from moisturizer_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_drift_report,
        ivf_query,
        retrain_if_drifted,
    )

    path = str(tmp_path / "ivf_retrain")
    ivf_build(emb.filter(F.col("vec_id") < 200), path, n_lists=8)
    # healthy: no-op, old generation untouched
    out = retrain_if_drifted(spark, path)
    assert not out["retrained"]
    assert out["meta"].get("data_dir", "data") == "data"

    # drift: a new tight cluster, 5x the corpus, all in one list
    one = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    import random

    rng = random.Random(7)
    drifted = spark.createDataFrame(
        [
            (
                10_000 + i,
                [float(x) + rng.uniform(-0.01, 0.01) for x in one],
            )
            for i in range(1000)
        ],
        "vec_id long, embedding array<float>",
    )
    ivf_append(spark, path, drifted)
    before = ivf_drift_report(spark, path)
    assert before["rebuild_recommended"]

    out = retrain_if_drifted(spark, path)
    assert out["retrained"] and out["report"] == before
    after = ivf_drift_report(spark, path)
    assert after["n_vectors"] == 1200
    assert after["skew"] < before["skew"], (before["skew"], after["skew"])
    assert not after["rebuild_recommended"], after
    # recall restored on the drifted region: with retrained centroids
    # the dense cluster splits across lists, and a 1-probe query from
    # inside it finds same-cluster neighbors at full similarity
    q = spark.createDataFrame(
        [(1, list(one))], "vec_id long, embedding array<float>"
    )
    got = ivf_query(spark, path, q, k=5, n_probe=1).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] >= 10_000 or r["neighbor_id"] == 0
               for r in got), got
    # swap hygiene: exactly one data generation remains
    import os

    gens = [d for d in os.listdir(path) if d.startswith("data")]
    assert gens == [out["meta"]["data_dir"]], gens
