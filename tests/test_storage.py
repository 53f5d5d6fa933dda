"""Zero-copy table clone: hardlink snapshot, vacuum survival, COW
isolation, time-travel clones."""

from __future__ import annotations


# -- zero-copy clone -----------------------------------------------------------


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id string, v long")


def test_clone_is_zero_copy_and_reads_identically(spark, warehouse):
    import os

    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src", retain_versions=3)
    src.overwrite(_rows(spark, [("a", 1), ("b", 2), ("c", 3)]))
    clone = src.clone_to(f"{warehouse}/cl_dst")
    assert {(r["id"], r["v"]) for r in clone.read().collect()} == {
        ("a", 1), ("b", 2), ("c", 3)
    }
    # same inodes: no data bytes were copied
    linked = 0
    for root, _dirs, files in os.walk(f"{warehouse}/cl_dst/data"):
        for f in files:
            if f.endswith(".parquet"):
                assert os.stat(os.path.join(root, f)).st_nlink >= 2
                linked += 1
    assert linked > 0


def test_clone_survives_source_rewrite_and_vacuum(spark, warehouse):
    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src2", retain_versions=1)
    src.overwrite(_rows(spark, [("a", 1), ("b", 2)]))
    clone = src.clone_to(f"{warehouse}/cl_dst2")
    # churn the source far past its retention: old files vacuum away
    for i in range(3, 7):
        src.overwrite(_rows(spark, [("a", i)]))
    assert {(r["id"], r["v"]) for r in src.read().collect()} == {("a", 6)}
    # the clone still reads the snapshot (hard links survive unlink)
    assert {(r["id"], r["v"]) for r in clone.read().collect()} == {
        ("a", 1), ("b", 2)
    }


def test_clone_writes_are_isolated_from_source(spark, warehouse):
    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src3")
    src.overwrite(_rows(spark, [("a", 1), ("b", 2)]))
    clone = src.clone_to(f"{warehouse}/cl_dst3")
    clone.upsert(_rows(spark, [("b", 99), ("z", 7)]))
    assert {(r["id"], r["v"]) for r in clone.read().collect()} == {
        ("a", 1), ("b", 99), ("z", 7)
    }
    assert {(r["id"], r["v"]) for r in src.read().collect()} == {
        ("a", 1), ("b", 2)
    }


def test_clone_of_historical_version_and_clobber_refusal(spark, warehouse):
    import pytest

    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src4", retain_versions=5)
    src.overwrite(_rows(spark, [("a", 1)]))
    src.upsert(_rows(spark, [("a", 2)]))
    old = src.clone_to(f"{warehouse}/cl_dst4", version=1)
    assert {(r["id"], r["v"]) for r in old.read().collect()} == {("a", 1)}
    with pytest.raises(ValueError, match="already holds"):
        src.clone_to(f"{warehouse}/cl_dst4")


def test_clone_preserves_txn_watermarks(spark, warehouse):
    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src5")
    src.overwrite(_rows(spark, [("a", 1)]), txn=("app", 7))
    clone = src.clone_to(f"{warehouse}/cl_dst5")
    assert clone.txn_version("app") == 7
