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

def test_clone_version_counter_continues_from_source(spark, warehouse):
    """ADVICE r08 (high): a clone born at version 1 while hard-linking
    the source's data/vNNNNNN dirs verbatim eventually advances its own
    counter INTO a linked dir number, and _write_version's
    mode("overwrite") clobbers that snapshot dir — destroying every
    carried bucket in it. Source at v3 + two bucket-disjoint upserts on
    the clone reproduced PATH_NOT_FOUND before the fix. The clone's
    manifest must start AT the cloned version so its future writes land
    in fresh dirs."""
    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src6", key="id", n_buckets=4)
    src.overwrite(_rows(spark, [("k1", 1)]))
    src.upsert(_rows(spark, [("k2", 2)]))
    src.upsert(_rows(spark, [("k3", 3)]))
    assert src._load_manifest()["version"] == 3
    clone = src.clone_to(f"{warehouse}/cl_dst6")
    assert clone._load_manifest()["version"] == 3

    # two upserts whose keys land in buckets DISJOINT from every carried
    # bucket — before the fix the second write overwrote data/v000003,
    # dropping a carried bucket the manifest still references
    carried = {src.bucket_of(k) for k in ("k1", "k2", "k3")}
    fresh = [f"n{i}" for i in range(200) if src.bucket_of(f"n{i}") not in carried]
    assert len(fresh) >= 2, "need keys outside the carried buckets"
    clone.upsert(_rows(spark, [(fresh[0], 10)]))
    clone.upsert(_rows(spark, [(fresh[1], 11)]))
    got = {(r["id"], r["v"]) for r in clone.read().collect()}
    assert got == {("k1", 1), ("k2", 2), ("k3", 3), (fresh[0], 10), (fresh[1], 11)}
    # and the source is untouched
    assert {(r["id"], r["v"]) for r in src.read().collect()} == {
        ("k1", 1), ("k2", 2), ("k3", 3)
    }

def test_clone_many_files_parallel_links(spark, warehouse):
    """The link fan-out (threaded past 8 files) must preserve exact
    inode identity for EVERY file and complete a many-file clone
    quickly — the serial-loop hazard was minutes of single-threaded
    driver work at millions of files."""
    import os
    import time

    from moisturizer_spark.storage import ParquetTable

    src = ParquetTable(spark, f"{warehouse}/cl_src7", key="id", n_buckets=16)
    # several versions x 16 buckets -> well past the threaded threshold
    src.overwrite(_rows(spark, [(f"k{i}", i) for i in range(64)]))
    src.upsert(_rows(spark, [(f"k{i}", i + 100) for i in range(64)]))
    t0 = time.monotonic()
    clone = src.clone_to(f"{warehouse}/cl_dst7")
    elapsed = time.monotonic() - t0
    assert elapsed < 30  # pure metadata ops; generous CI bound

    def inodes(root):
        out = {}
        for r, _d, files in os.walk(os.path.join(root, "data")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    out[os.path.relpath(p, root)] = os.stat(p).st_ino
        return out

    src_ino = inodes(f"{warehouse}/cl_src7")
    dst_ino = inodes(f"{warehouse}/cl_dst7")
    # every manifest-referenced file linked: same relpath -> same inode
    shared = {k: v for k, v in dst_ino.items() if k in src_ino}
    assert len(shared) > 8
    assert all(src_ino[k] == v for k, v in shared.items())
    assert clone.read().count() == 64
