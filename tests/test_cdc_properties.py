"""Property-based CDC law: folding the change feed reconstructs any state.

The incremental-view machinery (incremental.py) is only sound if
``table_changes`` is a complete, exact delta log: for ANY random history
of upserts and deletes, applying the per-commit changes (insert/
update_postimage add, delete/update_preimage remove) to the initial
state must equal the table's final state. The enumerated CDC tests pin
specific classifications; this pins the fold law over random histories.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from moisturizer_spark.storage import ParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)

# a history: each step is ('up', [keys]) or ('del', [keys])
steps = st.lists(
    st.tuples(
        st.sampled_from(["up", "del"]),
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=2, unique=True),
    ),
    min_size=2,
    max_size=4,
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(steps)
def test_cdc_fold_reconstructs_final_state(spark, history):
    table = ParquetTable(
        spark, tempfile.mkdtemp(prefix="ms_cdc_") + "/t", retain_versions=20
    )
    seq = 0
    state: dict[str, int] = {}
    base_version = None
    for op, keys in history:
        if op == "up":
            rows = []
            for k in keys:
                seq += 1
                rows.append((k, dt.datetime(2024, 1, 1, 0, 0, seq), seq))
                state[k] = seq
            table.upsert(spark.createDataFrame(rows, SCHEMA))
        else:
            if not table.exists():
                continue  # delete before any write: no version to diff
            table.delete_by_key(keys)
            for k in keys:
                state.pop(k, None)
        if base_version is None:
            base_version = 1  # first commit becomes version 1

    man = table._load_manifest()
    if man is None:
        assert state == {}  # all-delete history: table never materialized
        return
    final_version = man["version"]
    if final_version <= 1:
        return  # single-commit history: nothing to fold
    folded: dict[str, int] = {
        r["id"]: r["v"] for r in table.read(version=1).collect()
    }
    for r in table.table_changes(1, final_version).collect():
        if r["_change_type"] in ("insert", "update_postimage"):
            folded[r["id"]] = r["v"]
        elif r["_change_type"] == "delete":
            folded.pop(r["id"], None)
        # update_preimage: superseded by its postimage; nothing to do
    assert folded == state
    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert got == state
