"""Property-based LWW storage law: arbitrary upsert histories converge to
max-timestamp-per-key, independent of batching.

The enumerated cases in test_storage_ingest.py pin specific orderings;
this pins the LAW for random histories: partition the same op sequence
into any batch boundaries, and the final table state equals a trivial
driver-side fold. Timestamps are drawn strictly increasing, so the
expected winner per key is unambiguous (ties are covered by the
enumerated seq-col tests).
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

# a history: op i touches key keys[i]; batching: cut points
histories = st.tuples(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10),
    st.integers(min_value=1, max_value=3),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(histories)
def test_upsert_history_converges_to_lww(spark, history):
    keys, n_batches = history
    ops = [
        (k, dt.datetime(2024, 1, 1, 0, 0, i), i) for i, k in enumerate(keys)
    ]
    expected = {}
    for k, _ts, v in ops:  # strictly increasing ts: last op per key wins
        expected[k] = v

    table = ParquetTable(spark, tempfile.mkdtemp(prefix="ms_lww_") + "/t")
    size = max(1, len(ops) // n_batches)
    for i in range(0, len(ops), size):
        table.upsert(spark.createDataFrame(ops[i : i + size], SCHEMA))
    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert got == expected
