"""Property-based ingest robustness: random payloads never crash the engine.

The law that protects a 100 TB ingest: for ANY batch of JSON-ish
payloads, ``ingest_batch`` either stores a record or dead-letters it —
no exception escapes, and no record vanishes. Accounting is exact:
stored + dead == submitted (by id), and a second batch with the same
field at an incompatible type dead-letters rather than corrupting the
inferred schema (the reference's conflict-is-error contract).

Hypothesis drives payload shapes: nested objects, nulls, mixed numeric
widths, unicode keys, empty dicts. Examples are capped small — each
runs a real Spark micro-batch.
"""

from __future__ import annotations

import json
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from moisturizer_spark.ingest import IngestEngine
from moisturizer_spark.registry import Registry

# JSON-ish payload values (no NaN/Inf — JSON can't carry them)
value = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=12),
    ),
    lambda children: st.dictionaries(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=6,
        ),
        children,
        max_size=3,
    ),
    max_leaves=6,
)

payloads = st.lists(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "nested"]), value, max_size=4
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(payloads)
def test_every_record_stores_or_dead_letters(spark, batch):
    tmp = tempfile.mkdtemp(prefix="ms_prop_")
    reg = Registry(spark, tmp)
    eng = IngestEngine(reg)
    rows = [
        ("t", json.dumps({**p, "id": i}))
        for i, p in enumerate(batch)
    ]
    df = spark.createDataFrame(rows, "type_id string, data string")
    eng.ingest_batch(df)  # the property: this NEVER raises

    stored = (
        reg.table("t").read().count() if reg.table("t").exists() else 0
    )
    dead = eng.dead_letters().count()
    assert stored + dead == len(rows), (
        f"lost records: stored={stored} dead={dead} submitted={len(rows)}"
    )


def test_cross_batch_type_conflict_dead_letters_not_corrupts(spark):
    tmp = tempfile.mkdtemp(prefix="ms_prop_")
    reg = Registry(spark, tmp)
    eng = IngestEngine(reg)
    b1 = spark.createDataFrame(
        [("t", json.dumps({"id": 1, "x": 5}))], "type_id string, data string"
    )
    eng.ingest_batch(b1)
    # same field arrives as an incompatible type: record dead-letters,
    # the stored schema and prior rows are untouched
    b2 = spark.createDataFrame(
        [
            ("t", json.dumps({"id": 2, "x": "oops"})),
            ("t", json.dumps({"id": 3, "x": 7})),
        ],
        "type_id string, data string",
    )
    eng.ingest_batch(b2)
    stored = {int(r["id"]) for r in reg.table("t").read().collect()}
    assert 1 in stored and 3 in stored and 2 not in stored
    assert eng.dead_letters().count() == 1
