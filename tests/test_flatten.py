"""Flatten/unflatten semantics — FIXTURES.md F5."""

from __future__ import annotations

from pyspark.sql import Row

from moisturizer_spark.flatten import flatten_df, flatten_dict, unflatten_df, unflatten_dict


def test_flatten_dict_nested_and_null_drop():
    src = {"a": {"b": 1, "c": {"d": "x"}}, "e": None}
    assert flatten_dict(src) == {"a__b": 1, "a__c__d": "x"}


def test_unflatten_round_trip():
    flat = {"a__b": 1, "a__c__d": "x", "top": True}
    assert unflatten_dict(flat) == {"a": {"b": 1, "c": {"d": "x"}}, "top": True}


def test_flatten_df_is_pure_projection(spark):
    df = spark.createDataFrame(
        [Row(a=Row(b=1, c=Row(d="x")), e="top")]
    )
    flat = flatten_df(df)
    assert set(flat.columns) == {"a__b", "a__c__d", "e"}
    assert flat.collect()[0].asDict() == {"a__b": 1, "a__c__d": "x", "e": "top"}
    # must stay a single projection over the scan (no shuffle/exchange)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unflatten_df_rebuilds_structs(spark):
    df = spark.createDataFrame([Row(a__b=1, a__c__d="x", e="top")])
    nested = unflatten_df(df)
    row = nested.collect()[0]
    assert row["a"]["b"] == 1
    assert row["a"]["c"]["d"] == "x"
    assert row["e"] == "top"
