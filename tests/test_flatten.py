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


# -- property: flatten/unflatten are inverses (modulo null/empty drops) -------

from hypothesis import given, settings, strategies as st

_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=6
)
_nested = st.recursive(
    st.one_of(
        st.booleans(),
        st.integers(),
        st.floats(allow_nan=False),
        st.text(max_size=10),
        st.none(),
    ),
    lambda kids: st.dictionaries(_keys, kids, max_size=4),
    max_leaves=12,
)


def _strip_nulls(obj):
    """The canonical form both directions converge to: no None leaves,
    no dict branches that became empty after the drop."""
    if not isinstance(obj, dict):
        return obj
    out = {}
    for k, v in obj.items():
        if v is None:
            continue
        sv = _strip_nulls(v)
        if isinstance(sv, dict) and not sv:
            continue
        out[k] = sv
    return out


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(_keys, _nested, max_size=5))
def test_flatten_unflatten_roundtrip(obj):
    from moisturizer_spark.flatten import flatten_dict, unflatten_dict

    flat = flatten_dict(obj)
    # flatten output is genuinely flat and never carries None
    assert all(not isinstance(v, dict) and v is not None for v in flat.values())
    assert unflatten_dict(flat) == _strip_nulls(obj)
