"""Type inference lattice unit tests.

Mirrors the reference's parametrized inference matrix
(``/root/reference/tests/test_models.py:35-83``) and schema tests
(``tests/test_schemas.py``) — FIXTURES.md F4.
"""

from __future__ import annotations

import datetime as dt
import decimal

import pytest
from pyspark.sql import types as T

from moisturizer_spark.errors import SchemaConflictError, ValidationError
from moisturizer_spark.typesys import Descriptor, FieldDescriptor, compatible


@pytest.mark.parametrize(
    "value,expected_pair",
    [
        ("foo", ("string", None)),
        ("", ("string", None)),
        (0, ("integer", None)),
        (42, ("integer", None)),
        (42.42, ("number", None)),
        (True, ("boolean", None)),   # bool BEFORE int (reference FIXME)
        (False, ("boolean", None)),
        ({"a": 1}, ("object", None)),
        ([1, 2], ("array", None)),
        (None, ("null", None)),
    ],
)
def test_infer_from_value(value, expected_pair):
    assert FieldDescriptor.from_value(value).pair == expected_pair


@pytest.mark.parametrize(
    "pair,spark_type",
    [
        (("string", None), T.StringType()),
        (("number", None), T.DecimalType(38, 18)),
        (("integer", None), T.LongType()),
        (("boolean", None), T.BooleanType()),
        (("string", "date-time"), T.TimestampType()),
        (("string", "uuid"), T.StringType()),
        (("number", "float"), T.FloatType()),
        (("number", "double"), T.DoubleType()),
        (("array", None), T.StringType()),   # fallback (reference models.py:37)
        (("object", None), T.StringType()),
    ],
)
def test_spark_type_mapping(pair, spark_type):
    fd = FieldDescriptor(type=pair[0], format=pair[1])
    assert fd.spark_type() == spark_type


def test_null_type_drops_column():
    assert FieldDescriptor(type="null").spark_type() is None


def test_invalid_field_descriptor_rejected():
    # FIXTURES.md F3: {'type':'pancakes','index':42} must be rejected
    with pytest.raises(ValidationError):
        FieldDescriptor(type="pancakes")


def test_descriptor_has_implicit_system_columns():
    d = Descriptor(id="my_type")
    assert d.properties["id"].primary_key
    assert d.properties["last_modified"].pair == ("string", "date-time")
    schema = d.spark_schema()
    assert schema.fieldNames()[:2] == ["id", "last_modified"]


def test_infer_schema_change_adds_fields():
    d = Descriptor(id="my_type")
    new = d.infer_schema_change({"foo": "bar", "number": 42})
    assert new["foo"].pair == ("string", None)
    assert new["number"].pair == ("integer", None)
    d.apply_change(new)
    # re-running with same payload: no new fields (DDL avoidance guard)
    assert d.infer_schema_change({"foo": "baz", "number": 1}) == {}


def test_conflict_raises_not_widens():
    d = Descriptor(id="my_type")
    d.apply_change(d.infer_schema_change({"field": 42}))
    with pytest.raises(SchemaConflictError):
        d.infer_schema_change({"field": "bar"})


def test_int_into_number_is_compatible():
    assert compatible(FieldDescriptor(type="number"), FieldDescriptor(type="integer"))
    assert not compatible(FieldDescriptor(type="integer"), FieldDescriptor(type="number"))


def test_validate_coerces_and_drops_nulls():
    d = Descriptor(id="t")
    d.apply_change(d.infer_schema_change({"s": "x", "n": 1.5, "i": 7, "gone": None}))
    out = d.validate({"s": "x", "n": 1.5, "i": 7, "gone": None})
    assert "gone" not in out
    assert isinstance(out["n"], decimal.Decimal)
    assert isinstance(out["id"], str) and out["id"]
    assert isinstance(out["last_modified"], dt.datetime)


def test_validate_number_wide_integer_part():
    """DECIMAL(38,18) has 20 digits of integer headroom; values like
    1.5e11 (11 integer digits) must quantize cleanly. Under Python's
    default decimal context (prec=28) the quantize would spuriously
    raise InvalidOperation for anything past 10 integer digits — the
    coercion runs at prec=38 precisely so the documented bound holds."""
    d = Descriptor(id="t")
    d.apply_change(d.infer_schema_change({"n": 1.5}))
    out = d.validate({"n": 1.5e11})
    assert out["n"] == decimal.Decimal("150000000000")
    # full 20-digit integer part, exactly at the storage bound
    out = d.validate({"n": int("9" * 20)})
    assert out["n"] == decimal.Decimal("9" * 20)
    # 21 integer digits: true DECIMAL(38,18) overflow still dead-letters
    with pytest.raises(ValidationError):
        d.validate({"n": int("1" + "0" * 20)})


def test_validate_rejects_type_mismatch():
    d = Descriptor(id="t")
    d.apply_change(d.infer_schema_change({"number": 42}))
    with pytest.raises(ValidationError):
        d.validate({"number": "not a number"})


def test_validate_coerces_id_to_string():
    d = Descriptor(id="t")
    out = d.validate({"id": 42})
    assert out["id"] == "42"


def test_required_field_enforced():
    d = Descriptor(id="t", properties={"must": FieldDescriptor(type="string", required=True)})
    with pytest.raises(ValidationError):
        d.validate({})


def test_descriptor_round_trip():
    d = Descriptor(id="t")
    d.apply_change(d.infer_schema_change({"a": 1, "b": "x", "c": True}))
    d2 = Descriptor.from_row(d.to_row())
    assert {k: v.pair for k, v in d2.properties.items()} == {
        k: v.pair for k, v in d.properties.items()
    }
