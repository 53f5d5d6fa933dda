"""msgpack_mini codec: spec byte-vector pins + property round-trips.

The decoder's correctness cannot lean on the real ``msgpack`` package
(absent in this container), so the pins below are canonical encodings
taken directly from the public msgpack spec — if the real package IS
importable, a cross-validation test compares the two codecs on the
same inputs as well.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from moisturizer_spark.msgpack_mini import dumps, loads

# (object, canonical bytes) — hand-assembled from the msgpack spec
SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (2**64 - 1, b"\xcf" + b"\xff" * 8),
    (-33, b"\xd0\xdf"),
    (-129, b"\xd1\xff\x7f"),
    (-(2**31), b"\xd2\x80\x00\x00\x00"),
    (-(2**63), b"\xd3\x80" + b"\x00" * 7),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("hello", b"\xa5hello"),
    ("a" * 31, b"\xbf" + b"a" * 31),
    ("a" * 32, b"\xd9\x20" + b"a" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, "x"], b"\x92\x01\xa1x"),
    ({}, b"\x80"),
    # the spec's README example: {"compact": true, "schema": 0}
    (
        {"compact": True, "schema": 0},
        b"\x82\xa7compact\xc3\xa6schema\x00",
    ),
    ({"k": [None, -5]}, b"\x81\xa1k\x92\xc0\xfb"),
]


@pytest.mark.parametrize("obj,wire", SPEC_VECTORS, ids=repr)
def test_spec_vector_roundtrip(obj, wire):
    assert dumps(obj) == wire
    assert loads(wire) == obj


def test_wide_length_forms_decode():
    # str16 / array16 / map16 (encoder only emits them above 255/65535
    # elements; decode must accept any producer's width choice)
    assert loads(b"\xda\x00\x03abc") == "abc"
    assert loads(b"\xdc\x00\x02\x01\x02") == [1, 2]
    assert loads(b"\xde\x00\x01\xa1a\x01") == {"a": 1}
    assert loads(b"\xca\x3f\xc0\x00\x00") == 1.5  # float32


def test_ext_type_raises():
    with pytest.raises(ValueError, match="ext"):
        loads(b"\xd4\x01\x00")  # fixext1


def test_truncated_and_trailing_raise():
    with pytest.raises(ValueError, match="truncated"):
        loads(b"\xa5hel")
    with pytest.raises(ValueError, match="trailing"):
        loads(b"\x01\x02")


def test_raw_true_rejected():
    with pytest.raises(TypeError):
        loads(b"\xa1a", raw=True)


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
    st.binary(max_size=40),
)
_trees = st.recursive(
    _scalars,
    lambda c: st.one_of(
        st.lists(c, max_size=6),
        st.dictionaries(st.text(max_size=12), c, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(_trees)
def test_roundtrip_property(obj):
    back = loads(dumps(obj))
    assert back == obj
    # and float NaN-free equality means types survived too
    assert _types_match(obj, back)


def _types_match(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return type(a) is type(b)
    if isinstance(a, dict):
        return isinstance(b, dict) and all(
            _types_match(a[k], b[k]) for k in a
        )
    if isinstance(a, (list, tuple)):
        return isinstance(b, list) and all(
            _types_match(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, bytes):
        return isinstance(b, bytes)
    return True


def test_nan_and_inf_survive():
    assert math.isnan(loads(dumps(float("nan"))))
    assert loads(dumps(float("inf"))) == float("inf")


def test_cross_validation_against_real_package():
    msgpack = pytest.importorskip("msgpack")
    for obj, _ in SPEC_VECTORS:
        assert msgpack.loads(dumps(obj), raw=False, strict_map_key=False) == obj
        assert loads(msgpack.dumps(obj)) == obj
