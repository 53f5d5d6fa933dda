"""Minimal pure-Python msgpack codec (decode + encode).

The reference ingests msgpack-else-JSON envelopes
(``moisturizer/consumer.py:24-39``), but the ``msgpack`` package is an
optional dependency this container lacks — which left the distributed
msgpack decode path permanently skip-gated in tests. The wire format
itself is a small public spec (https://github.com/msgpack/msgpack/blob/
master/spec.md), and an envelope can only carry JSON-shaped values, so
a dependency was never actually required: this module implements the
full FIRST-CLASS type surface — nil, bool, every int width (fixint
through [u]int64), float32/64, str (fixstr/8/16/32), bin (8/16/32),
array (fix/16/32), map (fix/16/32) — in ~150 lines.

Deliberately NOT implemented: ext types (timestamp etc.) raise
``ValueError`` — the reference's envelopes never carry them, and a loud
failure beats silently mis-decoding an extension payload.

``loads`` mirrors ``msgpack.loads(raw, raw=False)``: str keys/values
decode to ``str`` (UTF-8), bin to ``bytes``. Trailing garbage after one
complete object raises (same strictness the real package applies by
default), which is what lets the JSON fallback probe stay reliable.
``dumps`` exists mainly so tests can produce wire bytes without the
package; it emits canonical shortest-width encodings, and round-trips
are property-tested plus pinned against spec byte vectors in
``tests/test_msgpack_mini.py``.
"""

from __future__ import annotations

import struct

__all__ = ["loads", "dumps"]


def loads(data: bytes, **kwargs):
    """Decode ONE msgpack object; raise ValueError on ext types,
    truncation, or trailing bytes.

    Signature-compatible with ``msgpack.loads(raw, raw=False)`` (the
    only form the ingest decoder uses — the payload is positional
    there): ``raw=False`` — str decodes to ``str`` — is this codec's
    only behavior; asking for ``raw=True`` (undecoded bytes) or any
    other option raises rather than silently differing."""
    if kwargs.pop("raw", False) or kwargs:
        raise TypeError(
            "msgpack_mini.loads supports only msgpack.loads(data, raw=False)"
        )
    obj, pos = _decode(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after msgpack object at {pos}")
    return obj


def _need(buf, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("truncated msgpack data")


def _decode(buf, pos: int):
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _len(buf, pos, 1 << (b - 0xC4))
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]), pos + n
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos : pos + n], "big"), pos + n
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos : pos + n], "big", signed=True), pos + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _len(buf, pos, 1 << (b - 0xD9))
        return _str(buf, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _len(buf, pos, 2 << (b - 0xDC))
        return _array(buf, pos, n)
    if b in (0xDE, 0xDF):  # map 16/32
        n, pos = _len(buf, pos, 2 << (b - 0xDE))
        return _map(buf, pos, n)
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x} (ext?)")


def _len(buf, pos: int, width: int) -> tuple[int, int]:
    _need(buf, pos, width)
    return int.from_bytes(buf[pos : pos + width], "big"), pos + width


def _str(buf, pos: int, n: int):
    _need(buf, pos, n)
    return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n


def _array(buf, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos


def _map(buf, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        out[k] = v
    return out, pos


def dumps(obj) -> bytes:
    """Canonical shortest-width encode of a JSON-shaped value tree."""
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _encode(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _encode_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        data = obj.encode("utf-8")
        _prefix(len(data), out, fix=(0xA0, 0x1F), widths=(0xD9, 0xDA, 0xDB))
        out += data
    elif isinstance(obj, (bytes, bytearray)):
        _prefix(len(obj), out, fix=None, widths=(0xC4, 0xC5, 0xC6))
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        _prefix(len(obj), out, fix=(0x90, 0x0F), widths=(None, 0xDC, 0xDD))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        _prefix(len(obj), out, fix=(0x80, 0x0F), widths=(None, 0xDE, 0xDF))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise TypeError(f"msgpack_mini cannot encode {type(obj).__name__}")


def _encode_int(v: int, out: bytearray) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif v >= 0:
        for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
            if v < 1 << (8 * width):
                out.append(code)
                out += v.to_bytes(width, "big")
                return
        raise OverflowError("int too large for msgpack uint64")
    else:
        for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if v >= -(1 << (8 * width - 1)):
                out.append(code)
                out += v.to_bytes(width, "big", signed=True)
                return
        raise OverflowError("int too small for msgpack int64")


def _prefix(
    n: int, out: bytearray, fix: tuple[int, int] | None, widths: tuple
) -> None:
    """Emit the shortest length prefix: fix-form if it fits, else the
    8/16/32-bit wide form (``None`` width = form doesn't exist)."""
    if fix is not None and n <= fix[1]:
        out.append(fix[0] | n)
        return
    for code, width in zip(widths, (1, 2, 4)):
        if code is not None and n < 1 << (8 * width):
            out.append(code)
            out += n.to_bytes(width, "big")
            return
    raise OverflowError(f"length {n} exceeds msgpack 32-bit limit")
