"""Pin the DuckDB behaviors every det-family oracle depends on.

All seven md5-deterministic oracle families (KMV, DDSketch, det-HLL,
det-MinHash, det-LSH, det-SimHash, det-winnowing — and round 6's
det-IVF/det-PQ) lean on a handful of DuckDB semantics: hex-string
casts (``CAST('0x…' AS BIGINT)``), seedless ``list_reduce`` equalling
a 0.0-seeded left fold, codepoint string collation, and
half-away-from-zero ``ROUND``. A DuckDB version bump that changes any
of these would break every det oracle at once — loudly, but broadly
and confusingly. These unit asserts fail FIRST, with a pointed
message naming the semantic that moved (validated on duckdb 1.0.0),
so a version bump is diagnosed in one test instead of 100 red mirror
rows.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _one(con, sql: str):
    return con.sql("SELECT " + sql).fetchone()[0]


def test_hex_string_cast_to_bigint(con):
    # sql_det_hash60 (dedup.py): md5 prefix via '0x…' string cast
    assert _one(con, "CAST('0xff' AS BIGINT)") == 255, (
        "DuckDB no longer casts '0x…' strings to BIGINT as hex — every "
        "det-family oracle's sql_det_hash60 is broken (validated on 1.0.0)"
    )
    assert _one(con, "CAST('0xfffffffffffffff' AS BIGINT)") == (1 << 60) - 1, (
        "15-hex-digit cast must fill 60 bits exactly (det-hash domain)"
    )


def test_md5_matches_spark_md5_contract(con):
    # both engines: RFC 1321 md5 of the UTF-8 bytes, lowercase hex
    import hashlib

    assert (
        _one(con, "md5('moisturizer')")
        == hashlib.md5(b"moisturizer").hexdigest()
    ), "DuckDB md5() output changed — all md5-derived det constants break"


def test_list_reduce_is_left_fold_from_first(con):
    # det-LSH / det-IVF / det-PQ: seedless list_reduce must equal the
    # ((x1+x2)+x3)… chain, which equals Spark's 0.0-seeded aggregate()
    # because 0.0 + a == a for every double
    vals = [0.1, 0.2, 0.3, 0.4]
    got = _one(
        con,
        "list_reduce([0.1, 0.2, 0.3, 0.4]::DOUBLE[], (a, b) -> a + b)",
    )
    acc = 0.0
    for v in vals:
        acc += v
    assert got == acc, (
        "list_reduce no longer left-folds from the first element — "
        "det-LSH/IVF/PQ dot products lose bit-parity with Spark"
    )


def test_round_and_integer_division_match_spark(con):
    # _nano (textan.py): ROUND on a .5 boundary is half-away-from-zero
    # in both engines (Spark round = HALF_UP); the det recipes
    # additionally keep boundary hits measure-zero (irrational logs)
    assert _one(con, "ROUND(2.5)") == 3 and _one(con, "ROUND(-1.5)") == -2, (
        "DuckDB ROUND is no longer half-away-from-zero — nano-bit "
        "rounding loses parity with Spark's round()"
    )
    # integer // truncates toward zero, exactly like Spark's DIV — the
    # _micro_per_token oracle mirrors rely on the two agreeing
    assert _one(con, "7 // 2") == 3 and _one(con, "(-7) // 2") == -3, (
        "DuckDB // no longer truncates toward zero (Spark DIV semantics)"
        " — _micro_per_token oracle mirrors break"
    )


def test_string_collation_is_codepoint(con):
    # BPE tie-breaks and every ORDER BY on word columns assume binary /
    # codepoint ordering (Python tuple compare == Spark binary collation)
    rows = con.sql(
        "SELECT x FROM (VALUES ('Z'), ('a'), ('B')) t(x) ORDER BY x"
    ).fetchall()
    assert [r[0] for r in rows] == ["B", "Z", "a"], (
        "DuckDB default collation is no longer codepoint order — "
        "lexicographic tie-breaks diverge from Spark"
    )


def test_bit_operators_match_spark(con):
    """The zorder oracle (events_zorder_histogram) replays Morton codes
    with `>> << & |` on non-negative BIGINTs; Spark's shiftright /
    shiftleft / bitwiseAND / bitwiseOR must agree on that domain."""
    cases = [
        ("(13 >> 2) & 1", (13 >> 2) & 1),
        ("(5 << 3) | 6", (5 << 3) | 6),
        ("(255 >> 4)", 255 >> 4),
        ("(1 << 15) | (1 << 0)", (1 << 15) | 1),
    ]
    for sql, want in cases:
        assert _one(con, sql) == want, f"DuckDB bit op drift: {sql}"


def test_validated_duckdb_version_documented():
    """Not an equality gate (a bump with intact semantics above is
    fine) — but record the validated version so a red mirror run after
    an upgrade points here first."""
    major = int(duckdb.__version__.split(".")[0])
    assert major >= 1, (
        f"duckdb {duckdb.__version__} predates the 1.0.0 the det "
        "oracles were validated on"
    )
