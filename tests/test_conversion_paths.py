"""events_conversion_paths scale guard: the r5 verdict flagged the old
collect_list journey build as the suite's one scale-killer (a bot user
with 10⁸ events materialized one giant array in a single task). The
rewrite detects the view→click→purchase pattern with chained running
window MAXes — O(1) per-row state, spill-able sort. These tests plant a
10⁵-event hot user and pin (a) correctness against a pure-Python
automaton reference and (b) the plan: no collect_list anywhere, and the
per-user aggregate reuses the window's exchange (no extra shuffle for
the hot key to magnet through)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moisturizer_spark import workload


def _write_events(path: str, rows: list[tuple]) -> None:
    eid, ts, uid, etype = zip(*rows)
    table = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(path, "events.parquet"))


def _converted(journey: list[str]) -> bool:
    """Reference automaton: ∃ i<j<k with view, click, purchase."""
    state = 0
    for t in journey:
        if state == 0 and t == "view":
            state = 1
        elif state == 1 and t == "click":
            state = 2
        elif state == 2 and t == "purchase":
            return True
    return False


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """One 10⁵-event hot user (converting: the purchase arrives late),
    one converting normal user, one non-converting (purchase BEFORE
    click — order matters), one click-only user."""
    base = dt.datetime(2024, 1, 1)
    rows: list[tuple] = []
    eid = 0

    def add(uid: int, types: list[str]):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append((eid, base + dt.timedelta(seconds=eid), uid, t))
            eid += 1

    hot = ["view"] + ["error", "signup", "click"] * 33_332 + ["purchase"]
    add(1, hot)  # 99_998 events, converts only at the very end
    add(2, ["view", "signup", "click", "purchase"])
    add(3, ["purchase", "view", "click"])  # wrong order: no conversion
    add(4, ["click", "click", "view"])
    path = tmp_path_factory.mktemp("planted_events")
    _write_events(str(path), rows)
    journeys = {1: hot, 2: ["view", "signup", "click", "purchase"],
                3: ["purchase", "view", "click"], 4: ["click", "click", "view"]}
    return str(path), journeys


def test_hot_user_parity_with_reference_automaton(spark, planted_dir):
    path, journeys = planted_dir
    got = {
        r["converted"]: (r["n_users"], r["avg_events"])
        for r in workload.QUERIES["events_conversion_paths"](
            spark, path
        ).collect()
    }
    by_flag: dict[bool, list[int]] = {}
    for uid, j in journeys.items():
        by_flag.setdefault(_converted(j), []).append(len(j))
    want = {
        flag: (len(ns), sum(ns) / len(ns)) for flag, ns in by_flag.items()
    }
    assert got == want
    # the planted journeys exercise both outcomes
    assert set(got) == {True, False}


def test_no_journey_materialization_in_plan(spark, planted_dir):
    path, _ = planted_dir
    df = workload.QUERIES["events_conversion_paths"](spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "CollectList" not in plan, (
        "journey materialization crept back in — a hot user would "
        "rebuild its full event array inside one task"
    )
    # window shuffle + converted-group shuffle + output sort: the
    # per-user aggregate must REUSE the window's user_id partitioning
    assert plan.count("Exchange") <= 3, plan
