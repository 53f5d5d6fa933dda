"""bench.py artifact guard (VERDICT r09 #5): a gate-failing run must
not overwrite a protocol-clean committed ``bench_detail.json``."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _write(tmp_path: Path, gate_ok: bool) -> None:
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"protocol": {"load_gate_ok": gate_ok}})
    )


def test_gate_failing_run_preserves_clean_artifact(tmp_path):
    _write(tmp_path, True)
    path, preserved = bench._detail_write_path(str(tmp_path), False)
    assert preserved
    assert path.endswith("bench_detail.rejected.json")


def test_gate_ok_run_overwrites(tmp_path):
    _write(tmp_path, True)
    path, preserved = bench._detail_write_path(str(tmp_path), True)
    assert not preserved
    assert path.endswith("bench_detail.json")


def test_gate_failing_run_may_replace_dirty_artifact(tmp_path):
    """Dirty-over-dirty is allowed: the newer run is at least as
    informative and the round headline was never clean."""
    _write(tmp_path, False)
    path, preserved = bench._detail_write_path(str(tmp_path), False)
    assert not preserved
    assert path.endswith("bench_detail.json")


def test_no_existing_artifact_writes_main_path(tmp_path):
    path, preserved = bench._detail_write_path(str(tmp_path), False)
    assert not preserved
    assert path.endswith("bench_detail.json")


def test_force_overrides_guard(tmp_path):
    _write(tmp_path, True)
    path, preserved = bench._detail_write_path(str(tmp_path), False, force=True)
    assert not preserved
    assert path.endswith("bench_detail.json")


def test_corrupt_existing_artifact_does_not_block(tmp_path):
    (tmp_path / "bench_detail.json").write_text("{not json")
    path, preserved = bench._detail_write_path(str(tmp_path), False)
    assert not preserved
    assert path.endswith("bench_detail.json")
