"""Checkpoint-state tests: the is_future matrix, watermark merge, failure
records, and JSON round-trip — ported from the reference's
``test/status/test_status.py:18-294`` matrices (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import pytest

from jobcan_data_integrator_spark.state import (
    AppState,
    Checkpoint,
    Phase,
    merge_watermarks,
)


@pytest.mark.parametrize(
    ("current", "done", "probe", "unit", "expect"),
    [
        # earlier phases are never re-run
        (Phase.FORM_OUTLINE, [], Phase.BASIC_DATA, None, False),
        (Phase.FORM_OUTLINE, [], Phase.BASIC_DATA, "users", False),
        # the current phase re-runs only not-yet-done units
        (Phase.BASIC_DATA, ["users"], Phase.BASIC_DATA, "users", False),
        (Phase.BASIC_DATA, ["users"], Phase.BASIC_DATA, "groups", True),
        (Phase.BASIC_DATA, [], Phase.BASIC_DATA, None, True),
        # future phases always run
        (Phase.BASIC_DATA, [], Phase.FORM_DETAIL, None, True),
        (Phase.INITIALIZING, [], Phase.BASIC_DATA, "users", True),
    ],
)
def test_is_future_matrix(current, done, probe, unit, expect):
    st = AppState(phase=current, done=done)
    assert st.is_future(probe, unit) is expect


def test_enter_phase_resets_done():
    st = AppState(phase=Phase.BASIC_DATA, done=["users"])
    st.enter_phase(Phase.FORM_OUTLINE)
    assert st.done == []
    st.mark_done("123")
    st.enter_phase(Phase.FORM_OUTLINE)  # same phase: keep done
    assert st.done == ["123"]


def test_watermark_merge_elementwise_max():
    a = {"1": "2024/03/01 00:00:00", "2": "2024/03/05 00:00:00"}
    b = {"1": "2024/03/02 00:00:00", "3": "2024/03/01 00:00:00"}
    assert merge_watermarks(a, b) == {
        "1": "2024/03/02 00:00:00",
        "2": "2024/03/05 00:00:00",
        "3": "2024/03/01 00:00:00",
    }


def test_failure_records_dedup_and_take():
    st = AppState()
    st.record_failures([("requests_detail", "sa-1"), ("requests_detail", "sa-1")])
    st.record_failures([("requests_detail", "sa-2")], save=True)
    st.record_failures([("users", "page=1")])
    assert st.take_failures("requests_detail") == {"sa-1", "sa-2"}
    # taking removes them; other apis untouched
    assert st.take_failures("requests_detail") == set()
    assert st.fetch_failures == [["users", "page=1"]]


def test_state_merge():
    a = AppState(
        phase=Phase.FORM_OUTLINE,
        watermarks={"1": "2024/03/01 00:00:00"},
        fetch_failures=[["users", "page=1"]],
    )
    b = AppState(
        phase=Phase.BASIC_DATA,
        watermarks={"1": "2024/03/09 00:00:00"},
        fetch_failures=[["users", "page=1"], ["forms", "page=2"]],
    )
    m = a.merge(b)
    assert m.phase == Phase.FORM_OUTLINE
    assert m.watermarks == {"1": "2024/03/09 00:00:00"}
    assert m.fetch_failures == [["users", "page=1"], ["forms", "page=2"]]


def test_checkpoint_roundtrip(tmp_path):
    cp = Checkpoint(tmp_path / "ckpt")
    st = AppState(
        phase=Phase.FORM_DETAIL,
        done=["41052205"],
        watermarks={"41052205": "2024/03/01 00:00:00"},
        fetch_failures=[["requests_detail", "sa-9"]],
        outline_queue={"41052205": {"ids": ["sa-1"], "last_access": "2024/03/02 00:00:00"}},
    )
    cp.save(st)
    loaded = cp.load()
    assert loaded.__dict__ == st.__dict__
    cp.clear()
    assert cp.load().phase == Phase.INITIALIZING


def test_clear_failure_single_record():
    st = AppState()
    st.record_failures([("form_outline", "1"), ("form_outline", "2")])
    st.record_failures([("form_outline", "1")], save=True)
    st.clear_failure("form_outline", "1")
    assert st.fetch_failures == [["form_outline", "2"]]
    assert st.save_failures == []


def test_checkpoint_load_ignores_unknown_fields(tmp_path):
    """A checkpoint written by a newer version (extra field) must load,
    not crash every subsequent run with a TypeError."""
    import json

    cp = Checkpoint(tmp_path / "ckpt")
    cp.save(AppState(phase=Phase.FORM_DETAIL, watermarks={"1": "2024/03/01 00:00:00"}))
    data = json.loads(cp.path.read_text())
    data["future_field"] = {"x": 1}
    cp.path.write_text(json.dumps(data))
    loaded = cp.load()
    assert loaded.phase == Phase.FORM_DETAIL
    assert loaded.watermarks == {"1": "2024/03/01 00:00:00"}
