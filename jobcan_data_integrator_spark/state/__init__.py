"""Incremental-run state: progress cursor, per-form watermarks, failure
records, and the outline->detail work queue (reference I1-I5,
``status/status.py`` + ``integrator/_tf_io.py``; SURVEY.md §2.9).

All state is driver-side JSON in a checkpoint directory — the same shape
as the reference's ``app_status`` file + ``form_outline_temp.json``.  It
is deliberately tiny (O(forms) + O(pending ids)), so a single JSON file
is correct at any scale; the 100 TB data volume lives in the tables, not
here.  Writes are atomic (tmp + rename) so a crash never leaves a
half-written checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field, fields
from enum import IntEnum
from pathlib import Path


class Phase(IntEnum):
    """Ordered progress cursor (reference ``status/progress.py:42-63``)."""

    INITIALIZING = 0
    BASIC_DATA = 1
    FORM_OUTLINE = 2
    FORM_DETAIL = 3
    TERMINATING = 4
    COMPLETED = 5


def merge_watermarks(a: dict[str, str], b: dict[str, str]) -> dict[str, str]:
    """Element-wise max of 'YYYY/MM/DD HH:MM:SS' watermarks (reference
    ``status/status.py:895-911``, I3).  Lexicographic compare is exact for
    this zero-padded format."""
    out = dict(a)
    for k, v in b.items():
        if v is not None and (out.get(k) is None or v > out[k]):
            out[k] = v
    return out


@dataclass
class AppState:
    """The whole resumable run state (reference ``JobcanDIStatus``)."""

    phase: int = Phase.INITIALIZING
    #: phase-scoped set of completed unit ids (api names / form ids) —
    #: reference AppProgress.specifics (status.py:217-274)
    done: list[str] = field(default_factory=list)
    #: form_id (str) -> watermark "YYYY/MM/DD HH:MM:SS" (I1)
    watermarks: dict[str, str] = field(default_factory=dict)
    #: fetch failures to retry next run: [[api_type, key], ...] (I5)
    fetch_failures: list[list[str]] = field(default_factory=list)
    #: db-save failures to retry next run: [[api_type, key], ...] (I5)
    save_failures: list[list[str]] = field(default_factory=list)
    #: form_id (str) -> {"ids": [...], "last_access": ts} — the outline->
    #: detail work queue (reference form_outline_temp.json, S8)
    outline_queue: dict[str, dict] = field(default_factory=dict)

    # -- progress cursor (reference is_future_process, progress.py:228-309) --

    def is_future(self, phase: Phase, unit: str | None = None) -> bool:
        """True if (phase, unit) still needs to run this invocation."""
        if phase > self.phase:
            return True
        if phase < self.phase:
            return False
        return unit is None or unit not in self.done

    def enter_phase(self, phase: Phase) -> None:
        if phase != self.phase:
            self.phase = phase
            self.done = []

    def mark_done(self, unit: str) -> None:
        if unit not in self.done:
            self.done.append(unit)

    # -- failure records ------------------------------------------------------

    def record_failures(self, pairs: list[tuple[str, str]], *, save: bool = False) -> None:
        bucket = self.save_failures if save else self.fetch_failures
        for pair in pairs:
            if list(pair) not in bucket:
                bucket.append(list(pair))

    def take_failures(self, api_type: str) -> set[str]:
        """Pop + return the retry keys for one api (reference merges them
        back into the work queue, ``integrator.py:721-725``)."""
        keys = {k for a, k in self.fetch_failures if a == api_type} | {
            k for a, k in self.save_failures if a == api_type
        }
        self.fetch_failures = [p for p in self.fetch_failures if p[0] != api_type]
        self.save_failures = [p for p in self.save_failures if p[0] != api_type]
        return keys

    def clear_failure(self, api_type: str, key: str) -> None:
        """Drop one (api_type, key) record from both buckets — used when a
        later fetch of the same unit succeeds, so stale records don't
        accumulate in the checkpoint forever."""
        pair = [api_type, key]
        self.fetch_failures = [p for p in self.fetch_failures if p != pair]
        self.save_failures = [p for p in self.save_failures if p != pair]

    # -- merge (I3 + failure-record merge rules, status.py:780-911) ----------

    def merge(self, other: "AppState") -> "AppState":
        return AppState(
            phase=max(self.phase, other.phase),
            done=list(dict.fromkeys(self.done + other.done)),
            watermarks=merge_watermarks(self.watermarks, other.watermarks),
            fetch_failures=list(
                map(list, dict.fromkeys(map(tuple, self.fetch_failures + other.fetch_failures)))
            ),
            save_failures=list(
                map(list, dict.fromkeys(map(tuple, self.save_failures + other.save_failures)))
            ),
            outline_queue={**self.outline_queue, **other.outline_queue},
        )


class Checkpoint:
    """Atomic JSON persistence for AppState (reference
    ``status.py:637-722`` + ``_tf_io.py:132-179``)."""

    def __init__(self, directory: str | os.PathLike) -> None:
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "app_state.json"

    def load(self) -> AppState:
        if not self.path.exists():
            return AppState()
        data = json.loads(self.path.read_text(encoding="utf-8"))
        # tolerate checkpoints written by a newer version: unknown fields
        # are dropped instead of crashing every subsequent run
        known = {f.name for f in fields(AppState)}
        return AppState(**{k: v for k, v in data.items() if k in known})

    def save(self, state: AppState) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(state.__dict__, f, ensure_ascii=False, default=list)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def clear(self) -> None:
        if self.path.exists():
            self.path.unlink()
