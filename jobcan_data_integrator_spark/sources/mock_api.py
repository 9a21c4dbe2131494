"""In-memory Jobcan API double for tests (SURVEY.md §5.2 item 4).

Implements the transport signature with real pagination (``count`` /
``next`` / ``results``), the outline query params (``form_id``,
``applied_after``, ``completed_after``, ``status``, ``include_canceled``)
and per-path fault injection, so source/pipeline tests exercise the
client's actual data semantics rather than canned responses.
"""

from __future__ import annotations

import json
from typing import Any

from jobcan_data_integrator_spark.sources.client import API_PATHS

PAGE_SIZE = 100  # reference page size (gateway.py:390-392)


def _ts_key(s: str | None) -> str:
    """Order key for 'YYYY/MM/DD HH:MM:SS' or ISO-ish strings."""
    return (s or "").replace("-", "/")


class MockJobcanApi:
    """Stateful fake: mutate ``entities`` / ``documents`` between runs to
    simulate upstream changes; ``fail`` maps a path substring to an HTTP
    status to inject faults; ``calls`` records every request."""

    def __init__(
        self,
        entities: dict[str, list[dict[str, Any]]] | None = None,
        documents: list[dict[str, Any]] | None = None,
        page_size: int = PAGE_SIZE,
    ) -> None:
        self.entities = {k: [json.loads(json.dumps(v)) for v in vs] for k, vs in (entities or {}).items()}
        self.documents = [json.loads(json.dumps(d)) for d in (documents or [])]
        self.page_size = page_size
        self.fail: dict[str, int] = {}
        self.calls: list[tuple[str, dict[str, Any]]] = []

    # -- document mutation helpers (simulate upstream between runs) ---------

    def upsert_document(self, doc: dict[str, Any]) -> None:
        self.documents = [d for d in self.documents if d["id"] != doc["id"]] + [
            json.loads(json.dumps(doc))
        ]

    # -- transport -----------------------------------------------------------

    def __call__(self, path: str, params: dict[str, Any]) -> tuple[int, Any]:
        self.calls.append((path, dict(params)))
        for needle, status in self.fail.items():
            if needle in path or any(needle == str(v) for v in params.values()):
                return status, {"detail": "injected failure"}
        if path.startswith(API_PATHS["requests"]) and path != API_PATHS["requests"]:
            rid = path[len(API_PATHS["requests"]) :].strip("/")
            for d in self.documents:
                if d["id"] == rid:
                    return 200, json.loads(json.dumps(d))
            return 404, {"detail": "not found"}
        if path == API_PATHS["requests"]:
            return 200, self._page(self._outline_rows(params), params)
        for api, p in API_PATHS.items():
            if path == p:
                return 200, self._page(self.entities.get(api, []), params)
        return 404, {"detail": f"unknown path {path}"}

    def _outline_rows(self, params: dict[str, Any]) -> list[dict[str, Any]]:
        rows = self.documents
        if "form_id" in params:
            rows = [d for d in rows if d.get("form_id") == params["form_id"]]
        if params.get("status"):
            rows = [d for d in rows if d.get("status") == params["status"]]
        elif params.get("include_canceled") != "true":
            rows = [d for d in rows if d.get("status") != "canceled"]
        if params.get("applied_after"):
            after = _ts_key(params["applied_after"])
            rows = [d for d in rows if _ts_key(d.get("applied_date")) > after]
        if params.get("completed_after"):
            after = _ts_key(params["completed_after"])
            rows = [d for d in rows if _ts_key(d.get("final_approved_date")) > after]
        # outline rows carry only the brief shape (id + header bits)
        return [
            {k: d.get(k) for k in ("id", "title", "status", "form_id", "applied_date")}
            for d in sorted(rows, key=lambda d: d["id"])
        ]

    def _page(self, rows: list[dict[str, Any]], params: dict[str, Any]) -> dict[str, Any]:
        page = int(params.get("page", 1))
        start = (page - 1) * self.page_size
        chunk = rows[start : start + self.page_size]
        has_next = start + self.page_size < len(rows)
        return {
            "count": len(rows),
            "next": f"?page={page + 1}" if has_next else None,
            "results": json.loads(json.dumps(chunk)),
        }
