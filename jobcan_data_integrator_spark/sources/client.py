"""Paginated incremental REST client (reference S2-S4,
``gateway/api_client.py:455-624``).

Transport is injected (tests use an in-memory mock; a production
deployment plugs an HTTP transport), so the client owns only the data
semantics:

- pagination: follow ``next`` links, concatenate ``results``
  (``api_client.py:493-517``);
- incremental pushdown: ``form_id`` / ``applied_after`` /
  ``include_canceled`` as query params, plus the second
  canceled-after-completion pass (``api_client.py:521-597``,
  rationale ``doc/実行フロー.md:162-175``);
- point lookup of one request document (``api_client.py:599-624``);
- the warning-vs-error taxonomy (``api_client.py:424-453``,
  ``doc/実行フロー.md:177-181``): 4xx auth/request errors are fatal,
  404 / 5xx on an individual fetch degrade to a warning + failure
  record so the run continues and the id is retried next run (I5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from jobcan_data_integrator_spark.sources.throttle import TokenBucket

#: transport signature: (path, params) -> (http_status, parsed_json_body)
Transport = Callable[[str, dict[str, Any]], tuple[int, Any]]

#: the 7 basic-entity APIs in the reference's fixed fetch order
#: (``integrator/integrator.py:535-537``).
BASIC_APIS = (
    "users",
    "groups",
    "positions",
    "projects",
    "companies",
    "fix_journals",
    "forms",
)

API_PATHS = {
    "users": "/v3/users/",
    "groups": "/v1/groups/",
    "positions": "/v1/positions/",
    "projects": "/v1/projects/",
    "companies": "/v1/company/",
    "fix_journals": "/v1/fix_journal/",
    "forms": "/v1/forms/",
    "requests": "/v1/requests/",
}

#: statuses that close a request — anything else is re-fetched every run
#: until it settles (reference ``gateway/gateway.py:499-500``).
CLOSED_STATUSES = frozenset(
    {"completed", "rejected", "canceled", "canceled_after_completion"}
)


class ApiError(Exception):
    """Fatal API error: aborts the run (reference JDIErrorData class)."""

    def __init__(self, status: int, path: str, detail: str = "") -> None:
        super().__init__(f"HTTP {status} on {path}: {detail}")
        self.status = status
        self.path = path


@dataclass
class ApiResult:
    """Rows + the warn-and-continue channel (reference ``ApiResponse``,
    ``gateway/_core.py:17-40``)."""

    rows: list[dict[str, Any]] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    #: (api_type, key) pairs to retry next run (reference failure records)
    failures: list[tuple[str, str]] = field(default_factory=list)
    #: raw page bodies for the bronze archive (reference S5/S6)
    raw_pages: list[Any] = field(default_factory=list)


@dataclass
class FormOutline:
    """Per-form work-queue entry (reference ``gateway/_core.py:43-140``):
    the set of request ids to (re)fetch plus the watermark candidate."""

    form_id: int
    ids: set[str] = field(default_factory=set)
    last_access: str | None = None  # "YYYY/MM/DD HH:MM:SS"


class JobcanApiClient:
    """Data-semantics layer over an injected transport."""

    def __init__(self, transport: Transport, throttle: TokenBucket | None = None) -> None:
        self._get = transport
        self._throttle = throttle or TokenBucket(0.0)

    # -- low level ----------------------------------------------------------

    def _call(self, path: str, params: dict[str, Any]) -> Any:
        """One throttled GET with the status-code taxonomy applied.

        Fatal (raise): 400/401/403 — bad token/request, the whole run is
        doomed.  Degradable (raise ApiError for the caller to catch into a
        failure record): 404, 408, 429, 5xx.
        """
        self._throttle.acquire()
        status, body = self._get(path, params)
        if status == 200:
            return body
        raise ApiError(status, path, str(body)[:200])

    @staticmethod
    def _is_fatal(err: ApiError) -> bool:
        return err.status in (400, 401, 403)

    # -- S2: paginated scan --------------------------------------------------

    def fetch_basic_data(self, api_type: str, params: dict[str, Any] | None = None) -> ApiResult:
        """Follow ``next`` links, concatenating ``results``
        (reference ``api_client.py:455-519``)."""
        out = ApiResult()
        params = dict(params or {})
        page = 1
        while True:
            try:
                body = self._call(API_PATHS[api_type], {**params, "page": page})
            except ApiError as err:
                if self._is_fatal(err):
                    raise
                out.warnings.append(str(err))
                out.failures.append((api_type, f"page={page}"))
                return out
            out.raw_pages.append(body)
            out.rows.extend(body.get("results") or [])
            if not body.get("next"):
                return out
            page += 1

    # -- S3: incremental outline scan (predicate pushdown + 2nd pass) --------

    def fetch_form_outline(
        self,
        form_id: int,
        *,
        applied_after: str | None = None,
        include_canceled: bool = True,
        now: str | None = None,
    ) -> tuple[FormOutline, ApiResult]:
        """Union of the applied-after pass and the
        canceled-after-completion pass (reference ``api_client.py:521-597``).

        ``ids`` is a set, so the union dedups (reference ``_core.py:75-88``).
        ``last_access`` is stamped BEFORE the fetch so documents applied
        during the fetch are re-seen next run (no lost updates).
        """
        outline = FormOutline(form_id=form_id, last_access=now)
        params: dict[str, Any] = {"form_id": form_id}
        if applied_after:
            params["applied_after"] = applied_after
        if include_canceled:
            params["include_canceled"] = "true"
        res = self.fetch_basic_data("requests", params)
        outline.ids.update(r["id"] for r in res.rows)

        if include_canceled and applied_after:
            second = self.fetch_basic_data(
                "requests",
                {
                    "form_id": form_id,
                    "status": "canceled_after_completion",
                    "completed_after": applied_after,
                },
            )
            outline.ids.update(r["id"] for r in second.rows)
            res.rows.extend(second.rows)
            res.warnings.extend(second.warnings)
            res.failures.extend(second.failures)
            res.raw_pages.extend(second.raw_pages)
        return outline, res

    # -- S4: point lookup -----------------------------------------------------

    def fetch_form_detail(self, request_id: str) -> tuple[dict[str, Any] | None, ApiResult]:
        """GET one request document (reference ``api_client.py:599-624``)."""
        out = ApiResult()
        try:
            body = self._call(f"{API_PATHS['requests']}{request_id}/", {})
        except ApiError as err:
            if self._is_fatal(err):
                raise
            out.warnings.append(str(err))
            out.failures.append(("requests_detail", request_id))
            return None, out
        out.raw_pages.append(body)
        out.rows.append(body)
        return body, out
