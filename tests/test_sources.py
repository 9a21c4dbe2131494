"""Source-layer tests (SURVEY.md §5.2 item 4): throttle timing with a fake
clock, pagination, outline pushdown + two-pass union, point lookup, and
the warning-vs-error taxonomy.  Mirrors the reference's
``test/gateway/test_throttled_request.py`` matrix without wall-clock
sleeps."""

from __future__ import annotations

import pytest

from jobcan_fixtures import make_request_docs
import json

from jobcan_data_integrator_spark.sources import (
    ApiError,
    JobcanApiClient,
    TokenBucket,
)
from jobcan_data_integrator_spark.sources.mock_api import MockJobcanApi


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0
        self.sleeps: list[float] = []

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


def test_throttle_enforces_min_interval():
    clk = FakeClock()
    tb = TokenBucket(0.72, clock=clk, sleep=clk.sleep)
    tb.acquire()  # first call: no wait
    tb.acquire()  # immediate second call: sleeps the full interval
    clk.t += 0.5
    tb.acquire()  # partial elapse: sleeps the remainder
    assert clk.sleeps == pytest.approx([0.72, 0.22])


def test_throttle_no_wait_when_interval_elapsed():
    clk = FakeClock()
    tb = TokenBucket(0.72, clock=clk, sleep=clk.sleep)
    tb.acquire()
    clk.t += 1.0
    tb.acquire()
    assert clk.sleeps == []


def test_throttle_from_hourly_budget():
    assert TokenBucket.from_requests_per_hour(5000).min_interval == pytest.approx(0.72)


@pytest.fixture()
def docs():
    return [json.loads(d) for d in make_request_docs(24)]


@pytest.fixture()
def api(docs):
    return MockJobcanApi(
        entities={"users": [{"id": i, "user_code": f"EMP{i:04d}"} for i in range(250)]},
        documents=docs,
        page_size=100,
    )


def test_pagination_concatenates_all_pages(api):
    client = JobcanApiClient(api)
    res = client.fetch_basic_data("users")
    assert len(res.rows) == 250
    assert len(res.raw_pages) == 3  # 100+100+50
    pages = [p for p, _ in api.calls]
    assert pages == ["/v3/users/"] * 3


def test_outline_pushes_down_watermark(api, docs):
    client = JobcanApiClient(api)
    fid = docs[0]["form_id"]
    outline, _ = client.fetch_form_outline(
        fid, applied_after="2024/03/15 00:00:00", now="2024/04/01 00:00:00"
    )
    expected = {
        d["id"]
        for d in docs
        if d["form_id"] == fid
        and (
            d["applied_date"].replace("-", "/") > "2024/03/15 00:00:00"
            or (
                d["status"] == "canceled_after_completion"
                and (d.get("final_approved_date") or "").replace("-", "/")
                > "2024/03/15 00:00:00"
            )
        )
    }
    assert outline.ids == expected
    assert outline.last_access == "2024/04/01 00:00:00"
    # the second (canceled_after_completion) pass actually ran
    assert any(
        p.get("status") == "canceled_after_completion" for _, p in api.calls
    )


def test_outline_full_fetch_without_watermark(api, docs):
    client = JobcanApiClient(api)
    fid = docs[0]["form_id"]
    outline, _ = client.fetch_form_outline(fid)
    assert outline.ids == {d["id"] for d in docs if d["form_id"] == fid}


def test_detail_point_lookup(api, docs):
    client = JobcanApiClient(api)
    doc, res = client.fetch_form_detail("sa-3")
    assert doc["id"] == "sa-3"
    assert not res.failures


def test_404_degrades_to_failure_record(api):
    client = JobcanApiClient(api)
    doc, res = client.fetch_form_detail("sa-999")
    assert doc is None
    assert res.failures == [("requests_detail", "sa-999")]


def test_500_mid_pagination_records_failure(api):
    api.fail["/v3/users/"] = 500
    client = JobcanApiClient(api)
    res = client.fetch_basic_data("users")
    assert res.rows == []
    assert res.failures == [("users", "page=1")]


def test_auth_error_is_fatal(api):
    api.fail["/v3/users/"] = 401
    client = JobcanApiClient(api)
    with pytest.raises(ApiError):
        client.fetch_basic_data("users")
