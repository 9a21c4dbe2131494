"""Ingestion sources: the rate-limited, paginated, incremental REST client
(reference operator family S1-S4, ``gateway/api_client.py``).

This is the one layer Catalyst cannot provide (SURVEY.md §4.3): the API
contract caps throughput at ~1.4 req/s, so the fetch stage is a single
driver-side (or single-task) loop feeding DataFrames; everything
downstream of it is distributed.  At 100 TB the bottleneck is never this
source — it is replay from the bronze archive, which IS distributed
(plain ``spark.read.json`` over the archived pages).
"""

from jobcan_data_integrator_spark.sources.client import (
    ApiError,
    ApiResult,
    JobcanApiClient,
)
from jobcan_data_integrator_spark.sources.throttle import TokenBucket

__all__ = ["ApiError", "ApiResult", "JobcanApiClient", "TokenBucket"]
