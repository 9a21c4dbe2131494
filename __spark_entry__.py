"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation on sf0.001.
``queries()`` / ``oracle_sql()`` expose the correctness-gate registry
(jobcan_data_integrator_spark.gate) — one Spark program + DuckDB oracle per
operator family from SURVEY.md §2 plus the training-data-pipeline operators
(dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from jobcan_data_integrator_spark import gate as _gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _gate.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return _gate.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — every gate has one,
    including the mapInPandas multimodal stubs (sha256-replayable) and
    the unrolled 2-iteration k-means trainer."""
    return _gate.oracle_sql()
