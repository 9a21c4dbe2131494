"""Corpus file ingestion for training-data pipelines — JSONL and CSV
document dumps read with an EXPLICIT schema (the repo-wide stance:
never infer; reference analog: the fixed response shapes the gateway
client expects, /root/reference/jobcan_di/gateway/api_client.py) and
PERMISSIVE corrupt-record capture.

A 100 TB web dump always contains malformed lines; failing the job on
the first one (FAILFAST) or silently nulling them (default PERMISSIVE
without inspection) both lose data silently.  These readers split
every input into (good, quarantined) in ONE pass: the corrupt-record
column is populated by the parser itself — no second validation scan
— and the quarantine frame carries the raw line so a later repair can
replay it (the same quarantine-and-retry stance as the pipeline's
failure records, state/__init__.py)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the parser-populated raw-line column for malformed records
CORRUPT_COL = "_corrupt_record"


@dataclass
class CorpusRead:
    """One-pass split of an input corpus file set."""

    good: DataFrame  # schema rows, corrupt column dropped
    quarantined: DataFrame  # (raw line, source file) for replay/repair


def _split(raw: DataFrame) -> CorpusRead:
    # cache: good and quarantined otherwise each re-parse the files
    raw = raw.withColumn("_src", F.input_file_name()).cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "_src")
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), F.col("_src").alias("source_file")
    )
    return CorpusRead(good=good, quarantined=bad)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str
) -> CorpusRead:
    """Read JSON-lines documents with an explicit DDL ``schema``.

    Malformed lines (bad JSON, wrong types) land in ``quarantined``
    with their raw text; schema-valid lines come back typed in
    ``good``.  Multiline JSON is deliberately unsupported — JSONL is
    the splittable-at-scale format (one record per line means byte
    ranges parallelize)."""
    raw = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> CorpusRead:
    """Read CSV documents with an explicit DDL ``schema``; malformed
    rows (wrong column count, uncastable values) are quarantined with
    the raw line."""
    raw = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split(raw)
