"""Shared helpers for the gate modules (no gate registrations here).

Split out of gate/llm.py so gate/mm.py can register the multimodal gates
*before* the llm module loads (registration order = driver artifact order)
without import cycles.  Everything here is engine-portable: the md5-based
60-bit hash and the integer-quantized LSH bucketing replay bit-for-bit in
DuckDB (see the paired CTE strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jobcan_data_integrator_spark.operators.minhash import H60, shingle_rows
from jobcan_data_integrator_spark.session import load_table

#: Portable 60-bit hash of a string expression (same value in DuckDB via
#: ('0x' || substr(md5(x),1,15))::BIGINT).  Canonical definition lives in
#: operators/minhash.py (H60); aliased here for the gate modules.
_H = H60


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores for CPU-heavy per-row stages.

    The local testdata is one parquet row group = one Spark partition, so
    hash/shingle-heavy queries would otherwise run serial (measured
    locally: simhash 7.7s serial -> 0.8s at 32 partitions).  The
    repartition is CONDITIONAL on the scan being under-parallel: at real
    scale the scan already has thousands of splits and an unconditional
    repartition would be a pointless full shuffle of the corpus.
    """
    spark_parallelism = spark.sparkContext.defaultParallelism
    df = load_table(spark, sf_dir, "documents")
    if df.rdd.getNumPartitions() < spark_parallelism:
        df = df.repartition(spark_parallelism, "doc_id")
    return df


def _media_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents for the Arrow-boundary (mapInPandas) gates: spread by
    INPUT BYTES, never by core count.

    ``_docs``' core-count repartition is right for the hash/shingle
    gates (CPU-heavy JVM work per row) but wrong for the mm_* Python
    stages: at sf0.1 it fanned 0.6 MB of payload into 32 concurrent
    Python workers, so per-task worker startup dominated — the r11
    driver measured the mm gates ANTI-scaling (3x faster on 8 cores
    than 32), and the r12 A/B measured the un-repartitioned scan 6.5x
    faster than the 32-way spread (mm metadata 0.37 s vs 2.36 s).
    Deriving the spread from input size (one task per ~64 MB, the
    guide's scan-split economics) fixes the local shape and is a no-op
    at real scale, where the scan already has thousands of splits and
    the conditional never fires."""
    import math
    import os

    df = load_table(spark, sf_dir, "documents")
    try:
        n_bytes = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    except OSError:
        n_bytes = 0
    target = min(
        max(1, math.ceil(n_bytes / (64 << 20))),
        spark.sparkContext.defaultParallelism,
    )
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, "doc_id")
    return df


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) rows: 3-gram word shingles built in-row
    (operators/minhash.shingle_rows — array transform + explode, zero
    shuffle; see its docstring for the r11 re-measurement that retired
    the explode + window-lead shape).

    Goes through ``_docs`` (not a raw load): the local testdata is one
    row group = one partition, so the in-row shingle construction would
    otherwise run on a single core.  ``_docs`` repartitions
    conditionally, so at real scale (many splits) this adds nothing.
    """
    return shingle_rows(_docs(spark, sf_dir))


#: DuckDB replica of operators/similarity.py's deterministic LSH bucketing
#: (integer-quantized hyperplane dot products — see that module's contract).
_BUCKET_CTE = """
    e AS (
      SELECT vec_id, embedding, unnest(embedding) AS comp,
             generate_subscripts(embedding, 1) - 1 AS d
      FROM embeddings
    ), qz AS (
      SELECT vec_id, d, CAST(floor(comp::DOUBLE * 1000) AS BIGINT) AS ei FROM e
    ), dots AS (
      SELECT vec_id, g.p AS p,
             sum(ei * (CASE WHEN ('0x'||substr(md5(g.p || '_' || d),1,15))::BIGINT % 2 = 1
                            THEN 1 ELSE -1 END)) AS s
      FROM qz, generate_series(0, 7) AS g(p)
      GROUP BY vec_id, g.p
    ), buckets AS (
      SELECT vec_id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(p AS INT))
                                   ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    )"""

_COSINE_DUCK = """
    round(
      list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))
      / (sqrt(list_sum(list_transform({a}, x -> x * x)))
         * sqrt(list_sum(list_transform({b}, x -> x * x)))), 6)"""
