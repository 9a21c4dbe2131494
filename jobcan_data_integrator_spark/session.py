"""SparkSession factory with engine defaults.

Tuned for correctness-portability (UTC session timezone so timestamps
round-trip identically with external oracles) and for scale (AQE on,
explicit shuffle partitioning).  On a real cluster the same settings
apply; only master/cores come from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver-generated testdata provides (one parquet file each).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "jobcan-di-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Master defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset).
    ``spark.sql.shuffle.partitions`` defaults to the core count — on a
    real cluster this would instead be sized to ~2-3x total cores and AQE
    coalesces small partitions at runtime either way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # events.parquet stores TIMESTAMP(NANOS), which Spark cannot read
        # natively; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def ensure_engine_confs(spark: SparkSession) -> None:
    """Set the runtime confs the engine depends on, on ANY session.

    The driver passes its own SparkSession (built without our factory), so
    these must be applied defensively: nanos-parquet reads would otherwise
    throw PARQUET_TYPE_ILLEGAL, and a non-UTC session timezone would skew
    timestamp rendering vs the external oracle.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this build — session factory already set it
    try:
        # right-size shuffles for a single-node session, but only when the
        # caller left Spark's 200-partition default in place (AQE coalesces
        # most of the waste, but windows/explicit repartitions don't)
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        # conf read/set can fail on a foreign session (e.g. conf marked
        # non-runtime-settable by the driver's build); the tuning above
        # is best-effort — correctness never depends on it, so a locked
        # session proceeds with whatever partitioning it has
        pass


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to the Python workers (idempotent).

    Arrow-batched UDF closures (mapInPandas / applyInPandasWithState)
    reference functions in this package, which cloudpickle serializes as
    a module reference — so the workers must be able to import it.  The
    driver contract hands us an arbitrary SparkSession whose workers
    don't have the repo on sys.path; ``addPyFile`` of a package zip is
    the mechanism that works in local AND cluster mode.
    """
    sc = spark.sparkContext
    if getattr(sc, "_jdi_pyfiles_added", False):
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    fd, zpath = tempfile.mkstemp(suffix="-jdi-spark.zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for p in pkg_dir.rglob("*.py"):
            z.write(p, p.relative_to(pkg_dir.parent))
    sc.addPyFile(zpath)
    sc._jdi_pyfiles_added = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table.

    Nanosecond parquet timestamps (events.ts) surface as nanos-since-epoch
    longs under ``nanosAsLong``; convert to microsecond timestamps by
    truncating, which matches DuckDB's ns->us handling.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # TIMESTAMP(NANOS) parquet under nanosAsLong: truncate to micros.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # timestamp[us] without UTC adjustment reads as TIMESTAMP_NTZ;
            # the engine (like the DuckDB oracle) treats stored values as
            # UTC instants, and the session timezone is pinned to UTC, so
            # the cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
