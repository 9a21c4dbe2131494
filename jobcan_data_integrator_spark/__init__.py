"""jobcan_data_integrator_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL tool (YayoiHabami/Jobcan-Data-Integrator,
studied read-only at /root/reference — see SURVEY.md), extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Layout
------
- ``session``    : SparkSession factory tuned for the engine defaults.
- ``schemas``    : explicit StructType catalog (33 silver tables + the nested
                   request-document schema).
- ``sources``    : throttled/paginated REST source, bronze archive sink.
- ``operators``  : shred (nested JSON -> tables), reconstruct (tables ->
                   nested JSON), merge/upsert primitives, sync (anti-join
                   deletes), dedup, similarity, text analysis, multimodal.
- ``views``      : the gold view layer as Spark SQL registered in dependency
                   order.
- ``state``      : incremental checkpoint state machine (watermarks, resume
                   cursor, failure records).
- ``gate``       : the driver-facing correctness-gate query registry — every
                   operator family expressed over the TPC-H-ish test tables
                   with a DuckDB oracle side-by-side.
"""

__version__ = "0.1.0"
