"""A minimal in-repo stand-in for delta-spark's ``DeltaTable`` builder
surface, so the ``TableStore(backend="delta")`` binding logic — merge
condition construction, builder clause sequences, the
``_delta_scope_cond`` scope clamp — EXECUTES in environments without
the delta-spark package (this sandbox ships Spark without it, which
left the whole binding as never-run code through round 5).

This is NOT a Delta implementation: no transaction log, no time
travel, no concurrent-writer conflict detection — tables are plain
parquet directories and each operation is a read → transform →
overwrite.  What it faithfully executes is the SEMANTICS of the three
builder calls the binding emits (``merge`` with
whenMatchedUpdateAll / whenNotMatchedInsertAll, ``delete``), driven by
the exact condition strings/Columns the binding constructs — so the
backend="delta" test matrix pins that the generated MERGE INTO
statements are the right ones, and a real delta-spark install changes
only the executor, not the calls.

Every call is also appended to :data:`FakeDeltaTable.journal` —
``("merge", path, cond, clauses)`` / ``("delete", path, cond_str)`` —
so tests can assert the binding generated the exact merge condition
(e.g. ``t.id <=> u.id``) and clause set it documents.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class _FakeMergeBuilder:
    """Accumulates the when-clauses, then executes the merge as the
    equivalent DataFrame program on ``execute()``.

    With ``whenMatchedUpdateAll`` the matched target rows are replaced
    by their matching source rows (sources are key-unique per the
    TableStore contract); without it they survive unchanged.  With
    ``whenNotMatchedInsertAll`` the unmatched source rows are appended.
    That is exactly MERGE INTO restricted to the two clause shapes the
    binding emits."""

    def __init__(self, table: "FakeDeltaTable", source: DataFrame, cond: str):
        self._table = table
        self._source = source
        self._cond = cond
        self._matched_update_all = False
        self._not_matched_insert_all = False

    def whenMatchedUpdateAll(self) -> "_FakeMergeBuilder":
        self._matched_update_all = True
        return self

    def whenNotMatchedInsertAll(self) -> "_FakeMergeBuilder":
        self._not_matched_insert_all = True
        return self

    def execute(self) -> None:
        clauses = []
        if self._matched_update_all:
            clauses.append("whenMatchedUpdateAll")
        if self._not_matched_insert_all:
            clauses.append("whenNotMatchedInsertAll")
        FakeDeltaTable.journal.append(
            ("merge", str(self._table._path), self._cond, tuple(clauses))
        )
        t = self._table.toDF().alias(self._table._alias or "t")
        u = self._source
        cond = F.expr(self._cond)
        kept_t = t.join(u, on=cond, how="left_anti")
        parts = [kept_t]
        if self._matched_update_all:
            parts.append(u.join(t, on=cond, how="left_semi"))
        else:
            parts.append(t.join(u, on=cond, how="left_semi"))
        if self._not_matched_insert_all:
            parts.append(u.join(t, on=cond, how="left_anti"))
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p.select(*result.columns))
        self._table._overwrite(result)


class FakeDeltaTable:
    """The subset of ``delta.tables.DeltaTable`` the storage binding
    calls, over a parquet directory."""

    #: chronological record of executed operations, for assertions
    journal: list[tuple] = []

    def __init__(self, spark, path: Path):
        self._spark = spark
        self._path = Path(path)
        self._alias: str | None = None

    # -- the DeltaTable classmethod surface -------------------------------

    @classmethod
    def forPath(cls, spark, path) -> "FakeDeltaTable":
        return cls(spark, Path(path))

    @classmethod
    def isDeltaTable(cls, spark, path) -> bool:
        return Path(path).exists()

    # -- instance surface --------------------------------------------------

    def alias(self, name: str) -> "FakeDeltaTable":
        self._alias = name
        return self

    def toDF(self) -> DataFrame:
        return self._spark.read.parquet(str(self._path))

    def merge(self, source: DataFrame, condition: str) -> _FakeMergeBuilder:
        return _FakeMergeBuilder(self, source, condition)

    def delete(self, condition: Column) -> None:
        FakeDeltaTable.journal.append(
            ("delete", str(self._path), str(condition))
        )
        # SQL DELETE removes rows where the predicate is TRUE; NULL
        # keeps the row — express keep as NOT(cond IS TRUE) so a
        # null-yielding predicate behaves like the real statement
        self._overwrite(
            self.toDF().filter(~condition.eqNullSafe(F.lit(True)))
        )

    # -- internals ---------------------------------------------------------

    def _overwrite(self, df: DataFrame) -> None:
        # the result frame scans the directory being replaced: pin it
        # first (real Delta has no such hazard — new commits are new
        # files; the fake's in-place parquet overwrite does)
        pinned = df.localCheckpoint(eager=True)
        pinned.write.mode("overwrite").parquet(str(self._path))
