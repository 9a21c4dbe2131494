"""Table storage with MERGE semantics over plain Parquet
(reference upsert idioms, SURVEY.md §2.3).

The reference's four write idioms map to three primitives here:

- ``merge_upsert``        — INSERT OR REPLACE / ON CONFLICT DO UPDATE
  (users.py:101-106, _requests.py:72-80, _customized_items.py:130-136)
- ``merge_insert_missing``— INSERT ... WHERE NOT EXISTS, never updates
  (group.py:52-64, N15)
- ``sync_children``       — full-snapshot-per-scope: replace ALL child rows
  of the scoped parents (users.py:109-180 delete-of-removed, N14/N18 —
  and the fix for the reference's broken tail-trim DELETE)

Implementation is read-modify-write parquet with an atomic directory
swap: new data lands in ``<table>.tmp-<pid>`` and is renamed over the
live directory.  On a production deployment the same three call sites
bind 1:1 to Delta/Iceberg ``MERGE INTO`` (``WHEN MATCHED UPDATE / WHEN
NOT MATCHED INSERT / WHEN NOT MATCHED BY SOURCE DELETE``) and become
metadata-only row-group rewrites; the rewrite-everything fallback is the
cost of zero table-format dependencies, not of the design.  Keys are
compared null-safely (``eqNullSafe``) to mirror SQLite's ``IS`` used in
the reference's existence checks.
"""

from __future__ import annotations

import os
import shutil
import uuid
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableStore:
    """A directory of parquet tables with merge primitives."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | os.PathLike,
        *,
        write_partitions: int | None = None,
        partitioned: dict[str, list[str]] | None = None,
    ) -> None:
        """``write_partitions`` caps output files per table — set to a small
        number for dimension-scale tables / tests; leave None to let AQE
        size the write (the right call for large fact tables).

        ``partitioned`` maps table name -> hive partition columns.  Merges
        into a partitioned table rewrite ONLY the partitions present in
        the update batch (dynamic partition overwrite + a broadcast-semi
        prune of the current side), so a 100 TB table absorbs a
        few-partition increment without a full rewrite.  Dynamic
        overwrite is not atomic across partitions — same contract as the
        reference's per-record commits: a crashed write is converged by
        the idempotent re-run (failure records, SURVEY.md §4.3 item 2).
        """
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.write_partitions = write_partitions
        self.partitioned = dict(partitioned or {})

    # -- basic io -------------------------------------------------------------

    def path(self, table: str) -> Path:
        return self.root / table

    def _recover(self, table: str) -> None:
        """Converge a half-finished ``overwrite`` swap.

        The swap is two renames (live -> .old, .tmp -> live); a crash
        between them leaves the table directory missing while the data
        sits intact in ``.old-*``.  Without recovery the next merge sees
        ``exists() == False`` and silently rebuilds the table from the
        incremental batch alone — so every read path funnels through
        here first.  A leftover ``.tmp-*`` is an unswapped (possibly
        torn) write and is discarded; a leftover ``.old-*`` alongside a
        live table is already-superseded data and is discarded too.
        """
        target = self.path(table)
        olds = sorted(
            self.root.glob(f"{table}.old-*"), key=lambda p: p.stat().st_mtime
        )
        if olds and not target.exists():
            os.replace(olds.pop(), target)
        if target.exists():
            for p in olds:
                shutil.rmtree(p, ignore_errors=True)
        for p in self.root.glob(f"{table}.tmp-*"):
            shutil.rmtree(p, ignore_errors=True)

    def exists(self, table: str) -> bool:
        self._recover(table)
        return self.path(table).exists()

    def read(self, table: str) -> DataFrame:
        self._recover(table)
        return self.spark.read.parquet(str(self.path(table)))

    def read_or_empty(self, table: str, like: DataFrame) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], like.schema)

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Atomic full replace: write to a tmp dir, swap, drop the old."""
        target = self.path(table)
        tmp = self.root / f"{table}.tmp-{uuid.uuid4().hex[:8]}"
        old = self.root / f"{table}.old-{uuid.uuid4().hex[:8]}"
        if self.write_partitions is not None:
            df = df.coalesce(self.write_partitions)
        df.write.mode("overwrite").parquet(str(tmp))
        if target.exists():
            os.replace(target, old)
        os.replace(tmp, target)
        if old.exists():
            shutil.rmtree(old, ignore_errors=True)

    # -- merge primitives (§2.3) ----------------------------------------------

    def _key_cond(self, a: DataFrame, b: DataFrame, keys: list[str]):
        return reduce(
            lambda x, y: x & y, (a[k].eqNullSafe(b[k]) for k in keys)
        )

    def _write_partitions_dynamic(self, table: str, df: DataFrame) -> None:
        """Overwrite only the hive partitions present in ``df``."""
        pcols = self.partitioned[table]
        if self.write_partitions is not None:
            df = df.coalesce(self.write_partitions)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*pcols).parquet(str(self.path(table)))
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def _current_in_partitions(self, table: str, updates: DataFrame) -> DataFrame:
        """Current rows of the partitions the update batch touches — a
        broadcast semi join on the partition columns, so the scan prunes
        to the affected partitions (DPP)."""
        from pyspark.sql.functions import broadcast

        pcols = self.partitioned[table]
        parts = updates.select(*pcols).dropDuplicates(pcols)
        return self.read(table).join(broadcast(parts), pcols, "leftsemi")

    def merge_upsert(self, table: str, updates: DataFrame, keys: list[str]) -> None:
        """Full-row upsert: rows matching on ``keys`` are replaced, new rows
        inserted.  ``updates`` must be key-unique (callers dedup upstream)."""
        u = updates.dropDuplicates(keys)
        if not self.exists(table):
            if table in self.partitioned:
                self._write_partitions_dynamic(table, u)
            else:
                self.overwrite(table, u)
            return
        if table in self.partitioned:
            current = self._current_in_partitions(table, u).alias("t")
            kept = current.join(u.alias("u"), on=self._key_cond(current, u, keys), how="left_anti")
            self._write_partitions_dynamic(table, kept.unionByName(u))
            return
        current = self.read(table).alias("t")
        ua = u.alias("u")
        kept = current.join(ua, on=self._key_cond(current, ua, keys), how="left_anti")
        self.overwrite(table, kept.unionByName(u))

    def merge_insert_missing(self, table: str, updates: DataFrame, keys: list[str]) -> None:
        """Insert-if-absent, never update (reference N15, group.py:52-64)."""
        if not self.exists(table):
            self.overwrite(table, updates.dropDuplicates(keys))
            return
        current = self.read(table)
        u = updates.dropDuplicates(keys).alias("u")
        new_rows = u.join(current.alias("t"), on=self._key_cond(u, current, keys), how="left_anti")
        self.overwrite(table, current.unionByName(new_rows))

    def sync_children(self, table: str, updates: DataFrame, scope_keys: list[str]) -> None:
        """Full-snapshot-per-scope: delete every stored row whose scope key
        appears in ``updates`` (or in ``scopes`` when provided), then insert
        the new rows.  This is the reference's delete-of-removed nested sync
        (N14) generalized — a re-ingest with fewer children leaves no stale
        tails (N18)."""
        if not self.exists(table):
            if table in self.partitioned:
                self._write_partitions_dynamic(table, updates)
            else:
                self.overwrite(table, updates)
            return
        if table in self.partitioned:
            # NOTE: assumes a scope never migrates between partitions
            # (e.g. a request's form_id is immutable) — else the stale
            # row in the old partition must be removed by a delete_scope.
            current = self._current_in_partitions(table, updates)
            scopes = updates.select(*scope_keys).dropDuplicates(scope_keys).alias("s")
            kept = current.alias("t").join(
                scopes, on=self._key_cond(current, scopes, scope_keys), how="left_anti"
            )
            self._write_partitions_dynamic(table, kept.unionByName(updates))
            return
        current = self.read(table)
        scopes = updates.select(*scope_keys).dropDuplicates(scope_keys).alias("s")
        kept = current.alias("t").join(
            scopes, on=self._key_cond(current, scopes, scope_keys), how="left_anti"
        )
        self.overwrite(table, kept.unionByName(updates))

    def delete_scope(self, table: str, scopes: DataFrame, scope_keys: list[str]) -> None:
        """Remove all rows whose scope keys appear in ``scopes``."""
        if not self.exists(table):
            return
        current = self.read(table)
        s = scopes.select(*scope_keys).dropDuplicates(scope_keys).alias("s")
        self.overwrite(
            table,
            current.alias("t").join(
                s, on=self._key_cond(current, s, scope_keys), how="left_anti"
            ),
        )
