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
import threading
import time
import uuid
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: derived partition column for ``bucketed`` tables (dropped on read)
BUCKET_COL = "_pbucket"

#: absolute table paths with an ``overwrite`` swap in flight in THIS
#: process — _recover must neither restore nor clean such a table while
#: another thread (e.g. a streaming foreachBatch merge sharing the store
#: root with the batch pipeline) is mid-swap, or it can delete the
#: in-flight tmp write / rename the superseded .old back mid-rename.
_INFLIGHT_LOCK = threading.Lock()
_INFLIGHT: set[str] = set()

#: leftover ``.tmp-*`` dirs from OTHER processes are only reclaimed once
#: this old — a fresh foreign tmp may be a live writer's in-flight data.
#: (Cross-process concurrent writers to one table are otherwise
#: unsupported — single logical writer per table, like the reference's
#: single-process SQLite; the age gate just keeps a same-host overlap
#: from corrupting an in-flight swap.)
_STALE_TMP_SECONDS = 3600.0


class TableStore:
    """A directory of parquet tables with merge primitives."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | os.PathLike,
        *,
        write_partitions: int | None = None,
        partitioned: dict[str, list[str]] | None = None,
        bucketed: dict[str, tuple[str, int]] | None = None,
        sorted_by: dict[str, list[str]] | None = None,
        snapshot_isolation: bool = False,
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

        ``bucketed`` maps table name -> (source column, n_buckets) for
        tables whose natural key is too high-cardinality to hive-partition
        directly (e.g. child tables scoped by ``request_id``): writes add
        a derived partition column ``_pbucket = pmod(xxhash64(src), n)``
        and reads drop it, so merges rewrite only the 1/n of the table
        the update batch's keys hash into.  The same key always lands in
        the same bucket, so scoped syncs stay correct by construction.

        ``sorted_by`` maps table name -> columns to sort WITHIN each
        written file (``sortWithinPartitions`` before every write — no
        extra shuffle beyond the write's own layout).  Sorted files
        carry tight per-row-group min/max statistics on those columns,
        so a pushed ``In``/range filter (see ``read_for_keys``'s
        key-value pushdown) skips whole row groups instead of decoding
        them — the "z-order lite" a warehouse applies to its probe-side
        index tables.

        ``snapshot_isolation`` switches the store to
        versioned writes published through a single manifest pointer:
        every ``overwrite`` lands in a fresh ``<table>.v-*`` directory and
        becomes reader-visible only when ``end_commit`` atomically swaps
        ``_snapshot.json`` — so a reader that pins one snapshot (see
        ``current_snapshot``/``read_at``) observes a CONSISTENT set of
        tables even while a multi-table batch is mid-write.  This is the
        manifest-pointer mechanism Delta/Iceberg provide natively; plain
        in-place mode (the default) keeps the reference's
        converged-by-replay contract instead.  Incompatible with
        ``partitioned``/``bucketed`` tables (their dynamic partition
        overwrite rewrites in place)."""
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.write_partitions = write_partitions
        self.partitioned = dict(partitioned or {})
        self.bucketed = dict(bucketed or {})
        self.sorted_by = dict(sorted_by or {})
        self.snapshot_isolation = snapshot_isolation
        if snapshot_isolation and (self.partitioned or self.bucketed):
            raise ValueError(
                "snapshot_isolation does not compose with partitioned/"
                "bucketed tables (dynamic partition overwrite is in-place);"
                " use a table format with native snapshots for those"
            )
        #: snapshot mode: versioned dirs written this batch, not yet
        #: published ({table: dirname}) — read() prefers these so a batch
        #: reads its own writes
        self._pending_versions: dict[str, str] = {}
        #: instance-scoped swap-name token: _recover may always reclaim
        #: THIS instance's leftover tmp dirs, but foreign ones only when
        #: stale (they may be another live writer's in-flight swap)
        self._token = f"{os.getpid():x}{uuid.uuid4().hex[:6]}"

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

        Concurrency: a table with a swap in flight in this process is
        skipped entirely (see _INFLIGHT), and tmp dirs created by OTHER
        processes are only reclaimed after _STALE_TMP_SECONDS — so a
        streaming merge and a batch pipeline sharing one store root
        cannot delete each other's in-flight writes.
        """
        target = self.path(table)
        with _INFLIGHT_LOCK:
            if str(target) in _INFLIGHT:
                return
        olds = sorted(
            self.root.glob(f"{table}.old-*"), key=lambda p: p.stat().st_mtime
        )
        if olds and not target.exists():
            os.replace(olds.pop(), target)
        if target.exists():
            for p in olds:
                shutil.rmtree(p, ignore_errors=True)
        now = time.time()
        for p in self.root.glob(f"{table}.tmp-*"):
            mine = p.name.startswith(f"{table}.tmp-{self._token}-")
            try:
                fresh = (now - p.stat().st_mtime) < _STALE_TMP_SECONDS
            except OSError:
                continue  # deleted concurrently
            if mine or not fresh:
                # Re-check in-flight membership IMMEDIATELY before the
                # delete: a concurrent overwrite() on this table (same
                # store instance, same token) may have registered and
                # created its tmp between this function's entry check and
                # the glob — deleting that fresh tmp mid-write would fail
                # the writer loudly for no reason (check-then-act TOCTOU).
                with _INFLIGHT_LOCK:
                    if str(target) in _INFLIGHT:
                        return
                shutil.rmtree(p, ignore_errors=True)

    def _resolve(self, table: str) -> Path | None:
        """Snapshot mode: the directory a read of ``table`` should scan —
        this batch's own pending write first, then the published
        snapshot, then a legacy live dir (a table written before the
        store switched modes).  None = table does not exist."""
        if table in self._pending_versions:
            return self.root / self._pending_versions[table]
        snap_tables = self.current_snapshot()["tables"]
        if table in snap_tables:
            return self.root / snap_tables[table]
        if self.path(table).exists():
            return self.path(table)
        return None

    def exists(self, table: str) -> bool:
        if self.snapshot_isolation:
            return self._resolve(table) is not None
        self._recover(table)
        return self.path(table).exists()

    def read(self, table: str) -> DataFrame:
        if self.snapshot_isolation:
            p = self._resolve(table)
            if p is None:
                raise FileNotFoundError(f"no snapshot or live dir for table {table!r}")
            return self.spark.read.parquet(str(p))
        self._recover(table)
        df = self.spark.read.parquet(str(self.path(table)))
        if table in self.bucketed and BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df

    def read_or_empty(self, table: str, like: DataFrame) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], like.schema)

    #: key-value pushdown cap for read_for_keys: an ``In`` filter with
    #: more literals than this stops helping (planning cost, and Parquet
    #: dictionary/row-group pruning saturates) — past it, only the
    #: partition-level bucket filter is pushed.
    MAX_PUSHED_KEYS = 1024

    def read_for_keys(
        self, table: str, keys: DataFrame, key_col: str | None = None
    ) -> DataFrame:
        """Bucket-pruned read: only the hive bucket directories that the
        given key values hash into are scanned.

        ``keys`` is a (small) one-column-of-interest frame; ``key_col``
        names that column (default: the table's declared bucket source
        column) and MUST have the same type as the stored source column
        — ``xxhash64`` is type-sensitive, so a string key against a
        bigint-bucketed table would silently prune the wrong dirs.

        Returns a SUPERSET of the rows whose source column equals one of
        the keys — the caller's own equi-/semi-join does the exact
        filtering, as it already must.  Two pruning levels:

        1. the bucket set (at most ``n_buckets`` values, one tiny
           aggregate over the keys) goes into an ``isin`` on the
           partition column — unmatched bucket dirs are never even
           LISTED;
        2. when the distinct key set itself is small (≤ MAX_PUSHED_KEYS)
           the key VALUES are additionally pushed as an ``In`` filter on
           the source column — Parquet row-group min/max statistics then
           skip non-matching row groups inside the surviving buckets,
           which is what the ``sorted_by`` write layout makes sharp.

        Falls back to a plain ``read`` when the table is not bucketed
        (nothing to prune on) or when the keys cover every bucket.
        """
        if table not in self.bucketed:
            return self.read(table)
        src, n = self.bucketed[table]
        kc = key_col or src
        pairs = (
            keys.select(
                F.col(kc).alias("k"),
                F.pmod(F.xxhash64(F.col(kc)), F.lit(n)).alias("b"),
            )
            .distinct()
            .limit(self.MAX_PUSHED_KEYS + 1)
            .collect()
        )
        df = self._read_raw(table)
        if len(pairs) <= self.MAX_PUSHED_KEYS:
            # the full distinct key set fits: push values AND buckets
            buckets = sorted({r["b"] for r in pairs})
            if len(buckets) < n:
                df = df.filter(F.col(BUCKET_COL).isin(buckets))
            df = df.filter(F.col(src).isin([r["k"] for r in pairs]))
        else:
            # too many keys to push by value — bucket-level pruning only
            # (the limit above truncated the pair list, so re-derive the
            # complete bucket set)
            buckets = [
                r[0]
                for r in keys.select(
                    F.pmod(F.xxhash64(F.col(kc)), F.lit(n)).alias("b")
                )
                .distinct()
                .collect()
            ]
            if len(buckets) < n:
                df = df.filter(F.col(BUCKET_COL).isin(buckets))
        return df.drop(BUCKET_COL)

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Atomic full replace: write to a tmp dir, swap, drop the old.

        The table is registered in-flight for the whole write+swap so a
        concurrent _recover (another thread sharing the store root)
        neither deletes the tmp mid-write nor renames the .old back
        between the two swap renames.

        Partitioned/bucketed tables land in their managed hive layout
        directly (partitionBy into the tmp dir, same swap) — an initial
        build is then bucket-prunable immediately instead of paying the
        migrate-on-first-merge rewrite.

        Snapshot mode: the write lands in a fresh versioned directory and
        is NOT reader-visible until ``end_commit`` publishes the manifest
        pointer — no swap, no in-flight bookkeeping needed.
        """
        if self.snapshot_isolation:
            df_out = df
            if self.write_partitions is not None:
                df_out = df_out.coalesce(self.write_partitions)
            vdir = f"{table}.v-{self._token}-{uuid.uuid4().hex[:8]}"
            self._sorted(table, df_out).write.mode("overwrite").parquet(
                str(self.root / vdir)
            )
            self._pending_versions[table] = vdir
            return
        target = self.path(table)
        tmp = self.root / f"{table}.tmp-{self._token}-{uuid.uuid4().hex[:8]}"
        old = self.root / f"{table}.old-{uuid.uuid4().hex[:8]}"
        with _INFLIGHT_LOCK:
            _INFLIGHT.add(str(target))
        try:
            pcols = self._managed_pcols(table)
            if pcols:
                df = self._prep(table, df)
            if self.write_partitions is not None:
                df = df.coalesce(self.write_partitions)
            w = self._sorted(table, df).write.mode("overwrite")
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(str(tmp))
            if target.exists():
                os.replace(target, old)
            os.replace(tmp, target)
            if old.exists():
                shutil.rmtree(old, ignore_errors=True)
        finally:
            with _INFLIGHT_LOCK:
                _INFLIGHT.discard(str(target))

    # -- multi-table commit manifest ------------------------------------------

    #: manifest file marking a multi-table write batch in progress
    MANIFEST = "_commit.json"

    def begin_commit(self, batch_id: str, tables: list[str]) -> None:
        """Mark a multi-table batch in progress (atomic manifest write).

        Per-table swaps are individually atomic but the batch is not: a
        hard crash between tables leaves some written and some not.  The
        writes are idempotent merges driven by checkpoint state that only
        advances AFTER ``end_commit``, so re-running the batch converges
        to the exact same result — the manifest makes that interrupted
        state DETECTED and the replay explicit instead of implicit
        (reference parity: gateway.py:513-539 converges per record the
        same way, also without cross-table atomicity).
        """
        import json as _json

        payload = {"batch_id": batch_id, "tables": sorted(tables)}
        tmp = self.root / f"{self.MANIFEST}.tmp"
        tmp.write_text(_json.dumps(payload))
        os.replace(tmp, self.root / self.MANIFEST)

    #: versioned manifest pointer (snapshot mode): the ONE file whose
    #: atomic replace publishes a whole batch to readers
    SNAPSHOT = "_snapshot.json"

    def current_snapshot(self) -> dict:
        """The published snapshot: ``{"version": N, "tables": {name ->
        versioned dirname}}``.  Pin the returned dict and resolve every
        table of a multi-table read through it (``read_at``) to observe
        one consistent batch; calling ``read`` per table re-reads the
        pointer and can straddle a concurrent publish."""
        import json as _json

        p = self.root / self.SNAPSHOT
        if p.exists():
            return _json.loads(p.read_text())
        return {"version": 0, "tables": {}}

    def read_at(self, table: str, snapshot: dict) -> DataFrame:
        """Read ``table`` as of a pinned ``current_snapshot()`` result."""
        if table in snapshot["tables"]:
            return self.spark.read.parquet(str(self.root / snapshot["tables"][table]))
        return self.read(table)

    def end_commit(self) -> None:
        """Clear the manifest: the batch's tables are all written (or its
        replay is owned by recorded failure state).

        Snapshot mode: FIRST atomically publish the batch's versioned
        dirs as the new snapshot pointer — until this single
        ``os.replace`` every reader resolves the pre-batch snapshot, after
        it every new pin resolves the whole batch.  Superseded versioned
        dirs are GC'd except the immediately-previous snapshot's (a
        reader that pinned just before the publish may still be lazily
        scanning those paths; one-version grace matches one batch cycle).

        Snapshot mode assumes ONE logical writer per STORE (the pointer
        update is read-modify-write, and the GC reclaims any versioned
        dir the manifest doesn't reference): readers may be many and
        concurrent, but route all writes through one process — the same
        single-writer stance as the reference's SQLite.
        """
        import json as _json

        if self.snapshot_isolation and self._pending_versions:
            snap = self.current_snapshot()
            new_tables = dict(snap["tables"])
            new_tables.update(self._pending_versions)
            payload = {"version": snap["version"] + 1, "tables": new_tables}
            tmp = self.root / f"{self.SNAPSHOT}.tmp"
            tmp.write_text(_json.dumps(payload))
            os.replace(tmp, self.root / self.SNAPSHOT)
            self._pending_versions = {}
            keep = set(new_tables.values()) | set(snap["tables"].values())
            for p in self.root.glob("*.v-*"):
                if p.name not in keep:
                    shutil.rmtree(p, ignore_errors=True)
        (self.root / self.MANIFEST).unlink(missing_ok=True)

    def pending_commit(self) -> dict | None:
        """The interrupted batch's manifest, if a previous process died
        mid-batch — callers replay (re-run the idempotent merges from
        their checkpoint, which never advanced past the batch) and then
        ``end_commit``."""
        import json as _json

        p = self.root / self.MANIFEST
        if p.exists():
            return _json.loads(p.read_text())
        return None

    # -- merge primitives (§2.3) ----------------------------------------------

    def _key_cond(self, a: DataFrame, b: DataFrame, keys: list[str]):
        return reduce(
            lambda x, y: x & y, (a[k].eqNullSafe(b[k]) for k in keys)
        )

    def _managed_pcols(self, table: str) -> list[str] | None:
        """Partition columns for tables with partition-scoped merges.

        A table may be hive-partitioned, key-bucketed, or BOTH — e.g.
        the bronze archive partitions by api_type AND buckets by
        brief_key, so an incremental merge touches one api's few
        buckets, not the api's whole (unbounded) partition."""
        cols = list(self.partitioned.get(table, []))
        if table in self.bucketed:
            cols.append(BUCKET_COL)
        return cols or None

    def _prep(self, table: str, df: DataFrame) -> DataFrame:
        """Attach the derived bucket column for bucketed tables."""
        if table in self.bucketed and BUCKET_COL not in df.columns:
            src, n = self.bucketed[table]
            df = df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(src)), F.lit(n)))
        return df

    def _sorted(self, table: str, df: DataFrame) -> DataFrame:
        """Apply the table's declared within-file sort (see sorted_by).

        The hive partition columns lead the sort: the file writer
        REQUIRES rows ordered by partition columns and would insert its
        own (non-stable) sort otherwise, destroying the data-column
        order — leading with them satisfies that requirement so the
        declared order actually reaches the files.
        """
        cols = self.sorted_by.get(table)
        if not cols:
            return df
        pcols = [
            c for c in (self._managed_pcols(table) or []) if c in df.columns
        ]
        return df.sortWithinPartitions(*pcols, *cols)

    def _read_raw(self, table: str) -> DataFrame:
        """Like read(), but keeps the bucket column on bucketed tables.

        A table written BEFORE it was declared bucketed (legacy flat
        layout, no ``_pbucket`` dirs) is migrated in place on first
        touch: one full rewrite with the bucket column, after which
        every merge is partition-scoped.  Without this, the managed
        merge paths would join on a column the legacy files don't have.
        """
        self._recover(table)
        df = self.spark.read.parquet(str(self.path(table)))
        if table in self.bucketed and BUCKET_COL not in df.columns:
            self._migrate_to_bucketed(table, df)
            df = self.spark.read.parquet(str(self.path(table)))
        return df

    def _migrate_to_bucketed(self, table: str, df: DataFrame) -> None:
        """One-time rewrite of a legacy flat table into the bucketed
        layout, via the same tmp-dir + swap as overwrite() (a direct
        in-place write would read and overwrite the same path)."""
        prepped = self._prep(table, df)
        if self.write_partitions is not None:
            prepped = prepped.coalesce(self.write_partitions)
        tmp = self.root / f"{table}.tmp-{self._token}-{uuid.uuid4().hex[:8]}"
        old = self.root / f"{table}.old-{uuid.uuid4().hex[:8]}"
        with _INFLIGHT_LOCK:
            _INFLIGHT.add(str(self.path(table)))
        try:
            self._sorted(table, prepped).write.mode("overwrite").partitionBy(
                *self._managed_pcols(table)
            ).parquet(str(tmp))
            os.replace(self.path(table), old)
            os.replace(tmp, self.path(table))
            shutil.rmtree(old, ignore_errors=True)
        finally:
            with _INFLIGHT_LOCK:
                _INFLIGHT.discard(str(self.path(table)))

    def _write_partitions_dynamic(self, table: str, df: DataFrame) -> None:
        """Overwrite only the hive partitions present in ``df``."""
        pcols = self._managed_pcols(table)
        if self.write_partitions is not None:
            df = df.coalesce(self.write_partitions)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            self._sorted(table, df).write.mode("overwrite").partitionBy(
                *pcols
            ).parquet(str(self.path(table)))
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def _current_in_partitions(self, table: str, updates: DataFrame) -> DataFrame:
        """Current rows of the partitions the update batch touches — a
        broadcast semi join on the partition columns, so the scan prunes
        to the affected partitions (DPP).  ``updates`` must already carry
        the partition columns (callers _prep bucketed tables first)."""
        from pyspark.sql.functions import broadcast

        pcols = self._managed_pcols(table)
        parts = updates.select(*pcols).dropDuplicates(pcols)
        return self._read_raw(table).join(broadcast(parts), pcols, "leftsemi")

    def merge_upsert(self, table: str, updates: DataFrame, keys: list[str]) -> None:
        """Full-row upsert: rows matching on ``keys`` are replaced, new rows
        inserted.  ``updates`` must be key-unique (callers dedup upstream)."""
        u = updates.dropDuplicates(keys)
        if not self.exists(table):
            if self._managed_pcols(table):
                self._write_partitions_dynamic(table, self._prep(table, u))
            else:
                self.overwrite(table, u)
            return
        if self._managed_pcols(table):
            up = self._prep(table, u)
            current = self._current_in_partitions(table, up).alias("t")
            kept = current.join(up.alias("u"), on=self._key_cond(current, up, keys), how="left_anti")
            self._write_partitions_dynamic(table, kept.unionByName(up))
            return
        current = self.read(table).alias("t")
        ua = u.alias("u")
        kept = current.join(ua, on=self._key_cond(current, ua, keys), how="left_anti")
        self.overwrite(table, kept.unionByName(u))

    def merge_insert_missing(self, table: str, updates: DataFrame, keys: list[str]) -> None:
        """Insert-if-absent, never update (reference N15, group.py:52-64)."""
        u = updates.dropDuplicates(keys)
        if not self.exists(table):
            if self._managed_pcols(table):
                self._write_partitions_dynamic(table, self._prep(table, u))
            else:
                self.overwrite(table, u)
            return
        if self._managed_pcols(table):
            up = self._prep(table, u)
            current = self._current_in_partitions(table, up)
            new_rows = up.alias("u").join(
                current.alias("t"), on=self._key_cond(up, current, keys), how="left_anti"
            )
            self._write_partitions_dynamic(table, current.unionByName(new_rows))
            return
        current = self.read(table)
        ua = u.alias("u")
        new_rows = ua.join(current.alias("t"), on=self._key_cond(ua, current, keys), how="left_anti")
        self.overwrite(table, current.unionByName(new_rows))

    def sync_children(self, table: str, updates: DataFrame, scope_keys: list[str]) -> None:
        """Full-snapshot-per-scope: delete every stored row whose scope key
        appears in ``updates`` (or in ``scopes`` when provided), then insert
        the new rows.  This is the reference's delete-of-removed nested sync
        (N14) generalized — a re-ingest with fewer children leaves no stale
        tails (N18)."""
        if not self.exists(table):
            if self._managed_pcols(table):
                self._write_partitions_dynamic(table, self._prep(table, updates))
            else:
                self.overwrite(table, updates)
            return
        if self._managed_pcols(table):
            # NOTE: assumes a scope never migrates between partitions —
            # true by construction for bucketed tables (the bucket is a
            # pure function of the scope key) and for hive partitions
            # whose column is immutable per scope (a request's form_id);
            # else the stale row in the old partition must be removed by
            # a delete_scope.
            up = self._prep(table, updates)
            current = self._current_in_partitions(table, up)
            scopes = up.select(*scope_keys).dropDuplicates(scope_keys).alias("s")
            kept = current.alias("t").join(
                scopes, on=self._key_cond(current, scopes, scope_keys), how="left_anti"
            )
            self._write_partitions_dynamic(table, kept.unionByName(up))
            return
        current = self.read(table)
        scopes = updates.select(*scope_keys).dropDuplicates(scope_keys).alias("s")
        kept = current.alias("t").join(
            scopes, on=self._key_cond(current, scopes, scope_keys), how="left_anti"
        )
        self.overwrite(table, kept.unionByName(updates))

    def delete_scope(self, table: str, scopes: DataFrame, scope_keys: list[str]) -> None:
        """Remove all rows whose scope keys appear in ``scopes``.

        Unmanaged tables only: dynamic partition overwrite cannot express
        "this partition is now empty" (an empty partition never appears in
        the written frame), so a partition-scoped delete could leave stale
        rows behind.  Use ``sync_children`` for managed tables instead —
        its kept ∪ updates frame always re-covers every touched partition.
        """
        if self._managed_pcols(table):
            raise ValueError(
                f"delete_scope on partitioned/bucketed table {table!r} is "
                "unsupported (empty partitions cannot be expressed by a "
                "dynamic overwrite); use sync_children"
            )
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
