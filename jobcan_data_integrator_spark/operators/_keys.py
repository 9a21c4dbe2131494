"""Deterministic surrogate keys.

The reference resolves surrogate ids with SQLite autoincrement plus a
``SELECT id`` read-back after every upsert (reference
``_customized_items.py:137-141`` and ~15 more sites) — a per-row round
trip that cannot scale.  We instead derive keys as salted 64-bit hashes of
the natural key, computed inside the projection: no read-back, idempotent
across re-ingests, stable across partitionings (SURVEY.md §2.3, §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Sentinel distinguishing NULL from empty/absent in hashed natural keys —
#: xxhash64 skips NULL inputs, which would make (NULL,'a') and ('a',NULL)
#: collide without it.
_NULL = "\x00<null>"


def null_safe(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(_NULL))


def hkey(salt: str, *cols: Column | str) -> Column:
    """Salted deterministic surrogate key over a null-safe natural key."""
    return F.xxhash64(F.lit(salt), *[null_safe(c) for c in cols])
