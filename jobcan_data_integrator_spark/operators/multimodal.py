"""Multimodal (image/audio/video) column plumbing.

Media are carried as opaque ``binary`` columns plus typed metadata columns
(mime, source, etc.).  Heavy per-item work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` so at
100 TB each executor processes whole Arrow record batches without
row-at-a-time Python overhead, and the binary payload never transits the
driver.

The actual media decode is STUBBED: the container has no image/audio
libraries, so ``_fake_decode`` derives deterministic pseudo-metadata from a
sha256 of the payload.  The Spark-side contract — schema, batching, and
partition behavior — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of extract_binary_metadata.
METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real media decoder.

    A real implementation would go through PIL / torchaudio / pyav here;
    those libraries are not installed in this container, so dimensions are
    derived from the content hash (stable across runs and partitionings).
    """
    digest = hashlib.sha256(payload).digest()
    return {
        "sha256": digest.hex(),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 30,
    }


def extract_binary_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a binary media column.

    Input columns: ``doc_id long, payload binary, mime string``.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha256": [d["sha256"] for d in decoded],
                    "width": pd.Series([d["width"] for d in decoded], dtype="int32"),
                    "height": pd.Series([d["height"] for d in decoded], dtype="int32"),
                    "n_frames": pd.Series([d["n_frames"] for d in decoded], dtype="int32"),
                }
            )

    return media.mapInPandas(_extract, METADATA_SCHEMA)
