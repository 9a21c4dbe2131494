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
from jobcan_data_integrator_spark.session import ensure_pyfiles
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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

    ensure_pyfiles(media.sparkSession)

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


#: Output schema of resize_media.
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

#: Output schema of sample_frames (1:N — one row per sampled frame).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)

#: Output schema of extract_features.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize (real impl: PIL).

    Output depends only on (payload, width, height) so results are stable
    across partitionings and re-runs.
    """
    seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    return seed * (1 + (width * height) // (4 * len(seed)))


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize over a binary media column (decode stubbed).

    Input columns: ``doc_id long, payload binary``; the transform is 1:1
    and narrow — no shuffle, pipelines with the scan at any scale.
    """

    ensure_pyfiles(media.sparkSession)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        _fake_resize(bytes(p), width, height) for p in pdf["payload"]
                    ],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video payloads: emit every ``every_n``-th frame
    (decode stubbed — frame count comes from the fake decoder; each frame
    payload is a deterministic slice hash).

    1:N mapInPandas — the output batch is built column-wise from the
    exploded index, so Arrow never sees Python row loops over frames.
    """

    ensure_pyfiles(media.sparkSession)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            payloads: list[bytes] = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                n_frames = _fake_decode(raw)["n_frames"]
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    payloads.append(hashlib.sha256(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": payloads,
                }
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: fixed-dim float vector per media item (real
    impl: a vision/audio encoder; stubbed as hash-derived floats in
    [-1, 1]).  Output feeds operators/similarity.py unchanged."""

    ensure_pyfiles(media.sparkSession)

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                raw = (digest * ((4 * dim) // len(digest) + 1))[: 4 * dim]
                feats.append(
                    [
                        (int.from_bytes(raw[4 * i : 4 * i + 4], "big") / 2**31) - 1.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "feature": feats}
            )

    return media.mapInPandas(_features, FEATURE_SCHEMA)
