"""Multimodal binary-column gates (Arrow-batched mapInPandas; decode stubbed).

Registered in their own module, BEFORE gate/llm.py (see gate._ensure_loaded):
the driver's correctness artifact records gates in registration order and the
round-2 run demonstrated a 50-row cap, so the multimodal family must not sit
at the registry tail.

Every gate here has a FULL value oracle despite the Python path: the stub
decoder (operators/multimodal.py) derives all outputs from sha256 of the
payload bytes, and DuckDB's ``sha256(VARCHAR)`` hashes the same UTF-8 bytes
the Spark side encodes into the binary column — so metadata, resize output,
frame payloads, and feature vectors all replay bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.gate import gate
from jobcan_data_integrator_spark.gate._common import (
    _BUCKET_CTE,
    _COSINE_DUCK,
    _media_docs,
)


@gate(
    "mm_binary_metadata",
    # The stub decode is sha256-derived, so even the mapInPandas path gets a
    # full value-level oracle: DuckDB's sha256(VARCHAR) hashes the same UTF-8
    # bytes the Spark side encodes into the binary payload.
    oracle="""
    WITH m AS (
      SELECT doc_id, 'text/plain' AS mime,
             octet_length(encode(text)) AS n_bytes, sha256(text) AS h
      FROM documents
    )
    SELECT doc_id, mime, n_bytes, h AS sha256,
           CAST(64 + ('0x' || substr(h, 1, 2))::INT % 192 AS INT) AS width,
           CAST(64 + ('0x' || substr(h, 3, 2))::INT % 192 AS INT) AS height,
           CAST(1 + ('0x' || substr(h, 5, 2))::INT % 30 AS INT) AS n_frames
    FROM m
    """,
    doc="Multimodal plumbing: text payload treated as an opaque binary media "
    "column; metadata extraction runs as Arrow-batched mapInPandas (the real "
    "decode — image/audio libs — is stubbed with a deterministic sha256-"
    "derived fake, see operators/multimodal.py), which lets the oracle check "
    "VALUES, not just rows. Verifies schema/partitioning/batch shape.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobcan_data_integrator_spark.operators.multimodal import extract_binary_metadata

    media = _media_docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"), F.lit("text/plain").alias("mime")
    )
    return extract_binary_metadata(media)


@gate(
    "mm_resize",
    # _fake_resize output = sha256(payload || '|WxH') repeated to cover
    # W*H/4 bytes, so head and tail 32-byte slices both equal that digest
    # and the length is a closed-form constant — all DuckDB-replayable.
    oracle="""
    SELECT doc_id,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(32 * (1 + (64 * 64) // 128) AS BIGINT) AS n_bytes,
           sha256(text || '|64x64') AS head_sha256,
           sha256(text || '|64x64') AS tail_sha256
    FROM documents
    """,
    doc="Multimodal resize: Arrow-batched 1:1 mapInPandas over the binary "
    "payload (real impl: PIL; stubbed deterministically). The gate emits "
    "payload length plus head/tail 32-byte digests so the oracle verifies "
    "the resized bytes themselves, not just row counts. Narrow op — "
    "pipelines with the scan, no shuffle at any scale.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobcan_data_integrator_spark.operators.multimodal import resize_media

    media = _media_docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    resized = resize_media(media, width=64, height=64)
    n_bytes = F.octet_length("payload").cast("bigint")
    return resized.select(
        "doc_id",
        "width",
        "height",
        n_bytes.alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 32))).alias("head_sha256"),
        F.lower(F.hex(F.expr("substring(payload, octet_length(payload) - 31, 32)"))).alias(
            "tail_sha256"
        ),
    )


@gate(
    "mm_frame_sample",
    # Full value oracle despite the mapInPandas path: the stub decoder's
    # frame count and per-frame payload are sha256-derived, and DuckDB can
    # replay both (frame payload hash = sha256(text-bytes || 4-byte
    # big-endian index); indexes stay < 128 so chr() emits single bytes).
    oracle="""
    WITH m AS (
      SELECT doc_id, text,
             1 + ('0x' || substr(sha256(text), 5, 2))::INT % 30 AS n_frames
      FROM documents
    ), f AS (
      SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1, 5)) AS i
      FROM m
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           sha256(text || chr(0) || chr(0) || chr(0) || chr(CAST(i AS INT)))
             AS frame_sha256
    FROM f
    """,
    doc="Multimodal frame sampling: 1:N Arrow-batched mapInPandas emitting "
    "every 5th frame of each (stub-decoded) video payload. Narrow op — "
    "pipelines with the scan, no shuffle. The gate projects the frame "
    "payload as its hex digest so the oracle checks VALUES, not just rows.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobcan_data_integrator_spark.operators.multimodal import sample_frames

    media = _media_docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames(media, every_n=5).select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex("frame_payload")).alias("frame_sha256"),
    )


#: DuckDB replica of operators/multimodal.extract_features(dim=16): sha256
#: digest repeated to 64 bytes, each feature = bytes[4i:4i+4] big-endian
#: / 2^31 - 1, rounded to float32 exactly like the Arrow FloatType column.
_FEATURES_CTE = """
    f AS (
      SELECT doc_id AS vec_id,
             list_transform(generate_series(0, 15),
               i -> CAST(('0x' || substr(sha256(text), CAST(8*(i%8)+1 AS INT), 8))::BIGINT
                         / 2147483648.0 - 1.0 AS REAL)) AS embedding
      FROM documents
    )"""

#: _BUCKET_CTE over the feature CTE instead of the embeddings table —
#: derived, not duplicated, so the LSH replica has ONE definition.
_FEATURE_BUCKET_CTE = _BUCKET_CTE.replace("FROM embeddings", "FROM f")


@gate(
    "mm_feature_ann",
    oracle=f"""
    WITH {_FEATURES_CTE},
    {_FEATURE_BUCKET_CTE},
    v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM f),
    sims AS (
      SELECT q.vec_id AS q_id, c.vec_id,
             {_COSINE_DUCK.format(a="vq.emb", b="vc.emb")} AS cosine_sim
      FROM buckets q
      JOIN buckets c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
      JOIN v vq ON vq.vec_id = q.vec_id
      JOIN v vc ON vc.vec_id = c.vec_id
      WHERE q.vec_id < 3
    )
    SELECT q_id, vec_id, cosine_sim FROM sims
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id) <= 5
    """,
    doc="Multimodal feature extraction (stub encoder -> 16-dim float vector "
    "via mapInPandas) composed with the LSH ANN operator: media features "
    "are first-class embeddings for the similarity path. Fully oracled — "
    "the stub features are sha256-derived and float32-rounded identically "
    "in DuckDB, and the LSH bucketing is the deterministic integer replica.",
)
def mm_feature_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobcan_data_integrator_spark.operators.multimodal import extract_features
    from jobcan_data_integrator_spark.operators.similarity import ann_topk_lsh

    media = _media_docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    emb = extract_features(media, dim=16).select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    return ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 3), k=5, dim=16)
