"""Multimodal (image/audio/video) column plumbing.

Media are carried as opaque ``binary`` columns plus typed metadata columns
(mime, source, etc.).  Heavy per-item work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` so at
100 TB each executor processes whole Arrow record batches without
row-at-a-time Python overhead, and the binary payload never transits the
driver.

Decode strategy (``_decode``): recognized image containers get REAL
metadata — via PIL when installed, else via pure-Python container header
parsing (PNG IHDR, GIF logical-screen + block walk, JPEG SOF scan) — so
real bytes yield real width/height with zero extra dependencies.
Unrecognized payloads (e.g. the text-derived gate corpus) fall back to
``_fake_decode``'s deterministic sha256-derived pseudo-metadata, which
keeps every gate oracle replayable in DuckDB.  Pixel-level work (resize)
is real only under PIL; without it the resize payload stays a
deterministic stub.  The Spark-side contract — schema, batching, and
partition behavior — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

try:  # optional: real pixel decode/resize when pillow is installed
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - container has no pillow
    _PILImage = None

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


def _fake_decode(payload: bytes, digest: bytes | None = None) -> dict[str, Any]:
    """Deterministic stand-in for a real media decoder.

    Used for payloads that are not a recognized image container (the
    text-derived gate corpus lands here): dimensions are derived from the
    content hash (stable across runs and partitionings), which is what
    makes the multimodal gates value-replayable in DuckDB.  ``digest``
    lets ``_decode`` share its already-computed sha256 instead of
    hashing the payload a second time.
    """
    if digest is None:
        digest = hashlib.sha256(payload).digest()
    return {
        "sha256": digest.hex(),
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "n_frames": 1 + digest[2] % 30,
    }


def _parse_png(b: bytes) -> dict[str, int] | None:
    """PNG IHDR: width/height are the first 8 bytes of the first chunk."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", b[16:24])
    return {"width": width, "height": height, "n_frames": 1}


def _parse_gif(b: bytes) -> dict[str, int] | None:
    """GIF logical screen descriptor + a block walk counting image
    descriptors (= frames).  The walk follows the container grammar, so
    0x2C bytes inside pixel data are never miscounted as frames."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", b[6:10])
    pos = 13
    flags = b[10]
    if flags & 0x80:  # global color table: 3 * 2^(depth+1) bytes
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    try:
        while pos < len(b):
            block = b[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                n_frames += 1
                pos += 9
                lflags = b[pos]
                pos += 1
                if lflags & 0x80:  # local color table
                    pos += 3 * (2 << (lflags & 0x07))
                pos += 1  # LZW minimum code size
                while b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            else:  # corrupt stream — treat as unparseable
                return None
    except IndexError:
        return None  # truncated stream
    return {"width": width, "height": height, "n_frames": max(n_frames, 1)}


def _parse_jpeg(b: bytes) -> dict[str, int] | None:
    """JPEG SOF marker scan: height/width live in the first
    start-of-frame segment (SOF0-15 except the DHT/DAC/RST family)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(b):
                return None
            height, width = struct.unpack(">HH", b[pos + 5 : pos + 9])
            return {"width": width, "height": height, "n_frames": 1}
        pos += 2 + seg_len
    return None


def _decode(payload: bytes) -> dict[str, Any]:
    """Real metadata for recognized image bytes, sha256 stub otherwise.

    PIL (when installed) handles any format it knows, including
    multi-frame containers; the pure-Python header parsers cover
    PNG/GIF/JPEG with no dependencies.  Either way the sha256 content
    hash is computed from the payload — it doubles as the dedup key.
    """
    digest = hashlib.sha256(payload).digest()
    sha = digest.hex()
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return {
                    "sha256": sha,
                    "width": int(img.width),
                    "height": int(img.height),
                    "n_frames": int(getattr(img, "n_frames", 1)),
                }
        except Exception:
            pass  # not an image PIL knows — try the header parsers
    for parse in (_parse_png, _parse_gif, _parse_jpeg, _parse_mp4_video):
        meta = parse(payload)
        if meta is not None:
            return {"sha256": sha, **meta}
    return _fake_decode(payload, digest)


def _wav_layout(b: bytes) -> dict[str, int] | None:
    """WAV RIFF chunk walk returning the PCM layout — sample rate /
    channels / block align from ``fmt ``, plus the ``data`` chunk's
    byte OFFSET and size (so sample extraction can slice the real
    frames, not just report duration)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = n_channels = block_align = None
    data_off = data_size = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if cid == b"fmt " and pos + 24 <= len(b):
            n_channels, sample_rate = struct.unpack(
                "<HI", b[pos + 10 : pos + 16]
            )
            block_align = struct.unpack("<H", b[pos + 20 : pos + 22])[0]
        elif cid == b"data":
            data_off, data_size = pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if not sample_rate or not block_align or data_size is None:
        return None
    return {
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "block_align": int(block_align),
        "data_off": int(data_off),
        "data_size": int(data_size),
    }


def _parse_wav(b: bytes) -> dict[str, Any] | None:
    """WAV RIFF chunk walk: sample rate / channels from ``fmt ``,
    duration from the ``data`` chunk length / byte rate."""
    lay = _wav_layout(b)
    if lay is None:
        return None
    n_samples = lay["data_size"] // lay["block_align"]
    return {
        "duration_ms": int(n_samples * 1000 // lay["sample_rate"]),
        "sample_rate": lay["sample_rate"],
        "n_channels": lay["n_channels"],
        "n_tracks": 1,
        "width": None,
        "height": None,
    }


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the ISO-BMFF boxes in
    ``b[start:end]`` — tolerant of truncation (stops cleanly)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", b[pos : pos + 4])[0]
        btype = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1 and pos + 16 <= end:  # 64-bit largesize
            size = struct.unpack(">Q", b[pos + 8 : pos + 16])[0]
            hdr = 16
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_mp4_video(b: bytes) -> dict[str, Any] | None:
    """MP4 frame-grid metadata via the REAL sample tables: walk
    ``moov/trak/mdia/minf/stbl`` and count frames from ``stts`` (sum of
    entry sample counts) or, failing that, ``stsz``'s sample_count —
    so ``sample_frames`` gets true MP4 frame counts the way PNG/GIF get
    true dimensions (and GIF gets true frame counts) from their
    containers.  Dimensions from the track's ``tkhd`` (16.16 fixed
    point).  Prefers the first track with nonzero dimensions (the video
    track); falls back to any track with a sample table.  Returns None
    unless the payload is ISO-BMFF with at least one of those."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        tracks: list[tuple[int | None, int | None, int | None]] = []
        for ctype, cs, ce in _mp4_boxes(b, s, e):
            if ctype != b"trak":
                continue
            t_w = t_h = t_n = None
            for ttype, ts, te in _mp4_boxes(b, cs, ce):
                if ttype == b"tkhd" and te - ts >= 8:
                    w, h = struct.unpack(">II", b[te - 8 : te])
                    if w and h:
                        t_w, t_h = w >> 16, h >> 16
                elif ttype == b"mdia":
                    for mtype, ms, me in _mp4_boxes(b, ts, te):
                        if mtype != b"minf":
                            continue
                        for ntype, ns, ne in _mp4_boxes(b, ms, me):
                            if ntype != b"stbl":
                                continue
                            for sbt, ss, se in _mp4_boxes(b, ns, ne):
                                if sbt == b"stts" and se - ss >= 8:
                                    cnt = struct.unpack(
                                        ">I", b[ss + 4 : ss + 8]
                                    )[0]
                                    total = 0
                                    for i in range(cnt):
                                        o = ss + 8 + 8 * i
                                        if o + 8 > se:
                                            break
                                        total += struct.unpack(
                                            ">I", b[o : o + 4]
                                        )[0]
                                    t_n = total
                                elif (
                                    sbt == b"stsz"
                                    and se - ss >= 12
                                    and t_n is None
                                ):
                                    t_n = struct.unpack(
                                        ">I", b[ss + 8 : ss + 12]
                                    )[0]
            tracks.append((t_w, t_h, t_n))
        video = next((t for t in tracks if t[0]), None)
        sampled = next((t for t in tracks if t[2] is not None), None)
        if video is None and sampled is None:
            return None
        w, h, n = video or (None, None, None)
        if n is None and sampled is not None:
            n = sampled[2]
        return {"width": w, "height": h, "n_frames": max(n or 1, 1)}
    return None


def _parse_mp4(b: bytes) -> dict[str, Any] | None:
    """MP4/ISO-BMFF box walk: duration/timescale from ``moov/mvhd``,
    track count from ``trak`` boxes, video dimensions from the first
    ``tkhd`` with nonzero width/height (16.16 fixed point)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        duration_ms = None
        n_tracks = 0
        width = height = None
        for ctype, cs, ce in _mp4_boxes(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 4:
                ver = b[cs]
                if ver == 1 and ce - cs >= 28:
                    timescale = struct.unpack(">I", b[cs + 20 : cs + 24])[0]
                    duration = struct.unpack(">Q", b[cs + 24 : cs + 32])[0]
                elif ce - cs >= 20:
                    timescale = struct.unpack(">I", b[cs + 12 : cs + 16])[0]
                    duration = struct.unpack(">I", b[cs + 16 : cs + 20])[0]
                else:
                    continue
                if timescale:
                    duration_ms = int(duration * 1000 // timescale)
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, ts, te in _mp4_boxes(b, cs, ce):
                    if ttype == b"tkhd" and te - ts >= 8 and width is None:
                        w, h = struct.unpack(">II", b[te - 8 : te])
                        if w and h:
                            width, height = w >> 16, h >> 16
        if duration_ms is None and n_tracks == 0:
            return None
        return {
            "duration_ms": duration_ms,
            "sample_rate": None,
            "n_channels": None,
            "n_tracks": n_tracks,
            "width": width,
            "height": height,
        }
    return None


#: Output schema of extract_av_metadata.
AV_METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_tracks", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _decode_av(payload: bytes) -> dict[str, Any]:
    """Real metadata for recognized WAV/MP4 containers (dependency-free
    header parsing, mirroring the image approach), deterministic
    sha256-derived fake otherwise."""
    digest = hashlib.sha256(payload).digest()
    sha = digest.hex()
    for parse in (_parse_wav, _parse_mp4):
        meta = parse(payload)
        if meta is not None:
            return {"sha256": sha, **meta}
    return {
        "sha256": sha,
        "duration_ms": 1000 + int.from_bytes(digest[:2], "big") % 60000,
        "sample_rate": 8000 * (1 + digest[2] % 6),
        "n_channels": 1 + digest[3] % 2,
        "n_tracks": 1 + digest[4] % 3,
        "width": None,
        "height": None,
    }


def extract_av_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched audio/video metadata extraction over a binary media
    column — the WAV/MP4 face of :func:`extract_binary_metadata`
    (images keep their own schema; AV payloads carry duration / sample
    rate / track counts instead of frame grids).

    Input columns: ``doc_id long, payload binary, mime string``."""
    ensure_pyfiles(media.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_av(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha256": [d["sha256"] for d in decoded],
                    "duration_ms": pd.Series(
                        [d["duration_ms"] for d in decoded], dtype="Int64"
                    ),
                    "sample_rate": pd.Series(
                        [d["sample_rate"] for d in decoded], dtype="Int32"
                    ),
                    "n_channels": pd.Series(
                        [d["n_channels"] for d in decoded], dtype="Int32"
                    ),
                    "n_tracks": pd.Series(
                        [d["n_tracks"] for d in decoded], dtype="Int32"
                    ),
                    "width": pd.Series(
                        [d["width"] for d in decoded], dtype="Int32"
                    ),
                    "height": pd.Series(
                        [d["height"] for d in decoded], dtype="Int32"
                    ),
                }
            )

    return media.mapInPandas(_extract, AV_METADATA_SCHEMA)


def extract_binary_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a binary media column.

    Input columns: ``doc_id long, payload binary, mime string``.
    """

    ensure_pyfiles(media.sparkSession)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode(bytes(p)) for p in pdf["payload"]]
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

#: Output schema of sample_audio_segments.
AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("segment_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("payload", BinaryType()),
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
    """Deterministic stand-in for an image resize.

    Output depends only on (payload, width, height) so results are stable
    across partitionings and re-runs.
    """
    seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    return seed * (1 + (width * height) // (4 * len(seed)))


def _do_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real pixel resize when PIL can decode the payload (re-encoded as
    PNG for a deterministic byte stream), deterministic stub otherwise."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
                return out.getvalue()
        except Exception:
            pass  # not an image PIL knows — fall through to the stub
    return _fake_resize(payload, width, height)


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
                        _do_resize(bytes(p), width, height) for p in pdf["payload"]
                    ],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video payloads: emit every ``every_n``-th frame
    (frame decode stubbed — each frame payload is a deterministic slice
    hash — but the frame COUNT is real for recognized containers: GIF
    image descriptors and MP4 ``stbl/stts``/``stsz`` sample tables;
    only unrecognized payloads fall back to the sha256 fake count).

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
                n_frames = _decode(raw)["n_frames"]
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


def sample_audio_segments(
    media: DataFrame, segment_ms: int = 1000
) -> DataFrame:
    """Audio segmentation for training pipelines: split each payload
    into ``segment_ms`` windows of REAL PCM — for recognized WAV
    containers the emitted ``payload`` is the actual byte slice of the
    ``data`` chunk (whole sample frames, never splitting a block) and
    ``n_samples``/``start_ms`` are exact; unrecognized payloads fall
    back to the deterministic sha256 fake (one segment per fake second,
    hash-derived bytes) so the 1:N Spark plumbing stays testable
    everywhere.

    1:N mapInPandas like :func:`sample_frames` — Arrow-batched, output
    built column-wise, no per-row Python in the plan beyond the
    declared Arrow path."""
    ensure_pyfiles(media.sparkSession)

    def _segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            starts: list[int] = []
            counts: list[int] = []
            payloads: list[bytes] = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                lay = _wav_layout(raw)
                if lay is not None:
                    ba = lay["block_align"]
                    per_seg = max(
                        1, lay["sample_rate"] * segment_ms // 1000
                    )
                    total = lay["data_size"] // ba
                    i = 0
                    while i * per_seg < total:
                        s0 = i * per_seg
                        n = min(per_seg, total - s0)
                        off = lay["data_off"] + s0 * ba
                        ids.append(int(doc_id))
                        idxs.append(i)
                        starts.append(s0 * 1000 // lay["sample_rate"])
                        counts.append(n)
                        payloads.append(raw[off : off + n * ba])
                        i += 1
                else:
                    meta = _decode_av(raw)
                    n_seg = max(
                        1, int(meta["duration_ms"] or 1000) // segment_ms
                    )
                    rate = int(meta["sample_rate"] or 8000)
                    for i in range(n_seg):
                        ids.append(int(doc_id))
                        idxs.append(i)
                        starts.append(i * segment_ms)
                        counts.append(rate * segment_ms // 1000)
                        payloads.append(
                            hashlib.sha256(
                                raw + i.to_bytes(4, "big")
                            ).digest()
                        )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "segment_idx": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(_segments, AUDIO_SEGMENT_SCHEMA)


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
