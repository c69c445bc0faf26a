"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` feature extractors.

The Spark-side plumbing is real and tested — schema contract, binary
payload column, Arrow batch shape, partition-preserving mapInPandas.
Decode is REAL for every format with a library-free public spec
(``operators/codecs.py``): BMP 24-bit, PPM/PGM, PNG (8-bit, stdlib
zlib + the five scanline filters — r10), PCM WAV (stdlib ``wave``),
and Y4M uncompressed video — decode_image / decode_audio /
resize_image / frame grabs all work on those payloads in this
container. The remaining compressed formats (JPEG/GIF via PIL, H.264
via ffmpeg, MP3 via an audio library) stay behind optional-import
seams that raise ``NotImplementedError``
until the library appears; ``binary_features`` computes deterministic
byte-level features (length + md5) through the same batch path so the
pipeline shape is exercised end-to-end on arbitrary payloads.

Scale notes: mapInPandas streams Arrow batches — constant memory per task,
no shuffle; feature extraction is embarrassingly parallel. Batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch; media payloads
should be size-bucketed (repartitionByRange on a size column) so batches
stay within executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),  # opaque media bytes
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image | audio | video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def _pil_image():
    """Optional PIL import: the sandbox ships no imaging library, but the
    decode path is live code the day one appears (tests skip cleanly
    until then)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes) -> Any:
    """Decode an image payload to an HxWxC numpy array. BMP (24-bit),
    PPM/PGM, and PNG (8-bit, all five scanline filters, palette
    expansion — stdlib zlib + numpy, ``operators/codecs.py``) decode
    natively; the remaining compressed formats (JPEG/GIF) go through
    PIL when available and raise NotImplementedError otherwise."""
    from mysql_to_s3_spark.operators import codecs

    kind = codecs.sniff_media(payload)
    if kind == "bmp":
        return codecs.decode_bmp(payload)
    if kind in ("ppm", "pgm"):
        return codecs.decode_ppm(payload)
    if kind == "png":
        return codecs.decode_png(payload)
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            f"image format {kind or 'unknown'} needs an imaging library (PIL/cv2); "
            "only BMP/PPM/PGM/PNG decode natively here"
        )
    import io

    import numpy as np

    return np.asarray(Image.open(io.BytesIO(bytes(payload))))


def decode_audio(payload: bytes) -> Any:
    """Decode audio to (waveform int16 array, sample_rate). PCM-16 WAV
    decodes natively (stdlib ``wave``); compressed codecs (MP3/OGG/FLAC)
    raise NotImplementedError until an audio library appears."""
    from mysql_to_s3_spark.operators import codecs

    if codecs.sniff_media(payload) == "wav":
        return codecs.decode_wav(payload)
    raise NotImplementedError(
        "compressed audio needs an audio library (soundfile/librosa); "
        "only PCM WAV decodes natively here"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload (decode, resize, re-encode in the SAME
    format — the shape a mapInPandas batch uses). BMP/PPM/PGM/PNG
    resize natively via integer nearest-neighbor (bit-deterministic
    across platforms); other formats go through PIL when available."""
    from mysql_to_s3_spark.operators import codecs

    kind = codecs.sniff_media(payload)
    if kind == "bmp":
        return codecs.encode_bmp(codecs.resize_nearest(codecs.decode_bmp(payload), width, height))
    if kind in ("ppm", "pgm"):
        return codecs.encode_ppm(codecs.resize_nearest(codecs.decode_ppm(payload), width, height))
    if kind == "png":
        # palette PNGs come back expanded to RGB — re-encoding as
        # truecolor preserves the pixels, which is the contract here
        return codecs.encode_png(
            codecs.resize_nearest(codecs.decode_png(payload), width, height)
        )
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            f"image format {kind or 'unknown'} needs an imaging library (PIL/cv2) to "
            "resize; only BMP/PPM/PGM/PNG resize natively here"
        )
    import io

    img = Image.open(io.BytesIO(bytes(payload)))
    fmt = img.format or "PNG"
    out = io.BytesIO()
    img.resize((int(width), int(height))).save(out, format=fmt)
    return out.getvalue()


def frame_sample(payload: bytes, every_ms: int = 1000) -> Any:
    """Sample video frames every ``every_ms``: returns an
    (n, H, W, 3) uint8 array. Y4M (uncompressed YUV4MPEG2) decodes
    natively; compressed containers (MP4/H.264) raise
    NotImplementedError until ffmpeg/av appears."""
    from mysql_to_s3_spark.operators import codecs

    if codecs.sniff_media(payload) != "y4m":
        raise NotImplementedError(
            "compressed video needs ffmpeg/av; only Y4M decodes natively here"
        )
    import numpy as np

    info = codecs.y4m_info(payload)
    frames = [
        codecs.y4m_frame_at(payload, ts)
        for ts in range(0, info["duration_ms"], int(every_ms))
    ]
    if not frames:  # zero-frame/zero-duration stream: empty, typed
        return np.empty((0, info["height"], info["width"], 3), dtype=np.uint8)
    return np.stack(frames)


def y4m_frame_grab(payload: bytes, ts_ms: int) -> bytes:
    """Real single-frame grab for ``sample_frames``: O(1)-seek the Y4M
    frame at ``ts_ms`` and return it as self-describing BMP bytes (so
    downstream image stages — decode_image, resize_images — compose).
    Non-Y4M payloads raise NotImplementedError (inject an ffmpeg-backed
    grab for compressed containers)."""
    from mysql_to_s3_spark.operators import codecs

    if codecs.sniff_media(payload) != "y4m":
        raise NotImplementedError(
            "compressed video needs ffmpeg/av; only Y4M frame grabs work natively here"
        )
    return codecs.encode_bmp(codecs.y4m_frame_at(payload, ts_ms))


def media_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from the documents fixture: the
    utf-8 bytes of the text stand in for an opaque media payload (the
    container ships no real media), with typed metadata."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def binary_features(df: DataFrame) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched mapInPandas —
    the same batch path a real decoder plugs into (swap `_featurize` for
    decode_image + a model forward pass)."""

    def _featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_featurize, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# distributed media stages (round 6): the ROW-EXPANDING frame-sample and
# the 1->1 resize as real mapInPandas plumbing. The decode kernels are
# injectable: the defaults are REAL for the library-free formats
# (Y4M grabs, BMP/PPM resize — operators/codecs.py) and raise the
# honest environment error INSIDE the executor for compressed formats;
# tests exercise both the real codecs and deterministic fakes (the
# latter pin the schema, the 1->N Arrow batch shape, the ordering
# contract, and the partition behavior independent of any payload
# format).

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_frame_decoder(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic stand-in for a real frame grab: 16 bytes that
    depend on (payload, timestamp) only — lets tests pin exact output
    without ffmpeg. Swap for an av/ffmpeg-backed callable in production."""
    return hashlib.md5(bytes(payload) + str(int(ts_ms)).encode()).digest()


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decoder=None,
    max_frames_per_video: int = 100_000,
) -> DataFrame:
    """Distributed video frame sampling: one (payload, media_meta) row
    becomes ceil(duration_ms / every_ms) frame rows (ts 0, every_ms,
    2*every_ms, ... < duration_ms; rows with null/zero duration emit
    nothing). ``decoder(payload, ts_ms) -> bytes`` extracts one frame;
    the default is ``y4m_frame_grab`` — REAL for uncompressed Y4M
    payloads (O(1) frame seek, BMP-encoded output), raising the
    environment NotImplementedError for compressed containers — inject
    an av/ffmpeg grab for those, or ``fake_frame_decoder`` to exercise
    the plumbing without any payload parsing.

    Scale shape: mapInPandas streams Arrow batches and EXPANDS rows
    (1 video -> N frames) without a shuffle or an explode of
    materialized frame arrays — frames never exist as one giant array
    column. Size-bucket upstream (repartitionByRange on a length
    column) so a batch of long videos fits executor memory;
    ``max_frames_per_video`` refuses (loudly) any single video whose
    expansion would blow the per-batch row budget."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    if max_frames_per_video <= 0:
        raise ValueError(f"max_frames_per_video must be positive, got {max_frames_per_video}")
    grab = decoder or y4m_frame_grab

    def _expand(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                dur = rec["duration_ms"]
                if dur is None or pd.isna(dur) or dur <= 0:
                    continue
                n_frames = -(-int(dur) // int(every_ms))
                if n_frames > max_frames_per_video:
                    # a 10-hour video at every_ms=1 would emit 36M rows
                    # inside ONE pandas batch — refuse loudly instead of
                    # OOMing the executor or silently truncating
                    raise ValueError(
                        f"doc {rec['doc_id']}: {n_frames} frames exceeds "
                        f"max_frames_per_video={max_frames_per_video}; raise the "
                        "cap or sample coarser (every_ms)"
                    )
                payload = rec["payload"]
                for i, ts in enumerate(range(0, int(dur), int(every_ms))):
                    rows.append(
                        {
                            "doc_id": rec["doc_id"],
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame": grab(payload, ts),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    slim = df.select(
        "doc_id", "payload", F.col("media_meta.duration_ms").alias("duration_ms")
    )
    return slim.mapInPandas(_expand, FRAME_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer=None,
) -> DataFrame:
    """Distributed 1->1 image resize: replaces ``payload`` with the
    resized bytes and stamps the new width/height into ``media_meta``.
    ``resizer(payload, w, h) -> bytes`` defaults to the PIL-gated
    ``resize_image`` (raises the environment NotImplementedError when
    no imaging library exists); inject a fake to test the plumbing."""
    rz = resizer or resize_image

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("kind", T.StringType()),
            T.StructField("mime", T.StringType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(lambda b: rz(b, width, height)),
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "duration_ms": pdf["duration_ms"],
                }
            )

    # meta fields ride THROUGH the Arrow stage (a join-back on doc_id
    # would add a shuffle to a purely per-row transform)
    slim = df.select(
        "doc_id",
        "payload",
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )
    return slim.mapInPandas(_resize, out_schema).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("kind"),
            F.col("mime"),
            F.lit(int(width)).alias("width"),
            F.lit(int(height)).alias("height"),
            F.col("duration_ms"),
        ).alias("media_meta"),
    )
