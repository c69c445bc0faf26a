"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` feature extractors.

The Spark-side plumbing is real and tested — schema contract, binary
payload column, Arrow batch shape, partition-preserving mapInPandas. The
actual media DECODE step is stubbed (this container has no image/audio
libraries): ``decode_image``/``decode_audio`` raise ``NotImplementedError``
with the intended signature, and ``binary_features`` computes deterministic
byte-level features (length + md5) through the same batch path so the
pipeline shape is exercised end-to-end.

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
    """Decode an image payload to an HxWxC numpy array via PIL when
    available; raises NotImplementedError otherwise (no imaging library
    in this container)."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError("image decode requires an imaging library (PIL/cv2); not available here")
    import io

    import numpy as np

    return np.asarray(Image.open(io.BytesIO(bytes(payload))))


def decode_audio(payload: bytes) -> Any:
    """Decode audio to a waveform array. STUB (no soundfile/librosa here)."""
    raise NotImplementedError("audio decode requires an audio library; not available here")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload via PIL when available (decode, resize,
    re-encode — the same shape a mapInPandas batch uses); raises
    NotImplementedError otherwise."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError("image resize requires an imaging library (PIL/cv2); not available here")
    import io

    img = Image.open(io.BytesIO(bytes(payload)))
    fmt = img.format or "PNG"
    out = io.BytesIO()
    img.resize((int(width), int(height))).save(out, format=fmt)
    return out.getvalue()


def frame_sample(payload: bytes, every_ms: int = 1000) -> Any:
    """Sample video frames. STUB (no ffmpeg/av here)."""
    raise NotImplementedError("video frame sampling requires ffmpeg/av; not available here")


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
