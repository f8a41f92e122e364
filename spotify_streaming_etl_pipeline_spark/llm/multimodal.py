"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for a 100 TB multimodal training table: media lives as an
opaque ``binary`` column (or an object-store pointer) beside a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes stream through Python in columnar batches —
never row-at-a-time, never through the driver.

The actual image/audio decode is STUBBED here (Pillow/librosa are not
in this container): ``decode_image`` raises NotImplementedError unless
PIL is importable, and ``extract_blob_features`` computes a
deterministic fake feature set (byte length, first byte, md5) so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
oracle-testable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("content_md5", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize the documents table as a multimodal-shaped table:
    text encoded to an opaque binary column + typed metadata struct.
    (In production the blob is real media; the shape is identical.)"""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(blob).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
        F.col("source"),
    )


def extract_blob_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    This is where a real pipeline decodes images / resamples audio /
    samples video frames per batch. Here the features are a
    deterministic function of the bytes (length, first byte, md5) so
    correctness is oracle-checkable; swap `_features_batch` internals
    for a real decoder without touching the Spark plan.
    """

    def _features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("doc_id", "blob").mapInPandas(
        _features_batch, schema=BLOB_FEATURE_SCHEMA
    )


def resize_blobs(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' every blob to a fixed payload size via mapInPandas —
    the plumbing shape of a real image-resize stage (Arrow batches in,
    binary column out, schema declared). The transform itself is a
    deterministic fake (truncate / zero-pad) because Pillow is absent;
    swap the inner function for `PIL.Image.resize` bytes unchanged."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_resize(b: bytes) -> bytes:
            b = bytes(b)[:target_bytes]
            return b + b"\x00" * (target_bytes - len(b))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": pdf["blob"].map(fake_resize),
                }
            )

    return media.select("doc_id", "blob").mapInPandas(
        _resize_batch,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("blob", BinaryType())]
        ),
    )


def decode_image(blob: bytes) -> object:
    """Real image decode — STUB. Pillow is not available in this
    container; the Spark-side plumbing above is the tested surface."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(blob))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires Pillow; not available in this environment"
        ) from exc


def sample_frames(blob: bytes, stride: int = 1024, max_frames: int = 8) -> list[bytes]:
    """Deterministic 'video frame sampling' stand-in: fixed-stride byte
    slices. A real implementation would seek keyframes via pyav; the
    call shape (bytes -> list of frame payloads) is what matters."""
    return [blob[off : off + stride] for off in range(0, min(len(blob), stride * max_frames), stride)]
