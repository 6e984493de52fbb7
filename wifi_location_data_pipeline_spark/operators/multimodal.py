"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the byte-level decode is STUBBED:
``decode_payload`` raises ``NotImplementedError`` for real media formats and
provides a deterministic fake ("synthetic" format) so the Spark-side plumbing
— schema, partitioning, UDF signature, Arrow batch shape — is real and
testable end-to-end. Swapping in PIL/librosa/pyav later only changes the
body of ``decode_payload``.

Scale design:
- payloads stay in executor memory only for the duration of one Arrow batch;
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes.
- feature extraction is a narrow map (no shuffle); downstream groupBys shuffle
  only the small feature/metadata columns, never the payload.
- media tables should be written with the payload column LAST in the schema
  (parquet column pruning then skips the heavy bytes for metadata-only scans).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | synthetic
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("payload", T.BinaryType()),  # keep LAST: column pruning
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus.

    Stands in for a real ingest of image/audio/video blobs: the payload is
    the utf-8 text bytes; metadata is derived arithmetically from doc_id /
    n_chars so every run (and the DuckDB oracle) agrees.
    """
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.lit("synthetic").alias("format"),
        F.struct(
            (F.col("n_chars") % 640 + 64).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 48).cast("int").alias("height"),
            F.lit(16_000).cast("int").alias("sample_rate"),
            (F.col("n_chars").cast("long") * 40).alias("duration_ms"),
            (F.col("n_chars") % 120 + 1).cast("int").alias("n_frames"),
        ).alias("metadata"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_payload(fmt: str, media_type: str, payload: bytes) -> list[float]:
    """STUB decode: deterministic fake feature vector for 'synthetic' format.

    Real formats raise until codec libraries are available; the surrounding
    Spark plumbing does not change when they are.
    """
    if fmt != "synthetic":
        raise NotImplementedError(
            f"no codec for format={fmt!r} in this environment; "
            "install PIL/librosa/pyav and implement decode here"
        )
    digest = hashlib.sha256(payload).digest()
    # 8 doubles in [0, 1) from the content hash — a stand-in embedding
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def decode_media(media: DataFrame) -> DataFrame:
    """payload → (byte_size, sha256, feature[8]) via Arrow-batched mapInPandas.

    A narrow transformation: runs where the payload rows already live, no
    shuffle; only the compact decoded columns flow downstream.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_size": pdf["payload"].map(len).astype("int64"),
                    "content_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": [
                        decode_payload(f, t, p)
                        for f, t, p in zip(
                            pdf["format"], pdf["media_type"], pdf["payload"]
                        )
                    ],
                }
            )
            yield out

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per kept frame.

    The per-frame pixel decode is stubbed (synthetic frame ids only), but the
    explode shape — rows multiply by n_frames/every_nth, payload column is
    dropped BEFORE the explode so the shuffle carries no blobs — is the real
    scale-relevant part.
    """
    frames = media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.col("metadata.n_frames").alias("n_frames"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("metadata.n_frames") - 1) / every_nth).cast("int"),
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_id",
        (F.col("frame_idx") * every_nth).cast("int").alias("frame_no"),
        "n_frames",
    )
