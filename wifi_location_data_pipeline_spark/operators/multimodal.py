"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The container has no codec LIBRARIES (PIL/librosa/pyav probed absent every
round), but two formats decode for REAL with the stdlib alone: PNG (zlib
inflate + chunk parse + full scanline unfilter) and 16-bit PCM WAV (the
``wave`` module) — exact pixel/sample statistics, verified against
ground-truth fixtures in tests/test_multimodal.py. Compressed formats that
genuinely need external codecs (jpeg/mp4/...) raise ``NotImplementedError``;
the "synthetic" format remains the deterministic oracle-checkable path the
registry queries use. Swapping in PIL/pyav later only changes the body of
``decode_payload``.

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


def _decode_png(payload: bytes) -> list[float]:
    """Real PNG decode with the stdlib only (zlib inflate + struct chunk
    parse + scanline unfilter, filters 0-4 per the PNG spec §9). Supports
    8-bit depth, color types 0/2/4/6, non-interlaced — the shapes real
    pipelines emit for training images. Returns
    [width, height, channels, mean, std, min, max, mean |horizontal diff|]
    over the decoded pixels (all in 0-255 space except dims).

    The unfilter runs in per-byte Python — fine for the narrow-map decode
    of test-sized fixtures; a production deployment swaps this body for a
    vectorized codec (PIL/libpng) without touching the Spark plumbing."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} unsupported"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    stride = w * nch
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline payload truncated")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, nch).astype(np.float64)
    hdiff = np.abs(np.diff(px, axis=1)).mean() if w > 1 else 0.0
    return [
        float(w), float(h), float(nch),
        float(px.mean()), float(px.std()),
        float(px.min()), float(px.max()), float(hdiff),
    ]


def _decode_wav(payload: bytes) -> list[float]:
    """Real WAV/PCM decode with the stdlib ``wave`` module. Returns
    [channels, sample_rate, n_frames, rms, peak, zero_crossing_rate,
    dc_offset, duration_s] over the decoded 16-bit samples."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        fr = wf.getframerate()
        nf = wf.getnframes()
        frames = wf.readframes(nf)
    if sw != 2:
        raise NotImplementedError(f"WAV sample width {sw} unsupported (16-bit only)")
    x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if len(x) == 0:
        return [float(nch), float(fr), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    return [
        float(nch), float(fr), float(nf),
        float(np.sqrt(np.mean(x * x))), float(np.abs(x).max()),
        zcr, float(x.mean()), nf / fr if fr else 0.0,
    ]


def decode_payload(fmt: str, media_type: str, payload: bytes) -> list[float]:
    """Byte-level decode to a FEATURE_DIM feature vector.

    Real format paths (stdlib codecs, no external libraries):
    - ``png``  → zlib/struct decode with full filter unrolling (_decode_png)
    - ``wav``  → ``wave`` module PCM decode (_decode_wav)
    - ``synthetic`` → deterministic content-hash fake (the oracle-checkable
      path the registry queries use)
    Other formats (mp4/jpeg/...) raise until their codec libraries are
    available; the surrounding Spark plumbing does not change when they are.
    """
    if fmt == "png":
        return _decode_png(payload)
    if fmt == "wav":
        return _decode_wav(payload)
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
