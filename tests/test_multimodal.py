"""Multimodal plumbing: synthesis, Arrow-batched decode, frame sampling
(operators/multimodal.py). Codecs are stubbed; the Spark plumbing is real."""

import pytest
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    decode_payload,
    sample_frames,
    synthesize_media_from_documents,
)
from wifi_location_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema_and_determinism(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "format", "metadata", "payload",
    ]
    # payload column is LAST → metadata-only scans prune the blob column
    assert media.schema.fields[-1].dataType.simpleString() == "binary"
    counts = {r["media_type"]: r["n"] for r in
              media.groupBy("media_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}


def test_decode_media_roundtrip(media):
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == media.count()
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.select("media_id", "payload").collect()}
    import hashlib

    some = sorted(by_id)[:5]
    for mid in some:
        assert by_id[mid]["byte_size"] == len(src[mid]["payload"])
        assert by_id[mid]["content_sha256"] == hashlib.sha256(src[mid]["payload"]).hexdigest()
        assert len(by_id[mid]["feature"]) == 8
        assert all(0.0 <= v < 1.0 for v in by_id[mid]["feature"])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in decode_media(media).collect()}
    assert all(again[m] == by_id[m]["feature"] for m in some)


def test_decode_payload_stub_gates_unsupported_formats():
    with pytest.raises(NotImplementedError):
        decode_payload("mp4", "video", b"\x00\x00\x00\x18ftypmp42")


def _make_png(pixels, ctype=2, filters=None):
    """Hand-assemble a real PNG from an (h, w, ch) uint8 array — stdlib
    only, one scanline per filter type so the decoder's unfilter paths are
    all exercised against ground truth."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, nch = px.shape
    filters = filters or [0] * h

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def filt(line, prev, f):
        out = bytearray(line)
        if f == 1:
            for i in range(len(line) - 1, nch - 1, -1):
                out[i] = (line[i] - line[i - nch]) & 0xFF
        elif f == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(len(line)):
                a = line[i - nch] if i >= nch else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(len(line)):
                a = line[i - nch] if i >= nch else 0
                b, c = prev[i], (prev[i - nch] if i >= nch else 0)
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        return bytes(out)

    raw = b""
    prev = bytes(w * nch)
    for y, f in zip(range(h), filters):
        line = px[y].tobytes()
        raw += bytes([f]) + filt(line, prev, f)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(samples, rate=16_000, nch=1):
    """Real 16-bit PCM WAV via the stdlib wave writer."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_real_png_decode_through_spark(spark):
    """A REAL PNG (all five scanline filter types) decoded through the full
    decode_media path must report exact dimensions and pixel statistics."""
    import numpy as np

    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)
    payload = _make_png(px, ctype=2, filters=[0, 1, 2, 3, 4])
    rows = [
        (1, "image", "png",
         {"width": 7, "height": 5, "sample_rate": None,
          "duration_ms": None, "n_frames": None},
         bytearray(payload)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    f = out[1]["feature"]
    pxf = px.astype(float)
    assert f[0] == 7.0 and f[1] == 5.0 and f[2] == 3.0
    assert f[3] == pytest.approx(pxf.mean())
    assert f[4] == pytest.approx(pxf.std())
    assert f[5] == float(pxf.min()) and f[6] == float(pxf.max())
    assert f[7] == pytest.approx(np.abs(np.diff(pxf, axis=1)).mean())


def test_real_wav_decode_through_spark(spark):
    """A REAL 16-bit PCM WAV (440 Hz sine) decoded through decode_media
    must report exact frame counts, rate, and signal statistics."""
    import numpy as np

    rate, n = 8_000, 800
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * 440.0 * t) * 20_000).astype("<i2")
    payload = _make_wav(samples, rate=rate)
    rows = [
        (2, "audio", "wav",
         {"width": None, "height": None, "sample_rate": rate,
          "duration_ms": int(1000 * n / rate), "n_frames": None},
         bytearray(payload)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    f = out[2]["feature"]
    x = samples.astype(float) / 32768.0
    assert f[0] == 1.0 and f[1] == float(rate) and f[2] == float(n)
    assert f[3] == pytest.approx(np.sqrt(np.mean(x * x)))
    assert f[4] == pytest.approx(np.abs(x).max())
    assert f[7] == pytest.approx(n / rate)


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_nth=10)
    rows = frames.collect()
    assert rows, "video assets must produce sampled frames"
    assert all(r["frame_no"] % 10 == 0 for r in rows)
    assert all(r["frame_no"] < r["n_frames"] for r in rows)
    # payload never enters the exploded plan
    assert "payload" not in frames.columns


def test_png_codec_property_random_images():
    """Seeded property sweep (house style of tests/test_properties.py): 40
    random images across sizes 1x1..12x9, all four color types, random
    per-scanline filter choices — the stdlib decoder must recover exact
    pixels and statistics for every one."""
    import random

    import numpy as np

    from wifi_location_data_pipeline_spark.operators.multimodal import _decode_png

    rng = random.Random(20260815)
    for case in range(40):
        w = rng.randint(1, 12)
        h = rng.randint(1, 9)
        ctype = rng.choice([0, 2, 4, 6])
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        seed = rng.randint(0, 2**31 - 1)
        px = np.random.RandomState(seed).randint(0, 256, size=(h, w, nch)).astype(np.uint8)
        filters = [rng.choice([0, 1, 2, 3, 4]) for _ in range(h)]
        payload = _make_png(px, ctype=ctype, filters=filters)
        f = _decode_png(payload)
        pxf = px.astype(float)
        assert f[0] == float(w) and f[1] == float(h) and f[2] == float(nch), (case, filters)
        assert f[3] == pytest.approx(pxf.mean()), (case, filters)
        assert f[4] == pytest.approx(pxf.std()), (case, filters)
        assert f[5] == float(pxf.min()) and f[6] == float(pxf.max()), (case, filters)


def test_wav_codec_property_random_signals():
    """Seeded property sweep: random 16-bit PCM signals across rates,
    channel counts, and lengths — exact frame/statistics recovery."""
    import random

    import numpy as np

    from wifi_location_data_pipeline_spark.operators.multimodal import _decode_wav

    rng = random.Random(20260816)
    for case in range(25):
        rate = rng.choice([8000, 16000, 44100])
        nch = rng.choice([1, 2])
        n = rng.randint(1, 4000)
        samples = np.random.RandomState(case).randint(
            -32768, 32768, size=n * nch
        ).astype("<i2")
        payload = _make_wav(samples, rate=rate, nch=nch)
        f = _decode_wav(payload)
        x = samples.astype(float) / 32768.0
        assert f[0] == float(nch) and f[1] == float(rate) and f[2] == float(n), case
        assert f[3] == pytest.approx(np.sqrt(np.mean(x * x))), case
        assert f[4] == pytest.approx(np.abs(x).max()), case
        assert f[7] == pytest.approx(n / rate), case
