"""Multimodal plumbing: synthesis, Arrow-batched decode, frame sampling
(operators/multimodal.py). PNG, baseline+progressive JPEG, 16-bit WAV and
the mp4 container decode for REAL with the stdlib (+NumPy); this module
hand-assembles ground-truth bitstreams (including full progressive and
ISO BMFF encoders) and verifies exact statistics. Only the "synthetic"
format remains a deterministic content-hash stand-in."""

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
    # mp4 now parses as a container (see the mp4 tests below); formats with
    # no stdlib path at all still gate behind NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_payload("webm", "video", b"\x1a\x45\xdf\xa3")


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


# ---------------------------------------------------------------------------
# Baseline JPEG: hand-assembled encoder (test-side, stdlib+numpy) so the
# decoder is verified against independently computed ground truth — same
# strategy as _make_png. The encoder emits its OWN Huffman tables (every
# used symbol at code length 8), so no Annex K transcription is involved.
# ---------------------------------------------------------------------------


def _dct_basis():
    import numpy as np

    u = np.arange(8)
    A = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    A[0] *= 1 / np.sqrt(2)
    return A


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v):
    t, a = 0, abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def _encode_blocks(planes_blocks, q, restart_cols=0):
    """Entropy-encode per-MCU block lists; returns (dc_syms, ac_syms, body).

    planes_blocks: list of MCUs, each MCU a list of (comp_idx, coeff8x8).
    """
    import numpy as np

    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    # first pass: gather used symbols
    dc_syms, ac_syms = set(), set()
    ncomp = 1 + max(ci for mcu in planes_blocks for ci, _ in mcu)
    pred = [0] * ncomp
    tokens = []
    n_mcu = 0
    for mcu in planes_blocks:
        if restart_cols and n_mcu and n_mcu % restart_cols == 0:
            tokens.append(("RST", n_mcu // restart_cols - 1))
            pred = [0] * ncomp
        for ci, blk in mcu:
            z = blk.flatten()[zz].astype(int)
            diff = int(z[0]) - pred[ci]
            pred[ci] = int(z[0])
            t = _category(diff)
            dc_syms.add(t)
            tokens.append(("DC", t, diff))
            run = 0
            last_nz = max([k for k in range(1, 64) if z[k]] or [0])
            for k in range(1, 64):
                if k > last_nz:
                    ac_syms.add(0x00)
                    tokens.append(("AC", 0x00, 0))
                    break
                if z[k] == 0:
                    run += 1
                    continue
                while run >= 16:
                    ac_syms.add(0xF0)
                    tokens.append(("AC", 0xF0, 0))
                    run -= 16
                s = _category(int(z[k]))
                ac_syms.add((run << 4) | s)
                tokens.append(("AC", (run << 4) | s, int(z[k])))
                run = 0
        n_mcu += 1

    def table(symbols):
        syms = sorted(symbols)
        counts = [0] * 16
        counts[7] = len(syms)  # every symbol at code length 8
        codes = {s: (8, i) for i, s in enumerate(syms)}
        return counts, bytes(syms), codes

    dc_counts, dc_list, dc_codes = table(dc_syms)
    ac_counts, ac_list, ac_codes = table(ac_syms)
    bw = _BitWriter()
    for tok in tokens:
        if tok[0] == "RST":
            bw.align()
            bw.out += bytes([0xFF, 0xD0 + (tok[1] % 8)])
            continue
        kind, sym, val = tok
        ln, code = (dc_codes if kind == "DC" else ac_codes)[sym]
        bw.put(code, ln)
        t = sym & 15 if kind == "AC" else sym
        if t:
            bits = val if val >= 0 else val + (1 << t) - 1
            bw.put(bits, t)
    bw.align()
    return (dc_counts, dc_list), (ac_counts, ac_list), bytes(bw.out)


def _make_jpeg(pixels, subsample=False, q_val=16, restart_rows=False):
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    baseline JPEG. Returns (payload, reference_pixels) where the reference
    is the independently computed decode (quantize -> dequantize -> IDCT
    -> [upsample/color-convert] -> round/clip) this encoder implies."""
    import struct

    import numpy as np

    A = _dct_basis()
    px = np.asarray(pixels, dtype=np.float64)
    color = px.ndim == 3
    h, w = px.shape[:2]
    q = np.full(64, q_val, dtype=int)
    q[0] = max(1, q_val // 2)

    if color:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    else:
        comps = [px]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def plane_pad(p, ch, cv):
        # box-average downsample to the component grid, pad to MCU multiple
        if (ch, cv) != (hmax, vmax):
            fy, fx = vmax // cv, hmax // ch
            py = ((h + fy - 1) // fy) * fy
            pxw = ((w + fx - 1) // fx) * fx
            pp = np.pad(p, ((0, py - h), (0, pxw - w)), mode="edge")
            p = pp.reshape(py // fy, fy, pxw // fx, fx).mean(axis=(1, 3))
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    padded = [plane_pad(c, s[0], s[1]) for c, s in zip(comps, samp)]
    zzq = np.empty((8, 8))
    zzq.flat[[
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]] = q
    mcus, recon = [], [np.zeros_like(p) for p in padded]
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for ci, (p, (ch, cv)) in enumerate(zip(padded, samp)):
                for by in range(cv):
                    for bx in range(ch):
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round((A @ blk @ A.T) / zzq)
                        mcu.append((ci, coef))
                        recon[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                            A.T @ (coef * zzq) @ A + 128.0
                        )
            mcus.append(mcu)

    restart = mcux if restart_rows else 0
    (dc_counts, dc_list), (ac_counts, ac_list), body = _encode_blocks(
        mcus, q, restart_cols=restart
    )
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in q)
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (ch, cv) in enumerate(samp):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_counts) + dc_list
    dht += bytes([0x10]) + bytes(ac_counts) + ac_list
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += body + b"\xff\xd9"

    # independent reference reconstruction at full resolution
    full = []
    for p, (ch, cv) in zip(recon, samp):
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if color:
        yy, cbb, crr = full[0], full[1] - 128.0, full[2] - 128.0
        ref = np.stack(
            [yy + 1.402 * crr, yy - 0.344136 * cbb - 0.714136 * crr, yy + 1.772 * cbb],
            axis=2,
        )
    else:
        ref = full[0][:, :, None]
    return bytes(out), np.clip(np.round(ref), 0, 255)


def _assert_jpeg_features(pixels, **kw):
    import numpy as np

    payload, ref = _make_jpeg(pixels, **kw)
    feats = decode_payload("jpeg", "image", payload)
    h, w = np.asarray(pixels).shape[:2]
    hdiff = np.abs(np.diff(ref, axis=1)).mean() if w > 1 else 0.0
    expect = [
        float(w), float(h), float(ref.shape[2]),
        float(ref.mean()), float(ref.std()),
        float(ref.min()), float(ref.max()), float(hdiff),
    ]
    assert feats == pytest.approx(expect, abs=1e-9), (feats, expect)
    # a JPEG at this quantization must stay near the source image
    assert abs(feats[3] - np.asarray(pixels, dtype=float).mean()) < 8.0


def test_jpeg_grayscale_decode_matches_reference():
    """Baseline grayscale SOF0, non-multiple-of-8 dims (padding + crop)."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(17, 24), dtype=np.uint8)
    _assert_jpeg_features(img)


def test_jpeg_color_420_with_restart_markers():
    """3-component 4:2:0 with DRI/RSTn every MCU row: exercises chroma
    upsampling, YCbCr->RGB, byte stuffing, and restart resync."""
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 33, 3), dtype=np.uint8)
    _assert_jpeg_features(img, subsample=True, restart_rows=True)


def test_jpeg_color_444_smooth_gradient():
    import numpy as np

    x = np.linspace(0, 255, 32)
    img = np.stack(np.meshgrid(x, np.linspace(40, 200, 16))[0:2] + [np.full((16, 32), 99.0)], axis=2
    ).astype(np.uint8)
    _assert_jpeg_features(img, q_val=8)


def _image_coefficients(pixels, subsample=False, q_val=16):
    """Quantized zigzag coefficient store + independent reference decode for
    a grayscale/RGB image — the shared front half of the baseline and
    progressive test encoders."""
    import numpy as np

    A = _dct_basis()
    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    px = np.asarray(pixels, dtype=np.float64)
    color = px.ndim == 3
    h, w = px.shape[:2]
    q = np.full(64, q_val, dtype=int)
    q[0] = max(1, q_val // 2)
    if color:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        comps = [px]
        samp = [(1, 1)]
    hmax = max(s0 for s0, _ in samp)
    vmax = max(s1 for _, s1 in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def plane_pad(p, ch, cv):
        if (ch, cv) != (hmax, vmax):
            fy, fx = vmax // cv, hmax // ch
            py = ((h + fy - 1) // fy) * fy
            pxw = ((w + fx - 1) // fx) * fx
            pp = np.pad(p, ((0, py - h), (0, pxw - w)), mode="edge")
            p = pp.reshape(py // fy, fy, pxw // fx, fx).mean(axis=(1, 3))
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    padded = [plane_pad(c, s0, s1) for c, (s0, s1) in zip(comps, samp)]
    zzq = np.empty(64)
    zzq[zz] = q  # natural-order quant from the zigzag table
    zzq = zzq.reshape(8, 8)
    coefs, recon = [], []
    for p, (ch, cv) in zip(padded, samp):
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        cz = np.zeros((nby, nbx, 64), dtype=int)
        rc = np.zeros_like(p)
        for by in range(nby):
            for bx in range(nbx):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.round((A @ blk @ A.T) / zzq)
                cz[by, bx] = coef.flatten()[zz].astype(int)
                rc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    A.T @ (coef * zzq) @ A + 128.0
                )
        coefs.append(cz)
        recon.append(rc)
    full = []
    for rc, (ch, cv) in zip(recon, samp):
        rc = np.repeat(np.repeat(rc, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(rc[:h, :w])
    if color:
        yy, cbb, crr = full[0], full[1] - 128.0, full[2] - 128.0
        ref = np.stack(
            [yy + 1.402 * crr, yy - 0.344136 * cbb - 0.714136 * crr, yy + 1.772 * cbb],
            axis=2,
        )
    else:
        ref = full[0][:, :, None]
    return q, samp, (h, w, hmax, vmax, mcux, mcuy), coefs, np.clip(np.round(ref), 0, 255)


class _ProgWriter(_BitWriter):
    """Per-scan symbol writer: gathers symbols first, then encodes with an
    8-bit flat Huffman table (same table() scheme as the baseline encoder)."""


def _prog_scan_tokens_to_bytes(tokens, need_dc, need_ac):
    dc_syms = sorted({t[1] for t in tokens if t[0] == "DC"})
    ac_syms = sorted({t[1] for t in tokens if t[0] == "AC"})

    def table(syms):
        counts = [0] * 16
        counts[7] = len(syms)
        return counts, bytes(syms), {s: (8, i) for i, s in enumerate(syms)}

    dhts = b""
    dc_codes = ac_codes = None
    import struct

    if need_dc and dc_syms:
        c, lst, dc_codes = table(dc_syms)
        dhts += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(lst)) + bytes([0x00]) + bytes(c) + lst
    if need_ac and ac_syms:
        c, lst, ac_codes = table(ac_syms)
        dhts += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(lst)) + bytes([0x10]) + bytes(c) + lst
    bw = _BitWriter()
    for tok in tokens:
        kind = tok[0]
        if kind == "RAW":
            bw.put(tok[1], 1)
            continue
        _, sym, nbits, bits = tok
        codes = dc_codes if kind == "DC" else ac_codes
        ln, code = codes[sym]
        bw.put(code, ln)
        if nbits:
            bw.put(bits, nbits)
    bw.align()
    return dhts, bytes(bw.out)


def _make_progressive_jpeg(
    pixels, subsample=False, q_val=16, al_dc=0, al_ac=0, bands=((1, 5), (6, 63))
):
    """Encode a REAL progressive (SOF2) JPEG: interleaved DC-first scan,
    per-component AC band scans with EOB runs (spectral selection), and —
    when al_dc/al_ac > 0 — successive-approximation refinement scans
    (raw-bit DC refine; AC refine with buffered correction bits per ITU
    T.81 G.1.2.3). Returns (payload, reference_pixels) with the same
    independent reference decode as the baseline encoder."""
    import struct

    q, samp, (h, w, hmax, vmax, mcux, mcuy), coefs, ref = _image_coefficients(
        pixels, subsample, q_val
    )
    ncomp = len(samp)

    def comp_grid(ci):
        ch, cv = samp[ci]
        cbx = ((w * ch + hmax - 1) // hmax + 7) // 8
        cby = ((h * cv + vmax - 1) // vmax + 7) // 8
        return cby, cbx

    scans = []  # (scan_comps, ss, se, ah, al, tokens, need_dc, need_ac)

    # --- DC first scan: interleaved, point transform = arithmetic shift
    toks = []
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        v = int(coefs[ci][my * cv + by, mx * ch + bx, 0]) >> al_dc
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = _category(diff)
                        bits = diff if diff >= 0 else diff + (1 << t) - 1
                        toks.append(("DC", t, t, bits))
    scans.append((list(range(ncomp)), 0, 0, 0, al_dc, toks, True, False))

    # --- AC first scans: per component, per band, with EOB runs
    def pt_ac(v, al):
        return (v >> al) if v >= 0 else -((-v) >> al)

    for ci in range(ncomp):
        cby, cbx = comp_grid(ci)
        for ss, se in bands:
            toks = []
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    toks.append(("AC", r << 4, r, eobrun - (1 << r)))
                    eobrun = 0

            for by in range(cby):
                for bx in range(cbx):
                    z = coefs[ci][by, bx]
                    run = 0
                    wrote = False
                    for k in range(ss, se + 1):
                        v = pt_ac(int(z[k]), al_ac)
                        if v == 0:
                            run += 1
                            continue
                        flush_eob()
                        while run > 15:
                            toks.append(("AC", 0xF0, 0, 0))
                            run -= 16
                        t = _category(v)
                        bits = v if v >= 0 else v + (1 << t) - 1
                        toks.append(("AC", (run << 4) | t, t, bits))
                        run = 0
                        wrote = True
                    if run > 0 or not wrote:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
            flush_eob()
            scans.append(([ci], ss, se, 0, al_ac, toks, False, True))

    # --- DC refinement scans: one raw bit per block, interleaved
    for al in range(al_dc - 1, -1, -1):
        toks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    ch, cv = samp[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            bit = (int(coefs[ci][my * cv + by, mx * ch + bx, 0]) >> al) & 1
                            toks.append(("RAW", bit))
        scans.append((list(range(ncomp)), 0, 0, al + 1, al, toks, False, False))

    # --- AC refinement scans (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine)
    for al in range(al_ac - 1, -1, -1):
        for ci in range(ncomp):
            cby, cbx = comp_grid(ci)
            for ss, se in bands:
                toks = []
                eobrun = 0
                be_bits: list[int] = []  # correction bits buffered across EOB blocks

                def flush_eob_refine():
                    nonlocal eobrun
                    if eobrun or be_bits:
                        r = max(eobrun, 1).bit_length() - 1 if eobrun else 0
                        if eobrun:
                            r = eobrun.bit_length() - 1
                            toks.append(("AC", r << 4, r, eobrun - (1 << r)))
                        for b in be_bits:
                            toks.append(("RAW", b))
                        be_bits.clear()
                        eobrun = 0

                for by in range(cby):
                    for bx in range(cbx):
                        z = coefs[ci][by, bx]
                        absv = [pt_ac(abs(int(z[k])), al) for k in range(64)]
                        eob = 0
                        for k in range(ss, se + 1):
                            if absv[k] == 1:
                                eob = k
                        run = 0
                        br_bits: list[int] = []  # this block's pending corrections
                        for k in range(ss, se + 1):
                            t = absv[k]
                            if t == 0:
                                run += 1
                                continue
                            # ZRLs are emitted on REACHING any nonzero coef
                            # (history included) so buffered correction bits
                            # stay in positional order — unless the run can
                            # fold into the EOB (k > eob)
                            while run > 15 and k <= eob:
                                flush_eob_refine()
                                toks.append(("AC", 0xF0, 0, 0))
                                toks.extend(("RAW", b) for b in br_bits)
                                br_bits.clear()
                                run -= 16
                            if t > 1:  # history coefficient: correction bit
                                br_bits.append(t & 1)
                                continue
                            # newly nonzero (+-1 at this bit position)
                            flush_eob_refine()
                            toks.append(("AC", (run << 4) | 1, 0, 0))
                            toks.append(("RAW", 1 if int(z[k]) > 0 else 0))
                            toks.extend(("RAW", b) for b in br_bits)
                            br_bits.clear()
                            run = 0
                        if run > 0 or br_bits:
                            eobrun += 1
                            be_bits.extend(br_bits)
                            if eobrun == 0x7FFF:
                                flush_eob_refine()
                flush_eob_refine()
                scans.append(([ci], ss, se, al + 1, al, toks, False, True))

    # --- assemble the stream
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (ch, cv) in enumerate(samp):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for scan_comps, ss, se, ah, al, toks, need_dc, need_ac in scans:
        dhts, body = _prog_scan_tokens_to_bytes(toks, need_dc, need_ac)
        out += dhts
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += body
    out += b"\xff\xd9"
    return bytes(out), ref


def _assert_progressive_features(pixels, **kw):
    import numpy as np

    payload, ref = _make_progressive_jpeg(pixels, **kw)
    feats = decode_payload("jpeg", "image", payload)
    h, w = np.asarray(pixels).shape[:2]
    assert feats[0] == float(w) and feats[1] == float(h)
    expect = [
        float(w), float(h), float(ref.shape[2]),
        float(ref.mean()), float(ref.std()),
        float(ref.min()), float(ref.max()),
        float(np.abs(np.diff(ref, axis=1)).mean()) if w > 1 else 0.0,
    ]
    assert feats == pytest.approx(expect, abs=1e-9), (feats, expect)


def test_jpeg_progressive_spectral_selection_grayscale():
    """SOF2 with spectral selection only (DC scan + two AC band scans with
    EOB runs), non-multiple-of-8 dims."""
    import numpy as np

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(21, 26), dtype=np.uint8)
    _assert_progressive_features(img)


def test_jpeg_progressive_spectral_selection_color_420():
    """3-component 4:2:0 progressive: interleaved DC scan + per-component
    non-interleaved AC band scans over each component's OWN block grid."""
    import numpy as np

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(24, 33, 3), dtype=np.uint8)
    _assert_progressive_features(img, subsample=True)


def test_jpeg_progressive_successive_approximation_grayscale():
    """Full successive approximation: DC first at Al=1 + raw-bit DC refine,
    AC first at Al=1 + AC refinement scan with buffered correction bits."""
    import numpy as np

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    _assert_progressive_features(img, al_dc=1, al_ac=1)


def test_jpeg_progressive_successive_approximation_color():
    import numpy as np

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(17, 18, 3), dtype=np.uint8)
    _assert_progressive_features(img, al_dc=2, al_ac=1)


def test_jpeg_progressive_smooth_gradient_heavy_eobruns():
    """A smooth gradient quantizes to long EOB runs across blocks —
    exercises multi-block EOBRUN encode/decode and refinement of runs."""
    import numpy as np

    x = np.linspace(0, 255, 40)
    img = np.tile(x, (24, 1)).astype(np.uint8)
    _assert_progressive_features(img, al_ac=1, al_dc=1, q_val=24)


def test_jpeg_unsupported_sof_rejected():
    import struct

    # SOF3 (lossless) and SOF9 (arithmetic) must still raise
    for sof in (0xC3, 0xC9):
        payload = (
            b"\xff\xd8" + bytes([0xFF, sof]) + struct.pack(">H", 11)
            + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )
        with pytest.raises(NotImplementedError):
            decode_payload("jpeg", "image", payload)


def test_jpeg_fill_bytes_before_marker_tolerated():
    """B.1.1.2: any number of 0xFF fill bytes may pad before a marker id —
    the parser must skip them, not misparse the segment length."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload, ref = _make_jpeg(img)
    # inject fill bytes before the DQT marker id (after SOI)
    padded = payload[:2] + b"\xff\xff\xff" + payload[2:]
    assert padded[2:4] != payload[2:4]
    feats = decode_payload("jpeg", "image", padded)
    assert feats == decode_payload("jpeg", "image", payload)


def test_jpeg_truncated_entropy_raises_value_error():
    """A marker interrupting the entropy stream mid-MCU must surface as a
    ValueError — NOT StopIteration, which PEP 479 would convert into an
    opaque RuntimeError inside the mapInPandas decode generator."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload, _ = _make_jpeg(img)
    # cut the entropy segment short: drop the last 12 bytes before EOI and
    # splice EOI directly after a partial MCU
    truncated = payload[:-14] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_payload("jpeg", "image", truncated)


def test_jpeg_invalid_ac_symbol_rejected():
    """AC run/size symbols with size 0 other than EOB (0x00) and ZRL (0xF0)
    are invalid in baseline JPEG and must be rejected, not masked as EOB."""
    from wifi_location_data_pipeline_spark.operators.multimodal import (
        _BitReader,
        _huff_lut,
    )

    # single-code table mapping the shortest code to symbol 0x10 (run=1,size=0)
    lut = _huff_lut([1] + [0] * 15, bytes([0x10]))
    br = _BitReader(b"\x00\x00", 0)
    sym = br.decode_huff(lut)
    assert sym == 0x10  # the table itself decodes; the MCU loop must reject


# ---------------------------------------------------------------------------
# mp4 container parser (ISO BMFF metadata walk, no codec decode)
# ---------------------------------------------------------------------------


def _box(typ: bytes, body: bytes, largesize: bool = False) -> bytes:
    import struct

    if largesize:
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + typ + body


def _make_mp4(sample_sizes, timescale=1000, duration=4500, n_audio_tracks=0,
              mvhd_v1=False, largesize_mdat=False):
    import struct

    if mvhd_v1:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration
        ) + b"\x00" * 80
    else:
        mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(
            ">II", timescale, duration
        ) + b"\x00" * 80

    def trak(handler, sizes):
        if sizes and len(set(sizes)) == 1:
            stsz = b"\x00" * 4 + struct.pack(">II", sizes[0], len(sizes))
        else:
            stsz = b"\x00" * 4 + struct.pack(">II", 0, len(sizes))
            stsz += struct.pack(f">{len(sizes)}I", *sizes)
        stbl = _box(b"stsz", stsz)
        minf = _box(b"stbl", stbl)
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)
        mdia = _box(b"mdia", hdlr + _box(b"minf", minf))
        return _box(b"trak", mdia)

    moov = _box(b"moov", _box(b"mvhd", mvhd)
                + trak(b"vide", sample_sizes)
                + b"".join(trak(b"soun", [64] * 4) for _ in range(n_audio_tracks)))
    total = sum(sample_sizes) + 64 * 4 * n_audio_tracks
    mdat_body = bytes(total % 251 for _ in range(total))
    mdat = _box(b"mdat", mdat_body, largesize=largesize_mdat)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + mdat


def test_mp4_container_metadata_walk():
    sizes = [120, 340, 90, 510]
    payload = _make_mp4(sizes, timescale=1000, duration=4500)
    dur_s, n_trk, n_vid, n_smp, mean_b, max_b, mdat_b, ts = decode_payload(
        "mp4", "video", payload
    )
    assert dur_s == 4.5
    assert n_trk == 1 and n_vid == 1
    assert n_smp == len(sizes)
    assert mean_b == sum(sizes) / len(sizes)
    assert max_b == max(sizes)
    assert mdat_b == sum(sizes)
    assert ts == 1000


def test_mp4_v1_mvhd_fixed_stsz_multi_track_largesize():
    payload = _make_mp4([256] * 10, timescale=90_000, duration=90_000 * 3,
                        n_audio_tracks=2, mvhd_v1=True, largesize_mdat=True)
    dur_s, n_trk, n_vid, n_smp, mean_b, max_b, mdat_b, ts = decode_payload(
        "mp4", "video", payload
    )
    assert dur_s == 3.0
    assert n_trk == 3 and n_vid == 1
    assert n_smp == 10 + 2 * 4  # fixed-size video stsz + two audio tracks
    assert max_b == 256 and ts == 90_000


def test_mp4_corrupt_rejected():
    with pytest.raises(ValueError):
        decode_payload("mp4", "video", b"\x00\x00")  # too short
    with pytest.raises(ValueError):
        # ftyp only, no moov
        decode_payload("mp4", "video", _box(b"ftyp", b"isom"))
    with pytest.raises(ValueError):
        # box overruns its container
        import struct

        bad = struct.pack(">I", 4096) + b"moov" + b"\x00" * 8
        decode_payload("mp4", "video", bad)


def test_jpeg_progressive_property_random_images():
    """Seeded property sweep: random images across sizes, color/grayscale,
    subsampling, quant strengths, band splits, and successive-approximation
    depths — decode must match the independent reference exactly for every
    combination (the EOBRUN / correction-bit protocol corners are
    data-dependent, so breadth matters more than single fixtures)."""
    import random

    import numpy as np

    rng = random.Random(20260815)
    nrg = np.random.default_rng(20260815)
    for case in range(30):
        w = rng.randint(1, 40)
        h = rng.randint(1, 30)
        color = rng.random() < 0.5
        size = (h, w, 3) if color else (h, w)
        img = nrg.integers(0, 256, size=size, dtype=np.uint8)
        kw = dict(
            subsample=color and rng.random() < 0.5,
            q_val=rng.choice([8, 16, 28]),
            al_dc=rng.randint(0, 2),
            al_ac=rng.randint(0, 2),
            bands=rng.choice([((1, 5), (6, 63)), ((1, 63),), ((1, 2), (3, 9), (10, 63))]),
        )
        try:
            _assert_progressive_features(img, **kw)
        except AssertionError as e:
            raise AssertionError(f"case {case}: {size} {kw}") from e


def test_mp4_property_random_containers():
    """Seeded property sweep over random container shapes: track counts,
    per-sample vs fixed stsz, 64-bit mdat sizes, v0/v1 mvhd — the box walk
    must recover the exact stats for every combination."""
    import random

    rng = random.Random(20260815)
    for case in range(25):
        k = rng.randint(1, 40)
        sizes = [rng.randint(1, 5000) for _ in range(k)]
        if rng.random() < 0.3:
            sizes = [sizes[0]] * k  # fixed-size stsz arm
        ts = rng.choice([600, 1000, 90_000])
        dur = rng.randint(0, 10 * ts)
        n_audio = rng.randint(0, 3)
        payload = _make_mp4(
            sizes, timescale=ts, duration=dur, n_audio_tracks=n_audio,
            mvhd_v1=rng.random() < 0.5, largesize_mdat=rng.random() < 0.3,
        )
        dur_s, n_trk, n_vid, n_smp, mean_b, max_b, mdat_b, tsc = decode_payload(
            "mp4", "video", payload
        )
        all_sizes = sizes + [64] * (4 * n_audio)
        assert dur_s == dur / ts, case
        assert n_trk == 1 + n_audio and n_vid == 1, case
        assert n_smp == len(all_sizes), case
        assert mean_b == sum(all_sizes) / len(all_sizes), case
        assert max_b == max(all_sizes), case
        assert mdat_b == sum(all_sizes), case
        assert tsc == ts, case


def test_wav_synthesized_square_wave_closed_form():
    """synthesize_wav_payload -> _decode_wav must reproduce the closed-form
    statistics the multimodal_wav_stats oracle predicts, BIT-FOR-BIT: the
    square wave's samples are dyadic rationals, so RMS/peak/ZCR/DC have
    exact arithmetic forms in (doc_id, n_chars). Seeded sweep over random
    keys, mono and stereo arms both exercised."""
    import random

    from wifi_location_data_pipeline_spark.operators.multimodal import (
        synthesize_wav_payload,
    )

    rng = random.Random(20260815)
    for case in range(200):
        doc_id = rng.randrange(0, 10**7)
        n_chars = rng.randrange(0, 10**5)
        nch = doc_id % 2 + 1
        nf = n_chars % 400 + 50
        amp = (doc_id * 7 + 13) % 30000 + 1000
        p = n_chars % 9 + 3
        nb, r = nf // p, nf % p
        cnt_plus = p * ((nb + 1) // 2) + (r if nb % 2 == 0 else 0)
        got = decode_payload("wav", "audio", synthesize_wav_payload(doc_id, n_chars))
        want = [
            float(nch), 8000.0, float(nf),
            amp / 32768.0, amp / 32768.0,
            float((nf - 1) // p) / float(nf * nch - 1),
            float((2 * cnt_plus - nf) * nch) * (amp / 32768.0) / float(nf * nch),
            float(nf) / 8000.0,
        ]
        assert got == want, (case, doc_id, n_chars, got, want)


def test_png_synthesized_all_filters_round_trip():
    """synthesize_png_payload forward-filters scanlines with type y % 5 and
    cycles all four supported color types, so decoding a handful of keys
    exercises every unfilter branch; the decoded pixels must equal the
    closed-form lattice the multimodal_png_stats oracle unnests."""
    import random

    import numpy as np

    from wifi_location_data_pipeline_spark.operators.multimodal import (
        _PNG_NCH_BY_RESIDUE,
        _png_pixels,
        synthesize_png_payload,
    )

    rng = random.Random(20260815)
    for case in range(120):
        doc_id = rng.randrange(0, 10**7)
        n_chars = rng.randrange(0, 10**5)
        px = _png_pixels(synthesize_png_payload(doc_id, n_chars)).astype(np.int64)
        h, w, nch = px.shape
        assert (h, w, nch) == (
            doc_id % 8 + 3, n_chars % 12 + 4, _PNG_NCH_BY_RESIDUE[doc_id % 4]
        ), case
        yy, xx, cc = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(nch), indexing="ij"
        )
        want = (doc_id % 251 + 3 * yy + 5 * xx + 11 * cc) % 256
        assert (px == want).all(), (case, doc_id, n_chars)


def test_jpeg_synthesized_dc_only_round_trip():
    """synthesize_jpeg_payload emits DC-only baseline JPEGs whose decoded
    pixels have an exact integer closed form (luma quant step 8, neutral
    chroma). A seeded sweep must cover all three component modes
    (grayscale / 4:2:0 / 4:4:4) and both restart settings, and every
    decoded pixel must equal the lattice the multimodal_jpeg_stats oracle
    evaluates."""
    import random

    import numpy as np

    from wifi_location_data_pipeline_spark.operators.multimodal import (
        _jpeg_pixels,
        synthesize_jpeg_payload,
    )

    rng = random.Random(20260816)
    seen_modes, seen_restart = set(), set()
    for case in range(120):
        doc_id = rng.randrange(0, 10**7)
        n_chars = rng.randrange(0, 10**5)
        mode = (doc_id // 3) % 3
        seen_modes.add(mode)
        seen_restart.add(doc_id % 5 == 0)
        px = _jpeg_pixels(synthesize_jpeg_payload(doc_id, n_chars)).astype(np.int64)
        h, w, nch = px.shape
        assert (h, w, nch) == (
            doc_id % 19 + 4, n_chars % 21 + 4, 1 if mode == 0 else 3
        ), case
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        want = 128 + (doc_id * 7 + 13 * (yy // 8) + 29 * (xx // 8)) % 241 - 120
        assert (px == want[:, :, None]).all(), (case, doc_id, n_chars, mode)
    assert seen_modes == {0, 1, 2} and seen_restart == {True, False}
