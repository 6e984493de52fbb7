"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The container has no codec LIBRARIES (PIL/librosa/pyav probed absent every
round), but three formats decode for REAL with the stdlib (+NumPy) alone:
PNG (zlib inflate + chunk parse + full scanline unfilter), JPEG — both
BASELINE (SOF0) and PROGRESSIVE (SOF2: spectral-selection bands, EOB runs,
successive-approximation DC/AC refinement per ITU T.81 §G.1.2) — with
canonical Huffman entropy decode, byte stuffing, restart markers, exact
float IDCT, 4:2:x chroma upsampling and JFIF YCbCr->RGB, and 16-bit PCM
WAV (the ``wave`` module) — exact pixel/sample statistics, verified
against ground-truth fixtures (the JPEG tests hand-assemble real baseline
AND progressive bitstreams, including a 30-case randomized protocol
sweep, and compare against an independently computed reconstruction).
mp4 parses as an ISO BMFF CONTAINER walk (duration/track/sample-size
stats, no codec decode). What still raises ``NotImplementedError``
genuinely needs external codecs: the sample DATA inside mp4 (h264/aac)
and arithmetic-coded / hierarchical / lossless JPEG. The "synthetic"
format remains the deterministic oracle-checkable path the registry
queries use. Swapping in PIL/pyav later only changes the body of
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


def _png_pixels(payload: bytes):
    """Real PNG decode with the stdlib only (zlib inflate + struct chunk
    parse + scanline unfilter, filters 0-4 per the PNG spec §9). Supports
    8-bit depth, color types 0/2/4/6, non-interlaced — the shapes real
    pipelines emit for training images. Returns the decoded pixel array
    as np.uint8 of shape (h, w, channels).

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
    return out.reshape(h, w, nch)


def _decode_png(payload: bytes) -> list[float]:
    """PNG feature vector via ``_png_pixels``: [width, height, channels,
    mean, std, min, max, mean |horizontal diff|] over the decoded pixels
    (all in 0-255 space except dims)."""
    import numpy as np

    px = _png_pixels(payload).astype(np.float64)
    h, w, nch = px.shape
    hdiff = np.abs(np.diff(px, axis=1)).mean() if w > 1 else 0.0
    return [
        float(w), float(h), float(nch),
        float(px.mean()), float(px.std()),
        float(px.min()), float(px.max()), float(hdiff),
    ]


_PNG_CTYPE_BY_RESIDUE = (0, 2, 4, 6)  # gray, RGB, gray+alpha, RGBA
_PNG_NCH_BY_RESIDUE = (1, 3, 2, 4)


def synthesize_png_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic minimal-but-valid PNG derived from (doc_id, n_chars):
    pixel value v(y, x, c) = (doc_id % 251 + 3y + 5x + 11c) % 256 over a
    (doc_id % 8 + 3) x (n_chars % 12 + 4) image whose color type cycles
    through gray / RGB / gray+alpha / RGBA with doc_id % 4, and whose
    scanlines are FORWARD-FILTERED with filter type y % 5 — so one corpus
    pass exercises every unfilter branch (None/Sub/Up/Average/Paeth) of
    ``_png_pixels``. All statistics of the decoded pixels are integers
    with exact closed forms in (doc_id, n_chars); see
    multimodal_png_stats in plans/llm_queries.py."""
    import struct
    import zlib

    w = n_chars % 12 + 4
    h = doc_id % 8 + 3
    res = doc_id % 4
    ctype = _PNG_CTYPE_BY_RESIDUE[res]
    nch = _PNG_NCH_BY_RESIDUE[res]
    base = doc_id % 251
    stride = w * nch

    def v(y: int, x: int, c: int) -> int:
        return (base + 3 * y + 5 * x + 11 * c) % 256

    raw_rows = [
        bytes(v(y, x, c) for x in range(w) for c in range(nch)) for y in range(h)
    ]
    flt = bytearray()
    zero = bytes(stride)
    for y in range(h):
        f = y % 5
        cur, up = raw_rows[y], raw_rows[y - 1] if y > 0 else zero
        flt.append(f)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = up[i]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                c0 = up[i - nch] if i >= nch else 0
                pp = a + b - c0
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c0)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c0)
            flt.append((cur[i] - pred) & 0xFF)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(flt)))
        + chunk(b"IEND", b"")
    )


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_lut(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (JPEG Annex C): {(length, code) -> symbol}."""
    lut, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lut[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _TruncatedEntropyStream(ValueError):
    """A real marker interrupted the entropy segment mid-MCU (truncated or
    corrupt JPEG). A dedicated ValueError, NOT StopIteration: decode runs
    inside mapInPandas generators, where PEP 479 would otherwise surface a
    raised StopIteration as an opaque 'generator raised StopIteration'
    RuntimeError instead of a decode error."""


class _BitReader:
    """JPEG entropy-segment bit reader: honors 0xFF00 byte stuffing and
    stops (byte-aligned) at any real marker so the MCU loop can consume
    RSTn markers itself."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.bits, self.nbits = data, pos, 0, 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # real marker: unread and report the truncation
                    self.pos -= 1
                    raise _TruncatedEntropyStream(
                        "unexpected marker in JPEG entropy segment"
                    )
            self.bits, self.nbits = b, 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        self.bits = self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n % 8):
            raise ValueError("JPEG restart marker missing/mismatched")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_pixels(payload: bytes):
    """Real JPEG decode with the stdlib + NumPy only — BASELINE (SOF0) and
    PROGRESSIVE (SOF2): marker parse (DQT/DHT/SOF/SOS/DRI), canonical
    Huffman entropy decode with byte-stuffing and restart markers across
    ALL scans, spectral-selection bands and successive approximation
    (DC-first/DC-refine/AC-first-with-EOBRUN/AC-refine per ITU T.81 §G.1.2
    — the same public algorithms libjpeg implements), then one vectorized
    dequantize + zigzag + exact float IDCT pass over the accumulated
    coefficient store, 2x chroma upsampling and JFIF YCbCr->RGB.
    Grayscale and 3-component images with sampling factors 1 or 2
    (4:4:4 / 4:2:2 / 4:2:0). Arithmetic coding and hierarchical/lossless
    modes raise: those genuinely need a fuller codec.

    Returns the decoded (height, width, channels) uint8-range pixel array
    (rounded + clipped, the JPEG twin of ``_png_pixels``). Entropy decode
    runs in per-bit Python — fixture-scale honest; a deployment swaps the
    body for PIL/libjpeg without touching the Spark plumbing (same note
    as PNG)."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    w = h = 0
    restart = 0
    progressive = False
    hmax = vmax = mcux = mcuy = 0
    coefs: list = []  # per component: int32 (blocks_y, blocks_x, 64), ZIGZAG order
    pos = 2

    def alloc_after_sof() -> None:
        nonlocal hmax, vmax, mcux, mcuy, coefs
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        coefs = [
            np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32) for c in comps
        ]

    def decode_scan(br, scan, ss, se, ah, al) -> int:
        """Decode one scan's entropy segment; returns the stream position of
        the next marker. `scan` = [(comp_idx, dc_table, ac_table), ...]."""
        pred = [0] * len(comps)
        eobrun = 0
        dc_scan = ss == 0
        ac_scan_tbl = scan[0][2]

        def refine_tail(blk, k) -> None:
            # correction bits for the remaining already-nonzero band coefs
            delta = 1 << al
            while k <= se:
                if blk[k] != 0 and br.read_bit() and (int(blk[k]) & delta) == 0:
                    blk[k] += delta if blk[k] > 0 else -delta
                k += 1

        def decode_block(ci, by, bx, tdc, tac) -> None:
            nonlocal eobrun
            blk = coefs[ci][by, bx]
            if not progressive:
                # baseline: DC + full AC band in one visit, strict symbols
                t = br.decode_huff(hdc[tdc])
                pred[ci] += _extend(br.receive(t), t)
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = br.decode_huff(hac[tac])
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if rs == 0x00:
                            break  # EOB
                        if rs != 0xF0:
                            # runs 0x10..0xE0 with size 0 are invalid in
                            # baseline JPEG: reject, don't mask as EOB
                            raise ValueError(
                                f"invalid baseline JPEG AC symbol 0x{rs:02X}"
                            )
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    blk[k] = _extend(br.receive(sz), sz)
                    k += 1
                return
            if dc_scan and ah == 0:  # DC first
                t = br.decode_huff(hdc[tdc])
                pred[ci] += _extend(br.receive(t), t)
                blk[0] = pred[ci] << al
            elif dc_scan:  # DC refine: one appended bit per block
                if br.read_bit():
                    blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:  # AC first (with EOB runs)
                if eobrun > 0:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = br.decode_huff(hac[tac])
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past spectral band")
                    blk[k] = _extend(br.receive(sz), sz) << al
                    k += 1
            else:  # AC refine (correction bits, T.81 G.1.2.3)
                delta = 1 << al
                k = ss
                if eobrun > 0:
                    eobrun -= 1
                else:
                    while k <= se:
                        rs = br.decode_huff(hac[tac])
                        r, sz = rs >> 4, rs & 15
                        newval = 0
                        if sz == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # ZRL: skip 16 zero-history positions
                        else:
                            if sz != 1:
                                raise ValueError(
                                    "invalid JPEG AC refinement symbol"
                                )
                            newval = delta if br.read_bit() else -delta
                        while k <= se:
                            if blk[k] != 0:
                                if br.read_bit() and (int(blk[k]) & delta) == 0:
                                    blk[k] += delta if blk[k] > 0 else -delta
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if k <= se and newval:
                            blk[k] = newval
                        k += 1
                refine_tail(blk, k)

        unit_n = 0

        def maybe_restart() -> None:
            nonlocal eobrun, pred
            if restart and unit_n and unit_n % restart == 0:
                br.align_and_expect_rst(unit_n // restart - 1)
                pred = [0] * len(comps)
                eobrun = 0

        if len(scan) > 1 or (not progressive and len(comps) == 1):
            # interleaved MCU walk (multi-component scans; baseline
            # grayscale degenerates to the same 1x1 grid)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci, tdc, tac in scan:
                        _cid, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                decode_block(ci, my * cv + by, mx * ch + bx, tdc, tac)
                    unit_n += 1
        else:
            # non-interleaved: one component, its OWN (sub-sampled) block
            # grid including partial blocks (T.81 A.2.2)
            ci, tdc, tac = scan[0]
            _cid, ch, cv, _tq = comps[ci]
            cbx = ((w * ch + hmax - 1) // hmax + 7) // 8
            cby = ((h * cv + vmax - 1) // vmax + 7) // 8
            for by in range(cby):
                for bx in range(cbx):
                    maybe_restart()
                    decode_block(ci, by, bx, tdc, tac)
                    unit_n += 1
        # drop any partial byte; the caller resumes at the next marker
        return br.pos

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # spec-legal 0xFF fill bytes may pad before the marker id (B.1.1.2)
        while payload[pos + 1] == 0xFF:
            pos += 1
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = list(seg[s + 1 : s + 65])
                s += 65
        elif m == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                counts = list(seg[s + 1 : s + 17])
                n = sum(counts)
                lut = _huff_lut(counts, seg[s + 17 : s + 17 + n])
                (hdc if tc == 0 else hac)[th] = lut
                s += 17 + n
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = m == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = [
                (seg[6 + 3 * i], seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                for i in range(nc)
            ]
            alloc_after_sof()
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0} unsupported (baseline + progressive only)"
            )
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c[0] == cid)
                scan.append((ci, tabs >> 4, tabs & 15))
            ss, se, a4 = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a4 >> 4, a4 & 15
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("baseline JPEG scan must cover 0..63 at Ah=Al=0")
            pos = decode_scan(_BitReader(payload, pos + seglen), scan, ss, se, ah, al)
            continue
        pos += seglen
    if not comps:
        raise ValueError("JPEG missing SOF")

    # one vectorized dequantize + un-zigzag + exact-IDCT pass per component
    # (basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16))
    u = np.arange(8)
    A = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    A[0] *= 1 / np.sqrt(2)
    full = []
    for ci, c in enumerate(comps):
        q = np.array(qt[c[3]], dtype=np.float64)
        z = coefs[ci].astype(np.float64) * q[None, None, :]
        by, bx = z.shape[:2]
        nat = np.zeros((by, bx, 64))
        nat[:, :, _ZIGZAG] = z
        blocks = nat.reshape(by, bx, 8, 8)
        px = np.einsum("xu,ijuv,vy->ijxy", A.T, blocks, A) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c[2], axis=0), hmax // c[1], axis=1)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        px = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        px = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.round(px), 0, 255)


def _decode_jpeg(payload: bytes) -> list[float]:
    """JPEG feature vector via ``_jpeg_pixels``: same shape as
    ``_decode_png`` ([width, height, channels, mean, std, min, max,
    mean |horizontal diff|])."""
    import numpy as np

    px = _jpeg_pixels(payload)
    h, w, nch = px.shape
    hdiff = np.abs(np.diff(px, axis=1)).mean() if w > 1 else 0.0
    return [
        float(w), float(h), float(nch),
        float(px.mean()), float(px.std()),
        float(px.min()), float(px.max()), float(hdiff),
    ]


def synthesize_jpeg_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic minimal-but-valid BASELINE JPEG derived from
    (doc_id, n_chars) whose decoded pixels have an EXACT integer closed
    form — the JPEG twin of ``synthesize_png_payload``.

    Every 8x8 block carries a DC coefficient only, so the exact float
    IDCT of each block is the constant dc*q0/8 + 128; with the luma quant
    step q0 = 8 that is exactly dc + 128 (dyadic arithmetic, no rounding
    ambiguity). Chroma blocks are all-zero, so the chroma planes decode
    to exactly 128.0 and the JFIF YCbCr->RGB conversion degenerates to
    R = G = B = Y with zero float error. Decoded pixel:

        v(y, x, c) = 128 + ((doc_id*7 + 13*(y//8) + 29*(x//8)) % 241) - 120

    over a (doc_id % 19 + 4) x (n_chars % 21 + 4) image. (doc_id // 3) % 3
    picks grayscale / 4:2:0 color / 4:4:4 color — covering the
    interleaved-MCU walk for 1 and 3 components, chroma subsampling and
    upsampling, and MCU-boundary crop — and doc_id % 5 == 0 adds a DRI
    restart interval of 2 MCUs so RSTn resync and DC-predictor reset are
    exercised with exact expectations. Huffman tables are minimal
    canonical tables (12 four-bit DC size codes; a single one-bit AC EOB).
    See multimodal_jpeg_stats in plans/llm_queries.py for the oracle."""
    import struct

    w = n_chars % 21 + 4
    h = doc_id % 19 + 4
    mode = (doc_id // 3) % 3  # 0 gray, 1 color 4:2:0, 2 color 4:4:4
    restart = 2 if doc_id % 5 == 0 else 0

    def dc(by: int, bx: int) -> int:
        return (doc_id * 7 + 13 * by + 29 * bx) % 241 - 120

    # minimal canonical Huffman tables: DC sizes 0..11 as the 12 four-bit
    # codes 0..11; AC just EOB (symbol 0x00) as the one-bit code 0
    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    dc_syms = bytes(range(12))
    ac_counts = bytes([1] + [0] * 15)
    ac_syms = bytes([0])

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    # DQT: luma table 0 and chroma table 1, both with q[0] = 8 (the only
    # entry DC-only blocks touch; the rest are arbitrary nonzero)
    qtab = bytes([8] + [16] * 63)
    seg(0xDB, b"\x00" + qtab + b"\x01" + qtab)
    if mode == 0:
        comps = [(1, 1, 1, 0)]
    elif mode == 1:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([cid, (ch << 4) | cv, tq]) for cid, ch, cv, tq in comps
    )
    seg(0xC0, sof)
    seg(0xC4, b"\x00" + dc_counts + dc_syms + b"\x10" + ac_counts + ac_syms)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    seg(
        0xDA,
        bytes([len(comps)])
        + b"".join(bytes([cid, 0x00]) for cid, _, _, _ in comps)
        + b"\x00\x3f\x00",
    )

    # entropy segment: per MCU, each component's blocks get (DC size code,
    # DC magnitude bits, AC EOB); byte-stuffed; RSTn between intervals
    bits = 0
    nbits = 0

    def put(value: int, n: int) -> None:
        nonlocal bits, nbits
        bits = (bits << n) | (value & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            nbits -= 8
            b = (bits >> nbits) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)

    def align() -> None:
        if nbits:
            put((1 << (8 - nbits)) - 1, 8 - nbits)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                align()
                out.extend(bytes([0xFF, 0xD0 + (n_mcu // restart - 1) % 8]))
                pred = [0] * len(comps)
            for ci, (_cid, ch, cv, _tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        val = dc(my * cv + by, mx * ch + bx) if ci == 0 else 0
                        diff = val - pred[ci]
                        pred[ci] = val
                        t = abs(diff).bit_length()
                        put(t, 4)  # DC size symbol t = canonical code t
                        if t:
                            put(diff if diff > 0 else diff + (1 << t) - 1, t)
                        put(0, 1)  # AC EOB
            n_mcu += 1
    align()
    out.extend(b"\xff\xd9")
    return bytes(out)


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


def synthesize_wav_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic 16-bit PCM WAV derived from (doc_id, n_chars): a
    square wave whose amplitude, block period, channel count and frame
    count are arithmetic functions of the keys, so every audio statistic
    ``_decode_wav`` computes (RMS, peak, zero-crossing rate, DC offset,
    duration) has an EXACT closed form the DuckDB oracle predicts:

    - nch   = doc_id % 2 + 1 (mono/stereo; both channels carry the same
      sample, so interleaving doubles counts without changing signs)
    - nf    = n_chars % 400 + 50 frames at 8 kHz
    - amp   = (doc_id * 7 + 13) % 30000 + 1000 (int16-safe, never 0)
    - sign of frame i = + iff (i // p) % 2 == 0, p = n_chars % 9 + 3

    Exactness argument (why the oracle can match bit-for-bit): every
    sample is ±amp/2^15, a dyadic rational; partial sums in np.mean are
    integer multiples of it with numerators < 2^46, so the sums are
    exact and the final single IEEE division/sqrt is identical in both
    engines. See multimodal_wav_stats in plans/llm_queries.py."""
    import io
    import struct
    import wave

    nch = doc_id % 2 + 1
    nf = n_chars % 400 + 50
    amp = (doc_id * 7 + 13) % 30000 + 1000
    p = n_chars % 9 + 3
    frames = bytearray()
    for i in range(nf):
        s = amp if (i // p) % 2 == 0 else -amp
        frames += struct.pack("<h", s) * nch
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(bytes(frames))
    return buf.getvalue()


def synthesize_mp4_payload(doc_id: int, n_chars: int) -> bytes:
    """Deterministic minimal-but-valid ISO BMFF container derived from
    (doc_id, n_chars): ftyp + moov(mvhd + video trak with per-sample stsz
    [+ doc_id%2 audio traks with fixed-size stsz]) + mdat. The closed-form
    stats (duration = n_chars*40/1000 s, sample sizes
    (n_chars*(i+3)) % 241 + 16 for i in 0..n_chars%7+1, audio samples
    4x64 B per audio trak) are what the multimodal_mp4_stats oracle
    predicts arithmetically — building REAL container bytes here and
    re-deriving the stats through _parse_mp4 value-checks the parser
    end-to-end through Spark."""
    import struct

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    timescale, duration = 1000, n_chars * 40
    mvhd = b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80

    def trak(handler: bytes, sizes: list[int]) -> bytes:
        if sizes and len(set(sizes)) == 1:
            stsz = b"\x00" * 4 + struct.pack(">II", sizes[0], len(sizes))
        else:
            stsz = b"\x00" * 4 + struct.pack(">II", 0, len(sizes))
            stsz += struct.pack(f">{len(sizes)}I", *sizes)
        hdlr = box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)
        return box(
            b"trak", box(b"mdia", hdlr + box(b"minf", box(b"stbl", box(b"stsz", stsz))))
        )

    k = n_chars % 7 + 2
    vsizes = [(n_chars * (i + 3)) % 241 + 16 for i in range(k)]
    traks = trak(b"vide", vsizes)
    n_audio = doc_id % 2
    for _ in range(n_audio):
        traks += trak(b"soun", [64] * 4)
    moov = box(b"moov", box(b"mvhd", mvhd) + traks)
    total = sum(vsizes) + 64 * 4 * n_audio
    mdat = box(b"mdat", bytes([(doc_id + i) % 251 for i in range(total)]))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + mdat


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _parse_mp4(payload: bytes) -> list[float]:
    """ISO BMFF (mp4/mov) CONTAINER parse with the stdlib only: walks the
    box tree (ftyp / moov / mvhd / trak / mdia / hdlr / stbl / stsz /
    stz2-free sample tables / mdat, 32- and 64-bit box sizes) and returns
    duration, track, and sample-size statistics WITHOUT any codec decode —
    the metadata path a training-data manifest pipeline needs from video
    assets. The sample DATA itself (h264/h265/aac) still genuinely needs
    external codec libraries; this closes the container half of the gap
    the same way the PNG/JPEG/WAV work closed the image/audio half.

    Returns [duration_s, n_tracks, n_video_tracks, n_samples,
    mean_sample_bytes, max_sample_bytes, mdat_bytes, timescale]
    (FEATURE_DIM = 8, same contract as the other decoders)."""
    import struct

    if len(payload) < 8:
        raise ValueError("not an mp4 payload (too short)")
    stats = {
        "timescale": 0,
        "duration": 0,
        "n_tracks": 0,
        "n_video": 0,
        "sizes": [],
        "mdat": 0,
        "saw_moov": False,
    }

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    raise ValueError("mp4 largesize box truncated")
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            end = pos + size
            if size < 8 or end > hi:
                raise ValueError(f"mp4 box {typ!r} overruns its container")
            if typ in _MP4_CONTAINERS:
                if typ == b"moov":
                    stats["saw_moov"] = True
                if typ == b"trak":
                    stats["n_tracks"] += 1
                walk(body, end, depth + 1)
            elif typ == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", payload[body + 20 : body + 32])
                else:
                    ts, dur = struct.unpack(">II", payload[body + 12 : body + 20])
                stats["timescale"], stats["duration"] = ts, dur
            elif typ == b"hdlr":
                if payload[body + 8 : body + 12] == b"vide":
                    stats["n_video"] += 1
            elif typ == b"stsz":
                fixed, count = struct.unpack(">II", payload[body + 4 : body + 12])
                if fixed:
                    stats["sizes"].extend([fixed] * count)
                else:
                    tbl = payload[body + 12 : body + 12 + 4 * count]
                    if len(tbl) < 4 * count:
                        raise ValueError("mp4 stsz table truncated")
                    stats["sizes"].extend(struct.unpack(f">{count}I", tbl))
            elif typ == b"mdat":
                stats["mdat"] += end - body
            pos = end

    walk(0, len(payload))
    if not stats["saw_moov"]:
        raise ValueError("mp4 missing moov box")
    sizes = stats["sizes"]
    ts = stats["timescale"]
    return [
        stats["duration"] / ts if ts else 0.0,
        float(stats["n_tracks"]),
        float(stats["n_video"]),
        float(len(sizes)),
        float(sum(sizes)) / len(sizes) if sizes else 0.0,
        float(max(sizes)) if sizes else 0.0,
        float(stats["mdat"]),
        float(ts),
    ]


def decode_payload(fmt: str, media_type: str, payload: bytes) -> list[float]:
    """Byte-level decode to a FEATURE_DIM feature vector.

    Real format paths (stdlib codecs, no external libraries):
    - ``png``  → zlib/struct decode with full filter unrolling (_decode_png)
    - ``jpeg`` → baseline SOF0 + progressive SOF2 Huffman decode with
      exact float IDCT (_decode_jpeg)
    - ``wav``  → ``wave`` module PCM decode (_decode_wav)
    - ``mp4``  → ISO BMFF container metadata walk (_parse_mp4): duration /
      track / sample-size stats without codec decode
    - ``synthetic`` → deterministic content-hash fake (the oracle-checkable
      path the registry queries use)
    Codec-bound payloads inside known containers (h264 frames, progressive
    JPEG) raise until their codec libraries are available; the surrounding
    Spark plumbing does not change when they are.
    """
    if fmt == "png":
        return _decode_png(payload)
    if fmt in ("jpeg", "jpg"):
        return _decode_jpeg(payload)
    if fmt == "wav":
        return _decode_wav(payload)
    if fmt in ("mp4", "mov", "m4a"):
        return _parse_mp4(payload)
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
