"""Real baseline-JPEG decode path (pure stdlib) — third modality.

The container has no PIL/libjpeg, so the codec here is written from the
JPEG spec (ITU T.81 baseline, grayscale): the encoder emits a genuine
JFIF stream (DQT / SOF0 / DHT / SOS markers, canonical Huffman entropy
coding, 0xFF byte-stuffing) and the decoder is a *general* baseline
grayscale decoder — marker parse, Huffman decode of all 64
coefficients with DC prediction, dequantization, zigzag reorder, full
2-D IDCT, level shift.

Oracle trick (same as the PNG path, `multimodal.make_png_media`): the
fixture images are constant per 8×8 block. The DCT of a constant block
has only a DC coefficient, 8·(g−128); with DC quantizer 8 the stored
value is g−128 *exactly*, so the decode is lossless and a SQL oracle
can predict every output integer from the block formula without ever
touching JPEG bytes — while the Spark side recovers them from actual
entropy-coded JPEG streams. The decoder's Huffman/IDCT machinery is
additionally exercised on nonzero-AC blocks in tests against an
independent naive IDCT.

Reference parity note: the reference repo has no media decode at all —
this module (with multimodal.py) is engine-addition surface for the
multimodal-pipeline requirement.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame

# zigzag position -> natural (row-major) index, per T.81 Figure A.6
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Quant table (natural order): DC step 8 makes constant-block images
# exactly representable; AC step 16 is arbitrary (fixture ACs are 0).
QUANT = [8] + [16] * 63

# Every Huffman symbol gets an 8-bit canonical code (codes 0..n-1; with
# n < 255 no code is all ones, as T.81 requires). Fat but valid — the
# decoder must handle arbitrary DHT tables anyway.
DC_SYMBOLS = list(range(12))  # DC size categories 0..11
AC_SYMBOLS = [0x00, 0xF0] + [  # EOB, ZRL, then the full (run<<4|size) set
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _huff_table(symbols):
    """bits[1..16] counts + canonical code map for all-8-bit codes."""
    bits = [0] * 17
    bits[8] = len(symbols)
    codes = {sym: (i, 8) for i, sym in enumerate(symbols)}
    return bits, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_scan(coeff_blocks) -> bytes:
    """Entropy-code quantized coefficient blocks (zigzag order each)."""
    _, dc_codes = _huff_table(DC_SYMBOLS)
    _, ac_codes = _huff_table(AC_SYMBOLS)
    w = _BitWriter()
    prev_dc = 0
    for blk in coeff_blocks:
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        s = _category(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
        for i in range(1, last_nz + 1):
            v = blk[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]
            w.write(code, ln)
    return w.flush()


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg_gray(width: int, height: int, pixels) -> bytes:
    """Baseline grayscale JPEG for images constant per 8×8 block
    (asserted) — the only images our quant table stores losslessly."""
    assert width % 8 == 0 and height % 8 == 0
    blocks = []
    for by in range(height // 8):
        for bx in range(width // 8):
            g = pixels[by * 8][bx * 8]
            assert all(
                pixels[by * 8 + yy][bx * 8 + xx] == g
                for yy in range(8)
                for xx in range(8)
            ), "encoder fixture requires constant 8x8 blocks"
            blk = [0] * 64
            blk[0] = g - 128  # DC = 8*(g-128), quantizer 8 -> exact
            blocks.append(blk)
    return _assemble_jpeg(width, height, _encode_scan(blocks))


def _assemble_jpeg(width: int, height: int, scan: bytes) -> bytes:
    dqt = bytes([0x00]) + bytes(QUANT[ZIGZAG[k]] for k in range(64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dc_bits, _ = _huff_table(DC_SYMBOLS)
    ac_bits, _ = _huff_table(AC_SYMBOLS)
    dht_dc = bytes([0x00]) + bytes(dc_bits[1:]) + bytes(DC_SYMBOLS)
    dht_ac = bytes([0x10]) + bytes(ac_bits[1:]) + bytes(AC_SYMBOLS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _marker(0xDB, dqt)
        + _marker(0xC0, sof)
        + _marker(0xC4, dht_dc)
        + _marker(0xC4, dht_ac)
        + _marker(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError("hit marker inside entropy data")
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v


def _build_decode_table(bits, symbols):
    """DHT bits/huffval -> {(length, code): symbol} canonical map."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, s: int) -> int:
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct2(coeffs):
    """Naive separable 2-D IDCT (T.81 A.3.3) + level shift + clamp."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[x][u]
                for v in range(8):
                    f = coeffs[v * 8 + u]
                    if f:
                        s += _C[v] * cu * _COS[y][v] * f
            tmp[y][x] = s / 4.0
    return [
        [min(255, max(0, round(tmp[y][x] + 128))) for x in range(8)]
        for y in range(8)
    ]


def decode_jpeg_gray(data: bytes):
    """General baseline grayscale JPEG decoder.

    Returns ``(width, height, rows)`` with rows a list of lists of
    0..255 ints. Supports arbitrary DQT/DHT tables, byte stuffing and
    any coefficient pattern; rejects progressive/multi-component/DRI
    streams explicitly.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff = {}
    width = height = None
    dc_id = ac_id = None
    qtab_id = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if tag == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(body[b + 1 : b + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qt[tq] = nat
                b += 65
        elif tag == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = [0] + list(body[b + 1 : b + 17])
                n = sum(bits)
                syms = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, syms)
                b += 17 + n
        elif tag == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit precision")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) baseline")
            qtab_id = body[8]
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline SOF0 supported")
        elif tag == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            break
        # APPn / COM / others: skipped
    if width is None or dc_id is None:
        raise ValueError("missing SOF/SOS")
    reader = _BitReader(data, pos)
    dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
    quant = qt[qtab_id]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    rows = [[0] * width for _ in range(height)]
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            s = _huff_decode(reader, dct)
            diff = _extend(reader.read(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(reader, act)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                sz = sym & 0xF
                zz[k] = _extend(reader.read(sz), sz)
                k += 1
            nat = [0] * 64
            for k in range(64):
                nat[ZIGZAG[k]] = zz[k] * quant[ZIGZAG[k]]
            px = _idct2(nat)
            for yy in range(8):
                y = by * 8 + yy
                if y >= height:
                    break
                for xx in range(min(8, width - bx * 8)):
                    rows[y][bx * 8 + xx] = px[yy][xx]
    return width, height, rows


# ---------------------------------------------------------------------------
# Spark fixture + feature extraction
# ---------------------------------------------------------------------------
def make_jpeg_media(spark, n: int = 64, size: int = 16) -> DataFrame:
    """Real-JPEG media fixture; 8×8 block (bx,by) of image ``media_id``
    is the constant gray ``(id·17 + bx·29 + by·47) % 256`` — exactly
    recoverable from the JPEG bytes (see module docstring), so a SQL
    oracle replays the formula with no decoding."""
    assert size % 8 == 0
    nb = size // 8
    rows = []
    for mid in range(n):
        px = [
            [
                (mid * 17 + (x // 8) * 29 + (y // 8) * 47) % 256
                for x in range(size)
            ]
            for y in range(size)
        ]
        rows.append((mid, encode_jpeg_gray(size, size, px), "image/jpeg", size, size))
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, width int, height int",
    )


JPEG_FEATURES_SCHEMA = (
    "media_id long, width int, height int, sum_gray long, min_gray int, "
    "max_gray int"
)


def decode_jpeg_features(media: DataFrame) -> DataFrame:
    """REAL JPEG decode (stdlib baseline codec) → exact integer pixel
    stats via Arrow-batched ``mapInPandas``; every output is an
    integer, so the whole Huffman→dequant→IDCT chain is
    oracle-checkable against the fixture formula."""

    def _feat(payload: bytes) -> tuple:
        w, h, rows = decode_jpeg_gray(bytes(payload))
        flat = [v for r in rows for v in r]
        return w, h, sum(flat), min(flat), max(flat)

    def batches(it):
        for pdf in it:
            feats = [_feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "sum_gray": [f[2] for f in feats],
                    "min_gray": [f[3] for f in feats],
                    "max_gray": [f[4] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=JPEG_FEATURES_SCHEMA
    )
