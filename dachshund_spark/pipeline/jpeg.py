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
# progressive (SOF2) encoder — spectral selection + successive
# approximation, single grayscale component (T.81 Annex G).  Exists to
# build real progressive fixtures; the decoder below is the general one.
# ---------------------------------------------------------------------------
# progressive AC scans need EOBn symbols ((r<<4)|0 for r<15) on top of
# the baseline set; sizes 1..10 cover 8-bit-precision coefficients
PROG_AC_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(11) if not (r < 15 and s == 0)] + [
    (r << 4) for r in range(15)
]


class _ScanWriter(_BitWriter):
    """BitWriter + the progressive AC state: EOBRUN accumulation and the
    buffered correction bits that ride along with the next emitted
    symbol (T.81 G.1.2.3 / libjpeg's BE buffer)."""

    def __init__(self, codes):
        super().__init__()
        self.codes = codes
        self.eobrun = 0
        self.pending = []  # buffered correction bits

    def sym(self, symbol: int) -> None:
        code, ln = self.codes[symbol]
        self.write(code, ln)

    def flush_pending(self) -> None:
        for b in self.pending:
            self.write(b, 1)
        self.pending = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.flush_pending()


def _encode_dc_scan(blocks, Ah: int, Al: int) -> bytes:
    """DC scan: first pass (Ah=0) codes diffs of the arithmetic-shifted
    DC sequence; refinement (Ah>0) emits one raw bit per block."""
    _, dc_codes = _huff_table(DC_SYMBOLS)
    w = _BitWriter()
    if Ah == 0:
        prev = 0
        for blk in blocks:
            v = blk[0] >> Al  # arithmetic shift per G.1.2.1
            diff = v - prev
            prev = v
            s = _category(diff)
            code, ln = dc_codes[s]
            w.write(code, ln)
            if s:
                w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    else:
        for blk in blocks:
            w.write((blk[0] >> Al) & 1, 1)
    return w.flush()


def _encode_ac_first(blocks, Ss: int, Se: int, Al: int) -> bytes:
    """AC first scan over band [Ss..Se]: baseline-style run/size coding
    of sign(v)·(|v|>>Al) with cross-block EOBRUN accumulation."""
    _, codes = _huff_table(PROG_AC_SYMBOLS)
    w = _ScanWriter(codes)
    for blk in blocks:
        band = [
            (-((-v) >> Al) if v < 0 else v >> Al) for v in
            (blk[k] for k in range(Ss, Se + 1))
        ]
        last = max((i for i, v in enumerate(band) if v), default=-1)
        if last < 0:
            w.eobrun += 1
            if w.eobrun == 0x7FFF:
                w.emit_eobrun()
            continue
        w.emit_eobrun()
        run = 0
        for i in range(last + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.sym(0xF0)
                run -= 16
            s = _category(v)
            w.sym((run << 4) | s)
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < Se - Ss:
            w.eobrun += 1
            if w.eobrun == 0x7FFF:
                w.emit_eobrun()
    w.emit_eobrun()
    return w.flush()


def _encode_ac_refine(blocks, Ss: int, Se: int, Al: int) -> bytes:
    """AC refinement scan (T.81 G.1.2.3): newly-significant coefficients
    (|v|>>Al == 1) are run-coded with a single sign bit; already-coded
    ones contribute correction bits ((|v|>>Al) & 1).

    Two correction-bit buffers with different flush points (the wire
    order the decoder consumes): ``br`` holds bits for history
    coefficients passed since the last symbol — flushed right AFTER the
    next symbol+sign (the decoder reads them while advancing to the new
    coefficient); ``w.pending`` (BE) holds bits saved with a pending
    EOBRUN — flushed after the EOBn symbol (the decoder reads them
    while skipping the EOB-covered blocks)."""
    _, codes = _huff_table(PROG_AC_SYMBOLS)
    w = _ScanWriter(codes)
    for blk in blocks:
        absvals = [abs(blk[k]) >> Al for k in range(Ss, Se + 1)]
        eob = max((i for i, v in enumerate(absvals) if v == 1), default=-1)
        run = 0
        br: list = []
        for i, temp in enumerate(absvals):
            if temp == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                w.emit_eobrun()
                w.sym(0xF0)
                run -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if temp > 1:
                br.append(temp & 1)
                continue
            w.emit_eobrun()
            w.sym((run << 4) | 1)
            w.write(1 if blk[Ss + i] >= 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            w.eobrun += 1
            w.pending.extend(br)
            if w.eobrun == 0x7FFF or len(w.pending) > 900:
                w.emit_eobrun()
    w.emit_eobrun()
    return w.flush()


# the scan schedule: DC approx + refine, two AC bands each approx + refine
PROG_SCHEDULE = (
    (0, 0, 0, 1),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
)


def _assemble_jpeg_progressive(width: int, height: int, scans) -> bytes:
    """SOF2 stream: DQT + SOF2 + DHT(DC, prog-AC) + one SOS per scan.
    ``scans`` = [(Ss, Se, Ah, Al, entropy_bytes)]."""
    dqt = bytes([0x00]) + bytes(QUANT[ZIGZAG[k]] for k in range(64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    dc_bits, _ = _huff_table(DC_SYMBOLS)
    ac_bits, _ = _huff_table(PROG_AC_SYMBOLS)
    out = (
        b"\xff\xd8"
        + _marker(0xDB, dqt)
        + _marker(0xC2, sof)
        + _marker(0xC4, bytes([0x00]) + bytes(dc_bits[1:]) + bytes(DC_SYMBOLS))
        + _marker(0xC4, bytes([0x10]) + bytes(ac_bits[1:]) + bytes(PROG_AC_SYMBOLS))
    )
    for Ss, Se, Ah, Al, scan in scans:
        sos = bytes([1, 1, 0x00, Ss, Se, (Ah << 4) | Al])  # DC id 0, AC id 0
        out += _marker(0xDA, sos) + scan
    return out + b"\xff\xd9"


def encode_jpeg_gray_progressive(width: int, height: int, pixels) -> bytes:
    """Progressive grayscale JPEG for images constant per 8×8 block
    (asserted), same losslessness argument as :func:`encode_jpeg_gray`:
    DC quantizer 8 stores g−128 exactly, and the Al=1→0 successive-
    approximation split reassembles it bit-exactly."""
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
            blk[0] = g - 128
            blocks.append(blk)
    return encode_jpeg_coeffs_progressive(width, height, blocks)


def encode_jpeg_coeffs_progressive(width: int, height: int, blocks) -> bytes:
    """Progressive encode of arbitrary quantized coefficient blocks
    (zigzag order each) through the full PROG_SCHEDULE — the test hook
    that exercises EOBRUN, ZRL-in-refinement and correction-bit
    buffering on nonzero-AC data."""
    scans = []
    for Ss, Se, Ah, Al in PROG_SCHEDULE:
        if Ss == 0 and Se == 0:
            scan = _encode_dc_scan(blocks, Ah, Al)
        elif Ah == 0:
            scan = _encode_ac_first(blocks, Ss, Se, Al)
        else:
            scan = _encode_ac_refine(blocks, Ss, Se, Al)
        scans.append((Ss, Se, Ah, Al, scan))
    return _assemble_jpeg_progressive(width, height, scans)


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


def _decode_dc_scan_prog(reader, table, blocks, Ah: int, Al: int) -> None:
    """Progressive DC scan over all blocks: first pass (Ah=0) is the
    baseline DC predictor on the Al-shifted values; refinement ORs in
    one raw bit per block (two's-complement semantics, which Python
    ints share with the spec)."""
    if Ah == 0:
        pred = 0
        for blk in blocks:
            s = _huff_decode(reader, table)
            diff = _extend(reader.read(s), s) if s else 0
            pred += diff
            blk[0] = pred << Al
    else:
        bit = 1 << Al
        for blk in blocks:
            if reader.read(1):
                blk[0] |= bit


def _decode_ac_first_prog(reader, table, blk, Ss, Se, Al, state) -> None:
    """Progressive AC first scan for one block (T.81 G.2 / EOBRUN
    semantics: an EOBn symbol covers this block plus state blocks)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = Ss
    while k <= Se:
        sym = _huff_decode(reader, table)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read(r)
                return
            k += 16  # ZRL
            continue
        k += r
        blk[k] = _extend(reader.read(s), s) * (1 << Al)
        k += 1


def _decode_ac_refine_prog(reader, table, blk, Ss, Se, Al, state) -> None:
    """Progressive AC refinement for one block: newly-significant
    coefficients arrive as run+sign symbols; every nonzero coefficient
    passed (including during EOB-covered blocks) consumes a correction
    bit."""
    p1, m1 = 1 << Al, -(1 << Al)
    k = Ss
    if state["eobrun"] == 0:
        while k <= Se:
            sym = _huff_decode(reader, table)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read(r)
                    break  # rest of the band handled by the EOB pass
                sval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                sval = p1 if reader.read(1) else m1
            while k <= Se:
                if blk[k] != 0:
                    if reader.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                blk[k] = sval
            k += 1
    if state["eobrun"] > 0:
        while k <= Se:
            if blk[k] != 0:
                if reader.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def decode_jpeg_gray(data: bytes):
    """General grayscale JPEG decoder: baseline (SOF0) and progressive
    (SOF2, spectral selection + successive approximation, T.81 Annex G).

    Returns ``(width, height, rows)`` with rows a list of lists of
    0..255 ints. Supports arbitrary DQT/DHT tables (redefinable between
    progressive scans), byte stuffing and any coefficient pattern;
    rejects multi-component / hierarchical / DRI streams explicitly.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff = {}
    width = height = None
    qtab_id = None
    progressive = False
    blocks = None  # per-block zigzag-order coefficient arrays
    saw_scan = False
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD8:  # standalone markers
            pos += 2
            continue
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
        elif tag in (0xC0, 0xC2):
            if body[0] != 8:
                raise ValueError("only 8-bit precision")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) supported")
            qtab_id = body[8]
            progressive = tag == 0xC2
            nblocks = ((width + 7) // 8) * ((height + 7) // 8)
            blocks = [[0] * 64 for _ in range(nblocks)]
        elif tag in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline SOF0 / progressive SOF2 supported")
        elif tag == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:
            if blocks is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-component scans supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            reader = _BitReader(data, pos)
            saw_scan = True
            if not progressive:
                dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
                prev_dc = 0
                for blk in blocks:
                    s = _huff_decode(reader, dct)
                    diff = _extend(reader.read(s), s) if s else 0
                    prev_dc += diff
                    blk[0] = prev_dc
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
                        blk[k] = _extend(reader.read(sz), sz)
                        k += 1
                break  # baseline: single scan
            if Ss == 0:
                if Se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                _decode_dc_scan_prog(reader, huff[(0, dc_id)], blocks, Ah, Al)
            else:
                state = {"eobrun": 0}
                act = huff[(1, ac_id)]
                for blk in blocks:
                    if Ah == 0:
                        _decode_ac_first_prog(reader, act, blk, Ss, Se, Al, state)
                    else:
                        _decode_ac_refine_prog(reader, act, blk, Ss, Se, Al, state)
            # skip padding bits, resync on the next marker
            pos = reader.pos
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] != 0x00
            ):
                pos += 1
        # APPn / COM / others: skipped
    if width is None or not saw_scan:
        raise ValueError("missing SOF/SOS")
    quant = qt[qtab_id]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    rows = [[0] * width for _ in range(height)]
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, bw)
        nat = [0] * 64
        for k in range(64):
            nat[ZIGZAG[k]] = blk[k] * quant[ZIGZAG[k]]
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


def make_progressive_jpeg_media(spark, n: int = 64, size: int = 16) -> DataFrame:
    """Real progressive-JPEG (SOF2) media fixture; 8×8 block (bx,by) of
    image ``media_id`` is the constant gray
    ``(id·19 + bx·31 + by·53) % 256`` — exactly recoverable from the
    multi-scan SOF2 bytes (see :func:`encode_jpeg_gray_progressive`),
    so a SQL oracle replays the formula with no decoding: the spectral-
    selection + successive-approximation machinery is what's pinned."""
    assert size % 8 == 0
    rows = []
    for mid in range(n):
        px = [
            [
                (mid * 19 + (x // 8) * 31 + (y // 8) * 53) % 256
                for x in range(size)
            ]
            for y in range(size)
        ]
        rows.append(
            (mid, encode_jpeg_gray_progressive(size, size, px), "image/jpeg", size, size)
        )
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
