"""Pure-stdlib baseline JPEG codec (r7, VERDICT r6 item 4).

The third REAL media format in this container (after BMP r5 and PNG
r6): baseline sequential DCT JPEG — the dominant format of any crawl
corpus — decodes genuinely with nothing but ``struct`` and ``math``:
marker parse → canonical Huffman entropy decode (byte-unstuffing,
restart markers) → dequantize → de-zigzag → separable float IDCT →
level shift. Output is the LUMA plane (JPEG's Y channel IS BT.601
luma), matching the grayscale contract of decode_bmp/decode_png in
operators/multimodal.py.

Scope, stated loudly:
- baseline sequential (SOF0) and extended sequential (SOF1) with one
  interleaved scan — what cameras/libjpeg default to;
- progressive (SOF2), hierarchical, arithmetic-coded and multi-scan
  files raise ``ValueError`` with the marker name (the caller's
  fallback contract, never a wrong image);
- the encoder writes single-component (grayscale) baseline JPEG for
  fixtures and round-trip tests — quality-scaled Annex-K luminance
  quantization, single-length canonical Huffman tables (valid DHT:
  12 DC symbols at 4 bits, all 162 AC symbols at 8 bits; the all-ones
  code stays unassigned per T.81 C.2).

Performance note: this runs inside Arrow-batched ``mapInPandas``
workers (operators/multimodal.py), one image per call — a pure-Python
IDCT decodes a thumbnail-sized image in ~ms, which is the media-stub
contract here; a production deployment swaps in PIL/libjpeg-turbo via
the existing ``have_pil()`` probe without touching any plan shape.
"""

from __future__ import annotations

import math
import struct

# -- shared tables -----------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.1 luminance quantization (quality 50 base)
QUANT_LUMA_K1 = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# separable DCT basis: COS[u][x] = C(u) * cos((2x+1) u pi / 16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _quality_scale(quality: int) -> list[int]:
    """libjpeg-style quality scaling of the Annex-K table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (v * scale + 50) // 100)) for v in QUANT_LUMA_K1]


# -- canonical Huffman -------------------------------------------------------


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) -> symbol, per T.81 C.2 canonical generation."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(bits, huffval).items()
    }


# encoder's fixed tables: every symbol at ONE length keeps generation
# trivially canonical; the all-1-bits code word stays unassigned
ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
ENC_DC_VALS = list(range(12))
ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


# -- bit I/O -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, length: int, code: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write(pad, (1 << pad) - 1)  # pad with 1-bits (T.81 F.1.2.3)


class _BitReader:
    """Entropy-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # RST/EOI encountered

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            else:
                # a real marker terminates the segment; decoding past it
                # is a bug in the caller
                raise ValueError(
                    f"hit marker FF{nxt:02X} inside entropy data" if nxt is not None
                    else "truncated JPEG entropy data"
                )
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (restart interval)."""
        self._acc = 0
        self._n = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = d[self.pos + 1]
        if m != 0xD0 + (n % 8):
            raise ValueError(f"expected RST{n % 8}, got FF{m:02X}")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


# -- encoder (grayscale baseline, for fixtures/round-trips) -----------------


def _fdct_quant(block: list[float], quant: list[int]) -> list[int]:
    # rows then cols (separable); block is 64 level-shifted floats
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            tmp[y * 8 + u] = sum(
                block[y * 8 + x] * _COS[u][x] for x in range(8)
            )
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            f = 0.25 * sum(_COS[v][y] * tmp[y * 8 + u] for y in range(8))
            out[v * 8 + u] = int(round(f / quant[v * 8 + u]))
    return out


def encode_jpeg(
    w: int, h: int, gray: bytes, quality: int = 90,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down grayscale pixels as a single-component baseline
    sequential JPEG (SOF0). Lossy: round-trip error is bounded by the
    quality-scaled quantization table. ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (resilience structure real
    camera files carry — and the decoder path it exercises)."""
    if len(gray) != w * h:
        raise ValueError(f"gray length {len(gray)} != {w}*{h}")
    quant = _quality_scale(quality)
    dc_tab = _build_encode_table(ENC_DC_BITS, ENC_DC_VALS)
    ac_tab = _build_encode_table(ENC_AC_BITS, ENC_AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, values in zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(quant[ZIGZAG[i]] for i in range(64))
    # SOF0: 8-bit, 1 component (id 1, sampling 1x1, quant 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    # DHT: DC class 0 id 0, AC class 1 id 0
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(ENC_DC_VALS))
    out += b"\x00" + bytes(ENC_DC_BITS) + bytes(ENC_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(ENC_AC_VALS))
    out += b"\x10" + bytes(ENC_AC_BITS) + bytes(ENC_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    bw = _BitWriter()
    pred = 0
    mcu_n = 0
    rst_n = 0
    bx_count = (w + 7) // 8
    by_count = (h + 7) // 8
    for by in range(by_count):
        for bx in range(bx_count):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                pred = 0
            mcu_n += 1
            block = [0.0] * 64
            for y in range(8):
                sy = min(by * 8 + y, h - 1)  # edge replication
                for x in range(8):
                    sx = min(bx * 8 + x, w - 1)
                    block[y * 8 + x] = gray[sy * w + sx] - 128.0
            coef = _fdct_quant(block, quant)
            zz = [coef[ZIGZAG[i]] for i in range(64)]
            # DC
            diff = zz[0] - pred
            pred = zz[0]
            s = _category(diff)
            ln, code = dc_tab[s]
            bw.write(ln, code)
            if s:
                bw.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
            # AC
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_tab[0xF0]  # ZRL
                    bw.write(ln, code)
                    run -= 16
                s = _category(zz[k])
                ln, code = ac_tab[(run << 4) | s]
                bw.write(ln, code)
                bw.write(s, zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1)
                run = 0
            if run:
                ln, code = ac_tab[0x00]  # EOB
                bw.write(ln, code)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder (baseline sequential, interleaved scan) -------------------------


def _idct(coef: list[int]) -> list[int]:
    """Separable float IDCT + level shift + clamp; coef in natural
    (row-major) order, already dequantized."""
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            tmp[v * 8 + x] = sum(_COS[u][x] * coef[v * 8 + u] for u in range(8))
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.25 * sum(_COS[v][y] * tmp[v * 8 + x] for v in range(8))
            p = int(round(s)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode baseline sequential JPEG to (w, h, top-down grayscale
    bytes) — the luma plane; chroma components are entropy-decoded (the
    bitstream demands it) but not reconstructed. Raises ValueError on
    anything that is not a single-interleaved-scan baseline file."""
    d = data
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, hs, vs, tq), ...])

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", d[pos : pos + 2])[0]
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[i + 2 * j : i + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    i += 128
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = vals[k]
                quant[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended seq
            _prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG (SOF marker FF{marker:02X}: progressive/"
                "hierarchical/arithmetic — baseline sequential only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                raise ValueError(
                    "unsupported JPEG: non-interleaved multi-scan file"
                )
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                d, pos + seglen, frame, quant, huff_dc, huff_ac, sel,
                restart_interval,
            )
        # APPn/COM/others: skip
        pos += seglen
    raise ValueError("truncated JPEG (no SOS)")


def _decode_scan(d, pos, frame, quant, huff_dc, huff_ac, sel, ri):
    fw, fh, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # luma plane (component 0) dimensions in blocks
    c0 = comps[0]
    pw, ph = mcux * c0[1] * 8, mcuy * c0[2] * 8
    plane = bytearray(pw * ph)
    preds = {cid: 0 for cid, *_ in comps}
    br = _BitReader(d, pos)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_n and mcu_n % ri == 0:
                br.align_and_expect_rst(mcu_n // ri - 1)
                preds = {cid: 0 for cid, *_ in comps}
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dct = huff_dc[sel[cid][0]]
                act = huff_ac[sel[cid][1]]
                qt = quant[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0] * 64
                        s = br.decode_huff(dct)
                        diff = _extend(br.receive(s), s) if s else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        if ci == 0:  # luma: reconstruct pixels
                            coef = [0] * 64
                            for k2 in range(64):
                                coef[ZIGZAG[k2]] = zz[k2] * qt[ZIGZAG[k2]]
                            px = _idct(coef)
                            ox = (mx * hs + bx) * 8
                            oy = (my * vs + by) * 8
                            for y in range(8):
                                row = (oy + y) * pw + ox
                                plane[row : row + 8] = bytes(
                                    px[y * 8 : y * 8 + 8]
                                )
            mcu_n += 1
    # crop the luma plane to the frame size (scaled by its sampling)
    lw = (fw * c0[1] + hmax - 1) // hmax
    lh = (fh * c0[2] + vmax - 1) // vmax
    out = bytearray(lw * lh)
    for y in range(lh):
        out[y * lw : (y + 1) * lw] = plane[y * pw : y * pw + lw]
    return lw, lh, bytes(out)


def encode_jpeg_420(
    w: int, h: int, gray: bytes, quality: int = 90
) -> bytes:
    """Encode as a THREE-component 4:2:0 JPEG (Y at 2x2 sampling, flat
    neutral chroma) — the layout virtually every camera/libjpeg file
    uses, and the decoder path a single-component fixture never
    exercises: interleaved MCUs of 4 Y blocks + Cb + Cr, per-component
    DC predictors, luma placement at sampling factors > 1."""
    if len(gray) != w * h:
        raise ValueError(f"gray length {len(gray)} != {w}*{h}")
    quant = _quality_scale(quality)
    dc_tab = _build_encode_table(ENC_DC_BITS, ENC_DC_VALS)
    ac_tab = _build_encode_table(ENC_AC_BITS, ENC_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(quant[ZIGZAG[i]] for i in range(64))
    # SOF0: Y id 1 sampling 2x2, Cb id 2 and Cr id 3 at 1x1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(ENC_DC_VALS))
    out += b"\x00" + bytes(ENC_DC_BITS) + bytes(ENC_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(ENC_AC_VALS))
    out += b"\x10" + bytes(ENC_AC_BITS) + bytes(ENC_AC_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}

    def emit_block(zz: list[int], cid: int) -> None:
        diff = zz[0] - preds[cid]
        preds[cid] = zz[0]
        s = _category(diff)
        ln, code = dc_tab[s]
        bw.write(ln, code)
        if s:
            bw.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_tab[0xF0]
                bw.write(ln, code)
                run -= 16
            s = _category(zz[k])
            ln, code = ac_tab[(run << 4) | s]
            bw.write(ln, code)
            bw.write(s, zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1)
            run = 0
        if run:
            ln, code = ac_tab[0x00]
            bw.write(ln, code)

    zero_block = [0] * 64
    mcux = (w + 15) // 16
    mcuy = (h + 15) // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):  # 4 luma blocks per MCU
                for bx in range(2):
                    block = [0.0] * 64
                    oy, ox = (my * 2 + by) * 8, (mx * 2 + bx) * 8
                    for y in range(8):
                        sy = min(oy + y, h - 1)
                        for x in range(8):
                            sx = min(ox + x, w - 1)
                            block[y * 8 + x] = gray[sy * w + sx] - 128.0
                    coef = _fdct_quant(block, quant)
                    emit_block([coef[ZIGZAG[i]] for i in range(64)], 1)
            emit_block(zero_block, 2)  # neutral Cb (128 -> all zeros)
            emit_block(zero_block, 3)  # neutral Cr
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
