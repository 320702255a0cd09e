"""Baseline JFIF (JPEG) codec in pure numpy/stdlib — a REAL decoder and
encoder for the most common interchange format, written from the public
ITU-T T.81 spec (no libjpeg in this container).

Scope (the baseline-sequential profile that covers ordinary JFIF files):

  * decode — SOF0 (baseline DCT, 8-bit), 1 or 3 components, any sampling
    factors up to 2x2 (4:4:4, 4:2:2, 4:2:0, grayscale), byte-stuffed
    entropy stream, restart intervals (DRI/RSTn), multiple DQT/DHT
    segments. Progressive (SOF2), arithmetic coding, and 12-bit depth are
    rejected with a ValueError (those payloads fall back to the tagged
    stub path in binary.py).
  * encode — baseline 4:4:4 (or grayscale), standard Annex K quantization
    tables scaled by a quality factor and the Annex K Huffman tables.

The 8x8 transforms are orthonormal-DCT matrix products (numpy); the
per-block Huffman loop is Python, which is fine at the thumbnail scale
these kernels target — bulk decode belongs to native codecs on the
executor image (see multimodal/binary.py module doc).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K.1 — example luminance/chrominance quantization tables
STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 — typical Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8x8 DCT-II basis: F = T @ f @ T.T, f = T.T @ F @ T
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        _T[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per Annex C canonical
    code assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits, values):
    """(bits, values) -> {(length, code): symbol} for the decoder."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit I/O over the byte-stuffed entropy segment
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # next byte index
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s past the end (T.81 F.2.2.5 allows it for the
                # final truncated byte)
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:           # stuffed byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: stop filling
                    self.buf = (self.buf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:                      # EOI or next segment: pad
                    self.buf = (self.buf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self):
        """Drop partial bits, consume the RSTn marker, continue after it."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        self.pos = len(d)


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_dims(payload: bytes):
    """(width, height) from the SOFn header — header-only, no decode."""
    try:
        if not payload or payload[:3] != b"\xff\xd8\xff":
            return None, None
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None, None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            length = struct.unpack_from(">H", payload, pos + 2)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                return int(w), int(h)
            pos += 2 + length
        return None, None
    except Exception:
        return None, None


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (or (H, W, 1) for
    grayscale streams). Raises ValueError on non-baseline profiles."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt = {}                 # id -> 64 int32 (natural order)
    huff_dc, huff_ac = {}, {}
    frame = None            # (h, w, [(cid, hs, vs, qid)])
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        length = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2:pos + length]
        if marker == 0xDB:          # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=bpos + 1)
                qt[tq] = tbl
                bpos += 65
        elif marker == 0xC4:        # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                table = _build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                bpos += 17 + nv
        elif marker == 0xC0:        # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:        # SOS -> entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs = body[1 + 2 * i]
                tt = body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            data_start = pos + length
            return _decode_scan(
                payload, data_start, frame, scan, qt, huff_dc, huff_ac,
                restart_interval)
        pos += length
    raise ValueError("no SOS marker found")


def _decode_scan(payload, data_start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("multi-scan streams unsupported (baseline only)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = {}
    meta = {}
    by_id = {c[0]: c for c in comps}
    for cid, hs, vs, qid in comps:
        pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
        planes[cid] = np.zeros((ph, pw), dtype=np.float64)
        meta[cid] = (hs, vs, qt[qid])

    reader = _BitReader(payload, data_start)
    pred = {cid: 0 for cid, *_ in comps}
    Tt = _T.T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                hs, vs, qtbl = meta[cid]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, dc_tbl)
                        diff = _extend(reader.receive(t), t)
                        pred[cid] += diff
                        coeffs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:   # ZRL
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * qtbl
                        spatial = Tt @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_count += 1

    # upsample to full resolution and clip to image size
    out = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0], 0, 255)
        return (y + 0.5).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return (np.clip(rgb, 0, 255) + 0.5).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4 or grayscale, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _quality_scale(qtbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg formula)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (qtbl * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _encode_block(bw, block, qtbl, dc_codes, ac_codes, pred):
    coeffs = _T @ (block - 128.0) @ _T.T
    q = np.round(coeffs.ravel() / qtbl.astype(np.float64)).astype(np.int32)
    zz = q[ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]   # EOB
                bw.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]   # ZRL
                bw.write(code, length)
                run = 0
            continue
        s = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        mv = v if v > 0 else v + (1 << s) - 1
        bw.write(mv, s)
        run = 0
    return pred


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane to (ph, pw)."""
    h, w = p.shape
    pad = np.empty((ph, pw), dtype=np.float64)
    pad[:h, :w] = p
    pad[h:, :w] = p[h - 1:h, :]
    pad[:, w:] = pad[:, w - 1:w]
    return pad


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB or (H, W[, 1]) gray -> baseline JFIF bytes
    (Annex K Huffman tables, IJG-scaled Annex K quant tables).

    ``subsampling``: "444" (one 8x8 block per component per MCU) or "420"
    (2x2-sampled luma, box-averaged chroma — the common camera/web
    profile; also how the decoder's upsampling path gets test coverage).
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")

    lum_q = _quality_scale(STD_LUM_QT, quality)
    chr_q = _quality_scale(STD_CHR_QT, quality)

    dc_l, ac_l = _build_codes(*DC_LUM), _build_codes(*AC_LUM)
    dc_c, ac_c = _build_codes(*DC_CHR), _build_codes(*AC_CHR)

    # components: (plane, hs, vs, qtbl, dc_codes, ac_codes)
    if gray:
        comps = [(arr.astype(np.float64), 1, 1, lum_q, dc_l, ac_l)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average 2x2 chroma downsample (pad odd dims first)
            ch, cw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp, crp = _pad_to(cb, ch, cw), _pad_to(cr, ch, cw)
            cb = cbp.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
            comps = [(y, 2, 2, lum_q, dc_l, ac_l),
                     (cb, 1, 1, chr_q, dc_c, ac_c),
                     (cr, 1, 1, chr_q, dc_c, ac_c)]
        else:
            comps = [(y, 1, 1, lum_q, dc_l, ac_l),
                     (cb, 1, 1, chr_q, dc_c, ac_c),
                     (cr, 1, 1, chr_q, dc_c, ac_c)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        (_pad_to(p, mcus_y * vs * 8, mcus_x * hs * 8), hs, vs, qt, dc, ac)
        for p, hs, vs, qt, dc, ac in comps
    ]

    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (plane, hs, vs, qt, dc, ac) in enumerate(padded):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qt, dc, ac, preds[ci])
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                      # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(lum_q[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(chr_q[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (_, hs, vs, *_rest) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in ((0x00, DC_LUM), (0x10, AC_LUM)) if gray else (
            (0x00, DC_LUM), (0x10, AC_LUM), (0x01, DC_CHR), (0x11, AC_CHR)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                # EOI
    return bytes(out)
