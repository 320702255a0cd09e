"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D + F + G.1.3): the QM coder
plus the sequential (SOF9) AND progressive (SOF10) arithmetic entropy
stages, encoder AND decoder.

Reference parity note: the reference repo never decodes media at all
(/root/reference handles firmware blobs as opaque bytes); this module is
part of the multimodal-column surface this engine adds for training-data
pipelines. Everything here derives from the public T.81 spec (Annex D
flowcharts, Table D.3 state machine, Annex F statistical models).

Validation honesty: this sandbox has no arithmetic-JPEG producer to cross
check against (PIL/libjpeg builds ship Huffman only), so conformance is
pinned three ways short of external bitstreams: (1) the raw QM coder
round-trips millions of randomized decisions across adaptive contexts,
(2) full encode->decode round-trips reproduce EXACTLY the pixels of the
Huffman baseline path at the same quality/subsampling (both entropy
stages sit over the identical quantized-coefficient store, so any
entropy-layer bug breaks pixel equality), and (3) the byte-stuffing /
marker discipline (0xFF 0x00, RSTn resets of statistics + predictors) is
exercised directly. The Qe state table is transcribed from T.81 Table D.3
(the same 113-state machine reproduced in IJG jaricom.c, plus the fixed
non-adaptive bin used for AC signs).

The coders are plain-Python per-byte state machines: they live under the
mapInPandas media decode path where per-row Python is the documented
container-format necessity (multimodal/binary.py), never under a
DataFrame hot path.
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Table D.3 — Qe value and probability-estimation state machine.
# Rows: (Qe, next_index_LPS, next_index_MPS, switch_MPS). Index 113 is
# the non-adaptive "fixed" bin (Qe ~ 0.5, self-looping, no switch) that
# F.1.4.3.1 assigns to AC sign decisions.
_QE_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),          # 113: fixed ~0.5 bin (AC signs)
)

# A statistics bin is one small int: (mps << 7) | state_index, all-zero
# at scan start and after every restart marker (F.1.4.4.1.4).


class ArithEncoder:
    """QM-coder encoder per T.81 Annex D.1 software conventions: 16-bit
    A register renormalized into [0x8000, 0x10000), C accumulates interval
    bases with a 19-bit retained window + byte tap at bit 19, stacked-0xFF
    carry resolution, and JPEG 0xFF->0xFF 0x00 byte stuffing."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11                 # spacer bits before the first byte tap
        self.buffer = -1             # last unwritten byte (carry target)
        self.sc = 0                  # stacked 0xFF bytes awaiting carry fate
        self.zc = 0                  # pending 0x00 bytes (droppable at end)
        self.out = bytearray()

    # -- byte plumbing -----------------------------------------------------
    def _emit(self, b):
        self.out.append(b)

    def _byteout(self):
        temp = self.c >> 19
        if temp > 0xFF:
            # carry: propagate into the buffered byte; stacked 0xFFs
            # become 0x00s
            if self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)     # stuff
            self.zc += self.sc
            self.sc = 0
            # 3 spacer bits guarantee the new byte is not 0xFF here
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1                 # fate depends on a later carry
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer)
            if self.sc:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self.out += b"\xff\x00" * self.sc   # stuffed 0xFF run
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self):
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    # -- the coding decision ----------------------------------------------
    def encode(self, stats, i, val):
        """Encode binary decision ``val`` in context ``stats[i]``."""
        sv = stats[i]
        qe, nl, nm, sw = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if val != mps:
            # CODELPS (D.1.4): conditional exchange when the MPS interval
            # shrank below Qe
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                mps = 1 - mps
            stats[i] = (mps << 7) | nl
            self._renorm()
        else:
            # CODEMPS (D.1.3)
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nm
            self._renorm()

    def flush(self):
        """D.1.8 termination: pick the in-interval code point with the
        most trailing zeros, push out remaining bytes, drop trailing
        0x00s (the decoder re-synthesizes them)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            temp += 0x8000
        self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer)
            if self.sc:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
        self.buffer = -1
        # final code bytes, skipped when zero (trailing zeros optional)
        if self.c & 0x7FFF800:
            if self.zc:
                self.out += b"\x00" * self.zc
                self.zc = 0
            b1 = (self.c >> 19) & 0xFF
            self._emit(b1)
            if b1 == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b2 = (self.c >> 11) & 0xFF
                self._emit(b2)
                if b2 == 0xFF:
                    self._emit(0x00)
        self.zc = 0
        return bytes(self.out)


class ArithDecoder:
    """QM-coder decoder: mirrors the encoder's interval discipline over a
    plain MSB-first bit view of the de-stuffed entropy bytes. The code
    register holds the next 16 bits of the stream relative to the current
    interval base; zero bits are synthesized past the trailing marker
    (D.2.7 lets the encoder drop trailing zero bytes)."""

    def __init__(self, payload: bytes, pos: int):
        self.payload = payload
        self.pos = pos
        self.end = False
        self._bits = 0               # small bit reservoir
        self._nbits = 0
        self.a = 0x10000
        self.code = 0
        for _ in range(16):
            self.code = (self.code << 1) | self._bit()

    def _next_byte(self) -> int:
        if self.end:
            return 0
        p, n = self.payload, len(self.payload)
        if self.pos >= n:
            self.end = True
            return 0
        b = p[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        # 0xFF: stuffed data byte or marker
        if self.pos + 1 < n and p[self.pos + 1] == 0x00:
            self.pos += 2
            return 0xFF
        self.end = True              # marker: entropy data over, feed 0s
        return 0

    def _bit(self) -> int:
        if self._nbits == 0:
            self._bits = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._bits >> self._nbits) & 1

    def marker_pos(self) -> int:
        """Stream offset of the terminating marker's 0xFF (valid once the
        scan is fully decoded)."""
        return self.pos

    def decode(self, stats, i) -> int:
        sv = stats[i]
        qe, nl, nm, sw = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        m = self.a - qe              # MPS-sized subinterval (pre-exchange)
        self.a = m
        if self.code < m:
            # bottom subinterval
            if m >= 0x8000:
                return mps           # no renorm, no estimation update
            if m < qe:               # conditional exchange: bottom is LPS
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (mps << 7) | nl
            else:
                d = mps
                stats[i] = (mps << 7) | nm
        else:
            # top subinterval (size qe)
            self.code -= m
            self.a = qe
            if m < qe:               # conditional exchange: top is MPS
                d = mps
                stats[i] = (mps << 7) | nm
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                stats[i] = (mps << 7) | nl
        while self.a < 0x8000:
            self.a <<= 1
            self.code = ((self.code << 1) | self._bit()) & 0xFFFFFFFF
        return d


# ---------------------------------------------------------------------------
# Annex F statistical models (sequential DCT). Bin layout per Table F.4:
#   DC per table: S0 = 4*context_category (categories 0 zero / 1 small+ /
#   2 small- / 3 large+ / 4 large-), SS = S0+1, SP = S0+2, SN = S0+3;
#   magnitude-category bins X1.. at 20; magnitude-bit bins M at X+14.
#   AC per table: per-k triplet (EOB, zero/nonzero, first-mag) at 3*(k-1);
#   low-k magnitude area at 189, high-k at 217 (split at conditioning Kx).
# ---------------------------------------------------------------------------

_DC_STATS_SIZE = 64
_AC_STATS_SIZE = 256
_FIXED_BIN_IDX = 113


def _classify_dc(diff: int, lo: int, hi: int) -> int:
    """Conditioning category of the previous DC diff (F.1.4.4.1.2):
    0 zero/near-zero, 4/8 small +/-, 12/16 large +/- — with the
    'small' band defined by the L/U bounds from the DAC segment."""
    a = abs(diff)
    if a <= ((1 << lo) >> 1):
        return 0
    if a <= ((1 << hi) >> 1):
        return 4 if diff > 0 else 8
    return 12 if diff > 0 else 16


def _encode_mag(enc, stats, st_first, mag_base, v: int):
    """Figures F.6/F.8/F.9: magnitude category (unary over adaptive bins)
    + magnitude bits of v (v >= 1). Returns nothing; bins adapt."""
    m = 0
    st = st_first
    v -= 1
    if v:
        enc.encode(stats, st, 1)
        m = 1
        v2 = v
        st = mag_base
        while v2 >> 1:
            v2 >>= 1
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
    enc.encode(stats, st, 0)
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(stats, st, 1 if (mm & v) else 0)
    return None


def _decode_mag(dec, stats, st_first, mag_base) -> int:
    """Inverse of _encode_mag: returns v >= 1."""
    m = 0
    st = st_first
    if dec.decode(stats, st):
        m = 1
        st = mag_base
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic magnitude overflow")
            st += 1
    v = m
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.decode(stats, st):
            v |= mm
    return v + 1


def _encode_block_arith(enc, zz, dc_stats, ac_stats, dc_ctx, pred,
                        lo, hi, kx):
    """Entropy-encode one zigzag block (F.1.4): returns (new_pred,
    new_dc_ctx). ``zz`` is the 64-long zigzag int array."""
    diff = int(zz[0]) - pred
    st = dc_ctx
    if diff == 0:
        enc.encode(dc_stats, st, 0)
        new_ctx = 0
    else:
        enc.encode(dc_stats, st, 1)
        if diff > 0:
            enc.encode(dc_stats, st + 1, 0)
            _encode_mag(enc, dc_stats, st + 2, 20, diff)
        else:
            enc.encode(dc_stats, st + 1, 1)
            _encode_mag(enc, dc_stats, st + 3, 20, -diff)
        new_ctx = _classify_dc(diff, lo, hi)
    ke = 0
    nz = np.nonzero(zz[1:])[0]
    if nz.size:
        ke = int(nz[-1]) + 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_stats, st, 0)          # not-EOB
        while int(zz[k]) == 0:
            enc.encode(ac_stats, st + 1, 0)  # zero coeff
            st += 3
            k += 1
        enc.encode(ac_stats, st + 1, 1)      # nonzero
        v = int(zz[k])
        if v > 0:
            enc.encode(ac_stats, _FIXED_BIN_IDX_AC, 0)
        else:
            enc.encode(ac_stats, _FIXED_BIN_IDX_AC, 1)
            v = -v
        mag_base = 189 if k <= kx else 217
        _encode_mag(enc, ac_stats, st + 2, mag_base, v)
        k += 1
    if ke < 63:
        enc.encode(ac_stats, 3 * (k - 1), 1)  # EOB
    return int(zz[0]), new_ctx


def _decode_block_arith(dec, zz, dc_stats, ac_stats, dc_ctx, pred,
                        lo, hi, kx):
    """Inverse of _encode_block_arith: fills ``zz`` (64 int32, zigzag),
    returns (new_pred, new_dc_ctx)."""
    st = dc_ctx
    if dec.decode(dc_stats, st) == 0:
        diff = 0
        new_ctx = 0
    else:
        sign = dec.decode(dc_stats, st + 1)
        v = _decode_mag(dec, dc_stats, st + 2 + sign, 20)
        diff = -v if sign else v
        new_ctx = _classify_dc(diff, lo, hi)
    pred += diff
    zz[0] = pred
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(ac_stats, st):
            break                             # EOB
        while dec.decode(ac_stats, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC index overflow")
        sign = dec.decode(ac_stats, _FIXED_BIN_IDX_AC)
        mag_base = 189 if k <= kx else 217
        v = _decode_mag(dec, ac_stats, st + 2, mag_base)
        zz[k] = -v if sign else v
        k += 1
    return pred, new_ctx


# the AC fixed bin lives at a reserved slot past the adaptive area
_FIXED_BIN_IDX_AC = _AC_STATS_SIZE - 1


def _fresh_stats(ncomp_dc: int, ntab_ac: int):
    """Zeroed statistics areas (+ the pinned fixed bin for AC signs:
    state 113 self-loops with no MPS switch, so that slot never adapts)."""
    dc = [bytearray(_DC_STATS_SIZE) for _ in range(ncomp_dc)]
    ac = []
    for _ in range(ntab_ac):
        a = bytearray(_AC_STATS_SIZE)
        a[_FIXED_BIN_IDX_AC] = 113
        ac.append(a)
    return dc, ac


def _find_rst(payload: bytes, pos: int) -> int:
    """Scan forward to the next RSTn marker (restart boundaries are
    byte-aligned and unstuffed, like the Huffman path)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and 0xD0 <= payload[pos + 1] <= 0xD7:
            return pos
        pos += 1
    raise ValueError("expected RST marker in arithmetic scan")


def decode_arith_scan(payload, data_start, frame, scan, qt, dc_cond,
                      ac_cond, restart_interval):
    """Sequential-DCT arithmetic scan (SOF9) -> raster, via the shared
    coefficient-store reconstruction. ``dc_cond``: {table_id: (L, U)},
    ``ac_cond``: {table_id: Kx} from the DAC segment (defaults L=0, U=1,
    Kx=5 per F.1.4.4.1.4 / F.1.4.4.2)."""
    from firmwarescraper_spark.multimodal import jpeg as J

    comps = frame[2]
    mcus_x, mcus_y, geo = J._comp_geometry(frame)
    interleaved = len(scan) > 1
    if not interleaved and len(comps) > 1:
        raise ValueError("non-interleaved multi-component arithmetic "
                         "scans unsupported")
    # geo entry: (hs, vs, bw_pad, bh_pad, bw_used, bh_used)
    coeffs = {
        cid: np.zeros((g[3], g[2], 64), dtype=np.int32)
        for cid, g in geo.items()
    }
    by_id = {c[0]: c for c in comps}
    dec = ArithDecoder(payload, data_start)
    dc_ids = sorted({td for _, td, _ in scan})
    ac_ids = sorted({ta for _, _, ta in scan})
    dcs, acs = _fresh_stats(len(dc_ids), len(ac_ids))
    dc_stats = dict(zip(dc_ids, dcs))
    ac_stats = dict(zip(ac_ids, acs))
    pred = {cs: 0 for cs, _, _ in scan}
    dctx = {cs: 0 for cs, _, _ in scan}
    mcu_count = 0
    zz = np.zeros(64, dtype=np.int32)

    def _reset_for_restart():
        # dec.pos never overshoots the marker (stuffing means data bytes
        # can't spell 0xFF RSTn), so scan forward from wherever the coder
        # stopped consuming
        nonlocal dec
        p = _find_rst(payload, dec.marker_pos())
        dec = ArithDecoder(payload, p + 2)
        for td in dc_stats:
            dc_stats[td][:] = bytes(_DC_STATS_SIZE)
        for ta in ac_stats:
            ac_stats[ta][:] = bytes(_AC_STATS_SIZE)
            ac_stats[ta][_FIXED_BIN_IDX_AC] = 113
        for cs in pred:
            pred[cs] = 0
            dctx[cs] = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                _reset_for_restart()
            for cs, td, ta in scan:
                _, hs, vs, _ = by_id[cs]
                lo, hi = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                for by in range(vs):
                    for bx in range(hs):
                        zz[:] = 0
                        pred[cs], dctx[cs] = _decode_block_arith(
                            dec, zz, dc_stats[td], ac_stats[ta],
                            dctx[cs], pred[cs], lo, hi, kx)
                        coeffs[cs][my * vs + by, mx * hs + bx] = zz
            mcu_count += 1
    return J._reconstruct_from_coeffs(frame, coeffs, qt)


def encode_jpeg_arith(arr, quality: int = 85, subsampling: str = "444",
                      restart_interval: int = 0,
                      dc_cond=(0, 1), ac_kx: int = 5,
                      precision: int = 8) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W[, 1]) gray -> SOF9 arithmetic-coded
    JFIF bytes. Shares the DCT/quantization front half with the Huffman
    encoder (identical coefficient store — the basis of the cross-profile
    pixel-exactness test), emits an explicit DAC segment, and honors
    restart intervals (coder flush + statistics/predictor reset).

    ``precision`` 12 takes uint16 samples in [0, 4095] (SOF9 P=12, Pq=1
    16-bit quantization tables) — the Annex F statistical model is
    category-unbounded (unary magnitude trees), so the entropy stage is
    precision-independent."""
    from firmwarescraper_spark.multimodal import jpeg as J

    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    gray, h, w, lum_q, chr_q, padded, mcus_x, mcus_y = J._encode_prep(
        arr, quality, subsampling, prec=precision)
    stores = J._quantize_store(padded, level=float(1 << (precision - 1)))
    lo, hi = dc_cond

    enc = ArithEncoder()
    ncomp = 1 if gray else 3
    # table ids: DC/AC table 0 for luma, 1 for chroma (like the Huffman path)
    tids = [0] + [1] * (ncomp - 1)
    dc_stats, ac_stats = {}, {}
    for t in set(tids):
        dc_stats[t] = bytearray(_DC_STATS_SIZE)
        a = bytearray(_AC_STATS_SIZE)
        a[_FIXED_BIN_IDX_AC] = 113
        ac_stats[t] = a
    preds = [0] * ncomp
    dctxs = [0] * ncomp
    entropy = bytearray()
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                entropy += enc.flush()
                entropy += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                enc = ArithEncoder()
                for t in dc_stats:
                    dc_stats[t][:] = bytes(_DC_STATS_SIZE)
                    ac_stats[t][:] = bytes(_AC_STATS_SIZE)
                    ac_stats[t][_FIXED_BIN_IDX_AC] = 113
                preds = [0] * ncomp
                dctxs = [0] * ncomp
            mcu_count += 1
            for ci, (plane, hs, vs, _qt, _dc, _ac) in enumerate(padded):
                t = tids[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = stores[ci][my * vs + by, mx * hs + bx]
                        preds[ci], dctxs[ci] = _encode_block_arith(
                            enc, zz, dc_stats[t], ac_stats[t],
                            dctxs[ci], preds[ci], lo, hi, ac_kx)
    entropy += enc.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    from firmwarescraper_spark.multimodal.jpeg import ZIGZAG
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if precision == 8:
        out += seg(0xDB,
                   bytes([0x00]) + bytes(lum_q[ZIGZAG].astype(np.uint8)))
        if not gray:
            out += seg(0xDB,
                       bytes([0x01]) + bytes(chr_q[ZIGZAG].astype(np.uint8)))
    else:                                       # Pq=1: 16-bit entries
        out += seg(0xDB,
                   bytes([0x10]) + lum_q[ZIGZAG].astype(">u2").tobytes())
        if not gray:
            out += seg(0xDB,
                       bytes([0x11]) + chr_q[ZIGZAG].astype(">u2").tobytes())
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for i, (_, hs, vs, *_rest) in enumerate(padded):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += seg(0xC9, sof)                      # SOF9
    # DAC: DC conditioning (Tc=0) Cs = (U << 4) | L; AC (Tc=1) Cs = Kx
    dac = b""
    for t in sorted(set(tids)):
        dac += bytes([0x00 | t, (hi << 4) | lo])
        dac += bytes([0x10 | t, ac_kx])
    out += seg(0xCC, dac)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = tids[i]
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive arithmetic coding (SOF10, T.81 G.1.3): the four scan kinds
# reuse the sequential statistical models — DC first codes scaled diffs
# through the Annex F DC model, AC first codes the Ss..Se band through the
# AC model, and the refinement passes use per-k correction bins (st+2) /
# newly-significant bins (st+1) plus a non-adaptive fixed bin for signs
# and DC refinement bits. Statistics reset at every scan (and restart).
# ---------------------------------------------------------------------------


def _encode_ac_first(enc, zz, ac_stats, fixed, ss, se, al, kx):
    """AC first pass over one block's zigzag band (G.1.3.2)."""
    ke = 0
    for k in range(se, ss - 1, -1):
        if (abs(int(zz[k])) >> al) != 0:
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_stats, st, 0)              # not EOB
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(ac_stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac_stats, st + 1, 1)
        v = int(zz[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
            v >>= al
        else:
            enc.encode(fixed, 0, 1)
            v = (-v) >> al
        _encode_mag(enc, ac_stats, st + 2, 189 if k <= kx else 217, v)
        k += 1
    if ke < se:
        enc.encode(ac_stats, 3 * (k - 1), 1)     # EOB


def _decode_ac_first(dec, zz, ac_stats, fixed, ss, se, al, kx):
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac_stats, st):
            break
        while dec.decode(ac_stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC band overflow")
        sign = dec.decode(fixed, 0)
        v = _decode_mag(dec, ac_stats, st + 2, 189 if k <= kx else 217)
        zz[k] = (-v << al) if sign else (v << al)
        k += 1


def _encode_ac_refine(enc, zz, ac_stats, fixed, ss, se, ah, al):
    """AC refinement pass (G.1.3.3): correction bits for previously
    significant coefficients, significance + sign for newly significant
    ones, EOB decisions only past the previous stage's band end."""
    ke = 0
    for k in range(se, ss - 1, -1):
        if (abs(int(zz[k])) >> al) != 0:
            ke = k
            break
    kex = 0                       # previous-stage EOB index
    for k in range(ke, ss - 1, -1):
        if (abs(int(zz[k])) >> ah) != 0:
            kex = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac_stats, st, 0)          # not EOB
        while True:
            v = int(zz[k])
            t = abs(v) >> al
            if t:
                if t >> 1:                        # previously significant
                    enc.encode(ac_stats, st + 2, t & 1)
                else:                             # newly significant
                    enc.encode(ac_stats, st + 1, 1)
                    enc.encode(fixed, 0, 0 if v > 0 else 1)
                break
            enc.encode(ac_stats, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(ac_stats, 3 * (k - 1), 1)     # EOB


def _decode_ac_refine(dec, zz, ac_stats, fixed, ss, se, al):
    p1 = 1 << al
    m1 = -1 << al
    kex = 0
    for k in range(se, ss - 1, -1):
        if int(zz[k]) != 0:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(ac_stats, st):
                break
        while True:
            v = int(zz[k])
            if v:                                 # previously significant
                if dec.decode(ac_stats, st + 2):
                    zz[k] = v + (m1 if v < 0 else p1)
                break
            if dec.decode(ac_stats, st + 1):      # newly significant
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine overflow")
        k += 1


def decode_arith_progressive_scan(payload, data_start, frame, scan, ss, se,
                                  ah, al, dc_cond, ac_cond,
                                  restart_interval, coeffs):
    """Decode one SOF10 progressive scan into the shared coefficient
    store; returns the position of the next marker."""
    from firmwarescraper_spark.multimodal import jpeg as J

    comps = frame[2]
    mcus_x, mcus_y, geo = J._comp_geometry(frame)
    dec = ArithDecoder(payload, data_start)
    fixed = bytearray([113])

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        dc_ids = sorted({td for _, td, _ in scan})
        dc_stats = {td: bytearray(_DC_STATS_SIZE) for td in dc_ids}
        pred = {cid: 0 for cid, _, _ in scan}
        dctx = {cid: 0 for cid, _, _ in scan}
        interleaved = len(scan) > 1
        if interleaved:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for cid, td, _ta in scan:
                        hs, vs = geo[cid][0], geo[cid][1]
                        blocks += [(cid, td, my * vs + by, mx * hs + bx)
                                   for by in range(vs) for bx in range(hs)]
                    units.append(blocks)
        else:
            cid0, td0, _ = scan[0]
            _, _, _, _, bw_u, bh_u = geo[cid0]
            units = [[(cid0, td0, by, bx)]
                     for by in range(bh_u) for bx in range(bw_u)]
        for i, unit in enumerate(units):
            if restart_interval and i and i % restart_interval == 0:
                p = _find_rst(payload, dec.marker_pos())
                dec = ArithDecoder(payload, p + 2)
                for td in dc_stats:
                    dc_stats[td][:] = bytes(_DC_STATS_SIZE)
                fixed[0] = 113
                pred = {c: 0 for c in pred}
                dctx = {c: 0 for c in dctx}
            for cid, td, by, bx in unit:
                block = coeffs[cid][by, bx]
                if ah == 0:
                    lo, hi = dc_cond.get(td, (0, 1))
                    st = dctx[cid]
                    stats = dc_stats[td]
                    if dec.decode(stats, st) == 0:
                        dctx[cid] = 0
                    else:
                        sign = dec.decode(stats, st + 1)
                        v = _decode_mag(dec, stats, st + 2 + sign, 20)
                        diff = -v if sign else v
                        dctx[cid] = _classify_dc(diff, lo, hi)
                        pred[cid] += diff
                    block[0] = pred[cid] << al
                else:
                    if dec.decode(fixed, 0):
                        block[0] |= (1 << al)
    else:
        if len(scan) != 1:
            raise ValueError("interleaved AC scan is illegal in progressive")
        cid, _td, ta = scan[0]
        kx = ac_cond.get(ta, 5)
        ac_stats = bytearray(_AC_STATS_SIZE)
        _, _, _, _, bw_u, bh_u = geo[cid]
        unit_i = 0
        for by in range(bh_u):
            for bx in range(bw_u):
                if restart_interval and unit_i and \
                        unit_i % restart_interval == 0:
                    p = _find_rst(payload, dec.marker_pos())
                    dec = ArithDecoder(payload, p + 2)
                    ac_stats[:] = bytes(_AC_STATS_SIZE)
                    fixed[0] = 113
                unit_i += 1
                block = coeffs[cid][by, bx]
                if ah == 0:
                    _decode_ac_first(dec, block, ac_stats, fixed,
                                     ss, se, al, kx)
                else:
                    _decode_ac_refine(dec, block, ac_stats, fixed,
                                      ss, se, al)
    return J._find_next_marker(payload, dec.marker_pos())


def encode_jpeg_arith_progressive(arr, quality: int = 85,
                                  subsampling: str = "444",
                                  dc_cond=(0, 1), ac_kx: int = 5) -> bytes:
    """(H, W, 3) uint8 RGB or gray -> progressive arithmetic-coded JFIF
    (SOF10). Same scan script as the Huffman progressive encoder (DC
    first Al=1 interleaved -> DC refine -> per-component AC bands (1,5)
    and (6,63) at Al=1 -> AC refinements), same quantized coefficients,
    so the decode is pixel-identical to baseline/progressive Huffman."""
    from firmwarescraper_spark.multimodal import jpeg as J
    from firmwarescraper_spark.multimodal.jpeg import ZIGZAG

    gray, h, w, lum_q, chr_q, padded, mcus_x, mcus_y = J._encode_prep(
        arr, quality, subsampling)
    stores = J._quantize_store(padded)
    ncomp = len(padded)
    lo, hi = dc_cond
    tids = [0] + [1] * (ncomp - 1)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(lum_q[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(chr_q[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (_, hs, vs, *_rest) in enumerate(padded):
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += seg(0xCA, sof)                        # SOF10
    dac = b""
    for t in sorted(set(tids)):
        dac += bytes([0x00 | t, (hi << 4) | lo])
        dac += bytes([0x10 | t, ac_kx])
    out += seg(0xCC, dac)

    def sos_header(comp_idxs, ss, se, ah, al):
        body = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            t = tids[ci]
            body += bytes([ci + 1, (t << 4) | t])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # --- scan 1: interleaved DC first, Al=1
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    enc = ArithEncoder()
    dc_stats = {t: bytearray(_DC_STATS_SIZE) for t in set(tids)}
    preds = [0] * ncomp
    dctxs = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, hs, vs, *_r) in enumerate(padded):
                t = tids[ci]
                stats = dc_stats[t]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(stores[ci][my * vs + by, mx * hs + bx][0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        st = dctxs[ci]
                        if diff == 0:
                            enc.encode(stats, st, 0)
                            dctxs[ci] = 0
                        else:
                            enc.encode(stats, st, 1)
                            if diff > 0:
                                enc.encode(stats, st + 1, 0)
                                _encode_mag(enc, stats, st + 2, 20, diff)
                            else:
                                enc.encode(stats, st + 1, 1)
                                _encode_mag(enc, stats, st + 3, 20, -diff)
                            dctxs[ci] = _classify_dc(diff, lo, hi)
    out += enc.flush()

    # --- scan 2: DC refinement Ah=1 -> Al=0 (fixed-bin raw bits)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    enc = ArithEncoder()
    fixed = bytearray([113])
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, hs, vs, *_r) in enumerate(padded):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(stores[ci][my * vs + by, mx * hs + bx][0])
                        enc.encode(fixed, 0, v & 1)
    out += enc.flush()

    # --- scans 3..: per component AC bands at Al=1, then refinements.
    # Non-interleaved scans traverse the component's own USED block grid
    # (T.81 A.2.2), not the MCU-padded grid.
    hmax = max(p[1] for p in padded)
    vmax = max(p[2] for p in padded)

    def used_grid(ci):
        hs, vs = padded[ci][1], padded[ci][2]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        return -(-ch // 8), -(-cw // 8)

    for bands, ah_al in (([(1, 5), (6, 63)], (0, 1)),
                         ([(1, 5), (6, 63)], (1, 0))):
        ah, al = ah_al
        for ci in range(ncomp):
            bh_u, bw_u = used_grid(ci)
            for (bss, bse) in bands:
                out += sos_header([ci], bss, bse, ah, al)
                enc = ArithEncoder()
                fixed = bytearray([113])
                ac_stats = bytearray(_AC_STATS_SIZE)
                for by in range(bh_u):
                    for bx in range(bw_u):
                        zz = stores[ci][by, bx]
                        if ah == 0:
                            _encode_ac_first(enc, zz, ac_stats, fixed,
                                             bss, bse, al, ac_kx)
                        else:
                            _encode_ac_refine(enc, zz, ac_stats, fixed,
                                              bss, bse, ah, al)
                out += enc.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Lossless arithmetic coding (SOF11, T.81 Annex H + F): prediction
# differences coded through the Annex F DC-style zero/sign/magnitude
# procedure, conditioned on the CLASSIFIED differences of the left (Da)
# and above (Db) neighbors — 5x5 context groups of 4 bins each, plus two
# magnitude trees selected by whether Db classifies as large. Bin-layout
# honesty: the 25-group x 4 + two-tree structure is per Annex H's
# statistical model; the exact bin OFFSETS below are this module's
# reconstruction (no arithmetic-lossless producer exists in-sandbox to
# cross-check byte streams), and the pinned properties are encoder/
# decoder self-consistency and EXACT reconstruction of the original
# raster for every predictor.
# ---------------------------------------------------------------------------

_LL_STATS_SIZE = 160                # 25*4 contexts + 2 magnitude trees
_LL_MAG_SMALL = 100                 # Db not large: 15 cat + 14 bit bins
_LL_MAG_LARGE = 129                 # Db large


def _ll_cls(diff: int, lo: int, hi: int) -> int:
    """5-way conditioning category of a neighbor difference: 0 zero /
    1 small+ / 2 small- / 3 large+ / 4 large- (the DC rule, H.1.4)."""
    return _classify_dc(diff, lo, hi) >> 2


def _ll_predict(s, y, x, predictor, default, fresh):
    if fresh:
        return default
    if y == 0:
        return int(s[0, x - 1])
    if x == 0:
        return int(s[y - 1, 0])
    ra, rb, rc = (int(s[y, x - 1]), int(s[y - 1, x]), int(s[y - 1, x - 1]))
    return (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
            rb + ((ra - rc) >> 1), (ra + rb) >> 1)[predictor - 1]


def _ll_context(diffs, y, x, lo, hi):
    """(S0, mag_base) from the classified left/above differences."""
    da = int(diffs[y, x - 1]) if x > 0 else 0
    db = int(diffs[y - 1, x]) if y > 0 else 0
    ca, cb = _ll_cls(da, lo, hi), _ll_cls(db, lo, hi)
    s0 = 4 * (ca + 5 * cb)
    return s0, (_LL_MAG_LARGE if cb >= 3 else _LL_MAG_SMALL)


def decode_arith_lossless_scan(payload, data_start, frame, scan, dc_cond,
                               restart_interval, predictor, pt):
    """SOF11 lossless scan -> (H, W, C) raster, exact reconstruction."""
    h, w, comps = frame[:3]
    prec = frame[3]
    if any(hs != 1 or vs != 1 for _, hs, vs, _ in comps):
        raise ValueError("lossless decode supports 1x1 sampling only")
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    default = 1 << (prec - pt - 1)
    order = [(cs, td) for cs, td, _ta in scan]
    samples = {cs: np.zeros((h, w), dtype=np.int32) for cs, _ in order}
    diffs = {cs: np.zeros((h, w), dtype=np.int32) for cs, _ in order}
    conds = {td: dc_cond.get(td, (0, 1)) for _, td in order}
    stats = {td: bytearray(_LL_STATS_SIZE) for _, td in order}
    dec = ArithDecoder(payload, data_start)
    mcu_count = 0
    restart_pending = False
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                p = _find_rst(payload, dec.marker_pos())
                dec = ArithDecoder(payload, p + 2)
                for td in stats:
                    stats[td][:] = bytes(_LL_STATS_SIZE)
                restart_pending = True
            for cs, td in order:
                lo, hi = conds[td]
                st_area = stats[td]
                fresh = restart_pending or (y == 0 and x == 0)
                s0, mag = (0, _LL_MAG_SMALL) if fresh else \
                    _ll_context(diffs[cs], y, x, lo, hi)
                if dec.decode(st_area, s0) == 0:
                    d = 0
                else:
                    sign = dec.decode(st_area, s0 + 1)
                    v = _decode_mag(dec, st_area, s0 + 2 + sign, mag)
                    d = -v if sign else v
                p = _ll_predict(samples[cs], y, x, predictor, default, fresh)
                samples[cs][y, x] = (p + d) & 0xFFFF
                diffs[cs][y, x] = d
            restart_pending = False
            mcu_count += 1
    out_dtype = np.uint8 if prec <= 8 else np.uint16
    planes = [(samples[cs] << pt).astype(out_dtype) for cs, _ in order]
    return np.stack(planes, axis=2)


def encode_jpeg_lossless_arith(arr, predictor: int = 1, pt: int = 0,
                               dc_cond=(0, 1),
                               restart_interval: int = 0) -> bytes:
    """(H, W) or (H, W, C) integer raster -> SOF11 arithmetic-coded
    lossless JFIF bytes. decode(encode(a)) == a exactly (for pt=0; with
    pt=k the decoder returns (a >> k) << k, like the Huffman twin)."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    prec = 8 if a.dtype == np.uint8 else 16
    h, w, ncomp = a.shape
    planes = (a.astype(np.int64) >> pt)
    default = 1 << (prec - pt - 1)
    lo, hi = dc_cond

    enc = ArithEncoder()
    stats = bytearray(_LL_STATS_SIZE)     # one DC table id for all comps
    diffs = [np.zeros((h, w), dtype=np.int32) for _ in range(ncomp)]
    entropy = bytearray()
    mcu_count = 0
    rst_n = 0
    restart_pending = False
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                entropy += enc.flush()
                entropy += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                enc = ArithEncoder()
                stats[:] = bytes(_LL_STATS_SIZE)
                restart_pending = True
            for c in range(ncomp):
                s = planes[:, :, c]
                fresh = restart_pending or (y == 0 and x == 0)
                p = _ll_predict(s, y, x, predictor, default, fresh)
                d = (int(s[y, x]) - p) & 0xFFFF
                if d >= 32768:
                    d -= 65536
                if d == -32768:
                    d = 32768           # same mod-2^16 point, codable sign+
                s0, mag = (0, _LL_MAG_SMALL) if fresh else \
                    _ll_context(diffs[c], y, x, lo, hi)
                if d == 0:
                    enc.encode(stats, s0, 0)
                else:
                    enc.encode(stats, s0, 1)
                    if d > 0:
                        enc.encode(stats, s0 + 1, 0)
                        _encode_mag(enc, stats, s0 + 2, mag, d)
                    else:
                        enc.encode(stats, s0 + 1, 1)
                        _encode_mag(enc, stats, s0 + 3, mag, -d)
                diffs[c][y, x] = d
            restart_pending = False
            mcu_count += 1
    entropy += enc.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += seg(0xCB, sof)                     # SOF11
    out += seg(0xCC, bytes([0x00, (hi << 4) | lo]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0x00, pt & 0x0F])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
