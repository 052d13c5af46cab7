"""Pure-Python baseline JPEG codec (ITU-T T.81, public spec) — no PIL.

Closes the last closable media codec from the multimodal matrix
(reference parity target: the amadeus data model treats images as typed
binary cells; see amadeus-types/src/lib.rs image notes): the container
ships no PIL/ffmpeg, so compressed-image decode must be implemented from
the public spec or stubbed. PNG proved the pattern last round; this is
the JPEG twin.

Scope — baseline sequential DCT plus progressive (SOF2), together
covering essentially all web JPEGs:

- decode: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI marker parse, 8-bit
  quant tables, interleaved scan, huffman entropy decode with byte
  unstuffing and restart markers, dequantize → inverse zigzag → 2-D
  IDCT (separable matrix form), chroma upsampling for any (h,v) factors
  in 1..2, YCbCr→RGB (or grayscale passthrough).
- encode (fixture generator / sink side): 4:4:4 or 4:2:0, standard
  Annex K quant tables scaled by quality, standard Annex K huffman
  tables, no restart intervals.

- progressive decode (SOF2, T.81 Annex G): multi-scan spectral
  selection + successive approximation — DC first/refine, AC first
  with EOB-run coding, AC refine with correction bits; plus a
  progressive ENCODER emitting the libjpeg-style default scan script
  (fixture generation — decode is pinned pixel-identical to baseline).

Arithmetic coding, 12-bit, and hierarchical modes raise
NotImplementedError — genuinely rare, genuinely out of scope.

Executor-side use: `decode_jpeg` is called per-row inside the Arrow-
batched mapInPandas media kernels (multimodal.py) — bytes never visit
the driver; the codec itself is O(pixels) numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K — published example tables) ------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (luminance, chrominance)
STD_LUMA_QT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_QT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 example huffman tables: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# separable 8-point IDCT basis: spatial = A.T @ coeffs @ A
_K = np.arange(8)
_A = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * 0.5
_A[0, :] *= 1 / np.sqrt(2)


def idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# ---- huffman ---------------------------------------------------------------


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical ordering."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    dec = _build_decode_table(bits, huffval)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing and restart-marker awareness."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1s per spec (decoder may read past final bits)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: stop filling; caller resyncs
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:  # EOI or next marker — pad
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b if b != 0xFF else (self.bitbuf << 8) | 0xFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Drop buffered bits and consume one RSTn marker from the byte
        stream (called between restart intervals)."""
        self.bitbuf = 0
        self.nbits = 0
        # scan forward to the FFD0-FFD7 marker and skip it
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential or progressive JPEG → uint8 array (h, w, 3)
    RGB or (h, w) grayscale. Raises NotImplementedError for
    arithmetic/12-bit/hierarchical streams, ValueError for malformed data (low-level parse
    failures — short reads, bad table ids, out-of-range codes — are
    normalized to ValueError at this boundary so corrupt media cells
    never surface raw IndexError/KeyError from the bit reader)."""
    try:
        return _decode_jpeg_inner(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, ZeroDivisionError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (precision, h, w, comps) comps: [(cid, hs, vs, tq)]
    restart_interval = 0
    scan = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them (our encoder never emits fill bytes,
        # but foreign baseline files legally can)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(body, np.uint8, 64, b).astype(np.int64)
                b += 64
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = [0] + list(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                tbl = _build_decode_table(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive (huffman)
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) — "
                "arithmetic/hierarchical/lossless not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scan.append((cs, tdta >> 4, tdta & 0xF))
            entropy_start = pos
            break
        # APPn/COM and others: skipped

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    reader = _BitReader(payload[entropy_start:])
    # per-component plane at its own resolution
    planes = {
        cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cid, hs, vs, tq in comps:
                td, ta = scan_by_cid[cid]
                dc_tbl, ac_tbl, q = huff_dc[td], huff_ac[ta], qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        pred[cid] += diff
                        coeffs[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * q
                        px = idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px

    return _finish_planes(planes, comps, h, w, hmax, vmax)


def _finish_planes(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample per-component planes to full resolution, crop, and
    color-convert — shared by the baseline and progressive paths."""
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ---- progressive decoder (SOF2, T.81 Annex G — huffman only) ---------------
#
# Progressive streams carry MANY scans, each delivering a slice of the
# coefficient data: a spectral band (Ss..Se) at a successive-
# approximation precision (Ah, Al). The decoder accumulates quantized
# coefficients per block across scans and runs the shared dequant/IDCT/
# upsample finish once at EOI. Four scan procedures (G.1.2): DC first,
# DC refine (one raw bit per block), AC first (with EOB-run coding
# across blocks), AC refine (correction bits for already-significant
# coefficients interleaved with newly-significant ones). ~10% of web
# JPEGs are progressive, so a crawl pipeline can't treat them as rare.


def _entropy_end(payload: bytes, start: int) -> int:
    """End of an entropy-coded segment: first 0xFF not followed by a
    stuffed 0x00 or a restart marker."""
    pos = start
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00 and not (
            0xD0 <= payload[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _dc_first(reader, dc_tbl, block, pred: int, al: int) -> int:
    t = reader.decode_symbol(dc_tbl)
    pred += _extend(reader.read_bits(t), t)
    block[0] = pred << al
    return pred


def _dc_refine(reader, block, al: int) -> None:
    if reader.read_bit():
        block[0] |= 1 << al


def _ac_first(reader, ac_tbl, block, ss: int, se: int, al: int, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_nonzero(reader, block, k: int, p1: int) -> None:
    """Correction bit for an already-significant coefficient
    (G.1.2.3): a 1-bit moves |coef| up by one quantum at this
    precision unless that bit is already set."""
    if reader.read_bit() and (int(block[k]) & p1) == 0:
        block[k] += p1 if block[k] >= 0 else -p1


def _ac_refine(reader, ac_tbl, block, ss: int, se: int, al: int, eobrun: int) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn counts blocks INCLUDING this one (unlike the
                    # AC-first path, the current block still owes
                    # correction bits for its remaining band — read
                    # below, then decrement)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: run of 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError("bad AC-refine symbol")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                if block[k] != 0:
                    _refine_nonzero(reader, block, k, p1)
                else:
                    if r == 0:
                        if val:
                            block[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                _refine_nonzero(reader, block, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef: dict[int, np.ndarray] = {}  # cid -> (BY, BX, 64) zigzag coeffs

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(body, np.uint8, 64, b).astype(np.int64)
                b += 64
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = [0] + list(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, huffval
                )
                b += 17 + n
        elif marker == 0xC2:
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coef = {
                cid: np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
                for cid, hs, vs, _ in comps
            }
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scan.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahl = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            ah, al = ahl >> 4, ahl & 0xF
            end = _entropy_end(payload, pos)
            _decode_prog_scan(
                payload[pos:end], scan, frame, coef, huff_dc, huff_ac,
                restart_interval, hmax, vmax, mcus_x, mcus_y,
                ss, se, ah, al,
            )
            pos = end
        # APPn/COM: skipped

    if frame is None or not coef:
        raise ValueError("missing SOF2/SOS")
    h, w, comps = frame
    planes = {}
    for cid, hs, vs, tq in comps:
        arr = coef[cid]
        by_n, bx_n, _ = arr.shape
        # vectorized finish: dequantize + inverse zigzag all blocks, then
        # batched IDCT via the separable basis
        deq = arr * qt[tq][None, None, :]
        blocks = np.zeros((by_n, bx_n, 64), dtype=np.float64)
        blocks[:, :, ZIGZAG] = deq
        blocks = blocks.reshape(by_n, bx_n, 8, 8)
        px = np.einsum("ki,yxkl,lj->yxij", _A, blocks, _A) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
        planes[cid] = plane
    return _finish_planes(planes, comps, h, w, hmax, vmax)


def _decode_prog_scan(
    data, scan, frame, coef, huff_dc, huff_ac, restart_interval,
    hmax, vmax, mcus_x, mcus_y, ss, se, ah, al,
) -> None:
    h, w, comps = frame
    reader = _BitReader(data)
    by_cid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    if len(scan) > 1:
        # interleaved scans are DC-only in progressive mode (G.1.1.1)
        if ss != 0 or se != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        pred = {cs: 0 for cs, _, _ in scan}
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    reader.align_to_restart()
                    pred = {cs: 0 for cs, _, _ in scan}
                mcu_count += 1
                for cs, td, _ in scan:
                    hs, vs, _ = by_cid[cs]
                    for by in range(vs):
                        for bx in range(hs):
                            block = coef[cs][my * vs + by, mx * hs + bx]
                            if ah == 0:
                                pred[cs] = _dc_first(
                                    reader, huff_dc[td], block, pred[cs], al
                                )
                            else:
                                _dc_refine(reader, block, al)
        return
    cs, td, ta = scan[0]
    hs, vs, _ = by_cid[cs]
    # NON-interleaved grid: ceil of the component's true size, NOT the
    # MCU-padded grid (padded edge blocks are coded only by interleaved
    # DC scans; they're cropped away at finish)
    bw_n = (-(-(w * hs) // hmax) + 7) // 8
    bh_n = (-(-(h * vs) // vmax) + 7) // 8
    eobrun = 0
    pred = 0
    count = 0
    for byi in range(bh_n):
        for bxi in range(bw_n):
            if restart_interval and count and count % restart_interval == 0:
                reader.align_to_restart()
                eobrun = 0
                pred = 0
            count += 1
            block = coef[cs][byi, bxi]
            if ss == 0:
                if ah == 0:
                    pred = _dc_first(reader, huff_dc[td], block, pred, al)
                else:
                    _dc_refine(reader, block, al)
            elif ah == 0:
                eobrun = _ac_first(
                    reader, huff_ac[ta], block, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine(
                    reader, huff_ac[ta], block, ss, se, al, eobrun
                )


# ---- encoder (fixture generator / sink path) ------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling (public IJG formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    coeffs = fdct2(block - 128.0)
    zz = np.round(coeffs.reshape(64)[ZIGZAG] / q).astype(np.int64)
    # DC
    diff = int(zz[0]) - pred
    t = int(diff != 0 and int(np.abs(diff)).bit_length() or 0)
    code, ln = dc_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(np.abs(v)).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder: (h, w, 3) RGB or (h, w) gray uint8 →
    bytes. Standard Annex K tables; ``subsampling`` is "4:4:4" or
    "4:2:0" (chroma halved both ways). ``restart_interval`` > 0 emits
    DRI + RSTn markers every N MCUs (exercises the decoder resync
    path; real encoders use it for error resilience / parallel decode)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    luma_q = _scale_qt(STD_LUMA_QT, quality)
    chroma_q = _scale_qt(STD_CHROMA_QT, quality)

    if gray:
        ycc = [img]
        factors = [(1, 1)]
        qts = [luma_q]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            # average-pool chroma 2x2 (pad to even first)
            def pool(p):
                ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:]])
                ph = ph if ph.shape[1] % 2 == 0 else np.hstack([ph, ph[:, -1:]])
                return (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0

            ycc = [y, pool(cb), pool(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            ycc = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        qts = [luma_q, chroma_q, chroma_q]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # pad each plane to its MCU-aligned size (edge replicate)
    padded = []
    for p, (hs, vs) in zip(ycc, factors):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        padded.append(pp)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tq, q in enumerate([luma_q] if gray else [luma_q, chroma_q]):
        zz = q.reshape(64)[ZIGZAG] if q.ndim == 2 else q[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq) + bytes(
            int(v) for v in zz
        )
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hs, vs = factors[i]
        tq = 0 if i == 0 else 1
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, tq)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (4 tables, or 2 for gray)
    tables = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if not gray:
        tables += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tcth, (bits, huffval) in tables:
        body = bytes([tcth]) + bytes(bits[1:17]) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [
        _build_encode_table(*STD_DC_LUMA),
        _build_encode_table(*STD_DC_CHROMA),
    ]
    enc_ac = [
        _build_encode_table(*STD_AC_LUMA),
        _build_encode_table(*STD_AC_CHROMA),
    ]
    bw = _BitWriter()
    pred = [0] * len(padded)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(padded)
            mcu_count += 1
            for ci, (p, (hs, vs)) in enumerate(zip(padded, factors)):
                ti = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qts[ci].astype(np.float64).reshape(64)[ZIGZAG],
                            pred[ci], enc_dc[ti], enc_ac[ti],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- progressive encoder (fixture generator for the SOF2 decode path) -----
#
# Emits the libjpeg-style default progression so every decoder
# procedure is exercised: an interleaved DC-first scan at Al=1, per-
# component AC-first scans with successive approximation (luma split
# into a 1-5 band then 6-63, chroma full-band), then the refinement
# scans (luma AC Ah=2→1, DC Ah=1→0, all AC Ah=1→0). AC scans use a
# flat 256-symbol/9-bit huffman table because the Annex K tables lack
# the EOBn (r>0, s=0) symbols progressive AC coding emits — fixture
# size beats entropy here.

#: all 256 AC symbols: 255 at code length 9 + one at length 10 (a DHT
#: count is a single byte, so 256-at-one-length is unrepresentable;
#: Kraft sum 255/512 + 1/1024 < 1 and the all-ones code is never
#: assigned)
_PROG_AC_TABLE = ([0] * 9 + [255, 1] + [0] * 6, list(range(256)))


class _ProgACWriter:
    """Per-scan AC state: pending EOB run + the correction bits that
    must follow its eventual EOBn symbol (G.1.2.2-3)."""

    def __init__(self, bw: _BitWriter, ac_tbl: dict):
        self.bw = bw
        self.ac = ac_tbl
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def sym(self, s: int) -> None:
        code, ln = self.ac[s]
        self.bw.write(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []

    def add_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_ac_first(wr: _ProgACWriter, zz, ss: int, se: int, al: int) -> None:
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        t = _trunc_shift(int(zz[k]), al)
        if t == 0:
            r += 1
            continue
        wr.flush_eob()
        while r > 15:
            wr.sym(0xF0)  # ZRL
            r -= 16
        s = abs(t).bit_length()
        wr.sym((r << 4) | s)
        wr.bw.write(t if t > 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        wr.add_eob()


def _enc_ac_refine(wr: _ProgACWriter, zz, ss: int, se: int, al: int) -> None:
    # G.1.2.3 / the libjpeg encode_mcu_AC_refine structure: newly-
    # significant coefficients (|t| == 1) are coded with run lengths
    # counted over zero-HISTORY positions only; already-significant
    # ones contribute a buffered correction bit emitted after the next
    # coded symbol (or after the EOBn covering them).
    absv = [abs(_trunc_shift(int(v), al)) for v in zz]
    eob = 0
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    r = 0
    local_bits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            wr.flush_eob()
            wr.sym(0xF0)
            r -= 16
            for b in local_bits:
                wr.bw.write(b, 1)
            local_bits = []
        if t > 1:  # already significant: correction bit only
            local_bits.append(t & 1)
            continue
        wr.flush_eob()
        wr.sym((r << 4) | 1)
        wr.bw.write(1 if zz[k] > 0 else 0, 1)
        r = 0
        for b in local_bits:
            wr.bw.write(b, 1)
        local_bits = []
    if r > 0 or local_bits:
        wr.eobrun += 1
        wr.pending_bits.extend(local_bits)
        if wr.eobrun == 0x7FFF:
            wr.flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """Progressive (SOF2) JPEG encoder — same quantized coefficients as
    :func:`encode_jpeg`, delivered as a spectral-selection + successive-
    approximation scan script, so ``decode_jpeg`` of the progressive
    stream must be PIXEL-IDENTICAL to decoding the baseline stream
    (the round-trip test's acceptance criterion)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    luma_q = _scale_qt(STD_LUMA_QT, quality)
    chroma_q = _scale_qt(STD_CHROMA_QT, quality)

    if gray:
        ycc = [img]
        factors = [(1, 1)]
        qts = [luma_q]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            def pool(p):
                ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:]])
                ph = ph if ph.shape[1] % 2 == 0 else np.hstack([ph, ph[:, -1:]])
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            ycc = [y, pool(cb), pool(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            ycc = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        qts = [luma_q, chroma_q, chroma_q]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # quantize every block once, into MCU-padded (BY, BX, 64) zigzag arrays
    coefs = []
    for p, (hs, vs), q in zip(ycc, factors, qts):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        qz = q.astype(np.float64).reshape(64)[ZIGZAG]
        arr = np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        for byi in range(arr.shape[0]):
            for bxi in range(arr.shape[1]):
                blk = pp[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8]
                c = fdct2(blk - 128.0)
                arr[byi, bxi] = np.round(c.reshape(64)[ZIGZAG] / qz).astype(np.int64)
        coefs.append(arr)

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate([luma_q] if gray else [luma_q, chroma_q]):
        zzq = q.reshape(64)[ZIGZAG] if q.ndim == 2 else q[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq) + bytes(
            int(v) for v in zzq
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hs, vs = factors[i]
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, STD_DC_LUMA), (0x10, _PROG_AC_TABLE)]
    if not gray:
        tables.append((0x01, STD_DC_CHROMA))
    for tcth, (bits, huffval) in tables:
        body = bytes([tcth]) + bytes(bits[1:17]) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    enc_dc = [
        _build_encode_table(*STD_DC_LUMA),
        _build_encode_table(*STD_DC_CHROMA),
    ]
    enc_ac = _build_encode_table(*_PROG_AC_TABLE)

    def comp_grid(ci: int) -> tuple[int, int]:
        hs, vs = factors[ci]
        return (
            (-(-(h * vs) // vmax) + 7) // 8,
            (-(-(w * hs) // hmax) + 7) // 8,
        )

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | 0])  # ta=0 (flat AC table)
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def dc_scan(ah, al) -> bytes:
        bw = _BitWriter()
        pred = [0] * nc
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nc):
                    hs, vs = factors[ci]
                    tbl = enc_dc[0 if ci == 0 else 1]
                    for by in range(vs):
                        for bx in range(hs):
                            c0 = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                            if ah == 0:
                                v = c0 >> al  # arithmetic shift (G.1.2.1)
                                diff = v - pred[ci]
                                pred[ci] = v
                                t = abs(diff).bit_length()
                                code, ln = tbl[t]
                                bw.write(code, ln)
                                if t:
                                    bw.write(
                                        diff if diff > 0 else diff + (1 << t) - 1, t
                                    )
                            else:
                                bw.write((c0 >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        bw = _BitWriter()
        wr = _ProgACWriter(bw, enc_ac)
        bh_n, bw_n = comp_grid(ci)
        for byi in range(bh_n):
            for bxi in range(bw_n):
                zz = coefs[ci][byi, bxi]
                if ah == 0:
                    _enc_ac_first(wr, zz, ss, se, al)
                else:
                    _enc_ac_refine(wr, zz, ss, se, al)
        wr.flush_eob()
        bw.flush()
        return bytes(bw.out)

    if gray:
        script = [
            (("dc",), 0, 0, 0, 1),
            (("ac", 0), 1, 63, 0, 1),
            (("dc",), 0, 0, 1, 0),
            (("ac", 0), 1, 63, 1, 0),
        ]
    else:
        script = [
            (("dc",), 0, 0, 0, 1),
            (("ac", 0), 1, 5, 0, 2),
            (("ac", 1), 1, 63, 0, 1),
            (("ac", 2), 1, 63, 0, 1),
            (("ac", 0), 6, 63, 0, 2),
            (("ac", 0), 1, 63, 2, 1),
            (("dc",), 0, 0, 1, 0),
            (("ac", 1), 1, 63, 1, 0),
            (("ac", 2), 1, 63, 1, 0),
            (("ac", 0), 1, 63, 1, 0),
        ]
    for kind, ss, se, ah, al in script:
        if kind[0] == "dc":
            out += sos_header(list(range(nc)), ss, se, ah, al)
            out += dc_scan(ah, al)
        else:
            ci = kind[1]
            out += sos_header([ci], ss, se, ah, al)
            out += ac_scan(ci, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)
