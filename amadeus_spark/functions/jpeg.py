"""Pure-Python baseline JPEG codec (ITU-T T.81, public spec) — no PIL.

Closes the last closable media codec from the multimodal matrix
(reference parity target: the amadeus data model treats images as typed
binary cells; see amadeus-types/src/lib.rs image notes): the container
ships no PIL/ffmpeg, so compressed-image decode must be implemented from
the public spec or stubbed. PNG proved the pattern last round; this is
the JPEG twin.

Scope — baseline sequential DCT, the overwhelmingly common profile:

- decode: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI marker parse, 8-bit
  quant tables, interleaved scan, huffman entropy decode with byte
  unstuffing and restart markers, dequantize → inverse zigzag → 2-D
  IDCT (separable matrix form), chroma upsampling for any (h,v) factors
  in 1..2, YCbCr→RGB (or grayscale passthrough).
- encode (fixture generator / sink side): 4:4:4 or 4:2:0, standard
  Annex K quant tables scaled by quality, standard Annex K huffman
  tables, no restart intervals.

Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes
raise NotImplementedError — they are rare and genuinely out of scope.

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
    """Baseline-sequential JPEG → uint8 array (h, w, 3) RGB or (h, w)
    grayscale. Raises NotImplementedError for progressive/arithmetic/
    12-bit streams, ValueError for malformed data (low-level parse
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) — "
                "progressive/arithmetic/hierarchical not supported"
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

    # upsample to full resolution and crop
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
