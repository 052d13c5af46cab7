"""Pure-Python GIF codec (GIF87a/89a, CompuServe spec) — no PIL needed.

Decoder: full variable-width LZW (code growth to 12 bits, clear/EOI
handling, the deferred-clear edge), global and local color tables,
extension-block skipping, interlaced row reordering. First image frame
of an animation is decoded (the frame-sample plumbing in multimodal.py
slices frames at the metadata level, not here).

Encoder (fixture-side): the classic "uncompressed GIF" technique — every
pixel index is emitted as a literal code with a CLEAR before the
decoder's table would force a width change, so the encoder never tracks
the dictionary yet any conforming decoder accepts the stream. ≤256
unique colors (true GIF constraint).

Same role as jpeg.py: the reference treats media as opaque bytes; these
codecs make the multimodal plumbing REAL for one more format instead of
stubbed (multimodal.py's decode dispatch sniffs the magic).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: codes packed LSB-first, width starts at
    min_code_size+1 and grows when the next free slot reaches 2^width
    (capped at 12 bits until the next CLEAR)."""
    if not 2 <= min_code_size <= 11:
        # spec range is 2..8 (+1 slack); a corrupted size byte would
        # otherwise allocate a 2^n-entry table before any decode error
        raise ValueError(f"invalid LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    prev: tuple[int, ...] | None = None
    out: list[int] = []

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # missing EOI — tolerate truncated streams
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = table[code]
            out.extend(entry)
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        table.append(prev + (entry[0],))
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


def _lzw_encode_uncompressed(indices: np.ndarray, min_code_size: int) -> bytes:
    """Literal-codes-only LZW: CLEAR resets before the decoder's table
    would reach 2^(min_code_size+1), so every code stays width
    min_code_size+1."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    reset_every = max(1, (1 << min_code_size) - 2)

    acc = 0
    nbits = 0
    body = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    since_clear = 0
    for v in indices.tolist():
        emit(int(v))
        since_clear += 1
        if since_clear >= reset_every:
            emit(clear)
            since_clear = 0
    emit(end)
    if nbits:
        body.append(acc & 0xFF)
    return bytes(body)


# ------------------------------------------------------------- container


def encode_gif(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> single-frame GIF89a with a global color table."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF allows at most 256 colors; quantize first")
    n = len(palette)
    table_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    table_size = 1 << table_bits
    padded = np.zeros((table_size, 3), dtype=np.uint8)
    padded[:n] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((table_bits - 1) & 7), 0, 0)
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = max(2, table_bits)
    out.append(mcs)
    body = _lzw_encode_uncompressed(indices.astype(np.int64), mcs)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive 0,8,16.. then 4,12.. then
    2,6.. then 1,3.. — rebuild natural order."""
    h = rows.shape[0]
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> HxWx3 uint8 (first frame). Raises ValueError for
    malformed data — low-level parse failures (truncated headers, pixel
    indices past the color table, short reads) are normalized to
    ValueError at this boundary, same contract as decode_jpeg, so
    corrupt media cells never surface raw struct.error/IndexError."""
    try:
        return _decode_gif_inner(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt GIF stream: {type(e).__name__}") from e


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        global_table = np.frombuffer(
            payload, dtype=np.uint8, count=size * 3, offset=pos
        ).reshape(size, 3)
        pos += size * 3

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF truncated inside extension block")
            pos += 1
        elif block == 0x2C:  # image descriptor
            fx, fy, fw, fh, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            table = global_table
            if ipacked & 0x80:
                size = 2 << (ipacked & 7)
                table = np.frombuffer(
                    payload, dtype=np.uint8, count=size * 3, offset=pos
                ).reshape(size, 3)
                pos += size * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            mcs = payload[pos]
            pos += 1
            body = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                body += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF truncated inside image data")
            pos += 1
            idx = _lzw_decode(bytes(body), mcs)
            if len(idx) < fw * fh:
                raise ValueError("GIF pixel data truncated")
            rows = np.array(idx[: fw * fh], dtype=np.int64).reshape(fh, fw)
            if ipacked & 0x40:
                rows = _deinterlace(rows)
            if rows.size and int(rows.max()) >= len(table):
                raise ValueError("GIF pixel index beyond color table")
            return table[rows]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")
