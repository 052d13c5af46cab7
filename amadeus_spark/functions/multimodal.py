"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, plus distributed decode / feature-extract / resize /
frame-sample plumbing.

Design (per BASELINE.json north star): media bytes ride in BinaryType
columns; per-item metadata (format, dims, duration) is a struct column so
filters/pruning work without touching bytes. Heavy transforms run as
Arrow-batched ``mapInPandas`` — one Python worker per partition, bytes
never pass through the driver. At 100 TB: media rows are large, so the
governing knobs are ``spark.sql.files.maxPartitionBytes`` (split size) and
keeping metadata-only queries from reading the binary column (columnar
Parquet prunes it automatically — verified in tests via ReadSchema).

Decode kernels are REAL for formats that need no external codec library:

- **PPM (P6)** images — pure numpy parse of the public netpbm format,
  nearest-neighbor resize, per-channel mean/std features.
- **WAV (RIFF PCM)** audio — stdlib ``wave`` + numpy; RMS / zero-crossing
  / peak features.
- **RAWV** video — a trivial length-prefixed container of PPM frames
  (public formats composed; defined below) so frame *sampling* decode
  is exercised for real: the metadata-only plan picks frame indices,
  then only those offsets are decoded executor-side.

PNG ALSO decodes for real via a pure stdlib-zlib codec
(``decode_png`` — all five scanline filters),
and JPEG — baseline-sequential AND progressive (SOF2) — decodes for
real via the pure-numpy T.81 codec in ``jpeg.py`` (huffman + dequant +
IDCT, 4:2:0/4:4:4, restart markers, multi-scan successive
approximation). decode_png additionally covers Adam7 interlace,
paletted (PLTE), 16-bit and sub-byte depths — the full static PNG
matrix. The remaining formats (MP4/MP3 inner codecs, arithmetic JPEG)
genuinely require PIL/ffmpeg, which are
NOT in this container — those raise ``NotImplementedError`` unless
``fake=True`` supplies the deterministic digest fallback. The Spark-side
plumbing (schema, batching, partitioning, UDF signature) is identical
either way.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # ppm|wav|rawv|png|...
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# ---------------------------------------------------------------- codecs


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 H×W×3 array → binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB; expected H×W×3")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 H×W×3. Pure-numpy parse of the public
    netpbm grammar: magic, whitespace/comment-separated w h maxval,
    single whitespace, raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: three ints after the magic, skipping comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # the single whitespace byte after maxval
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(ph, pw, channels) samples → filter-0 scanlines at ``depth``."""
    ph, pw, channels = samples.shape
    out = bytearray()
    for y in range(ph):
        if depth == 8:
            row = samples[y].astype(np.uint8).tobytes()
        elif depth == 16:
            row = samples[y].astype(">u2").tobytes()
        else:
            vals = samples[y].reshape(-1).astype(np.uint8)
            bits = np.zeros(len(vals) * depth, dtype=np.uint8)
            for b in range(depth):
                bits[b::depth] = (vals >> (depth - 1 - b)) & 1
            row = np.packbits(bits).tobytes()
        out += b"\x00" + row
    return bytes(out)


def _png_body(samples: np.ndarray, depth: int, interlace: bool) -> bytes:
    if not interlace:
        return _png_pack_rows(samples, depth)
    h, w = samples.shape[:2]
    out = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        sub = samples[y0::ys, x0::xs]
        if sub.shape[0] and sub.shape[1]:
            out += _png_pack_rows(sub, depth)
    return bytes(out)


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """H×W×3 RGB or H×W gray → PNG (filter-0 rows, one IDAT). uint16
    input writes a 16-bit-depth file; ``interlace`` writes Adam7.
    Pure stdlib: struct + zlib (spec: RFC 2083 / ISO 15948 — public)."""
    depth = 16 if img.dtype == np.uint16 else 8
    if img.ndim == 2:
        color_type = 0
        samples = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
        samples = img
    else:
        raise ValueError("encode_png supports H×W gray or H×W×3 RGB")
    import struct
    import zlib

    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(_png_body(samples, depth, interlace)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_paletted(
    img: np.ndarray, interlace: bool = False, depth: int = 8
) -> bytes:
    """H×W×3 RGB with ≤ 2^depth distinct colors → paletted (color type
    3) PNG; sub-byte depths pack indices MSB-first."""
    import struct
    import zlib

    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > (1 << depth):
        raise ValueError(f"{len(palette)} colors exceed {depth}-bit palette")
    idx = inverse.reshape(h, w, 1).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(_png_body(idx, depth, interlace)))
        + _png_chunk(b"IEND", b"")
    )


#: Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, offset: int, pw: int, ph: int,
                  channels: int, depth: int) -> tuple[np.ndarray, int]:
    """Undo per-scanline filtering for one image (or interlace pass):
    (ph, stride) uint8 rows + bytes consumed. The filter distance is
    bytes-per-pixel (max 1 for sub-byte depths), per the spec — using
    the CHANNEL count would be wrong for 16-bit and packed rows."""
    bits_pp = channels * depth
    stride = (pw * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    need = ph * (stride + 1)
    if len(raw) < offset + need:
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(ph):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            # int() promotions: a uint8 scalar add overflows (numpy
            # warns in a codec hot loop); & 0xFF is the spec's mod-256
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out, need


def _png_samples(rows: np.ndarray, pw: int, channels: int, depth: int) -> np.ndarray:
    """(ph, stride) filtered-removed bytes → (ph, pw, channels) samples
    (uint8, or uint16 for depth 16)."""
    ph = rows.shape[0]
    if depth == 8:
        return rows[:, : pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        u16 = (
            rows.reshape(ph, -1, 2)[:, :, 0].astype(np.uint16) << 8
        ) | rows.reshape(ph, -1, 2)[:, :, 1]
        return u16[:, : pw * channels].reshape(ph, pw, channels)
    # sub-byte: MSB-first bit groups of `depth`
    bits = np.unpackbits(rows, axis=1)
    vals = np.zeros((ph, bits.shape[1] // depth), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b::depth][:, : vals.shape[1]]
    return vals[:, : pw * channels].reshape(ph, pw, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG decode, pure stdlib (zlib) + numpy, covering the full static
    feature matrix: bit depths 1/2/4/8/16, gray / RGB / gray+alpha /
    RGBA / PALETTED (PLTE lookup), all five scanline filters, and Adam7
    interlacing (7 sub-images reassembled on the pass grid). Alpha is
    dropped and 16-bit narrows to the high byte — the feature kernels
    take uint8. APNG animation chunks are ignored (first frame wins)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = b""
    plte = None
    w = h = depth = color_type = interlace = None
    try:
        while pos < len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            elif tag == b"PLTE":
                plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
    except struct.error as e:
        raise ValueError("corrupt PNG chunk structure") from e
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None or interlace not in (0, 1):
        raise ValueError(
            f"bad PNG header (color_type={color_type}, interlace={interlace})"
        )
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }[color_type]
    if depth not in valid_depths:
        raise ValueError(f"bad PNG depth {depth} for color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        # corrupt-stream contract shared with the GIF/JPEG codecs:
        # malformed payloads raise ValueError, never a library error
        raise ValueError("corrupt PNG stream (zlib)") from e

    dtype = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, channels), dtype=dtype)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, w, h, channels, depth)
        img = _png_samples(rows, w, channels, depth).astype(dtype)
    else:
        offset = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            rows, used = _png_unfilter(raw, offset, pw, ph, channels, depth)
            offset += used
            img[y0::ys, x0::xs] = _png_samples(rows, pw, channels, depth)

    if color_type == 3:
        idx = img[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if depth == 16:
        img = (img >> 8).astype(np.uint8)
    elif depth < 8 and color_type == 0:
        # expand sub-byte gray to full 8-bit range (bit replication)
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if channels == 1:
        return img[:, :, 0]
    if channels == 2:  # gray+alpha → gray
        return img[:, :, 0]
    if channels == 4:  # RGBA → RGB (alpha dropped)
        return img[:, :, :3]
    return img


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (float32 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
        width = wf.getsampwidth()
    if width != 2:
        raise NotImplementedError("only 16-bit PCM supported")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    return x, sr


RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    """Trivial video container: magic, uint32 frame count, then
    length-prefixed PPM frames. Exists so frame-sample *decode* has a
    real format to seek into without ffmpeg."""
    parts = [RAWV_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(struct.pack("<I", len(ppm)))
        parts.append(ppm)
    return b"".join(parts)


def decode_rawv_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Decode one frame from a RAWV payload by walking the length
    prefixes — only the requested frame's raster is materialized."""
    if payload[:4] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    if not 0 <= frame_idx < n:
        raise IndexError(f"frame {frame_idx} out of range ({n} frames)")
    pos = 8
    for i in range(frame_idx):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4 + ln
    (ln,) = struct.unpack_from("<I", payload, pos)
    return decode_ppm(payload[pos + 4 : pos + 4 + ln])


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (no interpolation libs)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


# ------------------------------------------------------------- features


def image_features(img: np.ndarray) -> list[float]:
    """8-dim: h, w, per-channel means, overall std, min, max (float32)."""
    f = img.astype(np.float32)
    return [
        float(img.shape[0]),
        float(img.shape[1]),
        float(f[..., 0].mean()),
        float(f[..., 1].mean()),
        float(f[..., 2].mean()),
        float(f.std()),
        float(f.min()),
        float(f.max()),
    ]


def audio_features(x: np.ndarray, sr: int) -> list[float]:
    """8-dim: n, sr, duration, mean, rms, peak, zero-crossing rate, std."""
    n = len(x)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
    return [
        float(n),
        float(sr),
        float(n / sr) if sr else 0.0,
        float(x.mean()) if n else 0.0,
        float(np.sqrt(np.mean(x * x))) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zcr,
        float(x.std()) if n else 0.0,
    ]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload to a feature vector.

    PPM (P6) decodes for real (pure numpy) and PNG (8-bit,
    non-interlaced) decodes for real via the stdlib-zlib codec above.
    The remaining compressed formats (JPEG/MP4/...) need PIL/ffmpeg
    (not in this container): ``fake=True`` gives a deterministic 8-dim
    digest-based vector so the distributed plumbing stays testable
    end-to-end for them too."""
    if payload[:2] == b"P6":
        return image_features(decode_ppm(payload))
    if payload[:8] == _PNG_MAGIC:
        img = decode_png(payload)
        if img.ndim == 2:  # grayscale → replicate to 3 channels
            img = np.stack([img] * 3, axis=-1)
        return image_features(img)
    if payload[:2] == b"\xff\xd8":
        from amadeus_spark.functions.jpeg import decode_jpeg

        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return image_features(img)
    if payload[:4] == b"GIF8":
        from amadeus_spark.functions.gif import decode_gif

        return image_features(decode_gif(payload))
    if not fake:
        raise NotImplementedError(
            "compressed-image decode beyond PNG/baseline-JPEG/GIF "
            "requires PIL/torchvision; not available in this "
            "environment — run with fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def decode_media(payload: bytes, fake: bool = False) -> list[float]:
    """Magic-sniffing dispatch: P6 → image features, RIFF/WAVE → audio
    features, RAWV → first-frame image features; anything else follows
    the ``decode_image`` stub contract."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(*decode_wav(payload))
    if payload[:4] == RAWV_MAGIC:
        return image_features(decode_rawv_frame(payload, 0))
    return decode_image(payload, fake=fake)


# ------------------------------------------------------- distributed ops


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed feature extraction over media payloads (mapInPandas,
    Arrow batches; bytes stay on executors). Real decode for PPM/WAV/RAWV
    payloads; ``fake`` governs the digest fallback for compressed ones."""

    def _extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "feature": decode_media(b, fake=fake) if b else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return df.select("media_id", "payload").mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: metadata-only selection of which
    frames to decode (frame indices from duration/fps metadata), so the
    expensive decode only touches selected offsets. Returns
    (media_id, frame_idx) pairs via sequence+explode — pure exprs."""
    n_frames = F.coalesce(F.element_at("meta", "n_frames").cast("int"), F.lit(0))
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (
        df.filter(F.col("kind") == "video")
        # missing/zero n_frames → no frames to sample, not a crashed job
        # (sequence(0,-1,30) is illegal and would abort the query)
        .filter(n_frames >= 1)
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling end-to-end: metadata-only index plan joined back to
    payloads, then per-selected-frame RAWV decode in mapInPandas. Only
    the chosen frames' rasters are materialized (the container is walked
    by length prefix); at scale the join keeps payload bytes on their
    partition — the small index side broadcasts."""
    plan = frame_sample_plan(df, every_n)
    # the index plan is (long, long) pairs — tiny relative to payloads;
    # broadcasting keeps payload bytes on their partitions (no shuffle
    # of the binary column). A huge video corpus would drop the hint
    # and let AQE pick.
    sel = df.select("media_id", "payload").join(F.broadcast(plan), "media_id")

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, idx in zip(
                pdf["media_id"], pdf["payload"], pdf["frame_idx"]
            ):
                frame = decode_rawv_frame(bytes(payload), int(idx))
                rows.append(
                    {
                        "media_id": int(mid),
                        "frame_idx": int(idx),
                        "feature": image_features(frame),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURE_SCHEMA]
            )

    return sel.mapInPandas(_decode, schema=FRAME_FEATURE_SCHEMA)


MP4_PLAN_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("t_s", T.DoubleType()),
        T.StructField("offset", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("keyframe", T.BooleanType()),
    ]
)


def mp4_frame_sample_plan(
    df: DataFrame, every_n: int = 30, keyframes_only: bool = False
) -> DataFrame:
    """MP4 frame-sampling plan over a payload column: demux each file's
    sample tables (mp4.py, pure-Python ISO-BMFF — no codec) and emit the
    selected frames' BYTE RANGES + timestamps. This is the real-world
    version of frame_sample_plan: with range-capable storage the decode
    stage fetches (offset, size) windows instead of whole files — at
    100 TB the sampled bytes are typically <5% of the corpus. The codec
    decode of those slices stays library-gated (NotImplementedError
    path in decode_image), exactly like arithmetic-coded JPEG."""
    from amadeus_spark.functions import mp4 as _mp4

    def _plan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for r in _mp4.mp4_sample_ranges(
                    bytes(payload), every_n=every_n, keyframes_only=keyframes_only
                ):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": r["frame_idx"],
                            "t_s": r["t_s"],
                            "offset": r["offset"],
                            "size": r["size"],
                            "keyframe": r["keyframe"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP4_PLAN_SCHEMA]
            )

    return df.select("media_id", "payload").mapInPandas(
        _plan, schema=MP4_PLAN_SCHEMA
    )


MP3_PLAN_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("segment_idx", T.LongType()),
        T.StructField("t_start_s", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("offset", T.LongType()),
        T.StructField("size", T.LongType()),
    ]
)


def mp3_segment_sample_plan(
    df: DataFrame, segment_s: float = 10.0, every_n: int = 1
) -> DataFrame:
    """Audio segment-sampling plan over MP3 payloads: frame-header walk
    (mp3.py, no decode) groups frames into ~segment_s runs and emits the
    selected segments' byte ranges — the audio twin of
    mp4_frame_sample_plan (ranged reads instead of whole-file decode;
    the DSP decode of chosen windows stays library-gated)."""
    from amadeus_spark.functions import mp3 as _mp3

    def _plan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for r in _mp3.mp3_segment_ranges(
                    bytes(payload), segment_s=segment_s, every_n=every_n
                ):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "segment_idx": r["segment_idx"],
                            "t_start_s": r["t_start_s"],
                            "duration_s": r["duration_s"],
                            "offset": r["offset"],
                            "size": r["size"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MP3_PLAN_SCHEMA])

    return df.select("media_id", "payload").mapInPandas(
        _plan, schema=MP3_PLAN_SCHEMA
    )


# --------------------------------------------------------------- testdata


def make_fake_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests (opaque
    payloads — exercises the digest fallback path)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (f"media-{i}-" + "x" * (i % 17)).encode()
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                {"n_frames": str(90 + i)} if kind == "video" else {},
                payload,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def real_media_rows(n: int = 64) -> list[tuple]:
    """Pure-Python row source for :func:`make_real_media` — the ONE
    place the deterministic real-payload fixtures are constructed, so
    the gate queries and the golden-oracle replay (functions/
    media_golden.py) provably share the same input bytes."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = 8 + i % 5, 6 + i % 7
            y, x = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(y * 7 + i) % 256, (x * 11 + i) % 256, (y + x + i) % 256], axis=-1
            ).astype(np.uint8)
            sel = (i // 3) % 3
            if sel == 0:
                payload, fmt = encode_ppm(img), "ppm"
            elif sel == 1:
                payload, fmt = encode_png(img), "png"
            else:
                from amadeus_spark.functions.jpeg import encode_jpeg

                payload, fmt = encode_jpeg(img, quality=95), "jpeg"
            meta = {"h": str(h), "w": str(w)}
        elif kind == "audio":
            sr, dur = 8000, 0.05 + (i % 4) * 0.01
            t = np.arange(int(sr * dur))
            tone = (np.sin(2 * np.pi * (220 + 10 * i) * t / sr) * 12000).astype(
                np.int16
            )
            payload, fmt, meta = encode_wav(tone, sr), "wav", {"sr": str(sr)}
        else:
            nf = 4 + i % 5
            frames = [
                np.full((4, 4, 3), (i + 13 * f) % 256, dtype=np.uint8)
                for f in range(nf)
            ]
            payload, fmt, meta = encode_rawv(frames), "rawv", {"n_frames": str(nf)}
        rows.append((i, kind, fmt, meta, payload))
    return rows


def make_real_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL decodable payloads: PPM and
    PNG gradient images (alternating with baseline JPEG), WAV sine
    tones, RAWV frame stacks. Rows come from :func:`real_media_rows`."""
    return spark.createDataFrame(real_media_rows(n), schema=MEDIA_SCHEMA)
