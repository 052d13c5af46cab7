"""MPEG audio (MP3) frame indexer — pure Python, no codec.

The audio twin of mp4.py's container demuxer: MPEG-1/2 audio is a
self-framing stream (every frame carries a 4-byte header with version /
layer / bitrate / samplerate / padding — public ISO/IEC 11172-3 header
layout), so walking the headers yields the full frame index — offsets,
sizes, per-frame duration — without decoding a single sample. That index
is what a 100 TB audio pipeline needs: segment sampling becomes ranged
reads of chosen frame runs; the DSP decode of those windows is the
library-gated step (same posture as H.264 inside MP4).

Handles: ID3v2 prefix skip (syncsafe size), MPEG-1/2/2.5 layers I-III,
padding, free-format rejection, bounded resync over junk bytes (real
files contain tag garbage between frames). Corrupt-stream contract
(shared with gif/jpeg/mp4): malformed input raises ValueError, never
IndexError/struct.error.
"""

from __future__ import annotations

from dataclasses import dataclass

# bitrate kbps tables [version][layer][index]; index 0 = free (reject),
# 15 = bad. Public ISO 11172-3 / 13818-3 values.
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATES = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000], 25: [11025, 12000, 8000]}
#: samples per frame [version][layer]
_SPF = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
        (2, 1): 384, (2, 2): 1152, (2, 3): 576,
        (25, 1): 384, (25, 2): 1152, (25, 3): 576}

_RESYNC_WINDOW = 64 * 1024  # max junk to scan past before giving up


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt MP3: {msg}")


@dataclass
class Frame:
    index: int
    offset: int
    size: int
    duration_s: float
    bitrate_kbps: int
    sample_rate: int


def _parse_header(b: bytes) -> tuple[int, int, int] | None:
    """(frame_size, bitrate_kbps, sample_rate) or None if not a valid
    frame header at b[0:4]."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[1] >> 3) & 0x3
    version = {0: 25, 2: 2, 3: 1}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((b[1] >> 1) & 0x3)
    if version is None or layer is None:
        return None
    br_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:  # free-format / invalid
        return None
    table_ver = 2 if version in (2, 25) else 1
    bitrate = _BITRATES[(table_ver, layer)][br_idx] * 1000
    sample_rate = _SAMPLERATES[version][sr_idx]
    padding = (b[2] >> 1) & 0x1
    spf = _SPF[(version, layer)]
    if layer == 1:
        size = (12 * bitrate // sample_rate + padding) * 4
    else:
        size = spf // 8 * bitrate // sample_rate + padding
    if size < 4:
        return None
    return size, bitrate // 1000, sample_rate


def _skip_id3(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size, high bit of each byte must be 0
    if any(data[i] & 0x80 for i in range(6, 10)):
        raise _err("ID3v2 size is not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size


def parse_mp3_frames(data: bytes) -> list[Frame]:
    """Full frame index. Resyncs over up to _RESYNC_WINDOW junk bytes
    between frames (tag garbage); raises ValueError if no frame is ever
    found or a resync window is exhausted mid-file."""
    pos = _skip_id3(data)
    if pos >= len(data):
        raise _err("nothing after ID3 tag")
    frames: list[Frame] = []
    junk_start = pos
    while pos + 4 <= len(data):
        hdr = _parse_header(data[pos : pos + 4])
        if hdr is None:
            pos += 1
            if pos - junk_start > _RESYNC_WINDOW:
                raise _err(f"no sync within {_RESYNC_WINDOW} bytes of {junk_start}")
            continue
        size, kbps, sr = hdr
        if pos + size > len(data):
            break  # trailing truncated frame: index what's complete
        frames.append(
            Frame(
                index=len(frames),
                offset=pos,
                size=size,
                duration_s=_SPF[_frame_version_layer(data, pos)] / sr,
                bitrate_kbps=kbps,
                sample_rate=sr,
            )
        )
        pos += size
        junk_start = pos
    if not frames:
        raise _err("no MPEG audio frames found")
    return frames


def _frame_version_layer(data: bytes, pos: int) -> tuple[int, int]:
    b1 = data[pos + 1]
    version = {0: 25, 2: 2, 3: 1}[(b1 >> 3) & 0x3]
    layer = {1: 3, 2: 2, 3: 1}[(b1 >> 1) & 0x3]
    return version, layer


def mp3_metadata(data: bytes) -> dict:
    """Metadata-struct fields without decoding: frame count, duration,
    sample rate, min/max bitrate (VBR shows as a range)."""
    frames = parse_mp3_frames(data)
    return {
        "n_frames": len(frames),
        "duration_s": sum(f.duration_s for f in frames),
        "sample_rate": frames[0].sample_rate,
        "bitrate_kbps_min": min(f.bitrate_kbps for f in frames),
        "bitrate_kbps_max": max(f.bitrate_kbps for f in frames),
    }


def mp3_segment_ranges(
    data: bytes, segment_s: float = 10.0, every_n: int = 1
) -> list[dict]:
    """Segment-sampling plan: contiguous frame runs of ~segment_s
    seconds, every_n-th segment selected — byte ranges for ranged reads,
    the audio twin of mp4_sample_ranges."""
    frames = parse_mp3_frames(data)
    segs: list[dict] = []
    run_start = 0
    t0 = 0.0
    t = 0.0
    for i, f in enumerate(frames):
        t += f.duration_s
        last = i == len(frames) - 1
        if t - t0 >= segment_s or last:
            first, until = frames[run_start], frames[i]
            segs.append(
                {
                    "segment_idx": len(segs),
                    "offset": first.offset,
                    "size": until.offset + until.size - first.offset,
                    "t_start_s": t0,
                    "duration_s": t - t0,
                }
            )
            run_start = i + 1
            t0 = t
    return [s for s in segs if s["segment_idx"] % every_n == 0]


# ---- fixture writer --------------------------------------------------------


def encode_mp3(
    n_frames: int = 20,
    bitrate_idx: int = 9,
    sample_rate_idx: int = 0,
    pad_every: int = 0,
    id3_bytes: int = 0,
) -> bytes:
    """Valid MPEG-1 Layer III frame sequence with opaque payloads (this
    exercises the INDEXER's header math, incl. padding and ID3 skip; it
    performs no audio encoding). Payload bytes are a deterministic
    pattern so tests can verify ranged slices."""
    out = bytearray()
    if id3_bytes:
        size = id3_bytes
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += bytes(i & 0x7F for i in range(size))
    for i in range(n_frames):
        padding = 1 if pad_every and i % pad_every == 0 else 0
        hdr = bytes(
            [
                0xFF,
                0xFB,  # MPEG-1 layer III, no CRC
                (bitrate_idx << 4) | (sample_rate_idx << 2) | (padding << 1),
                0x00,
            ]
        )
        bitrate = _BITRATES[(1, 3)][bitrate_idx] * 1000
        sr = _SAMPLERATES[1][sample_rate_idx]
        size = 1152 // 8 * bitrate // sr + padding
        payload = bytes((i + j) & 0xFF for j in range(size - 4))
        out += hdr + payload
    return bytes(out)
