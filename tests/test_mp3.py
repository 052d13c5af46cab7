"""MPEG-audio frame indexer (functions/mp3.py): header math vs the
public tables, hand-built streams, ID3/junk resync, fuzz contract."""

from __future__ import annotations

import random

import pytest

from amadeus_spark.functions import mp3


def test_frame_index_sizes_and_duration():
    blob = mp3.encode_mp3(n_frames=30, bitrate_idx=9, sample_rate_idx=0)
    frames = mp3.parse_mp3_frames(blob)
    assert len(frames) == 30
    # MPEG-1 L3 @128kbps/44100: 144*128000/44100 = 417 bytes, no padding
    assert all(f.size == 417 for f in frames)
    assert frames[1].offset == 417
    meta = mp3.mp3_metadata(blob)
    assert meta["n_frames"] == 30
    assert meta["sample_rate"] == 44100
    assert abs(meta["duration_s"] - 30 * 1152 / 44100) < 1e-9
    assert meta["bitrate_kbps_min"] == meta["bitrate_kbps_max"] == 128


def test_padding_id3_and_junk_resync():
    blob = mp3.encode_mp3(
        n_frames=12, bitrate_idx=9, sample_rate_idx=0, pad_every=3, id3_bytes=100
    )
    # splice tag junk between two frames (APEv2-style garbage)
    frames = mp3.parse_mp3_frames(blob)
    cut = frames[6].offset
    spliced = blob[:cut] + b"TAGJUNK" * 10 + blob[cut:]
    reframes = mp3.parse_mp3_frames(spliced)
    assert len(reframes) == 12
    padded = [f for f in reframes if f.size == 418]
    assert len(padded) == 4  # frames 0,3,6,9
    assert reframes[0].offset == 110  # ID3 header 10 + 100 skipped


def test_segment_ranges_cover_stream():
    blob = mp3.encode_mp3(n_frames=200)
    segs = mp3.mp3_segment_ranges(blob, segment_s=1.0)
    assert segs[0]["offset"] == 0
    # contiguous, non-overlapping, inside the file
    for a, b in zip(segs, segs[1:]):
        assert a["offset"] + a["size"] == b["offset"]
    total_t = sum(s["duration_s"] for s in segs)
    assert abs(total_t - 200 * 1152 / 44100) < 1e-6
    # every_n skips deterministically
    every2 = mp3.mp3_segment_ranges(blob, segment_s=1.0, every_n=2)
    assert [s["segment_idx"] for s in every2] == [s["segment_idx"] for s in segs][::2]


def test_vbr_stream_hand_built():
    """Frames with different bitrates (VBR): sizes follow each header's
    own table entry, metadata reports the range."""
    parts = []
    for idx in (5, 9, 12):  # 64 / 128 / 224 kbps
        parts.append(mp3.encode_mp3(n_frames=1, bitrate_idx=idx))
    blob = b"".join(parts)
    frames = mp3.parse_mp3_frames(blob)
    assert [f.bitrate_kbps for f in frames] == [64, 128, 224]
    assert [f.size for f in frames] == [
        1152 // 8 * kbps * 1000 // 44100 for kbps in (64, 128, 224)
    ]
    meta = mp3.mp3_metadata(blob)
    assert (meta["bitrate_kbps_min"], meta["bitrate_kbps_max"]) == (64, 224)


def test_corrupt_stream_contract():
    blob = mp3.encode_mp3(n_frames=8)
    rng = random.Random(11)
    for _ in range(300):
        b = bytearray(blob)
        mode = rng.randrange(3)
        if mode == 0:
            b = b[: rng.randrange(1, len(b))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4096)))
        try:
            mp3.parse_mp3_frames(bytes(b))
        except ValueError:
            pass  # the contract — anything else propagates and fails
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(b"\x00" * 100)
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]))
