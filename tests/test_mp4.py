"""ISO-BMFF demuxer (functions/mp4.py): writer round-trip, a HAND-BUILT
file the writer cannot produce (uniform stsz, co64, version-1 mdhd, no
stss), the shared corrupt-stream contract, and the Spark frame-plan."""

from __future__ import annotations

import random
import struct

from amadeus_spark.functions import mp4


def _box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, *parts: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]), *parts)


def test_writer_roundtrip_and_ranges():
    frames = [bytes([i]) * (40 + 13 * i) for i in range(17)]
    blob = mp4.encode_mp4(
        frames, fps=25, width=320, height=200, keyframe_every=4, chunk_size=3
    )
    (track,) = mp4.parse_mp4(blob)
    assert (track.handler, track.timescale, len(track.samples)) == ("vide", 25, 17)
    for s in track.samples:
        assert blob[s.offset : s.offset + s.size] == frames[s.index]
    meta = mp4.mp4_metadata(blob)
    assert meta["width"] == 320 and meta["n_frames"] == 17
    assert meta["n_keyframes"] == 5  # 0,4,8,12,16
    keys = [r["frame_idx"] for r in mp4.mp4_sample_ranges(blob, keyframes_only=True)]
    assert keys == [0, 4, 8, 12, 16]
    every5 = mp4.mp4_sample_ranges(blob, every_n=5)
    assert [r["frame_idx"] for r in every5] == [0, 5, 10, 15]
    assert every5[1]["t_s"] == 5 / 25


def test_hand_built_file_uniform_sizes_co64_v1_no_stss():
    """A file assembled from raw spec bytes using features the fixture
    writer never emits: uniform sample size (stsz sz!=0), 64-bit co64
    offsets, version-1 mdhd, one sample per chunk, and NO stss (spec:
    every sample is then a sync sample)."""
    n, size = 6, 32
    frames = [bytes([0x40 + i]) * size for i in range(n)]
    stsz = _full(b"stsz", 0, struct.pack(">II", size, n))
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, 2))  # delta 2
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsd = _full(b"stsd", 0, struct.pack(">I", 1), _box(b"fkv1", b"\x00" * 8))

    def moov_with(offsets):
        co64 = _full(
            b"co64",
            0,
            struct.pack(">I", n),
            b"".join(struct.pack(">Q", o) for o in offsets),
        )
        stbl = _box(b"stbl", stsd, stts, stsc, stsz, co64)
        minf = _box(b"minf", stbl)
        hdlr = _full(b"hdlr", 0, b"\x00" * 4, b"vide", b"\x00" * 13)
        # version-1 mdhd: 64-bit times, timescale 1000, duration 12
        mdhd = _full(
            b"mdhd", 1, struct.pack(">QQIQ", 0, 0, 1000, 12), b"\x00" * 4
        )
        mdia = _box(b"mdia", mdhd, hdlr, minf)
        tkhd = _full(
            b"tkhd",
            1,
            struct.pack(">QQI", 0, 0, 7),  # v1 times, track_id 7
            b"\x00" * 4,
            struct.pack(">Q", 12),
            b"\x00" * 8,
            struct.pack(">hhhh", 0, 0, 0, 0),
            b"\x00" * 36,
            struct.pack(">II", 16 << 16, 9 << 16),
        )
        return _box(b"moov", _box(b"trak", tkhd, mdia))

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0))
    moov = moov_with([0] * n)
    mdat_start = len(ftyp) + len(moov) + 8
    offsets = [mdat_start + i * size for i in range(n)]
    blob = ftyp + moov_with(offsets) + _box(b"mdat", b"".join(frames))

    (track,) = mp4.parse_mp4(blob)
    assert track.track_id == 7
    assert track.codec == "fkv1"
    assert track.timescale == 1000
    assert (track.width, track.height) == (16.0, 9.0)
    assert [s.dts for s in track.samples] == [0, 2, 4, 6, 8, 10]
    assert all(s.keyframe for s in track.samples)  # no stss → all sync
    for s in track.samples:
        assert blob[s.offset : s.offset + s.size] == frames[s.index]


def test_corrupt_stream_contract():
    """Shared codec contract: malformed bytes raise ValueError — never
    struct.error / IndexError / KeyError (fuzz over truncations and
    byte flips of a valid file, plus adversarial table values)."""
    frames = [bytes([i]) * 64 for i in range(9)]
    blob = mp4.encode_mp4(frames)
    rng = random.Random(5)
    for _ in range(300):
        b = bytearray(blob)
        mode = rng.randrange(3)
        if mode == 0:
            b = b[: rng.randrange(1, len(b))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            b = b[: rng.randrange(1, len(b))] + bytes(
                rng.randrange(256) for _ in range(rng.randrange(32))
            )
        try:
            mp4.parse_mp4(bytes(b))
        except ValueError:
            pass  # the contract
        # parsing succeeding on a benign flip is fine; any other
        # exception type fails the test by propagating


def test_spark_mp4_frame_plan(spark):
    """Spark-side plumbing: mapInPandas demux emits (offset,size,t) per
    selected frame; ranges sliced from the payload match the original
    frames (the ranged-read property that makes this scale)."""
    from amadeus_spark.functions import multimodal as mm

    vids = []
    for mid in range(4):
        frames = [bytes([mid * 16 + i]) * (30 + i) for i in range(12)]
        vids.append((mid, mp4.encode_mp4(frames, fps=6, keyframe_every=3)))
    df = spark.createDataFrame(vids, "media_id long, payload binary")
    plan = mm.mp4_frame_sample_plan(df, every_n=4).collect()
    assert {r.media_id for r in plan} == {0, 1, 2, 3}
    assert sorted(r.frame_idx for r in plan if r.media_id == 1) == [0, 4, 8]
    payloads = dict(vids)
    for r in plan:
        blob = payloads[r.media_id]
        frame = blob[r.offset : r.offset + r.size]
        assert frame == bytes([r.media_id * 16 + r.frame_idx]) * (
            30 + r.frame_idx
        )
        assert r.keyframe == (r.frame_idx % 3 == 0)


def test_fragmented_roundtrip_and_ranges():
    """DASH/CMAF layout: init segment + moof/mdat pairs; trun per-sample
    sizes/flags, tfdt decode times, trex defaults."""
    frags = [[bytes([16 * f + i]) * (20 + 5 * i) for i in range(6)] for f in range(4)]
    blob = mp4.encode_fmp4(frags, fps=12, keyframe_every=6)
    (track,) = mp4.parse_mp4(blob)
    flat = [f for frag in frags for f in frag]
    assert len(track.samples) == 24
    for s in track.samples:
        assert blob[s.offset : s.offset + s.size] == flat[s.index]
    assert [s.dts for s in track.samples] == list(range(24))
    assert [s.index for s in track.samples if s.keyframe] == [0, 6, 12, 18]
    meta = mp4.mp4_metadata(blob)
    assert meta["n_frames"] == 24 and meta["n_keyframes"] == 4


def test_fragmented_hand_built_tfhd_defaults_and_base_offset():
    """Hand-built fragment exercising paths the writer never emits:
    tfhd carries DEFAULT sample size+duration (no per-sample trun
    fields) and an explicit 64-bit base-data-offset; trex supplies the
    flags default (non-sync), first-sample-flags marks the keyframe."""
    frame_size, n = 24, 5
    frames = [bytes([0x70 + i]) * frame_size for i in range(n)]

    # reuse the writer's init segment (it IS spec bytes), then a custom moof
    init = mp4.encode_fmp4([], fps=10)
    tfhd_flags = 0x000001 | 0x000008 | 0x000010  # base-offset + defaults
    trun_flags = 0x000001 | 0x000004  # data-offset + first-sample-flags
    trun = _full(
        b"trun",
        0,
        struct.pack(">I", n) + struct.pack(">i", 0) + struct.pack(">I", 0),
    )
    # assemble with placeholder offsets, then patch
    def moof_with(base):
        tfhd = _full(
            b"tfhd",
            0,
            struct.pack(">I", 1)
            + struct.pack(">Q", base)
            + struct.pack(">II", 3, frame_size),  # default dur=3, size
        )
        t = bytearray(tfhd)
        t[9:12] = tfhd_flags.to_bytes(3, "big")
        tr = bytearray(trun)
        tr[9:12] = trun_flags.to_bytes(3, "big")
        tfdt = _full(b"tfdt", 1, struct.pack(">Q", 100))
        traf = _box(b"traf", bytes(t), tfdt, bytes(tr))
        return _box(b"moof", _full(b"mfhd", 0, struct.pack(">I", 1)), traf)

    moof = moof_with(0)
    mdat_payload_at = len(init) + len(moof) + 8
    blob = init + moof_with(mdat_payload_at) + _box(b"mdat", b"".join(frames))

    (track,) = mp4.parse_mp4(blob)
    assert len(track.samples) == n
    for s in track.samples:
        assert blob[s.offset : s.offset + s.size] == frames[s.index]
    assert [s.dts for s in track.samples] == [100, 103, 106, 109, 112]
    # first-sample-flags (0 = sync) overrides trex's non-sync default
    assert [s.keyframe for s in track.samples] == [True] + [False] * 4


def test_fragmented_corrupt_contract():
    frags = [[bytes([i]) * 40 for i in range(5)] for _ in range(3)]
    blob = mp4.encode_fmp4(frags)
    rng = random.Random(9)
    for _ in range(200):
        b = bytearray(blob)
        if rng.random() < 0.5:
            b = b[: rng.randrange(1, len(b))]
        else:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            mp4.parse_mp4(bytes(b))
        except ValueError:
            pass
