"""Golden expectations for the deterministic media/demux gate queries —
the wds_golden/pg_golden discipline applied to the codec family.

Four registry queries run over SYNTHETIC, sf-independent fixtures and
were previously rows-only (no external oracle): ``mp4_frame_plan``,
``mp3_segment_plan``, ``media_frame_sample``, ``multimodal_features``.
This module derives each query's expected output INDEPENDENTLY of the
parser/decoder under test and renders it as literal-VALUES SQL for the
driver's DuckDB compare (reference precedent: golden scalar asserts on
checked-in fixtures, /root/reference/tests/parquet.rs:19-48).

Independence, per query:

- ``expected_mp4_plan``: the demuxer (functions/mp4.py) derives frame
  byte ranges from the SAMPLE TABLES (stts/stsz/stsc/stco/stss) or
  moof/trun runs. The replay here never reads those tables — it walks
  only the TOP-LEVEL box sizes (8-byte size+tag, the first layer of
  ISO-BMFF) to find each mdat payload start, then lays the closed-form
  frame sizes (30 + 3·i) sequentially. A table-construction bug in the
  encoder or a table-parse bug in the demuxer breaks the match; only
  "boxes are length-prefixed" is shared.
- ``expected_mp3_plan``: pure arithmetic — the public MPEG-1 Layer III
  frame-length formula (144·bitrate/samplerate + padding, ISO 11172-3)
  cumsum'd over the fixture's parameters. No byte is parsed; the
  header walk in functions/mp3.py is exercised only on the Spark side.
- ``expected_frame_sample``: closed form. The RAWV fixture's frames
  are constant rasters (fill value (i + 13·f) % 256), so channel-0
  mean == fill value; the replay computes the selected-frame average
  without touching decode_rawv_frame / image_features.
- ``expected_features``: payload bytes + sha come straight from the
  shared fixture generator (multimodal.real_media_rows — the single
  source of truth the Spark query also loads); the feature element is
  recomputed INLINE with numpy on closed-form rasters/tones (not via
  multimodal.image_features/audio_features/decode_*), so a regression
  in the decode or feature kernels breaks the gate. The lossy-JPEG
  rows are the exception: their decoded raster can only come from the
  decoder, so their feature values are FROZEN literals
  (:data:`JPEG_FEAT3`) pinned by a drift test — a later decoder
  regression flips both the pin test and the external gate.

Float discipline: Spark's ``round(col, d)`` is BigDecimal HALF_UP on
the exact binary double; :func:`_round_half_up` replicates it with
``decimal``. Feature values transit Arrow as float32 (FEATURE_SCHEMA),
so replays pass values through ``np.float32`` before widening —
bit-identical to what the executor emits.
"""

from __future__ import annotations

import hashlib
import math
import struct
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

#: closed-form mp4 fixture layout: 8 files x 24 frames, frame i is
#: (30 + 3*i) bytes of fill value (mid*16 + i) % 256; odd media_ids use
#: the fragmented (DASH/CMAF) layout in 4 fragments of 6 frames.
MP4_N_FILES = 8
MP4_N_FRAMES = 24
MP4_FPS = 12
MP4_KEYFRAME_EVERY = 6
MP4_FRAG_LEN = 6
MP4_EVERY_N = 5

#: mp3 fixture: 6 streams, MPEG-1 Layer III @ 44100 Hz; stream `mid`
#: has 120 + 10*mid frames at bitrate index 5 + mid, padding every 3rd
#: frame on odd ids. Bitrate table slice is the public ISO 11172-3
#: MPEG-1 Layer III column (kbps) for indexes 5..10.
MP3_N_STREAMS = 6
MP3_SR = 44100
MP3_SPF = 1152
MP3_KBPS = {5: 64, 6: 80, 7: 96, 8: 112, 9: 128, 10: 160}
MP3_SEGMENT_S = 1.0
MP3_EVERY_N = 2

#: media_frame_sample / multimodal_features fixture size + sampling
MEDIA_N = 64
FRAME_EVERY_N = 2

#: FROZEN feature[3] (1-based; channel-0 float32 mean of the DECODED
#: raster) for the lossy baseline-JPEG rows of real_media_rows(64) —
#: the one feature the replay cannot derive without running the
#: decoder. Pinned by tests/test_media_golden.py against a live
#: decode_jpeg recompute; regenerate with
#: scripts/freeze_media_golden.py after an INTENTIONAL codec change.
JPEG_FEAT3: dict[int, float] = {
    6: 33.99074172973633,
    15: 39.92856979370117,
    24: 62.49074172973633,
    33: 67.85950469970703,
    42: 73.4000015258789,
    51: 78.97222137451172,
    60: 84.4625015258789,
}


def _round_half_up(x: float, digits: int) -> float:
    """Spark ``round(double, d)``: BigDecimal(double) — the EXACT
    binary value — setScale(d, HALF_UP), back to double."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


# ------------------------------------------------------------ fixtures


def mp4_frame_sizes() -> list[int]:
    return [30 + 3 * i for i in range(MP4_N_FRAMES)]


def mp4_fixture_rows() -> list[tuple[int, bytes]]:
    """(media_id, payload) for the mp4_frame_plan gate query — the one
    place the fixture is encoded (query and replay share the bytes)."""
    from amadeus_spark.functions import mp4

    sizes = mp4_frame_sizes()
    rows = []
    for mid in range(MP4_N_FILES):
        frames = [
            bytes([(mid * 16 + i) % 256]) * sizes[i]
            for i in range(MP4_N_FRAMES)
        ]
        if mid % 2:  # odd ids: fragmented layout, same frame content
            payload = mp4.encode_fmp4(
                [
                    frames[i : i + MP4_FRAG_LEN]
                    for i in range(0, MP4_N_FRAMES, MP4_FRAG_LEN)
                ],
                fps=MP4_FPS,
                keyframe_every=MP4_KEYFRAME_EVERY,
            )
        else:
            payload = mp4.encode_mp4(
                frames, fps=MP4_FPS, keyframe_every=MP4_KEYFRAME_EVERY
            )
        rows.append((mid, payload))
    return rows


def mp3_fixture_rows() -> list[tuple[int, bytes]]:
    """(media_id, payload) for the mp3_segment_plan gate query."""
    from amadeus_spark.functions import mp3

    return [
        (
            mid,
            mp3.encode_mp3(
                n_frames=120 + 10 * mid,
                bitrate_idx=5 + mid,
                pad_every=3 if mid % 2 else 0,
            ),
        )
        for mid in range(MP3_N_STREAMS)
    ]


# ------------------------------------------------------------- replays


def _top_level_mdat_payloads(data: bytes) -> list[int]:
    """Positions where each top-level ``mdat`` box's payload starts —
    the ONLY container knowledge the mp4 replay uses (size+tag walk;
    never the sample tables the demuxer under test resolves)."""
    pos, out = 0, []
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        if size < 8:
            raise ValueError(f"bad box size {size} at {pos}")
        if data[pos + 4 : pos + 8] == b"mdat":
            out.append(pos + 8)
        pos += size
    return out


def expected_mp4_plan() -> list[tuple]:
    """(media_id, frame_idx, t_s, offset, size, keyframe) rows the
    mp4_frame_plan query must produce — offsets from the independent
    top-level box walk + closed-form sizes, times/keyframes from the
    fixture contract (dts = i at timescale fps; sync every 6th)."""
    sizes = mp4_frame_sizes()
    rows = []
    for mid, payload in mp4_fixture_rows():
        mdats = _top_level_mdat_payloads(payload)
        if mid % 2:
            offs = []
            for i in range(MP4_N_FRAMES):
                frag, k = divmod(i, MP4_FRAG_LEN)
                base = frag * MP4_FRAG_LEN
                offs.append(mdats[frag] + sum(sizes[base : base + k]))
        else:
            (m0,) = mdats
            offs = [m0 + sum(sizes[:i]) for i in range(MP4_N_FRAMES)]
        for i in range(0, MP4_N_FRAMES, MP4_EVERY_N):
            rows.append(
                (
                    mid,
                    i,
                    _round_half_up(i / MP4_FPS, 6),
                    offs[i],
                    sizes[i],
                    i % MP4_KEYFRAME_EVERY == 0,
                )
            )
    return rows


def expected_mp3_plan() -> list[tuple]:
    """(media_id, segment_idx, t_start_s, duration_s, offset, size)
    rows the mp3_segment_plan query must produce — pure ISO 11172-3
    frame-length arithmetic, no byte parsed. The float accumulation
    (t += 1152/44100 per frame) mirrors the segmenter's walk so the
    rounded doubles are bit-identical."""
    rows = []
    for mid in range(MP3_N_STREAMS):
        n_frames = 120 + 10 * mid
        pad_every = 3 if mid % 2 else 0
        bitrate = MP3_KBPS[5 + mid] * 1000
        dur = MP3_SPF / MP3_SR
        sizes = [
            MP3_SPF // 8 * bitrate // MP3_SR
            + (1 if pad_every and i % pad_every == 0 else 0)
            for i in range(n_frames)
        ]
        offs = [0] * n_frames
        for i in range(1, n_frames):
            offs[i] = offs[i - 1] + sizes[i - 1]
        run_start, t0, t, seg_idx = 0, 0.0, 0.0, 0
        for i in range(n_frames):
            t += dur
            if t - t0 >= MP3_SEGMENT_S or i == n_frames - 1:
                if seg_idx % MP3_EVERY_N == 0:
                    rows.append(
                        (
                            mid,
                            seg_idx,
                            _round_half_up(t0, 6),
                            _round_half_up(t - t0, 6),
                            offs[run_start],
                            offs[i] + sizes[i] - offs[run_start],
                        )
                    )
                seg_idx += 1
                run_start, t0 = i + 1, t
    return rows


def _video_ids(n: int = MEDIA_N) -> list[int]:
    return [i for i in range(n) if i % 3 == 2]


def expected_frame_sample() -> list[tuple]:
    """(media_id, n_sampled, avg_r_mean) rows the media_frame_sample
    query must produce — closed form: RAWV video i has 4 + i%5 frames,
    frame f a constant raster of (i + 13·f) % 256, so channel-0 mean ==
    fill value; every 2nd frame is sampled. Independent of
    decode_rawv_frame and image_features."""
    rows = []
    for i in _video_ids():
        nf = 4 + i % 5
        picked = list(range(0, nf, FRAME_EVERY_N))
        # fill values are exact small ints: float32 storage and the
        # double avg are both exact until the final division
        vals = [float((i + 13 * f) % 256) for f in picked]
        avg = math.fsum(vals) / len(vals)
        rows.append((i, len(picked), _round_half_up(avg, 4)))
    return rows


def _feat3(i: int, kind: str) -> float:
    """feature[3] (1-based) of media row ``i`` as the float32 the
    executor emits — recomputed INLINE (numpy on closed-form arrays),
    never via multimodal's decode/feature kernels; JPEG rows come from
    the frozen literals."""
    if kind == "image":
        sel = (i // 3) % 3
        if sel == 2:  # lossy baseline JPEG: frozen decoded-raster mean
            return JPEG_FEAT3[i]
        h, w = 8 + i % 5, 6 + i % 7
        y, _x = np.mgrid[0:h, 0:w]
        ch0 = ((y * 7 + i) % 256).astype(np.uint8).astype(np.float32)
        return float(np.float32(ch0.mean()))
    if kind == "audio":
        sr, dur = 8000, 0.05 + (i % 4) * 0.01
        n = len(np.arange(int(sr * dur)))
        return float(np.float32(n / sr))
    # video: first frame is a constant raster of fill value i % 256
    return float(np.float32(float(i % 256)))


def expected_features() -> list[tuple]:
    """(kind, n, total_bytes, min_sha, feat3_sum) rows the
    multimodal_features query must produce. Bytes/sha come from the
    shared fixture generator (the Spark query loads the SAME rows);
    the decode-path signal is feat3_sum — floor(feature[3]·1e6) summed
    per kind, with feature[3] recomputed here without the decoders
    (JPEG excepted, frozen above)."""
    from amadeus_spark.functions.multimodal import real_media_rows

    by_kind: dict[str, list] = {}
    for i, kind, _fmt, _meta, payload in real_media_rows(MEDIA_N):
        f3 = _feat3(i, kind)
        by_kind.setdefault(kind, []).append(
            (
                len(payload),
                hashlib.sha256(payload).hexdigest(),
                math.floor(f3 * 1e6),
            )
        )
    rows = []
    for kind in sorted(by_kind):
        grp = by_kind[kind]
        rows.append(
            (
                kind,
                len(grp),
                sum(g[0] for g in grp),
                min(g[1] for g in grp),
                sum(g[2] for g in grp),
            )
        )
    return rows


# ------------------------------------------------------------- oracles


def _lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        # repr round-trips the double exactly; bare literals would
        # parse as DECIMAL in DuckDB (CLAUDE.md iron rule)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported literal {type(v)}")


def _values(rows: list[tuple], cols: str, order: str) -> str:
    body = ",\n".join(f"({', '.join(_lit(v) for v in r)})" for r in rows)
    return (
        f"SELECT * FROM (VALUES\n{body}\n) AS t({cols})\nORDER BY {order}"
    )


def oracle_mp4_plan_sql() -> str:
    return _values(
        expected_mp4_plan(),
        'media_id, frame_idx, t_s, "offset", size, keyframe',
        "media_id, frame_idx",
    )


def oracle_mp3_plan_sql() -> str:
    return _values(
        expected_mp3_plan(),
        'media_id, segment_idx, t_start_s, duration_s, "offset", size',
        "media_id, segment_idx",
    )


def oracle_frame_sample_sql() -> str:
    return _values(
        expected_frame_sample(),
        "media_id, n_sampled, avg_r_mean",
        "media_id",
    )


def oracle_features_sql() -> str:
    return _values(
        expected_features(),
        "kind, n, total_bytes, min_sha, feat3_sum",
        "kind",
    )
