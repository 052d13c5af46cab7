"""Triangulation pins for the media golden oracles (functions/
media_golden.py): each gate query's expectation is derived by an
INDEPENDENT replay (top-level box walk / frame-length arithmetic /
closed-form rasters); these tests close the triangle by checking the
replay against the actual parser/decoder output driver-side (no
Spark), and pin the frozen lossy-JPEG literals against a live decode
so the committed constants can't drift silently."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from amadeus_spark.functions import media_golden as G


def _r(x, d):
    q = Decimal(1).scaleb(-d)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def test_mp4_replay_matches_demuxer():
    """Independent replay (box walk + closed-form sizes) == the sample-
    table demuxer, frame for frame — a bug in EITHER mechanism breaks
    this, exactly like the external gate."""
    from amadeus_spark.functions import mp4

    want = G.expected_mp4_plan()
    got = []
    for mid, payload in G.mp4_fixture_rows():
        for r in mp4.mp4_sample_ranges(payload, every_n=G.MP4_EVERY_N):
            got.append(
                (
                    mid,
                    r["frame_idx"],
                    _r(r["t_s"], 6),
                    r["offset"],
                    r["size"],
                    r["keyframe"],
                )
            )
    assert got == want
    # both layouts are exercised: 4 even (flat) + 4 odd (fragmented)
    assert len(want) == G.MP4_N_FILES * len(
        range(0, G.MP4_N_FRAMES, G.MP4_EVERY_N)
    )


def test_mp3_replay_matches_indexer():
    """Pure-arithmetic replay == the header-walk segmenter."""
    from amadeus_spark.functions import mp3

    want = G.expected_mp3_plan()
    got = []
    for mid, payload in G.mp3_fixture_rows():
        for r in mp3.mp3_segment_ranges(
            payload, segment_s=G.MP3_SEGMENT_S, every_n=G.MP3_EVERY_N
        ):
            got.append(
                (
                    mid,
                    r["segment_idx"],
                    _r(r["t_start_s"], 6),
                    _r(r["duration_s"], 6),
                    r["offset"],
                    r["size"],
                )
            )
    assert got == want
    assert len(want) >= G.MP3_N_STREAMS  # every stream contributes


def test_frame_sample_replay_matches_decode_path():
    """Closed-form replay == the real RAWV decode + feature kernel,
    per video, per sampled frame."""
    from amadeus_spark.functions.multimodal import (
        decode_rawv_frame,
        image_features,
        real_media_rows,
    )

    want = {r[0]: (r[1], r[2]) for r in G.expected_frame_sample()}
    got = {}
    for i, kind, _fmt, meta, payload in real_media_rows(G.MEDIA_N):
        if kind != "video":
            continue
        nf = int(meta["n_frames"])
        picked = list(range(0, nf, G.FRAME_EVERY_N))
        vals = [
            float(
                np.float32(
                    image_features(decode_rawv_frame(bytes(payload), f))[2]
                )
            )
            for f in picked
        ]
        got[i] = (len(picked), _r(sum(vals) / len(vals), 4))
    assert got == want


def test_jpeg_feat3_frozen_literals_pin_decoder():
    """The FROZEN lossy-JPEG feature literals == a live decode
    recompute (the one feature the replay cannot derive closed-form).
    If the JPEG decoder changes behavior, this fails alongside the
    external gate — update via scripts/freeze_media_golden.py only for
    an INTENTIONAL codec change."""
    from amadeus_spark.functions.jpeg import decode_jpeg
    from amadeus_spark.functions.multimodal import real_media_rows

    live = {}
    for i, _kind, fmt, _meta, payload in real_media_rows(G.MEDIA_N):
        if fmt != "jpeg":
            continue
        img = decode_jpeg(bytes(payload))
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        live[i] = float(np.float32(img.astype(np.float32)[..., 0].mean()))
    assert live == G.JPEG_FEAT3


def test_features_replay_matches_decode_path():
    """The inline feature recompute (closed-form rasters/tones, no
    decode kernels) == the real decode path for every non-JPEG row —
    the executor-side float32 storage included."""
    from amadeus_spark.functions.multimodal import (
        decode_media,
        real_media_rows,
    )

    for i, kind, fmt, _meta, payload in real_media_rows(G.MEDIA_N):
        want = G._feat3(i, kind)
        feats = decode_media(bytes(payload), fake=False)
        got = float(np.float32(feats[2]))
        assert got == want, (i, kind, fmt, got, want)


def test_oracle_sql_renders_and_row_counts():
    """VALUES renderers emit DuckDB-parseable SQL with the same row
    counts as the replays (a paren/quote slip would otherwise only
    surface in the external gate)."""
    import duckdb

    con = duckdb.connect()
    for sql, rows in [
        (G.oracle_mp4_plan_sql(), G.expected_mp4_plan()),
        (G.oracle_mp3_plan_sql(), G.expected_mp3_plan()),
        (G.oracle_frame_sample_sql(), G.expected_frame_sample()),
        (G.oracle_features_sql(), G.expected_features()),
    ]:
        got = con.sql(sql).fetchall()
        assert len(got) == len(rows)
