"""Pure-kernel tests for the baseline JPEG codec (ITU-T T.81) —
the last closable media codec (r3 verdict #7). No Spark session needed;
the distributed path is covered by test_sources.py's real-media tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from amadeus_spark.functions import jpeg, multimodal


def _gradient(h: int, w: int, seed: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(y * 3 + seed) % 256, (x * 2 + seed) % 256, (x + y + seed) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_dct_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.uniform(-128, 128, (8, 8))
    assert np.allclose(jpeg.idct2(jpeg.fdct2(x)), x, atol=1e-9)


def test_flat_image_lossless():
    """A flat block has only a DC coefficient — survives quantization
    exactly at any quality."""
    img = np.full((16, 24, 3), 128, np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert (dec == img).all()


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_roundtrip_within_quantization(subsampling):
    img = _gradient(40, 56)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 92, subsampling))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() < 20, (err.mean(), err.max())


def test_non_mcu_aligned_dims():
    """17x13 with 4:2:0 needs edge padding + crop on both axes."""
    img = _gradient(17, 13, seed=5)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95, "4:2:0"))
    assert dec.shape == (17, 13, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:24, 0:40]
    g = ((y * 5 + x * 3) % 200).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert dec.shape == g.shape  # single-component stays 2-D
    assert np.abs(dec.astype(int) - g.astype(int)).mean() < 2


@pytest.mark.parametrize("interval", [1, 3])
def test_restart_markers(interval):
    """DRI + RSTn resync: predictors reset, bit reader realigns."""
    img = _gradient(48, 64, seed=9)
    dec = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, 92, "4:2:0", restart_interval=interval)
    )
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((40, 56), "4:4:4"),
        ((40, 56), "4:2:0"),
        ((17, 25), "4:2:0"),  # odd size: MCU-padded DC grid vs the
        ((24, 24), "4:2:0"),  # smaller non-interleaved AC grid
        ((9, 8), "4:4:4"),
    ],
)
def test_progressive_equals_baseline(shape, sub):
    """Progressive (SOF2) decode must be PIXEL-IDENTICAL to baseline
    decode of the same quantized coefficients: both encoders quantize
    identically, entropy coding is lossless, and the successive-
    approximation scan script converges to full precision — any pixel
    diff is a scan-procedure bug, so the band is exact equality."""
    img = _gradient(*shape, seed=5)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, sub))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, 85, sub))
    assert np.array_equal(base, prog)


def test_progressive_grayscale_and_scan_count():
    img = _gradient(32, 24, seed=3)[..., 0]
    enc = jpeg.encode_jpeg_progressive(img, 85)
    assert enc.count(b"\xff\xda") == 4  # DC first/AC first/DC+AC refine
    assert np.array_equal(
        jpeg.decode_jpeg(enc), jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85))
    )


def test_malformed_progressive_raises():
    """Swap SOF0 for SOF2 without rewriting the scan script: the
    baseline full-band interleaved scan is illegal in progressive mode
    (interleaved scans must be DC-only) — must refuse, not garble."""
    enc = bytearray(jpeg.encode_jpeg(_gradient(16, 16)))
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="DC-only"):
        jpeg.decode_jpeg(bytes(enc))


def test_progressive_corrupt_stream_contract():
    """Random byte mutations of a progressive stream must decode, or
    raise ValueError/NotImplementedError — never IndexError/KeyError
    from the scan machinery (crawl data feeds this decoder)."""
    import random

    rng = random.Random(13)
    good = bytearray(jpeg.encode_jpeg_progressive(_gradient(24, 24, seed=2), 80))
    for _ in range(150):
        raw = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            raw[rng.randrange(2, len(raw))] = rng.randrange(256)
        try:
            jpeg.decode_jpeg(bytes(raw))
        except (ValueError, NotImplementedError):
            pass


def test_arithmetic_still_refused():
    enc = bytearray(jpeg.encode_jpeg(_gradient(16, 16)))
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(bytes(enc))


def test_not_jpeg_raises():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"P6\n1 1\n255\nabc")


def test_decode_image_dispatches_jpeg():
    """multimodal.decode_image sniffs the FFD8 magic and returns the
    8-dim image feature vector from the real decode (no fake path)."""
    img = _gradient(12, 18)
    feats = multimodal.decode_image(jpeg.encode_jpeg(img, 95), fake=False)
    assert len(feats) == 8
    # h, w lead the feature vector; means track the source image
    assert feats[0] == 12.0 and feats[1] == 18.0
    assert abs(feats[2] - img[..., 0].mean()) < 3


def test_jpeg_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    — foreign encoders emit them; ours doesn't, so inject one."""
    import numpy as np

    from amadeus_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    raw = bytearray(encode_jpeg(img))
    # insert a fill byte before the first post-SOI marker (position 2)
    assert raw[2] == 0xFF
    filled = bytes(raw[:2]) + b"\xff" + bytes(raw[2:])
    a = decode_jpeg(bytes(raw))
    b = decode_jpeg(filled)
    assert np.array_equal(a, b)


def test_jpeg_garbage_never_crashes_uncontrolled():
    """Random corruptions of a valid baseline file must surface as
    ValueError/NotImplementedError (the decode contract), not
    IndexError/struct.error/KeyError/infinite loops."""
    import random as _r

    import numpy as np

    from amadeus_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = _r.Random(77)
    img = (np.random.default_rng(1).integers(0, 256, (16, 16, 3))
           .astype(np.uint8))
    good = bytearray(encode_jpeg(img))
    bad_kinds = {}
    for trial in range(150):
        raw = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            raw[rng.randrange(2, len(raw))] = rng.randrange(256)
        try:
            decode_jpeg(bytes(raw))
        except (ValueError, NotImplementedError):
            pass
        except Exception as e:  # pragma: no cover
            bad_kinds.setdefault(type(e).__name__, trial)
    assert not bad_kinds, bad_kinds
