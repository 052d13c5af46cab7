"""GIF codec roundtrip + decoder robustness (pure-Python LZW)."""

from __future__ import annotations

import numpy as np
import pytest

from amadeus_spark.functions.gif import (
    _lzw_decode,
    decode_gif,
    encode_gif,
)


def _img(h, w, ncolors, seed=7):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (h, w))
    return palette[idx]


@pytest.mark.parametrize("shape,ncolors", [((8, 8), 2), ((33, 17), 5),
                                           ((64, 48), 200), ((1, 1), 1)])
def test_gif_roundtrip_exact(shape, ncolors):
    img = _img(*shape, ncolors)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)  # palettized formats are lossless


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) <= 256:
        pytest.skip("rng produced <=256 colors")
    with pytest.raises(ValueError, match="256 colors"):
        encode_gif(img)


def test_lzw_real_compression_decodes():
    """The decoder must handle a REAL growing-dictionary stream, not
    just our uncompressed encoder's output: build one by hand with the
    canonical encoder algorithm and check the decode matches."""
    data = [0, 1, 0, 1, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 0] * 20
    mcs = 2
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(1 << mcs)}
    next_code = end + 1
    width = mcs + 1
    codes = [clear]
    buf = (data[0],)
    for sym in data[1:]:
        if buf + (sym,) in table:
            buf = buf + (sym,)
        else:
            codes.append(table[buf])
            table[buf + (sym,)] = next_code
            next_code += 1
            buf = (sym,)
    codes.append(table[buf])
    codes.append(end)
    # pack with the width-growth rule the decoder applies: the table
    # grows AFTER each emitted code (except the first after CLEAR)
    acc = nbits = 0
    body = bytearray()
    width = mcs + 1
    n_table = end + 1
    first = True
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width, n_table, first = mcs + 1, end + 1, True
            continue
        if c == end:
            break
        if first:
            first = False
            continue
        n_table += 1
        if n_table == (1 << width) and width < 12:
            width += 1
    if nbits:
        body.append(acc & 0xFF)
    assert _lzw_decode(bytes(body), mcs) == data


def test_decode_media_dispatches_gif():
    from amadeus_spark.functions.multimodal import decode_media

    img = _img(16, 16, 4)
    feats = decode_media(encode_gif(img))
    assert len(feats) > 0


def test_gif_interlaced_frame_decodes():
    """Set the interlace flag and store rows in 4-pass order; the
    decoder must rebuild natural row order."""
    img = _img(16, 9, 6)
    h = img.shape[0]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    raw = bytearray(encode_gif(img[np.array(order)]))
    table_size = 2 << (raw[10] & 7)
    desc = 13 + table_size * 3
    assert raw[desc] == 0x2C
    raw[desc + 9] |= 0x40  # interlace flag in the image descriptor
    assert np.array_equal(decode_gif(bytes(raw)), img)


def test_gif_truncated_raises_valueerror():
    img = _img(16, 16, 4)
    raw = encode_gif(img)
    # cut inside the image data sub-blocks: must be ValueError, never
    # an IndexError escaping from the block walker
    for cut in (len(raw) // 2, len(raw) - 3):
        with pytest.raises(ValueError):
            decode_gif(raw[:cut])


def test_gif_garbage_never_raises_non_valueerror():
    """Arbitrary corrupt bytes behind a valid magic must surface as
    ValueError (the decode contract), never IndexError/struct.error."""
    import random as _r

    rng = _r.Random(99)
    img = _img(12, 12, 5)
    good = encode_gif(img)
    for trial in range(200):
        raw = bytearray(good)
        for _ in range(rng.randint(1, 6)):
            raw[rng.randrange(6, len(raw))] = rng.randrange(256)
        try:
            decode_gif(bytes(raw))
        except (ValueError, NotImplementedError):
            pass  # the contract
        except IndexError as e:  # pragma: no cover
            raise AssertionError(f"IndexError leaked on trial {trial}") from e
