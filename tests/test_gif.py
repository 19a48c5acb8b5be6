"""GIF codec: LZW round-trips (incl. dict-full reset), frame/palette/
interlace/animation round-trips, a hand-assembled golden bitstream
(independent of our encoder), and the header-only probe."""
import struct

import numpy as np
import pytest

from stringzilla_ray.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_round_trip(mcs):
    rng = np.random.default_rng(mcs)
    for n in (0, 1, 7, 100, 5000, 70000):
        data = rng.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data
    rep = bytes(b % (1 << mcs) for b in (b"\x00\x01\x02" * 22000))
    assert _lzw_decode(_lzw_encode(rep, mcs), mcs) == rep  # fills dict


def test_golden_hand_assembled_stream():
    # 3x1 two-color image, pixels [1, 1, 0]; mcs=2 so clear=4, eoi=5.
    # Hand-packed codes (LSB-first): 4@3, 1@3, 1@3, 0@4, 5@4 —
    # the width grows to 4 after the decoder's second append
    # anticipates the encoder's next entry (giflib convention).
    value = 4 | (1 << 3) | (1 << 6) | (0 << 9) | (5 << 13)
    lzw = value.to_bytes(3, "little")
    gif = (b"GIF89a" + struct.pack("<HH", 3, 1)
           + bytes([0x80, 0, 0])            # GCT present, 2 entries
           + bytes([0, 0, 0, 255, 255, 255])  # palette: black, white
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 1) + b"\x00"
           + bytes([2])                     # min code size
           + bytes([len(lzw)]) + lzw + b"\x00"
           + b"\x3b")
    frames, delays = decode_gif(gif)
    assert frames.shape == (1, 1, 3, 3)
    np.testing.assert_array_equal(
        frames[0, 0], [[255, 255, 255], [255, 255, 255], [0, 0, 0]])


def test_frame_round_trips():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(img, pal))
    assert frames.shape == (1, 37, 53, 3)
    np.testing.assert_array_equal(frames[0], pal[img])
    fr2, _ = decode_gif(encode_gif(img, pal, interlace=True))
    np.testing.assert_array_equal(fr2[0], pal[img])


def test_small_palette_and_animation():
    rng = np.random.default_rng(2)
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                    np.uint8)
    anim = rng.integers(0, 4, (5, 9, 11)).astype(np.uint8)
    frames, delays = decode_gif(
        encode_gif(anim, pal4, delays_ms=[20, 30, 40, 50, 60]))
    assert frames.shape == (5, 9, 11, 3)
    assert delays == [20, 30, 40, 50, 60]
    for i in range(5):
        np.testing.assert_array_equal(frames[i], pal4[anim[i]])


def test_probe_gif_header_only():
    from stringzilla_ray.stages.multimodal import probe_payload

    rng = np.random.default_rng(3)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    anim = rng.integers(0, 2, (3, 5, 7)).astype(np.uint8)
    payload = encode_gif(anim, pal, delays_ms=[100, 100, 100])
    meta = probe_payload(payload)
    assert meta["container"] == "gif"
    assert (meta["width"], meta["height"]) == (7, 5)
    assert meta["codec"] == "lzw3f"
    assert meta["duration_ms"] == 300


def test_media_decoder_gif_branch():
    from stringzilla_ray.stages.multimodal import MediaDecoder

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = rng.integers(0, 16, (8, 8)).astype(np.uint8)
    dec = MediaDecoder(strict=True)
    row = dec._decode_one(encode_gif(img, pal))
    assert row[0] == 7.0  # _FMT_GIF
    assert (row[1], row[2]) == (8.0, 8.0)
    anim = rng.integers(0, 16, (4, 8, 8)).astype(np.uint8)
    row2 = dec._decode_one(encode_gif(anim, pal, delays_ms=[50] * 4))
    assert row2[0] == 7.0 and row2[3] == 4.0  # n_frames


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)


def test_disposal_3_restores_previous_canvas():
    """Disposal method 3 (restore previous): the region a frame drew
    reverts to its pre-frame pixels before the next frame composes —
    a later transparent frame must show the RESTORED canvas, not the
    disposed frame's pixels (closes the last GIF strict stub)."""
    import re

    import numpy as np

    from stringzilla_ray.functions.gif import decode_gif, encode_gif

    T = 255  # transparent index
    f1 = np.full((4, 4), 10, np.uint8)
    f2 = np.full((4, 4), 20, np.uint8)
    f2[0, 0] = T
    f3 = np.full((4, 4), T, np.uint8)
    f3[1, 1] = 30
    data = bytearray(encode_gif(np.stack([f1, f2, f3]),
                                delays_ms=[20, 20, 20]))
    gces = [m.start() for m in re.finditer(b"\x21\xf9\x04", bytes(data))]
    assert len(gces) == 3
    # frame 2: disposal 3 + transparency; frame 3: transparency only
    data[gces[1] + 3] = (3 << 2) | 1
    data[gces[1] + 6] = T
    data[gces[2] + 3] = 1
    data[gces[2] + 6] = T
    frames, delays = decode_gif(bytes(data))
    assert frames.shape == (3, 4, 4, 3)
    # frame 1: all 10s
    assert (frames[0] == 10).all()
    # frame 2: 20s everywhere except (0,0), which shows frame 1's pixel
    assert (frames[1][0, 0] == 10).all()
    assert (frames[1][1:, :] == 20).all() and (frames[1][0, 1:] == 20).all()
    # frame 3: composed on the RESTORED canvas (all 10s), not on the
    # disposed frame 2 — only (1,1) is newly drawn
    want3 = np.full((4, 4, 3), 10, np.uint8)
    want3[1, 1] = 30
    np.testing.assert_array_equal(frames[2], want3)
