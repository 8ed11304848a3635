"""Pure codec tests for operators/imagecodec.py — no Spark session.

Covers: encode/decode round trips for every supported channel count,
all five PNG scanline filters (forward-filtered in the test, so the
decoder is exercised against spec-filtered data it did not produce),
nearest-neighbor semantics, APNG frame extraction (fdAT→IDAT), and
error paths.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from web_analytics_visits_re_processing_spark.operators import imagecodec as ic


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Apply PNG filter ``ftype`` to every scanline (spec §9 forward
    direction) — an independent reimplementation the decoder must
    invert."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    rows = []
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = (cur - left) & 0xFF
        elif ftype == 2:
            filt = (cur - prev) & 0xFF
        elif ftype == 3:
            filt = (cur - (left + prev) // 2) & 0xFF
        else:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (cur - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = cur
    return b"".join(rows)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_channel_counts(ch):
    rng = np.random.RandomState(42 + ch)
    img = rng.randint(0, 256, (13, 17, ch), dtype=np.uint8)
    out = ic.decode_png(ic.encode_png(img))
    assert out.shape == (13, 17, ch)
    assert (out == img).all()


def test_grayscale_2d_input():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = ic.decode_png(ic.encode_png(img))
    assert out.shape == (8, 8, 1)
    assert (out[:, :, 0] == img).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_all_five_filters(ftype):
    rng = np.random.RandomState(ftype)
    img = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    raw = _forward_filter(img, ftype)
    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 2, 0, 0, 0)
    blob = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(raw))
        + ic._chunk(b"IEND", b"")
    )
    assert (ic.decode_png(blob) == img).all()


def test_decode_multiple_idat_chunks():
    """IDAT may be split arbitrarily; the stream is the concatenation."""
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    body = np.empty((4, 16), np.uint8)
    body[:, 0] = 0
    body[:, 1:] = img.reshape(4, 15)
    data = zlib.compress(body.tobytes())
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0)
    blob = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", data[:7])
        + ic._chunk(b"IDAT", data[7:])
        + ic._chunk(b"IEND", b"")
    )
    assert (ic.decode_png(blob) == img).all()


def test_resize_nearest_floor_mapping():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    r = ic.resize_nearest(img, 3, 2)
    assert r.shape == (2, 3, 3)
    assert (r == img[[0, 2]][:, [0, 2, 4]]).all()
    up = ic.resize_nearest(img, 12, 8)
    assert up.shape == (8, 12, 3)
    assert (up[::2][:, ::2] == img).all()  # even grid hits each source pixel


def test_apng_roundtrip_and_plain_png():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (5, 6, 3), dtype=np.uint8) for _ in range(4)]
    ex = ic.extract_frames(ic.encode_apng(frames))
    assert len(ex) == 4
    for (w, h, png), orig in zip(ex, frames):
        assert (w, h) == (6, 5)
        assert (ic.decode_png(png) == orig).all()
    # a single-image PNG is one frame
    ex1 = ic.extract_frames(ic.encode_png(frames[0]))
    assert len(ex1) == 1
    assert (ic.decode_png(ex1[0][2]) == frames[0]).all()


def test_apng_varying_frame_dims():
    """fcTL dims override the canvas IHDR for each frame's PNG."""
    f0 = np.zeros((4, 6, 3), np.uint8)
    f1 = np.full((2, 3, 3), 9, np.uint8)
    ex = ic.extract_frames(ic.encode_apng([f0, f1]))
    assert [(w, h) for w, h, _ in ex] == [(6, 4), (3, 2)]
    assert (ic.decode_png(ex[1][2]) == f1).all()


def test_apng_default_image_is_not_a_frame():
    """Spec-legal default image: an IDAT that carries real payload but
    has NO preceding fcTL (while fcTLs exist) is canvas-only — it must
    be excluded from the emitted frames even though its data is
    non-empty."""

    def idat_payload(img):
        for ctype, data in ic.iter_chunks(ic.encode_png(img)):
            if ctype == b"IDAT":
                return bytes(data)

    default_img = np.zeros((4, 6, 3), np.uint8)
    anim = np.full((4, 6, 3), 7, np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0)
    actl = struct.pack(">II", 1, 0)
    fctl = struct.pack(">IIIIIHHBB", 0, 6, 4, 0, 0, 1, 10, 0, 0)
    blob = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"acTL", actl)
        + ic._chunk(b"IDAT", idat_payload(default_img))  # default: no fcTL
        + ic._chunk(b"fcTL", fctl)
        + ic._chunk(b"fdAT", struct.pack(">I", 1) + idat_payload(anim))
        + ic._chunk(b"IEND", b"")
    )
    ex = ic.extract_frames(blob)
    assert len(ex) == 1
    assert (ic.decode_png(ex[0][2]) == anim).all()


def test_error_paths():
    with pytest.raises(ValueError):
        ic.decode_png(b"not a png")
    with pytest.raises(ValueError):
        list(ic.iter_chunks(ic.PNG_SIG + b"\x00\x00\x00\xffIHDRxx"))  # truncated
    # interlaced / 16-bit rejected, not mis-decoded
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr16) + ic._chunk(b"IDAT", b"x") + ic._chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        ic.decode_png(blob)
    with pytest.raises(ValueError):
        ic.encode_apng([])
    # wrong decompressed length
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr) + ic._chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + ic._chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        ic.decode_png(bad)
