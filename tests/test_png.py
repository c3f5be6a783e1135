"""Exact-pixel tests for the stdlib PNG codec (operators/multimodal.py).

The decoder must invert (a) our own encoder (roundtrip property on random
images across all supported color types) and (b) hand-built PNG streams
using EVERY scanline filter type (None/Sub/Up/Average/Paeth), forward-
filtered in this test exactly per the PNG spec §9 — so the unfilter math
is pinned independently of the encoder (which only emits filter 0).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from retail_datalakehouse_spark.operators.multimodal import (
    decode_image,
    decode_png,
    encode_png,
    sample_frames,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _build_png(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG applying the given filter type per scanline
    (forward filtering per PNG spec §9) — exercises the decoder's
    unfilter paths the encoder never emits."""
    h, w, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels
    stride = w * channels
    flat = arr.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = filters[y % len(filters)]
        out = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0  # left (RECONSTRUCTED = original)
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_exact(channels):
    rng = np.random.default_rng(42 + channels)
    arr = rng.integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    decoded = decode_png(encode_png(arr))
    assert decoded.shape == arr.shape
    assert np.array_equal(decoded, arr)


def test_roundtrip_grayscale_2d_input():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    decoded = decode_png(encode_png(arr))
    assert decoded.shape == (5, 9, 1)
    assert np.array_equal(decoded[:, :, 0], arr)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_each_filter_type_unfilters_exactly(filt):
    rng = np.random.default_rng(100 + filt)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    payload = _build_png(arr, [filt])
    assert np.array_equal(decode_png(payload), arr)


def test_mixed_filters_per_row():
    rng = np.random.default_rng(999)
    arr = rng.integers(0, 256, size=(10, 8, 4), dtype=np.uint8)
    payload = _build_png(arr, [0, 1, 2, 3, 4])  # cycle through all five
    assert np.array_equal(decode_png(payload), arr)


def test_gradient_known_values():
    # deterministic gradient: pixel (y, x, c) = (y*16 + x*3 + c) & 0xFF
    y, x, c = np.meshgrid(np.arange(8), np.arange(8), np.arange(3), indexing="ij")
    arr = ((y * 16 + x * 3 + c) & 0xFF).astype(np.uint8)
    decoded = decode_png(encode_png(arr))
    assert decoded[0, 0, 0] == 0
    assert decoded[7, 7, 2] == (7 * 16 + 7 * 3 + 2) & 0xFF
    assert int(decoded.astype(np.int64).sum()) == int(arr.astype(np.int64).sum())


def test_decode_image_dispatch():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(arr)), arr)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 not actually jpeg")


def test_sample_frames_motion_png():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(5)]
    container = b"".join(encode_png(f) for f in frames)
    sampled = sample_frames(container, every=2)
    assert sampled.shape == (3, 4, 4, 3)  # frames 0, 2, 4
    for i, fi in enumerate([0, 2, 4]):
        assert np.array_equal(sampled[i], frames[fi])


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
