"""Property-based fuzz of the pure-Python codec kernels (no Spark):
random rasters/streams through every encoder→decoder pair must be the
identity, for ANY input — not just the id-derived fixtures the
oracle queries use.
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from hana_bq_beam_connector_spark.operators.multimodal import (
    _GIF_MIN_CODE,
    _PNG_SIG,
    _lzw_decode,
    _lzw_encode,
    _parse_gif,
    _parse_png,
    _parse_pnm,
    _parse_y4m,
    _png_chunk,
    _png_filter_row,
    _png_unfilter_row,
)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=3000))
def test_lzw_roundtrip_any_bytes(data):
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=200, max_value=2000),
)
def test_lzw_roundtrip_low_entropy_runs(byte, n):
    """Long constant runs drive the cScSc path and rapid dictionary
    growth — the regimes where encoder/decoder width sync breaks."""
    data = bytes([byte]) * n
    assert _lzw_decode(_lzw_encode(data), n) == data


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.binary(min_size=1, max_size=64),
    st.binary(min_size=1, max_size=64),
)
def test_png_filters_invert_any_rows(ftype, raw, prev):
    w = min(len(raw), len(prev))
    raw, prev = raw[:w], prev[:w]
    assert (
        _png_unfilter_row(ftype, _png_filter_row(ftype, raw, prev), prev)
        == raw
    )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=16),
    st.randoms(use_true_random=False),
)
def test_png_whole_file_roundtrip_any_raster(w, h, rnd):
    raster = bytes(rnd.randrange(256) for _ in range(w * h))
    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)
    stream = bytearray()
    prev = bytes(w)
    for r in range(h):
        row = raster[r * w : (r + 1) * w]
        ftype = rnd.randrange(5)
        stream.append(ftype)
        stream += _png_filter_row(ftype, row, prev)
        prev = row
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(data) == (w, h, raster)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.randoms(use_true_random=False),
)
def test_gif_whole_file_roundtrip_any_raster(w, h, rnd):
    raster = bytes(rnd.randrange(256) for _ in range(w * h))
    lzw = _lzw_encode(raster)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([_GIF_MIN_CODE])
        + bytes(blocks)
        + b"\x3b"
    )
    assert _parse_gif(data) == (w, h, raster)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.randoms(use_true_random=False),
)
def test_pnm_roundtrip_any_raster(w, h, rnd):
    gray = bytes(rnd.randrange(256) for _ in range(w * h))
    assert _parse_pnm(
        b"P5\n%d %d\n255\n" % (w, h) + gray, b"P5", 1
    ) == (w, h, gray)
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert _parse_pnm(
        b"P6\n%d %d\n255\n" % (w, h) + rgb, b"P6", 3
    ) == (w, h, rgb)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=5),
    st.randoms(use_true_random=False),
)
def test_y4m_roundtrip_any_frames(w2, h2, nf, rnd):
    w, h = 2 * w2, 2 * h2
    frame_len = w * h + 2 * (w2 * h2)
    frames = [
        bytes(rnd.randrange(256) for _ in range(frame_len))
        for _ in range(nf)
    ]
    data = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)
    for f in frames:
        data += b"FRAME\n" + f
    pw, ph, got = _parse_y4m(data)
    assert (pw, ph) == (w, h)
    assert got == frames
