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


def test_lzw_width_boundary_at_stream_end():
    """Round-8 regression (deterministic): a distinct-pair raster
    whose FINAL data code makes the decoder's eager table-add land
    exactly on 2^w - 1.  The decoder then widens before reading EOI;
    the encoder's tail emit used to skip the matching bookkeeping and
    wrote EOI at the old width → ``LZW stream truncated before EOI``.
    L = 254 puts the decoder's post-add next_code at 257 + 254 = 511
    = 2^9 - 1; the surrounding lengths cover the ±1 boundaries, and
    the later blocks cover the 1023 and 2047 boundaries."""
    for L in (
        list(range(250, 260))
        + list(range(762, 772))
        + list(range(1786, 1796))
    ):
        raster = bytes((i * 7 + (i * i) % 11) % 256 for i in range(L))
        assert _lzw_decode(_lzw_encode(raster), L) == raster


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


# ---------------------------------------------------------------- JPEG


def _block_constant_raster(nbx, nby, vals):
    w, h = 8 * nbx, 8 * nby
    raster = bytearray(w * h)
    for by in range(nby):
        for bx in range(nbx):
            v = vals[by * nbx + bx]
            for r in range(8):
                o = (by * 8 + r) * w + bx * 8
                raster[o : o + 8] = bytes([v]) * 8
    return w, h, bytes(raster)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=4),
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=20, max_size=20
    ),
)
def test_jpeg_block_constant_roundtrip_exact(nbx, nby, vals):
    """On block-constant rasters the lossy pipeline is EXACTLY the
    identity: a constant block's only nonzero DCT coefficient is its
    DC, which the flat quant table (8) divides exactly — this is the
    exactness envelope the mm_jpeg_decode_stats oracle relies on, for
    ANY block values and grid shape, not just the id-derived ones."""
    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(nbx, nby, vals)
    got = _parse_jpeg(_jpeg_encode_raster(w, h, raster))
    assert got == (w, h, raster)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.randoms(use_true_random=False),
)
def test_jpeg_arbitrary_raster_bounded_loss(nbx, nby, rnd):
    """Arbitrary rasters through the SAME general encode/decode path:
    dimensions survive, the stream parses, and the reconstruction
    error is bounded by the quantization step's worst case (the
    codec is lossy by design, never wrong-shaped or crashing).
    Max-error bound: every coefficient moves < q/2 = 4; the IDCT's
    l2 norm is 1 per basis vector, 64 coefficients => |err| < 32;
    assert the much tighter empirical 16 to catch regressions."""
    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h = 8 * nbx, 8 * nby
    raster = bytes(rnd.randrange(256) for _ in range(w * h))
    w2, h2, out = _parse_jpeg(_jpeg_encode_raster(w, h, raster))
    assert (w2, h2) == (w, h) and len(out) == len(raster)
    assert max(abs(a - b) for a, b in zip(raster, out)) <= 16


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=2, max_value=400),
    st.booleans(),
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=6, max_size=6
    ),
)
def test_jpeg_truncation_always_raises(nbx, nby, off, from_end, vals):
    """Any prefix truncation of a valid stream must raise ValueError
    (never hang, never return a wrong-shaped raster).  The fixed
    marker segments occupy a constant ~324-byte header, so `from_end`
    cuts anchor to the tail — exercising the entropy-stream and
    missing-EOI paths, not just the marker walk (a front-only cut
    range never left the header; round-6 review finding)."""
    import pytest

    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(
        nbx, nby, (vals * 4)[: nbx * nby]
    )
    enc = _jpeg_encode_raster(w, h, raster)
    cut = len(enc) - off if from_end else off
    cut = max(2, min(cut, len(enc) - 1))
    with pytest.raises(ValueError):
        _parse_jpeg(enc[:cut])


def test_jpeg_consistent_but_short_seglens_raise_valueerror():
    """Review r10: a segment length that is internally consistent
    (body slice matches seglen-2) but below the marker's own minimum
    must raise the module's documented ValueError — not struct.error
    or IndexError from the field unpack (SOF0 seglen=3 passed the
    consistency check and crashed the old parse with struct.error)."""
    import struct

    import pytest

    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    enc = _jpeg_encode_raster(8, 8, bytes(64))
    for marker, short_len in [(b"\xff\xc0", 3), (b"\xff\xda", 2)]:
        pos = enc.index(marker)
        bad = bytearray(enc)
        bad[pos + 2 : pos + 4] = struct.pack(">H", short_len)
        with pytest.raises(ValueError):
            _parse_jpeg(bytes(bad))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=255),
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=4, max_size=4
    ),
)
def test_jpeg_byte_corruption_never_hangs_or_malforms(
    nbx, nby, pos_seed, new_byte, vals
):
    """Flip one byte anywhere in a valid stream: the decoder must
    either raise ValueError (or the stdlib's struct.error on a
    mangled length) or return a raster of the DECLARED dimensions —
    never hang, loop, or hand back a wrong-shaped buffer.  This is
    the adversarial-input posture every decoder in the suite holds
    (PNG CRCs, GIF sub-block lengths); JPEG's equivalents are the
    marker walk, the Huffman 16-bit cap and the EOI check."""
    import struct

    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(nbx, nby, vals[: nbx * nby])
    enc = bytearray(_jpeg_encode_raster(w, h, raster))
    pos = pos_seed % len(enc)
    if enc[pos] == new_byte:
        new_byte = (new_byte + 1) % 256
    enc[pos] = new_byte
    try:
        w2, h2, out = _parse_jpeg(bytes(enc))
    except (ValueError, struct.error):
        return  # loud rejection is the preferred outcome
    assert len(out) == w2 * h2 and w2 > 0 and h2 > 0


def test_jpeg_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code.  Insert fill runs before segment markers of a valid
    stream (after SOI, which the two-byte magic check owns) — the
    decode must be unaffected (round-6 advisor finding: the marker
    walk previously misread the fill byte as a marker and the next
    two bytes as a segment length)."""
    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(2, 1, [7, 200])
    data = _jpeg_encode_raster(w, h, raster)
    assert _parse_jpeg(data) == (w, h, raster)
    # inject fill bytes before every marker in the header region:
    # scan for 0xFF <marker!=0x00> pairs outside entropy data — the
    # header is everything up to (and including) the SOS segment.
    sos = data.index(b"\xff\xda")
    out = bytearray(data[:2])  # keep SOI intact
    i = 2
    while i < sos:
        if data[i] == 0xFF:
            out += b"\xff\xff\xff"  # three fill bytes, then marker
        out.append(data[i])
        i += 1
    out += data[sos:]
    assert _parse_jpeg(bytes(out)) == (w, h, raster)


def test_jpeg_leftover_whole_byte_before_eoi_rejected():
    """Round-11 documented strictness (review finding): a stream
    whose entropy segment holds a WHOLE undecoded byte before EOI is
    corrupt — valid baseline output leaves only the sub-byte 1-padding
    unconsumed — and must be rejected loudly, where the r10 window
    check could still accept it.  Pins the divergence class the
    CHANGELOG declares."""
    import pytest

    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(2, 1, [7, 200])
    enc = _jpeg_encode_raster(w, h, raster)
    assert _parse_jpeg(enc) == (w, h, raster)
    eoi = enc.rindex(b"\xff\xd9")
    # one extra plain byte between the decoded entropy data and EOI
    # (0x00 is entropy data, not a stuffing pair or marker prefix)
    bad = enc[:eoi] + b"\x00" + enc[eoi:]
    with pytest.raises(ValueError, match="EOI"):
        _parse_jpeg(bad)


def test_jpeg_oversized_dc_category_rejected_descriptively():
    """Round-11 review finding: a corrupt DHT may declare any 8-bit
    symbol as the DC category; categories past the 32-bit window's
    reach (> 25; baseline legal max is 11) previously surfaced as a
    bare 'negative shift count' ValueError at unlucky bit alignments.
    The guard must raise the module's descriptive error instead."""
    import pytest

    from hana_bq_beam_connector_spark.operators.multimodal import (
        _jpeg_encode_raster,
        _parse_jpeg,
    )

    w, h, raster = _block_constant_raster(2, 1, [7, 200])
    enc = bytearray(_jpeg_encode_raster(w, h, raster))
    # Find the DC Huffman table (FFC4 segment whose class/id byte has
    # high nibble 0) and remap every symbol value v -> 255 - v: the
    # values stay DISTINCT (duplicates would alias in the canonical
    # code map and surface as a different error) but every category
    # lands far past the guard's 25.
    i = 2
    patched = False
    while i < len(enc) - 4:
        if enc[i] == 0xFF and enc[i + 1] == 0xC4:
            seglen = int.from_bytes(enc[i + 2 : i + 4], "big")
            tc_th = enc[i + 4]
            if tc_th >> 4 == 0:  # DC table
                counts = enc[i + 5 : i + 21]
                n_vals = sum(counts)
                for j in range(n_vals):
                    enc[i + 21 + j] = 255 - enc[i + 21 + j]
                patched = True
            i += 2 + seglen
        else:
            i += 1
    assert patched, "encoder output must carry a DC DHT segment"
    with pytest.raises(ValueError, match="DC category"):
        _parse_jpeg(bytes(enc))
