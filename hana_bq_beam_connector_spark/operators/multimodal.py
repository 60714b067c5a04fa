"""Multimodal column operators (LLM-data surface).

Image/audio/video travel as opaque ``binary`` columns plus typed
metadata structs; decode/feature steps are Arrow-batched
``mapInPandas`` stages so each executor processes columnar batches —
the Spark-side plumbing (schema, batch shape, partition flow) is real
and tested.

Three decoders are REAL, all stdlib-only: ``decode_pgm`` parses
binary PGM (P5) grayscale images — magic, whitespace/comment-tolerant
header, maxval, raster; ``decode_ppm`` parses binary PPM (P6) color
images and de-planarizes the interleaved R,G,B raster with stride-3
slices; ``decode_wav`` parses RIFF/WAVE PCM16 audio.  Each is fed by
a ``synthesize_*`` twin producing genuine spec-conformant payloads (a
PGM/PPM written here opens in any viewer, a WAV plays).  The
remaining codec calls are STUBBED deterministically (this container
ships no image/audio libraries): ``decode_image_meta`` derives pseudo
width/height/channels from the payload's MD5, and ``frame_sample``
slices deterministic byte windows as "frames".  Swapping a stub body
for PIL/ffmpeg calls changes no schema, no partitioning, and no
caller — the three real decoders demonstrate exactly that swap
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapt the documents table into a media-column table: UTF-8
    payload bytes standing in for encoded image data."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("long")
        .alias("byte_len"),
    )


_PGM_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)


def synthesize_pgm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Genuine binary PGM (P5) payloads, one per id.

    Dimensions and pixels are deterministic functions of the id
    (``w = 8 + id % 9``, ``h = 8 + id % 7``, ``p(i) = (id*31 + i*7)
    % 256``) so an SQL oracle can replay the pixel arithmetic without
    parsing bytes — but the BYTES are a complete, spec-conformant PGM
    (magic, dims, maxval 255, raw 8-bit raster; any image viewer opens
    one).  Built in an Arrow-batched pandas UDF: byte assembly is
    per-row imperative work, the declared Python swap point."""

    @F.pandas_udf(BinaryType())
    def _pgm(ids: pd.Series) -> pd.Series:
        out = []
        for mid in ids:
            mid = int(mid)
            w, h = 8 + mid % 9, 8 + mid % 7
            raster = bytes(
                (mid * 31 + i * 7) % 256 for i in range(w * h)
            )
            out.append(b"P5\n%d %d\n255\n" % (w, h) + raster)
        return pd.Series(out)

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _pgm(F.col(id_col)).alias("payload"),
        F.lit("image/x-portable-graymap").alias("media_type"),
    ).withColumn("byte_len", F.octet_length("payload").cast("long"))


def _parse_pnm(
    data: bytes, magic: bytes, samples_per_pixel: int
) -> tuple[int, int, bytes]:
    """Parse a binary PNM raster image (P5 graymap / P6 pixmap):
    magic, three whitespace-separated header tokens (width, height,
    maxval) with ``#`` comments allowed between them, then exactly
    width*height*samples_per_pixel raster bytes.  Raises ValueError
    on any malformation — a corrupt image must fail loudly, not
    produce silent garbage stats."""
    if data[:2] != magic:
        raise ValueError(
            f"not a binary {magic.decode()} PNM (magic {data[:2]!r})"
        )
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace byte after maxval, per spec
    width, height, maxval = (int(t) for t in tokens)
    if width <= 0 or height <= 0:
        # A zero-dimension image would "parse" into an empty raster
        # and crash downstream stats with a bare max()-of-empty
        # instead of a named malformation error.
        raise ValueError(f"non-positive PNM dimensions {width}x{height}")
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PNM maxval {maxval}")
    want = width * height * samples_per_pixel
    raster = data[pos : pos + want]
    if len(raster) != want:
        raise ValueError(
            f"PNM raster truncated: want {want} bytes, "
            f"have {len(raster)}"
        )
    return width, height, raster


def _parse_pgm(data: bytes) -> tuple[int, int, bytes]:
    """Binary PGM (P5): one 8-bit sample per pixel."""
    return _parse_pnm(data, b"P5", 1)


def _parse_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Binary PPM (P6): interleaved 8-bit R,G,B samples per pixel."""
    return _parse_pnm(data, b"P6", 3)


def decode_pgm(media: DataFrame) -> DataFrame:
    """REAL image decode: binary PGM payload → per-image pixel stats.

    Same mapInPandas stage shape as the stubbed decoders — proof that
    swapping a stub for a real codec changes no schema, partitioning,
    or caller.  Stats are exact integers (sum/min/max over raster
    bytes) so the oracle comparison is bit-strict."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_pixels": [],
                "px_sum": [],
                "px_min": [],
                "px_max": [],
            }
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = _parse_pgm(bytes(payload))
                rows["media_id"].append(media_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(len(raster))
                rows["px_sum"].append(sum(raster))
                rows["px_min"].append(min(raster))
                rows["px_max"].append(max(raster))
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, schema=_PGM_STATS_SCHEMA)


_WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("abs_sum", LongType()),
        StructField("peak", LongType()),
    ]
)


def synthesize_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Genuine RIFF/WAVE PCM16 payloads, one per id, written by the
    stdlib ``wave`` encoder (a payload saved to disk plays in any
    audio player).  Sample count, rate and the PCM stream are
    deterministic functions of the id (``n = 800 + id % 401``,
    ``rate = 8000 + (id % 3) * 4000``, ``s(i) = ((id*13 + i*11) %
    4001) - 2000``) so an SQL oracle can replay the sample arithmetic
    without parsing bytes."""

    @F.pandas_udf(BinaryType())
    def _wav(ids: pd.Series) -> pd.Series:
        import io
        import struct
        import wave

        out = []
        for mid in ids:
            mid = int(mid)
            n = 800 + mid % 401
            rate = 8000 + (mid % 3) * 4000
            samples = [
                ((mid * 13 + i * 11) % 4001) - 2000 for i in range(n)
            ]
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(struct.pack(f"<{n}h", *samples))
            out.append(buf.getvalue())
        return pd.Series(out)

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _wav(F.col(id_col)).alias("payload"),
        F.lit("audio/wav").alias("media_type"),
    ).withColumn("byte_len", F.octet_length("payload").cast("long"))


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode: RIFF/WAVE PCM16 payload → per-clip sample
    stats via the stdlib ``wave`` parser (validates the RIFF header,
    fmt chunk and frame count; raises ``wave.Error`` on malformed
    bytes).  Only mono 16-bit PCM is accepted — a loud ValueError,
    not silent garbage, for anything else.  Exact integer stats
    (Σ|s|, peak) keep the oracle comparison bit-strict."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            rows = {k.name: [] for k in _WAV_STATS_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    ch, width, rate, n = (
                        w.getnchannels(),
                        w.getsampwidth(),
                        w.getframerate(),
                        w.getnframes(),
                    )
                    if ch != 1 or width != 2:
                        raise ValueError(
                            f"decode_wav: media {media_id} is "
                            f"{ch}ch/{8 * width}-bit; only mono PCM16 "
                            "is supported"
                        )
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                rows["media_id"].append(media_id)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(ch)
                rows["n_samples"].append(n)
                rows["abs_sum"].append(sum(abs(s) for s in samples))
                # A zero-frame WAV is legal; peak of silence is 0,
                # not a bare max()-of-empty ValueError.
                rows["peak"].append(
                    max((abs(s) for s in samples), default=0)
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, schema=_WAV_STATS_SCHEMA)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched decode returning image metadata per row.

    STUB: real decode would be ``PIL.Image.open(io.BytesIO(b))``;
    here width/height/channels derive deterministically from MD5 so
    tests pin the plumbing.  Batch shape, schema, and partitioning are
    production-real."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(payload)).digest()
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [16 + d[0] % 240 for d in digests],
                    "height": [16 + d[1] % 240 for d in digests],
                    "channels": [1 + d[2] % 4 for d in digests],
                }
            )

    return media.mapInPandas(decode, schema=_DECODED_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_len: int = 32) -> DataFrame:
    """Deterministic frame sampling: n byte-windows per payload.

    STUB for video frame extraction (ffmpeg); output one row per
    (media, frame) — the explode shape a real sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not data:
                    continue
                stride = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    lo = (i * stride) % len(data)
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(data[lo : lo + frame_len])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(sample, schema=_FRAMES_SCHEMA)


_RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def resize_stub(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Deterministic "resize": payload cycled/truncated to exactly
    width*height bytes.

    STUB for ``PIL.Image.resize`` — the production concern this
    preserves is the data-flow shape: binary in, fixed-size binary
    out, Arrow batches, no Python object per pixel."""
    target = width * height

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                data = bytes(payload) or b"\x00"
                reps = target // len(data) + 1
                out.append((data * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.mapInPandas(rs, schema=_RESIZED_SCHEMA)


def feature_embed(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic pseudo feature extraction: payload → unit-free
    double vector derived from SHA-256 bytes.

    STUB for a vision/audio encoder forward pass; the output column
    is a real ``array<double>`` that feeds the similarity operators
    (operators/similarity.py) unchanged — multimodal ingest and ANN
    share one vector pipeline."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                [
                    (digest[i % 32] - 127.5) / 127.5
                    for i in range(dim)
                ]
                for digest in (
                    hashlib.sha256(bytes(p)).digest() for p in pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(fe, schema=_FEATURES_SCHEMA)


_PPM_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
        StructField("px_max", LongType()),
    ]
)


def synthesize_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Genuine binary PPM (P6) color payloads, one per id.

    Same contract as synthesize_pgm but with an interleaved R,G,B
    raster: sample c of pixel i is ``(id*31 + i*7 + c*101) % 256``,
    so each channel is a distinct deterministic function of the id
    that an SQL oracle can replay without parsing bytes — while the
    BYTES are a complete spec-conformant color image."""

    @F.pandas_udf(BinaryType())
    def _ppm(ids: pd.Series) -> pd.Series:
        out = []
        for mid in ids:
            mid = int(mid)
            w, h = 4 + mid % 9, 4 + mid % 7
            raster = bytes(
                (mid * 31 + i * 7 + c * 101) % 256
                for i in range(w * h)
                for c in range(3)
            )
            out.append(b"P6\n%d %d\n255\n" % (w, h) + raster)
        return pd.Series(out)

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _ppm(F.col(id_col)).alias("payload"),
        F.lit("image/x-portable-pixmap").alias("media_type"),
    ).withColumn("byte_len", F.octet_length("payload").cast("long"))


def decode_ppm(media: DataFrame) -> DataFrame:
    """REAL color-image decode: binary PPM (P6) payload → per-image
    per-channel stats.  The interleaved raster is de-planarized with
    stride-3 slices — the parsing step a grayscale decoder never
    exercises; stats are exact integers so the oracle comparison is
    bit-strict."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_pixels": [],
                "r_sum": [],
                "g_sum": [],
                "b_sum": [],
                "px_max": [],
            }
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = _parse_ppm(bytes(payload))
                rows["media_id"].append(media_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["r_sum"].append(sum(raster[0::3]))
                rows["g_sum"].append(sum(raster[1::3]))
                rows["b_sum"].append(sum(raster[2::3]))
                rows["px_max"].append(max(raster))
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, schema=_PPM_STATS_SCHEMA)
