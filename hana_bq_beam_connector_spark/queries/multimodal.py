"""Multimodal-column queries (SURVEY §2c multimodal [X]).

Binary payload plumbing is oracle-checked (byte lengths, MD5 content
addresses); the decode/frame-sample stages are Arrow-batched
mapInPandas stubs (no codec libs in this container) with real schema /
batch / partition flow, checked rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.multimodal import (
    decode_image_meta,
    documents_as_media,
    frame_sample,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "mm_binary_metadata",
    """
    SELECT doc_id AS media_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      md5(text) AS content_md5,
      'image/fake' AS media_type
    FROM documents
    """,
    doc="Opaque-binary column plumbing: payload byte length + MD5 "
    "content address — the dedupe/addressing layer for media blobs "
    "(text bytes stand in for encoded images).",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = documents_as_media(d)
    return media.select(
        "media_id",
        "byte_len",
        F.md5(F.col("payload")).alias("content_md5"),
        "media_type",
    )


@register(
    "mm_decode_image_meta",
    None,  # mapInPandas stub stage — rows-only check
    doc="Arrow-batched decode stage (mapInPandas): binary payload -> "
    "typed (width, height, channels) metadata.  Decode body is a "
    "deterministic MD5-derived STUB (no codec libs here); swapping "
    "in PIL changes no schema or partitioning.  Determinism is "
    "pinned by tests/test_multimodal.py.",
)
def mm_decode_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return decode_image_meta(documents_as_media(d))


@register(
    "mm_frame_sample",
    None,  # mapInPandas stub stage — rows-only check
    doc="Frame sampling stage (mapInPandas): one row per (media, "
    "frame) with deterministic byte-window 'frames' standing in for "
    "ffmpeg output; the explode shape and schema are production-real.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(documents_as_media(d), n_frames=4, frame_len=32)


@register(
    "mm_resize_shapes",
    None,  # mapInPandas stub stage — rows-only check
    doc="Resize stage (mapInPandas): binary in -> fixed 32x32-byte "
    "binary out, the PIL.resize slot; output length audited via "
    "octet_length so the contract (exactly width*height bytes) is "
    "checked distributed.",
)
def mm_resize_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.multimodal import resize_stub

    d = load_table(spark, sf_dir, "documents")
    resized = resize_stub(documents_as_media(d), width=32, height=32)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").cast("long").alias("payload_len"),
    )


@register(
    "mm_feature_topk",
    None,  # mapInPandas stub + ANN composition — rows-only check
    doc="Feature-extract -> similarity composition: the encoder STUB "
    "emits array<double> features that flow straight into the shared "
    "cosine top-k operator — multimodal ingest and text/embedding ANN "
    "share one vector pipeline (the 100 TB shape: encode once, "
    "broadcast queries, never cross-join).",
)
def mm_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.multimodal import (
        feature_embed,
    )
    from hana_bq_beam_connector_spark.operators.similarity import cosine_topk

    d = load_table(spark, sf_dir, "documents")
    feats = feature_embed(documents_as_media(d), dim=16)
    queries = feats.where(F.col("media_id") < 10)
    return cosine_topk(
        queries, feats, id_col="media_id", vec_col="features", k=3
    )
