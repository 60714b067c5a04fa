"""Copy reconciliation — prove a chunked copy delivered every row.

The reference's pipeline copies HANA chunks into BigQuery
(HanaToBQ.java:247-259) and stops; nothing ever checks that the sink
matches the source.  This module closes the loop: both sides reduce
to per-bucket fingerprints — row count, order-insensitive XOR and sum
of a numeric key — and a full-outer join pinpoints the exact buckets
that are missing, extra, or corrupted.  Mismatched buckets are
``[bucket_lo, bucket_lo + bucket)`` windows in the timestamp column's
numeric domain, i.e. directly re-runnable through the same copy
pipeline (and the same shape ``plans/backfill.py`` emits).

Plan shape: each side is ONE scan with a map-side-combined aggregate
(count / bit_xor / sum are all partial-aggregable and
order-insensitive, so the fingerprint is layout- and
parallelism-independent); the join moves O(buckets) rows — day
buckets of a decade are ~3.6k rows at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import re

from hana_bq_beam_connector_spark.colutil import resolve_column
from hana_bq_beam_connector_spark.tsdomain import INTEGRAL_TYPES, ts_numeric

DAY_US = 86_400_000_000


def chunk_fingerprints(
    df: DataFrame, ts_col: str, key_col: str, bucket: int = DAY_US
) -> DataFrame:
    """(bucket_lo, n_rows, key_xor, key_sum) per time bucket.

    ``key_col`` must be exact-integer-valued: a Spark integral type or
    a scale-0 decimal (HANA DECIMAL(p, 0) surrogate keys map to
    DecimalType via typemap.py; the bigint cast of a scale-0 decimal
    is lossless, and under ANSI an overflowing value fails loudly).
    Fractional and string keys are rejected, not coerced — a double
    key truncates silently under non-ANSI sessions (substituted
    5.6 -> 5.4 rows would fingerprint as 'ok', a false negative inside
    the corruption detector), and neither has a meaningful XOR domain.
    The timestamp column may be integral, timestamp_ntz/ltz or date —
    the tsdomain mapping normalizes all of them; bucketing floors
    (pmod), so pre-epoch values land in their own negative buckets
    instead of folding into bucket 0."""
    name, dtype = resolve_column(df, ts_col)
    num = ts_numeric(name, dtype)
    kname, ktype = resolve_column(df, key_col)
    if ktype not in INTEGRAL_TYPES and not re.fullmatch(
        r"decimal\(\d+,0\)", ktype
    ):
        raise ValueError(
            f"chunk_fingerprints: key_col {key_col!r} is {ktype}; the "
            "XOR/sum fingerprint needs an exact-integer key (integral "
            "or scale-0 decimal) — fractional keys would truncate and "
            "strings have no XOR domain"
        )
    return (
        df.select(
            (num - F.pmod(num, F.lit(bucket))).alias("bucket_lo"),
            F.col(kname).cast("bigint").alias("__k"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__k)").alias("key_xor"),
            F.sum("__k").cast("bigint").alias("key_sum"),
        )
    )


def reconcile_chunks(
    source: DataFrame,
    sink: DataFrame,
    ts_col: str,
    key_col: str,
    bucket: int = DAY_US,
) -> DataFrame:
    """Per-bucket verdicts from the two fingerprint tables.

    Returns (bucket_lo, status, src_rows, sink_rows) where status is
    ``ok`` | ``missing_in_sink`` | ``extra_in_sink`` | ``mismatch``
    (row counts equal-or-not is not enough: equal counts with
    different XOR/sum means corrupted or substituted rows).  Filter
    ``status != 'ok'`` and each surviving bucket is a
    [bucket_lo, bucket_lo + bucket) window to re-copy."""
    s = chunk_fingerprints(source, ts_col, key_col, bucket).select(
        "bucket_lo",
        F.col("n_rows").alias("src_rows"),
        F.col("key_xor").alias("src_xor"),
        F.col("key_sum").alias("src_sum"),
    )
    k = chunk_fingerprints(sink, ts_col, key_col, bucket).select(
        "bucket_lo",
        F.col("n_rows").alias("sink_rows"),
        F.col("key_xor").alias("sink_xor"),
        F.col("key_sum").alias("sink_sum"),
    )
    j = s.join(k, "bucket_lo", "full_outer")
    status = (
        F.when(F.col("sink_rows").isNull(), F.lit("missing_in_sink"))
        .when(F.col("src_rows").isNull(), F.lit("extra_in_sink"))
        .when(
            (F.col("src_rows") == F.col("sink_rows"))
            & (F.col("src_xor") == F.col("sink_xor"))
            & (F.col("src_sum") == F.col("sink_sum")),
            F.lit("ok"),
        )
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "bucket_lo", status.alias("status"), "src_rows", "sink_rows"
    )


def merge_fingerprints(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two fingerprint tables: counts and sums add, XORs xor.

    The algebra that makes fingerprints incrementally maintainable:
    ``chunk_fingerprints(A ∪ B) == merge(chunk_fingerprints(A),
    chunk_fingerprints(B))`` for disjoint row sets (property-tested).
    Buckets present on one side pass through; the streaming sink
    (``streaming/sinks.stream_maintain_fingerprints``) folds each
    micro-batch in with exactly this merge."""
    an = a.select(
        "bucket_lo",
        F.col("n_rows").alias("n_a"),
        F.col("key_xor").alias("x_a"),
        F.col("key_sum").alias("s_a"),
    )
    bn = b.select(
        "bucket_lo",
        F.col("n_rows").alias("n_b"),
        F.col("key_xor").alias("x_b"),
        F.col("key_sum").alias("s_b"),
    )
    return an.join(bn, "bucket_lo", "full_outer").select(
        "bucket_lo",
        (
            F.coalesce(F.col("n_a"), F.lit(0))
            + F.coalesce(F.col("n_b"), F.lit(0))
        ).alias("n_rows"),
        F.expr("coalesce(x_a, 0L) ^ coalesce(x_b, 0L)").alias("key_xor"),
        (
            F.coalesce(F.col("s_a"), F.lit(0))
            + F.coalesce(F.col("s_b"), F.lit(0))
        ).cast("bigint").alias("key_sum"),
    )
