"""Copy reconciliation — prove a chunked copy delivered every row,
with every payload byte intact.

The reference's pipeline copies HANA chunks into BigQuery
(HanaToBQ.java:247-259) and stops; nothing ever checks that the sink
matches the source.  This module closes the loop: both sides reduce
to per-bucket fingerprints — row count, order-insensitive XOR and sum
of a numeric key, an order-insensitive XOR of a full-row hash, and
optional exact-decimal measure sums — and a full-outer join pinpoints
the exact buckets that are missing, extra, or corrupted.  Mismatched
buckets are ``[bucket_lo, bucket_lo + bucket)`` windows in the
timestamp column's numeric domain, i.e. directly re-runnable through
the same copy pipeline (and the same shape ``plans/backfill.py``
emits).

Plan shape: each side is ONE scan with a map-side-combined aggregate
(count / bit_xor / sum are all partial-aggregable and
order-insensitive, so the fingerprint is layout- and
parallelism-independent); the join moves O(buckets) rows — day
buckets of a decade are ~3.6k rows at any corpus size.

Full-row hashing canonicalizes each column before xxhash64 so that
equal VALUES hash equal across physically different but lossless
layouts (int vs bigint, decimal(12,2) vs decimal(18,2), float vs
double, NaN payloads, -0.0 vs +0.0, column order).  A lossy re-typing
(string-vs-int, scale change) hashes differently and verdicts
``mismatch`` — the safe direction for a corruption detector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import re

from hana_bq_beam_connector_spark.colutil import resolve_column
from hana_bq_beam_connector_spark.tsdomain import INTEGRAL_TYPES, ts_numeric

DAY_US = 86_400_000_000

_NAN = float("nan")


def _canon(name: str, dtype: str) -> Column:
    """Canonical form of a column for full-row hashing.

    Maps every lossless physical representation of the same logical
    value onto one hash input: integral widths collapse to bigint,
    float to double (NaN payloads and -0.0 normalized), decimal
    precision to 38 at the declared scale, timestamps to epoch
    micros (NTZ via the session zone — both sides of a reconcile run
    in one session, so the choice cancels out).  Nested floats inside
    arrays/structs are hashed as stored (not normalized) — a nested
    -0.0/NaN-payload difference flags ``mismatch``, a false positive,
    never a false negative.  Maps are rejected loudly: Spark defines
    no order-insensitive hash for them — project ``map_entries``
    sorted into an array first."""
    c = F.col(name)
    if "map<" in dtype:
        raise ValueError(
            f"chunk_fingerprints: column {name!r} is {dtype}; map "
            "columns have no canonical hash order — project sorted "
            "map_entries into an array (or drop the column) before "
            "fingerprinting"
        )
    if dtype in INTEGRAL_TYPES:
        return c.cast("bigint")
    if dtype in ("float", "double"):
        d = c.cast("double")
        # + 0.0 folds -0.0 into +0.0; the when() folds every NaN
        # payload onto the canonical NaN literal.
        return F.when(F.isnan(d), F.lit(_NAN)).otherwise(d + F.lit(0.0))
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", dtype)
    if m:
        return c.cast(f"decimal(38,{m.group(2)})")
    if dtype == "timestamp":
        return F.unix_micros(c)
    if dtype == "timestamp_ntz":
        return F.unix_micros(c.cast("timestamp"))
    return c


def row_hash(df: DataFrame) -> Column:
    """xxhash64 over ALL columns, canonicalized and name-sorted.

    Null positions are disambiguated by interleaving is-null flags
    (Spark's hash functions SKIP null inputs, so ``(null, 'a')`` and
    ``('a', null)`` would otherwise collide)."""
    args: list[Column] = []
    for name in sorted(df.columns, key=str.lower):
        _, dtype = resolve_column(df, name)
        args.append(_canon(name, dtype))
        args.append(F.isnull(F.col(name)))
    return F.xxhash64(*args)


def _measure_expr(df: DataFrame, col: str) -> Column:
    """Exact-decimal sum input for a measure column.

    Doubles are rounded to 6 decimal places by the decimal cast —
    deterministic and order-insensitive, unlike native double
    summation whose value depends on partitioning.  decimal(28,s)
    leaves Spark's +10 sum-precision headroom inside decimal(38,s),
    so an overflowing corpus fails loudly (ANSI) instead of wrapping.
    """
    name, dtype = resolve_column(df, col)
    if dtype in INTEGRAL_TYPES:
        return F.col(name).cast("decimal(28,0)")
    if dtype in ("float", "double"):
        return F.col(name).cast("decimal(28,6)")
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", dtype)
    if m:
        return F.col(name).cast(f"decimal(28,{m.group(2)})")
    raise ValueError(
        f"chunk_fingerprints: measure_col {col!r} is {dtype}; measure "
        "sums need a numeric column"
    )


def chunk_fingerprints(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    bucket: int = DAY_US,
    *,
    measure_cols: list[str] | None = None,
    full_row: bool = True,
) -> DataFrame:
    """(bucket_lo, n_rows, key_xor, key_sum[, row_xor][, m_*]) per
    time bucket.

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
    instead of folding into bucket 0.

    ``full_row=True`` (default) adds ``row_xor`` — bit_xor of a
    canonicalized xxhash64 over EVERY column — so a copy that keeps
    keys and counts but mangles any payload column (the classic
    encoding-mangles-strings / truncated-decimal failure) verdicts
    ``mismatch`` instead of ``ok``.  Still one map-side-combined
    aggregate; the hash adds no shuffle width (one bigint per bucket).
    Known blind spot: XOR cancels IDENTICAL pairs, so a corruption
    that manufactures two identical corrupted rows from two identical
    source rows in one bucket escapes; count/key_sum still pin
    cardinality and key multiset.

    ``measure_cols`` adds exact-decimal sums (``m_<col>``) per named
    numeric column — doubles rounded at 6 dp by the decimal cast,
    deterministically — for business-level "the dollars add up"
    verdicts independent of the row hash."""
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
    proj = [
        (num - F.pmod(num, F.lit(bucket))).alias("bucket_lo"),
        F.col(kname).cast("bigint").alias("__k"),
    ]
    if full_row:
        proj.append(row_hash(df).alias("__rh"))
    measure_cols = measure_cols or []
    for mc in measure_cols:
        mname, _ = resolve_column(df, mc)
        proj.append(_measure_expr(df, mc).alias(f"__m_{mname}"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__k)").alias("key_xor"),
        F.sum("__k").cast("bigint").alias("key_sum"),
    ]
    if full_row:
        aggs.append(F.expr("bit_xor(__rh)").alias("row_xor"))
    for mc in measure_cols:
        mname, _ = resolve_column(df, mc)
        aggs.append(F.sum(f"__m_{mname}").alias(f"m_{mname}"))
    return df.select(*proj).groupBy("bucket_lo").agg(*aggs)


def reconcile_chunks(
    source: DataFrame,
    sink: DataFrame,
    ts_col: str,
    key_col: str,
    bucket: int = DAY_US,
    *,
    measure_cols: list[str] | None = None,
    full_row: bool = True,
) -> DataFrame:
    """Per-bucket verdicts from the two fingerprint tables.

    Returns (bucket_lo, status, src_rows, sink_rows) where status is
    ``ok`` | ``missing_in_sink`` | ``extra_in_sink`` | ``mismatch``
    (row counts equal-or-not is not enough: equal counts with
    different XOR/sum/row-hash/measure-sum means corrupted or
    substituted rows).  Filter ``status != 'ok'`` and each surviving
    bucket is a [bucket_lo, bucket_lo + bucket) window to re-copy.

    ``full_row=True`` compares the canonicalized all-columns hash, so
    both sides must carry the SAME column names (order-insensitive;
    checked loudly).  Pass ``full_row=False`` to reconcile sides with
    intentionally different shapes (e.g. a stringified copy) on
    count/key/measure fingerprints only."""
    if full_row:
        src_names = sorted(c.lower() for c in source.columns)
        sink_names = sorted(c.lower() for c in sink.columns)
        if src_names != sink_names:
            raise ValueError(
                "reconcile_chunks: full_row=True needs identical "
                f"column sets; source has {src_names}, sink has "
                f"{sink_names}.  Align the frames or pass "
                "full_row=False for key/measure-only fingerprints"
            )
    kw = {"measure_cols": measure_cols, "full_row": full_row}
    s = chunk_fingerprints(source, ts_col, key_col, bucket, **kw)
    k = chunk_fingerprints(sink, ts_col, key_col, bucket, **kw)
    cmp_cols = [c for c in s.columns if c != "bucket_lo"]
    s = s.select(
        "bucket_lo", *[F.col(c).alias(f"src_{c}") for c in cmp_cols]
    )
    k = k.select(
        "bucket_lo", *[F.col(c).alias(f"sink_{c}") for c in cmp_cols]
    )
    j = s.join(k, "bucket_lo", "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        # Null-SAFE equality: a measure sum over an all-null bucket is
        # NULL on both sides — plain == would make `same` NULL and the
        # verdict fall through to 'mismatch', so an identical copy
        # would be re-copied forever.
        same = same & F.col(f"src_{c}").eqNullSafe(F.col(f"sink_{c}"))
    status = (
        F.when(F.col("sink_n_rows").isNull(), F.lit("missing_in_sink"))
        .when(F.col("src_n_rows").isNull(), F.lit("extra_in_sink"))
        .when(same, F.lit("ok"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "bucket_lo",
        status.alias("status"),
        F.col("src_n_rows").alias("src_rows"),
        F.col("sink_n_rows").alias("sink_rows"),
    )


def merge_fingerprints(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two fingerprint tables: counts and sums add, XORs xor.

    The algebra that makes fingerprints incrementally maintainable:
    ``chunk_fingerprints(A ∪ B) == merge(chunk_fingerprints(A),
    chunk_fingerprints(B))`` for disjoint row sets (property-tested).
    Buckets present on one side pass through; the streaming sink
    (``streaming/sinks.stream_maintain_fingerprints``) folds each
    micro-batch in with exactly this merge.

    Works over whatever fingerprint shape the inputs carry — columns
    ending ``_xor`` xor, everything else (n_rows, key_sum, m_*) adds —
    but both sides must carry the SAME columns: silently treating an
    absent ``row_xor`` as 0 would corrupt the very fingerprint the
    tool maintains, so shape drift raises instead."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            "merge_fingerprints: fingerprint shapes differ — "
            f"{sorted(a.columns)} vs {sorted(b.columns)}.  Rebuild the "
            "older snapshot with the same chunk_fingerprints options"
        )
    cols = [c for c in a.columns if c != "bucket_lo"]
    a_types = dict(a.dtypes)
    an = a.select(
        "bucket_lo", *[F.col(c).alias(f"_a_{c}") for c in cols]
    )
    bn = b.select(
        "bucket_lo", *[F.col(c).alias(f"_b_{c}") for c in cols]
    )
    merged = []
    for c in cols:
        if c.endswith("_xor"):
            merged.append(
                F.expr(
                    f"coalesce(_a_{c}, 0L) ^ coalesce(_b_{c}, 0L)"
                ).alias(c)
            )
        else:
            zero = F.lit(0).cast(a_types[c])
            merged.append(
                (
                    F.coalesce(F.col(f"_a_{c}"), zero)
                    + F.coalesce(F.col(f"_b_{c}"), zero)
                )
                .cast(a_types[c])
                .alias(c)
            )
    return an.join(bn, "bucket_lo", "full_outer").select(
        "bucket_lo", *merged
    )
