"""Sinks (SURVEY §2a R13).

The reference appends TableRows to BigQuery with WRITE_APPEND /
CREATE_IF_NEEDED batch-load semantics staged through GCS
(HanaToBQ.java:256-259, README:22).  The Spark analog is the
spark-bigquery-connector's indirect write mode — same staging-then-load
shape.  The connector jar is not available in this container, so the
BigQuery path is interface-complete but gated; the parquet append sink
is the tested stand-in with identical append/create semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parquet_append(df: DataFrame, path: str) -> None:
    """Append-mode parquet write — the local BigQuery stand-in.

    mode("append") creates the directory if needed (CREATE_IF_NEEDED)
    and never truncates (WRITE_APPEND), matching HanaToBQ.java:256-259.
    """
    df.write.mode("append").parquet(path)


def bigquery_append(
    df: DataFrame, dataset: str, table: str, *, temp_bucket: str | None = None
) -> None:
    """BigQuery append via spark-bigquery-connector (indirect mode ≈
    the reference's GCS-staged batch load job).  Requires the connector
    jar on the classpath; raises a clear error when absent."""
    writer = (
        df.write.format("bigquery")
        .mode("append")
        .option("writeMethod", "indirect")
    )
    if temp_bucket:
        writer = writer.option("temporaryGcsBucket", temp_bucket)
    try:
        writer.save(f"{dataset}.{table}")
    except Exception as exc:  # pragma: no cover - no connector in CI
        raise RuntimeError(
            "BigQuery sink needs the spark-bigquery-connector jar "
            "(--packages com.google.cloud.spark:spark-bigquery-with-"
            "dependencies); use parquet_append as the local stand-in"
        ) from exc


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """Append-mode JDBC write — the reverse of the partitioned JDBC
    scan (SURVEY §2a R1), completing the source/sink symmetry the
    reference lacks (it can only write to BigQuery).

    Semantics match the reference sink's WRITE_APPEND /
    CREATE_IF_NEEDED (HanaToBQ.java:256-259): the table is created
    from the DataFrame schema if absent and never truncated.  Each
    input partition opens one connection and writes prepared-statement
    batches of ``batchsize`` rows — write parallelism equals the
    partition count, so repartition upstream to match what the target
    database can absorb."""
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    writer = df.write.mode("append").option("batchsize", str(batchsize))
    writer.jdbc(url, table, mode="append", properties=props)


def range_clustered_write(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Write parquet range-clustered on ``col``: repartitionByRange
    (sampled range boundaries → one contiguous value band per file)
    plus an in-partition sort (monotone pages within the file).

    Layout, not just a write: parquet footers carry per-row-group
    min/max, and a later range scan (the copy pipeline's chunk
    predicates, time-windowed queries) skips every file/row-group
    whose band misses the filter.  On a randomly-laid-out 100 TB
    table every file's [min, max] spans the whole domain and nothing
    prunes; range-clustered, a day-window scan touches ~1/365th of
    the files.  Costs one range-exchange at write time — paid once,
    recouped on every subsequent scan (tests/test_sources.py asserts
    the bands are disjoint and that Spark's scan prunes).
    """
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_clustered_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits_per_col: int = 6,
) -> None:
    """Write parquet Z-order-clustered on MULTIPLE columns: each
    column is rank-bucketed into ``2^bits_per_col`` equi-depth buckets
    (approxQuantile boundaries — skew-proof, unlike uniform-width
    bucketing), the bucket indices are bit-interleaved into one
    Z-value, and files are range-partitioned + sorted on it.

    Single-column range clustering localizes ONE dimension; a filter
    on any other column prunes nothing.  The Z-curve localizes all
    ``cols`` at once — every file covers a small hyper-rectangle of
    the value space, so a conjunctive range filter on ANY subset of
    the columns skips most files via parquet footer min/max (the
    Delta/Iceberg OPTIMIZE ZORDER technique, here as a plain write).
    At 100 TB: one driver-side quantile sketch pass per column + one
    range exchange at write — same bill as range clustering — bought
    once, recouped on every multi-dimension scan.

    Bucketing is expression-only after planning: the ≤ 2^bits
    boundaries per column ship as an inline array literal folded per
    row (codegen; no join, no UDF).
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    work = df
    bucket_cols = []
    for c in cols:
        bounds = (
            df.select(F.col(c).cast("double").alias("__v"))
            .approxQuantile("__v", probs, 0.01)
        )
        # strictly increasing boundary list (quantiles repeat on skew)
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        arr = "array(" + ", ".join(f"cast({b!r} as double)" for b in uniq) + ")"
        bname = f"__zb_{c}"
        # bucket = #boundaries strictly below the value — a fold over
        # the inline boundary array, O(2^bits) integer ops per row
        work = work.withColumn(
            bname,
            F.expr(
                f"aggregate({arr}, cast(0 as bigint), "
                f"(acc, b) -> acc + if(cast({c} as double) > b, 1, 0))"
            ),
        )
        bucket_cols.append(bname)
    # bit-interleave the bucket indices into the Z-value
    terms = []
    for bit in range(bits_per_col):
        for j, bname in enumerate(bucket_cols):
            out_pos = bit * len(bucket_cols) + j
            terms.append(
                f"shiftleft(shiftright({bname}, {bit}) & 1, {out_pos})"
            )
    z = " + ".join(terms)
    (
        work.withColumn("__z", F.expr(z))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *bucket_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, path: str, target_file_mb: int = 512
) -> int:
    """Compact a small-files parquet directory in place: read, coalesce
    to ceil(bytes / target), atomically swap.  Returns the new file
    count.

    The small-files problem is the silent killer of long-lived 100 TB
    tables fed by streaming/incremental appends: a million 1 MB files
    means a million scan tasks and a throttled namenode.  Coalesce
    (not repartition) merges without a shuffle; the rewrite is
    staged to a sibling directory then swapped, so readers never see
    a half-compacted table.  Run it per partition directory in
    production so compaction itself parallelizes across partitions.
    """
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dns, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    staged = path.rstrip("/") + "._compacting"
    spark.read.parquet(path).coalesce(n).write.mode(
        "overwrite"
    ).parquet(staged)
    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return sum(
        1
        for _dp, _dns, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    )


def idempotent_append(df: DataFrame, path: str, run_id: str) -> None:
    """Append that is safe to RETRY: each run writes (overwrite) its
    own ``run_id=<id>`` subdirectory, so re-executing a failed or
    duplicated run replaces its output instead of appending twice.

    The reference's WRITE_APPEND pipeline duplicates every row if the
    job is re-run for the same window (HanaToBQ.java:256-259 — no
    dedup, no run scoping); pairing the run id with the incremental
    window (plans/incremental.py) makes the whole copy pipeline
    retry-idempotent: readers see ``path/run_id=*`` as one table, and
    exactly-once-per-window holds under any number of retries.
    """
    safe = "".join(
        ch if ch.isalnum() or ch in "-_." else "_" for ch in run_id
    )
    df.write.mode("overwrite").parquet(f"{path}/run_id={safe}")


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Reprocess-in-place for a partitioned table: replace ONLY the
    partitions present in ``df``, leave every other partition's files
    untouched.

    The backfill idiom for a 100 TB date-partitioned sink — "yesterday
    arrived late, recompute 2024-03-07" — must not rewrite (or even
    list) the other ~3650 day partitions, and static ``overwrite``
    would truncate the whole table.  Spark's dynamic partition
    overwrite scopes the commit to the partition directories the
    incoming frame actually contains; combined with the high-watermark
    planner (plans/incremental.py) this gives idempotent per-partition
    reprocessing: re-running a window replaces exactly that window's
    partitions, any number of times.

    The conf is set per-write here (session-level default left alone)
    because the same session may also run static overwrites.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
