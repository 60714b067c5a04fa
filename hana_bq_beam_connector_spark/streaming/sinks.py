"""Streaming sinks & built-in streaming dedup.

Two production patterns the window/stateful modules don't cover:

* ``dedup_within_watermark`` — Spark's built-in streaming dedup
  (``dropDuplicatesWithinWatermark``): state for a key is held only
  until the watermark passes it, so an at-least-once upstream (Kafka
  replays, retried micro-batches) becomes effectively-once without
  unbounded state — the built-in alternative to the
  applyInPandasWithState flag machine when dup keys arrive close in
  event time.
* ``foreach_batch_idempotent_append`` — exactly-once file sink: each
  micro-batch writes to a batch-id-keyed subdirectory, so a replayed
  batch (failure between write and checkpoint commit) OVERWRITES its
  own previous attempt instead of appending duplicates.  This is the
  standard idempotent-writer recipe for sinks without transactions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _current_epoch(pointer: str) -> str | None:
    """Path the snapshot pointer names, or None before first publish."""
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return fh.read().strip()


def _publish_epoch(df: DataFrame, epoch_dir: str, pointer: str) -> None:
    """The pointer-swap publish shared by every snapshot sink: write
    the epoch directory, then atomically repoint CURRENT.  Callers
    must first check ``_current_epoch(pointer) == epoch_dir`` and skip
    the batch (replay after the swap) — re-applying it would
    double-count a merge, xor-cancel a fingerprint, or crash the CDC
    apply on read-write path overlap.  Centralized so a protocol fix
    (fsync, path normalization, epoch GC) lands once, not three
    times."""
    df.write.mode("overwrite").parquet(epoch_dir)
    tmp = pointer + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(epoch_dir)
    os.replace(tmp, pointer)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    event_time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate ``keys`` arriving within the watermark horizon;
    per-key state is evicted once the watermark passes — bounded
    state under unbounded duplicate streams."""
    return events.withWatermark(event_time_col, watermark)\
        .dropDuplicatesWithinWatermark(keys)


def foreach_batch_idempotent_append(
    stream: DataFrame, base_path: str, checkpoint: str
):
    """Start an availableNow query appending parquet per micro-batch,
    idempotently: batch N always lands in ``{base_path}/batch={N}``
    with overwrite, so replays cannot duplicate rows."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_against_corpus(
    doc_stream: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    base_path: str,
    checkpoint: str,
    k: int = 3,
    threshold: float = 0.8,
):
    """Streaming corpus curation: each micro-batch of incoming
    documents is probed against a build-once corpus LSH index
    (operators/dedup.corpus_dedup_index); survivors (no near-dup in
    the corpus) land in a batch-id-keyed directory, so replays
    overwrite their own attempt — effectively-once end to end.

    The index is built and persisted BEFORE the query starts and
    closed over by the foreachBatch callback: per-batch cost is
    O(micro-batch) — shingle the increment, broadcast-probe the band
    index, anti-join — the corpus is never re-shingled or shuffled.
    This is the production shape for continuous ingestion at 100 TB
    corpus scale: the band table lives bucketed on band_hash, and
    accepted batches append their own bands to it downstream.
    """
    from hana_bq_beam_connector_spark.operators.dedup import (
        corpus_dedup_index,
        incremental_near_dup_filter,
    )

    index = corpus_dedup_index(corpus_df, id_col, text_col, k)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = incremental_near_dup_filter(
            batch_df,
            corpus_df,
            id_col,
            text_col,
            k,
            threshold,
            index=index,
        )
        fresh.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_apply_cdc(
    changes: DataFrame,
    snapshot_dir: str,
    key: str,
    checkpoint: str,
    op_col: str = "op",
    seq_col: str | None = None,
    validate: bool = True,
):
    """Continuously fold a CDC change stream into a published keyed
    snapshot — the streaming twin of ``plans/cdc.apply_cdc``.

    Snapshot publishing uses the pointer/ping-pong recipe for sinks
    without transactions: each micro-batch applies its changes to the
    snapshot named by ``{snapshot_dir}/CURRENT``, writes the result to
    an epoch-keyed directory (``v{batch_id}``), then atomically swaps
    the pointer.  Replays are idempotent on BOTH sides of the swap: a
    failure before it rewrites the (unreferenced) epoch directory with
    identical content and re-points; a failure after it is detected at
    batch start (pointer already names this batch's epoch) and the
    apply is skipped — so the published snapshot is exactly-once.
    Readers resolve CURRENT once and read an immutable
    directory; a compaction job can delete epochs older than any
    running reader.

    At scale the per-batch cost is one co-partitioned anti-join +
    union of the change batch against the snapshot (bounded by delta
    size, see plans/cdc.py); with the snapshot bucketed on the key the
    base side never shuffles.

    A CDC log routinely carries several changes for one key inside one
    micro-batch (maxFilesPerTrigger coalesces files) — pass ``seq_col``
    so apply_cdc resolves them last-wins instead of raising, which in
    a stream would otherwise be a permanent crash loop (the failed
    batch replays and raises again); ``validate=False`` opts out of
    the guard entirely for pre-deduped feeds.
    """
    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    pointer = os.path.join(snapshot_dir, "CURRENT")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        drop = {op_col} | ({seq_col} if seq_col else set())
        base_cols = [c for c in batch_df.columns if c not in drop]
        epoch_dir = os.path.join(snapshot_dir, f"v{batch_id}")
        cur_path = _current_epoch(pointer)
        if cur_path == epoch_dir:
            # Replay after the pointer swap (failure landed between
            # os.replace and the checkpoint commit): this batch's
            # epoch is already published.  Reading it as the base
            # and overwriting the same path would raise "cannot
            # overwrite a path that is also being read from" —
            # skip, the published snapshot is already correct.
            return
        base = (
            spark.read.parquet(cur_path)
            if cur_path is not None
            else batch_df.select(*base_cols).limit(0)
        )
        out = apply_cdc(
            base,
            batch_df,
            key=key,
            op_col=op_col,
            seq_col=seq_col,
            validate=validate,
        )
        _publish_epoch(out, epoch_dir, pointer)

    return (
        changes.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """Resolve the published snapshot pointer and read it."""
    with open(os.path.join(snapshot_dir, "CURRENT")) as fh:
        return spark.read.parquet(fh.read().strip())


def gc_snapshot_epochs(snapshot_dir: str, keep: int = 2) -> list[str]:
    """Delete superseded epoch directories, keeping the published one
    plus the ``keep`` newest others (grace for in-flight readers that
    resolved CURRENT just before a swap).

    Every pointer-swap sink (CDC snapshot, merged aggregate,
    fingerprint table) accretes one ``v{batch_id}`` directory per
    micro-batch forever without this; the published epoch is never
    deleted regardless of age, so a crashed/lagging stream cannot GC
    itself into data loss.  Returns the removed paths.  Run it from a
    maintenance schedule, not the hot path — it lists O(epochs)
    directories."""
    import shutil

    cur = _current_epoch(os.path.join(snapshot_dir, "CURRENT"))
    epochs = sorted(
        (
            e
            for e in os.listdir(snapshot_dir)
            if e.startswith("v") and e[1:].isdigit()
        ),
        key=lambda e: int(e[1:]),
        reverse=True,
    )
    removed: list[str] = []
    spared = 0
    for e in epochs:
        path = os.path.join(snapshot_dir, e)
        if cur is not None and os.path.abspath(path) == os.path.abspath(cur):
            continue  # the published epoch is immortal
        if spared < keep:
            spared += 1
            continue
        shutil.rmtree(path)
        removed.append(path)
    return removed


def stream_merge_aggregate(
    events: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    checkpoint: str,
    value_col: str = "value",
):
    """Incremental materialized-view maintenance: per-key running
    (count, sum) kept current by merging each micro-batch's partial
    aggregate into a published snapshot — the streaming twin of a
    grouped aggregate table, without reprocessing history.

    Each micro-batch reduces to its own per-key partials (map-side
    combined — the batch's raw rows never shuffle past the first
    aggregate), full-outer-merges them with the current snapshot by
    key, and publishes via the same epoch-dir/pointer swap as
    ``stream_apply_cdc`` — idempotent on replay, exactly-once
    publish.  Sums accumulate through DECIMAL(18,2) so the maintained
    view equals the from-scratch batch aggregate exactly, not
    approximately.  Snapshot size is O(distinct keys); at 10^9 keys
    bucket the snapshot on the key so the merge join never shuffles
    the big side.
    """
    from pyspark.sql import functions as F

    pointer = os.path.join(snapshot_dir, "CURRENT")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch_dir = os.path.join(snapshot_dir, f"v{batch_id}")
        part = batch_df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"),
        )
        cur_path = _current_epoch(pointer)
        if cur_path == epoch_dir:
            # Already published by a pre-checkpoint-commit replay
            # (see stream_apply_cdc): merging again would DOUBLE-
            # COUNT this batch into the running aggregate.
            return
        if cur_path is not None:
            cur = spark.read.parquet(cur_path)
            merged = (
                cur.select(
                    *keys,
                    F.col("n").alias("n_old"),
                    F.col("total").alias("t_old"),
                )
                .join(
                    part.select(
                        *keys,
                        F.col("n").alias("n_new"),
                        F.col("total").alias("t_new"),
                    ),
                    on=keys,
                    how="full_outer",
                )
                .select(
                    *keys,
                    (
                        F.coalesce(F.col("n_old"), F.lit(0))
                        + F.coalesce(F.col("n_new"), F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce(
                            F.col("t_old"), F.lit(0).cast("decimal(18,2)")
                        )
                        + F.coalesce(
                            F.col("t_new"), F.lit(0).cast("decimal(18,2)")
                        )
                    ).cast("decimal(18,2)").alias("total"),
                )
            )
        else:
            merged = part
        _publish_epoch(merged, epoch_dir, pointer)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_self_extending(
    doc_stream: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    base_path: str,
    index_dir: str,
    checkpoint: str,
    k: int = 3,
    threshold: float = 0.8,
):
    """Continuous self-deduplicating ingestion: each micro-batch is
    probed against the corpus LSH index PLUS the bands of every
    previously-accepted batch — so a document that duplicates an
    earlier *accepted* arrival is rejected even though it never
    entered the base corpus.  This closes the loop the plain
    streaming probe leaves open (``streaming_dedup_against_corpus``
    dedups only against the build-once corpus).

    Index maintenance is idempotent the same way the data is: batch
    N's accepted shingle sets and band rows land in
    ``{index_dir}/{sh,bands}/batch=N`` with overwrite, so a replayed
    batch rewrites its own contribution.  Per-batch cost stays
    O(batch): the accumulated index is only ever *probed* via the
    band equi-join (at scale: written bucketed by band_hash, so the
    probe is a bucket-local join).  Intra-batch near-dups are not
    resolved here — run the batch pair operator on ingest batches
    where that matters.
    """
    import os

    from pyspark.sql import functions as F

    from hana_bq_beam_connector_spark.operators.dedup import (
        band_table,
        corpus_dedup_index,
        incremental_near_dup_filter,
        minhash_signature,
        shingle_hashes,
    )

    sh_cor, bands_cor = corpus_dedup_index(corpus_df, id_col, text_col, k)
    sh_dir = os.path.join(index_dir, "sh")
    bands_dir = os.path.join(index_dir, "bands")

    def _read_accumulated(spark, path, exclude_batch_id):
        # batch_N subdir names (NOT key=value: partition inference
        # would add a column and silently break the union); absent
        # dir = no accepted batches yet.  The CURRENT batch's own
        # subdir is excluded: on micro-batch replay (failure after the
        # index write but before the checkpoint commit) the replayed
        # batch would otherwise probe against its OWN shingles/bands,
        # self-match every document at Jaccard 1.0, and overwrite its
        # accepted output with empty — silent loss.
        if not os.path.isdir(path):
            return None
        own = f"batch_{exclude_batch_id}"
        subdirs = [
            os.path.join(path, d)
            for d in sorted(os.listdir(path))
            if d.startswith("batch_")
            and d != own
            and os.path.isdir(os.path.join(path, d))
        ]
        if not subdirs:
            return None
        return spark.read.parquet(*subdirs)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh_idx, bands_idx = sh_cor, bands_cor
        sh_acc = _read_accumulated(spark, sh_dir, batch_id)
        bands_acc = _read_accumulated(spark, bands_dir, batch_id)
        if sh_acc is not None and bands_acc is not None:
            sh_idx = sh_idx.unionByName(sh_acc)
            bands_idx = bands_idx.unionByName(bands_acc)
        fresh = incremental_near_dup_filter(
            batch_df,
            corpus_df,
            id_col,
            text_col,
            k,
            threshold,
            index=(sh_idx, bands_idx),
        )
        fresh.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )
        accepted = spark.read.parquet(f"{base_path}/batch={batch_id}")
        sh_new = shingle_hashes(
            accepted.select(id_col, text_col), text_col, k
        )
        sh_new.write.mode("overwrite").parquet(
            f"{sh_dir}/batch_{batch_id}"
        )
        band_table(minhash_signature(sh_new), id_col).write.mode(
            "overwrite"
        ).parquet(f"{bands_dir}/batch_{batch_id}")

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_dedup_index(spark, index_dir: str) -> dict:
    """Fold the self-extending index's per-batch contributions into
    one compacted directory per component (sh/, bands/).

    The streaming sink accretes ``batch_N`` subdirs forever; every
    micro-batch then unions O(batches) parquet roots just to probe.
    Compaction merges all existing contributions (including earlier
    compactions) into ``batch_compacted_{max_id}`` — still matched by
    the sink's ``batch_*`` listing, never colliding with a numeric
    replay exclusion — then deletes the sources.

    Run it BETWEEN stream runs (availableNow jobs), over committed
    batches only: a compacted dir containing a batch that later
    replays would defeat the replay self-match exclusion.  Crash
    safety: the merged dir is written to a temp path and renamed
    before sources are deleted; a crash in between leaves duplicate
    index rows, which are semantically harmless to the probe (any
    candidate match rejects a duplicate regardless of multiplicity)
    and disappear at the next compaction.  Returns per-component
    source counts."""
    import shutil

    stats: dict[str, int] = {}
    for comp in ("sh", "bands"):
        root = os.path.join(index_dir, comp)
        if not os.path.isdir(root):
            stats[comp] = 0
            continue
        sources = [
            d
            for d in sorted(os.listdir(root))
            if d.startswith("batch_")
            and os.path.isdir(os.path.join(root, d))
        ]
        numeric = [
            int(d.split("_")[1])
            for d in sources
            if d.split("_")[1].isdigit()
        ]
        stats[comp] = len(sources)
        if len(sources) <= 1 or not numeric:
            continue  # nothing to fold
        max_id = max(numeric)
        dest = os.path.join(root, f"batch_compacted_{max_id}")
        # Dotted temp name: must NOT match the 'batch_*' prefix that
        # _read_accumulated and this compactor's own source listing
        # use, or a crash between the Spark write and the rename would
        # leave a half-written dir the next run tries to read — a
        # crash LOOP instead of crash safety.
        tmp = os.path.join(root, f".tmp_compacted_{max_id}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # stale leftover from a prior crash
        spark.read.parquet(
            *[os.path.join(root, d) for d in sources]
        ).write.mode("overwrite").parquet(tmp)
        if os.path.isdir(dest):
            shutil.rmtree(dest)  # idempotent re-run
        os.rename(tmp, dest)
        for d in sources:
            shutil.rmtree(os.path.join(root, d))
    return stats


def stream_maintain_fingerprints(
    events: DataFrame,
    snapshot_dir: str,
    ts_col: str,
    key_col: str,
    checkpoint: str,
    bucket: int = 86_400_000_000,
    *,
    full_row: bool = True,
    measure_cols: list[str] | None = None,
):
    """Incrementally-maintained copy-validation fingerprints — the
    streaming twin of ``plans/reconcile.chunk_fingerprints``.

    At 100 TB you don't re-checksum the corpus per verification run;
    you fold each arriving micro-batch's per-bucket partials (count,
    key XOR, key sum, full-row hash XOR, measure sums — all mergeable:
    counts/sums add, XORs xor) into a published fingerprint snapshot.
    ``reconcile_chunks`` can then diff this snapshot against the
    sink's at any moment without touching source history.  Publishing
    uses the same epoch-dir/pointer swap as ``stream_apply_cdc``
    (idempotent on replay: an already-published epoch is detected and
    skipped, since re-XORing a batch would silently CANCEL its keys
    out of the fingerprint — the worst kind of wrong, a corruption
    the verify tool itself introduced).

    ``full_row``/``measure_cols`` mirror ``chunk_fingerprints``; the
    fingerprint SHAPE is part of the snapshot's contract — changing
    options against an existing snapshot makes ``merge_fingerprints``
    raise loudly instead of zero-filling the missing column.  Pass
    ``full_row=False`` to keep maintaining a pre-row_xor snapshot
    (the upgrade path that avoids re-checksumming source history),
    or when the stream carries map-typed columns (no canonical hash
    order).
    """
    from hana_bq_beam_connector_spark.plans.reconcile import (
        chunk_fingerprints,
        merge_fingerprints,
    )

    pointer = os.path.join(snapshot_dir, "CURRENT")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch_dir = os.path.join(snapshot_dir, f"v{batch_id}")
        part = chunk_fingerprints(
            batch_df,
            ts_col,
            key_col,
            bucket,
            full_row=full_row,
            measure_cols=measure_cols,
        )
        cur_path = _current_epoch(pointer)
        if cur_path == epoch_dir:
            return  # replayed after publish: merging again would
            # xor the batch back OUT of the fingerprint
        if cur_path is not None:
            merged = merge_fingerprints(
                spark.read.parquet(cur_path), part
            )
        else:
            merged = part
        _publish_epoch(merged, epoch_dir, pointer)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
