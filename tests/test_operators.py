"""Unit tests for the custom operators (SURVEY §2c joins [X])."""

from __future__ import annotations

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.relational import (
    asof_join,
    broadcast_join,
    range_join,
    salted_join,
    topk,
    topk_per_group,
)
from hana_bq_beam_connector_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    plain = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name"
    )
    c2 = c.withColumnRenamed("c_custkey", "o_custkey")
    salted = salted_join(o, c2, on="o_custkey", salt=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_broadcast_join_hint_in_plan(spark):
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    df = broadcast_join(s, n, s["s_nationkey"] == n["n_nationkey"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    o = load_table(spark, SF, "orders")
    df = topk(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 5
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_topk_per_group_depth(spark):
    o = load_table(spark, SF, "orders")
    ranked = topk_per_group(
        o,
        partition_by=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )
    counts = ranked.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert counts <= 2


def test_asof_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 15), (3, 7)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 15, "b"), (1, 20, "c"), (2, 99, "z")],
        ["k", "t", "v"],
    )
    got = {
        (r["k"], r["t"]): r["right_v"]
        for r in asof_join(
            left, right, on="k", ts="t", right_cols=["v"]
        ).collect()
    }
    # naive: latest right with rt <= lt, per key
    assert got == {
        (1, 10): "a",
        (1, 20): "c",  # right at exactly t=20 is visible (non-strict)
        (1, 5): None,
        (2, 15): None,
        (3, 7): None,
    }


def test_asof_join_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, 20)], ["k", "t"])
    right = spark.createDataFrame([(1, 20, "c"), (1, 8, "a")], ["k", "t", "v"])
    got = asof_join(
        left, right, on="k", ts="t", right_cols=["v"], strict=True
    ).collect()
    assert got[0]["right_v"] == "a"


def test_range_join_matches_theta(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    bands = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 8000.0).alias("lo"),
        (F.col("id") * 8000.0 + 12000.0).alias("hi"),
    )
    bucketed = range_join(
        li, bands, point="l_extendedprice", lo="lo", hi="hi", bucket_width=8000
    )
    theta = li.join(
        bands,
        (li["l_extendedprice"] >= bands["lo"])
        & (li["l_extendedprice"] < bands["hi"]),
    )
    assert bucketed.count() == theta.count()
    got = bucketed.groupBy("k").count().orderBy("k").collect()
    want = theta.groupBy("k").count().orderBy("k").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_range_join_avoids_nested_loop(spark):
    li = load_table(spark, SF, "lineitem").select("l_extendedprice")
    bands = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 8000.0).alias("lo"),
        (F.col("id") * 8000.0 + 12000.0).alias("hi"),
    )
    df = range_join(
        li, bands, point="l_extendedprice", lo="lo", hi="hi", bucket_width=8000
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_incremental_dedup_empty_increment(spark):
    """Empty increment → empty survivors, no error (the daily-run
    no-new-data case)."""
    from hana_bq_beam_connector_spark.operators.dedup import (
        incremental_near_dup_filter,
    )

    d = load_table(spark, SF, "documents")
    empty = d.where(F.lit(False))
    out = incremental_near_dup_filter(
        empty, d, id_col="doc_id", text_col="text"
    )
    assert out.count() == 0


def test_incremental_dedup_short_docs_survive(spark):
    """Docs below the shingle size have no bands and must survive
    (nothing to collide with), not be dropped by the plumbing."""
    from hana_bq_beam_connector_spark.operators.dedup import (
        incremental_near_dup_filter,
    )

    new = spark.createDataFrame(
        [(1, "tiny doc"), (2, "one")], "doc_id long, text string"
    )
    corpus = load_table(spark, SF, "documents").select("doc_id", "text")
    out = incremental_near_dup_filter(
        new, corpus, id_col="doc_id", text_col="text"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_cms_empty_input(spark):
    """CMS of an empty frame is an empty grid; probing it yields
    zero estimates (left join + coalesce), not nulls or errors."""
    from hana_bq_beam_connector_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    empty = spark.createDataFrame([], "k long")
    sketch = count_min_sketch(empty, "k", w=16, d=4)
    assert sketch.count() == 0
    probes = spark.createDataFrame([(7,), (9,)], "k long")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, probes, "k", w=16, d=4).collect()
    }
    assert est == {7: 0, 9: 0}


def test_topk_per_group_skewed_exact_and_salted(spark):
    """Two-phase skew-robust cap: identical result set to the direct
    window (selection identity: top-k of per-salt top-k's), with the
    phase-1 exchange keyed on (group, salt) so a hot group spreads
    across fanout tasks before anything sorts the whole group."""
    from hana_bq_beam_connector_spark.operators.relational import (
        topk_per_group_skewed,
    )

    o = load_table(spark, SF, "orders")
    # Make one group pathologically hot: collapse 90% of keys into 0.
    hot = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 != 0, F.lit(0)).otherwise(
            F.col("o_custkey")
        ),
    )
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    direct = topk_per_group(hot, ["o_custkey"], order, 5).drop("rn")
    two_phase = topk_per_group_skewed(
        hot, ["o_custkey"], order, 5, fanout=16
    ).drop("rn")
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, two_phase.collect())
    )
    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" in plan and "__salt" in plan


def test_bloom_prefilter_equals_plain_filter_and_prunes(spark, sf_dir):
    """Bloom prefilter keeps every true match (no false negatives) and
    the filter lands on the big side BEFORE its join exchange."""
    from hana_bq_beam_connector_spark.operators.relational import (
        bloom_prefilter,
    )
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = bloom_prefilter(
        li, small, key="l_orderkey", small_key="o_orderkey"
    )
    keys = {r[0] for r in small.select("o_orderkey").collect()}
    # no false negatives: every lineitem row whose key matches survives
    truth = li.where(F.col("l_orderkey").isin(list(keys)))
    assert pruned.where(
        F.col("l_orderkey").isin(list(keys))
    ).count() == truth.count()
    # selectivity: the bloom actually prunes (not a pass-through)
    assert pruned.count() < li.count()
    # plan: the bloom predicate is a plain Filter over the scan — it
    # runs scan-side, upstream of any join exchange
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "Exchange" not in plan


def test_repeated_spans_counts_within_doc_occurrences(spark):
    from hana_bq_beam_connector_spark.operators.dedup import (
        repeated_span_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e"),   # span 'a b c d e' twice in doc 1
            (2, "a b c d e x y z w v"),   # and once in doc 2
            (3, "p q r s t u v w x y"),   # unrelated
        ],
        "id long, text string",
    )
    out = repeated_span_stats(df, id_col="id", text_col="text", k=5)
    rows = {r["span_hash"]: r for r in out.collect()}
    assert len(rows) == 1  # only 'a b c d e' crosses documents
    (r,) = rows.values()
    assert r["n_docs"] == 2 and r["n_occurrences"] == 3 and r["keeper_id"] == 1


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    from hana_bq_beam_connector_spark.operators.sketch import (
        bitmap_distinct,
    )
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        (r["o_orderstatus"], r["n"])
        for r in bitmap_distinct(
            o, ["o_orderstatus"], "o_custkey", out="n"
        ).collect()
    }
    want = {
        (r["o_orderstatus"], r["n"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    from hana_bq_beam_connector_spark.plans.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, None), (5, "e")], ["k", "v"]
    )
    got = {
        (r["k"], r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, key="k", compare=["v"]).collect()
    }
    assert got == {
        (1, "removed", "a", None),
        (3, "changed", None, "c"),   # NULL -> value counts as a change
        (4, "changed", "d", None),   # value -> NULL too
        (5, "added", None, "e"),
    }  # k=2 unchanged: absent


def test_apply_cdc_delete_beats_update_and_inserts_apply(spark):
    from pyspark.sql import functions as F

    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, None, "D"),
            (1, "z", "U"),   # same-key update loses to the delete
            (2, "B", "U"),
            (9, "i", "I"),
        ],
        ["k", "v", "op"],
    )
    got = {
        (r["k"], r["v"])
        for r in apply_cdc(base, changes, key="k", op_col="op").collect()
    }
    assert got == {(2, "B"), (3, "c"), (9, "i")}

    bad = changes.withColumn("extra", F.lit(1))
    try:
        apply_cdc(base, bad, key="k", op_col="op")
        raise AssertionError("expected ValueError on extra columns")
    except ValueError:
        pass


def test_apply_cdc_multi_row_key_validates_or_resolves_by_seq(spark):
    """A batch with two U rows for one key is not a valid keyed delta:
    without a sequence column the apply raises (instead of silently
    emitting a duplicate-key snapshot); with seq_col the highest
    sequence wins."""
    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    changes = spark.createDataFrame(
        [
            (1, "first", "U", 10),
            (1, "last", "U", 20),   # higher seq — must win
            (3, "c", "I", 5),
        ],
        ["k", "v", "op", "seq"],
    )
    try:
        apply_cdc(base, changes.drop("seq"), key="k", op_col="op")
        raise AssertionError("expected ValueError on multi-row key")
    except ValueError as e:
        assert "seq_col" in str(e)

    got = {
        (r["k"], r["v"])
        for r in apply_cdc(
            base, changes, key="k", op_col="op", seq_col="seq"
        ).collect()
    }
    assert got == {(1, "last"), (2, "b"), (3, "c")}


def test_apply_cdc_seq_delete_then_reinsert_keeps_key(spark):
    """With seq_col, the log's LAST operation decides a key's fate: a
    delete at a lower sequence must not beat a later reinsert (true
    last-wins, not D-always-wins)."""
    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame(
        [
            (1, None, "D", 10),
            (1, "reborn", "I", 20),   # later reinsert wins
            (2, "x", "I", 5),
            (2, None, "D", 6),        # later delete wins
        ],
        ["k", "v", "op", "seq"],
    )
    got = {
        (r["k"], r["v"])
        for r in apply_cdc(
            base, changes, key="k", op_col="op", seq_col="seq"
        ).collect()
    }
    assert got == {(1, "reborn")}


def test_apply_cdc_seq_supports_unorderable_payloads(spark):
    """The seq tie-break orders by (seq, op) only, so map-typed
    payload columns — unorderable in a window — stay supported."""
    from pyspark.sql import functions as F

    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame(
        [(1, {"a": 1})], "k bigint, payload map<string,int>"
    )
    changes = spark.createDataFrame(
        [(1, {"b": 2}, "U", 10), (1, {"c": 3}, "U", 20)],
        "k bigint, payload map<string,int>, op string, seq bigint",
    )
    got = apply_cdc(
        base, changes, key="k", op_col="op", seq_col="seq"
    ).select("k", F.map_keys("payload").alias("mk")).collect()
    assert [(r["k"], r["mk"]) for r in got] == [(1, ["c"])]


def test_chunk_fingerprints_rejects_non_integral_key(spark):
    """Doubles truncate (corruption fingerprints as ok) and strings
    NULL out (everything mismatches) — both must raise, not coerce."""
    import pytest

    from hana_bq_beam_connector_spark.plans.reconcile import (
        chunk_fingerprints,
    )

    df = spark.createDataFrame(
        [(1_700_000_000_000_000, 1.5, "u1")], "ts bigint, v double, s string"
    )
    for bad in ("v", "s"):
        with pytest.raises(ValueError, match="exact-integer key"):
            chunk_fingerprints(df, "ts", bad)
    # Scale-0 decimals (HANA DECIMAL(p,0) surrogate keys) are exact
    # integers — accepted, and the fingerprint is lossless.
    from pyspark.sql import functions as F

    dec = df.select("ts", F.col("ts").cast("decimal(19,0)").alias("dk"))
    got = chunk_fingerprints(dec, "ts", "dk").collect()
    assert len(got) == 1 and got[0]["key_sum"] == 1_700_000_000_000_000


def test_reconcile_all_null_measure_bucket_is_ok(spark):
    """A bucket whose measure column is NULL on BOTH (identical)
    sides must verdict 'ok': the fingerprint comparison is null-SAFE.
    Plain == would make the verdict NULL -> 'mismatch' and the repair
    loop would re-copy an already-correct bucket forever."""
    from hana_bq_beam_connector_spark.plans.reconcile import (
        reconcile_chunks,
    )

    rows = [(1_000, 1, None), (2_000, 2, 5.0)]
    schema = "ts bigint, k bigint, m double"
    src = spark.createDataFrame(rows, schema)
    sink = spark.createDataFrame(rows, schema)
    got = {
        r["bucket_lo"]: r["status"]
        for r in reconcile_chunks(
            src, sink, "ts", "k", bucket=1000, measure_cols=["m"]
        ).collect()
    }
    assert got == {1000: "ok", 2000: "ok"}


def test_salted_join_tolerates_map_columns(spark):
    """Map-typed payload columns are excluded from the row salt
    (xxhash64 rejects MapType); the join must still work and agree
    with the plain join."""
    from hana_bq_beam_connector_spark.operators.relational import (
        salted_join,
    )

    left = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2}), (1, {"c": 3})],
        "k bigint, payload map<string,int>",
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
    got = sorted(
        (r["k"], r["v"])
        for r in salted_join(left, right, on="k", salt=4).collect()
    )
    assert got == [(1, "x"), (1, "x"), (2, "y")]
    # Maps NESTED in structs/arrays are rejected by xxhash64 too —
    # the exclusion must test containment, not the dtype prefix.
    nested = spark.createDataFrame(
        [(1, {"a": {"x": 1}})], "k bigint, s struct<a: map<string,int>>"
    )
    assert salted_join(nested, right, on="k", salt=4).count() == 1


def test_spearman_decimal_tier_past_2m_rows(spark, tmp_path):
    """The r5 int64 tier REFUSED past ~2M rows (|moment| <= n^3 vs
    int64).  The DECIMAL(38,0) tier must (a) run there, and (b) return
    the bitwise-identical rho with ANSI off and on — decimal sums
    cannot silently wrap, so any mode divergence means the exactness
    claim broke.  (The new guard bound, n > 4.6e12, is beyond any
    testable frame; exactness-at-depth is the testable invariant.)"""
    import math

    from pyspark.sql import functions as F

    from hana_bq_beam_connector_spark.queries.stats import (
        stat_spearman_qty_discount,
    )

    big = spark.range(2_000_001).select(
        (F.col("id") % 50).cast("double").alias("l_quantity"),
        ((F.col("id") % 11) / 100.0).alias("l_discount"),
    )
    big.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        [off] = stat_spearman_qty_discount(spark, str(tmp_path)).collect()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
    [on] = stat_spearman_qty_discount(spark, str(tmp_path)).collect()
    assert off["n"] == on["n"] == 2_000_001
    assert math.isfinite(off["spearman_rho"])
    assert off["spearman_rho"].hex() == on["spearman_rho"].hex()
    # residue columns of a common-period cycle are near-independent:
    # rho must sit essentially at 0, not at a wrapped artifact.
    assert abs(off["spearman_rho"]) < 0.01


def test_chunk_fingerprints_floors_negative_timestamps(spark):
    """Pre-epoch values must land in their own negative bucket, not
    fold into bucket 0 (Spark's % truncates toward zero; pmod
    floors)."""
    from hana_bq_beam_connector_spark.plans.reconcile import (
        chunk_fingerprints,
    )

    df = spark.createDataFrame(
        [(-100, 1), (100, 2)], "ts bigint, k bigint"
    )
    got = {
        r["bucket_lo"]: r["n_rows"]
        for r in chunk_fingerprints(df, "ts", "k", bucket=1000).collect()
    }
    assert got == {-1000: 1, 0: 1}


def test_apply_cdc_seq_tie_raises_unless_validate_off(spark):
    """Rows tying on (key, seq, op) have no deterministic winner — the
    default validation refuses them; validate=False lets a caller who
    knows the payloads are identical proceed."""
    import pytest

    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame([(9, "z")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, "a", "U", 10), (1, "b", "U", 10)],  # same key, seq, op
        ["k", "v", "op", "seq"],
    )
    with pytest.raises(ValueError, match="tying"):
        apply_cdc(base, changes, key="k", op_col="op", seq_col="seq")
    got = apply_cdc(
        base, changes, key="k", op_col="op", seq_col="seq", validate=False
    )
    assert got.count() == 2  # base row + one arbitrary winner

    # A (seq) tie across DIFFERENT ops still resolves by precedence.
    mixed = spark.createDataFrame(
        [(1, None, "D", 10), (1, "u", "U", 10)],
        ["k", "v", "op", "seq"],
    )
    rows = {
        (r["k"], r["v"])
        for r in apply_cdc(
            base, mixed, key="k", op_col="op", seq_col="seq"
        ).collect()
    }
    assert rows == {(9, "z"), (1, "u")}  # U beats D on the tie


def test_apply_cdc_rejects_ops_outside_domain(spark):
    """validate=True refuses op values outside ('D','U','I') in BOTH
    branches: the seq branch would silently DELETE a key whose
    last-wins row carries a garbage op (non-U/I winners route to the
    tombstone path), and the no-seq branch would silently ignore it."""
    import pytest

    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    bad = spark.createDataFrame(
        [(1, "x", "d", 10)], ["k", "v", "op", "seq"]  # lowercase marker
    )
    with pytest.raises(ValueError, match="outside"):
        apply_cdc(base, bad, key="k", op_col="op", seq_col="seq")
    with pytest.raises(ValueError, match="outside"):
        apply_cdc(base, bad.drop("seq"), key="k", op_col="op")
    # validate=False keeps the documented behavior: unknown-op rows
    # act as deletes in BOTH branches (the key lands in the touched
    # set and nothing re-adds it) — exactly the silent data loss the
    # default validation exists to catch.
    for kwargs in ({"seq_col": "seq"}, {}):
        got = {
            (r["k"], r["v"])
            for r in apply_cdc(
                base,
                bad if "seq_col" in kwargs else bad.drop("seq"),
                key="k",
                op_col="op",
                validate=False,
                **kwargs,
            ).collect()
        }
        assert got == {(2, "b")}
