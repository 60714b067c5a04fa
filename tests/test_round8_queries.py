"""Invariant tests for the round-8 batch.

Round 8 de-transcendentalizes the auto-plane count (verdict-r7 ask #2 /
ADVICE): ``max(4, ceil(log2(max(2, n/target))))`` is replaced by the
pure-integer ``max(4, bit_length(max(2, ceil_div(n, target)) - 1))`` in
BOTH engines.  These tests prove (a) the integer formulation equals the
real-math ceil-log2 at every n, including exact power-of-two
boundaries where a 1-ULP libm disagreement could have flipped the
plane count, and (b) the DuckDB shift-fold in the oracle CTE computes
the identical value for the same corpus sizes.
"""

from __future__ import annotations

import duckdb
import pytest


def _int_planes(n: int, target: int = 64) -> int:
    """The shipped formulation (operators/dedup.py auto branch)."""
    q = max(2, -(-n // target))
    return max(4, (q - 1).bit_length())


def _real_math_planes(n: int, target: int = 64) -> int:
    """Exact real-arithmetic reference: smallest k with
    2**k >= max(2, n/target), floored at 4 — computed with integer
    comparisons only (2**k * target >= n avoids any float)."""
    k = 1  # max(2, ..) means k starts where 2**k >= 2
    while (1 << k) * target < n:
        k += 1
    return max(4, k)


# Exact power-of-two boundaries (n = target * 2**k) are THE cases a
# transcendental formulation could flip; straddle each by +/-1.
_BOUNDARY_NS = sorted(
    {
        n
        for k in range(0, 24)
        for n in (64 * (1 << k) - 1, 64 * (1 << k), 64 * (1 << k) + 1)
    }
    | {1, 2, 63, 65, 100, 5000, 50_000, 60_000, 600_000, 6_000_000}
)


@pytest.mark.parametrize("n", _BOUNDARY_NS)
def test_auto_planes_integer_equals_real_math(n):
    assert _int_planes(n) == _real_math_planes(n), n


def test_auto_planes_monotone_and_floored():
    prev = 0
    for n in _BOUNDARY_NS:
        cur = _int_planes(n)
        assert cur >= 4
        assert cur >= prev  # more data never means fewer planes
        prev = cur


@pytest.mark.parametrize(
    "n", [1, 63, 64, 65, 127, 128, 129, 4095, 4096, 4097, 50_000, 65_536]
)
def test_duckdb_pa_cte_matches_python(n):
    """The oracle's pa CTE (shift-fold bit_length over integer
    ceil-div) must yield the same plane count Python chooses for the
    same corpus size — exercised standalone on a synthetic n-row
    table, including exact power-of-two boundary corpus sizes."""
    target = 64
    sql = f"""
    WITH q AS (
      SELECT GREATEST(CAST(2 AS BIGINT),
               (COUNT(*) + {target - 1}) // {target}) AS qv
      FROM range({n})
    )
    SELECT CAST(GREATEST(CAST(4 AS BIGINT),
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(0, 63), p ->
          CASE WHEN ((qv - 1) >> p) > 0
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        (acc, v) -> acc + v)) AS INTEGER) AS np
    FROM q
    """
    (np_sql,) = duckdb.sql(sql).fetchone()
    assert np_sql == _int_planes(n, target), n


@pytest.mark.parametrize("div", [2000, 5000])
def test_recall_k_divisor_integer_ceil_div(div):
    """K = max(10, ceil_div(n, div)) — integer in both engines; the
    Python and DuckDB expressions agree around the div multiples.
    Both shipped divisors are pinned: 2000 (dedup_lsh_recall_report's
    truth panel since round 8) and 5000 (dedup_simhash_pairs' panel),
    each exercised at n = div·k ± 1 boundaries."""
    ns = [1, 10**6]
    for k in (1, 3, 10, 25):
        ns += [div * k - 1, div * k, div * k + 1]
    for n in ns:
        py = max(10, -(-n // div))
        (sql,) = duckdb.sql(
            f"SELECT GREATEST(CAST(10 AS BIGINT), "
            f"(COUNT(*) + {div - 1}) // {div}) FROM range({n})"
        ).fetchone()
        assert sql == py, (div, n)


_HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def null_hour_sf_dir(tmp_path_factory):
    """A fake sf_dir whose events table has an ALL-NULL-value hour in
    the middle of a gap (user 1) and a leading all-NULL hour (user 2)
    — the regime ADVICE r7 flagged: the oracle's LAST_VALUE IGNORE
    NULLS carries the previous bucket's sum ACROSS a null-sum bucket,
    so the spine-free rewrite must forward-fill across real buckets,
    not emit the bucket's own NULL for its owned range."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _ts(hour: int, off_us: int = 0) -> "pd.Timestamp":
        return pd.Timestamp(hour * _HOUR_US + off_us, unit="us")

    rows = [
        # user 1: real sums at h0 and h5, an all-NULL hour at h2
        (1, _ts(0, 10), 1, "click", 1.0, "{}"),
        (2, _ts(0, 20), 1, "click", 2.0, "{}"),
        (3, _ts(2, 10), 1, "click", None, "{}"),
        (4, _ts(2, 20), 1, "click", None, "{}"),
        (5, _ts(5, 10), 1, "click", 7.5, "{}"),
        # user 2: leading NULL hour, then a real sum
        (6, _ts(1, 10), 2, "view", None, "{}"),
        (7, _ts(3, 10), 2, "view", 4.25, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    table = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        preserve_index=False,
    )
    d = str(tmp_path_factory.mktemp("null_hour_sf"))
    pq.write_table(table, f"{d}/events.parquet")
    return d


def test_gapfill_ffill_carries_across_null_sum_bucket(
    spark, null_hour_sf_dir
):
    from hana_bq_beam_connector_spark.queries import registry

    spec = registry()["ts_hourly_gapfill_ffill"]
    sdf = spec.fn(spark, null_hour_sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(r[c]) for c in scols) for r in sdf.collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_hour_sf_dir}/events.parquet')"
    )
    rel = con.execute(spec.oracle)
    ocols_raw = [dd[0] for dd in rel.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in idx]
    orows = sorted(
        tuple(str(r[i]) for i in idx) for r in rel.fetchall()
    )
    con.close()
    assert scols == ocols
    assert srows == orows
    # And the semantics themselves: user 1's null-sum hour 2 (and the
    # gap hours it owns) must carry hour 0's sum (3.0), not NULL;
    # user 2's leading-null hours stay NULL until the first real sum.
    by_key = {
        (r["user_id"], r["hour_us"]): r["filled_sum"]
        for r in sdf.collect()
    }
    assert by_key[(1, 2 * _HOUR_US)] == 3.0
    assert by_key[(1, 3 * _HOUR_US)] == 3.0
    assert by_key[(1, 5 * _HOUR_US)] == 7.5
    assert by_key[(2, 1 * _HOUR_US)] is None
    assert by_key[(2, 2 * _HOUR_US)] is None
    assert by_key[(2, 3 * _HOUR_US)] == 4.25


@pytest.fixture(scope="module")
def wmedian_sf_dir(tmp_path_factory):
    """A synthetic lineitem for the two-phase weighted median rewrite
    (round 8): lineitem has THREE return flags at any scale, so the
    naive per-group window sorted n/3 rows per task (164s at sf10).
    Flags here pin the regimes the bucket histogram must get right:

    * A — crossing at an EXACT half (2*cum == tot): the >= boundary
      row itself is the median;
    * B — crossing bucket is neither the first nor the last, with
      empty buckets in between (prices 1, 100, 200 at width 64);
    * C — the crossing row's price sits exactly ON a bucket boundary
      (128.0 = bucket 2's first representable price);
    * D — all rows share one price (intra-price tie order must not
      matter).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # flag, price, qty, orderkey, linenumber
        ("A", 10.0, 1.0, 1, 1),
        ("A", 20.0, 1.0, 1, 2),
        ("B", 1.0, 1.0, 2, 1),
        ("B", 100.0, 1.0, 2, 2),
        ("B", 200.0, 3.0, 2, 3),
        ("C", 64.0, 1.0, 3, 1),
        ("C", 128.0, 2.0, 3, 2),
        ("D", 50.0, 1.0, 4, 1),
        ("D", 50.0, 1.0, 4, 2),
        ("D", 50.0, 1.0, 4, 3),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_returnflag",
            "l_extendedprice",
            "l_quantity",
            "l_orderkey",
            "l_linenumber",
        ],
    )
    table = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_extendedprice", pa.float64()),
                ("l_quantity", pa.float64()),
                ("l_orderkey", pa.int64()),
                ("l_linenumber", pa.int32()),
            ]
        ),
        preserve_index=False,
    )
    d = str(tmp_path_factory.mktemp("wmedian_sf"))
    pq.write_table(table, f"{d}/lineitem.parquet")
    return d


def test_weighted_median_bucket_rewrite_matches_oracle(
    spark, wmedian_sf_dir
):
    from hana_bq_beam_connector_spark.queries import registry

    spec = registry()["agg_weighted_median"]
    sdf = spec.fn(spark, wmedian_sf_dir)
    got = {r["l_returnflag"]: r["weighted_median"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{wmedian_sf_dir}/lineitem.parquet')"
    )
    want = dict(con.execute(spec.oracle).fetchall())
    con.close()
    assert got == want
    # Pin the semantics independently of the oracle engine:
    assert got == {"A": 10.0, "B": 200.0, "C": 128.0, "D": 50.0}


# ---------------------------------------------------------------------------
# Few-huge-groups window elimination (round 8): every rewritten query
# must still value-match its UNCHANGED oracle — the rewrite is a plan
# change only.  (agg_weighted_median has its own edge-case fixture
# above; these replay the real sf0.001 tables.)

_REWRITTEN_FEW_GROUPS = [
    "agg_pareto_cut_8020",
    "agg_weighted_median",
    "corpus_global_shuffle",
    "curation_budget_mixture",
    "curation_pipeline",  # keep_first_by_key is now an argmin agg
    "curation_quality_quantile_filter",
    "dedup_containment_pairs",
    "dedup_keep_first_by_key",
    "dedup_ngram_jaccard_sample",
    "pack_sequences_by_budget",
    "sample_class_balanced",
    "ts_ohlc_6h",
    "ts_outlier_mad",
]

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.mark.parametrize("name", _REWRITTEN_FEW_GROUPS)
def test_few_groups_rewrite_matches_oracle(spark, sf_dir, name):
    from hana_bq_beam_connector_spark.queries import registry

    spec = registry()[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(r[c]) for c in scols) for r in sdf.collect()
    )
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.execute(spec.oracle)
    ocols_raw = [d[0] for d in rel.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in idx]
    orows = sorted(
        tuple(str(r[i]) for i in idx) for r in rel.fetchall()
    )
    con.close()
    assert scols == ocols, name
    assert srows == orows, name


@pytest.fixture(scope="module")
def skewed_embeddings_sf_dir(tmp_path_factory):
    """An embeddings table built to SLAM one LSH bucket: three tight
    clusters of 100 vectors each (base direction + tiny deterministic
    perturbations), so at the auto plane count (max(4, bit_length(
    ceil_div(300, 64) - 1)) = 4 -> 16 buckets) each cluster's ~100
    members collide and capacity refinement MUST fire (c > 64 ->
    R = bit_length(ceil_div(c, 64) - 1) >= 1)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    rows = []
    vid = 0
    for c in range(3):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        for j in range(100):
            v = base + 0.01 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    table = pa.Table.from_pandas(
        pdf,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float64())),
            ]
        ),
        preserve_index=False,
    )
    d = str(tmp_path_factory.mktemp("skewed_emb"))
    pq.write_table(table, f"{d}/embeddings.parquet")
    return d


def test_lsh_capacity_refinement_fires_and_matches_oracle(
    spark, skewed_embeddings_sf_dir
):
    import numpy as np
    import pyarrow.parquet as pq

    from hana_bq_beam_connector_spark.queries import registry

    # The fixture must actually create heavy buckets at the auto
    # plane count, else this test exercises nothing: replay the
    # banding in numpy with the shipped XOR plane family.
    emb = np.array(
        pq.read_table(
            f"{skewed_embeddings_sf_dir}/embeddings.parquet"
        )
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    n = len(emb)
    q = max(2, -(-n // 64))
    n_planes = max(4, (q - 1).bit_length())
    heavy = 0
    for tbl in range(8):
        bits = np.zeros(n, dtype=np.int64)
        for p in range(n_planes):
            g = tbl * n_planes + p
            plane = np.array(
                [(((g * 73856093) ^ (i * 19349663)) % 13) - 6 for i in range(64)],
                dtype=np.float64,
            )
            bits = bits * 2 + ((emb @ plane) > 0).astype(np.int64)
        _, cnts = np.unique(bits, return_counts=True)
        heavy += int((cnts > 64).sum())
    assert heavy > 0, "fixture failed to create any heavy bucket"

    spec = registry()["dedup_embedding_cosine"]
    sdf = spec.fn(spark, skewed_embeddings_sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(r[c]) for c in scols) for r in sdf.collect()
    )
    assert len(srows) > 0  # the tight clusters must surface as pairs
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{skewed_embeddings_sf_dir}/embeddings.parquet')"
    )
    rel = con.execute(spec.oracle)
    ocols_raw = [d[0] for d in rel.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    orows = sorted(
        tuple(str(r[i]) for i in idx) for r in rel.fetchall()
    )
    con.close()
    assert scols == [ocols_raw[i] for i in idx]
    assert srows == orows
