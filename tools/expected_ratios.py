"""Machine-checked complexity-class annotations for scale artifacts.

Round-9 verdict #3: queries whose per-decade wall growth is BY DESIGN
super-linear (documented log-linear LSH members, text-byte-bound
compositions) carried their justification in prose, so the sweep gate
could not distinguish "documented class" from "unexplained excess".
This module derives each exception's EXPECTED ratio from the actual
fixture data (row counts / text bytes read from parquet metadata) and
the operator's own sizing formulas — tools/merge_spot.py attaches the
numbers to the artifact rows, and tests/test_scale_artifacts.py fails
if any annotated row's measured ratio exceeds expected by more than
``TOLERANCE``.

The formulas mirror the operators, not the measurements:

* ``lsh_auto_planes`` replays embedding_near_dup_pairs' pure-integer
  plane sizing (operators/dedup.py: q = max(2, ceil(n/target)),
  planes = max(4, bit_length(q-1))).  The signature stage dominates
  the wall (n · n_tables · planes · dim fused projections), so the
  expected per-decade ratio is vol · planes_big / planes_base.
* text-byte-bound members scale with SUM(strlen(text)) — the fixture
  lengthens per-copy word suffixes, so bytes grow ~13.3× per decade
  while rows grow 10×.
* compositions take the max of their members (the slowest member
  bounds the composition's ratio; members run sequentially into a
  join, they don't multiply).
"""

from __future__ import annotations

import os

import duckdb

# A measured ratio may exceed its formula-derived expectation by at
# most this factor before the gate calls it unexplained excess.
TOLERANCE = 1.5


def lsh_auto_planes(n: int, target_bucket_size: int = 64) -> int:
    """Replay of embedding_near_dup_pairs' auto plane sizing."""
    q = max(2, -(-n // target_bucket_size))
    return max(4, (q - 1).bit_length())


def _counts(sf_dir: str) -> dict[str, float]:
    con = duckdb.connect()
    emb = con.execute(
        "SELECT COUNT(*) FROM read_parquet(?)",
        [os.path.join(sf_dir, "embeddings.parquet")],
    ).fetchone()[0]
    docs, text_bytes = con.execute(
        "SELECT COUNT(*), SUM(strlen(text)) FROM read_parquet(?)",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchone()
    li = con.execute(
        "SELECT COUNT(*) FROM read_parquet(?)",
        [os.path.join(sf_dir, "lineitem.parquet")],
    ).fetchone()[0]
    cust = con.execute(
        "SELECT COUNT(*) FROM read_parquet(?)",
        [os.path.join(sf_dir, "customer.parquet")],
    ).fetchone()[0]
    con.close()
    return {
        "emb": emb,
        "docs": docs,
        "text_bytes": text_bytes,
        "li": li,
        "cust": cust,
    }


def cosupply_wedges(sf_dir: str) -> int:
    """The EXACT wedge count of the co-supply graph — the join volume
    of graph_clustering_coefficient's triangle enumeration (canon uv
    ⋈ canon vw ON uv.dst = vw.src is Σ_v indeg(v)·outdeg(v) over the
    canonical src<dst edge set).  Computed from the fixture itself:
    the wedge volume is the operator's true cost driver, and no
    row-count proxy predicts it (degrees shift with the qty-filter
    selectivity across SFs)."""
    con = duckdb.connect()
    (wedges,) = con.execute(
        """
        WITH sp AS (
          SELECT DISTINCT l_suppkey, l_partkey
          FROM read_parquet(?) WHERE l_quantity >= 45
        ),
        canon AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM sp a JOIN sp b
            ON a.l_partkey = b.l_partkey
           AND a.l_suppkey < b.l_suppkey
        ),
        io AS (
          SELECT node, SUM(ind) AS ind, SUM(outd) AS outd FROM (
            SELECT dst AS node, COUNT(*) AS ind, 0 AS outd
            FROM canon GROUP BY 1
            UNION ALL
            SELECT src, 0, COUNT(*) FROM canon GROUP BY 1
          ) GROUP BY 1
        )
        SELECT CAST(COALESCE(SUM(ind * outd), 0) AS BIGINT) FROM io
        """,
        [os.path.join(sf_dir, "lineitem.parquet")],
    ).fetchone()
    con.close()
    return int(wedges)


def expected_ratios(
    base_dir: str, big_dir: str
) -> dict[str, dict[str, object]]:
    """Per-query expected wall ratios between two SF directories.

    Only queries with a DOCUMENTED super-linear class are annotated —
    an absent entry means "expected linear in volume", which the plain
    ratio limit already gates.
    """
    base, big = _counts(base_dir), _counts(big_dir)
    vol_emb = big["emb"] / base["emb"]
    p_base = lsh_auto_planes(base["emb"])
    p_big = lsh_auto_planes(big["emb"])
    lsh = vol_emb * p_big / p_base
    text = big["text_bytes"] / base["text_bytes"]
    lsh_f = (
        f"vol·planes_big/planes_base = {vol_emb:.3g}·{p_big}/{p_base}"
        " (embedding-LSH signature stage: n·tables·planes·dim work; "
        "auto planes grow with log(n))"
    )
    text_f = (
        "text_bytes_big/text_bytes_base (text-byte-bound: the "
        "fixture's per-copy word suffix lengthens tokens, so bytes "
        "outgrow rows)"
    )
    vol_docs = big["docs"] / base["docs"]
    jpeg_f = (
        f"docs volume = {vol_docs:.3g} (linear per-document decode: "
        "per-doc cost is id-independent — dims are modulo-bounded "
        "functions of the id — and the plan is a zero-shuffle narrow "
        "map; the residual over volume is sustained-all-core Python "
        "throughput, MEASURED by the round-10 fixed-core control: "
        "taskset 0-7/local[8] collapses the ratio to ~5.5)"
    )
    jpeg = {
        "expected_ratio": round(vol_docs, 2),
        "expected_formula": jpeg_f,
    }
    vol_cust = big["cust"] / base["cust"]
    return {
        "dedup_embedding_cosine": {
            "expected_ratio": round(lsh, 2),
            "expected_formula": lsh_f,
        },
        "geo_grid_neighbor_pairs_mixed": {
            "expected_ratio": round(vol_cust, 2),
            "expected_formula": (
                f"customer volume = {vol_cust:.3g} (mixed-density LoD "
                "under load: the sparse majority holds a CONSTANT "
                "~200 points/cell — cells grow with the data, so "
                "exact-pair work and output are linear — while the 4 "
                "fixed dense cells aggregate linearly to centroids; "
                "the row exists to measure the live centroid-collapse "
                "machinery, which the uniform fixture only exercises "
                "in degenerate all-sparse/all-dense regimes)"
            ),
        },
        "dedup_semantic_not_lexical": {
            "expected_ratio": round(max(lsh, text), 2),
            "expected_formula": (
                "max(members) of the composition — embedding-LSH "
                f"member [{lsh_f}] = {lsh:.2f}; lexical member "
                f"[{text_f}] = {text:.2f}"
            ),
        },
        "mm_jpeg_decode_stats": jpeg,
        "mm_jpeg_raster_moments": dict(jpeg),
    }


def check_rows(
    rows: dict[str, dict], expected: dict[str, dict]
) -> list[str]:
    """Annotate ``rows`` in place; return names over tolerance."""
    violations: list[str] = []
    for name, ann in expected.items():
        row = rows.get(name)
        if row is None:
            continue
        row.update(ann)
        measured = row.get("ratio")
        if measured is None:
            violations.append(f"{name}: no measured ratio")
        elif measured > ann["expected_ratio"] * TOLERANCE:
            violations.append(
                f"{name}: measured {measured} > expected "
                f"{ann['expected_ratio']} × {TOLERANCE}"
            )
    return violations
