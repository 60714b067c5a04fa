"""Machine checks over the committed scale artifacts (round-10,
verdict-r9 ask #3): complexity-class exceptions must carry a
formula-derived expected_ratio, and no annotated row may exceed its
expectation by more than the declared tolerance — "by design" is a
checked number, not prose.  Pure-Python: no Spark session.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from expected_ratios import (  # noqa: E402
    TOLERANCE,
    check_rows,
    expected_ratios,
    lsh_auto_planes,
)

SPOT = os.path.join(REPO, "REGISTRY_sf10_spot.json")


def test_lsh_auto_planes_replays_operator_sizing():
    """The formula module must agree with embedding_near_dup_pairs'
    pure-integer sizing (operators/dedup.py): q = max(2, ceil(n/64)),
    planes = max(4, bit_length(q - 1))."""
    assert lsh_auto_planes(1) == 4  # floor
    assert lsh_auto_planes(20_000) == 9  # sf1 embeddings
    assert lsh_auto_planes(200_000) == 12  # sf10 embeddings
    assert lsh_auto_planes(600_000) == 14  # sf30 embeddings
    for n in (1, 63, 64, 65, 4096, 10**7):
        q = max(2, -(-n // 64))
        assert lsh_auto_planes(n) == max(4, (q - 1).bit_length())


def test_check_rows_annotates_and_flags():
    rows = {
        "a": {"ratio": 13.0},
        "b": {"ratio": 25.0},
        "c": {"ratio": None, "big_s": "FAIL:X"},
    }
    expected = {
        "a": {"expected_ratio": 13.3, "expected_formula": "f"},
        "b": {"expected_ratio": 13.3, "expected_formula": "f"},
        "c": {"expected_ratio": 13.3, "expected_formula": "f"},
        "absent": {"expected_ratio": 1.0, "expected_formula": "f"},
    }
    violations = check_rows(rows, expected)
    assert rows["a"]["expected_ratio"] == 13.3  # annotated in place
    assert any(v.startswith("b:") for v in violations)
    assert any(v.startswith("c:") for v in violations)
    assert not any(v.startswith("a") for v in violations)
    assert len(violations) == 2  # absent rows are not violations


def test_sf10_spot_rows_within_expected():
    """Every annotated row in the committed sf10 spot artifact is
    within TOLERANCE of its formula-derived expectation, and the
    artifact's over_expected list is empty."""
    if not os.path.exists(SPOT):
        pytest.skip("no sf10 spot artifact in this checkout")
    d = json.load(open(SPOT))
    assert d.get("over_expected") == [], d.get("over_expected")
    annotated = {
        k: v for k, v in d["queries"].items() if "expected_ratio" in v
    }
    assert annotated, "expected at least one annotated exception row"
    for name, row in annotated.items():
        assert row["ratio"] is not None, name
        assert row["ratio"] <= row["expected_ratio"] * TOLERANCE, (
            name,
            row["ratio"],
            row["expected_ratio"],
        )
        assert row["expected_formula"], name


def test_sf30_probe_rows_within_expected():
    """The third-decade probe artifact: every row annotated, every
    measured ratio within tolerance of its class formula."""
    probe = os.path.join(REPO, "REGISTRY_sf30_probe.json")
    if not os.path.exists(probe):
        pytest.skip("no sf30 probe artifact in this checkout")
    d = json.load(open(probe))
    assert d.get("over_expected") == [], d.get("over_expected")
    assert len(d["queries"]) >= 5
    for name, row in d["queries"].items():
        assert row.get("expected_ratio"), name
        assert row["ratio"] is not None, name
        assert row["ratio"] <= row["expected_ratio"] * TOLERANCE, (
            name,
            row["ratio"],
            row["expected_ratio"],
        )


def test_expected_ratio_formulas_from_fixture_data():
    """When the gitignored scale fixtures exist, the derived numbers
    match the documented classes: embedding-LSH ≈ 10·12/9 = 13.33 per
    sf1→sf10 decade, text-byte ≈ 13.3."""
    base = os.path.join(REPO, ".scale", "sf1")
    big = os.path.join(REPO, ".scale", "sf10")
    if not (os.path.isdir(base) and os.path.isdir(big)):
        pytest.skip("scale fixtures not synthesized in this checkout")
    exp = expected_ratios(base, big)
    lsh = exp["dedup_embedding_cosine"]["expected_ratio"]
    assert 12.0 <= lsh <= 14.5
    comp = exp["dedup_semantic_not_lexical"]["expected_ratio"]
    assert comp >= lsh  # max of members can only be larger
