"""Single-source-of-truth lock for the correctness comparator.

The local gate (tools/local_correctness.py), the pytest oracle gate
(tests/test_oracle.py) and the registry harness must all IMPORT
``compare_query``/``_canon`` from ``hana_bq_beam_connector_spark.
oracle`` — never carry a copy — so the local gate can never silently
drift from the driver's comparison again (round-3's red row came from
exactly such a drift).  tools/drive_contract.py is the one deliberate
exception: it replicates the DRIVER's own stringified comparison
(sorted str() tuples), which is the thing the oracle comparator must
stay at-least-as-strict as; the behavioral tests below lock that
direction for the value classes the registry emits.
"""

from __future__ import annotations

import math
import os
import re
from datetime import date, datetime
from decimal import Decimal

from hana_bq_beam_connector_spark.oracle import _canon

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _src(rel: str) -> str:
    with open(os.path.join(REPO, rel)) as f:
        return f.read()


def test_local_gate_imports_comparator():
    src = _src("tools/local_correctness.py")
    assert re.search(
        r"from hana_bq_beam_connector_spark\.oracle import[\s\S]*?"
        r"compare_query",
        src,
    ), "local gate must import compare_query from oracle.py"
    assert "def _canon" not in src and "def compare_query" not in src, (
        "local gate must not carry its own comparator copy"
    )


def test_pytest_gate_imports_comparator():
    src = _src("tests/test_oracle.py")
    assert (
        "from hana_bq_beam_connector_spark.oracle import" in src
        and "compare_query" in src
    )
    assert "def _canon" not in src and "def compare_query" not in src


def test_no_comparator_copies_anywhere():
    """No file in tools/ or tests/ redefines the canonicalizer —
    grep-level, so a pasted copy fails CI even if unused."""
    for root in ("tools", "tests"):
        for fn in os.listdir(os.path.join(REPO, root)):
            if not fn.endswith(".py") or fn == "test_comparator_source.py":
                continue
            src = _src(os.path.join(root, fn))
            assert "def _canon" not in src, f"{root}/{fn} copies _canon"
            assert (
                "def compare_query" not in src
            ), f"{root}/{fn} copies compare_query"


def test_canon_at_least_as_strict_as_driver_str():
    """If _canon calls two cells equal, the driver's str() comparison
    must too — for every value class a registry query can emit.
    (Decimal scale is the one class _canon normalizes away; the
    type-strict gate in oracle.type_mismatches catches that at the
    DECLARED-type level before values are compared, and
    tests/test_oracle.py binds it for every oracle-backed query.)"""
    classes = [
        [0.1 + 0.2, 0.3],                     # IEEE near-miss
        [0.0, -0.0],                          # signed zero
        [float("nan"), float("nan")],         # NaN == NaN by design
        [1, True],                            # int vs bool
        [1, 1.0],                             # int vs float
        ["1", 1],                             # str vs int
        [b"a", "a"],                          # bytes vs str
        [None, "None"],                       # null vs its string
        [date(2021, 1, 1), datetime(2021, 1, 1)],
        [Decimal("1.5"), 1.5],                # decimal vs float
        [[1, 2], [2, 1]],                     # array order
    ]
    for vals in classes:
        for a in vals:
            for b in vals:
                ca, cb = _canon(a), _canon(b)
                if ca == cb:
                    sa = "nan" if isinstance(a, float) and math.isnan(a) else str(a)
                    sb = "nan" if isinstance(b, float) and math.isnan(b) else str(b)
                    assert sa == sb, (
                        f"_canon equates {a!r} and {b!r} but the driver's "
                        "str() comparison distinguishes them — local gate "
                        "weaker than driver gate"
                    )
