"""Driver-contract plumbing: bench's two-line emit protocol and the
__spark_entry__ verified-name rotation filter (round 11).

No Spark session — these gate the pure-Python adapters between the
engine and the driver harness.
"""

from __future__ import annotations

import hashlib
import json


def test_bench_emit_full_line_then_reconstructible_trailer(capsys):
    import bench

    record = {
        "metric": "headline_queries_wall_clock",
        "value": 3.5,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"b_query": 1.25, "a_query": 2.25, "c_fail": "FAIL:X"},
        "protocol": {"repeats": 1},
    }
    bench._emit(record)
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    assert len(lines) == 2
    full, trailer = json.loads(lines[0]), json.loads(lines[1])
    # Line 1 is the untouched contract record.
    assert full == record
    # Line 2 (the LAST line — the driver keeps only the stdout tail)
    # carries EVERY timing: values ordered by sorted name, keyed by a
    # blake2b digest of the name list.
    names = sorted(record["queries"])
    assert trailer["qv"] == [record["queries"][n] for n in names]
    assert trailer["n_queries"] == len(names)
    assert trailer["qk"] == hashlib.blake2b(
        "\n".join(names).encode(), digest_size=6
    ).hexdigest()
    for k in ("metric", "value", "unit", "sf"):
        assert trailer[k] == record[k]
    # The trailer must actually fit in the driver's ~2000-char tail
    # for the real registry: bound the per-query overhead here.
    assert len(lines[1]) < 300 + 12 * len(names)


def test_driver_verified_names_counts_only_green_rows(
    tmp_path, monkeypatch
):
    """A name whose driver row ERRORED (round 10: text_inverted_index,
    hash_match null + err) must NOT count as verified — it has to
    rotate back into the driver's head-50 after the fix.  Rows-only
    checks (no oracle → no hash) count when rows_match and no err."""
    import glob as glob_mod

    import __spark_entry__ as entry

    rows = {
        "green_hash": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        },
        "errored": {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "err": "TypeError: unhashable type: 'list'",
        },
        "hash_mismatch": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": False,
            "err": None,
        },
        "rows_only_green": {
            "rows_match": True,
            "schema_match": None,
            "hash_match": None,
            "err": None,
        },
    }
    art = tmp_path / "CORRECTNESS_r99.json"
    art.write_text(json.dumps(rows))
    monkeypatch.setattr(glob_mod, "glob", lambda pat: [str(art)])
    seen = entry._driver_verified_names()
    assert seen == {"green_hash", "rows_only_green"}


def test_driver_verified_names_latest_round_wins(tmp_path, monkeypatch):
    """A name green in an OLD round that regresses in a NEWER round
    must lose verified status (re-enter the head-50), and a red row
    fixed in a newer round must regain it — per-name status follows
    the highest round number, not the union across rounds."""
    import glob as glob_mod

    import __spark_entry__ as entry

    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    red = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "err": "boom",
    }
    r5 = tmp_path / "CORRECTNESS_r5.json"
    r12 = tmp_path / "CORRECTNESS_r12.json"
    r5.write_text(json.dumps({"regressed": green, "fixed_later": red}))
    r12.write_text(json.dumps({"regressed": red, "fixed_later": green}))
    # Deliver r12 first to prove ordering comes from the round number
    # in the filename, not glob order.
    monkeypatch.setattr(
        glob_mod, "glob", lambda pat: [str(r12), str(r5)]
    )
    seen = entry._driver_verified_names()
    assert seen == {"fixed_later"}
