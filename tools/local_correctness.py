"""Produce CORRECTNESS_local.json: the driver-format correctness
record over the FULL registry (the driver's own CORRECTNESS_r{N}.json
samples a fixed 50 of the declared queries; this artifact covers every
declared query so a reviewer doesn't have to re-run Spark to see the
other 80).

Usage: python tools/local_correctness.py [sf_dir] [out_path]
Defaults: /root/testdata/sf0.01 (the driver's correctness SF) and
<repo>/CORRECTNESS_local.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from hana_bq_beam_connector_spark.oracle import (  # noqa: E402
    compare_query,
    duckdb_connection,
)
from hana_bq_beam_connector_spark.queries import registry  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "CORRECTNESS_local.json")
    )
    # Plain session on purpose — mirrors the driver harness, which does
    # not apply our session.py confs.  SPARK_GRAFT_ANSI=1 runs the same
    # full-registry comparison under spark.sql.ansi.enabled=true — the
    # determinism doctrine claims every-session-mode behavior (guards
    # raise regardless of ANSI; no query result may shift), and this
    # flag turns that claim into an artifact
    # (CORRECTNESS_local_ansi.json) instead of per-guard unit tests.
    builder = SparkSession.builder.master("local[8]")
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        builder = builder.config("spark.sql.ansi.enabled", "true")
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_ANSI") == "1":
        # getOrCreate may have attached to an existing session; make
        # the mode unconditional either way.
        spark.conf.set("spark.sql.ansi.enabled", "true")
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    con = duckdb_connection(sf_dir)

    results: dict[str, dict] = {}
    failures = []
    from hana_bq_beam_connector_spark.operators._common import (
        release_session_pins,
    )

    for name, spec in sorted(registry().items()):
        release_session_pins()  # drop frames pinned by the last query
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                results[name] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": n,
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
            else:
                r = compare_query(
                    spark, con, name, spec.fn, spec.oracle, sf_dir
                )
                results[name] = {
                    "rows_match": r.spark_rows == r.oracle_rows,
                    "schema_match": not any(
                        m.startswith("columns:") for m in r.mismatches
                    ),
                    "hash_match": r.ok,
                    "spark_rows": r.spark_rows,
                    "oracle_rows": r.oracle_rows,
                    "err": None if r.ok else "; ".join(r.mismatches[:3]),
                }
                if not r.ok:
                    failures.append(name)
        except Exception as exc:  # record, keep going
            results[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            failures.append(name)

    n_pass = sum(1 for v in results.values() if v["hash_match"])
    n_rows_only = sum(
        1 for v in results.values() if v["err"] == "no_oracle"
    )
    summary = {
        "_summary": {
            "sf_dir": sf_dir,
            "queries": len(results),
            "hash_match": n_pass,
            "rows_only": n_rows_only,
            "failures": failures,
        }
    }
    with open(out, "w") as f:
        json.dump({**summary, **results}, f, indent=1)
    print(
        f"{out}: {n_pass}/{len(results)} hash-match, "
        f"{n_rows_only} rows-only, failures={failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
