#!/usr/bin/env python
"""Round-close artifact regeneration — ONE command that refreshes
every reviewer-facing artifact before a round ends, so a driver
correctness-sample rotation can never hit a query the builder hasn't
already verified (round-5 verdict ask #8).

Runs, in order (each step exclusive — no concurrent Spark):
  1. tools/drive_contract.py        -> must print RESULT: ALL MATCH
  2. tools/local_correctness.py     -> CORRECTNESS_local.json (sf0.01)
  3. tools/local_correctness.py sf0.1 -> CORRECTNESS_local_sf0.1.json
  4. bench.py                       -> BENCH_local.json (one JSON line)
  5. tools/explain_audit.py         -> PLANS.md

The sf1 registry sweep (tools/registry_sweep.py, ~1 h) is NOT
included — run it when plans changed, or rely on `pytest -m sweep`.

Usage: python tools/round_close.py [--skip-bench] [--ansi]
--ansi appends a full-registry ANSI-mode correctness pass
(SPARK_GRAFT_ANSI=1 -> CORRECTNESS_local_ansi.json), locking the
every-session-mode determinism doctrine at the final registry.
Exit nonzero the moment any step fails.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(
    argv: list[str],
    out_path: str | None = None,
    env_extra: dict[str, str] | None = None,
) -> None:
    print(f"==> {' '.join(argv)}", flush=True)
    env = {**os.environ, **env_extra} if env_extra else None
    if out_path:
        # Write to a temp file and replace on success: truncating the
        # real artifact before the subprocess runs would destroy the
        # previous good copy on any failure (round-6 review finding).
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            subprocess.run(argv, check=True, cwd=REPO, stdout=fh, env=env)
        os.replace(tmp, out_path)
    else:
        subprocess.run(argv, check=True, cwd=REPO, env=env)


def main() -> int:
    py = sys.executable
    steps: list[tuple[list[str], str | None]] = [
        ([py, "tools/drive_contract.py"], None),
        ([py, "tools/local_correctness.py"], None),
        (
            [
                py,
                "tools/local_correctness.py",
                "/root/testdata/sf0.1",
                os.path.join(REPO, "CORRECTNESS_local_sf0.1.json"),
            ],
            None,
        ),
        ([py, "bench.py"], os.path.join(REPO, "BENCH_local.json")),
        ([py, "tools/explain_audit.py"], None),
    ]
    if "--skip-bench" in sys.argv:
        steps = [s for s in steps if "bench.py" not in s[0]]
    for argv, out_path in steps:
        if argv[-1] == "bench.py":
            # BENCH_local.json protocol: per-query median of 3
            # fresh-process runs (round 10; env overrides for
            # experiments).  bench prints the full record THEN a
            # compact trailer (round 11, for the driver's truncated
            # tail) — keep ONLY the full-record line here so the
            # committed artifact stays one json.load-able object.
            run(
                argv,
                out_path,
                env_extra={
                    "SPARK_GRAFT_BENCH_REPEATS": os.environ.get(
                        "SPARK_GRAFT_BENCH_REPEATS", "3"
                    )
                },
            )
            import json

            sys.path.insert(0, REPO)
            from bench import _last_full_record

            with open(out_path) as fh:
                full = _last_full_record(fh.read())
            with open(out_path, "w") as fh:
                json.dump(full, fh)
                fh.write("\n")
        else:
            run(argv, out_path)
    if "--ansi" in sys.argv:
        run(
            [
                py,
                "tools/local_correctness.py",
                "/root/testdata/sf0.01",
                os.path.join(REPO, "CORRECTNESS_local_ansi.json"),
            ],
            env_extra={"SPARK_GRAFT_ANSI": "1"},
        )
    print("round_close: all artifacts regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
