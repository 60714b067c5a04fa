"""Query-runner CLI: run any registered engine query from the shell.

The reference is driven entirely by its CLI (HanaToBQ options); our
engine's extended surface gets the same ergonomics — list the
declared queries, run one against a testdata scale factor, inspect
its optimized plan, or write the result out.

Usage:
  python -m hana_bq_beam_connector_spark.runner --list
  python -m hana_bq_beam_connector_spark.runner \\
      --query agg_pricing_summary --sf-dir /root/testdata/sf0.01 --show 10
  python -m hana_bq_beam_connector_spark.runner \\
      --query join_topk_revenue --sf-dir /root/testdata/sf0.1 --explain
  python -m hana_bq_beam_connector_spark.runner \\
      --query dedup_minhash_lsh_pairs --sf-dir /root/testdata/sf0.1 \\
      --out /tmp/pairs.parquet
"""

from __future__ import annotations

import argparse

from hana_bq_beam_connector_spark.queries import registry
from hana_bq_beam_connector_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hana-bq-beam-connector-spark-runner",
        description="Run a registered engine query",
    )
    p.add_argument("--list", action="store_true", help="list queries")
    p.add_argument("--query", help="registered query name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--show", type=int, default=20, help="rows to print")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    p.add_argument("--out", help="write result parquet here instead")
    p.add_argument("--master", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    specs = registry()
    if args.list or not args.query:
        for name, spec in sorted(specs.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t[{kind}]\t{spec.doc.splitlines()[0]}")
        return 0
    if args.query not in specs:
        print(f"unknown query: {args.query}")
        return 2
    spark = get_spark(app_name=f"runner:{args.query}", master=args.master)
    df = specs[args.query].fn(spark, args.sf_dir)
    if args.explain:
        print(df._jdf.queryExecution().explainString("formatted"))
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote={args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
