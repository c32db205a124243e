"""CLI entry point: run a registered probe or ad-hoc SQL.

Usage::

    python -m flytemosaic_spark list
    python -m flytemosaic_spark run x1_exact_dedup [--sf DIR] [-n 20]
    python -m flytemosaic_spark sql "SELECT count(*) FROM lineitem" [--sf DIR]

``sql`` registers every testdata table as a temp view first, so the
reference's users can point ANSI SQL at the same tables the probes
read (the SQL frontend the TPC-H suite goes through).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flytemosaic_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered probes")
    run = sub.add_parser("run", help="run a probe by name")
    run.add_argument("probe")
    run.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    run.add_argument("-n", type=int, default=20, help="rows to show")
    sq = sub.add_parser("sql", help="run SQL over the testdata views")
    sq.add_argument("query")
    sq.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    sq.add_argument("-n", type=int, default=20)
    args = ap.parse_args(argv)

    from flytemosaic_spark.probes import all_probes

    probes = all_probes()
    if args.cmd == "list":
        for name, p in sorted(probes.items()):
            kind = "oracle" if p.sql else "rows-only"
            print(f"{name:32s} [{kind}] {p.note[:70]}")
        return 0

    from flytemosaic_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "run":
        if args.probe not in probes:
            print(f"unknown probe: {args.probe}", file=sys.stderr)
            return 2
        probes[args.probe].fn(spark, args.sf).show(args.n, truncate=False)
    else:
        from flytemosaic_spark.sources.tables import load_tables

        load_tables(spark, args.sf, register_views=True)
        spark.sql(args.query).show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
