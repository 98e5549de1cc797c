"""CLI entry point: ``list`` | ``query <name> [--sf-dir DIR] [-n ROWS]``
(run any catalog query, show first rows) | ``pipeline --root DIR
[--landing DIR]`` (run the full zoned ETL DAG once)."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nursing_home_data_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    qp = sub.add_parser("query", help="run a catalog query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("-n", "--rows", type=int, default=20)

    pp = sub.add_parser("pipeline", help="run the zoned ETL pipeline once")
    pp.add_argument("--root", required=True, help="zone root directory")
    pp.add_argument("--landing", default=None, help="landing dir of CSV drops")

    args = p.parse_args(argv)

    from .plans import catalog

    if args.cmd == "list":
        for name, e in sorted(catalog.entries().items()):
            oracle = "oracle" if e.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {e.doc.splitlines()[0][:80]}")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    if args.cmd == "query":
        entries = catalog.entries()
        if args.name not in entries:
            print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
            return 2
        df = entries[args.name].spark(spark, args.sf_dir)
        df.show(args.rows, truncate=False)
        return 0

    if args.cmd == "pipeline":
        from . import pipeline
        from .zones import ZoneLayout

        res = pipeline.run(spark, ZoneLayout(args.root), landing_dir=args.landing)
        print(res)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
