"""CLI for the engine.

    python -m spark_iceberg_jobs_spark list
    python -m spark_iceberg_jobs_spark run <query> [--sf-dir DIR] [--limit N]
    python -m spark_iceberg_jobs_spark explain <query> [--sf-dir DIR]
    python -m spark_iceberg_jobs_spark oracle <query>
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spark_iceberg_jobs_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd, h in (("run", "execute a query and show rows"), ("explain", "show the physical plan")):
        sp = sub.add_parser(cmd, help=h)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if cmd == "run":
            sp.add_argument("--limit", type=int, default=20)
    so = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    so.add_argument("query")
    args = p.parse_args(argv)

    from .queries import registry

    reg = registry()
    if args.cmd == "list":
        for name, spec in sorted(reg.items()):
            marks = ("headline" if spec.headline else "") + ("" if spec.oracle else " rows-only")
            print(f"{name:40s} {marks.strip()}")
        return 0
    if args.query not in reg:
        print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        sql = reg[args.query].oracle
        print(sql.strip() if sql else "(rows-only query: no oracle)")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
