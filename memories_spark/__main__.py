"""Query runner / plan inspector CLI.

    python -m memories_spark list [tag]
    python -m memories_spark run <query> [--sf DIR] [--limit N]
    python -m memories_spark explain <query> [--sf DIR]
    python -m memories_spark oracle <query>

``run`` executes a registry query and prints rows; ``explain`` prints
the formatted physical plan (the artifact the scale design is judged
on); ``oracle`` prints the DuckDB twin SQL.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="memories_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("tag", nargs="?", help="filter by tag substring")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf", default="/root/testdata/sf0.001")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_oracle = sub.add_parser("oracle")
    p_oracle.add_argument("query")

    args = ap.parse_args(argv)

    from memories_spark.plans import QUERIES

    if args.cmd == "list":
        for name, spec in sorted(QUERIES.items()):
            if args.tag and args.tag not in ",".join(spec.tags):
                continue
            star = "*" if spec.bench else " "
            print(f"{star} {name:32s} [{', '.join(spec.tags)}]")
        return 0

    spec = QUERIES.get(args.query)
    if spec is None:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        print(spec.oracle or "-- no oracle (rows-only check)")
        return 0

    from memories_spark.session import get_spark

    spark = get_spark(app_name=f"memories-spark-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=80)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
