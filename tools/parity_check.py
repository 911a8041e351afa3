"""Oracle-parity check for a list of registry queries (driver replica).

Usage: python tools/parity_check.py <sf_dir> <query> [<query> ...]
       python tools/parity_check.py <sf_dir> --all
Vanilla local[8] session, one fresh bounded DuckDB connection per
query, exits nonzero on the first mismatch.
"""

from __future__ import annotations

import importlib.util
import sys

from pyspark.sql import SparkSession


def main() -> int:
    sys.path.insert(0, "/root/repo")
    sf_dir = sys.argv[1]
    spec = importlib.util.spec_from_file_location("m", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    queries = m.queries()
    oracles = m.oracle_sql()
    names = sys.argv[2:]
    if names == ["--all"]:
        names = sorted(queries)

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    from tests.parity import compare

    bad = 0
    for name in names:
        if name not in queries:
            print(f"{name}: NOT A QUERY", flush=True)
            bad += 1
            continue
        try:
            ok, msg = compare(queries[name](spark, sf_dir), oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"exception: {e}"
        print(f"{name}: {'OK' if ok else 'FAIL ' + msg}", flush=True)
        bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
