#!/usr/bin/env python3
"""Scale a testdata sf directory by an integer factor for bench runs.

The driver ships sf0.001/0.01/0.1; the round-7 plan wants an sf1 bench
datapoint. This replicates an existing sf dir K times with disjoint
key spaces — replica i offsets every key column by ``i * count`` — so
join fan-out, group cardinalities, and per-key densities scale the way
a real 10x data volume would (each replica is an independent shard of
the same distribution; dimension tables region/nation stay shared).
The scaled data is for THROUGHPUT measurement only: oracle parity
always runs against the driver's own sf dirs.

Usage:
    python scripts/make_sf.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/testdata_sf1] [--factor 10]

Runs in Spark so the copy is parallel and the output lands as
multi-file parquet (the same layout bench reads at other sfs).
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, functions as F

#: key columns to offset per replica, per table (referential pairs use
#: the SAME base count so foreign keys stay inside their replica)
_OFFSETS: dict[str, list[tuple[str, str]]] = {
    # table: [(column, count-source-table)]
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events_users")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
_SHARED = ("region", "nation")


def scale_dir(spark, src: str, dst: str, factor: int) -> None:
    from memories_spark.sources.tables import TABLE_NAMES

    os.makedirs(dst, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    counts: dict[str, int] = {}

    def count_of(key: str) -> int:
        if key not in counts:
            if key == "events_users":
                df = spark.read.parquet(f"{src}/events.parquet")
                counts[key] = int(
                    df.agg(F.max("user_id")).first()[0] or 0
                ) + 1
            else:
                counts[key] = spark.read.parquet(
                    f"{src}/{key}.parquet"
                ).count()
        return counts[key]

    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = f"{dst}/{name}.parquet"
        if name in _SHARED or factor == 1:
            df.write.mode("overwrite").parquet(out)
            continue
        replicas: list[DataFrame] = []
        for i in range(factor):
            r = df
            for col, base in _OFFSETS.get(name, ()):  # offset key columns
                r = r.withColumn(
                    col, (F.col(col) + F.lit(i * count_of(base))).cast("long")
                )
            replicas.append(r)
        merged = replicas[0]
        for r in replicas[1:]:
            merged = merged.unionByName(r)
        merged.write.mode("overwrite").parquet(out)
        print(f"{name}: {df.count()} x {factor}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/testdata_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from memories_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir(spark, args.src, args.dst, args.factor)


if __name__ == "__main__":
    main()
