"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Registers the testdata parquet files as DuckDB views, runs the oracle
SQL, runs the Spark plan, canonicalizes both (columns sorted by name,
rows sorted by all columns, floats compared exactly — the queries are
designed to be bit-identical) and diffs.

DuckDB execution is SERIALIZED under a lock with a bounded,
disk-spilling memory budget, one short-lived connection per oracle:
running DuckDB concurrently from 12 threads intermittently crashed
the interpreter outright (faulthandler pinned a segfault inside
``duckdb_conn``), and an unbounded memory_limit let big sketch
oracles malloc-fail the whole process under suite-wide memory
pressure. The Spark side (where the wall time is) still executes
fully in parallel.
"""

from __future__ import annotations

import tempfile
import threading

import duckdb
import pandas as pd

from memories_spark.sources.tables import TABLE_NAMES

_ORACLE_LOCK = threading.Lock()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # bounded memory + disk spill: an oracle must never malloc-fail
    # the shared test process
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads TO 8")
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duckdb_spill'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def run_oracle(oracle_sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL serialized, on a fresh bounded connection that
    releases its memory as soon as the result is fetched."""
    with _ORACLE_LOCK:
        con = duckdb_conn(sf_dir)
        try:
            return con.execute(oracle_sql).fetchdf()
        finally:
            con.close()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith(("int", "uint", "Int")):
            out[c] = out[c].astype("float64")  # unify int widths & allow NaN for nulls
        elif str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    # Spark first (runs concurrently across threads), oracle second
    # (serialized on the shared connection).
    spark_pd = spark_df.toPandas()
    oracle_pd = run_oracle(oracle_sql, sf_dir)

    if len(spark_pd) != len(oracle_pd):
        return False, f"row count: spark={len(spark_pd)} oracle={len(oracle_pd)}"
    s_cols, o_cols = sorted(spark_pd.columns), sorted(oracle_pd.columns)
    if s_cols != o_cols:
        return False, f"columns: spark={s_cols} oracle={o_cols}"

    s, o = canonical(spark_pd), canonical(oracle_pd)
    if s.equals(o):
        return True, "ok"
    diff_rows = (s != o) & ~(s.isna() & o.isna())
    bad = diff_rows.any(axis=1)
    detail = pd.concat(
        [s[bad].head(5).add_prefix("spark_"), o[bad].head(5).add_prefix("oracle_")],
        axis=1,
    )
    return False, f"value mismatch on {int(bad.sum())} rows:\n{detail}"
