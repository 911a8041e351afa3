"""Physical table-layout tests: bucketing and partitioning.

The 100 TB layout story (README 'Scale design') claims two things a
plan can prove:

- two tables bucketed on the same key join WITHOUT a shuffle — the
  co-located join that turns the nightly fact-to-fact join from the
  cluster's biggest shuffle into a map-side zip;
- a table partitioned by a filter column is scanned with partition
  pruning — the filter never touches the other partitions' files.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from memories_spark.sources.tables import load_tables


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layout LOCATION '{tmp_path}/wh'")
    docs = load_tables(spark, sf_dir)["documents"]
    emb = load_tables(spark, sf_dir)["embeddings"]
    (
        docs.select("doc_id", "source", "n_chars")
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("layout.docs_bucketed")
    )
    (
        emb.select(F.col("vec_id").alias("doc_id"), "label")
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("layout.emb_bucketed")
    )
    a = spark.table("layout.docs_bucketed")
    b = spark.table("layout.emb_bucketed")
    joined = a.join(b, "doc_id").groupBy("label").agg(F.count("*").alias("n"))
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join inputs
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # bucketed-on-key scans feed the join directly: no Exchange between
    # the join and either table scan
    assert "Exchange" not in join_part, join_part


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir)["documents"]
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    plan = _executed(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1), plan
    # only the en partition's files are read
    n_en = docs.filter(F.col("lang") == "en").count()
    assert df.count() == n_en
