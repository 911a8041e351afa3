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


def test_memories_table_partitioned_by_folder(spark, tmp_path):
    """The engine's memories table is laid out partitioned by the
    top-level source folder, and a mutation in one folder must not
    rewrite any other folder's files — the property that makes M1-M8
    O(touched partition), not O(table), at 100 TB."""
    import os

    from memories_spark.engine import MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    now = "2024-01-01 00:00:00"
    ids_a = eng.add([{"text": f"alpha {i}", "source": f"proja/doc{i}"} for i in range(3)], now)
    eng.add([{"text": f"beta {i}", "source": f"projb/doc{i}"} for i in range(3)], now)
    root = str(tmp_path / "store" / "memories")
    parts = sorted(e for e in os.listdir(root) if e.startswith("folder="))
    assert parts == ["folder=proja", "folder=projb"], parts

    def files_of(part):
        d = os.path.join(root, part)
        return {
            (f, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_b = files_of("folder=projb")
    eng.update(ids_a[0], "2024-01-02 00:00:00", text="alpha updated")
    assert files_of("folder=projb") == before_b  # projb untouched
    # deleting every proja row removes its partition directory
    eng.delete(ids_a)
    parts = sorted(e for e in os.listdir(root) if e.startswith("folder="))
    assert parts == ["folder=projb"], parts
    assert files_of("folder=projb") == before_b
    assert eng.count() == 3


def test_memories_prefix_scan_prunes_partitions(spark, tmp_path):
    """A source-prefix read must show PartitionFilters on folder —
    the prefix-scoped search reads ONE partition directory."""
    from memories_spark.engine import MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store2"))
    now = "2024-01-01 00:00:00"
    eng.add(
        [{"text": f"t{i}", "source": f"proj{i % 4}/doc{i}"} for i in range(12)], now
    )
    df = eng.memories("proj1/").select("id")
    plan = _executed(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "folder" in m.group(1), plan
    assert df.count() == 3


def test_compact_merges_small_files_per_partition(spark, tmp_path):
    """engine.compact(): repeated appends fragment a partition into
    one file per batch; compaction rewrites ONLY over-fragmented
    partitions down to a single file, leaves others' bytes alone,
    and preserves every row (the OPTIMIZE bin-packing equivalent
    for the plain-parquet layout)."""
    import os

    from memories_spark.engine import MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    now = "2024-01-01 00:00:00"
    for i in range(3):  # three append batches -> >=3 files in proja
        eng.add([{"text": f"alpha {i}", "source": f"proja/doc{i}"}], now)
    eng.add([{"text": "beta", "source": "projb/doc0"}], now)
    root = str(tmp_path / "store" / "memories")

    def files_of(part):
        d = os.path.join(root, part)
        return {
            (f, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_b = files_of("folder=projb")
    assert len(files_of("folder=proja")) >= 3
    dry = eng.compact(max_files=1, dry_run=True)
    assert dry["partitions"] == 1 and len(files_of("folder=proja")) >= 3
    out = eng.compact(max_files=1)
    assert out["partitions"] == 1
    assert len(files_of("folder=proja")) == 1
    assert out["files_after"] == 1
    assert files_of("folder=projb") == before_b  # untouched bytes
    assert eng.count() == 4
    texts = {r.text for r in eng.table("memories").collect()}
    assert texts == {"alpha 0", "alpha 1", "alpha 2", "beta"}


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


def test_links_are_append_only(spark, tmp_path):
    """Link mutations never rewrite existing log files: an add_link /
    remove_link leaves every prior file's bytes untouched (name,
    size, mtime) and only appends — the O(table)-per-edge-write
    defect round 2 flagged, cured by the tombstone log."""
    import os

    from memories_spark.engine import MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [{"text": f"t{i}", "source": "s"} for i in range(4)],
        "2024-06-01 12:00:00",
    )
    assert eng.add_link(0, 1, "related_to", "2024-06-01 12:00:00")
    log_dir = str(tmp_path / "store" / "links_log")

    def snap():
        return {
            f: (os.path.getsize(os.path.join(log_dir, f)),
                os.path.getmtime(os.path.join(log_dir, f)))
            for f in os.listdir(log_dir)
            if f.endswith(".parquet")
        }

    before = snap()
    assert eng.add_link(1, 2, "caused_by", "2024-06-01 13:00:00")
    after = snap()
    for f, meta in before.items():
        assert after[f] == meta, f  # untouched bytes
    assert len(after) > len(before)  # appended

    # tombstones append too; resolution hides the edge
    before = snap()
    assert eng.remove_link(0, 1, "related_to")
    after = snap()
    for f, meta in before.items():
        assert after[f] == meta, f
    assert len(after) > len(before)
    live = {(r.from_id, r.to_id) for r in eng.table("links").collect()}
    assert live == {(1, 2)}

    # re-add after tombstone: the edge is live again (latest seq wins)
    assert eng.add_link(0, 1, "related_to", "2024-06-01 14:00:00")
    live = {(r.from_id, r.to_id) for r in eng.table("links").collect()}
    assert live == {(0, 1), (1, 2)}

    # compaction folds the log to one file, dropping tombstones
    eng.compact(max_files=1)
    assert sum(1 for f in os.listdir(log_dir) if f.endswith(".parquet")) == 1
    live = {(r.from_id, r.to_id) for r in eng.table("links").collect()}
    assert live == {(0, 1), (1, 2)}


def test_legacy_links_dir_migrates_into_log(spark, tmp_path):
    """A store written by the pre-log links layout (a resolved
    ``links/`` table, no seq/tombstones) must keep its edges on
    upgrade: first access folds the legacy table into links_log as
    seq=0 live rows and retires the old directory (r3 advice: the
    rename silently dropped all existing edges)."""
    from datetime import datetime

    from memories_spark.engine import LINK_SCHEMA, MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [{"text": f"t{i}", "source": "a/x"} for i in range(3)],
        "2024-06-01 12:00:00",
    )
    # hand-write the legacy-format links table
    ts = datetime.fromisoformat("2024-06-01 12:00:00")
    legacy = spark.createDataFrame(
        [(0, 1, "related_to", ts), (1, 2, "supersedes", ts)], LINK_SCHEMA
    )
    legacy.coalesce(1).write.parquet(str(tmp_path / "store" / "links"))

    edges = {(r.from_id, r.to_id, r.type) for r in eng.table("links").collect()}
    assert edges == {(0, 1, "related_to"), (1, 2, "supersedes")}
    import os

    entries = os.listdir(str(tmp_path / "store"))
    assert "links" not in entries and "links_log" in entries
    # mutations keep working on the migrated log
    assert eng.remove_link(0, 1, "related_to") is True
    assert eng.add_link(2, 0, "caused_by", "2024-06-02 12:00:00") is True
    after = {(r.from_id, r.to_id, r.type) for r in eng.table("links").collect()}
    assert after == {(1, 2, "supersedes"), (2, 0, "caused_by")}


def test_restore_of_legacy_snapshot_restores_links(spark, tmp_path):
    """Restoring a snapshot taken by the pre-log layout must restore
    its edges (the snapshot carries ``links/``, not ``links_log/``)."""
    import os
    import shutil
    from datetime import datetime

    from memories_spark.engine import LINK_SCHEMA, MemoriesEngine

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([{"text": "t", "source": "a/x"}, {"text": "u", "source": "a/y"}],
            "2024-06-01 12:00:00")
    tag = eng.snapshot("2024-06-01 13:00:00")
    # retrofit the snapshot into legacy shape: links/ instead of links_log/
    snap = os.path.join(str(tmp_path / "store"), "_snapshots", tag)
    ts = datetime.fromisoformat("2024-06-01 12:00:00")
    spark.createDataFrame([(0, 1, "related_to", ts)], LINK_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(snap, "links"))
    shutil.rmtree(os.path.join(snap, "links_log"), ignore_errors=True)

    eng.add_link(1, 0, "blocked_by", "2024-06-02 12:00:00")  # post-snapshot edge
    eng.restore_snapshot(tag)
    edges = {(r.from_id, r.to_id, r.type) for r in eng.table("links").collect()}
    assert edges == {(0, 1, "related_to")}  # snapshot edge only
