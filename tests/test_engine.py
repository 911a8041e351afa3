"""MemoriesEngine mutation-semantics tests (reference SURVEY §2.8).

Each test pins a behavior the reference guarantees: sparse monotonic
ids, pinned guards, reserved-key patches, link validation, supersede
chains, upsert merge semantics, reinforcement-as-event-log.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine

NOW = "2024-06-01 12:00:00"
LATER = "2024-06-02 12:00:00"


@pytest.fixture()
def engine(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            {"text": "alpha fact", "source": "team/proj/a", "pinned": True},
            {"text": "beta fact", "source": "team/proj/b"},
            {"text": "gamma fact", "source": "team/other/c"},
            {"text": "delta fact", "source": "solo/d", "entity_key": "dkey"},
            {"text": "epsilon fact", "source": "team/proj/e"},
        ],
        NOW,
    )
    return eng


def test_add_assigns_monotonic_ids(engine):
    ids = engine.add([{"text": "f1", "source": "x"}, {"text": "f2", "source": "x"}], LATER)
    assert ids == [5, 6]
    assert engine.count() == 7


def test_ids_survive_deletes(engine):
    # Deleting the highest id must NOT cause its reuse: the counter
    # is monotonic like the reference's _next_id.
    engine.delete([4])
    assert engine.add([{"text": "new", "source": "x"}], LATER) == [5]


def test_sparse_ids_after_middle_delete(engine):
    engine.delete([2])
    assert engine.add([{"text": "n", "source": "x"}], LATER) == [5]


def test_count_prefix_and_archived(engine):
    assert engine.count(source_prefix="team/") == 4
    engine.set_flags([2], LATER, archived=True)
    assert engine.count(source_prefix="team/") == 3
    assert engine.count(source_prefix="team/", include_archived=True) == 4


def test_update_metadata_skips_reserved_and_policy(engine):
    ok = engine.update(
        1,
        LATER,
        metadata={"id": "999", "_policy_archived_reason": "x", "topic": "databases"},
    )
    assert ok
    row = engine.get([1]).collect()[0]
    assert row.metadata == {"topic": "databases"}
    assert row.id == 1
    assert str(row.updated_at) == "2024-06-02 12:00:00"


def test_update_text_clears_embedding_source_fast_path_keeps_it(engine, spark):
    engine.update(1, LATER, text="beta fact v2")
    assert engine.get([1]).collect()[0].embedding is None
    # source-only update must not touch the embedding column
    engine.update(1, LATER, source="team/proj/renamed")
    assert engine.get([1]).collect()[0].source == "team/proj/renamed"


def test_delete_scrubs_links(engine):
    assert engine.add_link(1, 2, "related_to", NOW)
    assert engine.add_link(3, 1, "caused_by", NOW)
    engine.delete([1])
    assert engine.table("links").count() == 0


def test_delete_by_prefix_skips_pinned(engine):
    n = engine.delete_by_prefix("team/proj/")
    assert n == 2  # ids 1, 4 (id 0 is pinned)
    assert engine.count(source_prefix="team/proj/") == 1
    assert engine.get([0]).count() == 1


def test_delete_by_prefix_dry_run(engine):
    n = engine.delete_by_prefix("team/", dry_run=True)
    assert n == 3  # pinned id 0 excluded
    assert engine.count() == 5


def test_supersede(engine):
    new_id = engine.supersede(1, "beta fact v2", LATER)
    assert new_id == 5
    assert engine.get([1]).count() == 0
    row = engine.get([new_id]).collect()[0]
    assert row.supersedes == 1 and row.previous_text == "beta fact"
    link = engine.table("links").collect()[0]
    assert (link.from_id, link.to_id, link.type) == (5, 1, "supersedes")


def test_merge_archives_originals(engine):
    new_id = engine.merge([1, 2], "beta+gamma merged", LATER)
    assert new_id == 5
    rows = {r.id: r for r in engine.get([1, 2]).collect()}
    assert rows[1].archived and rows[2].archived
    links = {(r.from_id, r.to_id) for r in engine.table("links").collect()}
    assert links == {(5, 1), (5, 2)}


def test_upsert_insert_then_update(engine):
    mid, action = engine.upsert("solo/d", "dkey", "delta v2", LATER)
    assert (mid, action) == (3, "updated")
    assert engine.get([3]).collect()[0].text == "delta v2"
    mid2, action2 = engine.upsert("solo/d", "other", "fresh", LATER)
    assert action2 == "inserted" and mid2 == 5


def test_link_validation(engine):
    with pytest.raises(ValueError):
        engine.add_link(1, 1, "related_to", NOW)
    with pytest.raises(ValueError):
        engine.add_link(1, 2, "bogus_type", NOW)
    assert engine.add_link(1, 2, "related_to", NOW) is True
    assert engine.add_link(1, 2, "related_to", NOW) is False  # duplicate
    assert engine.add_link(1, 99, "related_to", NOW) is False  # dangling
    assert engine.get_links(1, "out").count() == 1
    assert engine.get_links(2, "in").count() == 1
    assert engine.remove_link(1, 2, "related_to") is True
    assert engine.remove_link(1, 2, "related_to") is False


def test_enforce_policies(engine):
    # profiles: team/* has a 10-day TTL; team/proj/* (more specific)
    # instead archives on low confidence after 5 days; solo untouched
    profiles = [
        {"source_prefix": "team/", "ttl_days": 10},
        {
            "source_prefix": "team/proj/",
            "confidence_threshold": 0.9,
            "min_age_days": 5,
            "confidence_half_life_days": 30,
        },
    ]
    later = "2024-06-21 12:00:00"  # 20 days after NOW
    dry = engine.enforce_policies(profiles, later, dry_run=True)
    assert dry["archived"] == 0
    reasons = {c["id"]: c["reason"] for c in dry["candidates"]}
    # id 0 (team/proj/a) is pinned -> immune despite matching
    assert 0 not in reasons
    # team/proj rows resolve the MORE SPECIFIC profile: low_confidence
    # (age 20d > 5d, conf 0.5^(20/30) ~ 0.63 < 0.9), not ttl_expired
    assert reasons[1] == "low_confidence" and reasons[4] == "low_confidence"
    # team/other/c resolves the team/ TTL profile (age 20 > 10)
    assert reasons[2] == "ttl_expired"
    # solo/d matches no profile
    assert 3 not in reasons
    # dry run wrote nothing
    assert engine.count() == 5

    summary = engine.enforce_policies(profiles, later)
    assert summary["archived"] == 3
    archived = {
        r.id: r.metadata
        for r in engine.table("memories").filter(F.col("archived")).collect()
    }
    assert set(archived) == {1, 2, 4}
    assert archived[2]["policy_archived_reason"] == "ttl_expired"
    assert archived[1]["policy_archived_at"] == later
    # idempotent: archived rows leave the live set
    again = engine.enforce_policies(profiles, later)
    assert again["archived"] == 0


def test_rename_folder(engine):
    n = engine.rename_folder("team/proj/", "org/proj/", LATER)
    assert n == 3
    assert engine.count(source_prefix="org/proj/") == 3
    assert engine.count(source_prefix="team/proj/") == 0


def test_reinforcement_event_log_apply(engine):
    engine.log_retrieval([(1, 1), (2, 2)], NOW, query="q1")
    engine.log_retrieval([(1, 1)], LATER, query="q2")
    changed = engine.apply_reinforcement()
    assert changed == 2
    rows = {r.id: r for r in engine.get([1, 2]).collect()}
    assert str(rows[1].last_reinforced_at) == "2024-06-02 12:00:00"
    assert str(rows[2].last_reinforced_at) == "2024-06-01 12:00:00"
    # idempotent: re-apply changes nothing
    assert engine.apply_reinforcement() == 0


def test_feedback_net(engine):
    engine.log_feedback(1, "useful", NOW)
    engine.log_feedback(1, "useful", LATER)
    engine.log_feedback(1, "not_useful", LATER)
    engine.log_feedback(2, "not_useful", NOW)
    net = {r.memory_id: r.net for r in engine.feedback_net().collect()}
    assert net == {1: 1, 2: -1}


def test_export_import_roundtrip(engine, tmp_path, spark):
    out = str(tmp_path / "export")
    n = engine.export_ndjson(out, source_prefix="team/")
    assert n == 4
    eng2 = MemoriesEngine(spark, str(tmp_path / "store2"))
    result = eng2.import_ndjson(out, LATER, source_remap={"team/": "imported/"})
    assert result["imported"] == 4 and result["errors"] == []
    assert eng2.count(source_prefix="imported/") == 4
    texts = {r.text for r in eng2.table("memories").collect()}
    assert "alpha fact" in texts


def test_export_import_full_field_fidelity(spark, tmp_path):
    """Export -> import must preserve EVERY record field (reference
    tests/test_import_export_roundtrip.py: created_at/updated_at and
    custom fields survive; memory_engine.py:2508-2533): timestamps,
    category, flags, entity_key and metadata all round-trip, so
    decay/temporal signals don't reset on migration."""
    eng = MemoriesEngine(spark, str(tmp_path / "src"))
    eng.add(
        [
            {
                "text": "full record", "source": "team/full",
                "category": "decision", "pinned": True,
                "document_at": "2024-01-15 08:00:00",
                "entity_key": "ek1", "topic": "db",  # -> metadata
            },
            {"text": "bare record", "source": "team/bare"},
        ],
        NOW,
    )
    out = str(tmp_path / "exp")
    eng.export_ndjson(out)
    eng2 = MemoriesEngine(spark, str(tmp_path / "dst"))
    result = eng2.import_ndjson(out, LATER)
    assert result["imported"] == 2

    src_rows = {r.text: r for r in eng.table("memories").collect()}
    dst_rows = {r.text: r for r in eng2.table("memories").collect()}
    skip = {"id", "embedding", "metadata"}
    for text, s in src_rows.items():
        d = dst_rows[text]
        for f in s.__fields__:
            if f in skip:
                continue
            assert getattr(d, f) == getattr(s, f), (text, f, getattr(d, f), getattr(s, f))
        # metadata: original keys survive, import markers are added
        orig = s.metadata or {}
        got = d.metadata or {}
        for k, v in orig.items():
            assert got[k] == v
        assert got["imported"] == "true"
        assert got["import_source"] == s.source


def test_import_rejects_missing_header(spark, tmp_path):
    bad = tmp_path / "nohdr"
    bad.mkdir()
    (bad / "part-00000.json").write_text('{"text": "t", "source": "s"}\n')
    eng = MemoriesEngine(spark, str(tmp_path / "dst2"))
    result = eng.import_ndjson(str(bad), LATER)
    assert result["imported"] == 0
    assert result["errors"] and "header" in result["errors"][0]["error"].lower()


def test_import_add_never_collects_records(engine, tmp_path, spark, monkeypatch):
    """The add-strategy import path must be fully distributed: zero
    driver collects of record data (the round-2 defect: collect +
    re-add through the driver)."""
    # the CONCRETE class: pyspark 4's public DataFrame is a base whose
    # classic subclass overrides collect — patching the base is vacuous
    DataFrame = type(engine.table("memories"))

    out = str(tmp_path / "exp3")
    engine.export_ndjson(out)

    orig_collect = DataFrame.collect

    def scalar_only(df):
        rows = orig_collect(df)
        # legitimate driver-side metadata: the counter-file bootstrap
        # (max(id), 1x1) and _zip_index's per-PARTITION counts
        # (#partitions x 2 — bounded by layout, not by records).
        # Record data is anything payload-width or record-count.
        assert "text" not in df.columns, (
            f"import_ndjson(add) collected record data: {df.columns}"
        )
        assert len(rows) <= 32 and (not rows or len(rows[0]) <= 2), (
            f"import_ndjson(add) collected record-shaped rows: "
            f"{len(rows)} x {df.columns}"
        )
        return rows

    eng2 = MemoriesEngine(spark, str(tmp_path / "dst3"))
    monkeypatch.setattr(DataFrame, "collect", scalar_only)
    result = eng2.import_ndjson(out, LATER)
    monkeypatch.undo()
    assert result["imported"] == 5
    assert eng2.count() == 5


def test_import_smart_never_collects_record_payloads(tmp_path, spark, monkeypatch):
    """Smart import at 10^4 records: record payloads stay executor-side
    (the round-4 defect: the smart path collected EVERY record dict to
    the driver before classifying). Only per-record decision scalars —
    and, with a provider, the borderline rows' text — may be
    collected, so no collected row may ever be record-width."""
    import json

    from memories_spark.extraction import mock_embed

    n = 10_000
    src_dir = tmp_path / "bigimp"
    src_dir.mkdir()
    (src_dir / "_header.json").write_text(json.dumps({"_header": True}))
    with open(src_dir / "part-0.json", "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "text": f"bulk fact {i} about subsystem {i % 97}",
                "source": f"bulk/{i % 8}",
            }) + "\n")

    dst = MemoriesEngine(spark, str(tmp_path / "bigdst"))
    dst.add([{"text": "bulk fact 0 about subsystem 0", "source": "bulk/0",
              "embedding": mock_embed("bulk fact 0 about subsystem 0")}], NOW)

    DataFrame = type(dst.table("memories"))
    orig_collect = DataFrame.collect
    MAX_WIDTH = 6  # decision scalars / borderline (rid, text, category)
    collected_rows = [0]

    def narrow_only(df):
        rows = orig_collect(df)
        assert not rows or len(rows[0]) <= MAX_WIDTH, (
            f"smart import collected record-width rows: {df.columns}"
        )
        collected_rows[0] += len(rows)
        return rows

    monkeypatch.setattr(DataFrame, "collect", narrow_only)
    result = dst.import_ndjson(
        str(src_dir), LATER, strategy="smart", create_backup=False,
        embed_fn=mock_embed,
    )
    monkeypatch.undo()
    assert result["errors"] == []
    # Round-6 gate: with no provider there are no borderline rows, so
    # the whole 10^4-record import may collect only O(1) driver rows —
    # the <=4-row decision-count aggregate plus scalar probes. The old
    # path collected one (narrow) decision row per record, capping the
    # import batch at driver heap.
    assert collected_rows[0] <= 16, (
        f"smart import collected {collected_rows[0]} rows for {n} records"
    )
    # the exact seed restatement is skipped as a duplicate; everything
    # else is novel
    assert result["skipped"] >= 1
    assert result["imported"] + result["skipped"] == n
    # every borderline record matches the single seed (batch
    # decisions against the pre-import corpus, same as the old path),
    # so replacements delete exactly ONE distinct row
    assert dst.count() == 1 + result["imported"] - (1 if result["updated"] else 0)


def test_import_smart_large_switches_to_blocked_join(tmp_path, spark, monkeypatch):
    """Above SMART_BROADCAST_CAP the novelty join must NOT broadcast
    the import's embeddings through the driver (the round-5 review
    finding: broadcast(whole-import) is a driver OOM at 10^7 records
    and bypasses the collect-width gate); it switches to the
    multiprobe-LSH blocked join and still classifies correctly —
    identical vectors share a bucket by construction, so the
    duplicate is found without any broadcast."""
    import json

    import memories_spark.engine as eng_mod
    from memories_spark.extraction import mock_embed
    from memories_spark.operators import similarity as sim_mod

    src_dir = tmp_path / "blkimp"
    src_dir.mkdir()
    (src_dir / "_header.json").write_text(json.dumps({"_header": True}))
    recs = ["alpha gateway retries twice",       # dup of corpus row
            "beta cache ttl is ninety seconds",  # novel
            "gamma deploys run on fridays",      # novel
            "delta queue drains at midnight"]    # novel
    with open(src_dir / "part-0.json", "w") as f:
        for i, t in enumerate(recs):
            f.write(json.dumps({"text": t, "source": f"blk/{i % 2}"}) + "\n")

    dst = MemoriesEngine(spark, str(tmp_path / "blkdst"))
    dst.add([{"text": "alpha gateway retries twice", "source": "blk/0",
              "embedding": mock_embed("alpha gateway retries twice")}], NOW)

    calls = {"broadcast": 0, "blocked": 0}
    orig_exact, orig_blocked = sim_mod.topk_cosine, sim_mod.topk_cosine_blocked

    def spy_exact(*a, **kw):
        calls["broadcast"] += 1
        return orig_exact(*a, **kw)

    def spy_blocked(*a, **kw):
        calls["blocked"] += 1
        return orig_blocked(*a, **kw)

    monkeypatch.setattr(sim_mod, "topk_cosine", spy_exact)
    monkeypatch.setattr(sim_mod, "topk_cosine_blocked", spy_blocked)
    monkeypatch.setattr(eng_mod, "SMART_BROADCAST_CAP", 2)

    result = dst.import_ndjson(str(src_dir), LATER, strategy="smart",
                               create_backup=False, embed_fn=mock_embed)
    assert calls == {"broadcast": 0, "blocked": 1}
    assert result["errors"] == []
    assert result["skipped"] == 1 and result["imported"] == 3
    assert dst.count() == 4


def test_import_pre_backup_and_source_remap_longest_first(engine, tmp_path, spark):
    out = str(tmp_path / "exp4")
    engine.export_ndjson(out)
    # importing INTO a non-empty store snapshots it first
    eng2 = MemoriesEngine(spark, str(tmp_path / "dst4"))
    eng2.add([{"text": "pre-existing", "source": "keep"}], NOW)
    result = eng2.import_ndjson(
        out, LATER, source_remap={"team/proj/": "tp/", "team/": "t/"}
    )
    assert result["backup"] in eng2.list_snapshots()
    srcs = {r.source for r in eng2.table("memories").collect()}
    # first matching prefix wins: team/proj/* -> tp/*, team/other -> t/other
    assert {"tp/a", "tp/b", "tp/e", "t/other/c", "solo/d", "keep"} == srcs


def test_export_drops_ids_and_embeddings(engine, tmp_path, spark):
    out = str(tmp_path / "export2")
    engine.export_ndjson(out)
    df = spark.read.json(out)
    assert "id" not in df.columns and "embedding" not in df.columns


def test_snapshot_restore_roundtrip(engine):
    """S7: snapshot → mutate → restore yields the pre-mutation state,
    including the id counter (reference memory_engine.py:427-523,
    654-681)."""
    tag = engine.snapshot(NOW)
    assert engine.list_snapshots() == [tag]

    engine.delete([1, 2])
    engine.add([{"text": "post-snap", "source": "x"}], LATER)
    assert engine.count() != 5

    engine.restore_snapshot(tag)
    assert engine.count() == 5
    assert {r.id for r in engine.table("memories").select("id").collect()} == {0, 1, 2, 3, 4}
    # id counter restored too: next add continues from 5
    assert engine.add([{"text": "f", "source": "x"}], LATER) == [5]


def test_snapshot_keep_last_n(engine):
    tags = [engine.snapshot(f"2024-06-0{d} 00:00:00", keep=2) for d in range(1, 5)]
    assert engine.list_snapshots() == tags[-2:]


def test_audit_trail_records_mutations(engine):
    """Reference audit_log.py parity: every mutation appends an audit
    record; the log is append-only and survives snapshot restores."""
    engine.update(1, LATER, text="beta fact v2")
    engine.set_flags([2], LATER, archived=True)
    engine.delete([3], now=LATER)
    engine.rename_folder("team/proj/", "team/project/", LATER)

    trail = engine.audit_trail().collect()
    actions = [r.action for r in trail]
    # 1 add (fixture) + update + set_flags + delete + rename
    assert actions.count("add") == 1
    assert "update" in actions and "delete" in actions
    assert "set_flags" in actions and "rename_folder" in actions
    add_rec = next(r for r in trail if r.action == "add")
    assert list(add_rec.ids) == [0, 1, 2, 3, 4]
    upd = next(r for r in trail if r.action == "update")
    assert upd.detail == "text" and list(upd.ids) == [1]

    # restore does not erase audit history; it appends its own record
    tag = engine.snapshot(LATER)
    engine.delete([4], now=LATER)
    n_before = engine.audit_trail().count()
    engine.restore_snapshot(tag)
    after = engine.audit_trail().collect()
    assert len(after) == n_before + 1
    assert after[-1].action == "restore_snapshot" or any(
        r.action == "restore_snapshot" for r in after
    )


def test_enforce_policies_set_based_at_scale(spark, tmp_path):
    """The enforcement path must be set-based: a sweep deciding 10^4
    candidates applies them through a JOIN of the decision set onto
    the table rewrite — not a 10^4-branch CASE WHEN expression tree
    (which chokes Catalyst long before the data hurts), and no
    candidate rows are collected to the driver."""
    eng = MemoriesEngine(spark, str(tmp_path / "bigstore"))
    n = 10_000
    eng.add(
        [{"text": f"fact {i}", "source": f"bulk/{i % 7}"} for i in range(n)], NOW
    )
    profiles = [{"source_prefix": "bulk/", "ttl_days": 1}]
    later = "2024-07-01 12:00:00"  # 30 days after NOW: all expired

    decided = eng._policy_decisions(profiles, later)
    rewrite = eng._policy_rewrite(decided, later)
    p = rewrite._jdf.queryExecution().explainString(
        rewrite._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" in p, p
    # the WHENs are a constant handful of column rewrites, never
    # one branch per victim
    assert p.count("CASE WHEN") < 50, p.count("CASE WHEN")

    # the dry-run REPORT is bounded too: a 10^4-candidate sweep
    # returns a paged id-ordered sample plus the total, never an
    # unbounded collect of every candidate row
    dry = eng.enforce_policies(profiles, later, dry_run=True, dry_run_limit=50)
    assert dry["total_candidates"] == n and dry["truncated"] is True
    assert len(dry["candidates"]) == 50
    ids = [c["id"] for c in dry["candidates"]]
    assert ids == sorted(ids)

    summary = eng.enforce_policies(profiles, later)
    assert summary["archived"] == n
    live = eng.table("memories").filter(~F.col("archived")).count()
    assert live == 0


def test_enforce_policies_evidence_via_join(spark, tmp_path):
    """Per-row evidence (reason/at) must survive the set-based apply."""
    eng = MemoriesEngine(spark, str(tmp_path / "evstore"))
    eng.add([{"text": "t", "source": "a/x"}], NOW)
    later = "2024-07-01 12:00:00"
    eng.enforce_policies([{"source_prefix": "a/", "ttl_days": 1}], later)
    row = eng.table("memories").collect()[0]
    assert row.archived
    assert row.metadata["policy_archived_reason"] == "ttl_expired"
    assert row.metadata["policy_archived_at"] == later


def test_import_smart_strategy_from_files(engine, tmp_path, spark):
    """strategy='smart' dispatches the file import through the S5
    novelty check (reference import_memories strategy dispatch,
    memory_engine.py:2536-2543)."""
    out = str(tmp_path / "exp5")
    engine.export_ndjson(out, source_prefix="team/proj/a")
    # importing back into the SAME store: exact texts -> all skipped
    result = engine.import_ndjson(out, LATER, strategy="smart", create_backup=False)
    assert result["imported"] == 1  # no embeddings in store: novel path
    result2 = engine.import_ndjson(out, LATER, strategy="bogus", create_backup=False)
    assert result2["errors"] and "Unknown strategy" in result2["errors"][0]["error"]


@pytest.fixture()
def strict_map_policy(spark):
    """Force Spark's default map_concat duplicate-key EXCEPTION policy
    so these tests prove the expression-level overlay fix stands on
    its own (the session sets LAST_WIN as defense in depth, which
    would otherwise mask a regression)."""
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    yield
    spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)


def test_metadata_patch_overwrites_existing_key(engine, strict_map_policy):
    """PATCHing a key that already exists must overwrite it, not throw
    'Duplicate map key' (map_concat under EXCEPTION policy)."""
    engine.update(1, LATER, metadata={"topic": "databases"})
    engine.update(1, LATER, metadata={"topic": "caches", "extra": "y"})
    row = engine.get([1]).collect()[0]
    assert row.metadata == {"topic": "caches", "extra": "y"}


def test_import_roundtrip_twice(engine, tmp_path, spark, strict_map_policy):
    """Second-generation round trip: export a store that was itself
    populated by import (metadata already carries imported /
    import_source), import again — the marker re-stamp must overlay,
    not collide."""
    out1 = str(tmp_path / "gen1")
    engine.export_ndjson(out1)
    eng2 = MemoriesEngine(spark, str(tmp_path / "gen1store"))
    r1 = eng2.import_ndjson(out1, LATER)
    assert r1["imported"] == 5 and r1["errors"] == []

    out2 = str(tmp_path / "gen2")
    eng2.export_ndjson(out2)
    eng3 = MemoriesEngine(spark, str(tmp_path / "gen2store"))
    r2 = eng3.import_ndjson(out2, LATER, source_remap={"team/": "again/"})
    assert r2["imported"] == 5 and r2["errors"] == []
    row = [r for r in eng3.table("memories").collect() if r.text == "beta fact"][0]
    assert row.metadata["imported"] == "true"
    # marker re-stamped to the CURRENT (remapped) source, not gen-1's
    assert row.metadata["import_source"] == "again/proj/b"


def test_policy_rearchive_overlays_evidence(spark, tmp_path, strict_map_policy):
    """Archive -> unarchive -> re-archive: the second sweep's evidence
    must overwrite the stale keys instead of throwing on map_concat."""
    eng = MemoriesEngine(spark, str(tmp_path / "rearch"))
    eng.add([{"text": "old fact", "source": "team/x"}], "2024-01-01 00:00:00")
    profiles = [{"source_prefix": "team/", "ttl_days": 30}]
    assert eng.enforce_policies(profiles, NOW)["archived"] == 1
    eng.set_flags([0], NOW, archived=False)
    assert eng.enforce_policies(profiles, LATER)["archived"] == 1
    row = eng.get([0]).collect()[0]
    assert row.metadata["policy_archived_at"] == LATER
    assert row.metadata["policy_archived_reason"] == "ttl_expired"


def test_import_smart_extract_llm_resolves_borderline(spark, tmp_path):
    """strategy='smart+extract' (reference CHANGELOG.md:365: 'LLM for
    borderline conflicts'): borderline records go through the
    provider's AUDN decision instead of timestamp resolution, and
    per-record extraction outcomes land in the result."""
    from memories_spark.extraction import MockProvider, mock_embed

    src = MemoriesEngine(spark, str(tmp_path / "imp_src"))
    src.add(
        [
            # borderline vs dst row 0 (same bag +1 token: sim in [0.8, 0.95))
            {"text": "the api uses port 7443 now", "source": "team/net",
             # OLDER than the dst row: plain smart would SKIP it
             "created_at": "2024-01-01 00:00:00"},
            {"text": "completely novel deployment cadence fact", "source": "team/ops"},
        ],
        NOW,
    )
    out = str(tmp_path / "imp_exp")
    src.export_ndjson(out)

    def seeded_dst(name):
        dst = MemoriesEngine(spark, str(tmp_path / name))
        dst.add([{"text": "the api uses port 7443", "source": "team/net",
                  "embedding": mock_embed("the api uses port 7443")}], LATER)
        return dst

    # plain smart: borderline + older timestamp -> skipped (exports
    # strip embeddings, so the embedder must score incoming texts)
    smart = seeded_dst("dst_smart").import_ndjson(
        out, LATER, strategy="smart", create_backup=False, embed_fn=mock_embed
    )
    assert smart["updated"] == 0 and smart["imported"] == 1

    # smart+extract: the provider's UPDATE band decision wins over the
    # timestamp — the old row is replaced
    dst = seeded_dst("dst_llm")
    result = dst.import_ndjson(
        out, LATER, strategy="smart+extract", create_backup=False,
        provider=MockProvider(), embed_fn=mock_embed,
    )
    # reference counts replaced rows in BOTH imported and updated
    # (_import_smart routes them through novel_texts, :2618-2636)
    assert result["updated"] == 1 and result["imported"] == 2
    assert result["deleted"] == 0
    outcomes = {o["record"]: o["outcome"] for o in result["extraction"]}
    assert sorted(outcomes.values()) == ["added", "llm_update"]
    texts = {r.text for r in dst.table("memories").collect()}
    assert "the api uses port 7443 now" in texts
    assert "the api uses port 7443" not in texts  # replaced


def test_import_smart_extract_outcomes_cap(spark, tmp_path):
    """Round-6 advice (low): the smart+extract per-record outcomes
    report is the one remaining O(records) driver collect — over
    ``outcomes_cap`` it must degrade to borderline outcomes plus an
    explicit ``outcomes_truncated`` count, never a silent full
    collect (or a complete-looking partial list)."""
    from memories_spark.extraction import MockProvider, mock_embed

    src = MemoriesEngine(spark, str(tmp_path / "cap_src"))
    src.add(
        [{"text": f"novel cadence fact number {i} entirely", "source": "team/ops"}
         for i in range(6)],
        NOW,
    )
    out = str(tmp_path / "cap_exp")
    src.export_ndjson(out)

    dst = MemoriesEngine(spark, str(tmp_path / "cap_dst"))
    result = dst.import_ndjson(
        out, LATER, strategy="smart+extract", create_backup=False,
        provider=MockProvider(), embed_fn=mock_embed, outcomes_cap=3,
    )
    assert result["imported"] == 6  # the import itself is unaffected
    assert result["extraction"] == []  # 6 non-borderline rows > cap 3
    # and the summary says so explicitly rather than looking complete
    assert result["outcomes_truncated"] == 6
    assert dst.count() == 6


def test_zip_index_matches_zip_with_index(spark):
    """_zip_index (Tungsten-native, round-6 verdict item 7) must
    reproduce RDD.zipWithIndex numbering exactly: contiguous from the
    offset, in row order, across multiple partitions."""
    from memories_spark.engine import _zip_index

    df = spark.range(0, 97, 1, 7).select(
        F.concat(F.lit("row-"), F.col("id")).alias("payload")
    )
    expected = [
        (i + 1000, r.payload)
        for r, i in df.rdd.zipWithIndex().collect()
    ]
    got = [
        (int(r.idx), r.payload)
        for r in _zip_index(df, "idx", offset=1000).orderBy("idx").collect()
    ]
    assert got == sorted(expected)
    assert [g[0] for g in got] == list(range(1000, 1097))


def test_snapshot_premigrates_legacy_links(spark, tmp_path):
    """A snapshot taken on an UNMIGRATED legacy store (links/ table,
    no link access yet) must still capture the edges — snapshot
    iterates _SCHEMAS, so it folds the legacy table into links_log
    first; otherwise a later restore would silently lose every edge."""
    import os
    from datetime import datetime

    from memories_spark.engine import LINK_SCHEMA

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([{"text": "t", "source": "a/x"}, {"text": "u", "source": "a/y"}], NOW)
    ts = datetime.fromisoformat(NOW)
    spark.createDataFrame([(0, 1, "related_to", ts)], LINK_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(str(tmp_path / "store"), "links"))

    tag = eng.snapshot(LATER)  # first store access of any kind
    assert os.path.isdir(
        os.path.join(str(tmp_path / "store"), "_snapshots", tag, "links_log")
    )
    eng.remove_link(0, 1, "related_to")
    assert eng.table("links").count() == 0
    eng.restore_snapshot(tag)
    edges = {(r.from_id, r.to_id) for r in eng.table("links").collect()}
    assert edges == {(0, 1)}


def test_import_smart_extract_delete_stores_nothing(spark, tmp_path):
    """AUDN DELETE on a borderline import record is a retraction:
    the matched row is removed and the incoming text is NOT stored."""
    from memories_spark.extraction import mock_embed

    class DeleteProvider:
        def decide(self, fact, similar, bands=None):
            return {"action": "DELETE", "target_id": similar[0]["id"]}

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([{"text": "the api uses port 7443", "source": "net",
              "embedding": mock_embed("the api uses port 7443")}], NOW)
    s = eng.import_smart(
        [{"text": "the api uses port 7443 now", "source": "net",
          "embedding": mock_embed("the api uses port 7443 now")}],
        LATER, provider=DeleteProvider(),
    )
    assert s["deleted"] == 1 and s["added"] == 0 and s["replaced"] == 0
    assert s["outcomes"][0]["outcome"] == "llm_delete"
    assert eng.count() == 0  # target gone, retraction not stored


def test_import_smart_passes_thresholds_as_bands(spark, tmp_path):
    """The import's own dup/novel thresholds must reach the provider
    as the AUDN bands — a provider falling back to its defaults would
    contradict the caller's explicit thresholds."""
    from memories_spark.extraction import mock_embed

    seen = []

    class RecordingProvider:
        def decide(self, fact, similar, bands=None):
            seen.append(bands)
            return {"action": "NOOP", "target_id": similar[0]["id"]}

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([{"text": "the api uses port 7443", "source": "net",
              "embedding": mock_embed("the api uses port 7443")}], NOW)
    eng.import_smart(
        [{"text": "the api uses port 7443 now", "source": "net",
          "embedding": mock_embed("the api uses port 7443 now")}],
        LATER, dup_threshold=0.99, novel_threshold=0.5,
        provider=RecordingProvider(),
    )
    assert seen == [(0.99, 0.5)]


def test_import_smart_tolerates_declining_embedder(spark, tmp_path):
    """An embed_fn may return None for a text it cannot embed (the old
    list-based path's supported case): such records must import as
    novel instead of crashing the Arrow embed stage."""
    import json

    from memories_spark.extraction import mock_embed

    src_dir = tmp_path / "declimp"
    src_dir.mkdir()
    (src_dir / "_header.json").write_text(json.dumps({"_header": True}))
    with open(src_dir / "part-0.json", "w") as f:
        f.write(json.dumps({"text": "embeddable note", "source": "d/a"}) + "\n")
        f.write(json.dumps({"text": "SKIPME opaque blob", "source": "d/b"}) + "\n")

    dst = MemoriesEngine(spark, str(tmp_path / "decldst"))
    dst.add([{"text": "embeddable note", "source": "d/a",
              "embedding": mock_embed("embeddable note")}], NOW)

    def picky_embed(t):
        return None if t.startswith("SKIPME") else mock_embed(t)

    result = dst.import_ndjson(
        str(src_dir), LATER, strategy="smart", create_backup=False,
        embed_fn=picky_embed,
    )
    assert result["errors"] == []
    # the exact restatement is skipped; the unembeddable record is
    # imported as novel (None embedding skips the novelty join)
    assert result["skipped"] == 1 and result["imported"] == 1
    texts = {r.text for r in dst.table("memories").collect()}
    assert "SKIPME opaque blob" in texts


def test_zip_index_empty_and_single_partition(spark):
    """_zip_index degenerate shapes: empty input yields zero rows (the
    offsets frame is empty, the join vacuous); a single partition is
    pure within-partition numbering."""
    from memories_spark.engine import _zip_index

    empty = spark.range(0).select(F.col("id").alias("payload"))
    out = _zip_index(empty, "idx", offset=7)
    assert out.count() == 0 and "idx" in out.columns

    one = spark.range(0, 5, 1, 1).select(F.col("id").alias("payload"))
    got = [(int(r.idx), int(r.payload))
           for r in _zip_index(one, "idx").orderBy("idx").collect()]
    assert got == [(i, i) for i in range(5)]
