"""Keyword-bag query enrichment + dual-strategy search (reference
5.3.0 'Enriched keyword-bag queries', CHANGELOG.md:49; extraction
grammar from plugin/hooks/memory-query.sh:64-82 build_keyword_bag;
merge semantics :237-245). The extraction test pins the reference's
own example prompt (tests/test_claude_memory_hooks.py:949-988)."""

from __future__ import annotations

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.functions.keywords import (
    build_keyword_bag,
    enrich_query,
    extract_domain_nouns,
    extract_identifiers,
    extract_versions,
)
from memories_spark.search import dual_strategy_search, release_caches

NOW = "2024-06-01 12:00:00"

# the reference's own test prompt (test_claude_memory_hooks.py:957)
REF_PROMPT = (
    "ok so the UserPrefs module uses fetch_config and the MAX_RETRIES "
    "constant for v2.1.0 of PR-42"
)


def test_keyword_bag_on_reference_example():
    """Pin the exact assertions of the reference's
    test_build_keyword_bag_strips_filler_keeps_domain_terms."""
    bag = build_keyword_bag(REF_PROMPT, "myproject")
    for kept in ("myproject", "UserPrefs", "fetch_config", "MAX_RETRIES",
                 "v2.1.0", "PR-42"):
        assert kept in bag, bag
    words = bag.lower().split()
    for filler in ("ok", "so", "the", "uses", "and", "for", "of"):
        assert filler not in words, bag


def test_extractor_groups_and_caps():
    assert extract_identifiers("FooBar baz_qux HTTP") == [
        "FooBar", "HTTP", "baz_qux"
    ]
    assert extract_versions("fix #12 for v1.2.3 in PR 7 and PR-9") == [
        "#12", "PR 7", "PR-9", "v1.2.3"
    ]
    nouns = extract_domain_nouns("the retry queue uses redis for caching")
    assert nouns == ["caching", "queue", "redis", "retry"]
    # caps: 10 identifiers / 5 versions / 15 nouns
    many_ids = " ".join(f"word_{chr(97 + i)}x" for i in range(20))
    assert len(extract_identifiers(many_ids)) == 10
    many_vers = " ".join(f"#{i}" for i in range(10, 22))
    assert len(extract_versions(many_vers)) == 5
    many_nouns = " ".join(f"noun{chr(97 + i)}" for i in range(26))
    assert len(extract_domain_nouns(many_nouns)) == 15


def test_enrich_query_short_fallback():
    """An enrichment under 5 chars serves the original prompt
    (memory-query.sh:160-162)."""
    assert enrich_query("do it", "") == "do it"
    assert enrich_query("", "") == ""
    assert enrich_query("configure the RetryPolicy", "proj").startswith("proj")


def _rec(text, source):
    return {"text": text, "source": source, "embedding": mock_embed(text)}


def test_dual_strategy_merge_and_provenance(spark, tmp_path):
    """Strategy A (enriched unscoped k=6) + Strategy B (enriched
    prefix-scoped k=3) merge unique-by-id — first strategy wins the
    payload — sorted by coalesce(similarity, rrf_score, 0) desc,
    capped at 6 (memory-query.sh:237-245)."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            _rec("RetryPolicy uses exponential backoff", "proj/alpha"),
            _rec("the retry queue drains hourly", "proj/alpha"),
            _rec("backoff jitter is five percent", "proj/beta"),
            _rec("unrelated grocery list", "home/misc"),
        ],
        NOW,
    )
    df = dual_strategy_search(
        eng, "how does the RetryPolicy backoff work", project="proj",
        scoped_prefixes=("proj/alpha",), threshold=None,
        auto_intent=False, now=NOW,
    )
    rows = df.collect()
    release_caches(df)
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids))  # unique by id
    assert len(rows) <= 6
    assert {r.strategy for r in rows} <= {"unscoped", "scoped:proj/alpha"}
    # sorted by coalesce(similarity, rrf_score, 0) descending
    scores = [
        (r.similarity if r.similarity is not None else (r.rrf_score or 0.0))
        for r in rows
    ]
    assert scores == sorted(scores, reverse=True)


def test_dual_strategy_deterministic(spark, tmp_path):
    """Same store + same prompt => identical merged results across
    runs (the RNG-free determinism gate for the merge)."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([_rec(f"note {i} about deploy gates", f"proj/{i % 2}")
             for i in range(8)], NOW)

    def run():
        df = dual_strategy_search(
            eng, "what are the deploy gates", project="proj",
            scoped_prefixes=("proj/0",), threshold=None,
            auto_intent=False, now=NOW,
        )
        rows = [(r.id, r.strategy, round(r.rrf_score, 9)) for r in df.collect()]
        release_caches(df)
        return rows

    assert run() == run()


def test_dual_strategy_fallback_on_empty(spark, tmp_path):
    """A threshold that kills both strategies triggers ONE fallback
    search with the ORIGINAL verbose prompt (memory-query.sh:247-250)."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([_rec("alpha beta gamma", "proj/x")], NOW)
    df = dual_strategy_search(
        eng, "completely unrelated query", project="proj",
        scoped_prefixes=("proj/x",), threshold=0.999,
        scoped_threshold=0.999, fallback_threshold=None,
        auto_intent=False, now=NOW,
    )
    rows = df.collect()
    release_caches(df)
    assert rows and all(r.strategy == "fallback" for r in rows)


def test_dual_strategy_fallback_threshold_filters_noise(spark, tmp_path):
    """Round-6 advice (medium): the reference fallback is k=5 with
    threshold 0.55 (memory-query.sh:32-35) — a low-similarity corpus
    must NOT leak through the fallback at the defaults. The reference
    hook emits no context in that case; our twin returns zero rows."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([_rec("alpha beta gamma", "proj/x")], NOW)
    df = dual_strategy_search(
        eng, "completely unrelated query", project="proj",
        scoped_prefixes=("proj/x",), threshold=0.999,
        scoped_threshold=0.999,
        auto_intent=False, now=NOW,
    )
    rows = df.collect()
    release_caches(df)
    assert rows == []  # 0.55 fallback threshold filtered the noise

    # and the reference's parameter defaults stay pinned to the hook's
    import inspect

    sig = inspect.signature(dual_strategy_search)
    assert sig.parameters["scoped_threshold"].default == 0.35
    assert sig.parameters["fallback_k"].default == 5
    assert sig.parameters["fallback_threshold"].default == 0.55


def test_dual_strategy_releases_everything(spark, tmp_path):
    """One release_caches on the merged result frees every branch's
    caches and snapshot refs."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add([_rec(f"note {i} on retry backoff", "proj/a") for i in range(5)],
            NOW)
    eng.serving_memories().count()
    sc = spark.sparkContext

    def cached_ids():
        return {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}

    before = cached_ids()
    df = dual_strategy_search(
        eng, "retry backoff", project="proj", scoped_prefixes=("proj/a",),
        threshold=None, auto_intent=False, now=NOW,
    )
    df.collect()
    release_caches(df)
    leaked = cached_ids() - before
    assert not leaked, f"dual-strategy leaked blocks: {sorted(leaked)}"
    assert eng._snap_cur["refs"] == 0
