"""Serving-side persisted BM25 (lexical) index: build / pruned reads /
staleness fallback / incremental refresh.

The lexical twin of test_ann_serving.py: the reference keeps its BM25
index persistent between queries (reference memory_engine.py:224-232);
hybrid_search(lexical=True) serves term statistics from the persisted
index when fresh and falls back to the inline full-corpus build
whenever the store mutated — results must be IDENTICAL either way.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.operators.lexical_index import table_root
from memories_spark.search import hybrid_search

NOW = "2024-06-01 12:00:00"
LATER = "2024-06-02 12:00:00"

_TOPICS = [
    "database", "cache", "queue", "metrics", "billing", "auth",
    "search", "deploy", "storage", "network", "email", "backup",
]


def _corpus(n=240):
    recs = []
    for i in range(n):
        t = _TOPICS[i % len(_TOPICS)]
        text = f"{t} note {i}: the {t} subsystem handles item {i % 7} with policy {i % 5}"
        recs.append(
            {"text": text, "source": f"corp/{t}", "embedding": mock_embed(text)}
        )
    return recs


def _rows(df):
    return [
        (r.id, round(r.rrf_score, 9), r.similarity)
        for r in df.orderBy(F.desc("rrf_score"), F.asc("id")).collect()
    ]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    eng = MemoriesEngine(spark, str(tmp_path_factory.mktemp("lexserve") / "store"))
    eng.add(_corpus(), NOW)
    eng.build_lexical_index()
    return eng


def test_index_layout_and_meta(store):
    idx = store._dir("_lexical_index")
    meta = store.lexical_index_meta()
    assert meta is not None
    assert meta["version"] == store.table_version()
    assert meta["folder_sigs"]  # per-folder identity pinned for refresh
    assert meta["gen"].startswith("g-")  # tables live in a generation
    root = table_root(idx, meta)
    for sub in ("postings", "doc_stats"):
        parts = [e for e in os.listdir(os.path.join(root, sub)) if e.startswith("part=")]
        assert parts == ["part=corp"], (sub, parts)
    assert os.path.isdir(os.path.join(root, "term_idf"))
    assert os.path.isdir(os.path.join(root, "corpus"))
    # every live doc has a length row; postings cover the vocabulary
    n_docs = store.spark.read.parquet(os.path.join(root, "doc_stats")).count()
    assert n_docs == store.count()


def test_indexed_results_identical_to_inline(store):
    queries = [
        "cache subsystem policy",
        "the billing subsystem handles item 3",
        "backup note storage",
    ]
    for q in queries:
        inline = _rows(hybrid_search(store, q, k=10, auto_intent=False, now=NOW))
        indexed = _rows(
            hybrid_search(store, q, k=10, auto_intent=False, now=NOW, lexical=True)
        )
        assert indexed == inline, q


def test_fresh_index_plan_never_tokenizes_corpus(store):
    """Plan gate: with a fresh index the search plan reads the
    persisted postings (In(term)-pruned) and contains NO corpus
    tokenization — the inline plan's split(lower(trim(text)))
    must be absent."""
    df = hybrid_search(
        store, "cache subsystem policy", k=5, auto_intent=False, now=NOW,
        lexical=True,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_lexical_index" in plan
    assert "split(lower(trim(text" not in plan
    # the inline plan DOES tokenize — the gate actually discriminates
    inline = hybrid_search(
        store, "cache subsystem policy", k=5, auto_intent=False, now=NOW
    )
    inline_plan = inline._jdf.queryExecution().executedPlan().toString()
    assert "split(lower(trim(text" in inline_plan


def test_postings_read_is_term_pruned(store):
    """The stats read carries the In(term) predicate down to the
    parquet scan (row-group pruning via the term-sorted layout), and
    the per-doc lengths come from the PRUNED postings' denormalized
    dl — never an O(corpus) doc_stats scan in the query path."""
    stats = store.lexical_stats(["cache", "policy"])
    plan = stats["terms"]._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan
    dplan = stats["doc_stats"]._jdf.queryExecution().executedPlan().toString()
    assert "In(term" in dplan, dplan


def test_prefix_or_archived_searches_fall_back(store):
    """A source_prefix or include_archived search scores a DIFFERENT
    corpus than the index represents — must take the inline path (and
    therefore still be correct)."""
    pref = hybrid_search(
        store, "cache subsystem policy", k=5, auto_intent=False, now=NOW,
        lexical=True, source_prefix="corp/cache",
    )
    plan = pref._jdf.queryExecution().executedPlan().toString()
    assert "_lexical_index" not in plan
    assert "split(lower(trim(text" in plan
    inline = _rows(hybrid_search(
        store, "cache subsystem policy", k=5, auto_intent=False, now=NOW,
        source_prefix="corp/cache",
    ))
    assert _rows(pref) == inline


def test_stale_index_falls_back_then_refresh_restores(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(60), NOW)
    eng.build_lexical_index()
    assert eng.lexical_index_meta() is not None

    [new_id] = eng.add(
        [{"text": "fresh cache fact about item 3", "source": "corp/cache",
          "embedding": mock_embed("fresh cache fact about item 3")}],
        LATER,
    )
    eng.delete([0])
    assert eng.lexical_index_meta() is None  # stale

    q = "fresh cache fact about item 3"
    stale = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER,
                                lexical=True))
    inline = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER))
    assert stale == inline
    assert new_id in [r[0] for r in stale]

    meta = eng.refresh_lexical_index()
    assert meta["version"] == eng.table_version()
    assert eng.lexical_index_meta() is not None
    refreshed = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER,
                                    lexical=True))
    inline2 = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER))
    assert refreshed == inline2
    assert new_id in [r[0] for r in refreshed]
    # the deleted doc is gone from the index's doc_stats
    ids = {
        int(r.id)
        for r in spark.read.parquet(
            os.path.join(table_root(eng._dir("_lexical_index")), "doc_stats")
        ).collect()
    }
    assert 0 not in ids and new_id in ids


def test_refresh_touches_only_changed_folders(spark, tmp_path):
    """Incremental contract: a mutation in folder A must leave folder
    B's postings files untouched BYTES after refresh."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    recs = _corpus(40)
    for r in recs[:20]:
        r["source"] = "stable/" + r["source"].split("/")[1]
    eng.add(recs, NOW)
    eng.build_lexical_index()

    idx = eng._dir("_lexical_index")

    def snap(sub, part):
        # resolve the ACTIVE generation each call (refresh publishes a
        # new one; unchanged folders are carried over as hardlinks, so
        # name/size/mtime identity still proves untouched bytes)
        d = os.path.join(table_root(idx), sub, f"part={part}")
        out = []
        for root, _, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out.append((os.path.relpath(p, d), os.path.getsize(p),
                                os.path.getmtime(p)))
        return tuple(sorted(out))

    stable_before = (snap("postings", "stable"), snap("doc_stats", "stable"))
    corp_before = snap("postings", "corp")

    eng.add([{"text": "brand new corp doc about cache policy",
              "source": "corp/cache", "embedding": mock_embed("x")}], LATER)
    eng.refresh_lexical_index()

    assert (snap("postings", "stable"), snap("doc_stats", "stable")) == stable_before
    assert snap("postings", "corp") != corp_before
    # and the refreshed index serves the new doc identically to inline
    q = "brand new corp doc about cache policy"
    assert _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER,
                               lexical=True)) == _rows(
        hybrid_search(eng, q, k=5, auto_intent=False, now=LATER))


def test_refresh_handles_hive_escaped_folder_names(spark, tmp_path):
    """Folder values that Hive-escape in partition dir names (spaces,
    %, #) must round-trip through signature diffing and the
    per-folder postings swap — a raw/escaped mismatch would either
    re-tokenize everything or drop the wrong partition (the ANN index
    has the same gate, test_ann_serving.py)."""
    from urllib.parse import unquote

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    weird = ["my docs", "a%b", "c#d", "plain"]
    recs = []
    for i in range(80):
        f = weird[i % len(weird)]
        text = f"{f} note {i} about subsystem {i % 5}"
        recs.append({"text": text, "source": f"{f}/x",
                     "embedding": mock_embed(text)})
    eng.add(recs, NOW)
    eng.build_lexical_index()
    idx = eng._dir("_lexical_index")
    assert set(eng.lexical_index_meta()["folder_sigs"]) == set(weird)

    def snap():
        out = {}
        post = os.path.join(table_root(idx), "postings")
        for part in os.listdir(post):
            if not part.startswith("part="):
                continue
            files = []
            for root, _, names in os.walk(os.path.join(post, part)):
                for n in names:
                    if n.endswith(".parquet"):
                        p = os.path.join(root, n)
                        files.append((os.path.relpath(p, post),
                                      os.path.getsize(p), os.path.getmtime(p)))
            out[part] = tuple(sorted(files))
        return out

    before = snap()
    eng.add([{"text": "my docs fresh note about subsystem 1",
              "source": "my docs/x",
              "embedding": mock_embed("my docs fresh note about subsystem 1")}],
            LATER)
    eng.refresh_lexical_index()
    after = snap()
    changed = {p for p in before if after.get(p) != before[p]}
    assert {unquote(p[len("part="):]) for p in changed} == {"my docs"}
    # and the refreshed index serves the new doc identically to inline
    q = "my docs fresh note about subsystem 1"
    assert _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER,
                               lexical=True)) == _rows(
        hybrid_search(eng, q, k=5, auto_intent=False, now=LATER))


def test_empty_store_refresh_serves_empty_then_resumes(spark, tmp_path):
    """A store that went empty refreshes to an EMPTY index (all
    partitions dropped, empty globals) whose results equal the inline
    build — and the NEXT refresh resumes incremental maintenance when
    documents return (removing the meta would strand maintenance on
    ValueError, the round-5 review finding)."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(12), NOW)
    eng.build_lexical_index()
    eng.delete_by_prefix("corp")
    assert eng.lexical_index_meta() is None  # stale after the delete
    eng.refresh_lexical_index()
    assert eng.lexical_index_meta() is not None  # fresh AND empty
    q = "cache subsystem policy"
    assert _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=NOW,
                               lexical=True)) == _rows(
        hybrid_search(eng, q, k=5, auto_intent=False, now=NOW)) == []
    # stale postings are actually gone from the ACTIVE generation
    idx = eng._dir("_lexical_index")
    assert not [e for e in os.listdir(os.path.join(table_root(idx), "postings"))
                if e.startswith("part=")]
    # documents return: the same refresh path resumes incrementally
    eng.add(_corpus(8), LATER)
    eng.refresh_lexical_index()
    assert eng.lexical_index_meta() is not None
    got = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER,
                              lexical=True))
    assert got == _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=LATER))
    assert got  # the re-added corpus is served


def test_full_indexed_stack_matches_inline(spark, tmp_path):
    """Both serving indexes together — hybrid_search(ann=True,
    lexical=True) — must compose: the lexical branch reads pruned
    postings, the vector branch reads probed IVF cells, and for a
    query restating a stored text the stored row must surface (its
    own cell is probed; exactness within the probed candidate set)."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(120), NOW)
    eng.build_vector_index(cells=8, nprobe=3)
    eng.build_lexical_index()
    assert eng.vector_index_meta() is not None
    assert eng.lexical_index_meta() is not None

    q = "billing note 4: the billing subsystem handles item 4 with policy 4"
    both = hybrid_search(eng, q, k=5, auto_intent=False, now=NOW,
                         ann=True, lexical=True)
    plan = both._jdf.queryExecution().executedPlan().toString()
    # paths get truncated in plan strings — assert on the predicates:
    # term-pruned postings read + cell-pruned IVF candidate read
    assert "In(term" in plan, plan[:3000]
    assert "PartitionFilters: [cell" in plan, plan[:3000]
    assert "split(lower(trim(text" not in plan
    rows = _rows(both)
    # the restated doc is found (ann candidates include its own cell;
    # bm25 served from the index scores it top)
    target = [r.id for r in eng.table("memories").collect()
              if r.text.startswith("billing note 4:")]
    assert target and target[0] in [r[0] for r in rows]
    # the lexical side is exact (same stats), so with the SAME ann
    # candidate set the scores must equal ann-only + inline-bm25
    ann_only = _rows(hybrid_search(eng, q, k=5, auto_intent=False, now=NOW,
                                   ann=True))
    assert rows == ann_only


def test_build_is_atomic_no_partial_state(store):
    """The meta swap is the LAST publish step: a live index always has
    every table present inside its meta-named generation and no
    leftover tmp dirs (a crash mid-build leaves the OLD index intact)."""
    idx = store._dir("_lexical_index")
    root = table_root(idx)
    for sub in ("postings", "doc_stats", "term_idf", "corpus"):
        assert os.path.isdir(os.path.join(root, sub)), sub
    assert os.path.exists(os.path.join(idx, "meta.json"))
    assert not [e for e in os.listdir(idx) if ".tmp-" in e]
    assert not [e for e in os.listdir(os.path.dirname(idx)) if ".tmp-" in e]


def test_refresh_never_disturbs_inflight_readers(spark, tmp_path):
    """THE generation-publishing contract (round-5 review finding): a
    reader that validated freshness and bound its plans to the active
    generation must keep executing correctly — same complete,
    consistent index — even if a mutation + refresh publish a new
    generation before the reader's jobs run. The old in-place
    per-folder swap could rmtree a partition out from under the scan
    or serve NEW postings against OLD globals."""
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(60), NOW)
    eng.build_lexical_index()

    # reader binds plans to the CURRENT generation (as hybrid_search
    # does after its freshness check) but does not execute yet
    stats = eng.lexical_stats(["cache", "subsystem", "policy"])
    expected = sorted(
        (int(r.id), r.term, int(r.tf)) for r in stats["terms"].collect()
    )

    # writer mutates and refreshes TWICE — the reader's generation is
    # retained for one publish, so the first refresh must leave it
    # intact on disk
    eng.add([{"text": "fresh cache fact", "source": "corp/cache",
              "embedding": mock_embed("fresh cache fact")}], LATER)
    eng.refresh_lexical_index()

    got = sorted((int(r.id), r.term, int(r.tf)) for r in stats["terms"].collect())
    assert got == expected  # old generation: identical rows, no crash
    idf_rows = stats["term_idf"].collect()  # globals still consistent
    assert idf_rows and all(r.idf is not None for r in idf_rows)

    # and a NEW reader sees the refreshed corpus
    fresh = eng.lexical_stats(["fresh"])
    assert fresh["terms"].count() >= 1


def test_generations_are_garbage_collected(spark, tmp_path):
    """The active generation plus the last GEN_RETAIN displaced ones
    survive a publish (round-6: one-publish retention re-created the
    FILE_NOT_EXIST class one refresh further out — see
    test_reader_survives_multiple_refreshes in test_ann_serving.py);
    generations older than the backstop and crashed tmp dirs are
    pruned, so a refresh burst never grows the index dir unboundedly."""
    from memories_spark.operators.ann_index import GEN_RETAIN
    from memories_spark.operators.lexical_index import read_meta

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(24), NOW)
    eng.build_lexical_index()
    idx = eng._dir("_lexical_index")
    seen: list[str] = [read_meta(idx)["gen"]]
    for i in range(GEN_RETAIN + 3):
        eng.add([{"text": f"gc probe {i}", "source": "corp/cache",
                  "embedding": mock_embed(f"gc probe {i}")}], LATER)
        eng.refresh_lexical_index()
        seen.append(read_meta(idx)["gen"])
        gens = [e for e in os.listdir(idx) if e.startswith("g-")]
        assert len(gens) <= GEN_RETAIN + 1, gens
    gens = {e for e in os.listdir(idx) if e.startswith("g-")}
    assert read_meta(idx)["gen"] in gens
    # the earliest generations fell past the backstop and were pruned
    assert seen[0] not in gens and seen[1] not in gens
    # retention is exactly meta: active + recorded prev_gens
    meta = read_meta(idx)
    assert gens == {meta["gen"], *meta["prev_gens"]}
    assert not [e for e in os.listdir(idx) if ".tmp-" in e]


def test_concurrent_searches_race_refresh_soak(spark, tmp_path):
    """Soak the serving consistency contract under REAL concurrency:
    searcher threads run indexed searches while the writer mutates
    the store and refreshes both indexes. Every search must complete
    without error and return exactly a PRE-state or POST-state result
    set: pre-snapshot+pre-index, post-corpus inline (the stale window
    between mutation and publish) or post-corpus+post-index. A torn
    combination — old index stats scored against the new corpus, a
    partition rmtree'd mid-scan, a half-materialized corpus cache —
    would crash or produce a result outside the set (this test caught
    exactly that before the snapshot/meta version-pairing landed)."""
    import threading

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(60), NOW)
    eng.build_vector_index(cells=4, nprobe=2)
    eng.build_lexical_index()

    q = "cache subsystem policy"

    def run_search():
        return tuple(_rows(hybrid_search(eng, q, k=5, auto_intent=False,
                                         now=LATER, ann=True, lexical=True)))

    pre = run_search()

    results: list = []
    errors: list = []
    start = threading.Barrier(4)

    def searcher():
        start.wait()
        for _ in range(3):
            try:
                results.append(run_search())
            except Exception as e:  # noqa: BLE001 — the soak records it
                errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    start.wait()  # writer races the searchers from here
    eng.add([{"text": "brand new cache policy doc", "source": "corp/cache",
              "embedding": mock_embed("brand new cache policy doc")}], LATER)
    eng.refresh_vector_index()
    eng.refresh_lexical_index()
    for t in threads:
        t.join()

    # post states are deterministic on the settled store, so computing
    # them AFTER the race still names exactly what racing readers were
    # allowed to see
    post_indexed = run_search()
    post_inline = tuple(_rows(hybrid_search(eng, q, k=5, auto_intent=False,
                                            now=LATER)))
    allowed = {pre, post_indexed, post_inline}

    assert errors == [], errors
    bad = [r for r in results if r not in allowed]
    assert not bad, f"{len(bad)} torn result sets: {bad[:2]} allowed={allowed}"


def test_prefix_scoped_searches_race_mutations_soak(spark, tmp_path):
    """Round-5 judge finding: prefix-scoped search read raw parquet
    per call — no version-keyed snapshot, no retry against racing
    partition rewrites — so a delete rewriting the prefix's partition
    mid-scan could kill the search with FILE_NOT_EXIST. Prefix
    searches now serve off the SAME engine-scoped snapshot as the
    unprefixed path; this soak races searcher threads against a
    partition-rewriting delete and requires every search to complete
    and return exactly the pre- or post-state answer."""
    import threading

    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(_corpus(60), NOW)
    victim = eng.table("memories").filter(
        F.col("source") == "corp/cache"
    ).orderBy("id").first().id

    q = "cache subsystem policy"

    def run_search():
        return tuple(_rows(hybrid_search(eng, q, k=5, auto_intent=False,
                                         now=LATER, source_prefix="corp/cache")))

    pre = run_search()

    results: list = []
    errors: list = []
    start = threading.Barrier(4)

    def searcher():
        start.wait()
        for _ in range(3):
            try:
                results.append(run_search())
            except Exception as e:  # noqa: BLE001 — the soak records it
                errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    start.wait()  # the delete REWRITES corp/cache's partition mid-race
    eng.delete([victim], LATER)
    for t in threads:
        t.join()

    post = run_search()
    allowed = {pre, post}
    assert errors == [], errors
    bad = [r for r in results if r not in allowed]
    assert not bad, f"{len(bad)} torn prefix results: {bad[:2]} allowed={allowed}"
    assert victim not in {i for i, _, _ in post}


def test_prefix_search_shares_engine_snapshot(store):
    """Sequential prefix-scoped searches must reuse the engine's ONE
    version-keyed snapshot — not rebuild a per-call corpus scan (the
    round-5 hot-path finding: real tenants always scope, and the old
    per-call cache re-scanned parquet on every call)."""
    from memories_spark.search import release_caches

    df = hybrid_search(store, "cache subsystem policy", k=5,
                       auto_intent=False, now=LATER, source_prefix="corp/cache")
    df.collect()
    release_caches(df)
    snap_before = store._snap_cur
    assert snap_before is not None, "prefix search did not take a snapshot"

    sc = store.spark.sparkContext
    before = {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}
    for _ in range(3):
        df = hybrid_search(store, "cache subsystem policy", k=5,
                           auto_intent=False, now=LATER,
                           source_prefix="corp/cache")
        df.collect()
        release_caches(df)
    assert store._snap_cur is snap_before, "prefix searches rebuilt the snapshot"
    after = {int(i.id()) for i in sc._jsc.sc().getRDDStorageInfo()}
    leaked = after - before
    assert not leaked, f"prefix searches leaked storage blocks: {sorted(leaked)}"
