"""Consolidation sweep (reference consolidator.py) — seed-scan greedy
clustering, labeling grammar, merge application."""

from __future__ import annotations

from memories_spark.consolidation import (
    consolidation_sweep,
    dominant_category,
    find_clusters,
    infer_project,
)
from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed

NOW = "2024-06-01 12:00:00"

#: RRF-scaled threshold: raw rrf scores top out near sum(w)/(60+1);
#: on this corpus the postgres trio ranks 1-3 (>= 0.014286) and the
#: redis row ranks 4 (0.014063), so the cut sits between those ranks
_T = 0.0142


def _rec(text, source, **kw):
    return {"text": text, "source": source, "embedding": mock_embed(text), **kw}


def _seed(spark, tmp_path, name="cstore"):
    eng = MemoriesEngine(spark, str(tmp_path / name))
    eng.add(
        [
            _rec("we chose postgres for the primary database", "proj/app",
                 category="decision"),                                         # 0
            _rec("we chose postgres for the main database", "proj/app",
                 category="decision"),                                         # 1
            _rec("postgres chosen for the primary database", "proj/app",
                 category="decision"),                                         # 2
            _rec("redis handles the cache eviction policy", "proj/app"),      # 3
            _rec("completely unrelated grocery run notes", "home/misc"),      # 4
        ],
        NOW,
    )
    return eng


def test_labeling_grammar():
    """_dominant_category (most common, default detail) and
    _infer_project (last non-empty path segment, else first, else
    unknown) — consolidator.py:126-143."""
    cluster = [
        {"category": "decision", "source": "claude-code/memories"},
        {"category": "decision", "source": ""},
        {"category": None, "source": "solo"},
    ]
    assert dominant_category(cluster) == "decision"
    assert dominant_category([{"category": None, "source": ""}]) == "detail"
    assert infer_project(cluster) == "memories"
    assert infer_project([{"source": "solo"}]) == "solo"
    assert infer_project([{"source": ""}]) == "unknown"


def test_find_clusters_greedy_consumption(spark, tmp_path):
    """The postgres trio clusters off the first seed; consumed members
    never seed or join a second cluster, and sub-threshold rows stay
    out (consolidator.py:84-118)."""
    eng = _seed(spark, tmp_path)
    clusters = find_clusters(
        eng, similarity_threshold=_T, min_cluster_size=3,
        auto_intent=False, now=NOW,
    )
    assert len(clusters) == 1
    ids = sorted(m["id"] for m in clusters[0])
    assert ids == [0, 1, 2]
    # seed carries no score; members carry the rrf proxy
    by_id = {m["id"]: m for m in clusters[0]}
    assert by_id[0]["rrf_score"] is None
    assert all(by_id[i]["rrf_score"] >= _T for i in (1, 2))
    # members carry their REAL categories (reference hits carry full
    # metadata), so dominant_category labels the cluster honestly
    assert [by_id[i]["category"] for i in (0, 1, 2)] == ["decision"] * 3
    assert dominant_category(clusters[0]) == "decision"


def test_find_clusters_reference_default_threshold_is_dormant(spark, tmp_path):
    """Pin the reference quirk (consolidator.py:105-108): the 0.75
    default compares against RAW rrf scores (ceiling ~sum(w)/61), so
    no hybrid hit can ever pass — the sweep returns no clusters."""
    eng = _seed(spark, tmp_path)
    assert find_clusters(eng, auto_intent=False, now=NOW) == []


def test_find_clusters_min_size_and_prefix(spark, tmp_path):
    """min_cluster_size gates acceptance; a source_prefix scopes both
    the candidate set and every seed search (consolidator.py:61-67,
    93-96)."""
    eng = _seed(spark, tmp_path)
    assert (
        find_clusters(eng, similarity_threshold=_T, min_cluster_size=4,
                      auto_intent=False, now=NOW)
        == []
    )
    scoped = find_clusters(
        eng, source_prefix="home/", similarity_threshold=_T,
        min_cluster_size=1, auto_intent=False, now=NOW,
    )
    assert {m["id"] for c in scoped for m in c} == {4}


def test_find_clusters_cap_is_deterministic(spark, tmp_path):
    """max_candidates caps the scan with a reproducible md5(id) sample
    (the documented random.sample deviation): two runs agree."""
    eng = _seed(spark, tmp_path)

    def run():
        return [
            sorted(m["id"] for m in c)
            for c in find_clusters(
                eng, similarity_threshold=_T, min_cluster_size=1,
                max_candidates=2, auto_intent=False, now=NOW,
            )
        ]

    first = run()
    assert first == run()
    assert len(first) <= 2  # at most one cluster per scanned seed


def test_consolidation_sweep_applies_merge(spark, tmp_path):
    """dry_run=False merges each cluster: one new memory supersedes
    the originals (archived, linked), and the report carries the
    reference fields (consolidator.py:146-218)."""
    eng = _seed(spark, tmp_path)
    reports = consolidation_sweep(
        eng, NOW, dry_run=False, similarity_threshold=_T,
        min_cluster_size=3, auto_intent=False,
    )
    assert len(reports) == 1
    rep = reports[0]
    assert rep["merged_count"] == 3 and rep["new_count"] == 1
    assert sorted(rep["old_ids"]) == [0, 1, 2]
    assert rep["project"] == "app" and rep["dry_run"] is False
    assert rep["category"] == "decision"  # from the members, not default
    [new_id] = rep["new_ids"]
    rows = {r.id: r for r in eng.table("memories").collect()}
    assert rows[new_id].text == rep["new_texts"][0]
    for old in rep["old_ids"]:
        assert rows[old].archived
    links = {
        (r.from_id, r.to_id)
        for r in eng.table("links").collect()
        if r.type == "supersedes"
    }
    assert links >= {(new_id, 0), (new_id, 1), (new_id, 2)}


def test_consolidation_sweep_dry_run_mutates_nothing(spark, tmp_path):
    eng = _seed(spark, tmp_path)
    before = eng.count()
    reports = consolidation_sweep(
        eng, NOW, dry_run=True, similarity_threshold=_T,
        min_cluster_size=3, auto_intent=False,
    )
    assert reports and reports[0]["dry_run"] is True
    assert reports[0]["new_ids"] == []
    assert eng.count() == before


def test_find_prune_candidates_thresholds(spark, tmp_path):
    """Never-retrieved memories past their category threshold
    (consolidator.py:221-278): decision/learning get decision_days,
    everything else detail_days; a retrieved row never prunes; age is
    whole elapsed days (timedelta.days), not calendar-date diff."""
    from memories_spark.consolidation import find_prune_candidates

    eng = MemoriesEngine(spark, str(tmp_path / "pstore"))
    eng.add(
        [
            # 0: detail, 70 days old -> prune (70 > 60)
            _rec("old detail", "proj/a"),
            # 1: decision, 70 days old -> keep (70 < 120)
            _rec("old decision", "proj/a", category="decision"),
            # 2: learning, 130 days old -> prune
            _rec("ancient learning", "proj/a", category="learning"),
            # 3: detail, 70 days old but RETRIEVED -> keep
            _rec("old but used", "proj/a"),
        ],
        "2024-01-01 00:00:00",
    )
    # every row's created_at is 2024-01-01; ages derive from `now`
    eng.log_retrieval([(3, 1)], "2024-01-02 00:00:00", "q")

    now = "2024-05-10 00:00:00"  # 130 days after creation
    out = find_prune_candidates(eng, now, detail_days=60, decision_days=120)
    ids = [int(r.id) for r in out.collect()]
    # at 130 days: detail 0 prunes (>60), decision 1 and learning 2
    # prune (>120); retrieved row 3 never prunes
    assert ids == [0, 1, 2]

    # tighter window: only detail rows pass (decision threshold not met)
    out2 = find_prune_candidates(eng, "2024-03-11 00:00:00",
                                 detail_days=60, decision_days=120)
    ids2 = [int(r.id) for r in out2.collect()]
    assert ids2 == [0]  # 70 days: detail prunes, decision/learning keep

    # sub-day ages floor to 0 days (timedelta.days semantics)
    out3 = find_prune_candidates(eng, "2024-01-01 23:00:00",
                                 detail_days=0, decision_days=120)
    assert [int(r.id) for r in out3.collect()] == []
