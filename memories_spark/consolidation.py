"""Consolidation sweep: find redundant memory clusters and merge them.

Twin of the reference's consolidation module
(/root/reference/consolidator.py):

- :func:`find_clusters` — the seed-scan greedy (consolidator.py:36-124):
  iterate candidate memories in id order, run one full hybrid search
  per unclustered seed, and group hits scoring ``rrf_score >= 0.75``
  into the seed's cluster; accepted clusters CONSUME their members
  (later seeds skip them). Candidates are capped at 500 per sweep to
  prevent O(n) query storms (:72-79).
- :func:`dominant_category` / :func:`infer_project` — cluster labeling
  grammar (:126-143).
- :func:`consolidation_sweep` — find + merge loop returning the
  reference's per-cluster report shape (:146-218); the merge itself is
  :func:`memories_spark.extraction.consolidate_cluster` (``engine.merge``
  archives originals with supersedes links — the auditable form of the
  reference's delete-and-re-add).

Scale stance: the sweep IS the reference's maintenance job — a
driver-side loop bounded by ``max_candidates``, where each iteration's
hybrid search is fully distributed. The uncapped 100 TB path is the
all-pairs form: ``embedding_near_dups`` (LSH-blocked similarity join)
+ ``label_propagation_clusters`` find every cluster in one shuffle
instead of 500 sequential searches; this module exists for parity with
the reference's exact greedy semantics (seed order, consumption,
rrf threshold), which the join form intentionally relaxes.

Determinism deviation (documented): the reference caps with
``random.sample`` (irreproducible); we take the ``max_candidates``
smallest ``md5(id)`` values — the same deterministic pseudo-random
spread the IVF seed picker uses — and keep id iteration order.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memories_spark.engine import MemoriesEngine
from memories_spark.search import hybrid_search, release_caches

#: categories on the longer prune threshold AND the consolidation
#: prompt's long-lived set (consolidator.py:26)
LONG_LIVED_CATEGORIES = {"decision", "learning"}


def dominant_category(cluster: list[dict]) -> str:
    """Most common category in a cluster, defaulting to ``detail``
    (consolidator.py:126-130; the distributed form over all clusters
    at once is the ``dominant_category_mode`` registry query)."""
    cats = [m.get("category") or "detail" for m in cluster]
    return Counter(cats).most_common(1)[0][0]


def infer_project(cluster: list[dict]) -> str:
    """Best-effort project name from cluster sources
    (consolidator.py:133-143): first source with a non-empty LAST path
    segment wins; else a non-empty first segment; else ``unknown``."""
    sources = [m.get("source") or "" for m in cluster]
    for s in sources:
        parts = s.split("/")
        if len(parts) > 1 and parts[-1]:
            return parts[-1]
        if parts and parts[0]:
            return parts[0]
    return "unknown"


def find_clusters(
    engine: MemoriesEngine,
    source_prefix: str = "",
    similarity_threshold: float = 0.75,
    min_cluster_size: int = 3,
    max_candidates: int = 500,
    k: int = 10,
    **search_kwargs,
) -> list[list[dict]]:
    """Group memories into semantic clusters by seed-scan greedy
    (reference find_clusters, consolidator.py:36-124).

    For each candidate (id order) not already clustered: run ONE full
    :func:`hybrid_search` (k=10, prefix-scoped when the sweep is),
    pull in hits with ``rrf_score >= similarity_threshold`` that are
    not yet clustered, and accept the cluster when it reaches
    ``min_cluster_size`` — accepted members are consumed, so clusters
    are disjoint and seed order matters (the reference's semantics,
    kept exactly). ``max_candidates > 0`` caps the scan with a
    deterministic md5(id) sample (:72-79; see the module note on the
    ``random.sample`` deviation).

    Returns clusters as lists of dicts (id, text, source, category,
    rrf_score — the seed carries rrf_score None), largest seed-order
    first like the reference's append order.

    Reference quirk, kept faithfully: the threshold compares against
    the RAW ``rrf_score`` (consolidator.py:105-108), whose ceiling is
    sum(weights)/(rrf_k+1) ~= 0.016 — so the reference's 0.75 default
    can never admit a hybrid hit and the sweep finds nothing until the
    caller passes an RRF-scaled threshold (the engine's separate
    ``find_similar_clusters`` cosine path is where 0.75-style values
    are meaningful). Pinned in tests/test_consolidation.py."""
    base = engine.serving_memories()
    if source_prefix:
        base = base.filter(F.col("source").startswith(source_prefix))
    cand_df = base.select("id", "text", "source", "category")
    if max_candidates > 0:
        # deterministic cap: smallest md5(id) spread, scanned in id order
        cand_df = (
            cand_df.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
            .limit(max_candidates)
        )
    candidates = sorted(cand_df.collect(), key=lambda r: int(r.id))
    if not candidates:
        return []

    clustered: set[int] = set()
    clusters: list[list[dict]] = []
    for seed in candidates:
        seed_id = int(seed.id)
        if seed_id in clustered:
            continue
        kwargs = dict(search_kwargs)
        if source_prefix:
            kwargs.setdefault("source_prefix", source_prefix)
        sdf = hybrid_search(engine, seed.text or "", k=k, **kwargs)
        hits = sdf.select("id", "text", "source", "rrf_score").collect()
        release_caches(sdf)

        cluster = [
            {
                "id": seed_id,
                "text": seed.text,
                "source": seed.source,
                "category": seed.category,
                "rrf_score": None,
            }
        ]
        ids = {seed_id}
        for h in hits:
            hid = int(h.id)
            if hid == seed_id or hid in clustered or hid in ids:
                continue
            # rrf_score is the similarity proxy — it's what
            # hybrid_search ranks by (consolidator.py:105-108)
            if float(h.rrf_score) >= similarity_threshold:
                cluster.append(
                    {
                        "id": hid,
                        "text": h.text,
                        "source": h.source,
                        "category": None,
                        "rrf_score": float(h.rrf_score),
                    }
                )
                ids.add(hid)
        if len(cluster) >= min_cluster_size:
            clusters.append(cluster)
            clustered.update(ids)

    # reference hits carry full metadata including category
    # (consolidator.py appends the hit dicts straight into the
    # cluster, :109-112), and _dominant_category reads it — backfill
    # the non-seed members' categories with ONE batched lookup so
    # cluster labels reflect the members, not a detail default
    # (round-7 review finding)
    member_ids = sorted(
        {int(m["id"]) for c in clusters for m in c if m["category"] is None}
    )
    if member_ids:
        cats = {
            int(r.id): r.category
            for r in base.select("id", "category")
            .filter(F.col("id").isin(member_ids))
            .collect()
        }
        for c in clusters:
            for m in c:
                if m["category"] is None:
                    m["category"] = cats.get(int(m["id"]))
    return clusters


def find_prune_candidates(
    engine: MemoriesEngine,
    now: str,
    detail_days: int = 60,
    decision_days: int = 120,
) -> DataFrame:
    """Stale, never-retrieved memories eligible for pruning (reference
    find_prune_candidates, consolidator.py:221-278): anti-join the
    corpus against the retrieval log (never retrieved), then keep rows
    older than their category's threshold — ``decision``/``learning``
    get the longer ``decision_days`` (:26, :257-263), everything else
    (including null category → ``detail``) ``detail_days``. Age is
    whole elapsed days, ``floor((now - created_at) / 86400)`` — the
    reference's ``timedelta.days``, NOT calendar-date diff (a
    23-hour-old memory is 0 days old). Returns a DataFrame
    (id, source, category, created_at, age_days) ordered by id — the
    set-based form of the reference's driver loop; the synthetic-table
    twin with a DuckDB oracle is the ``prune_candidates`` registry
    query."""
    mem = engine.serving_memories()
    retrieved = (
        engine.table("retrieval_log")
        .select(F.col("memory_id").alias("id"))
        .distinct()
    )
    now_col = F.lit(now).cast("timestamp")
    age_days = F.floor(
        (F.unix_timestamp(now_col) - F.unix_timestamp(F.col("created_at")))
        / F.lit(86400)
    )
    long_lived = F.lower(F.coalesce(F.col("category"), F.lit("detail"))).isin(
        *sorted(LONG_LIVED_CATEGORIES)
    )
    threshold = F.when(long_lived, decision_days).otherwise(detail_days)
    return (
        mem.join(retrieved, "id", "left_anti")
        .filter(F.col("created_at").isNotNull())
        .withColumn("age_days", age_days)
        .filter(F.col("age_days") > threshold)
        .select("id", "source", "category", "created_at", "age_days")
        .orderBy("id")
    )


def consolidation_sweep(
    engine: MemoriesEngine,
    now: str,
    source_prefix: str = "",
    merge_fn=None,
    dry_run: bool = True,
    similarity_threshold: float = 0.75,
    min_cluster_size: int = 3,
    max_candidates: int = 500,
    **search_kwargs,
) -> list[dict]:
    """Full sweep: :func:`find_clusters` then one merge per cluster
    (reference consolidate_cluster, consolidator.py:146-218), returning
    the reference's report rows (merged_count, new_count, old_ids,
    new_texts, dry_run, plus the project/category labels the prompt
    uses).

    ``merge_fn(cluster, project, category) -> list[str]`` plays the
    LLM ``provider.complete`` + JSON-array parse (:181-190); the
    default deterministically keeps the longest member text (a merge
    that drops redundant shorter variants). When ``dry_run`` is False,
    each cluster is applied via
    :func:`memories_spark.extraction.consolidate_cluster` — originals
    archived with supersedes links (one new id per merged text; the
    first text reuses the reference's take-the-first-source rule,
    :202-210)."""
    from memories_spark.extraction import consolidate_cluster

    if merge_fn is None:
        def merge_fn(cluster, project, category):
            keep = max(
                (m.get("text") or "" for m in cluster), key=lambda t: (len(t), t)
            )
            return [keep]

    # one timestamp drives the whole sweep: the searches' reference
    # date and the merge mutations agree unless the caller splits them
    search_kwargs.setdefault("now", now)
    reports: list[dict] = []
    clusters = find_clusters(
        engine,
        source_prefix=source_prefix,
        similarity_threshold=similarity_threshold,
        min_cluster_size=min_cluster_size,
        max_candidates=max_candidates,
        **search_kwargs,
    )
    for cluster in clusters:
        project = infer_project(cluster)
        category = dominant_category(cluster)
        new_texts = [str(t) for t in merge_fn(cluster, project, category)]
        old_ids = [int(m["id"]) for m in cluster]
        new_ids: list[int] = []
        if not dry_run and new_texts:
            # first merged text archives + supersedes the originals;
            # any further texts (the reference allows 1-2) are plain
            # adds under the same take-the-first source (:202-210)
            nid = consolidate_cluster(engine, old_ids, new_texts[0], now)
            if nid is not None:
                new_ids.append(nid)
                src = cluster[0].get("source") or "consolidated"
                for text in new_texts[1:]:
                    new_ids.extend(
                        engine.add([{"text": text, "source": src}], now)
                    )
        reports.append(
            {
                "merged_count": len(cluster),
                "new_count": len(new_texts),
                "old_ids": old_ids,
                "new_texts": new_texts,
                "new_ids": new_ids,
                "project": project,
                "category": category,
                "dry_run": dry_run,
            }
        )
    return reports
