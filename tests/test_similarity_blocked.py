"""topk_cosine_blocked: the no-broadcast novelty join for large
query sets (multiprobe sign-LSH blocking; see
operators/similarity.py). Identical vectors MUST be found (same
bucket by construction) and near neighbors one hyperplane away are
recovered by the Hamming-1 multiprobe — the properties smart import
relies on for duplicate / replace classification."""

from __future__ import annotations

from pyspark.sql import functions as F

from memories_spark.extraction import EMBED_DIM, mock_embed
from memories_spark.operators.similarity import topk_cosine, topk_cosine_blocked


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, mock_embed(t)) for i, t in enumerate(texts)],
        "vec_id long, embedding array<float>",
    )


def _queries(spark, texts, offset=1000):
    return spark.createDataFrame(
        [(offset + i, mock_embed(t)) for i, t in enumerate(texts)],
        "query_id long, query_vec array<float>",
    )


def test_identical_vectors_always_found(spark):
    """An exact duplicate shares its bucket deterministically, so the
    blocked join finds it with sim == 1.0 regardless of plane count."""
    texts = [f"fact {i} about service {i % 5}" for i in range(40)]
    corpus = _corpus(spark, texts)
    queries = _queries(spark, [texts[7], texts[23], "a wholly novel fact"])
    hits = {
        int(r.query_id): r
        for r in topk_cosine_blocked(
            corpus, queries, k=1, dim=EMBED_DIM, exclude_self=False
        ).collect()
    }
    assert int(hits[1000].vec_id) == 7 and float(hits[1000].sim) == 1.0
    assert int(hits[1001].vec_id) == 23 and float(hits[1001].sim) == 1.0
    # the novel query may or may not have a co-bucketed neighbor; if it
    # does, the neighbor must be well below the dup threshold
    if 1002 in hits:
        assert float(hits[1002].sim) < 0.95


def test_blocked_agrees_with_exact_on_found_pairs(spark):
    """Every (query, neighbor, sim) the blocked join emits must carry
    the SAME similarity the exact broadcast join computes — blocking
    only prunes candidates, never changes scores."""
    texts = [f"note {i} pattern {i % 3}" for i in range(30)]
    corpus = _corpus(spark, texts)
    queries = _queries(spark, [texts[4], texts[9], texts[14], "other thing"])
    exact = {
        (int(r.query_id), int(r.vec_id)): float(r.sim)
        for r in topk_cosine(
            corpus, queries, k=30, exclude_self=False
        ).collect()
    }
    blocked = topk_cosine_blocked(
        corpus, queries, k=5, dim=EMBED_DIM, exclude_self=False
    ).collect()
    assert blocked  # the three duplicated queries guarantee hits
    for r in blocked:
        assert exact[(int(r.query_id), int(r.vec_id))] == float(r.sim)


def test_blocked_join_is_an_equi_join(spark):
    """Plan gate: the blocked join must compile to an EQUI-join on
    the bucket key — never a CartesianProduct / BroadcastNestedLoopJoin
    (which would silently reintroduce the |Q|x|C| scan the blocking
    exists to avoid)."""
    corpus = _corpus(spark, [f"fact {i}" for i in range(10)])
    queries = _queries(spark, ["fact 1", "fact 2"])
    plan = (
        topk_cosine_blocked(corpus, queries, k=1, dim=EMBED_DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multiprobe_dedups_pairs_and_ranks_deterministically(spark):
    """A pair co-occurring in several probed buckets must appear ONCE,
    and ranks are dense 1..k with id-ASC tie-breaks."""
    texts = [f"alpha {i}" for i in range(12)]
    corpus = _corpus(spark, texts)
    # duplicate corpus vectors: query equals rows 0 and 6 (ties)
    queries = _queries(spark, [texts[0]])
    dup_corpus = corpus.union(
        corpus.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 100).alias("vec_id"), "embedding"
        )
    )
    rows = topk_cosine_blocked(
        dup_corpus, queries, k=3, dim=EMBED_DIM, exclude_self=False
    ).collect()
    got = [(int(r.vec_id), int(r.rank)) for r in sorted(rows, key=lambda r: r.rank)]
    assert len(got) == len({v for v, _ in got})  # no duplicate neighbors
    # rank 1 and 2 are the two identical vectors, id ASC
    assert got[0] == (0, 1) and got[1] == (100, 2)
