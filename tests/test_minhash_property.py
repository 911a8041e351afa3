"""Property-based MinHash parity: the Spark sketch/LSH pipeline vs an
independent pure-Python model on random tiny corpora.

Everything is md5-based and deterministic, so the comparison is exact:
signatures are per-seed minima of the first 60 bits of
md5("<seed>:<token>") as integers (the fixed-width form the operator
aggregates), est_sim is the fraction of matching signature positions,
and the LSH banding must surface every pair that agrees on at least
one band — for pairs it does surface, the estimate must equal the
model's.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from memories_spark.operators import dedup as dedup_op

VOCAB = ["red", "green", "blue", "cyan", "teal", "plum"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6),
    min_size=2,
    max_size=6,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def model_signature(tokens: list[str]) -> list[int]:
    distinct = list(dict.fromkeys(tokens))
    return [
        min(_h60(f"{seed}:{t}") for t in distinct)
        for seed in range(dedup_op.NUM_HASHES)
    ]


def model_pairs(corpus: list[list[str]]) -> dict[tuple[int, int], float]:
    sigs = {i: model_signature(doc) for i, doc in enumerate(corpus)}
    out: dict[tuple[int, int], float] = {}
    n_bands = dedup_op.NUM_HASHES // dedup_op.BAND_ROWS
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            sa, sb = sigs[a], sigs[b]
            shares_band = any(
                sa[i * dedup_op.BAND_ROWS : (i + 1) * dedup_op.BAND_ROWS]
                == sb[i * dedup_op.BAND_ROWS : (i + 1) * dedup_op.BAND_ROWS]
                for i in range(n_bands)
            )
            if shares_band:
                matches = sum(x == y for x, y in zip(sa, sb))
                out[(a, b)] = matches / dedup_op.NUM_HASHES
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_minhash_pairs_match_model(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["est_sim"]
        for r in dedup_op.minhash_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert got == model_pairs(corpus)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_group_first_victims_match_pairwise_model(spark, corpus):
    """The group-first victim selection (which never builds the pair
    list) must equal the larger-id-of-each-qualifying-pair set from
    the pairwise model."""
    docs = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)], "doc_id long, text string"
    )
    got = sorted(
        r["victim_id"]
        for r in dedup_op.minhash_dedup_victims(docs, "doc_id", "text", 0.75).collect()
    )
    want = sorted({b for (a, b), est in model_pairs(corpus).items() if est >= 0.75})
    assert got == want
