"""Retrieval-quality harness: LongMemEval-style session-level R@5.

Twin of the reference's LongMemEval adapter
(/root/reference/eval/longmemeval.py:255-307 ``compute_recall_at_k``):
sessions are chunked into multiple memories, retrieval ranks chunks,
results deduplicate to unique sessions in rank order, and R@5 asks
whether the gold session appears among the top-5 unique sessions.

Here the Q->gold corpus is seeded deterministically from the
``documents`` table so the whole metric is a replayable (Spark plan,
DuckDB oracle) pair: each question is the 8-token prefix of a gold
document, documents are chunked into 30-token windows (the "session
chunking"), and the retrieval model is word-bigram overlap — the
rank signal is fully order-independent (integer hit counts, id
tie-breaks), so the oracle replays it exactly. The end-to-end
hybrid-search twin of this metric (full BM25+vector+RRF stack over
an engine store) lives in tests/test_longmemeval.py with a pinned
recall floor.

Scale shape: the query set is tiny (Q x 7 bigrams — broadcast);
the chunk-bigram table is corpus-sized but grouped per (doc, chunk)
with a map-side distinct; the join is broadcast, never a shuffle of
the corpus against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

_CORPUS_N = 200   # sessions (documents) in the haystack
_Q_N = 20         # questions = gold docs 0..19
_CHUNK = 30       # tokens per chunk ("session chunking")
_QTOK = 8         # question = first 8 tokens of the gold doc
_MAX_CHUNKS = 32  # per-doc chunk cap — pinned on BOTH engines so the
                  # parity holds for docs longer than 960 tokens

_LME_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < {_CORPUS_N}
),
queries AS (
  SELECT doc_id AS qid, list_slice(toks, 1, {_QTOK}) AS qt
  FROM docs WHERE doc_id < {_Q_N} AND len(toks) >= {_QTOK}
),
qpos AS (SELECT unnest(range(1, {_QTOK})) AS i),
qbig AS (
  SELECT DISTINCT qid, qt[i] || ' ' || qt[i+1] AS bg
  FROM queries CROSS JOIN qpos WHERE i + 1 <= len(qt)
),
cpos AS (SELECT unnest(range(0, {_MAX_CHUNKS})) AS c),
chunks AS (
  SELECT doc_id, c,
         list_slice(toks, c*{_CHUNK}+1, least((c+1)*{_CHUNK}, len(toks))) AS ct
  FROM docs CROSS JOIN cpos WHERE c*{_CHUNK} < len(toks)
),
bpos AS (SELECT unnest(range(1, {_CHUNK})) AS i),
cbig AS (
  SELECT DISTINCT doc_id, c, ct[i] || ' ' || ct[i+1] AS bg
  FROM chunks CROSS JOIN bpos WHERE i + 1 <= len(ct)
),
hits AS (
  SELECT q.qid, cb.doc_id, cb.c, count(DISTINCT cb.bg) AS h
  FROM qbig q JOIN cbig cb ON q.bg = cb.bg
  GROUP BY q.qid, cb.doc_id, cb.c
),
sess AS (
  SELECT qid, doc_id, max(h) AS score FROM hits GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rk
  FROM sess
)
SELECT q.qid,
       CAST(r.rk AS BIGINT) AS gold_rank,
       CAST(CASE WHEN coalesce(r.rk, 999) <= 5 THEN 1 ELSE 0 END AS BIGINT) AS recall_at5
FROM (SELECT DISTINCT qid FROM queries) q
LEFT JOIN ranked r ON r.qid = q.qid AND r.doc_id = q.qid
ORDER BY q.qid
"""


@register(
    "longmemeval_recall_at5",
    oracle=_LME_ORACLE,
    bench=True,
    doc="LongMemEval-style session-level recall@5 (reference "
    "eval/longmemeval.py:255-307): 20 seeded questions (8-token "
    "gold-doc prefixes) against a 200-session haystack chunked into "
    "30-token memories; chunks rank by distinct word-bigram overlap "
    "(integer hit counts — order-independent), results collapse to "
    "unique sessions by best chunk, and each question reports the "
    "gold session's rank and whether it lands in the top 5. The "
    "query-side tables (Q x 7 bigrams) broadcast; the corpus-sized "
    "chunk-bigram table never self-joins.",
    tags=("eval", "retrieval", "text"),
)
def longmemeval_recall_at5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < _CORPUS_N)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    queries = (
        docs.filter((F.col("doc_id") < _Q_N) & (F.size("toks") >= _QTOK))
        .select(F.col("doc_id").alias("qid"), F.slice("toks", 1, _QTOK).alias("qt"))
    )
    # guarded: sequence(1, 0) would be the DESCENDING [1, 0] on a
    # 1-token input and element_at(c, 2) then throws (short-doc family)
    bigrams = (
        "CASE WHEN size({c}) >= 2 THEN transform(sequence(1, size({c}) - 1), "
        "i -> concat(element_at({c}, i), ' ', element_at({c}, i + 1))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    qbig = (
        queries.select("qid", F.explode(F.expr(bigrams.format(c="qt"))).alias("bg"))
        .distinct()
    )
    chunks = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(
                        (F.ceil(F.size("toks") / F.lit(float(_CHUNK)))).cast("int") - 1,
                        F.lit(_MAX_CHUNKS - 1),
                    ),
                )
            ).alias("c"),
            "toks",
        )
        .select(
            "doc_id", "c",
            F.expr(f"slice(toks, c * {_CHUNK} + 1, {_CHUNK})").alias("ct"),
        )
        .filter(F.size("ct") >= 2)
    )
    cbig = (
        chunks.select("doc_id", "c", F.explode(F.expr(bigrams.format(c="ct"))).alias("bg"))
        .distinct()
    )
    hits = (
        cbig.join(F.broadcast(qbig), "bg")
        .groupBy("qid", "doc_id", "c")
        .agg(F.countDistinct("bg").alias("h"))
    )
    sess = hits.groupBy("qid", "doc_id").agg(F.max("h").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = sess.withColumn("rk", F.row_number().over(w))
    qids = queries.select("qid").distinct()
    gold = ranked.filter(F.col("doc_id") == F.col("qid")).select(
        "qid", F.col("rk").cast("long").alias("gold_rank")
    )
    return (
        qids.join(gold, "qid", "left")
        .select(
            "qid",
            "gold_rank",
            F.when(F.coalesce(F.col("gold_rank"), F.lit(999)) <= 5, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("recall_at5"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------
# MuSiQue-style multi-hop support-chain recall
# ---------------------------------------------------------------------

_MH_HOP = 150      # chain: gold doc q -> q+150 -> q+300
_MH_CORPUS = 500   # documents table is a fixed 500-doc corpus

_MH_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < {_MH_CORPUS}
),
queries AS (
  SELECT doc_id AS qid, list_slice(toks, 1, {_QTOK}) AS qt
  FROM docs WHERE doc_id < {_Q_N} AND len(toks) >= {_QTOK}
),
qpos AS (SELECT unnest(range(1, {_QTOK})) AS i),
qbig AS (
  SELECT DISTINCT qid, qt[i] || ' ' || qt[i+1] AS bg
  FROM queries CROSS JOIN qpos WHERE i + 1 <= len(qt)
),
dpos AS (SELECT unnest(range(1, 200)) AS i),
dbig AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] AS bg
  FROM docs CROSS JOIN dpos WHERE i + 1 <= len(toks)
),
hits AS (
  SELECT q.qid, db.doc_id, CAST(count(DISTINCT db.bg) AS BIGINT) AS h
  FROM qbig q JOIN dbig db ON q.bg = db.bg
  GROUP BY q.qid, db.doc_id
),
-- chain edges per question: qid -> qid+{_MH_HOP} -> qid+{2 * _MH_HOP}
prop AS (
  SELECT qid, doc_id, 4 * h AS s FROM hits
  UNION ALL
  SELECT qid, qid + {_MH_HOP} AS doc_id, 2 * h AS s
  FROM hits WHERE doc_id = qid          -- 1 hop from the gold seed
  UNION ALL
  SELECT qid, qid + {2 * _MH_HOP} AS doc_id, 1 * h AS s
  FROM hits WHERE doc_id = qid          -- 2 hops from the gold seed
),
direct_rank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY h DESC, doc_id ASC) AS rk
  FROM hits
),
graph_rank AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id ASC) AS rk
  FROM (SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS s FROM prop GROUP BY qid, doc_id)
),
chain AS (
  SELECT qid, unnest([qid, qid + {_MH_HOP}, qid + {2 * _MH_HOP}]) AS cdoc
  FROM (SELECT DISTINCT qid FROM queries)
)
SELECT c.qid,
       CAST(count(CASE WHEN d.rk <= 5 THEN 1 END) AS BIGINT) AS chain_at5_direct,
       CAST(count(CASE WHEN g.rk <= 5 THEN 1 END) AS BIGINT) AS chain_at5_graph
FROM chain c
LEFT JOIN direct_rank d ON d.qid = c.qid AND d.doc_id = c.cdoc
LEFT JOIN graph_rank g ON g.qid = c.qid AND g.doc_id = c.cdoc
GROUP BY c.qid
ORDER BY c.qid
"""


@register(
    "musique_multihop_recall",
    oracle=_MH_ORACLE,
    bench=True,
    doc="MuSiQue-style multi-hop support-chain recall@5 (reference "
    "eval/run_musique_graph_eval.py: 2/3-hop chains of supporting "
    "paragraphs wired with related_to links, search scored with and "
    "without graph expansion): each question (8-token gold-doc "
    "prefix) has a 3-doc support chain q -> q+150 -> q+300; direct "
    "retrieval ranks by distinct word-bigram overlap, graph "
    "retrieval adds integer chain-propagated mass (4/2/1 over 0/1/2 "
    "hops — the PPR-decay shape in exact arithmetic); per question "
    "the metric reports how many chain members land in the top-5 "
    "under each mode. The whole metric is replayable: integer hit "
    "counts, integer propagation, id tie-breaks. The end-to-end "
    "hybrid-stack twin (real hybrid_search + links + reserved-slot "
    "merge) lives in tests/test_musique_chains.py with a pinned "
    "with-graph uplift. Scale shape: query bigrams broadcast; the "
    "corpus bigram table never self-joins; propagation is a "
    "3-branch union of the seed hits, not an edge traversal join.",
    tags=("eval", "graph", "retrieval"),
)
def musique_multihop_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < _MH_CORPUS)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    queries = (
        docs.filter((F.col("doc_id") < _Q_N) & (F.size("toks") >= _QTOK))
        .select(F.col("doc_id").alias("qid"), F.slice("toks", 1, _QTOK).alias("qt"))
    )
    # guarded like longmemeval's: dbig runs over UNFILTERED docs, and a
    # <=1-token document would hit the descending sequence(1,0) +
    # element_at out-of-bounds crash (short-doc family)
    bigrams = (
        "CASE WHEN size({c}) >= 2 THEN transform(sequence(1, size({c}) - 1), "
        "i -> concat(element_at({c}, i), ' ', element_at({c}, i + 1))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    qbig = (
        queries.select("qid", F.explode(F.expr(bigrams.format(c="qt"))).alias("bg"))
        .distinct()
    )
    dbig = (
        docs.select("doc_id", F.explode(F.expr(bigrams.format(c="toks"))).alias("bg"))
        .distinct()
    )
    hits = (
        dbig.join(F.broadcast(qbig), "bg")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("bg").cast("long").alias("h"))
        .localCheckpoint(eager=True)  # seeds feed 4 consumers below
    )
    seed = hits.filter(F.col("doc_id") == F.col("qid"))
    prop = (
        hits.select("qid", "doc_id", (F.lit(4) * F.col("h")).alias("s"))
        .unionByName(
            seed.select(
                "qid",
                (F.col("qid") + _MH_HOP).alias("doc_id"),
                (F.lit(2) * F.col("h")).alias("s"),
            )
        )
        .unionByName(
            seed.select(
                "qid",
                (F.col("qid") + 2 * _MH_HOP).alias("doc_id"),
                (F.lit(1) * F.col("h")).alias("s"),
            )
        )
    )
    wd = Window.partitionBy("qid").orderBy(F.desc("h"), F.asc("doc_id"))
    direct_rank = hits.select(
        "qid", "doc_id", F.row_number().over(wd).alias("rk")
    )
    gsum = prop.groupBy("qid", "doc_id").agg(F.sum("s").cast("long").alias("s"))
    wg = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("doc_id"))
    graph_rank = gsum.select("qid", "doc_id", F.row_number().over(wg).alias("rk"))

    chain = (
        queries.select("qid")
        .distinct()
        .select(
            "qid",
            F.explode(
                F.array(
                    F.col("qid"),
                    F.col("qid") + _MH_HOP,
                    F.col("qid") + 2 * _MH_HOP,
                )
            ).alias("cdoc"),
        )
    )
    d = direct_rank.select(
        F.col("qid").alias("dq"), F.col("doc_id").alias("dd"), F.col("rk").alias("drk")
    )
    g = graph_rank.select(
        F.col("qid").alias("gq"), F.col("doc_id").alias("gd"), F.col("rk").alias("grk")
    )
    return (
        chain.join(d, (F.col("qid") == F.col("dq")) & (F.col("cdoc") == F.col("dd")), "left")
        .join(g, (F.col("qid") == F.col("gq")) & (F.col("cdoc") == F.col("gd")), "left")
        .groupBy("qid")
        .agg(
            F.count(F.when(F.col("drk") <= 5, 1)).cast("long").alias("chain_at5_direct"),
            F.count(F.when(F.col("grk") <= 5, 1)).cast("long").alias("chain_at5_graph"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------
# Efficacy-eval rubric scoring (reference eval/scorer.py + runner.py)
# ---------------------------------------------------------------------

def _efficacy_rows() -> list[tuple]:
    """(scenario_id, category, rubric_idx, rtype, value, weight,
    out_with, out_without) — one row per deterministic-or-judge
    rubric, outputs built exactly like the mocked assistant: the
    with-memory answer concatenates the scenario's memory texts (the
    perfect-retrieval twin; the REAL hybrid_search-backed delta is
    pinned in tests/test_efficacy_eval.py), the without-memory answer
    is the fixed clarifying reply."""
    from memories_spark.evals import (
        WITHOUT_MEMORY_REPLY,
        WITH_MEMORY_SUFFIX,
        load_scenarios,
    )

    rows = []
    for s in load_scenarios():
        out_with = " ".join(m["text"] for m in s.memories) + WITH_MEMORY_SUFFIX
        for i, r in enumerate(s.expected):
            rows.append(
                (s.id, s.category, i, r.type, r.value, float(r.weight),
                 out_with, WITHOUT_MEMORY_REPLY)
            )
    return rows


def _efficacy_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ",\n    ".join(
        f"({q(sid)}, {q(cat)}, {i}, {q(rt)}, {q(val)}, {w!r}, {q(ow)}, {q(on)})"
        for sid, cat, i, rt, val, w, ow, on in _efficacy_rows()
    )
    return f"""
WITH rubrics(scenario_id, category, rubric_idx, rtype, value, weight, out_with, out_without) AS (
  VALUES
    {values}
),
scored AS (
  SELECT scenario_id, category, weight,
         CASE rtype
           WHEN 'contains' THEN CASE WHEN strpos(lower(out_with), lower(value)) > 0 THEN 1.0 ELSE 0.0 END
           WHEN 'not_contains' THEN CASE WHEN strpos(lower(out_with), lower(value)) > 0 THEN 0.0 ELSE 1.0 END
           WHEN 'no_retry' THEN CASE WHEN strpos(out_with, '?') > 0 THEN 0.0 ELSE 1.0 END
           ELSE -1.0
         END AS s_with,
         CASE rtype
           WHEN 'contains' THEN CASE WHEN strpos(lower(out_without), lower(value)) > 0 THEN 1.0 ELSE 0.0 END
           WHEN 'not_contains' THEN CASE WHEN strpos(lower(out_without), lower(value)) > 0 THEN 0.0 ELSE 1.0 END
           WHEN 'no_retry' THEN CASE WHEN strpos(out_without, '?') > 0 THEN 0.0 ELSE 1.0 END
           ELSE -1.0
         END AS s_without
  FROM rubrics
)
SELECT scenario_id, category,
       round(sum(CASE WHEN s_with >= 0 THEN s_with * weight END)
             / sum(CASE WHEN s_with >= 0 THEN weight END), 6) AS score_with,
       round(sum(CASE WHEN s_without >= 0 THEN s_without * weight END)
             / sum(CASE WHEN s_without >= 0 THEN weight END), 6) AS score_without,
       round(sum(CASE WHEN s_with >= 0 THEN s_with * weight END)
             / sum(CASE WHEN s_with >= 0 THEN weight END)
             - sum(CASE WHEN s_without >= 0 THEN s_without * weight END)
             / sum(CASE WHEN s_without >= 0 THEN weight END), 6) AS delta
FROM scored
GROUP BY scenario_id, category
ORDER BY scenario_id
"""


@register(
    "efficacy_rubric_scores",
    oracle=_efficacy_oracle(),
    doc="Efficacy-eval rubric scoring (reference eval/scorer.py "
    "score_all_rubrics + eval/runner.py with/without-memory phases, "
    "published as the 11-scenario Voltis delta in "
    "docs/architecture.md:299-331): per scenario, the weighted "
    "average of deterministic rubrics (contains / not_contains / "
    "no_retry; LLM-judge types excluded via the -1 sentinel) over "
    "the mocked assistant's with-memory answer (concatenated memory "
    "texts + declarative closing) and without-memory answer (fixed "
    "clarifying reply), plus the per-scenario delta. Scenario "
    "literals come from the original YAMLs under "
    "memories_spark/eval_scenarios/; the retrieval-backed delta over "
    "the REAL hybrid_search stack is pinned in "
    "tests/test_efficacy_eval.py.",
    tags=("eval",),
)
def efficacy_rubric_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    rub = spark.createDataFrame(
        _efficacy_rows(),
        "scenario_id string, category string, rubric_idx int, rtype string, "
        "value string, weight double, out_with string, out_without string",
    )

    def scored(out_col: str) -> F.Column:
        hit = F.instr(F.lower(F.col(out_col)), F.lower(F.col("value"))) > 0
        return (
            F.when(F.col("rtype") == "contains", F.when(hit, 1.0).otherwise(0.0))
            .when(F.col("rtype") == "not_contains", F.when(hit, 0.0).otherwise(1.0))
            .when(
                F.col("rtype") == "no_retry",
                F.when(F.instr(F.col(out_col), "?") > 0, 0.0).otherwise(1.0),
            )
            .otherwise(F.lit(-1.0))
        )

    s = rub.select(
        "scenario_id", "category", "weight",
        scored("out_with").alias("s_with"),
        scored("out_without").alias("s_without"),
    )

    def wavg(col: str) -> F.Column:
        num = F.sum(F.when(F.col(col) >= 0, F.col(col) * F.col("weight")))
        den = F.sum(F.when(F.col(col) >= 0, F.col("weight")))
        return num / den

    return (
        s.groupBy("scenario_id", "category")
        .agg(
            F.round(wavg("s_with"), 6).alias("score_with"),
            F.round(wavg("s_without"), 6).alias("score_without"),
            F.round(wavg("s_with") - wavg("s_without"), 6).alias("delta"),
        )
        .orderBy("scenario_id")
    )


# ---------------------------------------------------------------------
# Active-search behavior scoring
# (reference eval/active_search_eval.py:72-154, a 5.4.0 headline)
# ---------------------------------------------------------------------

#: Deterministic trace panel, LONG format: one row per (case, tool
#: call); a case with no tool calls carries one row with call_name=''.
#: Columns: case_id, should_search, expected prefixes e1/e2 ('' =
#: absent), expected answer terms t1/t2 ('' = absent), call_name,
#: call_prefix, answer.
_AS_PANEL = [
    ("c01", True, "proj/alpha", "", "port 7443", "",
     "memory_search", "proj/alpha", "the api listens on port 7443 for tls"),
    ("c02", True, "proj/alpha", "", "port 7443", "",
     "mcp__memories__memory_search", "proj/beta", "the api listens on port 7443"),
    ("c03", True, "proj/alpha", "", "port 7443", "",
     "", "", "use port 7443 as before"),
    ("c04", False, "", "", "", "", "", "", "hello there"),
    ("c05", False, "", "", "", "", "memory_search", "", "checked the notes"),
    ("c06", True, "proj/alpha", "", "port 7443", "",
     "memory_get", "proj/alpha", "fetched one memory directly"),
    ("c07", True, "", "", "", "", "custom__memory_search", "", "done"),
    ("c08", True, "proj/alpha", "", "port 7443", "tls",
     "memory_search", "proj/alpha", "we terminate tls at the gateway"),
    ("c09", True, "proj/alpha", "", "", "",
     "memory_search", "proj/alpha/svc", "scoped answer"),
    ("c10", True, "proj/alpha", "", "", "",
     "memory_search", "other/place", "first of two calls"),
    ("c10", True, "proj/alpha", "", "", "",
     "memory_search", "proj/alpha", "first of two calls"),
]


def _as_generated_cases() -> list[tuple]:
    """Systematic panel extension (round-7 verdict: >=50 cases): the
    full cross of call kind x answer usage for required-prefixed,
    required-unprefixed, and control turns, plus two-call traces —
    every scorer branch (exact/nested/wrong/unscoped prefix,
    memory_get non-compliance, name-suffix matching, fake-name
    rejection, passive-hook-only failures, noisy controls) appears
    with BOTH answer outcomes. Pure literals, no RNG."""
    rows: list[tuple] = []
    n = 10

    def case(should, e1, e2, t1, calls, hit):
        nonlocal n
        n += 1
        cid = f"c{n:02d}"
        answer = (
            f"per the notes the quota is {t1} per day" if (hit and t1)
            else "went with the usual approach"
        )
        emitted = [c for c in calls if c[0]] or [("", "")]
        for cname, cp in emitted:
            rows.append((cid, should, e1, e2, t1, "", cname, cp, answer))

    call_kinds = [
        [("", "")],                                      # no tool call
        [("memory_search", "proj/alpha")],               # exact prefix
        [("memory_search", "proj/alpha/svc")],           # nested prefix
        [("memory_search", "other/place")],              # wrong prefix
        [("memory_search", "")],                         # unscoped
        [("memory_get", "proj/alpha")],                  # non-compliant
        [("mcp__memories__memory_search", "learning/alpha")],  # suffix + e2
        [("memory_searcher", "proj/alpha")],             # fake name
    ]
    # A: required turns with expected prefixes (e2 on every other case)
    for i, calls in enumerate(call_kinds):
        e2 = "learning/alpha" if i % 2 else ""
        for hit in (True, False):
            case(True, "proj/alpha", e2, f"token{i}", calls, hit)
    # B: required turns with NO expected prefix (any search scores 1.0)
    for calls in (call_kinds[0], call_kinds[4], call_kinds[5], call_kinds[7]):
        for hit in (True, False):
            case(True, "", "", "rotate keys", calls, hit)
    # C: control turns — quiet is 1.0, any search is 0.0
    for calls in (call_kinds[0], call_kinds[4], call_kinds[5], call_kinds[7]):
        for hit in (True, False):
            case(False, "", "", "", calls, hit)
    # D: two-call traces — a bad call must not erase a good one
    for calls in (
        [("memory_search", "other/place"), ("memory_search", "proj/alpha")],
        [("memory_get", "proj/alpha"), ("memory_search", "proj/alpha/api")],
        [("memory_searcher", "proj/alpha"), ("memory_search", "")],
        [("memory_search", "proj/alpha"), ("memory_get", "other/x")],
    ):
        for hit in (True, False):
            case(True, "proj/alpha", "", "cutover date", calls, hit)
    return rows


_AS_PANEL += _as_generated_cases()


def _active_search_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ",\n    ".join(
        f"({q(cid)}, {sh}, {q(e1)}, {q(e2)}, {q(t1)}, {q(t2)}, "
        f"{q(cn)}, {q(cp)}, {q(ans)})"
        for cid, sh, e1, e2, t1, t2, cn, cp, ans in _AS_PANEL
    )
    return f"""
WITH panel(case_id, should_search, e1, e2, t1, t2, call_name, call_prefix, answer) AS (
  VALUES
    {values}
),
per_call AS (
  SELECT *,
    (call_name = 'memory_search'
     OR (length(call_name) >= 15
         AND right(call_name, 15) = '__memory_search')) AS is_search,
    (call_prefix <> '' AND (
       (e1 <> '' AND (call_prefix = e1 OR call_prefix LIKE e1 || '/%'))
       OR (e2 <> '' AND (call_prefix = e2 OR call_prefix LIKE e2 || '/%'))
    )) AS prefix_hit
  FROM panel
),
per_case AS (
  SELECT case_id, should_search, e1, e2, t1, t2, answer,
    bool_or(is_search) AS called,
    bool_or(is_search AND prefix_hit) AS any_prefix_hit
  FROM per_call
  GROUP BY case_id, should_search, e1, e2, t1, t2, answer
),
scored AS (
  SELECT case_id, should_search, called,
    CASE WHEN e1 = '' AND e2 = ''
         THEN CASE WHEN called THEN 1.0 ELSE 0.0 END
         ELSE CASE WHEN any_prefix_hit THEN 1.0 ELSE 0.0 END
    END AS source_prefix_score,
    ((t1 = '' OR strpos(lower(answer), lower(t1)) > 0)
     AND (t2 = '' OR strpos(lower(answer), lower(t2)) > 0)) AS answer_used,
    (t1 <> '' OR t2 <> '') AS has_terms,
    ((t1 <> '' AND strpos(lower(answer), lower(t1)) > 0)
     OR (t2 <> '' AND strpos(lower(answer), lower(t2)) > 0)) AS answer_any
  FROM per_case
)
SELECT case_id, should_search, called AS memory_search_called,
  round(source_prefix_score, 4) AS source_prefix_score,
  answer_used AS answer_used_memory,
  (should_search AND NOT called AND answer_any) AS passive_hook_only_failure,
  round(CASE
    WHEN should_search AND NOT called THEN 0.0
    WHEN should_search THEN 0.5 + 0.25 * source_prefix_score
      + CASE WHEN answer_used OR NOT has_terms THEN 0.25 ELSE 0.0 END
    WHEN called THEN 0.0
    ELSE 1.0
  END, 4) AS active_search_score
FROM scored
ORDER BY case_id
"""


@register(
    "active_search_scores",
    oracle=_active_search_oracle(),
    doc="Active memory-search behavior scoring (reference "
    "eval/active_search_eval.py:72-154, 5.4.0): per synthetic "
    "tool-call trace, did the agent actively search when the turn "
    "required prior context (0.5), with the exact or nested source "
    "prefix (+0.25, :49-56), and did the answer use the expected "
    "memory terms (+0.25)? Control cases score 1.0 unless an "
    "unnecessary search fired; memory_get never substitutes for a "
    "search; passive_hook_only_failure flags answers containing "
    "expected terms WITHOUT a search (memory injected by a passive "
    "hook — the behavior gap the eval exists to catch, :103-108). "
    "The Python twin (evals.score_active_search_turn) is pinned to "
    "identical outputs on this panel in tests/test_active_search.py.",
    tags=("eval",),
)
def active_search_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = spark.createDataFrame(
        _AS_PANEL,
        "case_id string, should_search boolean, e1 string, e2 string, "
        "t1 string, t2 string, call_name string, call_prefix string, "
        "answer string",
    )
    is_search = (F.col("call_name") == "memory_search") | (
        (F.length("call_name") >= 15)
        & (F.col("call_name").substr(-15, 15) == "__memory_search")
    )
    prefix_hit = (F.col("call_prefix") != "") & (
        (
            (F.col("e1") != "")
            & (
                (F.col("call_prefix") == F.col("e1"))
                | F.col("call_prefix").startswith(F.concat(F.col("e1"), F.lit("/")))
            )
        )
        | (
            (F.col("e2") != "")
            & (
                (F.col("call_prefix") == F.col("e2"))
                | F.col("call_prefix").startswith(F.concat(F.col("e2"), F.lit("/")))
            )
        )
    )
    per_case = (
        panel.withColumn("is_search", is_search)
        .withColumn("prefix_hit", prefix_hit)
        .groupBy("case_id", "should_search", "e1", "e2", "t1", "t2", "answer")
        .agg(
            F.max(F.col("is_search")).alias("called"),
            F.max(F.col("is_search") & F.col("prefix_hit")).alias("any_prefix_hit"),
        )
    )

    def contains(term_col: str) -> F.Column:
        return F.instr(F.lower("answer"), F.lower(F.col(term_col))) > 0

    scored = per_case.select(
        "case_id", "should_search", "called",
        F.round(
            F.when(
                (F.col("e1") == "") & (F.col("e2") == ""),
                F.when(F.col("called"), 1.0).otherwise(0.0),
            ).otherwise(F.when(F.col("any_prefix_hit"), 1.0).otherwise(0.0)),
            4,
        ).alias("source_prefix_score"),
        (
            ((F.col("t1") == "") | contains("t1"))
            & ((F.col("t2") == "") | contains("t2"))
        ).alias("answer_used"),
        ((F.col("t1") != "") | (F.col("t2") != "")).alias("has_terms"),
        (
            ((F.col("t1") != "") & contains("t1"))
            | ((F.col("t2") != "") & contains("t2"))
        ).alias("answer_any"),
    )
    return scored.select(
        "case_id", "should_search",
        F.col("called").alias("memory_search_called"),
        "source_prefix_score",
        F.col("answer_used").alias("answer_used_memory"),
        (F.col("should_search") & ~F.col("called") & F.col("answer_any")).alias(
            "passive_hook_only_failure"
        ),
        F.round(
            F.when(F.col("should_search") & ~F.col("called"), 0.0)
            .when(
                F.col("should_search"),
                F.lit(0.5)
                + 0.25 * F.col("source_prefix_score")
                + F.when(
                    F.col("answer_used") | ~F.col("has_terms"), 0.25
                ).otherwise(0.0),
            )
            .when(F.col("called"), 0.0)
            .otherwise(1.0),
            4,
        ).alias("active_search_score"),
    ).orderBy("case_id")


# ---------------------------------------------------------------------
# Active-search hook telemetry summary (5.4.0 monitoring)
# (reference scripts/active_search_metrics.py:1-185)
# ---------------------------------------------------------------------
#
# Deterministic event mapping over the events table: a session is a
# user; views with even event_id are required prompts; clicks are tool
# calls whose name cycles memory_get / memory_search /
# mcp__memories__memory_search / other_tool on event_id % 4 (the
# is-memory-search predicate must accept both search spellings and
# reject the others, :64-67) and whose source_prefix_quality cycles
# exact_project / broad_or_unscoped / '' on event_id % 3. Timestamps
# are floored to whole seconds and re-spread by event_id micros so
# deltas are integer-exact and per-session-distinct on both engines.

_AST_WINDOW_S = 21_600  # follow-up window (seconds) at this event density

_AST_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT event_id, user_id AS session_id,
         CAST(floor(epoch(ts)) AS BIGINT) * 1000000
           + event_id % 1000000 AS us,
         CASE user_id % 3 WHEN 0 THEN 'claude-code'
              WHEN 1 THEN 'codex' ELSE 'opencode' END AS client,
         event_type
  FROM events
),
prompts AS (
  SELECT session_id, client, event_id AS pid, us
  FROM base WHERE event_type = 'view' AND event_id % 2 = 0
),
ms AS (
  SELECT session_id, client, us,
         CASE event_id % 3 WHEN 0 THEN 'exact_project'
              WHEN 1 THEN 'broad_or_unscoped' ELSE '' END AS quality,
         row_number() OVER (PARTITION BY session_id ORDER BY us) AS trank
  FROM base WHERE event_type = 'click' AND event_id % 4 IN (1, 2)
),
nt AS (SELECT session_id, max(trank) AS n FROM ms GROUP BY session_id),
-- the 5.4 consumption matcher: tool rank r matches (and removes) the
-- latest still-unmatched prompt within the window; the recursion
-- carries each session's matched-pid list one tool call at a time
steps AS (
  SELECT session_id, 0 AS step, []::BIGINT[] AS matched
  FROM (SELECT DISTINCT session_id FROM ms)
  UNION ALL
  SELECT st.session_id, st.step + 1,
    list_cat(st.matched, COALESCE((
      SELECT list(pid) FROM (
        SELECT p.pid FROM prompts p
        WHERE p.session_id = st.session_id
          AND NOT list_contains(st.matched, p.pid)
          AND t.us - p.us BETWEEN 0 AND {_AST_WINDOW_S * 1_000_000}
        ORDER BY p.us DESC LIMIT 1)), []::BIGINT[]))
  FROM steps st
  JOIN ms t ON t.session_id = st.session_id AND t.trank = st.step + 1
),
final AS (
  SELECT s.session_id, s.matched
  FROM steps s JOIN nt ON nt.session_id = s.session_id AND s.step = nt.n
),
pm AS (
  SELECT p.client,
         CASE WHEN f.matched IS NOT NULL
                   AND list_contains(f.matched, p.pid)
              THEN 1 ELSE 0 END AS m
  FROM prompts p LEFT JOIN final f ON f.session_id = p.session_id
),
pc AS (
  SELECT client, CAST(count(*) AS BIGINT) AS required_prompts,
         CAST(sum(m) AS BIGINT) AS required_with_search
  FROM pm GROUP BY client
),
tc AS (
  SELECT client, CAST(count(*) AS BIGINT) AS memory_search_calls,
         CAST(sum(CASE WHEN quality = 'exact_project' THEN 1 ELSE 0 END)
              AS BIGINT) AS exact_project_searches,
         CAST(sum(CASE WHEN quality = 'broad_or_unscoped' THEN 1 ELSE 0 END)
              AS BIGINT) AS broad_or_unscoped_searches
  FROM ms GROUP BY client
),
per_client AS (
  SELECT COALESCE(pc.client, tc.client) AS client,
         COALESCE(required_prompts, 0) AS required_prompts,
         COALESCE(required_with_search, 0) AS required_with_search,
         COALESCE(required_prompts, 0)
           - COALESCE(required_with_search, 0) AS passive_risk_prompts,
         COALESCE(memory_search_calls, 0) AS memory_search_calls,
         COALESCE(exact_project_searches, 0) AS exact_project_searches,
         COALESCE(broad_or_unscoped_searches, 0) AS broad_or_unscoped_searches
  FROM pc FULL OUTER JOIN tc ON pc.client = tc.client
),
with_total AS (
  SELECT * FROM per_client
  UNION ALL
  SELECT '(all)', sum(required_prompts), sum(required_with_search),
         sum(passive_risk_prompts), sum(memory_search_calls),
         sum(exact_project_searches), sum(broad_or_unscoped_searches)
  FROM per_client
)
SELECT client,
       CAST(required_prompts AS BIGINT) AS required_prompts,
       CAST(required_with_search AS BIGINT) AS required_with_search,
       CAST(passive_risk_prompts AS BIGINT) AS passive_risk_prompts,
       CAST(memory_search_calls AS BIGINT) AS memory_search_calls,
       CAST(exact_project_searches AS BIGINT) AS exact_project_searches,
       CAST(broad_or_unscoped_searches AS BIGINT) AS broad_or_unscoped_searches,
       CASE WHEN required_prompts = 0 THEN CAST(1000000 AS BIGINT)
            ELSE CAST(floor(required_with_search * 1000000
                            / required_prompts) AS BIGINT)
       END AS followup_rate_fp
FROM with_total
ORDER BY client
"""


@register(
    "active_search_telemetry",
    oracle=_AST_ORACLE,
    doc="Active-search hook telemetry summary (reference "
    "scripts/active_search_metrics.py:1-185, 5.4.0 monitoring): "
    "per-client required-prompt counts, follow-up matches, "
    "passive-risk prompts, memory-search call volume, and the "
    "exact_project vs broad_or_unscoped scoped-search split, plus an "
    "(all) total row with the fixed-point follow-up rate. The "
    "load-bearing rule is the 5.4 over-crediting fix: each "
    "memory_search (processed in ts order) consumes the LATEST "
    "still-unmatched required prompt of its session within the "
    "follow-up window — a per-session greedy the Spark side runs as "
    "an Arrow-batched applyInPandas over groupBy(session_id) "
    "(sessions are independent; a billion sessions fan out) and the "
    "oracle replays with a recursive CTE carrying the matched-pid "
    "list. Event mapping documented at the module constant.",
    tags=("eval", "events", "streaming"),
)
def active_search_telemetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.operators.telemetry import summarize_active_search
    from memories_spark.sources.tables import load_tables as _lt

    ev = _lt(spark, sf_dir)["events"].select(
        "event_id",
        F.expr(
            "timestamp_micros((unix_micros(ts) DIV 1000000) * 1000000"
            " + event_id % 1000000)"
        ).alias("ts"),
        F.col("user_id").alias("session_id"),
        F.expr(
            "CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'claude-code'"
            " WHEN 1 THEN 'codex' ELSE 'opencode' END"
        ).alias("client"),
        "event_type",
    )
    prompts = ev.filter(
        (F.col("event_type") == "view") & (F.col("event_id") % 2 == 0)
    ).select("session_id", "client", "ts")
    tools = ev.filter(F.col("event_type") == "click").select(
        "session_id",
        "client",
        "ts",
        F.expr(
            "CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'memory_get'"
            " WHEN 1 THEN 'memory_search'"
            " WHEN 2 THEN 'mcp__memories__memory_search'"
            " ELSE 'other_tool' END"
        ).alias("tool_name"),
        F.expr(
            "CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'exact_project'"
            " WHEN 1 THEN 'broad_or_unscoped' ELSE '' END"
        ).alias("source_prefix_quality"),
    )
    return summarize_active_search(
        prompts, tools, followup_window_seconds=float(_AST_WINDOW_S)
    )
