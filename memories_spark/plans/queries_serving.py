"""Serving-loop queries: read-time reinforcement as a batch apply,
query-intent rewrite as a data-parallel classifier, dominant-category
mode, and rollup analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.decay import decay_sql, half_life_decay
from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# R9: reinforcement — event log + idempotent batch apply
# ---------------------------------------------------------------------

_NOW = "2024-01-31 00:00:00"
_CONF_HL = 90.0

_REINFORCE_ORACLE = f"""
WITH retrievals AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_retrievals,
         max(ts) AS last_reinforced_at
  FROM events
  WHERE event_type IN ('click', 'view')
  GROUP BY 1
),
enriched AS (
  SELECT d.doc_id,
         TIMESTAMP '2024-01-01 00:00:00' + to_minutes(CAST(d.doc_id AS INT)) AS created_at,
         r.n_retrievals, r.last_reinforced_at
  FROM documents d LEFT JOIN retrievals r ON d.doc_id = r.doc_id
)
SELECT doc_id,
       coalesce(n_retrievals, 0) AS n_retrievals,
       strftime(last_reinforced_at, '%Y-%m-%d %H:%M:%S') AS last_reinforced_at,
       round({decay_sql("coalesce(last_reinforced_at, created_at)", _NOW, _CONF_HL)}, 6)
         AS confidence
FROM enriched ORDER BY doc_id
"""


@register(
    "reinforcement_apply",
    oracle=_REINFORCE_ORACLE,
    doc="Read-time reinforcement restructured for a pure engine "
    "(reference R9, memory_engine.py:945-950, 1438): search hits are "
    "an append-only retrieval log (events, memory id in the JSON "
    "props); the batch apply joins max(ts)/count per memory back "
    "onto the corpus and recomputes half-life confidence (reference "
    "R5 anchor priority last_reinforced_at -> created_at, "
    "memory_engine.py:920-963). One shuffle on the log, broadcast "
    "join back; in production the apply is a Delta MERGE.",
    tags=("maintenance", "decay", "events", "json"),
)
def reinforcement_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    retrievals = (
        t["events"]
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.get_json_object("props", "$.k").cast("long").alias("doc_id"))
        .agg(
            F.count("*").alias("n_retrievals"),
            F.max("ts").alias("last_reinforced_at"),
        )
    )
    created_at = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.col("doc_id").cast("int"), F.lit(0)
    )
    now = F.lit(_NOW).cast("timestamp")
    anchor = F.coalesce(F.col("last_reinforced_at"), F.col("created_at"))
    return (
        t["documents"]
        .select("doc_id")
        .join(F.broadcast(retrievals), "doc_id", "left")
        .withColumn("created_at", created_at)
        .select(
            "doc_id",
            F.coalesce(F.col("n_retrievals"), F.lit(0)).cast("long").alias("n_retrievals"),
            F.date_format("last_reinforced_at", "yyyy-MM-dd HH:mm:ss").alias(
                "last_reinforced_at"
            ),
            F.round(half_life_decay(anchor, now, _CONF_HL), 6).alias("confidence"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# R13: query-intent classifier as a data-parallel rewrite
# ---------------------------------------------------------------------

_INTENT_QUERIES = [
    (0, "what changed today in the deploy"),
    (1, "incident report from yesterday"),
    (2, "standup notes last week"),
    (3, "plan for this week"),
    (4, "retro summary last month"),
    (5, "okr progress this month"),
    (6, "error budget 3 days ago"),
    (7, "schema review two days ago"),
    (8, "release notes in march"),
    (9, "what shipped in december"),
    (10, "recently updated configs"),
    (11, "latest schema version"),
    (12, "current oncall rotation"),
    (13, "how does auth middleware work"),
    (14, "bm25 scoring constants"),
]

# Pinned 'now' = 2024-01-31 (a Wednesday); the week starts Monday
# 2024-01-29. All branch constants below are start-of-week/month math
# pre-folded against that anchor, matching functions/intent.py.
_WORDNUM_SQL = (
    "CASE mnum WHEN 'one' THEN 1 WHEN 'two' THEN 2 WHEN 'three' THEN 3 "
    "WHEN 'four' THEN 4 WHEN 'five' THEN 5 WHEN 'six' THEN 6 "
    "WHEN 'seven' THEN 7 WHEN 'eight' THEN 8 WHEN 'nine' THEN 9 "
    "WHEN 'ten' THEN 10 ELSE CAST(mnum AS INT) END"
)
_MONTHNUM_SQL = (
    "CASE mmon WHEN 'january' THEN 1 WHEN 'february' THEN 2 WHEN 'march' THEN 3 "
    "WHEN 'april' THEN 4 WHEN 'may' THEN 5 WHEN 'june' THEN 6 WHEN 'july' THEN 7 "
    "WHEN 'august' THEN 8 WHEN 'september' THEN 9 WHEN 'october' THEN 10 "
    "WHEN 'november' THEN 11 WHEN 'december' THEN 12 END"
)
_DAYS_RE = r"\b([0-9]+|one|two|three|four|five|six|seven|eight|nine|ten)\s+days?\s+ago\b"
_MONTH_RE = (
    r"\bin\s+(january|february|march|april|may|june|july|august|"
    r"september|october|november|december)\b"
)
_RECENT_RE = r"\b(recent(ly)?|lately|latest|current|newest)\b"


def _intent_values_sql() -> str:
    rows = ", ".join(f"({i}, '{q}')" for i, q in _INTENT_QUERIES)
    return f"(VALUES {rows}) AS t(qid, query)"


_INTENT_ORACLE = f"""
WITH raw AS (SELECT qid, lower(query) AS q FROM {_intent_values_sql()}),
tagged AS (
  SELECT qid, q,
         CASE WHEN regexp_matches(q, '\\btoday\\b') THEN 'today'
              WHEN regexp_matches(q, '\\byesterday\\b') THEN 'yesterday'
              WHEN regexp_matches(q, '\\blast week\\b') THEN 'last_week'
              WHEN regexp_matches(q, '\\bthis week\\b') THEN 'this_week'
              WHEN regexp_matches(q, '\\blast month\\b') THEN 'last_month'
              WHEN regexp_matches(q, '\\bthis month\\b') THEN 'this_month'
              WHEN regexp_matches(q, '{_DAYS_RE}') THEN 'days_ago'
              WHEN regexp_matches(q, '{_MONTH_RE}') THEN 'in_month'
              ELSE 'none' END AS tag,
         regexp_extract(q, '{_DAYS_RE}', 1) AS mnum,
         regexp_extract(q, '{_MONTH_RE}', 1) AS mmon
  FROM raw
),
resolved AS (
  SELECT qid, tag,
         CASE tag WHEN 'days_ago' THEN {_WORDNUM_SQL} END AS ndays,
         CASE tag WHEN 'in_month' THEN {_MONTHNUM_SQL} END AS mon,
         CASE WHEN regexp_matches(q, '{_RECENT_RE}') THEN 0.2 ELSE 0.0 END AS recency_boost
  FROM tagged
),
windows AS (
  SELECT qid, tag, recency_boost,
         CASE tag
           WHEN 'today' THEN DATE '2024-01-31'
           WHEN 'yesterday' THEN DATE '2024-01-30'
           WHEN 'last_week' THEN DATE '2024-01-22'
           WHEN 'this_week' THEN DATE '2024-01-29'
           WHEN 'last_month' THEN DATE '2023-12-01'
           WHEN 'this_month' THEN DATE '2024-01-01'
           WHEN 'days_ago' THEN DATE '2024-01-31' - to_days(ndays)
           WHEN 'in_month' THEN make_date(CASE WHEN mon <= 1 THEN 2024 ELSE 2023 END, mon, 1)
         END AS since_d,
         CASE tag
           WHEN 'yesterday' THEN DATE '2024-01-31'
           WHEN 'last_week' THEN DATE '2024-01-29'
           WHEN 'last_month' THEN DATE '2024-01-01'
           WHEN 'days_ago' THEN DATE '2024-01-31' - to_days(ndays) + to_days(1)
           WHEN 'in_month' THEN make_date(
             CASE WHEN mon = 12 THEN (CASE WHEN mon <= 1 THEN 2025 ELSE 2024 END)
                  ELSE (CASE WHEN mon <= 1 THEN 2024 ELSE 2023 END) END,
             CASE WHEN mon = 12 THEN 1 ELSE mon + 1 END, 1)
         END AS until_d
  FROM resolved
)
SELECT qid,
       strftime(since_d, '%Y-%m-%d') AS since,
       strftime(until_d, '%Y-%m-%d') AS until,
       CAST(tag != 'none' AS BIGINT) AS suppress_graph,
       recency_boost
FROM windows ORDER BY qid
"""


@register(
    "query_intent_rewrite",
    oracle=_INTENT_ORACLE,
    doc="Query-intent classifier (reference R13, query_intent.py:"
    "105-253): regex temporal parsing of query strings into "
    "since/until windows (today/yesterday/last-this week/month, "
    "'N days ago' with word numbers, 'in <month>' with year "
    "back-off), explicit windows suppress graph expansion, vague "
    "recency phrasing adds the 0.2 recency boost. Expressed as a "
    "data-parallel CASE/regexp plan (classify millions of logged "
    "queries in one scan) with 'now' pinned for determinism.",
    tags=("retrieval", "intent", "regex"),
)
def query_intent_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = spark.createDataFrame(_INTENT_QUERIES, "qid long, query string")
    q = F.lower(F.col("query"))
    rx = lambda pat: q.rlike(pat)  # noqa: E731
    tag = (
        F.when(rx(r"\btoday\b"), "today")
        .when(rx(r"\byesterday\b"), "yesterday")
        .when(rx(r"\blast week\b"), "last_week")
        .when(rx(r"\bthis week\b"), "this_week")
        .when(rx(r"\blast month\b"), "last_month")
        .when(rx(r"\bthis month\b"), "this_month")
        .when(rx(_DAYS_RE), "days_ago")
        .when(rx(_MONTH_RE), "in_month")
        .otherwise("none")
    )
    tagged = qdf.select(
        "qid",
        tag.alias("tag"),
        F.regexp_extract(q, _DAYS_RE, 1).alias("mnum"),
        F.regexp_extract(q, _MONTH_RE, 1).alias("mmon"),
        F.when(rx(_RECENT_RE), F.lit(0.2)).otherwise(F.lit(0.0)).alias("recency_boost"),
    )
    resolved = tagged.select(
        "qid",
        "tag",
        "recency_boost",
        F.when(F.col("tag") == "days_ago", F.expr(_WORDNUM_SQL)).alias("ndays"),
        F.when(F.col("tag") == "in_month", F.expr(_MONTHNUM_SQL)).alias("mon"),
    )
    d = lambda s: F.to_date(F.lit(s))  # noqa: E731
    year_since = F.when(F.col("mon") <= 1, 2024).otherwise(2023)
    since_d = (
        F.when(F.col("tag") == "today", d("2024-01-31"))
        .when(F.col("tag") == "yesterday", d("2024-01-30"))
        .when(F.col("tag") == "last_week", d("2024-01-22"))
        .when(F.col("tag") == "this_week", d("2024-01-29"))
        .when(F.col("tag") == "last_month", d("2023-12-01"))
        .when(F.col("tag") == "this_month", d("2024-01-01"))
        .when(F.col("tag") == "days_ago", F.date_sub(d("2024-01-31"), F.col("ndays")))
        .when(
            F.col("tag") == "in_month",
            F.make_date(year_since, F.col("mon"), F.lit(1)),
        )
    )
    until_d = (
        F.when(F.col("tag") == "yesterday", d("2024-01-31"))
        .when(F.col("tag") == "last_week", d("2024-01-29"))
        .when(F.col("tag") == "last_month", d("2024-01-01"))
        .when(
            F.col("tag") == "days_ago",
            F.date_add(F.date_sub(d("2024-01-31"), F.col("ndays")), 1),
        )
        .when(
            F.col("tag") == "in_month",
            F.make_date(
                F.when(F.col("mon") == 12, year_since + 1).otherwise(year_since),
                F.when(F.col("mon") == 12, F.lit(1)).otherwise(F.col("mon") + 1),
                F.lit(1),
            ),
        )
    )
    return resolved.select(
        "qid",
        F.date_format(since_d, "yyyy-MM-dd").alias("since"),
        F.date_format(until_d, "yyyy-MM-dd").alias("until"),
        (F.col("tag") != "none").cast("long").alias("suppress_graph"),
        "recency_boost",
    ).orderBy("qid")


# ---------------------------------------------------------------------
# C4: dominant category — mode() per cluster with deterministic ties
# ---------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT string_split(source, '/')[1] AS folder, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT folder, lang, n,
         row_number() OVER (PARTITION BY folder ORDER BY n DESC, lang ASC) AS rn
  FROM counts
)
SELECT folder, lang AS dominant_lang, n AS n_members
FROM ranked WHERE rn = 1 ORDER BY folder
"""


@register(
    "dominant_category_mode",
    oracle=_MODE_ORACLE,
    doc="Dominant category per cluster (reference C4 "
    "_dominant_category, consolidator.py:146-218: merged memory "
    "takes the mode of member categories): groupBy-count + "
    "row_number with count DESC, value ASC tie-break — a "
    "deterministic mode() that needs no driver round-trip. folder "
    "plays the cluster, lang plays the category.",
    tags=("agg", "window", "maintenance"),
)
def dominant_category_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy(
        F.split(F.col("source"), "/").getItem(0).alias("folder"),
        "lang",
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("folder").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("folder", F.col("lang").alias("dominant_lang"), F.col("n").alias("n_members"))
        .orderBy("folder")
    )


# ---------------------------------------------------------------------
# Latency-percentile analytics: nearest-rank, deterministic
# ---------------------------------------------------------------------

_PCT_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
FROM ranked GROUP BY event_type ORDER BY event_type
"""


@register(
    "event_value_percentiles",
    oracle=_PCT_ORACLE,
    doc="Per-type p50/p90/p99 of event value by nearest-rank "
    "(ceil(p*n), ties broken by event_id) — the engine twin of the "
    "reference's rolling latency-percentile /metrics windows "
    "(README.md:990-991, benchmarks/load_test.py). Nearest-rank "
    "instead of interpolation keeps the value an actual datum, "
    "bit-identical across engines; one shuffle on event_type, "
    "conditional aggregation collapses the ranked rows.",
    tags=("agg", "events", "percentile"),
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            pick(0.50).alias("p50"),
            pick(0.90).alias("p90"),
            pick(0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# Running aggregates: per-user cumulative value over time
# ---------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT user_id, event_id,
       round(CAST(CAST(sum(CAST(round(value*100.0) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS DOUBLE)/100.0, 2) AS running_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS seq
FROM events
WHERE user_id < 20
ORDER BY user_id, seq
"""


@register(
    "running_user_value",
    oracle=_RUNNING_ORACLE,
    doc="Per-user running value total ordered by time (cumulative "
    "window frame, exact fixed-point cents so partial order inside "
    "equal timestamps cannot skew the double). One shuffle on "
    "user_id; the frame is computed in a single sorted pass per "
    "partition — the running-total shape of billing/cost dashboards.",
    tags=("window", "events"),
)
def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") < 20)
    order = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.round(F.col("value") * 100.0).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(cents).over(frame).cast("double") / 100.0, 2).alias("running_value"),
        F.row_number().over(order).cast("long").alias("seq"),
    ).orderBy("user_id", "seq")


# ---------------------------------------------------------------------
# Pivot: event types to columns in one pass
# ---------------------------------------------------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT user_id % 10 AS user_bucket,
       {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _PIVOT_TYPES)}
FROM events GROUP BY 1 ORDER BY user_bucket
"""


@register(
    "event_type_pivot",
    oracle=_PIVOT_ORACLE,
    doc="Pivot event types into columns per user bucket — Spark's "
    "pivot with an explicit value list compiles to ONE aggregation "
    "pass (no per-column scan); the explicit list also keeps the "
    "output schema static, which an unlisted pivot (distinct-scan "
    "first) cannot guarantee at 100 TB.",
    tags=("agg", "pivot", "events"),
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", _PIVOT_TYPES)
        .count()
        .na.fill(0, _PIVOT_TYPES)
        .select(
            "user_bucket", *[F.col(t).cast("long").alias(t) for t in _PIVOT_TYPES]
        )
        .orderBy("user_bucket")
    )


# ---------------------------------------------------------------------
# Rollup analytics: hierarchical totals in one pass
# ---------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(ub AS VARCHAR), 'ALL') AS user_bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0, 2) AS total_value
FROM (SELECT event_type, user_id % 4 AS ub, value FROM events)
GROUP BY ROLLUP(event_type, ub)
ORDER BY event_type, user_bucket
"""


@register(
    "events_rollup",
    oracle=_ROLLUP_ORACLE,
    doc="Hierarchical ROLLUP totals (grand total, per-type, "
    "per-type-and-bucket) in one shuffle — the grouping-sets "
    "machinery SURVEY §2.5 notes the reference lacks; Catalyst "
    "expands it to a single Expand+HashAggregate.",
    tags=("agg", "events", "rollup"),
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select("event_type", (F.col("user_id") % 4).alias("ub"), "value")
    return (
        base.rollup("event_type", "ub")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("_v_cents"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("ub").cast("string"), F.lit("ALL")).alias("user_bucket"),
            "n",
            F.round(F.col("_v_cents").cast("double") / 100.0, 2).alias("total_value"),
        )
        .orderBy("event_type", "user_bucket")
    )
