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
    (0, "what changed today in the deploy"),   # none: 'today' not a form
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
    (12, "current oncall rotation"),           # none: 'current' not a recency word
    (13, "how does auth middleware work"),
    (14, "bm25 scoring constants"),
    (15, "decisions made last year"),
    (16, "incidents two weeks ago"),
    (17, "migrations a month ago"),
    (18, "outage one year ago"),
    (19, "postmortems from the past few months"),
    (20, "alerts in the past two weeks"),
    (21, "deploys in the last 5 days"),
    (22, "roadmap for this year"),
    (23, "demo last thursday"),
    (24, "oncall handoff last saturday"),
    (25, "launch window from july to october"),
    (26, "budget review between march and june"),
    (27, "code freeze from november to february"),  # wrapping month range
    (28, "newest dashboards"),
    (29, "most recent schema change"),
    (30, "things from november"),
    (31, "changes during april"),
    (32, "report for the month of august"),
]

# Pinned 'now' = 2024-01-31 (a Wednesday, weekday 2; the week starts
# Monday 2024-01-29; now.month = 1). The classifier below is the FULL
# reference grammar (reference query_intent.py:37-58 patterns,
# :105-253 precedence) as ONE SQL template rendered for both engines;
# the engines differ only in regex-literal escaping, date-shift
# syntax, and date formatting. Matches functions/intent.py exactly.
_MONTH_ALT = (
    "january|february|march|april|may|june|july|august|september|"
    "october|november|december|jan|feb|mar|apr|jun|jul|aug|sep|oct|nov|dec"
)
_WD_ALT = "monday|tuesday|wednesday|thursday|friday|saturday|sunday"
_NUM_ALT = (
    r"\d+|a|an|one|two|three|four|five|six|seven|eight|nine|ten|"
    "eleven|twelve|few|couple|several"
)
_MONTH_RANGE_RE = (
    rf"(?:from\s+|between\s+)({_MONTH_ALT})\s+(?:to|and)\s+({_MONTH_ALT})"
)
_IN_MONTH_RE = rf"(?:in|from|during|month\s+of)\s+({_MONTH_ALT})\b"
_YESTERDAY_RE = r"\byesterday\b"
_LAST_PERIOD_RE = r"\blast\s+(week|month|year)\b"
_LAST_WD_RE = rf"\blast\s+({_WD_ALT})\b"
_N_AGO_RE = rf"\b({_NUM_ALT})\s+(day|week|month|year)s?\s+ago\b"
_PAST_N_RE = rf"\b(?:past|last)\s+({_NUM_ALT})\s+(day|week|month|year)s?\b"
_THIS_PERIOD_RE = r"\bthis\s+(week|month|year)\b"
_RECENCY_RE = r"\b(?:recently|latest|most\s+recent|newest)\b"

_WORDNUM_CASE = (
    "CASE {c} WHEN 'a' THEN 1 WHEN 'an' THEN 1 WHEN 'one' THEN 1 "
    "WHEN 'two' THEN 2 WHEN 'three' THEN 3 WHEN 'four' THEN 4 "
    "WHEN 'five' THEN 5 WHEN 'six' THEN 6 WHEN 'seven' THEN 7 "
    "WHEN 'eight' THEN 8 WHEN 'nine' THEN 9 WHEN 'ten' THEN 10 "
    "WHEN 'eleven' THEN 11 WHEN 'twelve' THEN 12 WHEN 'few' THEN 3 "
    "WHEN 'couple' THEN 2 WHEN 'several' THEN 4 "
    "ELSE CAST({c} AS INT) END"
)
_MONTHNUM_CASE = (
    "CASE {c} WHEN 'january' THEN 1 WHEN 'jan' THEN 1 "
    "WHEN 'february' THEN 2 WHEN 'feb' THEN 2 "
    "WHEN 'march' THEN 3 WHEN 'mar' THEN 3 "
    "WHEN 'april' THEN 4 WHEN 'apr' THEN 4 WHEN 'may' THEN 5 "
    "WHEN 'june' THEN 6 WHEN 'jun' THEN 6 WHEN 'july' THEN 7 WHEN 'jul' THEN 7 "
    "WHEN 'august' THEN 8 WHEN 'aug' THEN 8 "
    "WHEN 'september' THEN 9 WHEN 'sep' THEN 9 "
    "WHEN 'october' THEN 10 WHEN 'oct' THEN 10 "
    "WHEN 'november' THEN 11 WHEN 'nov' THEN 11 "
    "WHEN 'december' THEN 12 WHEN 'dec' THEN 12 END"
)
_WDNUM_CASE = (
    "CASE {c} WHEN 'monday' THEN 0 WHEN 'tuesday' THEN 1 "
    "WHEN 'wednesday' THEN 2 WHEN 'thursday' THEN 3 WHEN 'friday' THEN 4 "
    "WHEN 'saturday' THEN 5 WHEN 'sunday' THEN 6 END"
)
# most recent strictly-past weekday: (now.weekday() - wd) % 7, 0 -> 7
_DAYSBACK = (
    "(CASE WHEN ((2 - wdn + 7) % 7) = 0 THEN 7 ELSE ((2 - wdn + 7) % 7) END)"
)


def _intent_values_sql() -> str:
    rows = ", ".join(f"({i}, '{q}')" for i, q in _INTENT_QUERIES)
    return f"(VALUES {rows}) AS t(qid, query)"


def _intent_classifier_sql(engine: str) -> str:
    """Render the full R13 classifier for 'spark' or 'duckdb'."""
    if engine == "spark":
        # Spark SQL string literals process backslash escapes
        rx = lambda p: p.replace("\\", "\\\\")  # noqa: E731
        sub = lambda d, n: f"date_sub(DATE '{d}', {n})"  # noqa: E731
        fmt = lambda c: f"date_format({c}, 'yyyy-MM-dd')"  # noqa: E731
    else:
        rx = lambda p: p  # noqa: E731
        sub = lambda d, n: f"(DATE '{d}' - to_days(CAST({n} AS INT)))"  # noqa: E731
        fmt = lambda c: f"strftime({c}, '%Y-%m-%d')"  # noqa: E731
    wn = _WORDNUM_CASE.format
    end_year_mr = "CASE WHEN m2n <= 1 THEN 2024 ELSE 2023 END"
    year_im = "CASE WHEN imn <= 1 THEN 2024 ELSE 2023 END"
    past_days = (
        "pni * CASE pnu WHEN 'day' THEN 1 WHEN 'week' THEN 7 "
        "WHEN 'month' THEN 30 ELSE 365 END"
    )
    return f"""
WITH raw AS (SELECT qid, lower(query) AS q FROM {_intent_values_sql()}),
x AS (
  SELECT qid, q,
    regexp_extract(q, '{rx(_MONTH_RANGE_RE)}', 1) AS mr1,
    regexp_extract(q, '{rx(_MONTH_RANGE_RE)}', 2) AS mr2,
    regexp_extract(q, '{rx(_IN_MONTH_RE)}', 1) AS im,
    regexp_extract(q, '{rx(_YESTERDAY_RE)}', 0) AS yd,
    regexp_extract(q, '{rx(_LAST_PERIOD_RE)}', 1) AS lp,
    regexp_extract(q, '{rx(_LAST_WD_RE)}', 1) AS lw,
    regexp_extract(q, '{rx(_N_AGO_RE)}', 1) AS nan,
    regexp_extract(q, '{rx(_N_AGO_RE)}', 2) AS nau,
    regexp_extract(q, '{rx(_PAST_N_RE)}', 1) AS pnn,
    regexp_extract(q, '{rx(_PAST_N_RE)}', 2) AS pnu,
    regexp_extract(q, '{rx(_THIS_PERIOD_RE)}', 1) AS tp,
    regexp_extract(q, '{rx(_RECENCY_RE)}', 0) AS rc
  FROM raw
),
t AS (
  SELECT qid,
    CASE WHEN mr1 != '' THEN 'month_range'
         WHEN im  != '' THEN 'in_month'
         WHEN yd  != '' THEN 'yesterday'
         WHEN lp  != '' THEN 'last_' || lp
         WHEN lw  != '' THEN 'last_weekday'
         WHEN nan != '' THEN 'ago_' || nau
         WHEN pnn != '' THEN 'past_n'
         WHEN tp  != '' THEN 'this_' || tp
         ELSE 'none' END AS tag,
    {_MONTHNUM_CASE.format(c='mr1')} AS m1n,
    {_MONTHNUM_CASE.format(c='mr2')} AS m2n,
    {_MONTHNUM_CASE.format(c='im')} AS imn,
    {_WDNUM_CASE.format(c='lw')} AS wdn,
    CASE WHEN nan != '' THEN {wn(c='nan')} END AS nai,
    CASE WHEN pnn != '' THEN {wn(c='pnn')} END AS pni,
    pnu, rc
  FROM x
),
w AS (
  SELECT qid, tag, rc,
    CASE tag
      WHEN 'month_range' THEN make_date(
          ({end_year_mr}) - (CASE WHEN m1n > m2n THEN 1 ELSE 0 END), m1n, 1)
      WHEN 'in_month' THEN make_date({year_im}, imn, 1)
      WHEN 'yesterday' THEN DATE '2024-01-30'
      WHEN 'last_week' THEN DATE '2024-01-22'
      WHEN 'last_month' THEN DATE '2023-12-01'
      WHEN 'last_year' THEN DATE '2023-01-01'
      WHEN 'last_weekday' THEN {sub('2024-01-31', _DAYSBACK)}
      WHEN 'ago_day' THEN {sub('2024-01-31', 'nai')}
      WHEN 'ago_week' THEN {sub('2024-01-29', '7 * nai')}
      WHEN 'ago_month' THEN {sub('2024-01-31', '30 * nai')}
      WHEN 'ago_year' THEN {sub('2024-01-31', '365 * nai')}
      WHEN 'past_n' THEN {sub('2024-01-31', past_days)}
      WHEN 'this_week' THEN DATE '2024-01-29'
      WHEN 'this_month' THEN DATE '2024-01-01'
      WHEN 'this_year' THEN DATE '2024-01-01'
    END AS since_d,
    CASE tag
      WHEN 'month_range' THEN last_day(make_date({end_year_mr}, m2n, 1))
      WHEN 'in_month' THEN last_day(make_date({year_im}, imn, 1))
      WHEN 'yesterday' THEN DATE '2024-01-30'
      WHEN 'last_week' THEN DATE '2024-01-28'
      WHEN 'last_month' THEN DATE '2023-12-31'
      WHEN 'last_year' THEN DATE '2023-12-31'
      WHEN 'last_weekday' THEN {sub('2024-01-31', _DAYSBACK)}
      WHEN 'ago_day' THEN {sub('2024-01-31', 'nai')}
      WHEN 'ago_week' THEN {sub('2024-01-29', '7 * nai - 6')}
      WHEN 'ago_month' THEN {sub('2024-01-31', '30 * nai')}
      WHEN 'ago_year' THEN {sub('2024-01-31', '365 * nai')}
    END AS until_d
  FROM t
)
SELECT qid,
       {fmt('since_d')} AS since,
       {fmt('until_d')} AS until,
       CAST(tag != 'none' AS BIGINT) AS suppress_graph,
       CAST(CASE WHEN tag = 'none' AND rc != '' THEN 0.2 ELSE 0.0 END AS DOUBLE) AS recency_boost
FROM w ORDER BY qid
"""


@register(
    "query_intent_rewrite",
    oracle=_intent_classifier_sql("duckdb"),
    doc="Query-intent classifier at FULL reference parity (reference "
    "R13, query_intent.py:37-58 grammar, :105-253 precedence): "
    "month ranges with year pinning and Nov-Feb wrap, single "
    "months (in/from/during/month-of + abbreviations, year "
    "back-off), yesterday, last week/month/year, last <weekday>, "
    "'N days/weeks/months/years ago' with word numbers "
    "(a/an/one..twelve/few/couple/several), open-ended "
    "'past/last N <period>', this week/month/year, and vague "
    "recency phrasing (0.2 boost, only when no window matched). "
    "Explicit windows suppress graph expansion; until bounds are "
    "the last covered day (reference _iso_end). Expressed as a "
    "data-parallel CASE/regexp plan (classify millions of logged "
    "queries in one scan) with 'now' pinned for determinism; ONE "
    "SQL template renders both the Spark plan and the DuckDB "
    "oracle, so the grammar cannot drift between them.",
    tags=("retrieval", "intent", "regex"),
)
def query_intent_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_intent_classifier_sql("spark"))


# ---------------------------------------------------------------------
# Intent-based prefix biasing (reference memory-query.sh:142-149)
# ---------------------------------------------------------------------

_INTENT_PREFIX_ORACLE = """
WITH prompts AS (
  SELECT lower(CASE CAST(doc_id % 7 AS INT)
           WHEN 0 THEN 'fix '   WHEN 1 THEN 'how '   WHEN 2 THEN 'debug '
           WHEN 3 THEN 'setup ' WHEN 4 THEN 'deploy ' WHEN 5 THEN 'crash '
           ELSE 'ship ' END || text) AS low,
         string_split(source, '/')[1] AS proj
  FROM documents
),
matched AS (
  SELECT proj,
    CASE WHEN low LIKE 'fix%' OR low LIKE 'debug%' OR low LIKE 'error%'
           OR low LIKE 'bug%' OR low LIKE 'broken%' OR low LIKE 'crash%'
      THEN ['learning/' || proj, 'bug-fix/' || proj]
    WHEN low LIKE 'how%' OR low LIKE 'setup%' OR low LIKE 'configure%'
           OR low LIKE 'install%'
      THEN ['decision/' || proj, 'learning/' || proj]
    END AS prefixes
  FROM prompts
)
SELECT scope, CAST(count(*) AS BIGINT) AS n_prompts
FROM (SELECT unnest(prefixes) AS scope FROM matched WHERE prefixes IS NOT NULL)
GROUP BY scope ORDER BY scope
"""


@register(
    "intent_prefix_bias",
    oracle=_INTENT_PREFIX_ORACLE,
    doc="Intent-based prefix biasing at reference parity "
    "(memory-query.sh:142-149 — the UserPromptSubmit hook's shell "
    "case table: fix/debug/error/bug/broken/crash prompts bias "
    "toward learning/ + bug-fix/ scopes, how/setup/configure/"
    "install toward decision/ + learning/; starts-with match, "
    "first rule wins). Run corpus-wide as classification of a "
    "deterministic synthesized prompt panel (doc_id-keyed intent "
    "word + text — the raw corpus never starts with the trigger "
    "words, so this keeps the oracle non-vacuous): per derived "
    "scope, how many prompts would queue a biased search. The "
    "Spark plan is BUILT from functions/keywords.INTENT_PREFIX_"
    "RULES — the same constant prompt_recall_search serves from — "
    "so plan and serving grammar cannot drift.",
    tags=("serving", "intent"),
)
def intent_prefix_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from memories_spark.functions.keywords import INTENT_PREFIX_RULES

    docs = load_tables(spark, sf_dir)["documents"]
    word = (
        F.when(F.expr("CAST(doc_id % 7 AS INT)") == 0, "fix ")
        .when(F.expr("CAST(doc_id % 7 AS INT)") == 1, "how ")
        .when(F.expr("CAST(doc_id % 7 AS INT)") == 2, "debug ")
        .when(F.expr("CAST(doc_id % 7 AS INT)") == 3, "setup ")
        .when(F.expr("CAST(doc_id % 7 AS INT)") == 4, "deploy ")
        .when(F.expr("CAST(doc_id % 7 AS INT)") == 5, "crash ")
        .otherwise("ship ")
    )
    low = F.lower(F.concat(word, F.col("text")))
    proj = F.split(F.col("source"), "/").getItem(0)
    prefixes = F.lit(None).cast("array<string>")
    for starts, templates in reversed(INTENT_PREFIX_RULES):
        cond = F.lit(False)
        for s in starts:
            cond = cond | low.startswith(s)
        arr = F.array(
            *[
                F.concat(F.lit(t.replace("{project}", "")), proj)
                for t in templates
            ]
        )
        prefixes = F.when(cond, arr).otherwise(prefixes)
    return (
        docs.select(prefixes.alias("prefixes"))
        .filter(F.col("prefixes").isNotNull())
        .select(F.explode("prefixes").alias("scope"))
        .groupBy("scope")
        .agg(F.count("*").alias("n_prompts"))
        .orderBy("scope")
    )


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
